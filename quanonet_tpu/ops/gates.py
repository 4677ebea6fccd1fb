"""
Gate primitives and static circuit structures for the statevector engine.

Conventions (checkpoint-load-critical — see SURVEY.md §2b and reference
utils/weight_transfer.py:7-12):

* little-endian: qubit ``i`` <-> bit ``i`` of the basis index ``k``
  (reference core/quantum_circuits_tq.py:119-124);
* rotations use e^{-i θ P / 2}:
    RX(θ) = [[cos θ/2, -i sin θ/2], [-i sin θ/2, cos θ/2]]
    RY(θ) = [[cos θ/2,   -sin θ/2], [   sin θ/2,  cos θ/2]]
    RZ(θ) = diag(e^{-iθ/2}, e^{+iθ/2})
* CNOT ring applies control=(i+1)%n -> target=i sequentially for
  i = 0..n-1 (reference core/quantum_circuits_ms.py:137-144).

NOTE: this module contains only REAL-valued building blocks — the TPU
backend in this environment has no complex64 lowering, so the engine
(ops/hea.py) carries (re, im) float32 pairs everywhere.
"""
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def make_perm_apply(perm: np.ndarray, axis: int = -1):
    """Permutation gather along ``axis`` with a gather-based VJP.

    ``s[:, perm]`` under plain autodiff transposes to a SCATTER-ADD (JAX
    cannot know the gather indices are a bijection), and scatters are the
    slowest lowering on this backend — profiling showed the Q10 fused
    backward at ~2.9x the forward with the ring's scatter dominating
    (docs/fused_profile.json; the change measured +27% on the Q10 fused
    train step).  A permutation's transpose is just the inverse
    permutation, so the VJP here is another gather.  Indices are baked as
    constants (2^n int32 — 256 KB at Q16, well under the tunnel constant
    limit).  Takes and returns the engine's split-real (re, im) pair."""
    fwd_idx = np.asarray(perm)
    bwd_idx = np.empty_like(fwd_idx)
    bwd_idx[fwd_idx] = np.arange(fwd_idx.size, dtype=fwd_idx.dtype)

    @jax.custom_vjp
    def apply(sr, si):
        return (jnp.take(sr, fwd_idx, axis=axis),
                jnp.take(si, fwd_idx, axis=axis))

    def fwd(sr, si):
        return apply(sr, si), None

    def bwd(_, ct):
        ctr, cti = ct
        return (jnp.take(ctr, bwd_idx, axis=axis),
                jnp.take(cti, bwd_idx, axis=axis))

    apply.defvjp(fwd, bwd)
    return apply


def ry_matrix(theta):
    """RY(θ) 2x2 (real). theta: any shape -> (..., 2, 2)."""
    c = jnp.cos(theta / 2.0)
    s = jnp.sin(theta / 2.0)
    return jnp.stack([jnp.stack([c, -s], axis=-1),
                      jnp.stack([s, c], axis=-1)], axis=-2)


@lru_cache(maxsize=None)
def bit_table(n_qubits: int) -> np.ndarray:
    """bits[k, i] = bit i of k.  Shape (2^n, n), int32, host-side constant."""
    k = np.arange(2 ** n_qubits, dtype=np.int64)
    return ((k[:, None] >> np.arange(n_qubits)[None, :]) & 1).astype(np.int32)


@lru_cache(maxsize=None)
def z_signs(n_qubits: int) -> np.ndarray:
    """signs[k, i] = (-1)^{bit_i(k)} = <k|Z_i|k>.  Shape (2^n, n), float32."""
    return (1.0 - 2.0 * bit_table(n_qubits)).astype(np.float32)


@lru_cache(maxsize=None)
def cnot_ring_permutation(n_qubits: int) -> np.ndarray:
    """Composite permutation of the reference's CNOT ring.

    The ring applies CNOT(control=(i+1)%n, target=i) for i = 0..n-1 in
    sequence (reference core/quantum_circuits_ms.py:137-144 with
    CNOT.on(target=i, control=(i+1)%n)).  Each CNOT is the permutation
    k -> k XOR (bit_c(k) << t); the composite is a single index permutation
    ``perm`` with  (R ψ)[perm[k]] = ψ[k].

    Returns perm as int32 (identity for n_qubits == 1 — the reference skips
    entanglement for a single qubit, quantum_circuits_ms.py:140).
    """
    dim = 2 ** n_qubits
    k = np.arange(dim, dtype=np.int64)
    if n_qubits > 1:
        for i in range(n_qubits):
            c = (i + 1) % n_qubits
            k = k ^ (((k >> c) & 1) << i)
    # k[j] is now where basis state j is mapped to: R|j> = |k[j]>.
    return k.astype(np.int32)


@lru_cache(maxsize=None)
def cnot_ring_inverse_permutation(n_qubits: int) -> np.ndarray:
    """inv[i] = j such that perm[j] = i, i.e. (R M)[i, :] = M[inv[i], :]."""
    perm = cnot_ring_permutation(n_qubits)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return inv


@lru_cache(maxsize=None)
def hadamard_kron(n_qubits: int) -> np.ndarray:
    """H^{⊗n}: [i, j] = (-1)^{popcount(i & j)} / sqrt(2^n), float32.

    Used to rewrite the RX encoding layer as a diagonal:
    ⊗RX(x) = H^{⊗n} · ⊗RZ(x) · H^{⊗n}  (H X H = Z)."""
    bits = bit_table(n_qubits)  # (D, n)
    par = (bits[:, None, :] & bits[None, :, :]).sum(-1) & 1
    return ((1.0 - 2.0 * par) / np.sqrt(2 ** n_qubits)).astype(np.float32)


def kron_chain(mats):
    """Full-register operator from per-qubit 2x2s.

    mats: (n, 2, 2) with mats[i] acting on qubit i.  With little-endian
    indexing the register operator is kron(m_{n-1}, ..., m_1, m_0).
    """
    n = mats.shape[0]
    u = mats[n - 1]
    for q in range(n - 2, -1, -1):
        u = jnp.kron(u, mats[q])
    return u
