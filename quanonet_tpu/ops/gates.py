"""
Gate primitives for the batched statevector engine.

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

State layout: ``(batch, 2**n)`` complex64; amplitude index k has qubit i's
value in bit i, so qubit 0 varies fastest.
"""
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def ry_matrix(theta):
    """RY(θ) 2x2 (real). theta: any shape -> (..., 2, 2)."""
    c = jnp.cos(theta / 2.0)
    s = jnp.sin(theta / 2.0)
    return jnp.stack([jnp.stack([c, -s], axis=-1),
                      jnp.stack([s, c], axis=-1)], axis=-2)


def rx_matrix(theta):
    """RX(θ) 2x2 (complex). theta: any shape -> (..., 2, 2)."""
    c = jnp.cos(theta / 2.0).astype(jnp.complex64)
    s = (-1j * jnp.sin(theta / 2.0)).astype(jnp.complex64)
    return jnp.stack([jnp.stack([c, s], axis=-1),
                      jnp.stack([s, c], axis=-1)], axis=-2)


def rz_diag(theta):
    """RZ(θ) diagonal (e^{-iθ/2}, e^{+iθ/2}). theta: (...,) -> (..., 2)."""
    half = theta / 2.0
    return jnp.stack([jnp.exp(-1j * half), jnp.exp(1j * half)], axis=-1)


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


def apply_single_qubit(state, qubit, mat, n_qubits):
    """Apply a 2x2 ``mat`` to ``qubit`` of a (batch, 2^n) state.

    The per-sample variant accepts mat of shape (batch, 2, 2); a shared gate
    has shape (2, 2).
    """
    batch = state.shape[0]
    lo = 2 ** qubit              # stride of the target bit
    hi = 2 ** (n_qubits - 1 - qubit)
    s = state.reshape(batch, hi, 2, lo)
    s0 = s[:, :, 0, :]
    s1 = s[:, :, 1, :]
    if mat.ndim == 3:  # per-sample gate: (batch, 2, 2)
        m = mat[:, :, :, None, None]  # broadcast over (hi, lo)
        n0 = m[:, 0, 0] * s0 + m[:, 0, 1] * s1
        n1 = m[:, 1, 0] * s0 + m[:, 1, 1] * s1
    else:
        n0 = mat[0, 0] * s0 + mat[0, 1] * s1
        n1 = mat[1, 0] * s0 + mat[1, 1] * s1
    return jnp.stack([n0, n1], axis=2).reshape(batch, -1)


def apply_rx_layer(state, thetas, n_qubits):
    """Apply RX(θ_i) on every qubit i (encoding layer,
    reference core/quantum_circuits_tq.py:79-86).

    state: (batch, 2^n) complex; thetas: (batch, n) per-sample angles.
    """
    batch = state.shape[0]
    for q in range(n_qubits):
        th = thetas[:, q]
        c = jnp.cos(th / 2.0)[:, None, None].astype(state.dtype)
        s = (-1j * jnp.sin(th / 2.0))[:, None, None].astype(state.dtype)
        lo = 2 ** q
        hi = 2 ** (n_qubits - 1 - q)
        st = state.reshape(batch, hi, 2, lo)
        s0 = st[:, :, 0, :]
        s1 = st[:, :, 1, :]
        n0 = c * s0 + s * s1
        n1 = s * s0 + c * s1
        state = jnp.stack([n0, n1], axis=2).reshape(batch, -1)
    return state


def apply_cnot_ring(state, n_qubits):
    """Apply the CNOT ring permutation to a (batch, 2^n) state."""
    if n_qubits <= 1:
        return state
    inv = jnp.asarray(cnot_ring_inverse_permutation(n_qubits))
    # ψ'[i] = ψ[inv[i]]
    return state[:, inv]
