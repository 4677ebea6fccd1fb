"""
Finite-shot measurement sampling — simulate what a real QPU returns.

The reference's hardware path submits EstimatorV2 jobs at 10,000 shots
(reference ibm_inference.py:269-276), but its simulator path is EXACT
(StatevectorEstimator, ibm_inference.py:205-213): there is no way to
predict the shot-noise floor of a planned QPU job without burning QPU
time.  This module closes that gap with a TPU-native sampled-measurement
path on the engine's split-real statevector:

* ``sample_counts``      — multinomial basis-state counts per input row
  (O(2^n) per row via the binomial chain, no per-shot memory);
* ``sample_indices``     — raw measurement outcomes (the SamplerV2 analog),
  inverse-CDF draws, little-endian qubit<->bit convention (ops/gates.py);
* ``shot_expectation``   — shot-estimated <H> for every Hamiltonian the
  framework supports: diagonal/Z directly, and the Σ X_i / Σ Y_i ablation
  observables via an in-place measurement-basis rotation (X = H Z H,
  Y = S H Z H S†), exactly how hardware measures them;
* ``shot_noise_std``     — the analytic standard error of the estimator,
  sqrt((<H²> − <H>²)/shots), for planning a QPU shot budget.

Everything is float32 split-real (no complex dtypes lower on this TPU
backend) and jit/vmap-safe; randomness flows through explicit JAX PRNG
keys so sampled runs replay bit-identically.
"""
import jax
import jax.numpy as jnp
import numpy as np

from quanonet_tpu.ops.gates import z_signs
from quanonet_tpu.ops.hea import HEASpec, hea_forward_pair


def probs_pair(sr, si):
    """Measurement probabilities |ψ_k|², renormalized against float32
    norm drift over deep circuits.  (batch, 2^n) -> (batch, 2^n)."""
    p = sr * sr + si * si
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _apply_h_all(sr, si, n_qubits):
    """H on every qubit: real butterfly per qubit, O(n·2^n)."""
    batch = sr.shape[0]
    inv_sqrt2 = np.float32(1.0 / np.sqrt(2.0))
    for q in range(n_qubits):
        lo = 2 ** q
        hi = 2 ** (n_qubits - 1 - q)

        def h(a):
            a = a.reshape(batch, hi, 2, lo)
            a0, a1 = a[:, :, 0, :], a[:, :, 1, :]
            return jnp.stack([(a0 + a1) * inv_sqrt2,
                              (a0 - a1) * inv_sqrt2],
                             axis=2).reshape(batch, -1)

        sr, si = h(sr), h(si)
    return sr, si


def _apply_sdg_all(sr, si, n_qubits):
    """S† on every qubit: ψ_k *= (−i)^{popcount(k)}, one diagonal
    multiply (popcount phases are a host-side constant)."""
    from quanonet_tpu.ops.gates import bit_table
    pc = bit_table(n_qubits).sum(axis=1) % 4          # (2^n,)
    # (−i)^pc ∈ {1, −i, −1, i}
    fr = jnp.asarray(np.cos(-0.5 * np.pi * pc).astype(np.float32))
    fi = jnp.asarray(np.sin(-0.5 * np.pi * pc).astype(np.float32))
    return sr * fr - si * fi, sr * fi + si * fr


def rotate_to_pauli_basis(sr, si, pauli, n_qubits):
    """Rotate the state so a computational-basis measurement realizes the
    X/Y observable: X = H Z H (apply H^⊗n), Y = S H Z H S† (apply
    H^⊗n·S†^⊗n).  Returns the state unchanged for pauli='Z'."""
    if pauli == 'Z':
        return sr, si
    if pauli == 'Y':
        sr, si = _apply_sdg_all(sr, si, n_qubits)
    elif pauli != 'X':
        raise ValueError(f"pauli must be X, Y or Z, got {pauli}")
    return _apply_h_all(sr, si, n_qubits)


def sample_counts(key, probs, shots):
    """Multinomial counts per row: (batch, 2^n) float32 summing to shots.
    O(2^n) work per row (binomial chain) — no per-shot memory."""
    return jax.random.multinomial(key, shots, probs)


def sample_indices(key, probs, shots):
    """``shots`` raw measurement outcomes per row, (batch, shots) int32
    basis-state indices (qubit i <-> bit i, ops/gates.py convention).
    Inverse-CDF draws: O(shots·log 2^n) per row."""
    dim = probs.shape[-1]
    cdf = jnp.cumsum(probs, axis=-1)
    u = jax.random.uniform(key, (probs.shape[0], shots), dtype=probs.dtype)
    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side='right'))(cdf, u)
    return jnp.clip(idx, 0, dim - 1).astype(jnp.int32)


def indices_to_bits(idx, n_qubits):
    """Basis-state indices -> bitstrings, (..., n_qubits) int32 with
    bits[..., i] the measured value of qubit i (little-endian)."""
    shifts = jnp.arange(n_qubits, dtype=jnp.int32)
    return (idx[..., None] >> shifts) & 1


def shot_expectation_pair(key, sr, si, diag, shots):
    """Shot-estimated ⟨H⟩ for diagonal H from a split-real state.
    Returns (batch, 1) float32.  Unbiased: E[est] = Σ_k p_k d_k."""
    counts = sample_counts(key, probs_pair(sr, si), shots)
    est = jnp.einsum('bd,d->b', counts, jnp.asarray(diag, counts.dtype),
                     precision=jax.lax.Precision.HIGHEST) / shots
    return est[:, None]


def shot_noise_std(sr, si, diag, shots):
    """Analytic standard error of the ``shots``-shot estimator:
    sqrt((⟨H²⟩ − ⟨H⟩²)/shots), (batch, 1) float32.  Use this to size a
    QPU shot budget before submitting (reference default 10,000 shots)."""
    p = probs_pair(sr, si)
    d = jnp.asarray(diag, p.dtype)
    e1 = jnp.einsum('bd,d->b', p, d,
                    precision=jax.lax.Precision.HIGHEST)
    e2 = jnp.einsum('bd,d->b', p, d * d,
                    precision=jax.lax.Precision.HIGHEST)
    var = jnp.maximum(e2 - e1 * e1, 0.0)
    return jnp.sqrt(var / shots)[:, None]


def _pauli_sum_diag(n_qubits, offset, coeff):
    """Diagonal of offset + coeff·Σ_i Z_i in the (rotated) measurement
    basis — after rotate_to_pauli_basis this realizes Σ X_i / Σ Y_i."""
    zsum = z_signs(n_qubits).sum(axis=1).astype(np.float32)
    return offset + coeff * zsum


def shot_expectation(key, spec: HEASpec, weights, x, shots, diag=None,
                     pauli='Z', offset=0.0, coeff=0.0, engine='auto'):
    """Full circuit + finite-shot measurement.  (batch, 1) float32.

    The sampled analog of ops.hea.hea_expectation: identical arguments
    plus (key, shots).  For pauli='X'/'Y' the state is rotated to the
    measurement basis and the Σ P_i observable becomes diagonal — the
    same single-basis trick hardware uses for sums of commuting terms.
    """
    sr, si = hea_forward_pair(spec, weights, x, engine=engine)
    if pauli == 'Z':
        if diag is None:
            raise ValueError("Z-basis sampling requires a diagonal")
        d = jnp.asarray(diag)
    else:
        sr, si = rotate_to_pauli_basis(sr, si, pauli, spec.n_qubits)
        d = jnp.asarray(_pauli_sum_diag(spec.n_qubits, offset, coeff))
    return shot_expectation_pair(key, sr, si, d, shots)
