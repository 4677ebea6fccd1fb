"""
Pauli-twirled noise-trajectory simulation — predict a QPU's noise floor.

The reference's hardware path profiles per-qubit calibration error rates
(reference ibm_inference.py:68-118: 2q gate_error + readout_error scoring)
but its simulator is strictly IDEAL (StatevectorEstimator,
ibm_inference.py:205-213): the only way to learn how calibration-grade
noise degrades a trained QuanONet is to burn QPU time.  This module closes
that gap, complementing finite-shot sampling (ops/sampling.py) so the full
hardware error budget — decoherence/gate noise AND shot noise AND readout
error — can be predicted on the simulator before submission:

* gate/decoherence noise — a depolarizing channel after every HEA block,
  simulated by PAULI-TWIRLED TRAJECTORIES: each trajectory draws, per
  (block, qubit), "error or not" (prob p_q) and a uniform Pauli ∈ {X,Y,Z},
  then runs a PURE-STATE forward with those Paulis inserted.  Averaging
  expectations over trajectories converges to the exact channel value
  (the standard quantum-trajectory / Monte-Carlo unraveling of a Pauli
  channel) without ever forming the 4^n density matrix.
* readout error — a classical per-qubit bit-flip channel on the measured
  distribution, applied EXACTLY (kron of 2x2 binary-symmetric channels as
  n in-place butterflies on the probability vector), no sampling needed.
* finite shots — optional; the TOTAL budget is spent exactly
  (floor(shots/n_traj) or one more multinomial draw per trajectory,
  pooled-count estimator — ops/sampling.py), which is precisely what
  the hardware does: every shot rides one noise realization.

TPU-native mechanics: every sampled Pauli is applied as X^a·Z^b (Y = i·XZ;
the global phase cancels in expectations), i.e. one static-shape sign
multiply (Z, via z_signs) and one static-shape axis reverse (X, bit-flip
butterfly) gated by ``jnp.where`` — no data-dependent control flow, so the
whole trajectory ensemble is one ``vmap`` over PRNG keys inside a single
jitted program.  The ansatz blocks reuse the engine's compiled block
unitaries (ops/hea.compile_block_unitaries), shared across trajectories;
the forward runs in the PHYSICAL frame (explicit RX butterflies rather
than the dense path's Hadamard-folded frame) so noise insertion sites are
literal circuit locations.  Split-real float32 throughout (no complex
dtypes lower on this TPU backend).  Inference-only, like sampling.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from quanonet_tpu.ops.gates import z_signs
from quanonet_tpu.ops.hea import (HEASpec, _init_state, _rx_single,
                                  compile_block_unitaries)
from quanonet_tpu.ops.sampling import (_pauli_sum_diag, probs_pair,
                                       rotate_to_pauli_basis,
                                       sample_counts)


def _flip_bit(a, q, n_qubits):
    """Bit-flip (Pauli-X) permutation on qubit q: static axis reverse."""
    batch = a.shape[0]
    lo = 1 << q
    hi = 1 << (n_qubits - 1 - q)
    return a.reshape(batch, hi, 2, lo)[:, :, ::-1, :].reshape(batch, -1)


def apply_pauli_xz(sr, si, q, a, b, n_qubits):
    """Apply X^a · Z^b on qubit q (Z first, then X — so (a=1,b=1) realizes
    Y up to the global phase i, irrelevant for expectations).

    q is static; a/b are traced booleans (scalars or (batch,)-shaped), so
    this lowers to two selects + a sign multiply — jit/vmap/scan-safe.
    """
    zq = jnp.asarray(z_signs(n_qubits)[:, q])            # (D,) ±1
    sgn = jnp.where(b, zq, jnp.float32(1.0))
    sr, si = sr * sgn, si * sgn
    fr, fi = _flip_bit(sr, q, n_qubits), _flip_bit(si, q, n_qubits)
    return jnp.where(a, fr, sr), jnp.where(a, fi, si)


def sample_pauli_masks(key, p, n_blocks, n_qubits):
    """Draw one trajectory's error pattern: (a, b) bool (n_blocks, n_qubits).

    Per (block, qubit): error occurs with prob p_q, then a uniform Pauli
    {X, Y, Z} — the depolarizing channel ρ → (1−p)ρ + (p/3)Σ_P PρP.
    a = bit-flip component (X or Y), b = phase-flip component (Y or Z).
    """
    kb, kc = jax.random.split(key)
    p = jnp.broadcast_to(jnp.asarray(p, jnp.float32), (n_qubits,))
    occur = jax.random.bernoulli(kb, p, (n_blocks, n_qubits))
    choice = jax.random.randint(kc, (n_blocks, n_qubits), 0, 3)  # X/Y/Z
    return occur & (choice != 2), occur & (choice != 0)


def apply_amplitude_damping(sr, si, q, gamma, u, n_qubits):
    """One MCWF (quantum-jump) unraveling step of the T1 amplitude-damping
    channel on qubit q: Kraus K0 = diag(1, √(1−γ)), K1 = √γ·|0⟩⟨1|.

    For each batched pure state, the jump fires with the state-dependent
    probability p_jump = γ·P1 (P1 = population of the 1-subspace of q,
    computed in-graph); the jump lowers the 1-amplitudes into the
    0-subspace, the no-jump branch scales them by √(1−γ); both branches
    renormalize, so the trajectory stays a unit pure state and the
    trajectory average reproduces the exact channel (standard Monte-Carlo
    wave-function method).  u: (batch,) uniforms; gamma: scalar.  Both
    branches are computed and selected with jnp.where — static shapes,
    jit/vmap/scan-safe.
    """
    batch = sr.shape[0]
    lo = 1 << q
    hi = 1 << (n_qubits - 1 - q)
    r = sr.reshape(batch, hi, 2, lo)
    i = si.reshape(batch, hi, 2, lo)
    r0, r1 = r[:, :, 0, :], r[:, :, 1, :]
    i0, i1 = i[:, :, 0, :], i[:, :, 1, :]
    p1 = jnp.sum(r1 * r1 + i1 * i1, axis=(1, 2))          # (batch,)
    p_jump = gamma * p1
    jump = (u < p_jump)[:, None, None]

    z = jnp.zeros_like(r1)
    inv_j = jax.lax.rsqrt(jnp.maximum(p1, 1e-30))[:, None, None]
    s = jnp.sqrt(jnp.maximum(1.0 - gamma, 0.0))
    inv_n = jax.lax.rsqrt(jnp.maximum(1.0 - p_jump, 1e-30))[:, None, None]

    out_r0 = jnp.where(jump, r1 * inv_j, r0 * inv_n)
    out_r1 = jnp.where(jump, z, r1 * (s * inv_n))
    out_i0 = jnp.where(jump, i1 * inv_j, i0 * inv_n)
    out_i1 = jnp.where(jump, z, i1 * (s * inv_n))
    out_r = jnp.stack([out_r0, out_r1], axis=2).reshape(batch, -1)
    out_i = jnp.stack([out_i0, out_i1], axis=2).reshape(batch, -1)
    return out_r, out_i


def _traj_forward(spec: HEASpec, utr, uti, xb, a, b, gamma=None, u=None):
    """One noise trajectory, physical frame.  utr/uti: pre-transposed block
    unitaries (nb, D, D); xb: (nb, batch, n) encode angles; a/b: (nb, n)
    sampled Pauli components; gamma (n,) per-qubit damping per block and
    u (nb, n, batch) jump uniforms when amplitude damping is on.
    Returns the final split-real state."""
    n = spec.n_qubits
    batch = xb.shape[1]
    state = _init_state(batch, spec.dim)
    damping = gamma is not None
    xs = (utr, uti, xb, a, b) + ((u,) if damping else ())

    def step(state, inp):
        sr, si = state
        tr, ti, x_b, a_b, b_b = inp[:5]
        for q in range(n):                         # encode: ⊗RX(x_b)
            sr, si = _rx_single(sr, si, q, x_b[:, q], n)
        t1 = sr @ tr                               # ansatz: s ← U_b s
        t2 = si @ ti                               # (Karatsuba, 3 matmuls)
        t3 = (sr + si) @ (tr + ti)
        sr, si = t1 - t2, t3 - t1 - t2
        for q in range(n):                         # sampled Pauli noise
            sr, si = apply_pauli_xz(sr, si, q, a_b[q], b_b[q], n)
        if damping:                                # T1 decay, MCWF
            u_b = inp[5]
            for q in range(n):
                sr, si = apply_amplitude_damping(sr, si, q, gamma[q],
                                                 u_b[q], n)
        return (sr, si), None

    (sr, si), _ = jax.lax.scan(step, state, xs)
    return sr, si


def apply_readout_error(probs, ro):
    """Exact per-qubit classical bit-flip (readout) channel on a measured
    distribution: probs (batch, 2^n), ro scalar or (n,) flip probabilities.
    Kron of 2x2 binary-symmetric channels = n in-place butterflies."""
    batch, dim = probs.shape
    n = dim.bit_length() - 1
    ro = jnp.broadcast_to(jnp.asarray(ro, probs.dtype), (n,))
    for q in range(n):
        lo = 1 << q
        hi = 1 << (n - 1 - q)
        p = probs.reshape(batch, hi, 2, lo)
        p0, p1 = p[:, :, 0, :], p[:, :, 1, :]
        probs = jnp.stack([(1 - ro[q]) * p0 + ro[q] * p1,
                           ro[q] * p0 + (1 - ro[q]) * p1],
                          axis=2).reshape(batch, -1)
    return probs


def is_noisy(noise_p=None, readout_p=None, damp_gamma=None, dephase_p=None):
    """True iff any channel parameter actually switches a channel ON.

    None and 0 both mean OFF: an explicit zero-strength channel is the
    ideal circuit, and running the trajectory machinery at p=0 would
    burn n_traj forwards to compute exactly the ideal value
    (infer._resolve_config already normalizes noise_p=0 this way).  The
    ONE shared predicate for models/solver/infer/multiseed — keep any
    new channel flag here so the paths can't drift.  Accepts scalars or
    per-qubit arrays."""
    def on(v):
        return v is not None and bool(np.any(np.asarray(v, np.float64)))
    return (on(noise_p) or on(readout_p) or on(damp_gamma)
            or on(dephase_p))


def distribute_shots(shots, n_traj):
    """Spread a TOTAL shot budget over trajectories: floor(shots/n_traj)
    each, first ``shots % n_traj`` trajectories one more — sums to
    exactly ``shots`` (float32 (n_traj,), zeros allowed when
    shots < n_traj)."""
    base, extra = divmod(int(shots), n_traj)
    return (np.full(n_traj, base, np.float32)
            + (np.arange(n_traj) < extra)).astype(np.float32)


@partial(jax.jit, static_argnames=('spec', 'n_traj', 'pauli', 'shots'))
def noisy_expectation(key, spec: HEASpec, weights, x, noise_p, n_traj,
                      diag=None, pauli='Z', offset=0.0, coeff=0.0,
                      shots=None, readout_p=0.0, damp_gamma=None,
                      dephase_p=None):
    """Trajectory-averaged ⟨H⟩ under per-block decoherence noise.

    The noisy analog of ops.hea.hea_expectation: identical observable
    arguments plus (key, noise_p, n_traj, shots, readout_p, damp_gamma,
    dephase_p).

    key       PRNG key — trajectories (and shots) replay bit-identically.
    noise_p   scalar or (n_qubits,) per-qubit depolarizing prob per block.
    n_traj    trajectories to average (estimator std ∝ 1/√n_traj).
    shots     optional TOTAL shot budget, spent EXACTLY: trajectories
              draw floor(shots/n_traj) or one more multinomial sample
              each (hardware semantics: one noise realization per shot)
              and the pooled-count estimator divides by ``shots``.
              None = exact per-trajectory expectations.
    readout_p scalar or (n,) measurement bit-flip prob, applied exactly.
    damp_gamma  None, scalar or (n,): T1 amplitude-damping γ per block
              (γ = 1 − e^(−t_block/T1)), simulated by MCWF quantum jumps
              — see apply_amplitude_damping / channel_params_from_t1t2.
    dephase_p None, scalar or (n,): pure-dephasing (T2) Z-flip prob per
              block, XOR-composed into the depolarizing Pauli mask (exact:
              Z^c·X^a·Z^b = ±X^a·Z^(b⊕c), the sign is global phase).

    Channel order per block: encode → ansatz U_b → depolarizing+dephasing
    Paulis → amplitude damping (channels on distinct qubits commute).

    Returns (batch, 1) float32.  Unbiased in the channel: the expectation
    over trajectories equals the exact composed-channel value
    (density-matrix oracle check in tests/test_noise.py).
    """
    if not spec.uniform_encode:
        raise ValueError("noisy_expectation requires a uniform-encode spec "
                         "(every block encodes n_qubits angles)")
    n, nb = spec.n_qubits, spec.n_blocks
    ur, ui = compile_block_unitaries(spec, weights)       # (nb, D, D)
    utr, uti = ur.transpose(0, 2, 1), ui.transpose(0, 2, 1)
    xb = x.reshape(x.shape[0], nb, n).transpose(1, 0, 2)  # (nb, batch, n)

    if pauli == 'Z':
        if diag is None:
            raise ValueError("Z-basis noise simulation requires a diagonal")
        d = jnp.asarray(diag, jnp.float32)
    else:
        d = jnp.asarray(_pauli_sum_diag(n, offset, coeff))
    # Exact TOTAL shot budget: distribute shots over trajectories as
    # floor/floor+1 (first ``shots % n_traj`` trajectories get the extra
    # draw) and pool counts, so the estimator uses exactly ``shots``
    # multinomial draws — no silent under/overshoot when shots is not a
    # multiple of n_traj.  Pooled estimator Σ_t ⟨counts_t, d⟩ / shots is
    # unbiased (each trajectory is an independent channel realization).
    traj_shots = (jnp.asarray(distribute_shots(shots, n_traj))
                  if shots else None)
    batch = x.shape[0]
    gamma = None if damp_gamma is None else jnp.broadcast_to(
        jnp.asarray(damp_gamma, jnp.float32), (n,))

    def one(k, n_shots=None):
        kn, ks, kd, ku = jax.random.split(k, 4)
        a, b = sample_pauli_masks(kn, noise_p, nb, n)
        if dephase_p is not None:
            dp = jnp.broadcast_to(jnp.asarray(dephase_p, jnp.float32), (n,))
            b = b ^ jax.random.bernoulli(kd, dp, (nb, n))
        u = (jax.random.uniform(ku, (nb, n, batch))
             if gamma is not None else None)
        sr, si = _traj_forward(spec, utr, uti, xb, a, b, gamma, u)
        if pauli != 'Z':
            sr, si = rotate_to_pauli_basis(sr, si, pauli, n)
        probs = apply_readout_error(probs_pair(sr, si), readout_p)
        if n_shots is not None:
            # pooled-count contribution: outer mean over n_traj turns
            # n_traj·⟨counts, d⟩/shots into Σ_t ⟨counts_t, d⟩ / shots
            counts = sample_counts(ks, probs, n_shots)
            return jnp.einsum('bd,d->b', counts, d,
                              precision=jax.lax.Precision.HIGHEST) \
                * (n_traj / float(shots))
        return jnp.einsum('bd,d->b', probs, d,
                          precision=jax.lax.Precision.HIGHEST)

    keys = jax.random.split(key, n_traj)
    if traj_shots is not None:
        vals = jax.vmap(one)(keys, traj_shots)            # (T, batch)
    else:
        vals = jax.vmap(one)(keys)
    return jnp.mean(vals, axis=0)[:, None]


def noise_p_from_calibration(spec: HEASpec, gate_error_2q,
                             gate_error_1q=0.0):
    """Per-qubit per-block depolarizing prob from calibration gate errors
    (the numbers ibm_export.profile_hardware reads from backend
    properties).  Each HEA sublayer touches every qubit with three 1q
    rotations and two ring CNOTs (as control of one, target of another),
    and a block averages total_sublayers/n_blocks sublayers, so

        p ≈ (sublayers per block) · (2·err_2q + 3·err_1q)

    — a first-order union bound, clipped to [0, 1).  Returns a float.
    """
    sub_per_block = spec.total_sublayers / max(1, spec.n_blocks)
    p = sub_per_block * (2.0 * float(gate_error_2q)
                         + 3.0 * float(gate_error_1q))
    return float(np.clip(p, 0.0, 0.999))


def channel_params_from_t1t2(block_time_us, t1_us, t2_us):
    """(damp_gamma, dephase_p) per block from calibration T1/T2 times (the
    numbers ibm_export.profile_hardware reads from backend qubit
    properties) and the wall-time a block occupies on hardware.

    * amplitude damping:  γ = 1 − e^(−t/T1)
    * pure dephasing:     1/Tφ = 1/T2 − 1/(2·T1)  (clipped at 0 — T2 is
      physically ≤ 2·T1; calibration snapshots occasionally report
      T2 > 2·T1, which means T1-limited coherence and zero pure
      dephasing), then p_φ = (1 − e^(−t/Tφ))/2, the Z-flip prob whose
      twirled channel decays coherences by e^(−t/Tφ) = 1 − 2·p_φ.

    Returns plain floats, ready for noisy_expectation(damp_gamma=…,
    dephase_p=…).
    """
    t, t1, t2 = float(block_time_us), float(t1_us), float(t2_us)
    if t < 0 or t1 <= 0 or t2 <= 0:
        raise ValueError("block_time_us must be >= 0 and T1/T2 > 0")
    gamma = 1.0 - np.exp(-t / t1)
    inv_tphi = max(0.0, 1.0 / t2 - 0.5 / t1)
    p_phi = 0.5 * (1.0 - np.exp(-t * inv_tphi))
    return float(gamma), float(p_phi)
