"""Pauli-twirled noise trajectories (ops/noise.py).

Validation strategy: exact-channel branch enumeration (deterministic),
an independent NumPy complex-Pauli oracle for the X^a Z^b mechanics,
statistical convergence of the trajectory sampler, exact readout-channel
kron check, and bit-identical replay.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanonet_tpu.ops.hea import (hea_expectation, hea_forward_pair,
                                  heaqnn_spec, init_ansatz_weights,
                                  quanonet_spec)
from quanonet_tpu.ops.hamiltonian import simple_ham_diag
from quanonet_tpu.ops.noise import (apply_pauli_xz, apply_readout_error,
                                    noise_p_from_calibration,
                                    noisy_expectation)

KEY = jax.random.PRNGKey(7)


def _setup(n=2, net=(2, 1, 2, 1), batch=3, seed=0):
    spec = quanonet_spec(n, net)
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.randn(batch, spec.total_encode).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(n, -3, 3))
    return spec, w, x, diag


def test_zero_noise_matches_exact():
    spec, w, x, diag = _setup()
    exact = hea_expectation(spec, w, x, diag=diag, engine='dense')
    noisy = noisy_expectation(KEY, spec, w, x, 0.0, 4, diag=diag)
    np.testing.assert_allclose(np.asarray(noisy), np.asarray(exact),
                               atol=1e-5)


def test_pauli_xz_vs_numpy_oracle():
    """apply_pauli_xz against literal complex Pauli matrices, incl. the
    Y = i·XZ phase equivalence (expectations are phase-invariant, but the
    state itself must match up to one global phase)."""
    n = 2
    rng = np.random.RandomState(3)
    psi = rng.randn(2, 4) + 1j * rng.randn(2, 4)
    psi /= np.linalg.norm(psi, axis=1, keepdims=True)
    I2 = np.eye(2)
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    Z = np.array([[1, 0], [0, -1]], dtype=complex)
    Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
    # little-endian: qubit 0 is the LEAST significant bit -> op on qubit q
    # is kron(I..., P, ...I) with P in position (n-1-q) of the kron chain
    for q in range(n):
        def full(P, q=q):
            mats = [I2] * n
            mats[n - 1 - q] = P
            out = mats[0]
            for m in mats[1:]:
                out = np.kron(out, m)
            return out
        sr = jnp.asarray(psi.real.astype(np.float32))
        si = jnp.asarray(psi.imag.astype(np.float32))
        for (a, b), P in [((1, 0), X), ((0, 1), Z), ((1, 1), Y)]:
            gr, gi = apply_pauli_xz(sr, si, q, jnp.bool_(a), jnp.bool_(b), n)
            got = np.asarray(gr) + 1j * np.asarray(gi)
            want = psi @ full(P).T
            # up to a global phase (i for the Y case)
            phase = want[0, np.argmax(np.abs(want[0]))] / \
                got[0, np.argmax(np.abs(want[0]))]
            np.testing.assert_allclose(got * phase, want, atol=1e-6)
            assert abs(abs(phase) - 1.0) < 1e-6


def _branch_enumerated_channel(spec, w, x, diag, p, q):
    """Exact depolarizing-channel value for noise on qubit q after the
    final block only: (1-p)·E + (p/3)·Σ_{P∈{X,Y,Z}} E[P ψ]."""
    sr, si = hea_forward_pair(spec, w, x, engine='dense')
    d = jnp.asarray(diag)

    def e(sr, si):
        probs = (sr * sr + si * si)
        probs = probs / probs.sum(axis=1, keepdims=True)
        return np.asarray(probs @ d)

    ideal = e(sr, si)
    branches = []
    for a, b in [(1, 0), (1, 1), (0, 1)]:          # X, Y, Z
        gr, gi = apply_pauli_xz(sr, si, q, jnp.bool_(a), jnp.bool_(b),
                                spec.n_qubits)
        branches.append(e(gr, gi))
    return (1 - p) * ideal + (p / 3.0) * np.sum(branches, axis=0), ideal


def test_trajectory_mean_converges_to_exact_channel():
    """Single-block spec -> the only noise site is after the last block,
    so the exact channel value is a 4-branch enumeration; the trajectory
    mean must converge to it (and, for a Z_q observable, to the analytic
    (1-4p/3) contraction)."""
    n, p, q = 2, 0.4, 0
    spec = heaqnn_spec(n, (1, 1))
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.randn(2, spec.total_encode).astype(np.float32))
    p_vec = jnp.asarray(np.array([p, 0.0], np.float32))

    # observable 1: generic diagonal, vs branch enumeration
    diag = jnp.asarray(simple_ham_diag(n, -3, 3))
    want, _ = _branch_enumerated_channel(spec, w, x, diag, p, q)
    got = noisy_expectation(KEY, spec, w, x, p_vec, 4096, diag=diag)
    np.testing.assert_allclose(np.asarray(got)[:, 0], want, atol=0.12)

    # observable 2: Z_0 -> analytic depolarizing contraction (1 - 4p/3)
    zdiag = jnp.asarray(np.array([1, -1, 1, -1], np.float32))
    want_z, ideal_z = _branch_enumerated_channel(spec, w, x, zdiag, p, q)
    np.testing.assert_allclose(want_z, (1 - 4 * p / 3) * ideal_z, atol=1e-6)
    got_z = noisy_expectation(KEY, spec, w, x, p_vec, 4096, diag=zdiag)
    np.testing.assert_allclose(np.asarray(got_z)[:, 0], want_z, atol=0.07)


def test_readout_error_exact_kron():
    n = 2
    rng = np.random.RandomState(5)
    probs = rng.rand(3, 4).astype(np.float32)
    probs /= probs.sum(axis=1, keepdims=True)
    ro = np.array([0.03, 0.1], np.float32)
    # T[k', k] = prod_q (ro_q if bit q flips else 1-ro_q)
    T = np.zeros((4, 4), np.float32)
    for kk in range(4):
        for k in range(4):
            v = 1.0
            for q in range(n):
                flip = ((kk >> q) & 1) != ((k >> q) & 1)
                v *= ro[q] if flip else 1 - ro[q]
            T[kk, k] = v
    want = probs @ T.T
    got = np.asarray(apply_readout_error(jnp.asarray(probs),
                                         jnp.asarray(ro)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-5)


def test_replay_bit_identical_and_key_sensitivity():
    spec, w, x, diag = _setup()
    a = noisy_expectation(KEY, spec, w, x, 0.2, 16, diag=diag)
    b = noisy_expectation(KEY, spec, w, x, 0.2, 16, diag=diag)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    c = noisy_expectation(jax.random.PRNGKey(8), spec, w, x, 0.2, 16,
                          diag=diag)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_pauli_observable_and_shots_paths():
    spec, w, x, _ = _setup()
    for pauli in ('X', 'Y'):
        out = noisy_expectation(KEY, spec, w, x, 0.05, 8, pauli=pauli,
                                offset=1.0, coeff=0.5, shots=64)
        out = np.asarray(out)
        assert out.shape == (x.shape[0], 1)
        assert np.isfinite(out).all()


def test_shots_compose_with_noise():
    """Finite-shot noisy estimate converges to the exact noisy value."""
    spec, w, x, diag = _setup(batch=2)
    exact = noisy_expectation(KEY, spec, w, x, 0.1, 256, diag=diag)
    sampled = noisy_expectation(KEY, spec, w, x, 0.1, 256, diag=diag,
                                shots=256 * 512)
    np.testing.assert_allclose(np.asarray(sampled), np.asarray(exact),
                               atol=0.15)


def test_readout_in_noisy_expectation_zero_traj_noise():
    """readout_p alone (noise_p=0) must equal the exact expectation of the
    readout-channel-transformed distribution — deterministic."""
    spec, w, x, diag = _setup()
    sr, si = hea_forward_pair(spec, w, x, engine='dense')
    probs = sr * sr + si * si
    probs = probs / probs.sum(axis=1, keepdims=True)
    want = np.asarray(apply_readout_error(probs, 0.07) @ diag)
    got = noisy_expectation(KEY, spec, w, x, 0.0, 2, diag=diag,
                            readout_p=0.07)
    np.testing.assert_allclose(np.asarray(got)[:, 0], want, atol=1e-5)


def test_noise_p_from_calibration():
    spec = quanonet_spec(5, (40, 2, 20, 2))
    p1 = noise_p_from_calibration(spec, 0.005)
    p2 = noise_p_from_calibration(spec, 0.01)
    assert 0.0 < p1 < p2 < 1.0
    assert noise_p_from_calibration(spec, 0.0) == 0.0
    # huge error rates clip below 1
    assert noise_p_from_calibration(spec, 0.5) < 1.0


def test_model_integration_and_predict():
    """QuanONet with noise fields: zero-noise output equals the exact
    model bit-for-mathematically; predict() threads the 'noise' rng."""
    from quanonet_tpu.infer import predict
    from quanonet_tpu.models import QuanONet

    kw = dict(num_qubits=2, branch_input_size=5, trunk_input_size=2,
              net_size=(2, 1, 2, 1), scale_coeff=0.1)
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    t = jnp.asarray(rng.rand(4, 2).astype(np.float32))

    exact_model = QuanONet(**kw)
    params = exact_model.init(jax.random.PRNGKey(0), b, t)
    exact = np.asarray(exact_model.apply(params, b, t))

    noisy_model = QuanONet(**kw, noise_p=0.0, noise_traj=2)
    zero = np.asarray(noisy_model.apply(params, b, t,
                                        rngs={'noise': KEY}))
    np.testing.assert_allclose(zero, exact, atol=1e-5)

    noisy_model2 = QuanONet(**kw, noise_p=0.3, noise_traj=8,
                            readout_p=0.05)
    out = predict(noisy_model2, params, np.asarray(b), np.asarray(t),
                  cfg={'model_type': 'QuanONet'}, shot_seed=3)
    assert out.shape == exact.shape and np.isfinite(out).all()
    out2 = predict(noisy_model2, params, np.asarray(b), np.asarray(t),
                   cfg={'model_type': 'QuanONet'}, shot_seed=3)
    np.testing.assert_array_equal(out, out2)   # replayable


def test_nonuniform_spec_rejected():
    from quanonet_tpu.ops.hea import HEASpec
    spec = HEASpec(2, ((2, 1), (1, 1)))
    w = jnp.zeros(spec.weight_shape())
    x = jnp.zeros((1, spec.total_encode))
    with pytest.raises(ValueError, match='uniform-encode'):
        noisy_expectation(KEY, spec, w, x, 0.1, 2,
                          diag=jnp.zeros(4))


# ── T1/T2 channels: amplitude damping (MCWF) + pure dephasing ──────────────

def _kron_op(P, q, n):
    """Lift 2x2 P onto qubit q (little-endian: q=0 least significant)."""
    I2 = np.eye(2, dtype=complex)
    mats = [I2] * n
    mats[n - 1 - q] = P
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out


def _dm_oracle(spec, w, x, diag, p_dep, p_phi, gamma):
    """Exact density-matrix evolution of the composed noise model, fully
    independent of the trajectory code: encode ⊗RX → U_b → per-qubit
    depolarizing → per-qubit dephasing → per-qubit amplitude damping
    (Kraus), per block.  Complex128 NumPy; returns (batch,) ⟨diag⟩."""
    from quanonet_tpu.ops.hea import compile_block_unitaries
    n, nb, D = spec.n_qubits, spec.n_blocks, spec.dim
    ur, ui = compile_block_unitaries(spec, w)
    U = np.asarray(ur, np.float64) + 1j * np.asarray(ui, np.float64)
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
    Z = np.array([[1, 0], [0, -1]], dtype=complex)
    K0 = np.array([[1, 0], [0, np.sqrt(1 - gamma)]], dtype=complex)
    K1 = np.array([[0, np.sqrt(gamma)], [0, 0]], dtype=complex)

    def rx(theta):
        c, s = np.cos(theta / 2), np.sin(theta / 2)
        return np.array([[c, -1j * s], [-1j * s, c]])

    xb = np.asarray(x, np.float64).reshape(-1, nb, n)
    h = np.asarray(diag, np.float64)
    outs = []
    for s in range(xb.shape[0]):
        rho = np.zeros((D, D), dtype=complex)
        rho[0, 0] = 1.0
        for b in range(nb):
            E = np.eye(D, dtype=complex)
            for q in range(n):
                E = _kron_op(rx(xb[s, b, q]), q, n) @ E
            V = U[b] @ E
            rho = V @ rho @ V.conj().T
            for q in range(n):
                rho = (1 - p_dep) * rho + (p_dep / 3) * sum(
                    _kron_op(P, q, n) @ rho @ _kron_op(P, q, n).conj().T
                    for P in (X, Y, Z))
            for q in range(n):
                Zq = _kron_op(Z, q, n)
                rho = (1 - p_phi) * rho + p_phi * (Zq @ rho @ Zq.conj().T)
            for q in range(n):
                A0, A1 = _kron_op(K0, q, n), _kron_op(K1, q, n)
                rho = A0 @ rho @ A0.conj().T + A1 @ rho @ A1.conj().T
        outs.append(float(np.real(np.sum(np.diag(rho) * h))))
    return np.array(outs)


def test_dm_oracle_matches_ideal_at_zero_noise():
    """Frame/convention self-check of the oracle: with every channel off
    it must reproduce the dense engine exactly."""
    spec, w, x, diag = _setup(batch=2)
    want = np.asarray(hea_expectation(spec, w, x, diag=diag,
                                      engine='dense'))[:, 0]
    got = _dm_oracle(spec, w, x, diag, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_composed_channels_vs_density_matrix_oracle():
    """Trajectory mean (dep + dephase + damp together) vs the exact
    density-matrix channel value."""
    spec, w, x, diag = _setup(batch=2)
    p_dep, p_phi, gamma = 0.15, 0.10, 0.20
    want = _dm_oracle(spec, w, x, diag, p_dep, p_phi, gamma)
    got = np.asarray(noisy_expectation(
        KEY, spec, w, x, p_dep, 8192, diag=diag,
        damp_gamma=gamma, dephase_p=p_phi))[:, 0]
    np.testing.assert_allclose(got, want, atol=0.1)

    # damping-only, tighter: the only stochastic element is the jump draw
    want_d = _dm_oracle(spec, w, x, diag, 0.0, 0.0, 0.35)
    got_d = np.asarray(noisy_expectation(
        KEY, spec, w, x, 0.0, 8192, diag=diag, damp_gamma=0.35))[:, 0]
    np.testing.assert_allclose(got_d, want_d, atol=0.1)


def test_full_damping_resets_to_ground():
    """γ=1: after the last block every qubit is reset to |0⟩ on BOTH MCWF
    branches, so ⟨Z_0⟩ = +1 exactly for every trajectory — deterministic,
    no statistical tolerance."""
    spec, w, x, _ = _setup(batch=3)
    zdiag = jnp.asarray(np.array([1, -1, 1, -1], np.float32))
    got = np.asarray(noisy_expectation(KEY, spec, w, x, 0.0, 8,
                                       diag=zdiag, damp_gamma=1.0))
    np.testing.assert_allclose(got, 1.0, atol=1e-5)


def test_amplitude_damping_unit_properties():
    """γ=0 is the identity; any γ preserves the norm on both branches."""
    from quanonet_tpu.ops.noise import apply_amplitude_damping
    rng = np.random.RandomState(11)
    psi = rng.randn(4, 8) + 1j * rng.randn(4, 8)
    psi /= np.linalg.norm(psi, axis=1, keepdims=True)
    sr = jnp.asarray(psi.real.astype(np.float32))
    si = jnp.asarray(psi.imag.astype(np.float32))
    u = jnp.asarray(rng.rand(4).astype(np.float32))
    for q in range(3):
        gr, gi = apply_amplitude_damping(sr, si, q, jnp.float32(0.0), u, 3)
        np.testing.assert_allclose(np.asarray(gr), psi.real.astype(np.float32),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(gi), psi.imag.astype(np.float32),
                                   atol=1e-6)
        for gamma in (0.3, 0.9):
            gr, gi = apply_amplitude_damping(sr, si, q, jnp.float32(gamma),
                                             u, 3)
            norms = np.sum(np.asarray(gr) ** 2 + np.asarray(gi) ** 2, axis=1)
            np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_channel_params_from_t1t2():
    from quanonet_tpu.ops.noise import channel_params_from_t1t2
    # zero duration -> no decay
    assert channel_params_from_t1t2(0.0, 100.0, 80.0) == (0.0, 0.0)
    g, p = channel_params_from_t1t2(1.0, 100.0, 80.0)
    assert 0 < g < 1 and 0 < p < 0.5
    np.testing.assert_allclose(g, 1 - np.exp(-1 / 100), rtol=1e-12)
    np.testing.assert_allclose(p, 0.5 * (1 - np.exp(-(1 / 80 - 1 / 200))),
                               rtol=1e-12)
    # T1-limited coherence (T2 = 2 T1) -> zero pure dephasing; clip beyond
    assert channel_params_from_t1t2(1.0, 100.0, 200.0)[1] == 0.0
    assert channel_params_from_t1t2(1.0, 100.0, 500.0)[1] == 0.0
    # longer block -> more decay
    g2, p2 = channel_params_from_t1t2(2.0, 100.0, 80.0)
    assert g2 > g and p2 > p
    with pytest.raises(ValueError):
        channel_params_from_t1t2(1.0, -1.0, 80.0)


def test_model_t1t2_integration():
    """damp_gamma/dephase_p thread through the flax model and infer.predict;
    zero-strength channels reproduce the ideal forward; ZNE refuses to
    extrapolate non-depolarizing channels."""
    from quanonet_tpu.models import QuanONet
    from quanonet_tpu.infer import predict
    kw = dict(num_qubits=2, branch_input_size=5, trunk_input_size=2,
              net_size=(2, 1, 2, 1), scale_coeff=0.1,
              if_trainable_freq=True)
    rng = np.random.RandomState(0)
    b = rng.randn(4, 5).astype(np.float32)
    t = rng.rand(4, 2).astype(np.float32)
    m0 = QuanONet(**kw)
    params = m0.init(jax.random.PRNGKey(0), jnp.asarray(b), jnp.asarray(t))
    ideal = np.asarray(m0.apply(params, jnp.asarray(b), jnp.asarray(t)))

    m_eq = QuanONet(**kw, damp_gamma=0.0, dephase_p=0.0, noise_traj=4)
    out_eq = np.asarray(m_eq.apply(params, jnp.asarray(b), jnp.asarray(t),
                                   rngs={'noise': KEY}))
    np.testing.assert_allclose(out_eq, ideal, atol=1e-5)

    m = QuanONet(**kw, damp_gamma=0.3, dephase_p=0.05, noise_traj=16)
    p1 = predict(m, params, b, t, cfg={'model_type': 'QuanONet'},
                 shot_seed=2)
    p2 = predict(m, params, b, t, cfg={'model_type': 'QuanONet'},
                 shot_seed=2)
    np.testing.assert_array_equal(p1, p2)         # replayable
    assert np.isfinite(p1).all()
    assert not np.allclose(p1, ideal, atol=1e-3)  # channels act

    m_bad = QuanONet(**kw, noise_p=0.1, damp_gamma=0.3,
                     zne_scales=(1.0, 2.0), noise_traj=4)
    with pytest.raises(ValueError, match='depolarizing'):
        m_bad.apply(params, jnp.asarray(b), jnp.asarray(t),
                    rngs={'noise': KEY})


def test_t1t2_runid_roundtrip():
    """_Noise{p}[R][G][F] suffix: logger writes damp/dephase components,
    infer._parse_path recovers them (the run-ID contract for T1/T2
    noise-aware training)."""
    from quanonet_tpu.infer import _parse_path
    from quanonet_tpu.logger import get_experiment_id

    cfg = dict(operator='Antideriv', model_type='QuanONet',
               net_size=[2, 1, 2, 1], num_qubits=2, scale_coeff=0.01,
               if_trainable_freq='true', num_train=20, num_points=50,
               seed=0, noise_p=0.05, readout_p=0.01, damp_gamma=0.02,
               dephase_p=0.004)
    eid = get_experiment_id(cfg)
    assert '_Noise0.05R0.01G0.02F0.004' in eid
    parsed = _parse_path(f'/x/{eid}/best_model.npz')
    assert parsed['noise_p'] == 0.05 and parsed['readout_p'] == 0.01
    assert parsed['damp_gamma'] == 0.02 and parsed['dephase_p'] == 0.004

    # damping-only (no depolarizing): p encodes as 0 -> parsed None
    cfg2 = dict(cfg, noise_p=None, readout_p=None, dephase_p=None)
    eid2 = get_experiment_id(cfg2)
    assert '_Noise0G0.02' in eid2
    parsed2 = _parse_path(f'/x/{eid2}/best_model.npz')
    assert parsed2['noise_p'] is None and parsed2['damp_gamma'] == 0.02
    assert 'dephase_p' not in parsed2

    # legacy suffix still parses
    parsed3 = _parse_path('/x/A_QuanONet_Net2-1-2-1_Q2_TF_S0.01_'
                          'Noise0.05R0.01_20x50_Seed0/best_model.npz')
    assert parsed3['noise_p'] == 0.05 and parsed3['readout_p'] == 0.01
    assert 'damp_gamma' not in parsed3


def test_t1t2_training_end_to_end(tmp_path, monkeypatch):
    """Solver trains THROUGH the T1/T2 channel (MCWF trajectories are
    differentiable almost everywhere, like dropout): loss decreases,
    run dir carries the G/F suffix, artifacts written."""
    import os
    import quanonet_tpu.data.generation as gen
    from quanonet_tpu.solver import Solver
    monkeypatch.setattr(gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    monkeypatch.chdir(tmp_path)
    np.random.seed(0)

    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_train=20, num_test=10, num_points=50, num_points_0=10,
               train_sample_num=5, test_sample_num=10,
               batch_size=25, num_epochs=8, learning_rate=0.01,
               num_qubits=2, net_size=[2, 1, 2, 1],
               scale_coeff=0.01, if_trainable_freq='true',
               ham_bound=[-5, 5], ham_pauli='Z', seed=0,
               prefix='outputs', damp_gamma=0.02, dephase_p=0.005,
               noise_traj=2)
    solver = Solver(cfg)
    assert '_Noise0G0.02F0.005' in solver.run_id
    history = solver.train()
    metrics = solver.evaluate(history)
    assert np.isfinite(metrics['rel_l2'])
    losses = history['loss_train']
    assert len(losses) == 8 and losses[-1] < losses[0]
    assert os.path.exists(os.path.join(solver.exp_logger.exp_dir,
                                       'metric.json'))
