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
