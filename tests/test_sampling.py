"""
Finite-shot measurement sampling tests (ops/sampling.py).

Statistical contracts: the shot estimator is unbiased, its variance
matches the analytic shot_noise_std, sampled counts follow the state's
Born probabilities, and the X/Y measurement-basis rotation reproduces
the exact pauli_sum expectation in the infinite-shot limit.  Sampled
runs replay bit-identically under a fixed PRNG key.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanonet_tpu.ops.hea import (
    HEASpec, hea_expectation, hea_forward_pair, quanonet_spec,
)
from quanonet_tpu.ops.hamiltonian import simple_ham_diag, simple_ham_params
from quanonet_tpu.ops.sampling import (
    indices_to_bits, probs_pair, rotate_to_pauli_basis, sample_counts,
    sample_indices, shot_expectation, shot_expectation_pair, shot_noise_std,
)


def _rand_weights(spec, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(
        rng.uniform(-np.pi, np.pi, spec.weight_shape()).astype(np.float32))


def _rand_x(spec, batch, seed=1):
    rng = np.random.RandomState(seed)
    return jnp.asarray(
        rng.uniform(-2, 2, (batch, spec.total_encode)).astype(np.float32))


def _state(n_qubits=3, batch=4):
    spec = HEASpec(n_qubits, ((n_qubits, 1), (n_qubits, 1)))
    w = _rand_weights(spec)
    x = _rand_x(spec, batch)
    sr, si = hea_forward_pair(spec, w, x, engine='dense')
    return spec, w, x, sr, si


def test_probs_normalized():
    _, _, _, sr, si = _state()
    p = probs_pair(sr, si)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, atol=1e-6)
    assert np.all(np.asarray(p) >= 0)


def test_counts_sum_to_shots_and_replay():
    _, _, _, sr, si = _state()
    p = probs_pair(sr, si)
    key = jax.random.PRNGKey(7)
    c1 = sample_counts(key, p, 1000)
    c2 = sample_counts(key, p, 1000)
    np.testing.assert_allclose(np.asarray(c1.sum(-1)), 1000.0)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_indices_follow_born_probabilities():
    _, _, _, sr, si = _state(n_qubits=2, batch=2)
    p = np.asarray(probs_pair(sr, si))
    idx = sample_indices(jax.random.PRNGKey(3), jnp.asarray(p), 200_000)
    for b in range(p.shape[0]):
        freq = np.bincount(np.asarray(idx[b]), minlength=4) / 200_000
        # total-variation distance shrinks as 1/sqrt(shots)
        assert np.abs(freq - p[b]).sum() < 0.01


def test_indices_to_bits_little_endian():
    bits = np.asarray(indices_to_bits(jnp.asarray([5]), 3))[0]
    # 5 = 0b101: qubit0=1, qubit1=0, qubit2=1
    np.testing.assert_array_equal(bits, [1, 0, 1])


def test_shot_expectation_unbiased_within_4_sigma():
    spec, w, x, sr, si = _state()
    diag = jnp.asarray(simple_ham_diag(spec.n_qubits, -5, 5))
    exact = np.asarray(hea_expectation(spec, w, x, diag=diag,
                                       engine='dense'))
    shots = 100_000
    est = np.asarray(shot_expectation_pair(
        jax.random.PRNGKey(0), sr, si, diag, shots))
    std = np.asarray(shot_noise_std(sr, si, diag, shots))
    assert np.all(np.abs(est - exact) < 4.0 * std + 1e-6)


def test_empirical_variance_matches_analytic():
    _, _, _, sr, si = _state(batch=2)
    diag = jnp.asarray(simple_ham_diag(3, -5, 5))
    shots = 256
    keys = jax.random.split(jax.random.PRNGKey(1), 300)
    ests = jax.vmap(
        lambda k: shot_expectation_pair(k, sr, si, diag, shots))(keys)
    emp_std = np.asarray(jnp.std(ests, axis=0))[..., 0]
    ana_std = np.asarray(shot_noise_std(sr, si, diag, shots))[..., 0]
    # 300 draws pin the std to ~±12% (4/sqrt(2*300)); allow 25%
    np.testing.assert_allclose(emp_std, ana_std, rtol=0.25)


@pytest.mark.parametrize('pauli', ['X', 'Y'])
def test_basis_rotation_matches_exact_pauli_sum(pauli):
    spec, w, x, sr, si = _state()
    offset, coeff = simple_ham_params(spec.n_qubits, -3, 3)
    exact = np.asarray(hea_expectation(spec, w, x, pauli=pauli,
                                       offset=offset, coeff=coeff,
                                       engine='dense'))
    # infinite-shot limit: rotated probabilities dotted with the diagonal
    rr, ri = rotate_to_pauli_basis(sr, si, pauli, spec.n_qubits)
    from quanonet_tpu.ops.sampling import _pauli_sum_diag
    d = jnp.asarray(_pauli_sum_diag(spec.n_qubits, offset, coeff))
    lim = np.asarray(
        jnp.einsum('bd,d->b', probs_pair(rr, ri), d))[:, None]
    np.testing.assert_allclose(lim, exact, atol=1e-5)
    # and the sampled path is consistent at high shot count
    est = np.asarray(shot_expectation(
        jax.random.PRNGKey(2), spec, w, x, 200_000, pauli=pauli,
        offset=offset, coeff=coeff, engine='dense'))
    assert np.all(np.abs(est - exact) < 0.05)


def test_rotation_preserves_norm():
    _, _, _, sr, si = _state()
    for pauli in ('X', 'Y'):
        rr, ri = rotate_to_pauli_basis(sr, si, pauli, 3)
        norm = np.asarray((rr * rr + ri * ri).sum(-1))
        np.testing.assert_allclose(norm, 1.0, atol=1e-5)


def test_model_shots_rng_threading():
    """QuanONet(shots=...) samples via the 'shots' rng collection and the
    sampled mean over keys converges to the exact forward."""
    from quanonet_tpu.models import QuanONet

    kw = dict(num_qubits=2, branch_input_size=4, trunk_input_size=1,
              net_size=(2, 1, 2, 1), ham_bound=(-5.0, 5.0))
    model = QuanONet(**kw)
    b = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (6, 4)).astype(np.float32))
    t = jnp.asarray(np.linspace(0, 1, 6).astype(np.float32)[:, None])
    params = model.init(jax.random.PRNGKey(0), b, t)
    exact = np.asarray(model.apply(params, b, t))

    sampled_model = QuanONet(shots=4096, **kw)
    keys = jax.random.split(jax.random.PRNGKey(5), 64)
    sampled_fwd = jax.jit(jax.vmap(
        lambda k: sampled_model.apply(params, b, t, rngs={'shots': k})))
    outs = np.asarray(sampled_fwd(keys))
    # mean over 64 x 4096 shots: SE ~ range/sqrt(262k) << 0.05
    np.testing.assert_allclose(outs.mean(0), exact, atol=0.05)
    # replay determinism (same key, eager path)
    o1 = sampled_model.apply(params, b, t, rngs={'shots': keys[0]})
    o2 = sampled_model.apply(params, b, t, rngs={'shots': keys[0]})
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_infer_predict_with_shots(tmp_path):
    """load_model(shots=N) + predict round-trip on the shipped Antideriv
    checkpoint: sampled predictions track the exact ones at 10k shots."""
    import os
    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'pretrained_weights/Antideriv/'
        'Antideriv_QuanONet_Net5-1-5-1_Q2_TF_S0.001_1000x100_Seed0/'
        'best_model.npz')
    if not os.path.exists(ckpt):
        pytest.skip('shipped checkpoint not present')
    from quanonet_tpu.infer import load_model, predict
    rng = np.random.RandomState(0)
    branch = rng.uniform(-1, 1, (8, 10)).astype(np.float32)
    trunk = np.linspace(0, 1, 8).astype(np.float32)[:, None]

    model, params, cfg = load_model(ckpt, branch_in=10, trunk_in=1)
    exact = predict(model, params, branch, trunk, cfg=cfg)
    smodel, sparams, scfg = load_model(ckpt, branch_in=10, trunk_in=1,
                                       shots=10_000)
    sampled = predict(smodel, sparams, branch, trunk, cfg=scfg,
                      shot_seed=0)
    again = predict(smodel, sparams, branch, trunk, cfg=scfg, shot_seed=0)
    np.testing.assert_array_equal(sampled, again)
    # H range is [-5,5] -> shot std <= 5/sqrt(10k) = 0.05; allow 5 sigma
    assert np.max(np.abs(sampled - exact)) < 0.25
    assert np.any(sampled != exact)


def test_shot_predictions_ibm_path():
    """ibm_export.shot_predictions: sampled job emulation + analytic std
    on the shipped Antideriv checkpoint."""
    import os
    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'pretrained_weights/Antideriv/'
        'Antideriv_QuanONet_Net5-1-5-1_Q2_TF_S0.001_1000x100_Seed0/'
        'best_model.npz')
    if not os.path.exists(ckpt):
        pytest.skip('shipped checkpoint not present')
    from quanonet_tpu.checkpoint import load_raw
    from quanonet_tpu.ibm_export import ideal_predictions, shot_predictions

    raw = load_raw(ckpt)
    net_size = [5, 1, 5, 1]
    branch_vec = np.cos(np.pi * np.linspace(0, 1, 10))
    trunk_vec = np.linspace(0, 1, 16)
    ideal = ideal_predictions(raw, net_size, 2, branch_vec, trunk_vec)
    sampled, std = shot_predictions(raw, net_size, 2, branch_vec,
                                    trunk_vec, shots=10_000, seed=0)
    assert sampled.shape == std.shape == (16,)
    assert np.all(std > 0) and np.all(std < 5.0 / np.sqrt(10_000) + 1e-9)
    assert np.all(np.abs(sampled - ideal) < 5.0 * std + 1e-6)
