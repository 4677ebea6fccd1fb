"""Regression tests for the round-3 review findings (shot-budget
accounting, shared is_noisy predicate, multi-seed grad-method routing)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanonet_tpu.ops.hea import quanonet_spec, init_ansatz_weights
from quanonet_tpu.ops.hamiltonian import simple_ham_diag
from quanonet_tpu.ops.noise import (
    distribute_shots, is_noisy, noisy_expectation,
)

KEY = jax.random.PRNGKey(7)


def test_distribute_shots_exact_budget():
    for shots, n_traj in [(100, 64), (100, 128), (64, 64), (5, 8), (1, 4),
                          (1000, 7)]:
        ts = distribute_shots(shots, n_traj)
        assert ts.shape == (n_traj,)
        assert ts.sum() == shots              # EXACT total budget
        assert ts.max() - ts.min() <= 1       # floor / floor+1 split


def test_noisy_expectation_fractional_budget_runs():
    # shots not a multiple of n_traj (old code under/overshot the budget)
    spec = quanonet_spec(2, (2, 1, 2, 1))
    w = init_ansatz_weights(KEY, spec)
    x = jnp.asarray(np.random.RandomState(0).randn(
        3, spec.total_encode).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(2, -5, 5))
    for shots, n_traj in [(5, 8), (100, 64)]:
        out = np.asarray(noisy_expectation(KEY, spec, w, x, 0.05, n_traj,
                                           diag=diag, shots=shots))
        assert out.shape == (3, 1) and np.isfinite(out).all()
        assert np.abs(out).max() <= 5.0 + 1e-5   # within ham bounds


def test_noisy_expectation_pooled_estimator_unbiased():
    # point-mass check: a noiseless circuit has a deterministic outcome
    # distribution per basis state only for trivial circuits; instead use
    # p=0 trajectories (all identical) — the pooled sampled estimate must
    # converge to the exact expectation as shots grow
    spec = quanonet_spec(2, (1, 1, 1, 1))
    w = init_ansatz_weights(KEY, spec)
    x = jnp.asarray(np.random.RandomState(1).randn(
        2, spec.total_encode).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(2, -5, 5))
    exact = np.asarray(noisy_expectation(KEY, spec, w, x, 0.0, 4,
                                         diag=diag))
    est = np.asarray(noisy_expectation(KEY, spec, w, x, 0.0, 7,
                                       diag=diag, shots=200_000))
    np.testing.assert_allclose(est, exact, atol=0.05)


def test_is_noisy_semantics():
    assert not is_noisy()
    assert not is_noisy(None, None, None, None)
    # explicit zero-strength channels are OFF (the ideal circuit)
    assert not is_noisy(0.0, 0.0, 0.0, 0.0)
    assert is_noisy(noise_p=0.01)
    assert is_noisy(readout_p=0.02)
    assert is_noisy(damp_gamma=0.1)
    assert is_noisy(dephase_p=0.003)
    # per-qubit arrays
    assert is_noisy(noise_p=np.array([0.0, 0.01]))
    assert not is_noisy(noise_p=np.zeros(3))


def test_zero_strength_channel_model_is_exactly_ideal():
    """A model with every channel param explicitly 0 must take the exact
    path (bit-identical to the ideal model), not a p=0 trajectory
    ensemble."""
    from quanonet_tpu.models import QuanONet
    kw = dict(num_qubits=2, branch_input_size=5, trunk_input_size=2,
              net_size=(2, 1, 2, 1), scale_coeff=0.1,
              if_trainable_freq=True)
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    t = jnp.asarray(rng.rand(4, 2).astype(np.float32))
    m0 = QuanONet(**kw)
    params = m0.init(jax.random.PRNGKey(0), b, t)
    ideal = np.asarray(m0.apply(params, b, t))
    mz = QuanONet(**kw, noise_p=0.0, readout_p=0.0, damp_gamma=0.0,
                  dephase_p=0.0)
    # no 'noise' rng needed: the zero-strength model IS the ideal model
    out = np.asarray(mz.apply(params, b, t))
    np.testing.assert_array_equal(out, ideal)


@pytest.mark.parametrize('cfg_extra', [
    {'grad_method': 'spsa'},
    {'grad_method': 'shift'},
    {'grad_method': 'shift', 'train_shots': 128},
])
def test_multiseed_routes_grad_method_to_sequential(monkeypatch, cfg_extra):
    """--grad_method/--train_shots must NOT fall through to the vmapped
    multi-seed path (which builds a plain-autodiff epoch and would
    silently mislabel the runs)."""
    from quanonet_tpu import multiseed
    calls = {}

    def fake_sequential(config, seeds):
        calls['seeds'] = list(seeds)
        return {s: None for s in seeds}

    monkeypatch.setattr(multiseed, '_train_seeds_sequential',
                        fake_sequential)
    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_qubits=2, net_size=[2, 1, 2, 1], multi_seed=[0, 1],
               **cfg_extra)
    out = multiseed.train_multi_seed(cfg)
    assert calls['seeds'] == [0, 1]
    assert set(out) == {0, 1}


def test_multiseed_autodiff_not_redirected(monkeypatch):
    """Plain autodiff configs must still reach the vmapped path (the
    redirect is only for shift/spsa/train_shots)."""
    from quanonet_tpu import multiseed
    hit = {}

    def fake_sequential(config, seeds):
        hit['sequential'] = True
        return {}

    def fake_completed(cfg, base_output_dir=None):
        hit['vmapped_probe'] = True
        return True              # report all seeds done -> early return

    monkeypatch.setattr(multiseed, '_train_seeds_sequential',
                        fake_sequential)
    monkeypatch.setattr(multiseed.ExperimentLogger, 'completed',
                        staticmethod(fake_completed))
    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_qubits=2, net_size=[2, 1, 2, 1], multi_seed=[0, 1])
    multiseed.train_multi_seed(cfg)
    assert hit.get('vmapped_probe') and 'sequential' not in hit
