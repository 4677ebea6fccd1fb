"""Zero-noise extrapolation (ops/mitigation.py) and noise-aware training
(--noise_p through Solver).

Validation strategy: algebraic identities for the Richardson weights,
exactness of 2-point ZNE on a channel that is exactly affine in the noise
scale, fixed-seed improvement of ZNE over the raw noisy value, and the
training-path contract (run-ID suffix round-trip, metric artifacts,
gradient flow, guard rails).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quanonet_tpu.data.generation as gen
from quanonet_tpu.ops.hamiltonian import simple_ham_diag
from quanonet_tpu.ops.hea import (hea_expectation, heaqnn_spec,
                                  quanonet_spec)
from quanonet_tpu.ops.mitigation import richardson_weights, zne_expectation
from quanonet_tpu.ops.noise import noisy_expectation

KEY = jax.random.PRNGKey(11)


# ── Richardson weights ──────────────────────────────────────────────────────

def test_richardson_weights_identities():
    for scales in [(1.0, 2.0), (1.0, 2.0, 3.0), (1.0, 1.5, 2.0, 3.0)]:
        w = richardson_weights(scales)
        c = np.asarray(scales)
        assert abs(w.sum() - 1.0) < 1e-12
        for k in range(1, len(scales)):          # kills orders 1..s-1
            assert abs(np.sum(w * c ** k)) < 1e-9
    np.testing.assert_allclose(richardson_weights((1.0, 2.0)), [2.0, -1.0])


def test_richardson_weights_validation():
    with pytest.raises(ValueError, match='distinct'):
        richardson_weights((1.0, 1.0))
    with pytest.raises(ValueError, match='positive'):
        richardson_weights((0.0, 1.0))


# ── ZNE at the expectation level ────────────────────────────────────────────

def test_zne_exact_for_affine_channel():
    """Single noise site (1-block spec, noise on qubit 0 only) + Z_0
    observable -> E(c·p) is exactly affine in c, so 2-point Richardson
    recovers the IDEAL value up to trajectory-sampling noise."""
    n = 2
    spec = heaqnn_spec(n, (1, 1))
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.randn(2, spec.total_encode).astype(np.float32))
    zdiag = jnp.asarray(np.array([1, -1, 1, -1], np.float32))
    p_vec = jnp.asarray(np.array([0.15, 0.0], np.float32))

    ideal = np.asarray(hea_expectation(spec, w, x, diag=zdiag,
                                       engine='dense'))
    noisy = np.asarray(noisy_expectation(KEY, spec, w, x, p_vec, 4096,
                                         diag=zdiag))
    zne = np.asarray(zne_expectation(KEY, spec, w, x, p_vec, 4096,
                                     scales=(1.0, 2.0), diag=zdiag))
    # raw noisy value is off by the (1-4p/3) contraction; ZNE cancels it
    np.testing.assert_allclose(noisy, (1 - 4 * 0.15 / 3) * ideal, atol=0.07)
    np.testing.assert_allclose(zne, ideal, atol=0.12)
    assert np.max(np.abs(zne - ideal)) < np.max(np.abs(noisy - ideal))


def test_zne_improves_multiblock(q2_setup):
    """Multi-block spec (polynomial channel): fixed-seed 3-point ZNE must
    land closer to ideal than the raw noisy evaluation."""
    spec, w, x, diag = q2_setup
    ideal = np.asarray(hea_expectation(spec, w, x, diag=diag,
                                       engine='dense'))
    noisy = np.asarray(noisy_expectation(KEY, spec, w, x, 0.08, 2048,
                                         diag=diag))
    zne = np.asarray(zne_expectation(KEY, spec, w, x, 0.08, 2048,
                                     scales=(1.0, 2.0, 3.0), diag=diag))
    assert np.linalg.norm(zne - ideal) < np.linalg.norm(noisy - ideal)


@pytest.fixture(scope='module')
def q2_setup():
    spec = quanonet_spec(2, (2, 1, 2, 1))
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.randn(3, spec.total_encode).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(2, -3, 3))
    return spec, w, x, diag


# ── ZNE at the prediction level ─────────────────────────────────────────────

def test_zne_predict_replayable_and_closer():
    from quanonet_tpu.infer import predict, zne_predict
    from quanonet_tpu.models import QuanONet

    kw = dict(num_qubits=2, branch_input_size=5, trunk_input_size=2,
              net_size=(2, 1, 2, 1), scale_coeff=0.1)
    rng = np.random.RandomState(4)
    b = rng.randn(6, 5).astype(np.float32)
    t = rng.rand(6, 2).astype(np.float32)
    cfg = {'model_type': 'QuanONet'}

    ideal_model = QuanONet(**kw)
    params = ideal_model.init(jax.random.PRNGKey(0), jnp.asarray(b),
                              jnp.asarray(t))
    ideal = predict(ideal_model, params, b, t, cfg=cfg)

    noisy_model = QuanONet(**kw, noise_p=0.1, noise_traj=256)
    noisy = predict(noisy_model, params, b, t, cfg=cfg, shot_seed=1)
    zne = zne_predict(noisy_model, params, b, t, cfg=cfg,
                      scales=(1.0, 2.0), shot_seed=1)
    zne2 = zne_predict(noisy_model, params, b, t, cfg=cfg,
                       scales=(1.0, 2.0), shot_seed=1)
    np.testing.assert_array_equal(zne, zne2)        # replayable
    assert np.linalg.norm(zne - ideal) < np.linalg.norm(noisy - ideal)

    with pytest.raises(ValueError, match='noise_p'):
        zne_predict(ideal_model, params, b, t, cfg=cfg)


# ── noise-aware training ────────────────────────────────────────────────────

@pytest.fixture()
def _isolate(tmp_path, monkeypatch):
    monkeypatch.setattr(gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    monkeypatch.chdir(tmp_path)
    np.random.seed(0)
    yield


def test_run_id_suffix_roundtrip():
    from quanonet_tpu.infer import _parse_path
    from quanonet_tpu.logger import get_experiment_id

    cfg = dict(operator='Antideriv', model_type='QuanONet',
               net_size=[2, 1, 2, 1], num_qubits=2, scale_coeff=0.01,
               if_trainable_freq='true', num_train=20, num_points=50,
               seed=0, noise_p=0.05, readout_p=0.01)
    eid = get_experiment_id(cfg)
    assert '_Noise0.05R0.01' in eid
    parsed = _parse_path(f'/x/{eid}/best_model.npz')
    assert parsed['noise_p'] == 0.05
    assert parsed['readout_p'] == 0.01

    cfg.pop('readout_p')
    eid2 = get_experiment_id(cfg)
    assert eid2.count('_Noise0.05') == 1 and 'R' not in eid2.split('_Noise')[1].split('_')[0]
    parsed2 = _parse_path(f'/x/{eid2}/best_model.npz')
    assert parsed2['noise_p'] == 0.05 and 'readout_p' not in parsed2


def test_noise_training_end_to_end(_isolate):
    """Solver with --noise_p: trains, writes artifacts under a _Noise run
    dir, loss decreases, metrics finite; the stochastic forward resamples
    trajectories per optimizer step."""
    from quanonet_tpu.solver import Solver

    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_train=20, num_test=10, num_points=50, num_points_0=10,
               train_sample_num=5, test_sample_num=10,
               batch_size=25, num_epochs=8, learning_rate=0.01,
               num_qubits=2, net_size=[2, 1, 2, 1],
               scale_coeff=0.01, if_trainable_freq='true',
               ham_bound=[-5, 5], ham_pauli='Z', seed=0,
               prefix='outputs', noise_p=0.05, noise_traj=2,
               readout_p=0.02)
    solver = Solver(cfg)
    assert '_Noise0.05R0.02' in solver.run_id
    history = solver.train()
    metrics = solver.evaluate(history)
    assert np.isfinite(metrics['rel_l2'])
    losses = history['loss_train']
    assert len(losses) == 8 and losses[-1] < losses[0]
    assert os.path.exists(os.path.join(solver.exp_logger.exp_dir,
                                       'metric.json'))
    args_file = os.path.join(solver.exp_logger.exp_dir, 'train_args.json')
    assert json.load(open(args_file))['noise_p'] == 0.05


def test_noise_training_guards(_isolate):
    from quanonet_tpu.solver import Solver

    base = dict(operator='Antideriv', num_train=20, num_test=10,
                num_points=50, num_points_0=10, train_sample_num=5,
                test_sample_num=10, batch_size=25, num_epochs=2,
                learning_rate=0.01, seed=0, prefix='outputs')
    with pytest.raises(ValueError, match='quantum models'):
        Solver(dict(base, model_type='FNN', net_size=[2, 8],
                    noise_p=0.05))
    # noise x dp composes since round 5
    # (tests/test_parallel.py::test_noisy_dp_solver_end_to_end); the
    # remaining single-device restrictions are shift/spsa/train_shots
    s = Solver(dict(base, model_type='QuanONet', num_qubits=2,
                    net_size=[2, 1, 2, 1], grad_method='shift',
                    num_devices=2))
    with pytest.raises(ValueError, match='single-device'):
        s.train()
