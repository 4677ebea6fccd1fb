"""
Inference API tests: experiment-ID round-trip (logger -> dirname -> parsed
config), checkpoint loading via the public API, CLI on saved data.
"""
import os

import numpy as np
import pytest

from quanonet_tpu.infer import _parse_path, _resolve_config, evaluate
from quanonet_tpu.logger import get_experiment_id

REF = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'pretrained_weights/Antideriv/'
    'Antideriv_QuanONet_Net5-1-5-1_Q2_TF_S0.001_1000x100_Seed0/'
    'best_model.npz')
needs_ref = pytest.mark.skipif(not os.path.exists(REF),
                               reason="reference checkpoints not mounted")


def test_experiment_id_roundtrip():
    """The naming contract: get_experiment_id output parses back
    (reference logger.py:55-118 <-> infer.py:60-86)."""
    cfg = dict(operator='Antideriv', model_type='QuanONet',
               net_size=[5, 1, 5, 1], num_qubits=2,
               if_trainable_freq='true', scale_coeff=0.001,
               num_train=1000, num_points=100, seed=0)
    exp_id = get_experiment_id(cfg)
    parsed = _parse_path(f'/x/{exp_id}/best_model.npz')
    assert parsed['model_type'] == 'QuanONet'
    assert parsed['net_size'] == [5, 1, 5, 1]
    assert parsed['num_qubits'] == 2
    assert parsed['scale_coeff'] == 0.001
    assert parsed['if_trainable_freq'] is True


def test_parse_two_arg_net():
    parsed = _parse_path('/x/Darcy_HEAQNN_Net64-2_Q5_FF_S0.1_1000x25_Seed3/'
                         'final.ckpt')
    assert parsed['net_size'] == [64, 2]
    assert parsed['model_type'] == 'HEAQNN'
    assert parsed['if_trainable_freq'] is False


def test_resolve_config_overrides_win():
    cfg = _resolve_config('/x/Antideriv_QuanONet_Net5-1-5-1_Q2_TF_S0.001'
                          '_1000x100_Seed0/best_model.npz',
                          {'num_qubits': 3, 'net_size': None})
    assert cfg['num_qubits'] == 3          # override wins
    assert cfg['net_size'] == [5, 1, 5, 1]  # None override ignored


@needs_ref
def test_load_model_and_predict():
    from quanonet_tpu.infer import load_model, predict
    model, params, cfg = load_model(REF, branch_in=10, trunk_in=1)
    assert cfg['model_type'] == 'QuanONet'
    rng = np.random.RandomState(0)
    branch = rng.randn(7, 10).astype(np.float32)
    trunk = rng.rand(7, 1).astype(np.float32)
    preds = predict(model, params, branch, trunk, cfg=cfg)
    assert preds.shape == (7, 1)
    assert np.isfinite(preds).all()
    assert np.abs(preds).max() < 10  # bounded by ham + bias


def test_classical_checkpoint_roundtrip(tmp_path, monkeypatch):
    """Checkpoints written by the solver for CLASSICAL models load back
    through the public inference API and give identical predictions."""
    import jax
    import jax.numpy as jnp
    import quanonet_tpu.data.generation as gen
    monkeypatch.setattr(gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    monkeypatch.chdir(tmp_path)
    from quanonet_tpu.infer import load_model, predict
    from quanonet_tpu.solver import Solver

    np.random.seed(0)
    cfg = dict(operator='Antideriv', model_type='FNN', net_size=[2, 8],
               num_train=15, num_test=8, num_points=30, num_points_0=6,
               train_sample_num=4, test_sample_num=5, batch_size=60,
               num_epochs=5, learning_rate=0.01, seed=0, prefix='outputs')
    solver = Solver(cfg)
    history = solver.train()
    solver.evaluate(history)

    ckpt = os.path.join(solver.exp_logger.exp_dir, 'best_model.npz')
    model, params, mcfg = load_model(ckpt, branch_in=6, trunk_in=1)
    assert mcfg['model_type'] == 'FNN'
    assert mcfg['net_size'] == [2, 8]

    x = solver.test_inputs[0][:5]
    want = np.asarray(solver.model.apply(
        jax.tree_util.tree_map(jnp.asarray, solver.best_params),
        jnp.asarray(x)))
    got = predict(model, params, x[:, :6], x[:, 6:], cfg=mcfg)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_evaluate_metrics():
    y = np.array([[1.0], [2.0], [3.0]])
    m = evaluate(y, y)
    assert m['rel_l2'] == 0.0 and m['mse'] == 0.0 and m['mae'] == 0.0


# ── hamiltonian-ablation suffix round-trip (logger.py:81-90) ─────────────────

def test_parse_joined_floats():
    from quanonet_tpu.infer import _parse_joined_floats
    assert _parse_joined_floats('-9.0-9.0') == [-9.0, 9.0]
    assert _parse_joined_floats('3-5') == [3.0, 5.0]
    assert _parse_joined_floats('-5.0--2.5-2.5-5.0') == [-5.0, -2.5, 2.5, 5.0]
    assert _parse_joined_floats('1--1--1-1') == [1.0, -1.0, -1.0, 1.0]
    assert _parse_joined_floats('bogus') is None


def test_parse_path_ablation_suffixes():
    """_Pauli / _Ham / _Diag suffixes written by get_experiment_id parse
    back, so hamiltonian-study checkpoints round-trip through inference
    (they previously fell back to ham_bound=[-5,5] silently)."""
    p = _parse_path('/x/Antideriv_QuanONet_Net20-2-10-2_Q5_TF_S0.01'
                    '_PauliX_1000x100_Seed1/best_model.npz')
    assert p['ham_pauli'] == 'X'
    p = _parse_path('/x/Antideriv_QuanONet_Net20-2-10-2_Q5_TF_S0.01'
                    '_Ham-9.0-9.0_1000x100_Seed3/best_model.npz')
    assert p['ham_bound'] == [-9.0, 9.0]
    p = _parse_path('/x/Antideriv_QuanONet_Net50-2-50-2_Q2_TF_S0.01'
                    '_Diag-5.0--2.5-2.5-5.0_1000x100_Seed1/best_model.npz')
    assert p['ham_diag'] == [-5.0, -2.5, 2.5, 5.0]
    assert 'ham_bound' not in p   # Diag takes precedence


def test_ablation_id_roundtrip():
    for extra in ({'ham_pauli': 'Y'},
                  {'ham_bound': [-3.0, 3.0]},
                  {'ham_diag': [5.0, 0.0, 0.0, -5.0]}):
        cfg = dict(operator='Antideriv', model_type='QuanONet',
                   net_size=[20, 2, 10, 2], num_qubits=5,
                   if_trainable_freq='true', scale_coeff=0.01,
                   num_train=1000, num_points=100, seed=0, **extra)
        exp_id = get_experiment_id(cfg)
        parsed = _parse_path(f'/x/{exp_id}/best_model.npz')
        for k, v in extra.items():
            assert parsed[k] == v, (exp_id, k, parsed)


HAM_CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'hamiltonian_reproduction/Antideriv/'
    'Antideriv_QuanONet_Net20-2-10-2_Q5_TF_S0.01_Ham-9.0-9.0_1000x100_Seed3/'
    'best_model.npz')
HAM_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'data/Antideriv/Antideriv_1000_1000_100_100_10_100.npz')


@pytest.mark.skipif(not (os.path.exists(HAM_CKPT) and os.path.exists(HAM_DATA)),
                    reason="hamiltonian-study artifacts not present")
def test_hamiltonian_ckpt_golden_roundtrip():
    """A hamiltonian-study (_Ham-9.0-9.0) checkpoint loaded purely through
    the public inference API reproduces its recorded metric.json rel-L2 —
    i.e. the parsed ham_bound actually reaches the model."""
    import json
    from quanonet_tpu.infer import load_model, predict
    from quanonet_tpu.metrics import rel_l2

    with open(os.path.join(os.path.dirname(HAM_CKPT), 'metric.json')) as f:
        expected = json.load(f)['metrics']['rel_l2']
    d = np.load(HAM_DATA)
    model, params, cfg = load_model(HAM_CKPT, branch_in=100, trunk_in=1,
                                    scale_coeff=0.01)
    assert cfg['ham_bound'] == [-9.0, 9.0]
    preds = predict(model, params, d['test_branch_input'],
                    d['test_trunk_input'], cfg=cfg, batch_size=20000)
    got = rel_l2(d['test_output'], preds)
    # metric.json was produced on TPU (bf16 default matmul precision in
    # eval); this CPU f32 re-run shifts rel-L2 ~0.01.  The failure mode
    # guarded against (ham_bound silently defaulting to [-5,5]) scores
    # 0.447 — orders of magnitude outside this tolerance.
    assert abs(got - expected) < 0.015, (got, expected)


def test_resolve_inference_engine(monkeypatch):
    """Inference-only surfaces (infer/serve) prefer the forward-only
    pfused kernel at Q15-16 on TPU (4.9x/8.6x the fused forward,
    round 5); the differentiable auto path never selects it there."""
    import jax
    from quanonet_tpu.ops.hea import (
        resolve_engine, resolve_inference_engine,
    )
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    assert resolve_inference_engine('auto', 15) == 'pfused'
    assert resolve_inference_engine('auto', 16) == 'pfused'
    assert resolve_inference_engine('auto', 17) == 'fused'
    assert resolve_inference_engine('auto', 14) == resolve_engine('auto', 14)
    assert resolve_inference_engine('fused', 16) == 'fused'  # explicit wins
    monkeypatch.setattr(jax, 'default_backend', lambda: 'cpu')
    assert resolve_inference_engine('auto', 15) == 'fused'
