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
