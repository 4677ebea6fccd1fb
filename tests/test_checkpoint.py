"""
Checkpoint interchange tests: MindSpore .ckpt protobuf parsing, .npz key
schema round-trip, and the GOLDEN PARITY GATE — the shipped Antideriv Q2
checkpoint must reproduce the reference's demo accuracy (Rel-L2 0.1192,
reference README.md:148) on regenerated test data.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanonet_tpu.checkpoint import (
    load_ms_ckpt, load_raw, quantum_params_from_raw, quantum_params_to_raw,
    save_npz, unflatten_tree, flatten_tree,
)

REF_WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'pretrained_weights')
ANTIDERIV_NPZ = os.path.join(
    REF_WEIGHTS, 'Antideriv',
    'Antideriv_QuanONet_Net5-1-5-1_Q2_TF_S0.001_1000x100_Seed0',
    'best_model.npz')
ADVECTION_CKPT = os.path.join(
    REF_WEIGHTS, 'Advection',
    'Advection_QuanONet_Net40-2-20-2_Q5_TF_S0.1_1000x100_Seed0',
    'best_model.ckpt')

needs_ref = pytest.mark.skipif(not os.path.isdir(REF_WEIGHTS),
                               reason="reference checkpoints not mounted")


@needs_ref
def test_ms_ckpt_parser_shapes():
    d = load_ms_ckpt(ADVECTION_CKPT)
    assert d['bias'].shape == ()
    assert d['QuanONet.weight'].shape == (1800,)   # 120 sublayers x 3 x 5
    assert d['branch_LinearLayer.Net2.weights'].shape == (200,)
    assert d['trunk_LinearLayer.Net2.bias'].shape == (100,)
    assert d['QuanONet.weight'].dtype == np.float32
    assert np.isfinite(d['QuanONet.weight']).all()


@needs_ref
def test_npz_to_params_and_back():
    raw = load_raw(ANTIDERIV_NPZ)
    params = quantum_params_from_raw(raw, 'QuanONet', (5, 1, 5, 1), 2, True)
    p = params['params']
    assert p['ansatz'].shape == (10, 3, 2)
    # flat layout: sublayer-major, [RY, RZ, RY'] within each sublayer
    np.testing.assert_array_equal(p['ansatz'].reshape(-1),
                                  raw['QuanONet.weight'])
    back = quantum_params_to_raw(params, 'QuanONet')
    for k in raw:
        np.testing.assert_array_equal(back[k], raw[k])


def test_wrong_net_size_raises():
    raw = {'QuanONet.weight': np.zeros(60, np.float32),
           'bias': np.zeros((), np.float32)}
    with pytest.raises(ValueError, match="expected"):
        quantum_params_from_raw(raw, 'QuanONet', (40, 2, 20, 2), 5, False)


def test_flatten_unflatten_roundtrip(tmp_path):
    tree = {'params': {'a': np.ones((2, 3), np.float32),
                       'nested': {'b': np.zeros(4, np.float32)}}}
    flat = flatten_tree(tree)
    assert set(flat) == {'a', 'nested.b'}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back['params']['nested']['b'],
                                  tree['params']['nested']['b'])
    save_npz(str(tmp_path / 'm.npz'), tree, 'FNN')
    d = np.load(tmp_path / 'm.npz')
    assert set(d.files) == {'a', 'nested.b'}


@needs_ref
@pytest.mark.parametrize("op,ckpt_dir,dcfg,max_rel", [
    ('Darcy', 'Darcy/Darcy_QuanONet_Net40-2-20-2_Q5_TF_S0.1_1000x25_Seed0',
     dict(num_points=25, num_points_0=100, train_sample_num=100,
          test_sample_num=200), 0.15),
    ('RDiffusion',
     'RDiffusion/RDiffusion_QuanONet_Net40-2-20-2_Q5_TF_S0.1_1000x100_Seed0',
     dict(num_points=100, num_points_0=100, train_sample_num=100,
          test_sample_num=200), 0.15),
    # the headline-metric anchor: full-size regeneration scores 0.1697
    # (docs/BENCHMARKS.md quality table); small resample band is wider
    ('Advection',
     'Advection/Advection_QuanONet_Net40-2-20-2_Q5_TF_S0.1_1000x100_Seed0',
     dict(num_points=100, num_points_0=100, train_sample_num=100,
          test_sample_num=200), 0.25),
])
def test_golden_pde_checkpoints(tmp_path, monkeypatch, op, ckpt_dir, dcfg,
                                max_rel):
    """The shipped Q5 PDE .ckpt checkpoints produce trained-model-quality
    rel-L2 on regenerated data (validates the whole PDE pipeline: solvers,
    boundary/2-D interpolation, encoders, protobuf parsing, Q5 circuit).
    Full-size runs give Darcy 0.074 / RDiffusion 0.070."""
    import quanonet_tpu.data.generation as gen
    monkeypatch.setattr(gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    from quanonet_tpu.data.manager import DataManager
    from quanonet_tpu.infer import evaluate, load_model, predict

    np.random.seed(0)
    cfg = dict(operator=op, model_type='QuanONet', num_train=2,
               num_test=15, **dcfg)
    data = DataManager(cfg, data_dir=str(tmp_path / 'proc')).get_data()
    model, params, mcfg = load_model(os.path.join(REF_WEIGHTS, ckpt_dir,
                                                  'best_model.ckpt'),
                                     branch_in=100, trunk_in=2)
    preds = predict(model, params, data['test_branch_input'],
                    data['test_trunk_input'], cfg=mcfg, batch_size=4096)
    m = evaluate(preds, data['test_output'])
    assert m['rel_l2'] < max_rel, m


@needs_ref
def test_golden_antideriv_parity(tmp_path, monkeypatch):
    """Shipped Q2 checkpoint -> Rel-L2 ~ 0.119 on regenerated seed-0 data
    (reference README.md:137-155 demo; 'same order of magnitude across
    platforms')."""
    import quanonet_tpu.data.generation as gen
    monkeypatch.setattr(gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    from quanonet_tpu.data.manager import DataManager
    from quanonet_tpu.models.quanonet import QuanONet

    np.random.seed(0)
    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_train=40, num_test=200, num_points=100, num_points_0=10,
               train_sample_num=10, test_sample_num=100)
    data = DataManager(cfg, data_dir=str(tmp_path / 'proc')).get_data()

    raw = load_raw(ANTIDERIV_NPZ)
    params = jax.tree_util.tree_map(
        jnp.asarray, quantum_params_from_raw(raw, 'QuanONet',
                                             (5, 1, 5, 1), 2, True))
    model = QuanONet(num_qubits=2, branch_input_size=10, trunk_input_size=1,
                     net_size=(5, 1, 5, 1), scale_coeff=0.001,
                     if_trainable_freq=True)
    preds = np.asarray(model.apply(params,
                                   jnp.asarray(data['test_branch_input']),
                                   jnp.asarray(data['test_trunk_input'])))
    y = data['test_output']
    rel = np.linalg.norm(preds - y) / (np.linalg.norm(y) + 1e-8)
    # full-size regeneration gives 0.1195 vs the reference's 0.1192; with a
    # smaller resample the band is wider but must stay in the demo's regime
    assert 0.08 < rel < 0.20, f"golden parity broken: rel_l2={rel}"
