"""
Multi-seed vmapped training tests: S seeds in one program produce S
distinct trained models with full per-seed artifact contracts.
"""
import json
import os

import numpy as np
import pytest

import quanonet_tpu.data.generation as gen
from quanonet_tpu.multiseed import train_multi_seed


@pytest.fixture(autouse=True)
def _isolate(tmp_path, monkeypatch):
    monkeypatch.setattr(gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    monkeypatch.chdir(tmp_path)
    np.random.seed(0)
    yield


def test_multiseed_quanonet(tmp_path):
    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_train=20, num_test=10, num_points=40, num_points_0=8,
               train_sample_num=5, test_sample_num=8,
               batch_size=25, num_epochs=10, learning_rate=0.01,
               num_qubits=2, net_size=[2, 1, 2, 1],
               scale_coeff=0.01, if_trainable_freq='true',
               ham_bound=[-5, 5], ham_pauli='Z',
               multi_seed=[0, 1, 2], prefix='outputs')
    metrics = train_multi_seed(cfg)
    assert set(metrics) == {0, 1, 2}
    rels = [metrics[s]['rel_l2'] for s in (0, 1, 2)]
    assert all(np.isfinite(r) for r in rels)
    # different seeds -> different models -> (almost surely) different errors
    assert len({round(r, 9) for r in rels}) > 1

    # per-seed artifact contract
    for s in (0, 1, 2):
        d = (f'outputs/Antideriv/Antideriv_QuanONet_Net2-1-2-1_Q2_TF_S0.01'
             f'_20x40_Seed{s}')
        assert os.path.exists(os.path.join(d, 'metric.json')), d
        assert os.path.exists(os.path.join(d, 'best_model.npz'))
        m = json.load(open(os.path.join(d, 'metric.json')))
        assert 'rel_l2' in m['metrics']
        w = np.load(os.path.join(d, 'best_model.npz'))
        assert w['QuanONet.weight'].shape == (2 * 1 * 3 * 2 + 2 * 1 * 3 * 2,)

    # seeds produced distinct weights
    w0 = np.load('outputs/Antideriv/Antideriv_QuanONet_Net2-1-2-1_Q2_TF_'
                 'S0.01_20x40_Seed0/best_model.npz')['QuanONet.weight']
    w1 = np.load('outputs/Antideriv/Antideriv_QuanONet_Net2-1-2-1_Q2_TF_'
                 'S0.01_20x40_Seed1/best_model.npz')['QuanONet.weight']
    assert not np.allclose(w0, w1)


def test_multiseed_resume_skip(tmp_path, capsys):
    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_train=12, num_test=6, num_points=30, num_points_0=6,
               train_sample_num=4, test_sample_num=5,
               batch_size=48, num_epochs=4, learning_rate=0.01,
               num_qubits=2, net_size=[1, 1, 1, 1],
               scale_coeff=0.01, if_trainable_freq='true',
               multi_seed=[0, 1], prefix='outputs')
    train_multi_seed(dict(cfg))
    out = train_multi_seed(dict(cfg))
    assert out == {0: None, 1: None}  # all seeds resume-skipped


def test_multiseed_partial_resume(tmp_path):
    """A partially completed multi-seed run retrains ONLY the missing
    seeds; completed seeds' artifacts are left untouched."""
    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_train=12, num_test=6, num_points=30, num_points_0=6,
               train_sample_num=4, test_sample_num=5,
               batch_size=48, num_epochs=4, learning_rate=0.01,
               num_qubits=2, net_size=[1, 1, 1, 1],
               scale_coeff=0.01, if_trainable_freq='true',
               multi_seed=[0, 1], prefix='outputs')
    train_multi_seed(dict(cfg))
    base = 'outputs/Antideriv/Antideriv_QuanONet_Net1-1-1-1_Q2_TF_S0.01_12x30'
    # wipe seed 1's completion marker; keep seed 0 finished
    os.remove(f'{base}_Seed1/metric.json')
    w0_before = np.load(f'{base}_Seed0/best_model.npz')['QuanONet.weight']
    mtime0 = os.path.getmtime(f'{base}_Seed0/best_model.npz')
    out = train_multi_seed(dict(cfg))
    assert out[0] is None            # seed 0 resumed (skipped)
    assert out[1] is not None        # seed 1 retrained
    assert os.path.exists(f'{base}_Seed1/metric.json')
    assert os.path.getmtime(f'{base}_Seed0/best_model.npz') == mtime0
    w0_after = np.load(f'{base}_Seed0/best_model.npz')['QuanONet.weight']
    np.testing.assert_array_equal(w0_before, w0_after)


def test_multiseed_fresh_data(tmp_path):
    """multi_seed_fresh_data=true gives each seed its own train/test
    split; runs end-to-end and produces distinct finite metrics."""
    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_train=16, num_test=8, num_points=30, num_points_0=6,
               train_sample_num=4, test_sample_num=5,
               batch_size=32, num_epochs=6, learning_rate=0.01,
               num_qubits=2, net_size=[1, 1, 1, 1],
               scale_coeff=0.01, if_trainable_freq='true',
               multi_seed=[0, 1], multi_seed_fresh_data='true',
               prefix='outputs')
    metrics = train_multi_seed(cfg)
    rels = [metrics[s]['rel_l2'] for s in (0, 1)]
    assert all(np.isfinite(r) for r in rels)
    assert rels[0] != rels[1]


def test_sequential_seeds_skip_completed(tmp_path):
    """_train_seeds_sequential must skip completed seeds ITSELF: relying
    on Solver.train()'s resume path would sys.exit(0) at the first
    completed seed, silently dropping the rest (advisor finding r2)."""
    from quanonet_tpu.multiseed import _train_seeds_sequential
    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_train=12, num_test=6, num_points=30, num_points_0=6,
               train_sample_num=4, test_sample_num=5,
               batch_size=48, num_epochs=4, learning_rate=0.01,
               num_qubits=2, net_size=[1, 1, 1, 1],
               scale_coeff=0.01, if_trainable_freq='true', prefix='outputs')
    # complete seed 0 only
    out1 = _train_seeds_sequential(dict(cfg), [0])
    assert out1[0] is not None
    # resume over [0, 1]: seed 0 skips, seed 1 trains, NO SystemExit
    out = _train_seeds_sequential(dict(cfg), [0, 1])
    assert out[0] is None
    assert out[1] is not None and np.isfinite(out[1]['rel_l2'])
    base = 'outputs/Antideriv/Antideriv_QuanONet_Net1-1-1-1_Q2_TF_S0.01_12x30'
    assert os.path.exists(f'{base}_Seed1/metric.json')
