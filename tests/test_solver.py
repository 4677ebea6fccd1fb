"""
Solver tests: end-to-end training for each model family on tiny data,
loss decrease, artifact contract (metric.json / dual-format checkpoints /
resume-skip), optimizer/scheduler factory.
"""
import json
import os

import numpy as np
import optax
import pytest

import quanonet_tpu.data.generation as gen
from quanonet_tpu.checkpoint import load_ms_ckpt
from quanonet_tpu.solver import Solver, build_optimizer


@pytest.fixture(autouse=True)
def _isolate(tmp_path, monkeypatch):
    monkeypatch.setattr(gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    monkeypatch.chdir(tmp_path)
    np.random.seed(0)
    yield


def _base_config(**over):
    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_train=20, num_test=10, num_points=50, num_points_0=10,
               train_sample_num=5, test_sample_num=10,
               batch_size=25, num_epochs=15, learning_rate=0.01,
               num_qubits=2, net_size=[2, 1, 2, 1],
               scale_coeff=0.01, if_trainable_freq='true',
               ham_bound=[-5, 5], ham_pauli='Z', seed=0,
               prefix='outputs')
    cfg.update(over)
    return cfg


def _run(cfg):
    solver = Solver(cfg)
    history = solver.train()
    metrics = solver.evaluate(history)
    return solver, history, metrics


def test_quanonet_end_to_end():
    solver, history, metrics = _run(_base_config())
    losses = history['loss_train']
    assert len(losses) == 15
    assert losses[-1] < losses[0]          # learning happened
    assert np.isfinite(metrics['rel_l2'])

    exp_dir = solver.exp_logger.exp_dir
    assert os.path.exists(os.path.join(exp_dir, 'metric.json'))
    assert os.path.exists(os.path.join(exp_dir, 'best_model.ckpt'))
    assert os.path.exists(os.path.join(exp_dir, 'best_model.npz'))
    assert os.path.exists(os.path.join(exp_dir, 'final.npz'))
    assert os.path.exists(os.path.join(exp_dir, 'train_args.json'))

    # dual-format consistency
    ck = load_ms_ckpt(os.path.join(exp_dir, 'best_model.ckpt'))
    nz = np.load(os.path.join(exp_dir, 'best_model.npz'))
    for k in nz.files:
        np.testing.assert_array_equal(ck[k], nz[k])
    assert 'QuanONet.weight' in nz.files and 'bias' in nz.files

    m = json.load(open(os.path.join(exp_dir, 'metric.json')))
    assert 'metrics' in m and 'history' in m


def test_resume_skip():
    cfg = _base_config()
    _run(cfg)
    solver2 = Solver(_base_config())
    with pytest.raises(SystemExit) as exc:
        solver2.train()
    assert exc.value.code == 0


@pytest.mark.parametrize("model_type,net_size", [
    ('HEAQNN', [3, 1]),
    ('DeepONet', [2, 8]),
    ('FNN', [2, 8]),
])
def test_other_families_end_to_end(model_type, net_size):
    cfg = _base_config(model_type=model_type, net_size=net_size,
                       num_epochs=8)
    solver, history, metrics = _run(cfg)
    assert len(history['loss_train']) == 8
    assert np.isfinite(metrics['rel_l2'])
    assert np.isfinite(history['loss_train'][-1])


def test_fno_end_to_end():
    cfg = _base_config(model_type='FNO', net_size=[6, 8, 1, 8],
                       num_points=32, num_points_0=32, num_epochs=8,
                       batch_size=10)
    solver, history, metrics = _run(cfg)
    assert history['loss_train'][-1] < history['loss_train'][0]
    assert np.isfinite(metrics['rel_l2'])


def test_warm_start_and_eval_only():
    cfg = _base_config()
    solver, _, _ = _run(cfg)
    best = os.path.join(solver.exp_logger.exp_dir, 'best_model.npz')

    cfg2 = _base_config(prefix='outputs2', init_checkpoint=best,
                        if_train='false')
    solver2 = Solver(cfg2)
    history2 = solver2.train()
    assert history2['loss_train'] == []          # training skipped
    metrics2 = solver2.evaluate(history2)
    assert np.isfinite(metrics2['rel_l2'])


def test_batch_size_clamp():
    cfg = _base_config(batch_size=10_000, num_epochs=3)
    solver, history, _ = _run(cfg)
    assert solver.config['batch_size'] == 100  # 20 fns x 5 pts


def test_build_optimizer_schedules():
    cfg = dict(learning_rate=0.1, lr_scheduler='cosine',
               lr_scheduler_kwargs={'eta_min': 0.0})
    opt = build_optimizer(cfg, total_steps=100)
    assert isinstance(opt, optax.GradientTransformation)
    for sched in ('exponential', 'step', 'none'):
        opt = build_optimizer(dict(learning_rate=0.1, lr_scheduler=sched),
                              total_steps=10)
        assert isinstance(opt, optax.GradientTransformation)
    opt = build_optimizer(dict(learning_rate=0.1, optimizer='sgd'), 10)
    assert isinstance(opt, optax.GradientTransformation)


def test_decay_tuple_vocabulary():
    """DeepXDE-style decay tuples (reference solver_dde.py:214-271) reach
    the optimizer with the documented functional forms."""
    from quanonet_tpu.solver import _decay_tuple_schedule

    lr = 0.1
    s = _decay_tuple_schedule(lr, ('step', 10, 0.5), 100)
    assert float(s(0)) == pytest.approx(0.1)
    assert float(s(9)) == pytest.approx(0.1)
    assert float(s(10)) == pytest.approx(0.05)
    assert float(s(25)) == pytest.approx(0.025)

    s = _decay_tuple_schedule(lr, ('exponential', 10, 0.5), 100)
    assert float(s(10)) == pytest.approx(0.05)
    assert float(s(5)) == pytest.approx(0.1 * 0.5 ** 0.5)

    s = _decay_tuple_schedule(lr, ('inverse time', 10, 2.0), 100)
    assert float(s(0)) == pytest.approx(0.1)
    assert float(s(10)) == pytest.approx(0.1 / 3.0)

    s = _decay_tuple_schedule(lr, ('cosine', 40, 0.1), 100)
    assert float(s(0)) == pytest.approx(0.1)
    assert float(s(40)) == pytest.approx(0.01)   # floor = alpha*lr
    assert float(s(80)) == pytest.approx(0.01)   # clamped past T_max
    # underscore + case-insensitive alias
    s2 = _decay_tuple_schedule(lr, ('Inverse_Time', 10, 2.0), 100)
    assert float(s2(10)) == pytest.approx(0.1 / 3.0)

    with pytest.raises(ValueError, match="decay form"):
        _decay_tuple_schedule(lr, ('polynomial', 10, 2.0), 100)

    # through build_optimizer: decay tuple wins, lr_scheduler alias works
    opt = build_optimizer(dict(learning_rate=0.1,
                               decay=('inverse time', 10, 2.0)), 100)
    assert isinstance(opt, optax.GradientTransformation)
    opt = build_optimizer(dict(learning_rate=0.1,
                               lr_scheduler='inverse_time'), 100)
    assert isinstance(opt, optax.GradientTransformation)


def test_segment_size():
    from quanonet_tpu.solver import _segment_size
    # divisor path: exactly one compiled shape
    assert _segment_size(100) == 50
    assert _segment_size(1000) == 50
    assert _segment_size(64) == 64
    assert _segment_size(4) == 4
    # prime / tiny-divisor path: cap + ragged tail (2 shapes, ~n/cap
    # dispatches) instead of degenerate per-epoch dispatch
    assert _segment_size(997) == 64
    assert _segment_size(127) == 64
    # a good divisor just under cap still wins over the ragged split
    assert _segment_size(122) == 61
