"""
Elastic mid-run resume (--save_state): a training run killed between
segments and restarted with the identical config must (a) continue from
the last segment boundary instead of epoch 0 and (b) produce final and
best params BIT-IDENTICAL to an uninterrupted run (the per-epoch key
protocol is position-indexed, so the surviving epochs replay the exact
same program+keys).

The reference's only recovery mechanism is resume-SKIP of completed
experiments (solver_ms.py metric.json check); mid-run state save/resume
is TPU-native added capability (SURVEY.md §5.3/§5.4).
"""
import os

import numpy as np
import pytest

import quanonet_tpu.data.generation as gen
from quanonet_tpu.solver import Solver, load_train_state, save_train_state


@pytest.fixture(autouse=True)
def _isolate(tmp_path, monkeypatch):
    monkeypatch.setattr(gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    monkeypatch.chdir(tmp_path)
    np.random.seed(0)
    yield


def _cfg(prefix, **over):
    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_train=20, num_test=10, num_points=50, num_points_0=10,
               train_sample_num=5, test_sample_num=10,
               batch_size=25, num_epochs=12, epochs_per_sync=4,
               learning_rate=0.01, num_qubits=2, net_size=[2, 1, 2, 1],
               scale_coeff=0.01, if_trainable_freq='true',
               ham_bound=[-5, 5], ham_pauli='Z', seed=0,
               save_state='true', prefix=prefix)
    cfg.update(over)
    return cfg


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


def test_interrupted_run_resumes_bit_identically():
    # Uninterrupted control run
    a = Solver(_cfg('outA'))
    hist_a = a.train()

    # Run B: kill it during the second segment's host sync (the state
    # snapshot for segment 1, epochs 0-3, is already on disk)
    b1 = Solver(_cfg('outB'))
    orig = b1.exp_logger.log_metric

    def dying_log(tag, value, step):
        if step >= 4:
            raise RuntimeError('simulated preemption')
        return orig(tag, value, step)

    b1.exp_logger.log_metric = dying_log
    with pytest.raises(RuntimeError, match='simulated preemption'):
        b1.train()
    state_path = os.path.join(b1.exp_logger.exp_dir, 'train_state.npz')
    assert os.path.exists(state_path)
    z = np.load(state_path)
    assert int(z['done']) == 4
    assert len(z['loss_hist']) == 4

    # Restart with the identical config: must resume at epoch 4 and
    # finish with params bit-identical to the control run
    b2 = Solver(_cfg('outB'))
    hist_b = b2.train()

    assert not os.path.exists(state_path)   # snapshot removed on completion
    assert len(hist_b['loss_train']) == 12
    np.testing.assert_array_equal(np.asarray(hist_a['loss_train']),
                                  np.asarray(hist_b['loss_train']))
    for la, lb in zip(_leaves(a.params), _leaves(b2.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for la, lb in zip(_leaves(a.best_params), _leaves(b2.best_params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert b2.best_loss == a.best_loss


def test_dp_interrupted_run_resumes_bit_identically():
    """save_state across the SPMD data-parallel path: snapshots hold the
    device_get-gathered (replicated) params; the restarted run feeds the
    host arrays back through the mesh run_segment unchanged."""
    over = dict(num_train=21, num_points=40, num_points_0=8,
                test_sample_num=8, batch_size=20, num_devices=4)
    a = Solver(_cfg('dpA', **over))
    hist_a = a.train()

    b1 = Solver(_cfg('dpB', **over))
    orig = b1.exp_logger.log_metric

    def dying_log(tag, value, step):
        if step >= 4:
            raise RuntimeError('simulated preemption')
        return orig(tag, value, step)

    b1.exp_logger.log_metric = dying_log
    with pytest.raises(RuntimeError, match='simulated preemption'):
        b1.train()
    state_path = os.path.join(b1.exp_logger.exp_dir, 'train_state.npz')
    assert int(np.load(state_path)['done']) == 4

    b2 = Solver(_cfg('dpB', **over))
    hist_b = b2.train()
    assert not os.path.exists(state_path)
    np.testing.assert_array_equal(np.asarray(hist_a['loss_train']),
                                  np.asarray(hist_b['loss_train']))
    for la, lb in zip(_leaves(a.params), _leaves(b2.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_state_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    params = {'w': jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              'b': jnp.float32(0.5)}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    # advance one step so the snapshot holds non-trivial mu/nu/count
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, opt_state = opt.update(g, opt_state, params)
    params = optax.apply_updates(params, upd)

    path = str(tmp_path / 'train_state.npz')
    save_train_state(path, 7, params, opt_state, 0.123, params, [1.0, 2.0])
    done, p2, o2, best, bp2, hist = load_train_state(
        path, params, opt.init(params))
    assert done == 7 and hist == [1.0, 2.0]
    assert float(best) == np.float32(0.123)
    for la, lb in zip(_leaves(params), _leaves(p2)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for la, lb in zip(_leaves(opt_state), _leaves(o2)):
        assert np.asarray(la).dtype == np.asarray(lb).dtype
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
