"""
One-kernel Adam (ops/pallas_adam.py) vs optax.adam: identical update
rule, so trajectories must agree to f32 roundoff over many steps —
including a scalar leaf, a schedule, and use inside the solver's jitted
scan (interpret-mode Pallas on CPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from quanonet_tpu.ops.pallas_adam import fused_adam


def _tree(seed=0):
    rng = np.random.RandomState(seed)
    return {
        'ansatz': jnp.asarray(rng.randn(12, 3, 5).astype(np.float32)),
        'bias': jnp.asarray(np.float32(rng.randn())),
        'freq': {'w': jnp.asarray(rng.randn(20).astype(np.float32)),
                 'b': jnp.asarray(rng.randn(20).astype(np.float32))},
    }


def _grads(params, key):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    return treedef.unflatten([
        jax.random.normal(k, a.shape, a.dtype)
        for k, a in zip(keys, leaves)])


def _run(opt, params, n_steps, fused):
    state = opt.init(params)
    for i in range(n_steps):
        g = _grads(params, jax.random.PRNGKey(i))
        if fused:
            params, state = opt.fused_step(g, state, params)
        else:
            upd, state = opt.update(g, state, params)
            params = optax.apply_updates(params, upd)
    return params


def _assert_trees_close(a, b, **kw):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


def test_matches_optax_constant_lr():
    params = _tree()
    got = _run(fused_adam(1e-2), params, 25, fused=True)
    want = _run(optax.adam(1e-2), params, 25, fused=False)
    _assert_trees_close(got, want, atol=2e-6, rtol=1e-5)


def test_matches_optax_with_schedule():
    sched = optax.exponential_decay(1e-2, 1, 0.95)
    params = _tree(seed=1)
    # schedules are evaluated at the pre-increment count, exactly as
    # optax.adam does — a solver-built schedule is a drop-in
    got = _run(fused_adam(sched), params, 10, fused=True)
    want = _run(optax.adam(sched), params, 10, fused=False)
    _assert_trees_close(got, want, atol=2e-6, rtol=1e-5)


def test_inside_jitted_scan():
    opt = fused_adam(3e-3)
    params = _tree(seed=2)
    state = opt.init(params)
    gs = [_grads(params, jax.random.PRNGKey(100 + i)) for i in range(8)]
    g_stack = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *gs)

    @jax.jit
    def run(params, state, g_stack):
        def step(carry, g):
            p, s = carry
            p, s = opt.fused_step(g, s, p)
            return (p, s), None
        (p, s), _ = jax.lax.scan(step, (params, state), g_stack)
        return p

    got = run(params, state, g_stack)
    want = params
    opt_ref = optax.adam(3e-3)
    s_ref = opt_ref.init(params)
    for g in gs:
        upd, s_ref = opt_ref.update(g, s_ref, want)
        want = optax.apply_updates(want, upd)
    _assert_trees_close(got, want, atol=2e-6, rtol=1e-5)


def test_solver_epoch_takes_fused_path():
    """make_train_epoch routes through fused_step when present and
    produces finite, moving parameters."""
    from quanonet_tpu.solver import make_train_epoch
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(4, 3).astype(np.float32))

    def apply_fn(p, x):
        return x @ p['w']

    params = {'w': w}
    opt = fused_adam(1e-2)
    epoch = make_train_epoch(apply_fn, opt, num_samples=10, batch_size=4,
                             per_sample=3)
    x = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(10, 3).astype(np.float32))
    (p2, _), (loss, _) = jax.jit(epoch)((params, opt.init(params)),
                                        jax.random.PRNGKey(0), (x,), y)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(p2['w']), np.asarray(w))
