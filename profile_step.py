#!/usr/bin/env python3
"""
Component-level timing of the flagship train step (Q5 Advection,
Net40-2-20-2, bs=100) — answers "where do the ~140 us/step go?"
(round-2 verdict: MFU 0.4% means the chip idles ~250x; find out whether
the time is the sequential block chain, the batch-independent
unitary-compile path, the optimizer, or scheduling).

Each component is timed as a jitted lax.scan over ITERS iterations in
ONE program (per-call RPC on the tunnel is ~5 ms, and block_until_ready
is unreliable — a dependent VALUE is materialized instead).

Components:
  full_step[engine]   value_and_grad(loss) + adam update  (the real step)
  fwd_only[engine]    model forward + mean (inference path)
  compile_path        value_and_grad of a scalar reduction of
                      compile_block_unitaries (batch-independent work +
                      its backward)
  adam_only           optimizer.update + apply_updates on frozen grads
  batch sweep         full_step[pallas] at bs in {100, 400, 1600} — the
                      fixed-vs-variable cost split

Usage: python profile_step.py [--iters N] [--engines pallas,embed,dense]
Writes docs/step_profile.json and prints a table to stderr.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=2000)
    ap.add_argument('--engines', default='pallas,embed,dense')
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--fused_adam', action='store_true',
                    help='use the one-kernel Adam (ops/pallas_adam.py) '
                         'in full_step and adam_only')
    ap.add_argument('--out', default=os.path.join(REPO, 'docs',
                                                  'step_profile.json'))
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, REPO)
    from quanonet_tpu.models import QuanONet
    from quanonet_tpu.ops.hea import compile_block_unitaries, quanonet_spec

    iters = args.iters
    platform = jax.devices()[0].platform
    log(f"devices: {jax.devices()}  iters={iters}")

    rng = np.random.RandomState(0)
    results = {}

    def timed(name, make_scan_fn, init_carry, extra=()):
        """make_scan_fn: () -> jitted fn(carry, *extra) -> carry with a
        scalar 'sync' leaf; runs twice (compile+warm, then timed).
        Data arrays go through ``extra`` as jit ARGUMENTS — closed-over
        device arrays lower as MLIR constants (CLAUDE.md: the tunnel
        fails the copy for large ones)."""
        fn = make_scan_fn()
        t0 = time.time()
        c = fn(init_carry, *extra)
        sync = float(jax.tree_util.tree_leaves(c)[0].ravel()[0])
        log(f"  {name}: compile+warm {time.time() - t0:.1f}s")
        t0 = time.time()
        c = fn(init_carry, *extra)
        sync = float(jax.tree_util.tree_leaves(c)[0].ravel()[0])
        dt = time.time() - t0
        us = dt / iters * 1e6
        log(f"  {name}: {us:.2f} us/iter  ({dt:.3f}s total, sync {sync:.3e})")
        results[name] = us
        return us

    def model_step_timer(engine, bs):
        model = QuanONet(num_qubits=5, branch_input_size=100,
                         trunk_input_size=2, net_size=(40, 2, 20, 2),
                         scale_coeff=0.1, if_trainable_freq=True,
                         engine=engine)
        b = jnp.asarray(rng.randn(bs, 100).astype(np.float32))
        t = jnp.asarray(rng.rand(bs, 2).astype(np.float32))
        y = jnp.asarray(rng.randn(bs, 1).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), b[:1], t[:1])
        if args.fused_adam:
            from quanonet_tpu.ops.pallas_adam import fused_adam
            optimizer = fused_adam(1e-4)
        else:
            optimizer = optax.adam(1e-4)
        opt_state = optimizer.init(params)

        def loss_fn(p, b, t, y):
            return jnp.mean((model.apply(p, b, t) - y) ** 2)

        def make_full():
            @jax.jit
            def run(carry, b, t, y):
                def step(c, _):
                    p, o = c
                    l, g = jax.value_and_grad(loss_fn)(p, b, t, y)
                    if args.fused_adam:
                        p, o = optimizer.fused_step(g, o, p)
                    else:
                        up, o = optimizer.update(g, o, p)
                        p = optax.apply_updates(p, up)
                    return (p, o), l
                (p, o), ls = jax.lax.scan(step, carry, None, length=iters)
                return (jax.tree_util.tree_map(
                    lambda a: a + jnp.mean(ls) * 0, p), o)
            return run

        def make_fwd():
            @jax.jit
            def run(p, b, t, y):
                def step(c, _):
                    return c + jnp.mean(model.apply(p, b, t)) * 1e-9, None
                c, _ = jax.lax.scan(step, jnp.float32(0), None, length=iters)
                return c
            return run

        return model, params, opt_state, make_full, make_fwd, (b, t, y)

    engines = args.engines.split(',')
    for engine in engines:
        model, params, opt_state, make_full, make_fwd, data = \
            model_step_timer(engine, 100)
        timed(f'full_step[{engine}] bs=100', make_full, (params, opt_state),
              data)
        timed(f'fwd_only[{engine}] bs=100', make_fwd, params, data)

    # batch sweep on the default engine
    for bs in (400, 1600):
        _, params, opt_state, make_full, _, data = \
            model_step_timer(engines[0], bs)
        timed(f'full_step[{engines[0]}] bs={bs}', make_full,
              (params, opt_state), data)

    # compile-path only: fwd+bwd of the block-unitary construction
    spec = quanonet_spec(5, (40, 2, 20, 2))
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))

    def compile_loss(w):
        ur, ui = compile_block_unitaries(spec, w)
        return jnp.sum(ur * ur) + jnp.sum(ui * ui)

    def make_compile():
        @jax.jit
        def run(w):
            def step(c, _):
                l, g = jax.value_and_grad(compile_loss)(c)
                return c + 1e-12 * g, None
            c, _ = jax.lax.scan(step, w, None, length=iters)
            return c
        return run
    timed('compile_path fwd+bwd', make_compile, w)

    # adam only (same param tree as the full model)
    model = QuanONet(num_qubits=5, branch_input_size=100, trunk_input_size=2,
                     net_size=(40, 2, 20, 2), scale_coeff=0.1,
                     if_trainable_freq=True, engine='dense')
    b = jnp.asarray(rng.randn(1, 100).astype(np.float32))
    t = jnp.asarray(rng.rand(1, 2).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), b, t)
    if args.fused_adam:
        from quanonet_tpu.ops.pallas_adam import fused_adam
        optimizer = fused_adam(1e-4)
    else:
        optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)
    grads = jax.tree_util.tree_map(lambda a: a * 1e-3, params)

    def make_adam():
        @jax.jit
        def run(carry, grads):
            def step(c, _):
                p, o = c
                if args.fused_adam:
                    p, o = optimizer.fused_step(grads, o, p)
                else:
                    up, o = optimizer.update(grads, o, p)
                    p = optax.apply_updates(p, up)
                return (p, o), None
            c, _ = jax.lax.scan(step, carry, None, length=iters)
            return c
        return run
    timed('adam_only', make_adam, (params, opt_state), (grads,))

    results['platform'] = platform
    results['iters'] = iters
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(results, f, indent=2)
    log(f"wrote {args.out}")
    print(json.dumps(results))


if __name__ == '__main__':
    main()
