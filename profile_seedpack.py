#!/usr/bin/env python3
"""
Seed-packing throughput: vmap the FULL train step over S parameter sets
(one program trains S seeds at once — quanonet_tpu/multiseed.py's
vmapped path) and measure aggregate samples/sec vs S.

Why this is the interesting MFU lever (round-2 verdict item 3.ii): the
step profile (profile_step.py / docs/BENCHMARKS.md) shows ~100 us of the
147 us flagship step is batch-INDEPENDENT op-issue overhead (the ~100
small XLA ops of the unitary-compile path + adam).  vmap over a seed
axis keeps the op COUNT constant while multiplying the useful work by S,
so the fixed overhead amortizes: aggregate throughput should approach
S x the variable-cost rate until the per-op tensors get large enough
that the ops become bandwidth/compute-bound.

The dense engine is used because it vmaps cleanly (the Pallas chain is
guarded against seed-vmap — VMEM footprint x S, multiseed.py:40-59).

Usage: python profile_seedpack.py [--iters N] [--seeds 1,2,4,8]
Writes docs/seedpack_profile.json.
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
    ap.add_argument('--seeds', default='1,2,4,8')
    ap.add_argument('--bs', type=int, default=100)
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--out', default=os.path.join(REPO, 'docs',
                                                  'seedpack_profile.json'))
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

    iters, bs = args.iters, args.bs
    platform = jax.devices()[0].platform
    log(f"devices: {jax.devices()}  iters={iters} bs={bs}")

    rng = np.random.RandomState(0)
    model = QuanONet(num_qubits=5, branch_input_size=100, trunk_input_size=2,
                     net_size=(40, 2, 20, 2), scale_coeff=0.1,
                     if_trainable_freq=True, engine='dense')
    b = jnp.asarray(rng.randn(bs, 100).astype(np.float32))
    t = jnp.asarray(rng.rand(bs, 2).astype(np.float32))
    y = jnp.asarray(rng.randn(bs, 1).astype(np.float32))
    optimizer = optax.adam(1e-4)

    def loss_fn(p):
        return jnp.mean((model.apply(p, b, t) - y) ** 2)

    def one_step(carry, _):
        p, o = carry
        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = optimizer.update(g, o, p)
        p = optax.apply_updates(p, up)
        return (p, o), l

    results = {'platform': platform, 'iters': iters, 'bs': bs, 'packs': {}}
    for S in [int(s) for s in args.seeds.split(',')]:
        keys = jnp.stack([jax.random.PRNGKey(s) for s in range(S)])
        params = jax.vmap(lambda k: model.init(k, b[:1], t[:1]))(keys)
        opt_state = jax.vmap(optimizer.init)(params)

        @jax.jit
        def run(carry):
            def step(c, _):
                (p, o), l = jax.vmap(one_step, in_axes=((0, 0), None))(
                    c, None)
                return (p, o), l
            (p, o), ls = jax.lax.scan(step, carry, None, length=iters)
            # fold a loss-dependent value into the carry so fetching it
            # synchronizes the whole scan (block_until_ready is unreliable
            # on the tunnel)
            return (jax.tree_util.tree_map(
                lambda a: a + jnp.mean(ls) * 0, p), o)

        t0 = time.time()
        c = run((params, opt_state))
        _ = float(jax.tree_util.tree_leaves(c)[0].ravel()[0])
        log(f"  S={S}: compile+warm {time.time() - t0:.1f}s")
        t0 = time.time()
        c = run((params, opt_state))
        _ = float(jax.tree_util.tree_leaves(c)[0].ravel()[0])
        dt = time.time() - t0
        us = dt / iters * 1e6
        agg = S * bs / (us / 1e6)
        log(f"  S={S}: {us:.2f} us/step  aggregate {agg:,.0f} samples/sec "
            f"({agg / (bs / (us / 1e6) / S):.2f}x solo-rate if linear)")
        results['packs'][str(S)] = {
            'us_per_step': round(us, 2),
            'aggregate_samples_per_sec': round(agg, 1),
        }

    # amortization summary: per-seed cost vs S=1
    base = results['packs'].get('1')
    if base:
        for S, r in results['packs'].items():
            r['per_seed_us'] = round(r['us_per_step'] / int(S), 2)
            r['speedup_vs_S1'] = round(
                base['us_per_step'] * int(S) / r['us_per_step'], 2)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(results, f, indent=2)
    log(f"wrote {args.out}")
    print(json.dumps(results))


if __name__ == '__main__':
    main()
