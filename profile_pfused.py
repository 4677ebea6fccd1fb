#!/usr/bin/env python3
"""
Component-level timing of the pfused engine (ops/pallas_fused.py) at
Q10 — where does the 2.67 ms train step go?  Same protocol as
profile_step.py / profile_fused.py: jitted lax.scan over ITERS
iterations in one program, dependent-value sync, carry-perturbed inputs
so XLA cannot hoist loop-invariant work (CLAUDE.md tunnel rules).

Components:
  full_step        value_and_grad(mse) + adam        (the real step)
  fwd_bwd          value_and_grad only (no adam)
  fwd_infer        forward_pfused, primal path (residual saves skipped)
  build_unitaries  group-unitary construction fwd+bwd (XLA, shared with
                   the fused engine)
  phases_tiling    encode-phase einsum + the (nb,bp,2^n)->(nb,tiles,
                   hb,128) relayout feeding the kernel

Usage: python profile_pfused.py [--iters N] [--qubits 10]
Writes docs/pfused_profile.json.
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
    ap.add_argument('--iters', type=int, default=300)
    ap.add_argument('--qubits', type=int, default=10)
    ap.add_argument('--net', default='40,2,20,2')
    ap.add_argument('--batch', type=int, default=100)
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--out', default=os.path.join(REPO, 'docs',
                                                  'pfused_profile.json'))
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
    from quanonet_tpu.ops import pallas_fused as pf
    from quanonet_tpu.ops.fused_gates import build_group_unitaries
    from quanonet_tpu.ops.gates import z_signs
    from quanonet_tpu.ops.hea import quanonet_spec
    from quanonet_tpu.ops.hamiltonian import simple_ham_diag

    iters = args.iters
    nq = args.qubits
    net = tuple(int(v) for v in args.net.split(','))
    batch = args.batch
    spec = quanonet_spec(nq, net)
    nb = spec.n_blocks
    hi = 2 ** (nq - pf.LANE_QUBITS)
    bt = pf._pick_bt(nb, spec.total_sublayers, hi, batch)
    log(f"devices: {jax.devices()}  Q{nq} net={net} bs={batch} "
        f"iters={iters} bt={bt}")

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2, (batch, nb * nq)).astype(np.float32))
    y = jnp.asarray(rng.randn(batch, 1).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(nq, -5, 5))

    results = {}

    def timed(name, fn, *extra):
        t0 = time.time()
        c = fn(*extra)
        float(jax.tree_util.tree_leaves(c)[0].ravel()[0])
        log(f"  {name}: compile+warm {time.time() - t0:.1f}s")
        t0 = time.time()
        c = fn(*extra)
        float(jax.tree_util.tree_leaves(c)[0].ravel()[0])
        us = (time.time() - t0) / iters * 1e6
        log(f"  {name}: {us:.1f} us/iter")
        results[name] = round(us, 2)

    def loss_fn(w_, x_, y_, diag_):
        sr, si = pf.forward_pfused(spec, w_, x_)
        pred = ((sr * sr + si * si) @ diag_)[:, None]
        return jnp.mean((pred - y_) ** 2)

    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(w)

    @jax.jit
    def full_step(carry, x, y, diag):
        def step(c, _):
            p, o = c
            l, g = jax.value_and_grad(loss_fn)(p, x, y, diag)
            up, o = optimizer.update(g, o, p)
            return (optax.apply_updates(p, up), o), l
        (p, o), ls = jax.lax.scan(step, carry, None, length=iters)
        return (jax.tree_util.tree_map(lambda a: a + jnp.mean(ls) * 0, p), o)

    @jax.jit
    def fwd_bwd(w0, x, y, diag):
        def step(c, _):
            l, g = jax.value_and_grad(loss_fn)(c, x, y, diag)
            return c + 1e-12 * g, None
        c, _ = jax.lax.scan(step, w0, None, length=iters)
        return c

    @jax.jit
    def fwd_infer(w0, x, diag):
        def step(c, _):
            sr, si = pf.forward_pfused(spec, w0, x * (1.0 + c * 1e-20))
            ev = (sr * sr + si * si) @ diag
            return c + jnp.mean(ev) * 1e-9, None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=iters)
        return c

    def build_loss(w_):
        gu = build_group_unitaries(spec, w_)
        return sum(jnp.sum(gu[gi][0] ** 2) + jnp.sum(gu[gi][1] ** 2)
                   for gi in gu)

    @jax.jit
    def build_only(w0):
        def step(c, _):
            l, g = jax.value_and_grad(build_loss)(c)
            return c + 1e-12 * g, None
        c, _ = jax.lax.scan(step, w0, None, length=iters)
        return c

    zsgn = jnp.asarray(z_signs(nq))
    bp = -(-batch // bt) * bt
    n_tiles = bp // bt

    @jax.jit
    def phases_tiling(x, c0):
        def step(c, _):
            xp = jnp.pad(x * (1.0 + c * 1e-20), ((0, bp - batch), (0, 0)))
            xb = xp.reshape(bp, nb, nq).transpose(1, 0, 2)
            phi = 0.5 * (xb @ zsgn.T)
            phi_t = pf._tile_rows(phi, hi, bt, n_tiles)
            return c + jnp.sum(phi_t[0, 0, 0]) * 1e-12, None
        c, _ = jax.lax.scan(step, c0, None, length=iters)
        return c

    timed('full_step', full_step, (w, opt_state), x, y, diag)
    timed('fwd_bwd', fwd_bwd, w, x, y, diag)
    timed('fwd_infer', fwd_infer, w, x, diag)
    timed('build_unitaries fwd+bwd', build_only, w)
    timed('phases_tiling', phases_tiling, x, jnp.float32(0))

    meta = {"qubits": nq, "net": list(net), "batch": batch, "bt": bt,
            "iters": iters, "platform": jax.devices()[0].platform}
    out = {"meta": meta, "us_per_iter": results}
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
