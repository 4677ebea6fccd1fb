#!/usr/bin/env python3
"""
Component-level timing of the FUSED engine (grouped-kron, Q8-Q16 —
ops/fused_gates.py) at Q10, the regime the scaling table optimizes.
Answers "where does the Q10 train step go?" the same way
profile_step.py answered it for the Q5 flagship: jitted lax.scan over
ITERS iterations in one program, dependent-value sync (CLAUDE.md tunnel
rules).

Components (forward-only ablations rebuild the fused forward inline
with one stage removed; shapes stay static):

  full_step          value_and_grad(mse) + adam       (the real step)
  fwd_full           the exact forward
  fwd_no_ring        ring permutation skipped
  fwd_no_hadamard    H group matmuls skipped
  fwd_no_diag        per-sample diagonal multiply skipped
  fwd_group0_only    small-group (k<7) matmuls skipped
  build_unitaries    batch-independent group-unitary construction
                     (fwd+bwd), the fused analog of 'compile_path'

Usage: python profile_fused.py [--iters N] [--qubits 10] [--net 40,2,20,2]
Writes docs/fused_profile.json and prints a table to stderr.
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
                                                  'fused_profile.json'))
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
    from quanonet_tpu.ops import fused_gates as fg
    from quanonet_tpu.ops.gates import cnot_ring_inverse_permutation, z_signs
    from quanonet_tpu.ops.hea import quanonet_spec
    from quanonet_tpu.ops.hamiltonian import simple_ham_diag

    iters = args.iters
    nq = args.qubits
    net = tuple(int(v) for v in args.net.split(','))
    batch = args.batch
    spec = quanonet_spec(nq, net)
    nb = spec.n_blocks
    log(f"devices: {jax.devices()}  Q{nq} net={net} bs={batch} "
        f"iters={iters} unroll={fg._scan_unroll(False)}")

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

    def ablated_forward(weights, x, skip=()):
        """fused forward with named stages removable; mirrors
        fused_gates.forward_fused (uniform specs, no remat)."""
        groups = fg.qubit_groups(nq)
        gu = fg.build_group_unitaries(spec, weights)
        zsgn = jnp.asarray(z_signs(nq))
        xb = x.reshape(batch, nb, nq).transpose(1, 0, 2)
        phi = 0.5 * (xb @ zsgn.T)
        dr, di = jnp.cos(phi), -jnp.sin(phi)
        ring = jnp.asarray(cnot_ring_inverse_permutation(nq))
        dim = spec.dim

        def block_body(sr, si, dr_b, di_b, subs, ld):
            if 'hadamard' not in skip:
                sr, si = fg._apply_hadamard(sr, si, groups, nq)
            if 'diag' not in skip:
                sr, si = (dr_b * sr - di_b * si, dr_b * si + di_b * sr)
            for d in range(ld):
                for gi, (off, k) in enumerate(groups):
                    if 'group1' in skip and k < fg.MAX_GROUP_QUBITS:
                        continue
                    ur, ui = subs[gi][0][d], subs[gi][1][d]
                    sr, si = fg._apply_group(sr, si, ur, ui, off, k, nq)
                if 'ring' not in skip:
                    sr, si = sr[:, ring], si[:, ring]
            return sr, si

        sr = jnp.zeros((batch, dim), jnp.float32).at[:, 0].set(1.0)
        si = jnp.zeros((batch, dim), jnp.float32)
        s = b = 0
        groups_n = len(groups)
        while b < nb:
            ld = spec.block_configs[b][1]
            j = b
            while j < nb and spec.block_configs[j][1] == ld:
                j += 1
            g = j - b
            subs = {gi: (gu[gi][0][s:s + g * ld].reshape(
                             (g, ld) + gu[gi][0].shape[1:]),
                         gu[gi][1][s:s + g * ld].reshape(
                             (g, ld) + gu[gi][1].shape[1:]))
                    for gi in range(groups_n)}

            def step(state, inp):
                sr, si = state
                dr_b, di_b, sub = inp
                return block_body(sr, si, dr_b, di_b, sub, ld), None

            (sr, si), _ = jax.lax.scan(step, (sr, si),
                                       (dr[b:j], di[b:j], subs),
                                       unroll=min(fg._scan_unroll(False), g))
            s += g * ld
            b = j
        return sr, si

    def make_fwd(skip=()):
        @jax.jit
        def run(w, x, diag):
            def step(c, _):
                # carry-perturb x so the forward is NOT loop-invariant —
                # XLA hoists an invariant body out of the scan and the
                # "timed" loop degenerates to 300 scalar adds.
                sr, si = ablated_forward(w, x * (1.0 + c * 1e-20),
                                         skip=skip)
                ev = (sr * sr + si * si) @ diag
                return c + jnp.mean(ev) * 1e-9, None
            c, _ = jax.lax.scan(step, jnp.float32(0), None, length=iters)
            return c
        return run

    # real train step via the library forward (not the ablated copy)
    def loss_fn(w_, x_, y_, diag_):
        sr, si = fg.forward_fused(spec, w_, x_)
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

    def build_loss(w_):
        gu = fg.build_group_unitaries(spec, w_)
        return sum(jnp.sum(gu[gi][0] ** 2) + jnp.sum(gu[gi][1] ** 2)
                   for gi in gu)

    @jax.jit
    def build_only(w0):
        def step(c, _):
            l, g = jax.value_and_grad(build_loss)(c)
            return c + 1e-12 * g, None
        c, _ = jax.lax.scan(step, w0, None, length=iters)
        return c

    @jax.jit
    def grad_only(w0, x, y, diag):
        def step(c, _):
            l, g = jax.value_and_grad(loss_fn)(c, x, y, diag)
            return c + 1e-12 * g, None
        c, _ = jax.lax.scan(step, w0, None, length=iters)
        return c

    timed('full_step', full_step, (w, opt_state), x, y, diag)
    timed('grad_only (fwd+bwd)', grad_only, w, x, y, diag)
    timed('fwd_full', make_fwd(), w, x, diag)
    timed('fwd_no_ring', make_fwd(('ring',)), w, x, diag)
    timed('fwd_no_hadamard', make_fwd(('hadamard',)), w, x, diag)
    timed('fwd_no_diag', make_fwd(('diag',)), w, x, diag)
    timed('fwd_group0_only', make_fwd(('group1',)), w, x, diag)
    timed('build_unitaries fwd+bwd', build_only, w)

    meta = {"qubits": nq, "net": list(net), "batch": batch,
            "iters": iters, "unroll": fg._scan_unroll(False),
            "platform": jax.devices()[0].platform}
    out = {"meta": meta, "us_per_iter": results}
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
