"""
Fused Adam — the whole optimizer update as ONE Pallas kernel.

Round-3 step profile (docs/step_profile_pallas.json): optax.adam on the
flagship's 2,401 parameters costs 15.5 us/step — ~20 tiny XLA ops
(per-leaf m/v/bias-correction/update chains) at ~0.7 us of v5e
scheduling overhead each, for well under a microsecond of actual VPU
work.  At bs=100 that is ~10% of the whole 147 us train step.

This module evaluates the identical update rule (optax.scale_by_adam
semantics: mu/nu EMAs, exp-based bias correction, sqrt(nu_hat)+eps
denominator) for EVERY parameter leaf inside a single kernel: 4L+1
VMEM inputs (params, grads, mu, nu per leaf + a (1,2) [lr, t] scalar
pane), 3L outputs.  Leaves are viewed as (1, size) rows (pure bitcast
reshapes, fused into operand layouts by XLA), so the only XLA-side ops
per step are the count increment and the lr-schedule evaluation.

Drop-in use: build with fused_adam(lr_or_schedule) and call
``optimizer.fused_step(grads, state, params)`` — solver.make_train_epoch
takes this path automatically when the optimizer exposes ``fused_step``
(falling back to the optax update/apply pair otherwise).

MEASURED (v5e round 3, profile_step --fused_adam, flagship step):
NEGATIVE RESULT — full_step 176.9 us vs optax's 147.0 (159.3 with the
flatten-to-(1,size) variant whose relayouts cost another +12).  An
additional pallas_call launch costs ~25-30 us on this backend — more
than the ~15 us of tiny XLA ops it replaces; the same launch overhead
is why the ucomp kernels (ops/pallas_ucomp.py) lose despite their 4x
issue-count reduction.  Rule of thumb for this backend: a Pallas kernel
must ABSORB at least ~30 us of XLA op overhead to pay for its launch —
only the block-chain kernel (60-block sequential body) clears that bar.
Kept: correct, tested (tests/test_fused_adam.py), off by default;
nothing constructs FusedAdam unless explicitly requested.

The update math mirrors optax.adam (b1=0.9, b2=0.999, eps=1e-8,
eps_root=0); reference equivalent: MindSpore nn.Adam inside
solver_ms.py:150-180's optimizer table.
"""
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quanonet_tpu.ops.pallas_hea import _interpret


def _adam_kernel(L, b1, b2, eps):
    lb1 = float(np.log(b1))
    lb2 = float(np.log(b2))

    def kernel(*refs):
        sc = refs[4 * L][:]                      # (1, 2): [lr, t]
        lr = sc[0, 0]
        t = sc[0, 1]
        c1 = 1.0 - jnp.exp(t * lb1)              # 1 - b1^t
        c2 = 1.0 - jnp.exp(t * lb2)
        for i in range(L):
            p = refs[i][:]
            g = refs[L + i][:]
            m = refs[2 * L + i][:]
            v = refs[3 * L + i][:]
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * (g * g)
            upd = (m / c1) / (jnp.sqrt(v / c2) + eps)
            refs[4 * L + 1 + i][:] = p - lr * upd
            refs[4 * L + 1 + L + i][:] = m
            refs[4 * L + 1 + 2 * L + i][:] = v
    return kernel


class FusedAdam:
    """Adam with a one-kernel update.  API: init(params) -> state;
    fused_step(grads, state, params) -> (new_params, new_state).
    state = (count f32 scalar, mu tree, nu tree)."""

    def __init__(self, learning_rate, b1=0.9, b2=0.999, eps=1e-8):
        self.learning_rate = learning_rate
        self.b1 = float(b1)
        self.b2 = float(b2)
        self.eps = float(eps)

    def init(self, params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return (jnp.zeros((), jnp.float32), zeros,
                jax.tree_util.tree_map(jnp.zeros_like, params))

    def fused_step(self, grads, state, params):
        count, mu, nu = state
        t = count + 1.0
        # optax.adam evaluates schedules at the PRE-increment count
        # (optax.scale_by_learning_rate sees `count` before this step's
        # inc) — match it so a solver-built schedule is a drop-in
        lr = (self.learning_rate(count) if callable(self.learning_rate)
              else self.learning_rate)
        p_leaves, treedef = jax.tree_util.tree_flatten(params)
        g_leaves = treedef.flatten_up_to(grads)
        m_leaves = treedef.flatten_up_to(mu)
        v_leaves = treedef.flatten_up_to(nu)
        L = len(p_leaves)
        # NATIVE leaf shapes (scalars/vectors lifted to 2D): a flatten
        # to (1, size) is a physical relayout on the TPU's tiled memory
        # (measured +12 us/step), not a free bitcast — rank-lifting
        # reshapes that only add unit/leading dims are layout-preserving
        shapes = [(1, 1) if a.ndim == 0
                  else (1,) + a.shape if a.ndim == 1 else a.shape
                  for a in p_leaves]

        def rows(leaves):
            return [a.reshape(s) for a, s in zip(leaves, shapes)]

        sc = jnp.stack([jnp.asarray(lr, jnp.float32),
                        t.astype(jnp.float32)]).reshape(1, 2)
        vm = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct(s, jnp.float32)
                     for s in shapes] * 3
        outs = pl.pallas_call(
            _adam_kernel(L, self.b1, self.b2, self.eps),
            out_shape=out_shape,
            in_specs=[vm] * (4 * L + 1), out_specs=[vm] * (3 * L),
            interpret=_interpret(),
        )(*rows(p_leaves), *rows(g_leaves), *rows(m_leaves),
          *rows(v_leaves), sc)

        def back(flat, like):
            return treedef.unflatten(
                [o.reshape(a.shape) for o, a in zip(flat, like)])

        new_params = back(outs[:L], p_leaves)
        new_mu = back(outs[L:2 * L], m_leaves)
        new_nu = back(outs[2 * L:], v_leaves)
        return new_params, (t, new_mu, new_nu)


def fused_adam(learning_rate, **kw):
    return FusedAdam(learning_rate, **kw)
