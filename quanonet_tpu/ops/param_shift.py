"""
Parameter-shift and SPSA gradients — the QPU-trainable path.

Every gate in the HEA ansatz is exp(-i θ P / 2) for a single Pauli word P
with eigenvalues ±1 (RY/RZ rotations, ops/gates.ry_matrix and
ops/hea._apply_rz half-angle conventions), and the encode diagonal is
Π_j exp(-i x_j Z_j / 2) (ops/hea.py phases = 0.5·zsgn@x).  For such gates
the two-point parameter-shift rule is EXACT, not a finite difference:

    dE/dθ = [ E(θ + π/2) − E(θ − π/2) ] / 2

This module provides hardware-compatible gradients — gradients computable
from nothing but extra circuit executions, the only kind available on a
real QPU:

  * ``make_ps_expectation`` — a drop-in replacement for
    ops.hea.hea_expectation / ops.sampling.shot_expectation whose custom
    VJP is the shift rule for BOTH the ansatz weights and the encode
    inputs.  Because the encode-input cotangent is exact, gradients flow
    through to the classical TrainableFreq layers and the FULL QuanONet
    model trains end-to-end with circuit-evaluation-only gradients.  With
    ``shots`` set, each shifted evaluation is finite-shot sampled
    (independent keys), giving the unbiased stochastic gradient a real
    device would deliver — this makes finite-shot TRAINING possible
    (plain autodiff cannot differentiate through multinomial sampling).
  * ``shift_jacobian`` — the exact per-sample dE/dw Jacobian; doubles as
    an independent gradient oracle against jax.grad (the identity holds
    to float32 rounding, tests/test_param_shift.py).
  * ``spsa_gradient`` / ``make_spsa_step`` — the 2-evaluation
    simultaneous-perturbation estimator (Spall 1992), the standard
    measurement-frugal optimizer on today's QPUs: cost independent of
    parameter count, O(c²)-biased, unbiased in direction on average.

Reference parity note: no reference backend trains on hardware — its
qiskit surface (reference core/quantum_circuits_qiskit.py) evaluates
forward only, and training always runs through a simulator's autodiff.
Cost model: the shift VJP runs 2·(S·3·n) + 2·(nb·n) extra circuit
evaluations per step (batched on-device via vmap; ``chunk`` bounds the
fan-out for big specs), exactly the executions a QPU submission would
need.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from quanonet_tpu.ops.hea import HEASpec, hea_expectation

SHIFT = 0.5 * np.pi


def _chunked_vmap(fn, n, chunk):
    """vmap fn over jnp.arange(n); chunk bounds concurrent evaluations
    (lax.map over index chunks — one compiled body, static shapes).
    Indices are padded to a chunk multiple with repeats of 0; the padded
    results are discarded."""
    idx = jnp.arange(n)
    if chunk is None or chunk >= n:
        return jax.vmap(fn)(idx)
    pad = (-n) % chunk
    idx = jnp.concatenate([idx, jnp.zeros(pad, idx.dtype)])
    out = jax.lax.map(jax.vmap(fn), idx.reshape(-1, chunk))
    out = jax.tree_util.tree_map(
        lambda a: a.reshape((n + pad,) + a.shape[2:])[:n], out)
    return out


def make_ps_expectation(spec: HEASpec, diag=None, pauli='Z', offset=0.0,
                        coeff=0.0, engine='auto', shots=None, chunk=None):
    """Build the shift-rule expectation for a fixed circuit/observable.

    Returns ``f(weights, x)`` (exact expectations) or, with ``shots``,
    ``f(weights, x, key)`` (finite-shot sampled, independent shot noise
    per shifted evaluation).  Output (batch, 1) float32, identical to
    hea_expectation / shot_expectation on the forward pass; the backward
    is the exact two-point shift rule instead of autodiff.
    """
    wshape = spec.weight_shape()
    n_w = int(np.prod(wshape))
    n_x = spec.total_encode

    if shots is None:
        def _eval(w, x, _key, _i):
            return hea_expectation(spec, w, x, diag=diag, pauli=pauli,
                                   offset=offset, coeff=coeff, engine=engine)
    else:
        from quanonet_tpu.ops.sampling import shot_expectation

        def _eval(w, x, key, i):
            return shot_expectation(jax.random.fold_in(key, i), spec, w, x,
                                    shots, diag=diag, pauli=pauli,
                                    offset=offset, coeff=coeff, engine=engine)

    def _bwd_impl(weights, x, key, g):
        # g: (batch, 1) cotangent of the expectation
        def w_term(p):
            dw = (SHIFT * jax.nn.one_hot(p, n_w,
                                         dtype=weights.dtype)).reshape(wshape)
            ep = _eval(weights + dw, x, key, 1 + p)
            em = _eval(weights - dw, x, key, 1 + n_w + p)
            return 0.5 * jnp.sum((ep - em) * g)

        def x_term(j):
            # encode column j is one exp(-i x_j Z/2) gate per sample; the
            # batch-diagonal Jacobian comes out of ONE shifted batch eval
            dx = SHIFT * jax.nn.one_hot(j, n_x, dtype=x.dtype)
            ep = _eval(weights, x + dx, key, 1 + 2 * n_w + j)
            em = _eval(weights, x - dx, key, 1 + 2 * n_w + n_x + j)
            return 0.5 * jnp.sum((ep - em) * g, axis=-1)   # (batch,)

        gw = _chunked_vmap(w_term, n_w, chunk).reshape(wshape)
        gx = _chunked_vmap(x_term, n_x, chunk).T           # (batch, n_x)
        return gw.astype(weights.dtype), gx.astype(x.dtype)

    if shots is None:
        @jax.custom_vjp
        def f(weights, x):
            return _eval(weights, x, None, 0)

        def fwd(weights, x):
            return _eval(weights, x, None, 0), (weights, x)

        def bwd(res, g):
            weights, x = res
            return _bwd_impl(weights, x, None, g)

        f.defvjp(fwd, bwd)
        return f

    @jax.custom_vjp
    def fs(weights, x, key):
        return _eval(weights, x, key, 0)

    def fwd(weights, x, key):
        return _eval(weights, x, key, 0), (weights, x, key)

    def bwd(res, g):
        weights, x, key = res
        gw, gx = _bwd_impl(weights, x, key, g)
        # PRNG keys are integer-typed: their cotangent is float0
        gk = np.zeros(np.shape(key), dtype=jax.dtypes.float0)
        return gw, gx, gk

    fs.defvjp(fwd, bwd)
    return fs


def shift_jacobian(spec: HEASpec, weights, x, diag=None, pauli='Z',
                   offset=0.0, coeff=0.0, engine='auto', chunk=None):
    """Exact per-sample Jacobian dE/dw, shape (batch,) + weight_shape.

    Independent gradient oracle: computes what jax.grad computes, through
    nothing but 2·P forward circuit evaluations (the identity is exact up
    to float32 rounding — see module docstring)."""
    wshape = spec.weight_shape()
    n_w = int(np.prod(wshape))

    def col(p):
        dw = (SHIFT * jax.nn.one_hot(p, n_w,
                                     dtype=weights.dtype)).reshape(wshape)
        ep = hea_expectation(spec, weights + dw, x, diag=diag, pauli=pauli,
                             offset=offset, coeff=coeff, engine=engine)
        em = hea_expectation(spec, weights - dw, x, diag=diag, pauli=pauli,
                             offset=offset, coeff=coeff, engine=engine)
        return 0.5 * (ep - em)[:, 0]                       # (batch,)

    jac = _chunked_vmap(col, n_w, chunk)                   # (P, batch)
    batch = x.shape[0]
    return jnp.moveaxis(jac, 0, -1).reshape((batch,) + wshape)


# ── SPSA ─────────────────────────────────────────────────────────────────────

def spsa_gradient(loss_fn, params, key, c=0.05):
    """Simultaneous-perturbation gradient estimate from TWO loss
    evaluations (Spall 1992): ĝ = Δ · [L(θ+cΔ) − L(θ−cΔ)] / (2c) with
    Rademacher Δ (so 1/Δᵢ = Δᵢ).  Works on any float pytree — on a QPU
    this prices a full-model gradient at two circuit-batch executions
    regardless of parameter count.  Returns (grad_estimate, loss_mid)
    where loss_mid = (L⁺ + L⁻)/2 (a free loss estimate; no third eval).
    """
    leaves, tree = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    deltas = [
        jax.random.rademacher(k, l.shape, l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating)
        else jnp.zeros_like(l)
        for k, l in zip(keys, leaves)
    ]
    plus = jax.tree_util.tree_unflatten(
        tree, [l + c * d for l, d in zip(leaves, deltas)])
    minus = jax.tree_util.tree_unflatten(
        tree, [l - c * d for l, d in zip(leaves, deltas)])
    lp = loss_fn(plus)
    lm = loss_fn(minus)
    scale = (lp - lm) / (2.0 * c)
    grad = jax.tree_util.tree_unflatten(tree, [scale * d for d in deltas])
    return grad, 0.5 * (lp + lm)


def make_spsa_step(loss_fn, optimizer, c=0.05):
    """Jittable SPSA optimizer step for any optax optimizer:
    step(params, opt_state, key) -> (params, opt_state, loss_mid)."""
    import optax

    def step(params, opt_state, key):
        grad, loss = spsa_gradient(loss_fn, params, key, c=c)
        updates, opt_state = optimizer.update(grad, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss
    return step
