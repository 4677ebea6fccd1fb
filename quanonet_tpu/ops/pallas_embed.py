"""
Real-embedding Pallas chain — one MXU matmul per block.

The fused chain in ops/pallas_hea.py computes each block's complex
matmul with 3 Karatsuba matmuls on (batch, d) operands.  At the
flagship shape (d=32, 60 blocks) every matmul is far below one MXU
tile, so the step is bound by per-op pipeline fill, not MACs — ~540
matmul issues per train step at ~0.2 µs each (docs/BENCHMARKS.md).

This variant packs the state as one real row [re | im] of width 2d and
embeds each block matrix as the standard real representation of complex
multiplication

    [re'|im'] = [re|im] @ [[ Mr,  Mi],
                           [-Mi,  Mr]]

so a block is ONE (batch, 2d) @ (2d, 2d) matmul — 3× fewer MXU issues
(and 2d = 64 still fits one 128-lane tile at Q5).  The per-sample
diagonal phase becomes, with packed angles t = [φ | −φ]:

    s' = cos(t) ⊙ u + sin(t) ⊙ swap(u),   swap = exchange halves

(lower half: cosφ·ur + sinφ·ui; upper: cosφ·ui − sinφ·ur — exactly the
(pr, pi) = (cosφ, −sinφ) complex product of the Karatsuba kernel).

Backward is a hand-written VJP in the same packed layout; the complex
structure of Ē is resolved OUTSIDE the kernel (M̄r = Ē₁₁+Ē₂₂,
M̄i = Ē₁₂−Ē₂₁) by XLA, which also differentiates the packing in
_prepare automatically.

Engine name: ``embed``.  Not the default until A/B'd on hardware
against ``pallas`` (bench_qubit_scaling.py / bench.py --engine embed);
numerically verified against the dense engine in tests/test_pallas.py.
"""
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quanonet_tpu.ops import hea as _hea
from quanonet_tpu.ops.pallas_hea import (
    _interpret, _maybe_params2, _pad_batch, _prepare, VMEM_BUDGET,
)


def _embed_workset_bytes(nb, batch, d):
    """fwd+bwd resident bytes with Mosaic (8,128) tile padding: E and the
    backward's ebar output pad their minor axis to 128 lanes (2d=64 pads
    to 128 at Q5); tbar mirrors t.  Counting the backward OUTPUTS matches
    _chain_workset_bytes — omitting them understated the working set near
    the VMEM_BUDGET dense-fallback boundary."""
    n8 = -(-batch // 8) * 8
    d2s = -(-2 * d // 8) * 8        # sublane pad of the 2d axis
    d2 = -(-2 * d // 128) * 128     # lane pad of the 2d axis
    return 4 * (2 * nb * d2s * d2               # E + ebar (bwd output)
                + 2 * nb * n8 * d2              # t (phases) + tbar output
                + 2 * nb * n8 * d2              # saved s, u
                + 3 * n8 * d2)                  # live temps


def _swap(a, d):
    return jnp.concatenate([a[:, d:], a[:, :d]], axis=1)


def _fwd_kernel(nb, d, inv_sqrt):
    def kernel(e_ref, t_ref, out_ref, s_out, u_out):
        t0 = t_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, t0.shape, 1)
        s = inv_sqrt * jnp.where(lane < d, jnp.cos(t0), jnp.sin(t0))
        for b in range(nb - 1):
            s_out[b] = s
            u = jnp.dot(s, e_ref[b], preferred_element_type=jnp.float32)
            u_out[b] = u
            t = t_ref[b + 1]
            s = jnp.cos(t) * u + jnp.sin(t) * _swap(u, d)
        s_out[nb - 1] = s
        out_ref[:] = jnp.dot(s, e_ref[nb - 1],
                             preferred_element_type=jnp.float32)
    return kernel


def _bwd_kernel(nb, d, inv_sqrt):
    def kernel(e_ref, t_ref, s_ref, u_ref, g_ref, ebar_out, tbar_out):
        g = g_ref[:]
        s = s_ref[nb - 1]
        ebar_out[nb - 1] = jnp.dot(s.T, g,
                                   preferred_element_type=jnp.float32)
        sbar = jnp.dot(g, e_ref[nb - 1].T,
                       preferred_element_type=jnp.float32)
        for b in range(nb - 2, -1, -1):
            t = t_ref[b + 1]
            c = jnp.cos(t)
            sn = jnp.sin(t)
            u = u_ref[b]
            # s' = c⊙u + sn⊙swap(u):  t̄ = s̄⊙(−sn⊙u + c⊙swap(u))
            tbar_out[b + 1] = sbar * (c * _swap(u, d) - sn * u)
            ubar = c * sbar + _swap(sn * sbar, d)
            s = s_ref[b]
            ebar_out[b] = jnp.dot(s.T, ubar,
                                  preferred_element_type=jnp.float32)
            sbar = jnp.dot(ubar, e_ref[b].T,
                           preferred_element_type=jnp.float32)
        # s0 = inv_sqrt·where(lane<d, cos t0, sin t0)
        t0 = t_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, t0.shape, 1)
        tbar_out[0] = sbar * inv_sqrt * jnp.where(
            lane < d, -jnp.sin(t0), jnp.cos(t0))
    return kernel


@lru_cache(maxsize=64)
def _make_chain(nb, d, inv_sqrt):
    """custom-vjp packed chain: (E, t) -> packed out (batch, 2d)."""
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    def fwd_call(e, t):
        n = t.shape[1]
        d2 = 2 * d
        out_shape = (
            jax.ShapeDtypeStruct((n, d2), jnp.float32),           # out
            jax.ShapeDtypeStruct((nb, n, d2), jnp.float32),       # states
            jax.ShapeDtypeStruct((max(nb - 1, 1), n, d2), jnp.float32),
        )
        return pl.pallas_call(
            _fwd_kernel(nb, d, inv_sqrt),
            out_shape=out_shape,
            in_specs=[vm, vm],
            out_specs=(vm,) * 3,
            interpret=_interpret(),
            compiler_params=_maybe_params2(
                _embed_workset_bytes(nb, n, d),
                4 * 2 * nb * (2 * d) * max(2 * d, 128)),
        )(e, t)

    def bwd_call(e, t, states, u, g):
        n = t.shape[1]
        d2 = 2 * d
        out_shape = (
            jax.ShapeDtypeStruct((nb, d2, d2), jnp.float32),      # ebar
            jax.ShapeDtypeStruct((nb, n, d2), jnp.float32),       # tbar
        )
        return pl.pallas_call(
            _bwd_kernel(nb, d, inv_sqrt),
            out_shape=out_shape,
            in_specs=[vm] * 5,
            out_specs=(vm,) * 2,
            interpret=_interpret(),
            compiler_params=_maybe_params2(
                _embed_workset_bytes(nb, n, d),
                4 * 2 * nb * (2 * d) * max(2 * d, 128)),
        )(e, t, states, u, g)

    @jax.custom_vjp
    def chain(e, t):
        out, _, _ = fwd_call(e, t)
        return out

    def chain_fwd(e, t):
        out, states, u = fwd_call(e, t)
        return out, (e, t, states, u)

    def chain_bwd(res, g):
        return bwd_call(*res, g)

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


def forward_embed(spec, weights, x):
    """(sr, si) via the packed real-embedding chain; dense fallback when
    the working set exceeds the VMEM budget (same contract as
    forward_pallas)."""
    nb, d = spec.n_blocks, spec.dim
    batch = x.shape[0]
    if _embed_workset_bytes(nb, max(batch, 8), d) > VMEM_BUDGET \
            or not spec.uniform_encode or nb < 2:
        return _hea._forward_dense(spec, weights, x)
    mt_r, mt_i, phi = _prepare(spec, weights, x)
    e = jnp.concatenate([
        jnp.concatenate([mt_r, mt_i], axis=2),
        jnp.concatenate([-mt_i, mt_r], axis=2)], axis=1)   # (nb, 2d, 2d)
    t = jnp.concatenate([phi, -phi], axis=2)               # (nb, batch, 2d)
    t_p, n_real = _pad_batch(t.transpose(1, 0, 2))
    t_p = t_p.transpose(1, 0, 2)
    chain = _make_chain(nb, d, float(1.0 / np.sqrt(d)))
    out = chain(e, t_p)
    return out[:n_real, :d], out[:n_real, d:]


def hea_expectation_embed(spec, weights, x, diag):
    sr, si = forward_embed(spec, weights, x)
    return _hea.diag_expectation_pair(sr, si, jnp.asarray(diag))
