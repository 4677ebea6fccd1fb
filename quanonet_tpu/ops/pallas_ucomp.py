"""
Pallas f32 unitary-compile kernel — the batch-independent half of the
train step, moved off XLA's small-op path.

Round-3 step profile (docs/step_profile_pallas.json, v5e, flagship
Q5 Net40-2-20-2 bs=100): the full train step is ~147 us, of which the
XLA unitary-compile path (ops/hea.compile_block_unitaries + Hadamard
folding + its backward) is ~72 us — ~100 tiny ops at ~0.7 us of
scheduling overhead each, with under 1 us of actual MXU work.  Worse,
those ops run bf16 by default, and the bf16 noise in the block-matrix
products is what separates the trained quality band (0.170-0.176
rel-L2) from the f32 band (0.162-0.166) on the headline Advection
regime; forcing f32 through XLA costs 6-pass matmuls (+108 us/step).

This kernel computes the SAME block matrices in native f32 inside one
Pallas program per direction: quality of the f32 path at less than the
cost of the bf16 XLA path.

Structure (per sublayer s, all matrices (D, D), D = 2^n):

    S_s^T = U1_s^T @ (z_s[:, None] * U2_s^T) @ P^T        (transposed
    sublayer unitary; P = ring permutation, z = RZ diagonal)

    U_b^T = S_{b,0}^T @ S_{b,1}^T @ ... @ S_{b,ld-1}^T     (fold)

    mt_b  = H @ U_b^T @ H   (b < B-1),   mt_{B-1} = H @ U_B^T

exactly matching ops/hea._sublayer_unitary + compile_block_unitaries +
the Hadamard folding in pallas_hea._prepare (reference semantics:
core/quantum_circuits_ms.py:147-153 ansatz order, :137-144 ring).

Split of labour: everything ELEMENTWISE (cos/sin of weights, the
RY-factor products building U1^T/U2^T, the RZ diagonal) stays in jnp —
XLA elementwise is exact f32 and fuses to a handful of ops, and its
backward comes from autodiff.  The kernels do ONLY the matmul chains
(the part that is both op-overhead-bound and bf16-contaminated in XLA);
their VJP is hand-written (matmul transposes, forward pieces recomputed
in-kernel rather than saved).

Applicability: uniform linear_depth >= 1 across blocks and n_qubits <= 7
(D <= 128, one lane tile).  Callers fall back to the XLA path otherwise.
"""
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quanonet_tpu.ops.gates import (
    cnot_ring_inverse_permutation, hadamard_kron, z_signs,
)
from quanonet_tpu.ops.pallas_hea import (
    DEFAULT_SCOPED_LIMIT, VMEM_LIMIT, _interpret,
)


def ucomp_applicable(spec) -> bool:
    lds = {ld for _, ld in spec.block_configs}
    return (len(lds) == 1 and lds != {0} and spec.n_qubits <= 7
            and spec.n_blocks >= 1)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _ucomp_bytes(S, D):
    """VMEM estimate with (8, 128) tile padding: 3 (S,D,D) inputs,
    2 (B,D,D) outputs, ~8 (D,D) live temporaries."""
    dl = -(-D // 128) * 128
    ds = -(-D // 8) * 8
    return 4 * (3 * S * ds * dl + 2 * S * ds * dl + 8 * ds * dl)


def _maybe_raise(S, D):
    if _ucomp_bytes(S, D) > int(0.85 * DEFAULT_SCOPED_LIMIT):
        return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)
    return None


def _fwd_kernel(nb, ld):
    def kernel(u1_ref, br_ref, bi_ref, pt_ref, h_ref, mtr_out, mti_out):
        pt = pt_ref[:]
        h = h_ref[:]
        for b in range(nb):
            ar = ai = None
            for d in range(ld):
                s = b * ld + d
                u1 = u1_ref[s]
                qr = _dot(u1, br_ref[s])
                qi = _dot(u1, bi_ref[s])
                sr_ = _dot(qr, pt)
                si_ = _dot(qi, pt)
                if d == 0:
                    ar, ai = sr_, si_
                else:                      # acc <- acc @ S_d^T
                    nr = _dot(ar, sr_) - _dot(ai, si_)
                    ni = _dot(ar, si_) + _dot(ai, sr_)
                    ar, ai = nr, ni
            if b < nb - 1:                 # mt_b = H @ acc @ H
                mtr_out[b] = _dot(h, _dot(ar, h))
                mti_out[b] = _dot(h, _dot(ai, h))
            else:                          # last block: mt = H @ acc
                mtr_out[b] = _dot(h, ar)
                mti_out[b] = _dot(h, ai)
    return kernel


def _bwd_kernel(nb, ld):
    """Recompute-all backward: forward pieces (sublayer S^T, fold
    prefixes) are rebuilt in-kernel — cheaper than hauling residents
    through HBM for matrices this small."""
    def kernel(u1_ref, br_ref, bi_ref, pt_ref, h_ref, gr_ref, gi_ref,
               u1bar_out, bbar_r_out, bbar_i_out):
        pt = pt_ref[:]
        h = h_ref[:]
        for b in range(nb):
            # recompute sublayer transposed unitaries and fold prefixes
            subs = []
            pres = []
            ar = ai = None
            for d in range(ld):
                s = b * ld + d
                u1 = u1_ref[s]
                qr = _dot(u1, br_ref[s])
                qi = _dot(u1, bi_ref[s])
                sr_ = _dot(qr, pt)
                si_ = _dot(qi, pt)
                subs.append((sr_, si_))
                if d == 0:
                    ar, ai = sr_, si_
                else:
                    nr = _dot(ar, sr_) - _dot(ai, si_)
                    ni = _dot(ar, si_) + _dot(ai, sr_)
                    ar, ai = nr, ni
                pres.append((ar, ai))

            gr = gr_ref[b]
            gi = gi_ref[b]
            if b < nb - 1:        # mt = H acc H  =>  accbar = H ḡ H
                abar_r = _dot(h, _dot(gr, h))
                abar_i = _dot(h, _dot(gi, h))
            else:                 # mt = H acc    =>  accbar = H ḡ
                abar_r = _dot(h, gr)
                abar_i = _dot(h, gi)

            for d in range(ld - 1, -1, -1):
                if d > 0:
                    # acc_d = acc_{d-1} @ S_d :
                    #   S̄_d = acc_{d-1}^H @ accbar
                    #   accbar_{d-1} = accbar @ S_d^H
                    pr, pi = pres[d - 1]
                    sr_, si_ = subs[d]
                    sbar_r = _dot(pr.T, abar_r) + _dot(pi.T, abar_i)
                    sbar_i = _dot(pr.T, abar_i) - _dot(pi.T, abar_r)
                    nbar_r = _dot(abar_r, sr_.T) + _dot(abar_i, si_.T)
                    nbar_i = _dot(abar_i, sr_.T) - _dot(abar_r, si_.T)
                else:
                    sbar_r, sbar_i = abar_r, abar_i
                    nbar_r = nbar_i = None

                # sublayer bwd: S = (U1 @ B) @ P^T
                s = b * ld + d
                u1 = u1_ref[s]
                qbar_r = _dot(sbar_r, pt.T)
                qbar_i = _dot(sbar_i, pt.T)
                u1bar_out[s] = (_dot(qbar_r, br_ref[s].T)
                                + _dot(qbar_i, bi_ref[s].T))
                bbar_r_out[s] = _dot(u1.T, qbar_r)
                bbar_i_out[s] = _dot(u1.T, qbar_i)

                if d > 0:
                    abar_r, abar_i = nbar_r, nbar_i
    return kernel


@lru_cache(maxsize=64)
def _make_ucomp(nb, ld, dim):
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    S = nb * ld
    params = _maybe_raise(S, dim)

    def fwd_call(u1t, br, bi, pt, h):
        out_shape = (
            jax.ShapeDtypeStruct((nb, dim, dim), jnp.float32),
            jax.ShapeDtypeStruct((nb, dim, dim), jnp.float32),
        )
        return pl.pallas_call(
            _fwd_kernel(nb, ld), out_shape=out_shape,
            in_specs=[vm] * 5, out_specs=(vm,) * 2,
            interpret=_interpret(), compiler_params=params,
        )(u1t, br, bi, pt, h)

    def bwd_call(u1t, br, bi, pt, h, gr, gi):
        out_shape = (
            jax.ShapeDtypeStruct((S, dim, dim), jnp.float32),
            jax.ShapeDtypeStruct((S, dim, dim), jnp.float32),
            jax.ShapeDtypeStruct((S, dim, dim), jnp.float32),
        )
        return pl.pallas_call(
            _bwd_kernel(nb, ld), out_shape=out_shape,
            in_specs=[vm] * 7, out_specs=(vm,) * 3,
            interpret=_interpret(), compiler_params=params,
        )(u1t, br, bi, pt, h, gr, gi)

    @jax.custom_vjp
    def ucomp(u1t, br, bi, pt, h):
        return fwd_call(u1t, br, bi, pt, h)

    def ucomp_fwd(u1t, br, bi, pt, h):
        return fwd_call(u1t, br, bi, pt, h), (u1t, br, bi, pt, h)

    def ucomp_bwd(res, g):
        u1t, br, bi, pt, h = res
        u1bar, bbar_r, bbar_i = bwd_call(u1t, br, bi, pt, h, g[0], g[1])
        return (u1bar, bbar_r, bbar_i,
                jnp.zeros_like(pt), jnp.zeros_like(h))

    ucomp.defvjp(ucomp_fwd, ucomp_bwd)
    return ucomp


@lru_cache(maxsize=16)
def _static_arrays(n_qubits):
    D = 2 ** n_qubits
    bits = ((np.arange(D)[:, None] >> np.arange(n_qubits)[None, :]) & 1)
    eq = (bits[:, None, :] == bits[None, :, :]).astype(np.float32)
    diff_t = (bits[None, :, :] - bits[:, None, :]).astype(np.float32)
    inv = cnot_ring_inverse_permutation(n_qubits)
    pt = np.zeros((D, D), np.float32)
    pt[inv, np.arange(D)] = 1.0            # P^T, P[r, inv[r]] = 1
    return (eq, diff_t, pt, hadamard_kron(n_qubits).astype(np.float32),
            z_signs(n_qubits).astype(np.float32))


def compile_block_mats(spec, weights):
    """weights (S, 3, n) -> (mt_r, mt_i), each (n_blocks, D, D): the
    Hadamard-folded, pre-transposed block matrices the chain kernels
    consume (same contract as pallas_hea._prepare's XLA path).

    Elementwise prep in jnp (exact f32, autodiff'd); matmul chains in
    the Pallas kernel (native f32, hand-written VJP)."""
    n = spec.n_qubits
    D = spec.dim
    nb = spec.n_blocks
    ld = spec.block_configs[0][1]
    eq, diff_t, pt, h, zsgn = _static_arrays(n)
    eq = jnp.asarray(eq)
    diff_t = jnp.asarray(diff_t)

    half = weights * 0.5                                   # (S, 3, n)
    c = jnp.cos(half)
    s = jnp.sin(half)

    def build_ut(cq, sq):
        # ∏_q [eq_q·cos + (j_q - i_q)·sin]  — sequential multiplies so
        # autodiff produces the exact factor-rule backward
        u = eq[..., 0] * cq[:, None, None, 0] \
            + diff_t[..., 0] * sq[:, None, None, 0]
        for q in range(1, n):
            u = u * (eq[..., q] * cq[:, None, None, q]
                     + diff_t[..., q] * sq[:, None, None, q])
        return u                                           # (S, D, D)

    u1t = build_ut(c[:, 0], s[:, 0])                       # RY row 0
    u2t = build_ut(c[:, 2], s[:, 2])                       # RY' row 2
    # RZ diagonal: ph_k = 0.5·Σ_q zsgn[k,q]·w[1,q]  (elementwise, exact)
    ph = jnp.einsum('dq,sq->sd', jnp.asarray(zsgn), half[:, 1],
                    precision=jax.lax.Precision.HIGHEST)   # (S, D)
    zr = jnp.cos(ph)[:, :, None]
    zi = -jnp.sin(ph)[:, :, None]
    br = zr * u2t
    bi = zi * u2t

    ucomp = _make_ucomp(nb, ld, D)
    return ucomp(u1t, br, bi, jnp.asarray(pt), jnp.asarray(h))
