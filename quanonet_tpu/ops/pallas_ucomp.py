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

This module computes the SAME block matrices in native f32.  A first,
straight-line kernel (one (D,D) matmul per op) measured 207 us/step —
~3,000 tiny in-kernel matmuls at ~0.04 us of issue cost each.  The
production kernel therefore packs G=4 blocks BLOCK-DIAGONALLY into
(4D, 4D) = (128, 128) operands (one full MXU tile at Q5): the chain of
every per-block matrix product runs on packed operands, cutting issue
count ~4x, and block-diagonality is preserved exactly through matmuls
(zero off-diagonal stays zero in f32).

Structure (per sublayer s, transposed from the start to avoid any
in-kernel transposes of the outputs):

    S_s^T = U1_s^T @ (z_s[:, None] * U2_s^T) @ P^T

with P the ring permutation: P^T is folded into prep as a free column
gather (B' = B[..., inv]).  Per block: fold ld sublayers
U_b^T = S_0^T @ ... @ S_{ld-1}^T (Karatsuba), then
mt_b = H @ U_b^T @ H (last block: right factor I instead of H) —
exactly matching ops/hea._sublayer_unitary + compile_block_unitaries +
the Hadamard folding in pallas_hea._prepare (reference semantics:
core/quantum_circuits_ms.py:147-153 ansatz order, :137-144 ring).

Split of labour: everything ELEMENTWISE (cos/sin of weights, RY-factor
products, RZ diagonal, the block-diagonal packing/unpacking) stays in
jnp — XLA elementwise is exact f32, fuses to a handful of ops, and its
backward comes from autodiff.  The kernels do ONLY the packed matmul
chains; their VJP is hand-written (recompute-all, matmul transposes).

Applicability: uniform linear_depth >= 1 across blocks and n_qubits <= 7
(D <= 128).  Callers fall back to the XLA path otherwise.
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

GROUP = 4    # blocks packed per (GROUP*D, GROUP*D) operand


def ucomp_applicable(spec) -> bool:
    lds = {ld for _, ld in spec.block_configs}
    return (len(lds) == 1 and lds != {0} and spec.n_qubits <= 7
            and spec.n_blocks >= 1)


import os

# bf16 operand mode (env A/B toggle): casts every packed matmul's
# operands to bf16 (single-pass MXU, XLA-default-equivalent numerics)
# while keeping the kernel's 4x issue-count reduction — trades the f32
# exactness this kernel was built for against the multi-pass MXU cost
# that made the f32 variant lose to XLA (round-3 measurement).
# MEASURED (v5e, profile_step flagship): 202.6 us/step — identical to
# the f32 variant's 196-207 and still behind the 147 us XLA path, so
# the kernel's deficit is packing traffic + in-kernel issue overhead,
# not MXU pass count.  Negative result; kept for reproducibility.
UCOMP_BF16 = os.environ.get('UCOMP_BF16', '0') == '1'


def _dot(a, b):
    if UCOMP_BF16:
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _kara(ar, ai, br, bi):
    """(ar + i ai) @ (br + i bi): 3 real matmuls."""
    t1 = _dot(ar, br)
    t2 = _dot(ai, bi)
    t3 = _dot(ar + ai, br + bi)
    return t1 - t2, t3 - t1 - t2


def _ucomp_bytes(ng, ld, gd):
    """VMEM estimate, (8,128) tile padding, sized for the LARGER of the
    two kernels sharing these CompilerParams: fwd = 3 packed (ng*ld,
    gd, gd) inputs + 2 (ng, gd, gd) outputs; bwd adds 3*ng*ld cotangent
    OUTPUTS, gr/gi (2*ng) inputs, rp (ng) and ~4*ld extra live
    residual/temp panes per group — the bwd dominates."""
    dl = -(-gd // 128) * 128
    ds = -(-gd // 8) * 8
    fwd_panes = (3 * ng * ld + 2 * ng + 3) + 10
    bwd_panes = (6 * ng * ld + 3 * ng + 3) + 10 + 4 * ld
    return 4 * max(fwd_panes, bwd_panes) * ds * dl


def _maybe_raise(ng, ld, gd):
    if _ucomp_bytes(ng, ld, gd) > int(0.85 * DEFAULT_SCOPED_LIMIT):
        return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)
    return None


def _fwd_kernel(ng, ld):
    def kernel(u1_ref, br_ref, bi_ref, h_ref, r_ref, mtr_out, mti_out):
        h = h_ref[:]
        for g in range(ng):
            rp = r_ref[g]
            ar = ai = None
            for d in range(ld):
                s = g * ld + d
                u1 = u1_ref[s]
                sr_ = _dot(u1, br_ref[s])
                si_ = _dot(u1, bi_ref[s])
                if d == 0:
                    ar, ai = sr_, si_
                else:                      # acc <- acc @ S_d^T
                    ar, ai = _kara(ar, ai, sr_, si_)
            # mt = H @ acc @ R   (R = blockdiag of H, except I in the
            # slot holding the final circuit block)
            ar = _dot(_dot(h, ar), rp)
            ai = _dot(_dot(h, ai), rp)
            mtr_out[g] = ar
            mti_out[g] = ai
    return kernel


def _bwd_kernel(ng, ld):
    """Recompute-all backward: sublayer products and fold prefixes are
    rebuilt in-kernel (cheaper than an HBM round-trip for residuals)."""
    def kernel(u1_ref, br_ref, bi_ref, h_ref, r_ref, gr_ref, gi_ref,
               u1bar_out, bbar_r_out, bbar_i_out):
        h = h_ref[:]
        for g in range(ng):
            rp = r_ref[g]
            subs = []
            pres = []
            ar = ai = None
            for d in range(ld):
                s = g * ld + d
                u1 = u1_ref[s]
                sr_ = _dot(u1, br_ref[s])
                si_ = _dot(u1, bi_ref[s])
                subs.append((sr_, si_))
                if d == 0:
                    ar, ai = sr_, si_
                elif d < ld - 1:   # last fold product not needed in bwd
                    ar, ai = _kara(ar, ai, sr_, si_)
                pres.append((ar, ai))

            # mt = H acc R  =>  accbar = H ḡ R  (H, R symmetric real)
            abar_r = _dot(_dot(h, gr_ref[g]), rp)
            abar_i = _dot(_dot(h, gi_ref[g]), rp)

            for d in range(ld - 1, -1, -1):
                if d > 0:
                    # acc_d = acc_{d-1} @ S_d:
                    #   S̄_d = acc_{d-1}^H accbar ; accbar <- accbar S_d^H
                    pr, pi = pres[d - 1]
                    sr_, si_ = subs[d]
                    sbar_r = _dot(pr.T, abar_r) + _dot(pi.T, abar_i)
                    sbar_i = _dot(pr.T, abar_i) - _dot(pi.T, abar_r)
                    nbar_r = _dot(abar_r, sr_.T) + _dot(abar_i, si_.T)
                    nbar_i = _dot(abar_i, sr_.T) - _dot(abar_r, si_.T)
                else:
                    sbar_r, sbar_i = abar_r, abar_i
                    nbar_r = nbar_i = None

                # S = U1 @ B' (U1 real)
                s = g * ld + d
                u1 = u1_ref[s]
                u1bar_out[s] = (_dot(sbar_r, br_ref[s].T)
                                + _dot(sbar_i, bi_ref[s].T))
                bbar_r_out[s] = _dot(u1.T, sbar_r)
                bbar_i_out[s] = _dot(u1.T, sbar_i)

                if d > 0:
                    abar_r, abar_i = nbar_r, nbar_i
    return kernel


@lru_cache(maxsize=64)
def _make_ucomp(ng, ld, gd):
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    params = _maybe_raise(ng, ld, gd)

    def fwd_call(u1p, bpr, bpi, hp, rp):
        out_shape = (
            jax.ShapeDtypeStruct((ng, gd, gd), jnp.float32),
            jax.ShapeDtypeStruct((ng, gd, gd), jnp.float32),
        )
        return pl.pallas_call(
            _fwd_kernel(ng, ld), out_shape=out_shape,
            in_specs=[vm] * 5, out_specs=(vm,) * 2,
            interpret=_interpret(), compiler_params=params,
        )(u1p, bpr, bpi, hp, rp)

    def bwd_call(u1p, bpr, bpi, hp, rp, gr, gi):
        S = ng * ld
        out_shape = (
            jax.ShapeDtypeStruct((S, gd, gd), jnp.float32),
            jax.ShapeDtypeStruct((S, gd, gd), jnp.float32),
            jax.ShapeDtypeStruct((S, gd, gd), jnp.float32),
        )
        return pl.pallas_call(
            _bwd_kernel(ng, ld), out_shape=out_shape,
            in_specs=[vm] * 7, out_specs=(vm,) * 3,
            interpret=_interpret(), compiler_params=params,
        )(u1p, bpr, bpi, hp, rp, gr, gi)

    @jax.custom_vjp
    def ucomp(u1p, bpr, bpi, hp, rp):
        return fwd_call(u1p, bpr, bpi, hp, rp)

    def ucomp_fwd(u1p, bpr, bpi, hp, rp):
        return fwd_call(u1p, bpr, bpi, hp, rp), (u1p, bpr, bpi, hp, rp)

    def ucomp_bwd(res, g):
        u1p, bpr, bpi, hp, rp = res
        u1bar, bbar_r, bbar_i = bwd_call(u1p, bpr, bpi, hp, rp,
                                         g[0], g[1])
        return (u1bar, bbar_r, bbar_i,
                jnp.zeros_like(hp), jnp.zeros_like(rp))

    ucomp.defvjp(ucomp_fwd, ucomp_bwd)
    return ucomp


@lru_cache(maxsize=16)
def _static_arrays(n_qubits):
    D = 2 ** n_qubits
    bits = ((np.arange(D)[:, None] >> np.arange(n_qubits)[None, :]) & 1)
    eq = (bits[:, None, :] == bits[None, :, :]).astype(np.float32)
    diff_t = (bits[None, :, :] - bits[:, None, :]).astype(np.float32)
    inv = cnot_ring_inverse_permutation(n_qubits)
    return (eq, diff_t, np.asarray(inv),
            hadamard_kron(n_qubits).astype(np.float32),
            z_signs(n_qubits).astype(np.float32))


def _pack_blockdiag(a, ng, G, D):
    """(ng*G, ..., D, D) -> (ng, ..., G*D, G*D) block-diagonal.  Pure
    pad-and-add: exact f32, autodiff transposes back to slices."""
    lead = a.shape[1:-2]
    a = a.reshape((ng, G) + lead + (D, D))
    out = 0
    for j in range(G):
        pad = [(0, 0)] * (a.ndim - 3) + [(j * D, (G - 1 - j) * D),
                                         (j * D, (G - 1 - j) * D)]
        out = out + jnp.pad(a[:, j], pad)
    return out


def compile_block_mats(spec, weights):
    """weights (S, 3, n) -> (mt_r, mt_i), each (n_blocks, D, D): the
    Hadamard-folded, pre-transposed block matrices the chain kernels
    consume (same contract as pallas_hea._prepare's XLA path)."""
    n = spec.n_qubits
    D = spec.dim
    nb = spec.n_blocks
    ld = spec.block_configs[0][1]
    eq, diff_t, inv, h, zsgn = _static_arrays(n)
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
    ph = jnp.einsum('dq,sq->sd', jnp.asarray(zsgn), half[:, 1],
                    precision=jax.lax.Precision.HIGHEST)   # (S, D)
    zr = jnp.cos(ph)[:, :, None]
    zi = -jnp.sin(ph)[:, :, None]
    # B' = (z ⊙row U2^T) @ P^T — the permutation folded as a gather
    br = (zr * u2t)[:, :, inv]
    bi = (zi * u2t)[:, :, inv]

    # pad the block count to a GROUP multiple with identity blocks
    G = min(GROUP, nb)
    nb_pad = -(-nb // G) * G
    if nb_pad != nb:
        pad_n = (nb_pad - nb) * ld
        eye = jnp.broadcast_to(jnp.eye(D, dtype=jnp.float32),
                               (pad_n, D, D))
        zero = jnp.zeros((pad_n, D, D), jnp.float32)
        u1t = jnp.concatenate([u1t, eye])
        br = jnp.concatenate([br, eye])
        bi = jnp.concatenate([bi, zero])
    ng = nb_pad // G

    # pack sublayers (j-within-group fastest): block b = g*G + j holds
    # sublayers b*ld + d; packed index s_packed = g*ld + d over
    # (G*D)-sized operands with slot j = b % G
    def to_packed(a):
        # (nb_pad*ld, D, D) -> (ng, ld, G, D, D) -> blockdiag
        a = a.reshape(ng, G, ld, D, D).transpose(0, 2, 1, 3, 4)
        a = a.reshape(ng * G * ld, D, D)  # order: g, d, j
        # _pack_blockdiag packs groups of G consecutive entries
        p = _pack_blockdiag(a, ng * ld, G, D)
        return p                                        # (ng*ld, GD, GD)

    u1p = to_packed(u1t)
    bpr = to_packed(br)
    bpi = to_packed(bi)

    hp = jnp.asarray(np.kron(np.eye(G, dtype=np.float32), h))
    # right factor: H per slot, except I for the final circuit block
    rp_np = np.zeros((ng, G * D, G * D), np.float32)
    for g in range(ng):
        for j in range(G):
            b = g * G + j
            blk = np.eye(D, dtype=np.float32) if b == nb - 1 else h
            rp_np[g, j * D:(j + 1) * D, j * D:(j + 1) * D] = blk
    rp = jnp.asarray(rp_np)

    ucomp = _make_ucomp(ng, ld, G * D)
    mtp_r, mtp_i = ucomp(u1p, bpr, bpi, hp, rp)

    # unpack the diagonal blocks: block b = g*G + j
    def unpack(p):
        p = p.reshape(ng, G * D, G, D)
        rows = [p[:, j * D:(j + 1) * D, j, :] for j in range(G)]
        out = jnp.stack(rows, axis=1).reshape(nb_pad, D, D)
        return out[:nb]
    return unpack(mtp_r), unpack(mtp_i)
