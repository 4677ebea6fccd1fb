"""
Pallas fused kernels for the HEA block chain.

The dense engine (ops/hea.py) reduces the circuit to

    s_1 = D(x_1) s0;   s_{b+1} = D(x_{b+1}) ⊙ (M_b s_b);   out = M_B s_B

with batch-independent block matrices M_b and per-sample diagonal phases
D(x_b)_k = e^{-i φ_{b,k}}.  Under XLA this is a scan of ~11 small ops per
block; the kernels here fuse the ENTIRE chain (60 blocks for the flagship
Q5 net) into one Pallas kernel each for forward and backward, keeping the
statevector, all block matrices, and the raw phases resident in VMEM for
the whole circuit — zero inter-op scheduling overhead and no HBM
round-trips between blocks.  cos/sin of the phases are computed on the
VPU in-kernel (forward AND backward), so the (B, batch, 2^n) trig
intermediates that XLA would materialise never exist.

Complex arithmetic is hand-rolled (re, im) float32 (no complex in Pallas,
and this TPU backend has no complex64 anyway).

Wired into the engine as ``engine='pallas'`` (quanonet_tpu/ops/hea.py);
numerically identical to the dense path, verified in tests/test_pallas.py.
Batches past the VMEM budget run as multiple equal chunks (round 5);
structurally unsupported specs fall back to the dense path.
"""
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quanonet_tpu.ops import hea as _hea
from quanonet_tpu.ops.gates import hadamard_kron, z_signs

# Mosaic's default scoped-VMEM limit is 16 MiB; a v5e core has far more.
# We request a higher per-kernel limit and size the fallback budget to it.
VMEM_LIMIT = 100 * 1024 * 1024
VMEM_BUDGET = 88 * 1024 * 1024  # working-set ceiling before dense fallback
CHUNK_MIN_BT = 256   # smallest per-call chunk of the batched chain
#                      (forward_pallas).  NEGATIVE RESULT (round 5,
#                      measured bench.py --quick --batch_size 1000 A/B
#                      on a clean chip): the chunked VMEM chain at
#                      bt=336 x 3 measured 8,792 samples/s vs the dense
#                      XLA fallback's 1,131,721 — a ~130x LOSS (the
#                      kernel's software pipelining collapses at
#                      hundreds of batch rows; the whole working set no
#                      longer double-buffers).  Chunking is therefore
#                      opt-in (PALLAS_CHUNK=1) and the dense fallback
#                      remains the default for over-budget batches —
#                      don't retry without a per-tile relayout.


def _interpret() -> bool:
    """Pallas TPU kernels run interpreted on CPU (test environments)."""
    return jax.default_backend() != 'tpu'


DEFAULT_SCOPED_LIMIT = 16 * 1024 * 1024


def _tile_dims(N, D):
    """Mosaic (8, 128) tile padding of an (N, D) float32 array."""
    return -(-N // 8) * 8, -(-D // 128) * 128


def _maybe_params(stack_bytes):
    """Raise the scoped-VMEM limit ONLY when this kernel's stack needs it.
    An unconditional raise costs ~8% on the flagship shape (measured
    724K -> 667K samples/s), so shapes that fit the 16 MiB default keep
    param-free codegen."""
    if stack_bytes > int(0.85 * DEFAULT_SCOPED_LIMIT):
        return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)
    return None


def _maybe_params2(stack_bytes, input_bytes):
    """Raise when the output stack, the VMEM inputs, or their SUM
    approaches the default limit (Mosaic charges VMEM-resident inputs and
    the scoped stack against the same 16 MiB pool).  The flagship shape
    (D=32: inputs ~2 MiB, stack ~14 MiB, sum ~16.0 MB) must stay
    UNRAISED — it is measured to fit and the blanket raise costs ~8%
    there — so the combined trigger sits at 1.10x the default, catching
    mid-size shapes like Q7/d=128 nb=60 batch=100 (~22 MB combined) that
    trip neither individual threshold."""
    if input_bytes > int(0.75 * DEFAULT_SCOPED_LIMIT):
        return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)
    if stack_bytes + input_bytes > int(1.10 * DEFAULT_SCOPED_LIMIT):
        return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)
    return _maybe_params(stack_bytes)


def _mat_input_bytes(B, D):
    """VMEM bytes of the block-matrix inputs 2·(B,D,D).  Mosaic counts
    VMEM-resident INPUTS against the scoped stack too — at Q8
    (D=256, B=60) the matrices alone are 31.4 MiB, which OOM'd the
    16 MiB default even at batch 1 (model.init) until this term was
    added to the raise trigger."""
    ds, dl = _tile_dims(D, D)
    return 2 * 4 * B * ds * dl


def _fwd_stack_bytes(B, N, D):
    """Scoped-stack (output) bytes of the forward kernel: sr/si (N,D)·2,
    saved states (B,N,D)·2, saved u (B-1,N,D)·2, ~10% temporaries."""
    n8, dl = _tile_dims(N, D)
    return int(1.1 * 4 * (2 + 2 * B + 2 * max(B - 1, 1)) * n8 * dl)


def _bwd_stack_bytes(B, N, D):
    """Backward outputs: mbar (B,D,D)·2 + phibar (B,N,D), ~10% slack."""
    n8, dl = _tile_dims(N, D)
    ds = -(-D // 8) * 8
    return int(1.1 * 4 * (2 * B * ds * dl + B * n8 * dl))


def _pad_batch(a, mult=8):
    n = a.shape[0]
    pad = (-n) % mult
    if pad:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    return a, n


def _chain_workset_bytes(B, N, D):
    """VMEM bytes the fused chain needs, with Mosaic (8,128) tile padding:
    the minor axis pads to 128 lanes (D=4 really occupies 128) and the
    second-minor to 8 sublanes.  Counted: block mats 2·(B,D,D), phases
    (B,N,D), saved states 2·(B,N,D) + saved u 2·(B-1,N,D) [backward
    residuals], outputs 2·(N,D), plus ~4 (N,D) live temporaries."""
    dl = -(-D // 128) * 128
    ds = -(-D // 8) * 8
    n8 = -(-N // 8) * 8
    # the backward kernel is the high-water mark: residuals (5 B-sized
    # (N,D) arrays incl. phi) + phibar output + mbar outputs + mats
    return 4 * (4 * B * ds * dl
                + (3 * B + 2 * max(B - 1, 1) + B) * n8 * dl
                + 8 * n8 * dl)


def _kara(ar, ai, br, bi):
    """(ar + i ai) @ (br + i bi) via Karatsuba: 3 MXU matmuls."""
    t1 = jnp.dot(ar, br, preferred_element_type=jnp.float32)
    t2 = jnp.dot(ai, bi, preferred_element_type=jnp.float32)
    t3 = jnp.dot(ar + ai, br + bi, preferred_element_type=jnp.float32)
    return t1 - t2, t3 - t1 - t2


# ── kernels ──────────────────────────────────────────────────────────────────

def _fwd_kernel(nb, inv_sqrt):
    def kernel(mtr_ref, mti_ref, phi_ref,
               sr_out, si_out, str_out, sti_out, ur_out, ui_out):
        p0 = phi_ref[0]
        sr = jnp.cos(p0) * inv_sqrt          # D(x_1) · H|0…0⟩
        si = -jnp.sin(p0) * inv_sqrt
        for b in range(nb - 1):
            # save block-input state AND post-matmul state for the backward
            str_out[b] = sr
            sti_out[b] = si
            ur, ui = _kara(sr, si, mtr_ref[b], mti_ref[b])
            ur_out[b] = ur
            ui_out[b] = ui
            phi = phi_ref[b + 1]
            pr = jnp.cos(phi)
            pi = -jnp.sin(phi)
            sr = pr * ur - pi * ui
            si = pr * ui + pi * ur
        str_out[nb - 1] = sr
        sti_out[nb - 1] = si
        sr_out[:], si_out[:] = _kara(sr, si, mtr_ref[nb - 1],
                                     mti_ref[nb - 1])
    return kernel


def _bwd_kernel(nb, inv_sqrt):
    def kernel(mtr_ref, mti_ref, phi_ref, str_ref, sti_ref,
               ur_ref, ui_ref, gr_ref, gi_ref,
               mbar_r_out, mbar_i_out, phibar_out):
        gr = gr_ref[:]
        gi = gi_ref[:]
        sr = str_ref[nb - 1]
        si = sti_ref[nb - 1]
        # grads w.r.t. mt_{B-1}: m̄ = conj(s)^T ḡ  (Karatsuba, 3 matmuls)
        mr, mi = _kara(sr.T, -si.T, gr, gi)
        mbar_r_out[nb - 1] = mr
        mbar_i_out[nb - 1] = mi
        # s̄ = ḡ M^†  (Karatsuba)
        tr = mtr_ref[nb - 1]
        ti = mti_ref[nb - 1]
        sbar_r, sbar_i = _kara(gr, gi, tr.T, -ti.T)

        for b in range(nb - 2, -1, -1):
            # forward was: u = s_b M_b ; s_{b+1} = D_{b+1} ⊙ u
            phi = phi_ref[b + 1]
            pr = jnp.cos(phi)
            pi = -jnp.sin(phi)
            sr = str_ref[b]
            si = sti_ref[b]
            ur = ur_ref[b]
            ui = ui_ref[b]
            # diag backward; phase chain rule:
            #   dr = cos φ, di = -sin φ  =>  φ̄ = d̄r·(-sin φ) + d̄i·(-cos φ)
            dbar_r = ur * sbar_r + ui * sbar_i
            dbar_i = -ui * sbar_r + ur * sbar_i
            phibar_out[b + 1] = dbar_r * pi - dbar_i * pr
            ubar_r = pr * sbar_r + pi * sbar_i
            ubar_i = -pi * sbar_r + pr * sbar_i
            # matmul backward (Karatsuba each: 3 + 3 matmuls)
            mr, mi = _kara(sr.T, -si.T, ubar_r, ubar_i)
            mbar_r_out[b] = mr
            mbar_i_out[b] = mi
            tr = mtr_ref[b]
            ti = mti_ref[b]
            sbar_r, sbar_i = _kara(ubar_r, ubar_i, tr.T, -ti.T)
        # block 0: s_1 = inv_sqrt · (cos φ_0, -sin φ_0)
        p0 = phi_ref[0]
        pr = jnp.cos(p0)
        pi = -jnp.sin(p0)
        phibar_out[0] = inv_sqrt * (sbar_r * pi - sbar_i * pr)
    return kernel


@lru_cache(maxsize=64)
def _make_block_chain(nb, dim, inv_sqrt):
    """custom-vjp fused chain for a fixed (n_blocks, dim):
    (mt_r, mt_i, phi) -> (sr, si)."""
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    def fwd_call(mt_r, mt_i, phi):
        n = phi.shape[1]
        out_shape = (
            jax.ShapeDtypeStruct((n, dim), jnp.float32),      # sr
            jax.ShapeDtypeStruct((n, dim), jnp.float32),      # si
            jax.ShapeDtypeStruct((nb, n, dim), jnp.float32),  # states re
            jax.ShapeDtypeStruct((nb, n, dim), jnp.float32),  # states im
            jax.ShapeDtypeStruct((max(nb - 1, 1), n, dim), jnp.float32),
            jax.ShapeDtypeStruct((max(nb - 1, 1), n, dim), jnp.float32),
        )
        return pl.pallas_call(
            _fwd_kernel(nb, inv_sqrt),
            out_shape=out_shape,
            in_specs=[vm, vm, vm],
            out_specs=(vm,) * 6,
            interpret=_interpret(),
            compiler_params=_maybe_params2(_fwd_stack_bytes(nb, n, dim),
                                           _mat_input_bytes(nb, dim)),
        )(mt_r, mt_i, phi)

    def bwd_call(mt_r, mt_i, phi, states_r, states_i, u_r, u_i, gr, gi):
        n = phi.shape[1]
        out_shape = (
            jax.ShapeDtypeStruct((nb, dim, dim), jnp.float32),  # mbar_r
            jax.ShapeDtypeStruct((nb, dim, dim), jnp.float32),  # mbar_i
            jax.ShapeDtypeStruct((nb, n, dim), jnp.float32),    # phibar
        )
        return pl.pallas_call(
            _bwd_kernel(nb, inv_sqrt),
            out_shape=out_shape,
            in_specs=[vm] * 9,
            out_specs=(vm,) * 3,
            interpret=_interpret(),
            compiler_params=_maybe_params2(_bwd_stack_bytes(nb, n, dim),
                                           _mat_input_bytes(nb, dim)),
        )(mt_r, mt_i, phi, states_r, states_i, u_r, u_i, gr, gi)

    @jax.custom_vjp
    def chain(mt_r, mt_i, phi):
        sr, si, _, _, _, _ = fwd_call(mt_r, mt_i, phi)
        return sr, si

    def chain_fwd(mt_r, mt_i, phi):
        sr, si, states_r, states_i, u_r, u_i = fwd_call(mt_r, mt_i, phi)
        return (sr, si), (mt_r, mt_i, phi, states_r, states_i, u_r, u_i)

    def chain_bwd(res, g):
        mt_r, mt_i, phi, states_r, states_i, u_r, u_i = res
        return bwd_call(mt_r, mt_i, phi, states_r, states_i, u_r, u_i,
                        g[0], g[1])

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


# ── engine entry points ──────────────────────────────────────────────────────

import os as _os
USE_UCOMP = _os.environ.get('USE_UCOMP', '0') == '1'
# A/B toggle for the Pallas unitary-compile path (ops/pallas_ucomp.py).
# Measured on v5e round 3: the kernel is numerically f32-exact but
# SLOWER than the bf16 XLA path (196-207 vs 147 us/step — ~3000 small
# in-kernel matmuls at ~0.04 us issue cost beat XLA's op overhead but
# f32 MXU passes + packing traffic eat the win).  A bf16-operand
# variant (UCOMP_BF16=1, single-pass MXU, keeps the 4x issue-count
# reduction) measured 202.6 us/step — NO better than f32, so the
# kernel's cost is packing traffic + in-kernel issue overhead, not MXU
# pass count; don't retry precision tweaks here.  Kept as a verified
# experiment; the cheap quality fix turned out to be the PHASES einsum
# precision pin below.


def _prepare(spec, weights, x):
    """Compile block matrices (Hadamards folded, pre-transposed for
    row-vector matmuls) and the hoisted raw phases.

    The matrices come from the Pallas f32 unitary-compile kernel
    (ops/pallas_ucomp.py) when the spec qualifies — one fused program
    instead of ~100 small bf16 XLA ops (round-3 step profile: 72 of the
    147 us/step) — with the XLA path as fallback and oracle."""
    n = spec.n_qubits
    batch = x.shape[0]
    nb = spec.n_blocks

    from quanonet_tpu.ops import pallas_ucomp
    if USE_UCOMP and pallas_ucomp.ucomp_applicable(spec):
        mt_r, mt_i = pallas_ucomp.compile_block_mats(spec, weights)
    else:
        ur, ui = _hea.compile_block_unitaries(spec, weights)
        hk = jnp.asarray(hadamard_kron(n))
        uh_r = ur @ hk
        uh_i = ui @ hk
        m_r = jnp.concatenate([hk @ uh_r[:-1], uh_r[-1:]], axis=0)
        m_i = jnp.concatenate([hk @ uh_i[:-1], uh_i[-1:]], axis=0)
        mt_r = m_r.transpose(0, 2, 1)
        mt_i = m_i.transpose(0, 2, 1)

    zsgn = jnp.asarray(z_signs(n))
    xb = x.reshape(batch, nb, n).transpose(1, 0, 2)
    # PRECISION PIN (quality-critical): under the TPU's default bf16
    # matmul this K=n dot rounds the encoding angles to ~8 mantissa
    # bits; the ~0.4% per-block phase error random-walks over the
    # 40-60 block chain into ~2% output error — measured as the bulk of
    # the bf16-vs-f32 trained-quality gap on the headline regime.  At
    # K<=7 the 6-pass penalty is nanoseconds.
    phi = 0.5 * jnp.einsum('bxn,dn->bxd', xb, zsgn,
                           precision=jax.lax.Precision.HIGHEST)
    return mt_r, mt_i, phi


def _max_chain_batch(nb, d):
    """Largest (8-multiple) batch whose chain working set fits the VMEM
    budget — the per-kernel-call tile size for the chunked path below."""
    bt = 8
    while _chain_workset_bytes(nb, bt + 8, d) <= VMEM_BUDGET:
        bt += 8
    return bt


def forward_pallas(spec, weights, x):
    """(sr, si) via the fused Pallas chain.

    Batches past the whole-batch VMEM budget (bs~2000 at the Q5
    flagship shape) are CHUNKED over multiple kernel calls rather than
    falling back to the dense XLA path (round-4 verdict #6: the
    batch-size frontier continues past the cap).  Each chunk is one
    full-VMEM chain call; the block-matrix cotangents of the chunks are
    summed by autodiff, and the extra per-call cost (~25-30 us launch)
    is negligible against the ~0.47 us/sample slope at these sizes.
    Structurally non-uniform or trivial specs still take the dense
    path."""
    nb, d = spec.n_blocks, spec.dim
    batch = x.shape[0]
    if not spec.uniform_encode or nb < 2:
        return _hea._forward_dense(spec, weights, x)
    bp = max(batch, 8) + (-max(batch, 8)) % 8   # 8-padded batch rows
    over_budget = _chain_workset_bytes(nb, bp, d) > VMEM_BUDGET
    if over_budget:
        # equalize chunk sizes (8-aligned) so the last chunk is not
        # mostly padding: bs=1000 at bt_max=464 would pad 39% — 3 equal
        # 336-row chunks pad 0.8%
        bt_max = _max_chain_batch(nb, d)
        n_chunks = -(-batch // max(bt_max, 8))
        bt = -(-(-(-batch // n_chunks)) // 8) * 8
    else:
        bt = bp      # whole (padded) batch in one call — bt must cover
        #              the _pad_batch rows or chunking would trigger
        #              spuriously (e.g. bs=100 pads to 104)
    if over_budget and (bt < CHUNK_MIN_BT
                        or os.environ.get('PALLAS_CHUNK') != '1'):
        # dense fallback is the measured winner for over-budget batches
        # (see CHUNK_MIN_BT note); chunking stays opt-in for experiments
        return _hea._forward_dense(spec, weights, x)
    mt_r, mt_i, phi = _prepare(spec, weights, x)
    phi_p, n_real = _pad_batch(phi.transpose(1, 0, 2), mult=8)
    chain = _make_block_chain(nb, d, float(1.0 / np.sqrt(d)))
    if phi_p.shape[0] > bt:
        pad = (-phi_p.shape[0]) % bt
        if pad:
            phi_p = jnp.pad(phi_p, ((0, pad), (0, 0), (0, 0)))
        srs, sis = [], []
        for s in range(0, phi_p.shape[0], bt):
            cr, ci = chain(mt_r, mt_i,
                           phi_p[s:s + bt].transpose(1, 0, 2))
            srs.append(cr)
            sis.append(ci)
        return (jnp.concatenate(srs, 0)[:n_real],
                jnp.concatenate(sis, 0)[:n_real])
    sr, si = chain(mt_r, mt_i, phi_p.transpose(1, 0, 2))
    return sr[:n_real], si[:n_real]


def hea_expectation_pallas(spec, weights, x, diag):
    sr, si = forward_pallas(spec, weights, x)
    return _hea.diag_expectation_pair(sr, si, jnp.asarray(diag))
