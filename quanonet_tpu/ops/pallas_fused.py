"""
Pallas fused-group chain kernel for mid-size qubit counts (Q8-Q13).

The XLA fused engine (ops/fused_gates.py) is HBM-bandwidth-bound: each
sublayer makes ~6 full passes over the (batch, 2^n) state (grouped
matmuls, diagonal, ring gather), so the Q10 forward spends ~1.4 ms
streaming a 0.8 MB state through HBM ~120 times (docs/fused_profile.json).
This kernel keeps the statevector RESIDENT IN VMEM for the entire block
chain — the same pattern that made ops/pallas_hea.py the flagship winner —
and streams only the small per-sublayer group unitaries.

Layout: the (batch, 2^n) split-real state is carried as (hi*bt, 128)
tiles, rows = h*bt + b where l = basis bits 0-6 (lanes) and h = bits
7..n-1 (row blocks).  Per sublayer:

  * low group (k=7):  one Karatsuba (3 MXU matmuls) against the
    pre-transposed (128, 128) group unitary — full lane-tile contraction;
  * high group (k=n-7), hi <= 16: hi^2 complex scalar FMAs across the
    row blocks (the (hi, hi) unitary entries broadcast on the VPU);
  * high group, hi > 16 (Q12+, "bfly mode"): the dense form scales
    quadratically in hi, but the group unitary is a TENSOR PRODUCT of
    per-qubit 2x2 rotations (fused_gates.build_high_rot2x2) — applied
    as n-7 row-block butterflies, O(hi·(n-7)) VPU work with 4 streamed
    scalars per qubit; the high Hadamard becomes log2(hi) add/sub
    butterflies the same way;
  * CNOT ring: the permutation is GF(2)-linear, so per destination row
    block it is a LANE permutation selected by one h bit plus a
    lane-parity-masked row-block swap.  Both are baked as 4 distinct
    one-hot (128, 128) f32 matrices (exact: each output element is
    1.0 x input) — masked permutation matmuls instead of the HBM gather.
    In bfly mode the per-dest small dots (2·hi of them — issue-bound
    past hi=16) are regrouped class-stacked: per distinct one-hot
    matrix, a free list-gather of source row blocks then ONE
    (hi·bt, 128) matmul.

The backward is a hand-written VJP (autodiff cannot see through a Pallas
kernel): block-input states are saved to HBM on the forward pass and each
block is recomputed stage-by-stage in VMEM on the backward, mirroring
ops/pallas_hea.py's chain_bwd.  A permutation's transpose is its inverse
permutation (ops/gates.make_perm_apply doc), decomposed the same way.

The grid tiles the batch so the per-tile working set fits VMEM; group
unitaries and their cotangent accumulators keep a constant index_map and
stay resident across tiles.

Replaces nothing — it is a third engine ('pfused') for the same circuit
contract as ops/fused_gates.forward_fused (uniform encode), verified
against the gates oracle in tests/test_pallas_fused.py.
"""
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quanonet_tpu.ops.gates import (
    cnot_ring_inverse_permutation,
    cnot_ring_permutation,
    hadamard_kron,
    z_signs,
)
from quanonet_tpu.ops.pallas_hea import (
    VMEM_LIMIT,
    _interpret,
)

LANE_QUBITS = 7
MIN_QUBITS = 8
MAX_QUBITS = 16          # Q12+ use the butterfly high-group path below;
#                          FORWARD only for Q15-16 (see TRAIN_MAX_QUBITS)
TRAIN_MAX_QUBITS = 14    # the residual-saving backward's VMEM working
#                          set passes the 100 MB scoped limit above Q14
#                          (round-5 probe at Q15 Net5-2-5-2 bt=8: model
#                          77 MB x the measured 1.63 Mosaic calibration
#                          = 126 MB -> server-side compile failure; the
#                          primal-only forward is 24 MB and runs fine,
#                          measured on-chip at Q15 AND Q16).  Training
#                          above Q14 raises a clear error pointing at
#                          engine='fused' instead of the tunnel's
#                          opaque HTTP 500.
BFLY_MIN_QUBITS = 11     # hi >= 16: dense hi^2 FMA fan-in stops paying —
#                          switch to ⊗-factorized butterflies + class-
#                          stacked ring (PFUSED_BFLY=0/1 overrides for
#                          A/B).  Round-5 boundary sweep (clean-chip
#                          sequential A/B, Net10-2-10-2 bs=100): Q11
#                          bfly 53,564 vs dense-FMA 46,505 samples/s
#                          (+15%); Q10 (hi=8) neutral (36,710 vs
#                          36,554) — the crossover is exactly hi=16.
AUTO_MAX_QUBITS = 14     # auto-dispatch cap: measured 3.7x/1.9x/1.3x the
#                          XLA fused path at Q8/Q10/Q11 on v5e (Q11
#                          Net10-2-10-2: 47.6K vs 36.1K), and 1.65x at
#                          Q12 via the butterfly path (27,143 vs 16,442
#                          samples/s, Net10-2-10-2 bs=100 — which also
#                          compiles in 24 s vs the fused+remat program's
#                          ~800 s).  Q13 measured 16,371 samples/s
#                          (bt=8 backward, bench_qubit_scaling --only
#                          13) — ~at fused's *Q12* throughput, i.e.
#                          ~2x the fused Q13 path, whose per-sample
#                          work doubles per added qubit.  Round 5
#                          extended the butterfly path to Q14 (hi=128):
#                          measured 8,321 samples/s (Net5-2-5-2 bs=32)
#                          = 1.58x the fused+remat Q14 path (5,260),
#                          compile 298 s (vs fused's ~800 s).
VMEM_BUDGET = 64 * 1024 * 1024   # per-tile working-set target


def _bfly_mode(n_qubits: int) -> bool:
    env = os.environ.get('PFUSED_BFLY')
    if env is not None:
        return env == '1' and n_qubits > LANE_QUBITS
    return n_qubits >= BFLY_MIN_QUBITS


# ── ring decomposition ───────────────────────────────────────────────────────

@lru_cache(maxsize=None)
def _ring_decomp(n_qubits: int, inverse: bool):
    """Decompose the ring gather map (out[k] = s[idx[k]]) into per-dest-
    row-block masked lane permutations.

    Returns (plan, mats): plan[dest_h] = ((src_h, mat_index), ...) and
    mats = tuple of distinct one-hot (128, 128) float32 P with
    out_h = sum_c s[src_h(c)] @ P_c.  Exact for any GF(2)-linear
    permutation (verified in tests); the CNOT ring needs 2 classes per
    dest block and 4 distinct mats in either direction."""
    idx = (cnot_ring_permutation(n_qubits) if inverse
           else cnot_ring_inverse_permutation(n_qubits))
    hi = 2 ** (n_qubits - LANE_QUBITS)
    lanes = np.arange(128)
    mats = []
    keys = {}
    plan = []
    for h in range(hi):
        src = idx[h * 128 + lanes]
        sh, sl = src >> LANE_QUBITS, src & 127
        entry = []
        for shh in sorted(set(sh.tolist())):
            m = sh == shh
            P = np.zeros((128, 128), np.float32)
            P[sl[m], lanes[m]] = 1.0
            key = P.tobytes()
            if key not in keys:
                keys[key] = len(mats)
                mats.append(P)
            entry.append((int(shh), keys[key]))
        plan.append(tuple(entry))
    return tuple(plan), tuple(mats)


def _apply_ring_tiles(srs, sis, plan, mats):
    """Ring permutation on per-row-block state lists (each (bt, 128))."""
    nr, ni = [], []
    for entry in plan:
        ar = ai = None
        for src_h, mi in entry:
            P = mats[mi]
            tr = jnp.dot(srs[src_h], P, preferred_element_type=jnp.float32)
            ti = jnp.dot(sis[src_h], P, preferred_element_type=jnp.float32)
            ar = tr if ar is None else ar + tr
            ai = ti if ai is None else ai + ti
        nr.append(ar)
        ni.append(ai)
    return nr, ni


# ── in-kernel building blocks (operate on (HB, 128) with HB = hi*bt) ────────

def _make_kara(use_bf16):
    """Karatsuba complex matmul (3 real matmuls).  use_bf16 casts the
    operands for single-pass MXU issue (f32 on this backend lowers to
    multi-pass) with f32 accumulation — the same precision class as the
    XLA fused engine's default-precision einsums.  The exact-f32 variant
    is used under jax_default_matmul_precision='highest'/'float32'
    (which is what compare_engines forces) and on CPU interpret runs."""
    if use_bf16:
        def dot(a, b):
            return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    else:
        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def kara(ar, ai, br, bi):
        t1 = dot(ar, br)
        t2 = dot(ai, bi)
        t3 = dot(ar + ai, br + bi)
        return t1 - t2, t3 - t1 - t2
    return kara


_kara = _make_kara(False)   # exact variant (backward-compat name)


def _split(s, hi, bt):
    return [s[h * bt:(h + 1) * bt] for h in range(hi)]


def _apply_h(sr, si, hi, bt, h7, hsign, hscale):
    """H^{x n}: lanes via 2 MXU matmuls, row blocks via +-scaled adds."""
    sr = jnp.dot(sr, h7, preferred_element_type=jnp.float32)
    si = jnp.dot(si, h7, preferred_element_type=jnp.float32)
    if hi == 1:
        return sr, si
    srs, sis = _split(sr, hi, bt), _split(si, hi, bt)
    nr, ni = [], []
    for h in range(hi):
        ar = ai = None
        for h2 in range(hi):
            tr = srs[h2] if hsign[h][h2] > 0 else -srs[h2]
            ti = sis[h2] if hsign[h][h2] > 0 else -sis[h2]
            ar = tr if ar is None else ar + tr
            ai = ti if ai is None else ai + ti
        nr.append(ar * hscale)
        ni.append(ai * hscale)
    return jnp.concatenate(nr, 0), jnp.concatenate(ni, 0)


def _apply_high(sr, si, uhr, uhi, hi, bt):
    """(hi, hi) complex group unitary across row blocks: hi^2 scalar FMAs.
    uhr/uhi: traced (hi, hi) arrays loaded from VMEM."""
    srs, sis = _split(sr, hi, bt), _split(si, hi, bt)
    nr, ni = [], []
    for h in range(hi):
        ar = ai = None
        for h2 in range(hi):
            ur = uhr[h, h2]
            ui = uhi[h, h2]
            tr = ur * srs[h2] - ui * sis[h2]
            ti = ur * sis[h2] + ui * srs[h2]
            ar = tr if ar is None else ar + tr
            ai = ti if ai is None else ai + ti
        nr.append(ar)
        ni.append(ai)
    return jnp.concatenate(nr, 0), jnp.concatenate(ni, 0)


def _apply_high_adj(sr, si, uhr, uhi, hi, bt):
    """Adjoint (U^H) of _apply_high: conj-transposed entry order."""
    srs, sis = _split(sr, hi, bt), _split(si, hi, bt)
    nr, ni = [], []
    for h2 in range(hi):
        ar = ai = None
        for h in range(hi):
            ur = uhr[h, h2]
            ui = uhi[h, h2]
            tr = ur * srs[h] + ui * sis[h]
            ti = ur * sis[h] - ui * srs[h]
            ar = tr if ar is None else ar + tr
            ai = ti if ai is None else ai + ti
        nr.append(ar)
        ni.append(ai)
    return jnp.concatenate(nr, 0), jnp.concatenate(ni, 0)


# ── butterfly (⊗-factorized) high-group path, used for n_qubits >= 12 ───────
# The high group unitary is a tensor product of per-qubit 2x2 rotations
# (fused_gates.build_high_rot2x2), so instead of the dense hi^2 scalar-FMA
# contraction (which scales quadratically in hi and dominates past hi=16)
# it is applied as n-7 row-block butterflies: per high qubit j,
# out[h] = u[a,a]·s[h] + u[a,1-a]·s[h^bit] with a = bit_j(h) — O(hi·nh)
# VPU work and O(nh) streamed scalars per sublayer.

def _apply_high_bfly(sr, si, u2r, u2i, hi, bt, nh):
    """⊗_j u_j across row blocks via nh butterflies.  u2r/u2i: traced
    (nh, 4) with entries [u00, u01, u10, u11] per high qubit."""
    srs, sis = _split(sr, hi, bt), _split(si, hi, bt)
    for j in range(nh):
        bit = 1 << j
        nr, ni = [None] * hi, [None] * hi
        d = [(u2r[j, 0], u2i[j, 0]), (u2r[j, 3], u2i[j, 3])]
        o = [(u2r[j, 1], u2i[j, 1]), (u2r[j, 2], u2i[j, 2])]
        for h in range(hi):
            a = (h >> j) & 1
            p = h ^ bit
            dr, di = d[a]
            orr, oi = o[a]
            nr[h] = (dr * srs[h] - di * sis[h]
                     + orr * srs[p] - oi * sis[p])
            ni[h] = (dr * sis[h] + di * srs[h]
                     + orr * sis[p] + oi * srs[p])
        srs, sis = nr, ni
    return jnp.concatenate(srs, 0), jnp.concatenate(sis, 0)


def _apply_high_bfly_adj(ctr, cti, u2r, u2i, hi, bt, nh):
    """Adjoint (U^H = ⊗_j u_j^H): ct[h] <- conj(u[a,a])·ct[h]
    + conj(u[1-a,a])·ct[p]."""
    crs, cis = _split(ctr, hi, bt), _split(cti, hi, bt)
    for j in range(nh - 1, -1, -1):
        bit = 1 << j
        nr, ni = [None] * hi, [None] * hi
        d = [(u2r[j, 0], u2i[j, 0]), (u2r[j, 3], u2i[j, 3])]
        o = [(u2r[j, 2], u2i[j, 2]), (u2r[j, 1], u2i[j, 1])]  # u[1-a, a]
        for h in range(hi):
            a = (h >> j) & 1
            p = h ^ bit
            dr, di = d[a]
            orr, oi = o[a]
            nr[h] = (dr * crs[h] + di * cis[h]
                     + orr * crs[p] + oi * cis[p])
            ni[h] = (dr * cis[h] - di * crs[h]
                     + orr * cis[p] - oi * crs[p])
        crs, cis = nr, ni
    return jnp.concatenate(crs, 0), jnp.concatenate(cis, 0)


def _high_bfly_stages(sr, si, u2r, u2i, hi, bt, nh):
    """Forward butterfly keeping the per-qubit input states (backward
    recompute): returns (out_r, out_i, stages) with stages[j] = the
    (srs, sis) row-block lists BEFORE qubit j's butterfly."""
    srs, sis = _split(sr, hi, bt), _split(si, hi, bt)
    stages = []
    for j in range(nh):
        stages.append((srs, sis))
        bit = 1 << j
        nr, ni = [None] * hi, [None] * hi
        d = [(u2r[j, 0], u2i[j, 0]), (u2r[j, 3], u2i[j, 3])]
        o = [(u2r[j, 1], u2i[j, 1]), (u2r[j, 2], u2i[j, 2])]
        for h in range(hi):
            a = (h >> j) & 1
            p = h ^ bit
            dr, di = d[a]
            orr, oi = o[a]
            nr[h] = (dr * srs[h] - di * sis[h]
                     + orr * srs[p] - oi * sis[p])
            ni[h] = (dr * sis[h] + di * srs[h]
                     + orr * sis[p] + oi * srs[p])
        srs, sis = nr, ni
    return jnp.concatenate(srs, 0), jnp.concatenate(sis, 0), stages


def _high_bfly_bar(ctr, cti, u2r, u2i, stages, hi, bt, nh):
    """Backward through the butterfly: cotangents of the (nh, 4) high
    2x2 entries AND the propagated state cotangent, in one reverse walk.

    ubar[j, 2a+b] = Σ_{h: bit_j(h)=a} ct_j[h] · conj(s_in_j[h with
    bit->b]) with ct_j the cotangent arriving at qubit j's OUTPUT;
    stages[j] = the row-block lists before qubit j's butterfly (from
    _high_bfly_stages).  Returns (ubar_r (nh, 4), ubar_i (nh, 4),
    ctr, cti)."""
    crs, cis = _split(ctr, hi, bt), _split(cti, hi, bt)
    ubar_r = [None] * nh
    ubar_i = [None] * nh
    for j in range(nh - 1, -1, -1):
        bit = 1 << j
        brs, bis = stages[j]
        # entry cotangents: accumulate elementwise, reduce once per entry
        acc = [[None, None] for _ in range(4)]
        for h in range(hi):
            a = (h >> j) & 1
            p = h ^ bit
            for b, xr, xi in ((a, brs[h], bis[h]),
                              (1 - a, brs[p], bis[p])):
                e = 2 * a + b
                tr = crs[h] * xr + cis[h] * xi
                ti = cis[h] * xr - crs[h] * xi
                acc[e][0] = tr if acc[e][0] is None else acc[e][0] + tr
                acc[e][1] = ti if acc[e][1] is None else acc[e][1] + ti
        ubar_r[j] = jnp.stack([jnp.sum(acc[e][0]) for e in range(4)])
        ubar_i[j] = jnp.stack([jnp.sum(acc[e][1]) for e in range(4)])
        # adjoint-propagate ct through qubit j: u_j^H butterfly
        d = [(u2r[j, 0], u2i[j, 0]), (u2r[j, 3], u2i[j, 3])]
        o = [(u2r[j, 2], u2i[j, 2]), (u2r[j, 1], u2i[j, 1])]  # u[1-a, a]
        nr, ni = [None] * hi, [None] * hi
        for h in range(hi):
            a = (h >> j) & 1
            p = h ^ bit
            dr, di = d[a]
            orr, oi = o[a]
            nr[h] = (dr * crs[h] + di * cis[h]
                     + orr * crs[p] + oi * cis[p])
            ni[h] = (dr * cis[h] - di * crs[h]
                     + orr * cis[p] - oi * crs[p])
        crs, cis = nr, ni
    return (jnp.stack(ubar_r), jnp.stack(ubar_i),
            jnp.concatenate(crs, 0), jnp.concatenate(cis, 0))


def _apply_had_high_bfly(sr, si, hi, bt):
    """H^{⊗(n-7)} across row blocks as log2(hi) add/sub butterflies
    (replaces the hi^2 sign-add sweep of _apply_h's high part); the
    2^{-nh/2} scale is applied once at the end."""
    nh = hi.bit_length() - 1
    srs, sis = _split(sr, hi, bt), _split(si, hi, bt)
    for j in range(nh):
        bit = 1 << j
        nr, ni = [None] * hi, [None] * hi
        for h in range(hi):
            p = h ^ bit
            if (h >> j) & 1:
                nr[h] = srs[p] - srs[h]
                ni[h] = sis[p] - sis[h]
            else:
                nr[h] = srs[h] + srs[p]
                ni[h] = sis[h] + sis[p]
        srs, sis = nr, ni
    scale = float(2.0 ** (-nh / 2.0))
    return (jnp.concatenate(srs, 0) * scale,
            jnp.concatenate(sis, 0) * scale)


def _ring_stacked(sr, si, hi, bt, plan, mats, zero):
    """Class-stacked ring: for each distinct one-hot lane matrix, gather
    the source row blocks (a free list permutation, zero rows where a
    dest block does not use that class) and apply ONE (hi·bt, 128) lane
    matmul — 2·n_mats big dots instead of 2·2·hi small ones (the small-
    dot form is issue-bound past hi=16)."""
    srs, sis = _split(sr, hi, bt), _split(si, hi, bt)
    accr = acci = None
    for mi in range(len(mats)):
        rows_r, rows_i = [zero] * hi, [zero] * hi
        used = False
        for h, entry in enumerate(plan):
            for src_h, m in entry:
                if m == mi:
                    rows_r[h], rows_i[h] = srs[src_h], sis[src_h]
                    used = True
        if not used:
            continue
        ar = jnp.concatenate(rows_r, 0)
        ai = jnp.concatenate(rows_i, 0)
        tr = jnp.dot(ar, mats[mi], preferred_element_type=jnp.float32)
        ti = jnp.dot(ai, mats[mi], preferred_element_type=jnp.float32)
        accr = tr if accr is None else accr + tr
        acci = ti if acci is None else acci + ti
    return accr, acci


def _ring(sr, si, hi, bt, plan, mats):
    if hi == 1:
        return (jnp.dot(sr, mats[0], preferred_element_type=jnp.float32),
                jnp.dot(si, mats[0], preferred_element_type=jnp.float32))
    nr, ni = _apply_ring_tiles(_split(sr, hi, bt), _split(si, hi, bt),
                               plan, mats)
    return jnp.concatenate(nr, 0), jnp.concatenate(ni, 0)


def _apply_diag(sr, si, phi):
    """Per-sample encode diagonal: (sr, si) *= e^{-i phi} (VPU trig)."""
    pr = jnp.cos(phi)
    pi = -jnp.sin(phi)
    return pr * sr - pi * si, pr * si + pi * sr


def _runs(block_configs):
    """Runs of consecutive blocks with equal linear_depth:
    ((sub_offset, block_offset, g, ld), ...)."""
    runs = []
    s = b = 0
    nb = len(block_configs)
    while b < nb:
        ld = block_configs[b][1]
        j = b
        while j < nb and block_configs[j][1] == ld:
            j += 1
        runs.append((s, b, j - b, ld))
        s += (j - b) * ld
        b = j
    return tuple(runs)


# ── kernels ──────────────────────────────────────────────────────────────────

def _consts(n_qubits):
    """Static structure: hi, Hadamard sign pattern/scale, ring plans, and
    the stacked one-hot matrices (numpy — passed to the kernels as inputs;
    Pallas refuses captured array constants)."""
    hi = 2 ** (n_qubits - LANE_QUBITS)
    h7 = hadamard_kron(LANE_QUBITS)
    if hi > 1:
        hk = hadamard_kron(n_qubits - LANE_QUBITS)
        hscale = float(np.abs(hk[0, 0]))
        hsign = tuple(tuple(1 if v > 0 else -1 for v in row) for row in hk)
    else:
        hscale, hsign = 1.0, ((1,),)
    fplan, fmats = _ring_decomp(n_qubits, False)
    bplan, bmats = _ring_decomp(n_qubits, True)
    return (hi, h7, hsign, hscale,
            fplan, np.stack(fmats), bplan, np.stack(bmats))


def _static_unroll() -> bool:
    """PFUSED_STATIC=1 unrolls the block chain statically in-kernel
    (experiment: dynamic fori_loop ref slices may inhibit Mosaic
    pipelining; the cost is a much larger kernel body -> compile time)."""
    return os.environ.get('PFUSED_STATIC') == '1'


def _fwd_kernel(n_qubits, runs, bt, save_residuals=True, use_bf16=False,
                bfly=False):
    """save_residuals=False builds the primal-only variant (inference /
    no-grad callers): skips the (nb, hb, 128) block-input saves — 51 MB
    of HBM writes per Q10/bs128 call that only the backward reads.
    bfly=True switches the high group to ⊗-factorized butterflies, the
    high Hadamard to add/sub butterflies, and the ring to the class-
    stacked big-dot form (the Q12+ layout; uhr/uhi refs then carry the
    (n_sub, n-7, 4) per-qubit 2x2 entries)."""
    hi, _, hsign, hscale, fplan, fmats_np, _, _ = _consts(n_qubits)
    n_fm = fmats_np.shape[0]
    nh = n_qubits - LANE_QUBITS
    _kara = _make_kara(use_bf16)

    def kernel(h7_ref, fm_ref, u7t_r_ref, u7t_i_ref, uhr_ref, uhi_ref,
               phi_ref, sr_out, si_out, str_out=None, sti_out=None):
        h7 = h7_ref[:]
        fmats = [fm_ref[i] for i in range(n_fm)]
        zero = jnp.zeros((bt, 128), jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (hi * bt, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (hi * bt, 128), 0)
        sr = jnp.where((col == 0) & (row < bt), 1.0, 0.0)  # |0...0>
        si = jnp.zeros((hi * bt, 128), jnp.float32)

        def apply_h(sr, si):
            if bfly and hi > 1:
                sr = jnp.dot(sr, h7, preferred_element_type=jnp.float32)
                si = jnp.dot(si, h7, preferred_element_type=jnp.float32)
                return _apply_had_high_bfly(sr, si, hi, bt)
            return _apply_h(sr, si, hi, bt, h7, hsign, hscale)

        def ring(sr, si):
            if bfly and hi > 1:
                return _ring_stacked(sr, si, hi, bt, fplan, fmats, zero)
            return _ring(sr, si, hi, bt, fplan, fmats)

        def block(sr, si, b, s0, ld):
            if save_residuals:
                str_out[pl.ds(b, 1)] = sr.reshape(1, hi * bt, 128)
                sti_out[pl.ds(b, 1)] = si.reshape(1, hi * bt, 128)
            sr, si = apply_h(sr, si)
            sr, si = _apply_diag(sr, si, phi_ref[pl.ds(b, 1)][0])
            if ld == 0:  # encoding-only block: trailing left Hadamard
                return apply_h(sr, si)
            for d in range(ld):
                s_idx = s0 + d
                ur = u7t_r_ref[pl.ds(s_idx, 1)][0]
                ui = u7t_i_ref[pl.ds(s_idx, 1)][0]
                sr, si = _kara(sr, si, ur, ui)
                if hi > 1:
                    if bfly:
                        sr, si = _apply_high_bfly(
                            sr, si, uhr_ref[pl.ds(s_idx, 1)][0],
                            uhi_ref[pl.ds(s_idx, 1)][0], hi, bt, nh)
                    else:
                        sr, si = _apply_high(sr, si,
                                             uhr_ref[pl.ds(s_idx, 1)][0],
                                             uhi_ref[pl.ds(s_idx, 1)][0],
                                             hi, bt)
                sr, si = ring(sr, si)
            return sr, si

        if _static_unroll():
            # fully unrolled block chain: static ref slices let Mosaic
            # prefetch/software-pipeline across blocks (pallas_hea style)
            for s0, b0, g, ld in runs:
                for i in range(g):
                    sr, si = block(sr, si, b0 + i, s0 + i * ld, ld)
        else:
            for s0, b0, g, ld in runs:
                def body(i, carry, _s0=s0, _b0=b0, _ld=ld):
                    sr, si = carry
                    return block(sr, si, _b0 + i, _s0 + i * _ld, _ld)
                sr, si = jax.lax.fori_loop(0, g, body, (sr, si))
        sr_out[:], si_out[:] = sr, si
    return kernel


def _bwd_kernel(n_qubits, runs, bt, use_bf16=False, bfly=False):
    hi, _, hsign, hscale, fplan, fmats_np, bplan, bmats_np = \
        _consts(n_qubits)
    n_fm, n_bm = fmats_np.shape[0], bmats_np.shape[0]
    nh = n_qubits - LANE_QUBITS
    _kara = _make_kara(use_bf16)

    def kernel(h7_ref, fm_ref, bm_ref, u7t_r_ref, u7t_i_ref,
               uhr_ref, uhi_ref, phi_ref,
               str_ref, sti_ref, gr_ref, gi_ref,
               u7bar_r_out, u7bar_i_out, uhbar_r_out, uhbar_i_out,
               phibar_out):
        h7 = h7_ref[:]
        fmats = [fm_ref[i] for i in range(n_fm)]
        bmats = [bm_ref[i] for i in range(n_bm)]
        @pl.when(pl.program_id(0) == 0)
        def _init():
            u7bar_r_out[:] = jnp.zeros(u7bar_r_out.shape, jnp.float32)
            u7bar_i_out[:] = jnp.zeros(u7bar_i_out.shape, jnp.float32)
            uhbar_r_out[:] = jnp.zeros(uhbar_r_out.shape, jnp.float32)
            uhbar_i_out[:] = jnp.zeros(uhbar_i_out.shape, jnp.float32)

        ctr = gr_ref[:]
        cti = gi_ref[:]
        zero = jnp.zeros((bt, 128), jnp.float32)

        def apply_h(sr, si):
            if bfly and hi > 1:
                sr = jnp.dot(sr, h7, preferred_element_type=jnp.float32)
                si = jnp.dot(si, h7, preferred_element_type=jnp.float32)
                return _apply_had_high_bfly(sr, si, hi, bt)
            return _apply_h(sr, si, hi, bt, h7, hsign, hscale)

        def ring_f(sr, si):
            if bfly and hi > 1:
                return _ring_stacked(sr, si, hi, bt, fplan, fmats, zero)
            return _ring(sr, si, hi, bt, fplan, fmats)

        def ring_b(sr, si):
            if bfly and hi > 1:
                return _ring_stacked(sr, si, hi, bt, bplan, bmats, zero)
            return _ring(sr, si, hi, bt, bplan, bmats)

        def block_bwd(ctr, cti, b, s0, ld):
            # recompute the block's stage states from the saved input
            sr = str_ref[pl.ds(b, 1)][0]
            si = sti_ref[pl.ds(b, 1)][0]
            sr, si = apply_h(sr, si)
            pre_diag = (sr, si)
            phi = phi_ref[pl.ds(b, 1)][0]
            pr = jnp.cos(phi)
            pi = -jnp.sin(phi)
            sr, si = pr * sr - pi * si, pr * si + pi * sr
            stages = []   # per depth: (pre_low, post_low | bfly stages)
            for d in range(ld):
                s_idx = s0 + d
                pre = (sr, si)
                sr, si = _kara(sr, si, u7t_r_ref[pl.ds(s_idx, 1)][0],
                               u7t_i_ref[pl.ds(s_idx, 1)][0])
                if hi > 1 and bfly:
                    sr, si, bsts = _high_bfly_stages(
                        sr, si, uhr_ref[pl.ds(s_idx, 1)][0],
                        uhi_ref[pl.ds(s_idx, 1)][0], hi, bt, nh)
                    post = bsts
                else:
                    post = (sr, si)
                    if hi > 1:
                        sr, si = _apply_high(sr, si,
                                             uhr_ref[pl.ds(s_idx, 1)][0],
                                             uhi_ref[pl.ds(s_idx, 1)][0],
                                             hi, bt)
                sr, si = ring_f(sr, si)
                stages.append((pre, post))

            if ld == 0:  # trailing H of an encoding-only block
                ctr, cti = apply_h(ctr, cti)

            for d in range(ld - 1, -1, -1):
                s_idx = s0 + d
                (plr, pli), post = stages[d]
                # ring^T = inverse permutation
                ctr, cti = ring_b(ctr, cti)
                if hi > 1 and bfly:
                    u2r = uhr_ref[pl.ds(s_idx, 1)][0]
                    u2i = uhi_ref[pl.ds(s_idx, 1)][0]
                    ubr, ubi, ctr, cti = _high_bfly_bar(
                        ctr, cti, u2r, u2i, post, hi, bt, nh)
                    cur_r = uhbar_r_out[pl.ds(s_idx, 1)]
                    cur_i = uhbar_i_out[pl.ds(s_idx, 1)]
                    uhbar_r_out[pl.ds(s_idx, 1)] = (
                        cur_r + ubr.reshape(1, nh, 4))
                    uhbar_i_out[pl.ds(s_idx, 1)] = (
                        cur_i + ubi.reshape(1, nh, 4))
                elif hi > 1:
                    por, poi = post
                    uhr = uhr_ref[pl.ds(s_idx, 1)][0]
                    uhi = uhi_ref[pl.ds(s_idx, 1)][0]
                    # uhbar[h, h2] = sum ct_h * conj(S_postlow_h2)
                    cs = _split(ctr, hi, bt)
                    ci = _split(cti, hi, bt)
                    ps = _split(por, hi, bt)
                    pi_ = _split(poi, hi, bt)
                    ubr = jnp.stack([
                        jnp.stack([jnp.sum(cs[h] * ps[h2]
                                           + ci[h] * pi_[h2])
                                   for h2 in range(hi)])
                        for h in range(hi)])
                    ubi = jnp.stack([
                        jnp.stack([jnp.sum(ci[h] * ps[h2]
                                           - cs[h] * pi_[h2])
                                   for h2 in range(hi)])
                        for h in range(hi)])
                    cur_r = uhbar_r_out[pl.ds(s_idx, 1)]
                    cur_i = uhbar_i_out[pl.ds(s_idx, 1)]
                    uhbar_r_out[pl.ds(s_idx, 1)] = (
                        cur_r + ubr.reshape(1, hi, hi))
                    uhbar_i_out[pl.ds(s_idx, 1)] = (
                        cur_i + ubi.reshape(1, hi, hi))
                    ctr, cti = _apply_high_adj(ctr, cti, uhr, uhi, hi, bt)
                # low-group matmul backward (pallas_hea chain_bwd pattern):
                # u7tbar = conj(S_prelow)^T @ ct ; ct = ct @ conj(u7t)^T
                mbr, mbi = _kara(plr.T, -pli.T, ctr, cti)
                cur_r = u7bar_r_out[pl.ds(s_idx, 1)]
                cur_i = u7bar_i_out[pl.ds(s_idx, 1)]
                u7bar_r_out[pl.ds(s_idx, 1)] = (
                    cur_r + mbr.reshape(1, 128, 128))
                u7bar_i_out[pl.ds(s_idx, 1)] = (
                    cur_i + mbi.reshape(1, 128, 128))
                tr = u7t_r_ref[pl.ds(s_idx, 1)][0]
                ti = u7t_i_ref[pl.ds(s_idx, 1)][0]
                ctr, cti = _kara(ctr, cti, tr.T, -ti.T)

            # diagonal backward (phase chain rule, ops/pallas_hea.py:190-196)
            ur, ui = pre_diag
            dbar_r = ur * ctr + ui * cti
            dbar_i = -ui * ctr + ur * cti
            phibar_out[pl.ds(b, 1)] = (dbar_r * pi - dbar_i * pr).reshape(
                1, hi * bt, 128)
            nctr = pr * ctr + pi * cti
            ncti = -pi * ctr + pr * cti
            # H is real symmetric: self-adjoint
            return _apply_h(nctr, ncti, hi, bt, h7, hsign, hscale)

        for s0, b0, g, ld in reversed(runs):
            def body(i, carry, _s0=s0, _b0=b0, _g=g, _ld=ld):
                ctr, cti = carry
                j = _g - 1 - i
                return block_bwd(ctr, cti, _b0 + j, _s0 + j * _ld, _ld)
            ctr, cti = jax.lax.fori_loop(0, g, body, (ctr, cti))
    return kernel


# ── chain wrapper (custom VJP) ───────────────────────────────────────────────

def _tile_rows(a, hi, bt, n_tiles):
    """(nb?, bp, 2^n) -> (nb?, n_tiles, hi*bt, 128) with rows h*bt + b."""
    lead = a.shape[:-2]
    bp = a.shape[-2]
    a = a.reshape(lead + (n_tiles, bt, hi, 128))
    perm = tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (0, 2, 1, 3))
    return a.transpose(perm).reshape(lead + (n_tiles, hi * bt, 128))


def _untile_rows(a, hi, bt, n_tiles):
    """(n_tiles, hi*bt, 128) -> (bp, 2^n)."""
    return (a.reshape(n_tiles, hi, bt, 128)
            .transpose(0, 2, 1, 3)
            .reshape(n_tiles * bt, hi * 128))


def _workset_bytes(nb, n_sub, hi, bt, primal=False, bfly=False):
    """Per-tile VMEM bytes.  For the train path the backward is the
    high-water mark: resident unitaries + their cotangent accumulators,
    per-tile phi/saved/grad/phibar slabs, ~8 live (hi*bt, 128)
    temporaries, ring constants.  The primal-only forward carries no
    residual saves or accumulators, so it can run much larger tiles
    (often the whole batch in one — measured ~20% faster at Q10, the
    per-extra-grid-step cost being ~60 us).  The bfly backward keeps the
    per-qubit butterfly input states of one sublayer live
    (+ (n-7+1) rows per component)."""
    row = hi * bt * 128 * 4
    extra = (2 * (hi.bit_length() - 1 + 1) * row) if bfly else 0
    if primal:
        return (2 * n_sub * 128 * 128 * 4 + (nb + 2) * row
                + 8 * row + 8 * 128 * 128 * 4)
    mats = 4 * n_sub * 128 * 128 * 4          # u7t pair + u7bar pair
    slabs = (3 * nb + 2 + nb) * row           # phi+str+sti, g, phibar
    return mats + slabs + 8 * row + extra + 8 * 128 * 128 * 4


def _pick_bt(nb, n_sub, hi, batch, primal=False, bfly=False):
    env = os.environ.get('PFUSED_BT')   # A/B override for tile tuning
    if env:
        return int(env)
    # Mosaic's ACTUAL scoped stack for the bfly backward runs ~1.63x the
    # _workset_bytes model (measured on-chip: Q13 Net10-2-10-2 bt=16 ->
    # 101.97M actual vs 62.5M modeled, OOM over the 100M limit; Q12
    # bt=32 squeaks under at the same ratio).  Raising vmem_limit_bytes
    # is a moving target — Mosaic promotes more buffers into the freed
    # space (re-measured 109.72M under a 108M limit) — so instead the
    # hi>=64 backward budget absorbs the measured calibration, which
    # drops Q13 to bt=8 while leaving Q12's measured-optimal bt=32
    # (27,143 samples/s, 1.65x fused) untouched.
    budget = VMEM_BUDGET
    if bfly and not primal and hi >= 64:
        budget = int(VMEM_BUDGET / 1.63)
    bt = max(8, -(-batch // 8) * 8)
    while bt > 8 and _workset_bytes(nb, n_sub, hi, bt, primal,
                                    bfly) > budget:
        bt = max(8, (bt // 2 + 7) // 8 * 8)
        if bt == 8:
            break
    return bt


@lru_cache(maxsize=32)
def _make_chain(n_qubits, block_configs, batch, use_bf16=False,
                bfly=False):
    """custom-vjp fused-group chain for a fixed spec and batch:
    (u7t_r, u7t_i, uh_r, uh_i, phi) -> (sr, si), phi and the outputs in
    plain (nb, batch, 2^n) / (batch, 2^n) layout.  Batch padding and the
    row tiling live INSIDE each branch so the primal-only forward can
    pick a larger tile than the residual-laden train path (no residual
    saves -> the whole batch usually fits one tile; measured ~20%
    faster at Q10).  In bfly mode uh_r/uh_i are the (n_sub, n-7, 4)
    per-qubit 2x2 entries instead of dense (n_sub, hi, hi) matrices."""
    runs = _runs(block_configs)
    nb = len(block_configs)
    n_sub = sum(ld for _, ld in block_configs)
    hi = 2 ** (n_qubits - LANE_QUBITS)
    nh = n_qubits - LANE_QUBITS
    vmem = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)
    _, h7_np, _, _, _, fmats_np, _, bmats_np = _consts(n_qubits)
    bt_train = _pick_bt(nb, n_sub, hi, batch, bfly=bfly)
    bt_primal = _pick_bt(nb, n_sub, hi, batch, primal=True, bfly=bfly)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda t, _nd=nd: (0,) * _nd)

    u7_spec = const_spec((n_sub, 128, 128))
    uh_shape = (n_sub, nh, 4) if bfly else (n_sub, hi, hi)
    uh_spec = const_spec(uh_shape)

    def tiling(bt):
        bp = -(-batch // bt) * bt
        n_tiles = bp // bt
        hb = hi * bt
        per_tile_nb = pl.BlockSpec((nb, None, hb, 128),
                                   lambda t: (0, t, 0, 0))
        per_tile = pl.BlockSpec((None, hb, 128), lambda t: (t, 0, 0))

        def tile(a):
            """(nb?, batch, 2^n) -> (nb?, n_tiles, hb, 128), zero-pad."""
            pad = ((0, 0),) * (a.ndim - 2) + ((0, bp - batch), (0, 0))
            return _tile_rows(jnp.pad(a, pad), hi, bt, n_tiles)

        def untile(a):
            return _untile_rows(a, hi, bt, n_tiles)[:batch]
        return bp, n_tiles, hb, per_tile_nb, per_tile, tile, untile

    def fwd_call(u7t_r, u7t_i, uh_r, uh_i, phi_t, bt, save_residuals):
        bp, n_tiles, hb, per_tile_nb, per_tile, _, _ = tiling(bt)
        out_shape = (
            jax.ShapeDtypeStruct((n_tiles, hb, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, hb, 128), jnp.float32),
        )
        out_specs = (per_tile, per_tile)
        if save_residuals:
            out_shape += (
                jax.ShapeDtypeStruct((nb, n_tiles, hb, 128), jnp.float32),
                jax.ShapeDtypeStruct((nb, n_tiles, hb, 128), jnp.float32),
            )
            out_specs += (per_tile_nb, per_tile_nb)
        return pl.pallas_call(
            _fwd_kernel(n_qubits, runs, bt, save_residuals, use_bf16,
                        bfly),
            grid=(n_tiles,),
            out_shape=out_shape,
            in_specs=[const_spec((128, 128)),
                      const_spec(fmats_np.shape),
                      u7_spec, u7_spec, uh_spec, uh_spec, per_tile_nb],
            out_specs=out_specs,
            interpret=_interpret(),
            compiler_params=vmem,
        )(jnp.asarray(h7_np), jnp.asarray(fmats_np),
          u7t_r, u7t_i, uh_r, uh_i, phi_t)

    def bwd_call(u7t_r, u7t_i, uh_r, uh_i, phi_t, str_, sti, gr, gi):
        bt = bt_train
        bp, n_tiles, hb, per_tile_nb, per_tile, _, _ = tiling(bt)
        out_shape = (
            jax.ShapeDtypeStruct((n_sub, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_sub, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct(uh_shape, jnp.float32),
            jax.ShapeDtypeStruct(uh_shape, jnp.float32),
            jax.ShapeDtypeStruct((nb, n_tiles, hb, 128), jnp.float32),
        )
        return pl.pallas_call(
            _bwd_kernel(n_qubits, runs, bt, use_bf16, bfly),
            grid=(n_tiles,),
            out_shape=out_shape,
            in_specs=[const_spec((128, 128)),
                      const_spec(fmats_np.shape),
                      const_spec(bmats_np.shape),
                      u7_spec, u7_spec, uh_spec, uh_spec, per_tile_nb,
                      per_tile_nb, per_tile_nb, per_tile, per_tile],
            out_specs=(u7_spec, u7_spec, uh_spec, uh_spec, per_tile_nb),
            interpret=_interpret(),
            compiler_params=vmem,
        )(jnp.asarray(h7_np), jnp.asarray(fmats_np), jnp.asarray(bmats_np),
          u7t_r, u7t_i, uh_r, uh_i, phi_t, str_, sti, gr, gi)

    @jax.custom_vjp
    def chain(u7t_r, u7t_i, uh_r, uh_i, phi):
        _, _, _, _, _, tile, untile = tiling(bt_primal)
        sr, si = fwd_call(u7t_r, u7t_i, uh_r, uh_i, tile(phi),
                          bt_primal, save_residuals=False)
        return untile(sr), untile(si)

    def chain_fwd(u7t_r, u7t_i, uh_r, uh_i, phi):
        if n_qubits > TRAIN_MAX_QUBITS:
            raise ValueError(
                f"pfused training tops out at Q{TRAIN_MAX_QUBITS}: the "
                f"residual-saving backward exceeds the scoped-VMEM "
                f"limit at Q{n_qubits} (measured round 5 — forward-only "
                f"inference works to Q16); train with engine='fused' "
                f"(remat) instead")
        _, _, _, _, _, tile, untile = tiling(bt_train)
        phi_t = tile(phi)
        sr, si, str_, sti = fwd_call(u7t_r, u7t_i, uh_r, uh_i, phi_t,
                                     bt_train, save_residuals=True)
        return ((untile(sr), untile(si)),
                (u7t_r, u7t_i, uh_r, uh_i, phi_t, str_, sti))

    def chain_bwd(res, g):
        u7t_r, u7t_i, uh_r, uh_i, phi_t, str_, sti = res
        _, _, _, _, _, tile, untile = tiling(bt_train)
        u7br, u7bi, uhbr, uhbi, phibar = bwd_call(
            u7t_r, u7t_i, uh_r, uh_i, phi_t, str_, sti,
            tile(g[0]), tile(g[1]))
        # phibar back to the caller's (nb, batch, 2^n) layout
        phibar = jax.vmap(untile)(phibar)
        return u7br, u7bi, uhbr, uhbi, phibar

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


# ── engine entry point ───────────────────────────────────────────────────────

def pfused_applicable(spec, batch=None):
    return (MIN_QUBITS <= spec.n_qubits <= MAX_QUBITS
            and spec.uniform_encode
            and spec.n_blocks >= 1)


def _use_bf16():
    """Negative result, kept as an opt-in experiment (PFUSED_BF16=1):
    bf16-operand MXU matmuls measured NO faster than f32 at Q10
    (36.4K vs 37.4K samples/s) — the karas are already pipelined to
    ~0.035 us each (ablation: replacing the 3-matmul Karatsuba with one
    dot saves only 23 us of a 921 us forward), so the kernel is bound
    by VPU trig/FMA and per-block overhead, not MXU passes.  Default is
    exact f32 at every precision setting — stronger than the XLA fused
    path, which goes bf16 under default matmul precision."""
    return (os.environ.get('PFUSED_BF16') == '1'
            and jax.default_backend() == 'tpu')


def forward_pfused(spec, weights, x):
    """(sr, si) each (batch, 2^n) via the fused-group VMEM chain; same
    circuit contract as ops/fused_gates.forward_fused."""
    from quanonet_tpu.ops.fused_gates import build_group_unitaries
    n = spec.n_qubits
    if not pfused_applicable(spec):
        from quanonet_tpu.ops.fused_gates import forward_fused
        return forward_fused(spec, weights, x)
    batch = x.shape[0]
    nb = spec.n_blocks
    hi = 2 ** (n - LANE_QUBITS)
    n_sub = spec.total_sublayers

    bfly = _bfly_mode(n) and hi > 1
    gu = build_group_unitaries(spec, weights)
    u7r, u7i = gu[0]                                   # (S, 128, 128)
    u7t_r = u7r.transpose(0, 2, 1)
    u7t_i = u7i.transpose(0, 2, 1)
    if bfly:
        # ⊗-factorized high group: per-qubit 2x2 entries (S, n-7, 4)
        from quanonet_tpu.ops.fused_gates import build_high_rot2x2
        uh_r, uh_i = build_high_rot2x2(spec, weights, LANE_QUBITS)
    elif hi > 1:
        uh_r, uh_i = gu[1]                             # (S, hi, hi)
    else:
        eye = jnp.broadcast_to(jnp.eye(1, dtype=jnp.float32),
                               (n_sub, 1, 1))
        uh_r, uh_i = eye, jnp.zeros_like(eye)

    # hoisted per-sample encode phases (same math as forward_fused)
    zsgn = jnp.asarray(z_signs(n))
    xb = x.reshape(batch, nb, n).transpose(1, 0, 2)    # (nb, batch, n)
    # PRECISION PIN (quality-critical, ops/hea.py:273-280)
    phi = 0.5 * jnp.einsum('bxn,dn->bxd', xb, zsgn,
                           precision=jax.lax.Precision.HIGHEST)

    chain = _make_chain(n, tuple(spec.block_configs), batch, _use_bf16(),
                        bfly)
    return chain(u7t_r, u7t_i, uh_r, uh_i, phi)


def hea_expectation_pfused(spec, weights, x, diag):
    from quanonet_tpu.ops.hea import diag_expectation_pair
    sr, si = forward_pfused(spec, weights, x)
    return diag_expectation_pair(sr, si, jnp.asarray(diag))
