"""
Fused-group statevector engine for large qubit counts (Q8–Q16).

The dense engine (ops/hea.py) compiles each block's ansatz stack into one
(2^n, 2^n) unitary, which costs O(8^n) in the sublayer-fold matmuls — at
Q10 that compile dominates the step (~35 ms).  The gates engine applies
every rotation individually — thousands of O(2^n) elementwise ops per
forward.  This engine is the TPU-native middle path, built on two facts:

1. A whole ansatz sublayer's rotation stack is a Kronecker product of
   per-qubit 2x2s:  (⊗RY')(⊗RZ)(⊗RY) = ⊗(RY'·RZ·RY) — the mixed-product
   property means the three full-register rotations collapse into ONE
   kron of per-qubit complex 2x2 matrices R_i, never forming a D×D
   product chain.
2. A kron-factored operator applies to the state in qubit GROUPS: for a
   group of k qubits the (2^k, 2^k) group unitary hits the state as a
   batched matmul with contraction width 2^k.  k=7 gives 128-wide
   contractions — exactly one MXU lane tile.

Per block the circuit becomes

    ψ ← H ψ                        (grouped constant matmuls, H = ⊗H_i)
    ψ ← D(x_b) ⊙ ψ                 (per-sample diagonal phases, VPU)
    for each sublayer:
        ψ ← (⊗ R_i [·H_i]) ψ       (grouped matmuls; the encode's left
                                     Hadamard folds into the FIRST
                                     sublayer's per-qubit matrices)
        ψ ← Ring ψ                 (one precomputed index gather)

using RX(x) = H RZ(x) H (ops/gates.hadamard_kron doc).  All group
unitaries for all sublayers are built up front from the weights in
O(S·4^k) — kilobytes, not the O(8^n) of the dense fold — and the block
loop is a lax.scan per run of equal-depth blocks.

Memory is O(batch·2^n) for the state plus O(S·4^k) for the operators, so
Q16 forward fits a single chip easily; gradients flow by autodiff (the
scan saves per-block states; pass ``remat=True`` to rematerialise per
block and cap residual memory for very large n).

Replaces: the reference's delegated simulators at large n (SURVEY.md §2,
mqvector / TorchQuantum), and our own gates path as the default above
DENSE_MAX_QUBITS.  Verified against the gates oracle in
tests/test_fused_gates.py.
"""
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from quanonet_tpu.ops.gates import (
    cnot_ring_inverse_permutation,
    make_perm_apply,
    z_signs,
)

MAX_GROUP_QUBITS = 7  # 2^7 = 128 = one MXU lane tile

# Unroll factor for the block scan.  The scan body is ~22 small XLA ops
# (grouped matmuls + gathers); at unroll=1 every block pays the per-op
# issue overhead serially.  Unrolling lets XLA fuse/pipeline across
# blocks like the dense path does (ops/hea.py _forward_dense unroll=8).
# Measured on v5e (bench_qubit_scaling, Net40-2-20-2 bs=100, clean
# sequential runs): Q10 unroll 1/2/4/6 -> 10.9/15.2/15.8/15.1 K
# samples/s and Q8 -> 25.4K -> 36.7K (+44% at 4); under remat
# (Q>=12, bandwidth-bound recompute) unroll is neutral-to-negative
# (Q12 12.7->12.6K, Q14 3.41->3.25K, Q16 386->386), so the default is
# 4 on the non-remat path and 1 under remat.  FUSED_UNROLL=n overrides
# both.
_FUSED_UNROLL_ENV = os.environ.get('FUSED_UNROLL')
FUSED_UNROLL = int(_FUSED_UNROLL_ENV) if _FUSED_UNROLL_ENV else None


def _scan_unroll(remat: bool) -> int:
    if FUSED_UNROLL is not None:
        return FUSED_UNROLL
    return 1 if remat else 4


@lru_cache(maxsize=None)
def _ring_apply(n_qubits: int):
    """CNOT-ring permutation of the full register (see make_perm_apply)."""
    return make_perm_apply(cnot_ring_inverse_permutation(n_qubits))


@lru_cache(maxsize=None)
def qubit_groups(n_qubits: int, k_max: int = MAX_GROUP_QUBITS):
    """Partition qubits [0, n) into contiguous groups of at most k_max,
    lowest bits first.  Returns ((offset, k), ...)."""
    groups = []
    off = 0
    while off < n_qubits:
        k = min(k_max, n_qubits - off)
        groups.append((off, k))
        off += k
    return tuple(groups)


_H2 = np.array([[1.0, 1.0], [1.0, -1.0]], np.float32) / np.sqrt(2.0)


@lru_cache(maxsize=None)
def _hadamard_group(k: int) -> np.ndarray:
    """H^{⊗k} as a (2^k, 2^k) float32 constant."""
    u = _H2
    for _ in range(k - 1):
        u = np.kron(_H2, u)
    return np.ascontiguousarray(u, np.float32)


def _rot2x2(w):
    """Per-qubit complex 2x2 of one sublayer: R = RY(w2)·RZ(w1)·RY(w0).

    w: (3, n) -> (rr, ri), each (n, 2, 2) float32.  Conventions are the
    engine's (ops/gates.py): RY real, RZ = diag(e^{-iθ/2}, e^{+iθ/2}).
    """
    a, b, c = w[0] / 2.0, w[1] / 2.0, w[2] / 2.0   # each (n,)
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    # RZ·RY(w0): row 0 × e^{-ib}, row 1 × e^{+ib}
    m0r = jnp.stack([jnp.stack([ca * cb, -sa * cb], -1),
                     jnp.stack([sa * cb, ca * cb], -1)], -2)
    m0i = jnp.stack([jnp.stack([-ca * sb, sa * sb], -1),
                     jnp.stack([sa * sb, ca * sb], -1)], -2)
    # RY(w2) @ m0 (real × complex)
    ry2 = jnp.stack([jnp.stack([cc, -sc], -1),
                     jnp.stack([sc, cc], -1)], -2)      # (n, 2, 2)
    rr = jnp.einsum('nij,njk->nik', ry2, m0r)
    ri = jnp.einsum('nij,njk->nik', ry2, m0i)
    return rr, ri


def _ckron(ar, ai, br, bi):
    """Complex Kronecker product in split-real form (B acts on LOWER bits:
    result = A ⊗ B in little-endian register order)."""
    def kron(x, y):
        da, db = x.shape[-1], y.shape[-1]
        out = x[..., :, None, :, None] * y[..., None, :, None, :]
        return out.reshape(x.shape[:-2] + (da * db, da * db))
    return (kron(ar, br) - kron(ai, bi)), (kron(ar, bi) + kron(ai, br))


def _group_unitary(rr, ri, off, k, fold_h):
    """Kron the per-qubit 2x2s of qubits [off, off+k) into a (2^k, 2^k)
    complex pair.  fold_h: right-multiply each per-qubit matrix by H
    (folding the encode's left Hadamard into this sublayer)."""
    if fold_h:
        h = jnp.asarray(_H2)
        rr = jnp.einsum('nij,jk->nik', rr, h)
        ri = jnp.einsum('nij,jk->nik', ri, h)
    ur, ui = rr[off], ri[off]
    for q in range(off + 1, off + k):
        ur, ui = _ckron(rr[q], ri[q], ur, ui)   # higher qubit on the left
    return ur, ui


def _apply_group(sr, si, ur, ui, off, k, n_qubits):
    """Apply a (2^k, 2^k) complex unitary to qubits [off, off+k) of the
    (batch, 2^n) split-real state.  One Karatsuba = 3 real matmuls whose
    contraction width is 2^k (=128 for full groups)."""
    batch = sr.shape[0]
    lo = 2 ** off
    mid = 2 ** k
    hi = 2 ** (n_qubits - off - k)
    r = sr.reshape(batch, hi, mid, lo)
    i = si.reshape(batch, hi, mid, lo)
    # out[b,h,j,l] = Σ_m U[j,m] ψ[b,h,m,l]
    utr = ur.T
    uti = ui.T
    uts = utr + uti
    t1 = jnp.einsum('bhml,mj->bhjl', r, utr)
    t2 = jnp.einsum('bhml,mj->bhjl', i, uti)
    t3 = jnp.einsum('bhml,mj->bhjl', r + i, uts)
    return (t1 - t2).reshape(batch, -1), (t3 - t1 - t2).reshape(batch, -1)


def _apply_hadamard(sr, si, groups, n_qubits):
    """ψ ← H^{⊗n} ψ via grouped constant matmuls (real matrix: 2 matmuls)."""
    batch = sr.shape[0]
    for off, k in groups:
        h = jnp.asarray(_hadamard_group(k))
        lo = 2 ** off
        mid = 2 ** k
        hi = 2 ** (n_qubits - off - k)
        r = sr.reshape(batch, hi, mid, lo)
        i = si.reshape(batch, hi, mid, lo)
        sr = jnp.einsum('bhml,mj->bhjl', r, h.T).reshape(batch, -1)
        si = jnp.einsum('bhml,mj->bhjl', i, h.T).reshape(batch, -1)
    return sr, si


def _first_in_block(spec):
    """Bool mask over sublayers: first-in-block (gets the encode-H fold)."""
    first = np.zeros(spec.total_sublayers, bool)
    s = 0
    for _, ld in spec.block_configs:
        if ld > 0:
            first[s] = True
        s += ld
    return first


def build_high_rot2x2(spec, weights, off):
    """Per-qubit complex 2x2 rotations of qubits [off, n) for every
    sublayer, with the encode Hadamard right-folded into first-in-block
    sublayers — the ⊗-factorized form of the high group unitary (the
    dense (2^k, 2^k) group matrix is exactly ⊗_j of these).  Returns
    (u2r, u2i), each (S, n-off, 4) float32 with entries
    [u00, u01, u10, u11].  Consumed by the pfused butterfly path
    (ops/pallas_fused.py), which applies the high group as n-off
    row-block butterflies instead of a dense (2^k)^2 contraction."""
    rr, ri = jax.vmap(_rot2x2)(weights)            # (S, n, 2, 2)
    h = jnp.asarray(_H2)
    fr = jnp.einsum('snij,jk->snik', rr, h)
    fi = jnp.einsum('snij,jk->snik', ri, h)
    fold = jnp.asarray(_first_in_block(spec))[:, None, None, None]
    rr = jnp.where(fold, fr, rr)
    ri = jnp.where(fold, fi, ri)
    s = spec.total_sublayers
    n = spec.n_qubits
    return (rr[:, off:].reshape(s, n - off, 4),
            ri[:, off:].reshape(s, n - off, 4))


def build_group_unitaries(spec, weights):
    """All sublayer group unitaries up front.

    Returns {group_index: (ur, ui)} with ur/ui (S, 2^k, 2^k); the first
    sublayer of every block carries the encode Hadamard folded in.
    O(S · 4^k) total — independent of 2^n.
    """
    groups = qubit_groups(spec.n_qubits)
    # mark which sublayers are first-in-block (get the H fold)
    first = _first_in_block(spec)

    rr, ri = jax.vmap(_rot2x2)(weights)       # (S, n, 2, 2) each

    out = {}
    for gi, (off, k) in enumerate(groups):
        def one(rr_s, ri_s, fold):
            plain = _group_unitary(rr_s, ri_s, off, k, False)
            folded = _group_unitary(rr_s, ri_s, off, k, True)
            return (jnp.where(fold, folded[0], plain[0]),
                    jnp.where(fold, folded[1], plain[1]))
        out[gi] = jax.vmap(one)(rr, ri, jnp.asarray(first))
    return out


def forward_fused(spec, weights, x, remat=None):
    """Evolve |0…0⟩ through the full circuit; returns (sr, si), each
    (batch, 2^n) float32.  x: (batch, n_blocks·n_qubits) block-major
    encode angles (requires uniform encode, like the dense path).

    remat: rematerialise each block group on the backward pass (defaults
    to True for n_qubits >= 12, where saving per-sublayer states would
    dominate memory).
    """
    n = spec.n_qubits
    if not spec.uniform_encode:
        raise ValueError("fused engine requires n_encode == n_qubits "
                         "per block (same contract as dense)")
    batch = x.shape[0]
    dim = spec.dim
    nb = spec.n_blocks
    groups = qubit_groups(n)
    if remat is None:
        remat = n >= 12

    gu = build_group_unitaries(spec, weights)

    # hoisted per-sample encode phases: φ = 0.5 · x_b · zsignᵀ.
    # PRECISION PIN (quality-critical, ops/hea.py:273-280): bf16 rounding
    # of this K=n dot random-walks into ~2% output error over the chain.
    zsgn = jnp.asarray(z_signs(n))                        # (D, n)
    xb = x.reshape(batch, nb, n).transpose(1, 0, 2)       # (B, batch, n)
    phi = 0.5 * jnp.einsum('bxn,dn->bxd', xb, zsgn,
                           precision=jax.lax.Precision.HIGHEST)
    dr = jnp.cos(phi)
    di = -jnp.sin(phi)

    ring_apply = _ring_apply(n)

    def block_body(sr, si, dr_b, di_b, subs, ld):
        # encode right-H, then the per-sample diagonal
        sr, si = _apply_hadamard(sr, si, groups, n)
        nr = dr_b * sr - di_b * si
        ni = dr_b * si + di_b * sr
        sr, si = nr, ni
        if ld == 0:   # encoding-only block still needs its left Hadamard
            return _apply_hadamard(sr, si, groups, n)
        for d in range(ld):
            for gi, (off, k) in enumerate(groups):
                ur, ui = subs[gi][0][d], subs[gi][1][d]
                sr, si = _apply_group(sr, si, ur, ui, off, k, n)
            if n > 1:
                sr, si = ring_apply(sr, si)
        return sr, si

    sr = jnp.zeros((batch, dim), jnp.float32).at[:, 0].set(1.0)
    si = jnp.zeros((batch, dim), jnp.float32)

    # scan over runs of consecutive blocks with equal linear_depth
    s = 0
    b = 0
    while b < nb:
        ld = spec.block_configs[b][1]
        j = b
        while j < nb and spec.block_configs[j][1] == ld:
            j += 1
        g = j - b                                     # run length
        # stack this run's sublayer group unitaries: (g, ld, 2^k, 2^k)
        subs_run = {gi: (gu[gi][0][s:s + g * ld].reshape(
                             (g, ld) + gu[gi][0].shape[1:]),
                         gu[gi][1][s:s + g * ld].reshape(
                             (g, ld) + gu[gi][1].shape[1:]))
                    for gi in range(len(groups))} if ld > 0 else {}

        body = (lambda a, c, p, q, sub, _ld=ld:
                block_body(a, c, p, q, sub, _ld))
        if remat:
            body = jax.checkpoint(body)

        def step(state, inp):
            sr, si = state
            dr_b, di_b, subs = inp
            return body(sr, si, dr_b, di_b, subs), None

        (sr, si), _ = jax.lax.scan(step, (sr, si),
                                   (dr[b:j], di[b:j], subs_run),
                                   unroll=min(_scan_unroll(remat), g))
        s += g * ld
        b = j
    return sr, si
