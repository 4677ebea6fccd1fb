"""
Pallas fused kernels for the HEA block chain.

The dense engine (ops/hea.py) reduces the circuit to

    s_1 = D(x_1) s0;   s_{b+1} = D(x_{b+1}) ⊙ (M_b s_b);   out = M_B s_B

with batch-independent block matrices M_b and per-sample diagonal phases
D(x_b).  Under XLA this is a scan of ~11 small ops per block; the kernels
here fuse the ENTIRE chain (60 blocks for the flagship Q5 net) into one
Pallas kernel each for forward and backward, keeping the statevector and
all block matrices resident in VMEM for the whole circuit — zero
inter-op scheduling overhead and no HBM round-trips between blocks.

Complex arithmetic is hand-rolled (re, im) float32 (no complex in Pallas,
and this TPU backend has no complex64 anyway).

Wired into the engine as ``engine='pallas'`` (quanonet_tpu/ops/hea.py);
numerically identical to the dense path (same math, same order), verified
in tests/test_pallas.py.  Falls back to the dense path when the working
set exceeds the VMEM budget.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quanonet_tpu.ops import hea as _hea
from quanonet_tpu.ops.gates import hadamard_kron, z_signs

VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under ~16 MB/core


def _interpret() -> bool:
    """Pallas TPU kernels run interpreted on CPU (test environments)."""
    return jax.default_backend() != 'tpu'


def _pad_batch(a, mult=8):
    n = a.shape[0]
    pad = (-n) % mult
    if pad:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    return a, n


def _chain_workset_bytes(B, N, D):
    # block mats (2), phases (2), states per block (2), current state (2)
    return 4 * (2 * B * D * D + 2 * B * N * D + 2 * B * N * D + 2 * N * D)


# ── forward kernel ───────────────────────────────────────────────────────────

def _fwd_kernel(nb):
    def kernel(mtr_ref, mti_ref, dr_ref, di_ref,
               sr_out, si_out, str_out, sti_out):
        sr = dr_ref[0]
        si = di_ref[0]
        for b in range(nb - 1):
            # save block-input state for the backward sweep
            str_out[b] = sr
            sti_out[b] = si
            tr = mtr_ref[b]
            ti = mti_ref[b]
            ur = (jnp.dot(sr, tr, preferred_element_type=jnp.float32)
                  - jnp.dot(si, ti, preferred_element_type=jnp.float32))
            ui = (jnp.dot(sr, ti, preferred_element_type=jnp.float32)
                  + jnp.dot(si, tr, preferred_element_type=jnp.float32))
            pr = dr_ref[b + 1]
            pi = di_ref[b + 1]
            sr = pr * ur - pi * ui
            si = pr * ui + pi * ur
        str_out[nb - 1] = sr
        sti_out[nb - 1] = si
        tr = mtr_ref[nb - 1]
        ti = mti_ref[nb - 1]
        sr_out[:] = (jnp.dot(sr, tr, preferred_element_type=jnp.float32)
                     - jnp.dot(si, ti, preferred_element_type=jnp.float32))
        si_out[:] = (jnp.dot(sr, ti, preferred_element_type=jnp.float32)
                     + jnp.dot(si, tr, preferred_element_type=jnp.float32))
    return kernel


def _chain_fwd(mt_r, mt_i, dr, di):
    nb, n, d = dr.shape
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((n, d), jnp.float32),      # sr
        jax.ShapeDtypeStruct((n, d), jnp.float32),      # si
        jax.ShapeDtypeStruct((nb, n, d), jnp.float32),  # saved states re
        jax.ShapeDtypeStruct((nb, n, d), jnp.float32),  # saved states im
    )
    return pl.pallas_call(
        _fwd_kernel(nb),
        out_shape=out_shape,
        in_specs=[vm, vm, vm, vm],
        out_specs=(vm, vm, vm, vm),
        interpret=_interpret(),
    )(mt_r, mt_i, dr, di)


# ── backward kernel ──────────────────────────────────────────────────────────

def _bwd_kernel(nb):
    def kernel(mtr_ref, mti_ref, dr_ref, di_ref, str_ref, sti_ref,
               gr_ref, gi_ref,
               mbar_r_out, mbar_i_out, dbar_r_out, dbar_i_out):
        # final block: out = s_{B} M_B  (row-vector convention: s @ M^T is
        # already folded into mt = M^T at the caller)
        gr = gr_ref[:]
        gi = gi_ref[:]
        sr = str_ref[nb - 1]
        si = sti_ref[nb - 1]
        # grads w.r.t. mt_{B-1}: ur = sr@tr - si@ti ; ui = sr@ti + si@tr
        mbar_r_out[nb - 1] = (
            jnp.dot(sr.T, gr, preferred_element_type=jnp.float32)
            + jnp.dot(si.T, gi, preferred_element_type=jnp.float32))
        mbar_i_out[nb - 1] = (
            jnp.dot(sr.T, gi, preferred_element_type=jnp.float32)
            - jnp.dot(si.T, gr, preferred_element_type=jnp.float32))
        tr = mtr_ref[nb - 1]
        ti = mti_ref[nb - 1]
        sbar_r = (jnp.dot(gr, tr.T, preferred_element_type=jnp.float32)
                  + jnp.dot(gi, ti.T, preferred_element_type=jnp.float32))
        sbar_i = (jnp.dot(gi, tr.T, preferred_element_type=jnp.float32)
                  - jnp.dot(gr, ti.T, preferred_element_type=jnp.float32))

        for b in range(nb - 2, -1, -1):
            # forward was: u = s_b M_b ; s_{b+1} = D_{b+1} ⊙ u
            pr = dr_ref[b + 1]
            pi = di_ref[b + 1]
            sr = str_ref[b]
            si = sti_ref[b]
            # recompute u (cheaper than saving a second state array)
            tr = mtr_ref[b]
            ti = mti_ref[b]
            ur = (jnp.dot(sr, tr, preferred_element_type=jnp.float32)
                  - jnp.dot(si, ti, preferred_element_type=jnp.float32))
            ui = (jnp.dot(sr, ti, preferred_element_type=jnp.float32)
                  + jnp.dot(si, tr, preferred_element_type=jnp.float32))
            # diag backward: nr = pr·ur - pi·ui ; ni = pr·ui + pi·ur
            dbar_r_out[b + 1] = ur * sbar_r + ui * sbar_i
            dbar_i_out[b + 1] = -ui * sbar_r + ur * sbar_i
            ubar_r = pr * sbar_r + pi * sbar_i
            ubar_i = -pi * sbar_r + pr * sbar_i
            # matmul backward
            mbar_r_out[b] = (
                jnp.dot(sr.T, ubar_r, preferred_element_type=jnp.float32)
                + jnp.dot(si.T, ubar_i, preferred_element_type=jnp.float32))
            mbar_i_out[b] = (
                jnp.dot(sr.T, ubar_i, preferred_element_type=jnp.float32)
                - jnp.dot(si.T, ubar_r, preferred_element_type=jnp.float32))
            sbar_r = (jnp.dot(ubar_r, tr.T, preferred_element_type=jnp.float32)
                      + jnp.dot(ubar_i, ti.T,
                                preferred_element_type=jnp.float32))
            sbar_i = (jnp.dot(ubar_i, tr.T, preferred_element_type=jnp.float32)
                      - jnp.dot(ubar_r, ti.T,
                                preferred_element_type=jnp.float32))
        # s_1 = D_1 ⊙ s0 with constant s0 = 1/sqrt(D)
        dbar_r_out[0] = sbar_r
        dbar_i_out[0] = sbar_i
    return kernel


def _chain_bwd(mt_r, mt_i, dr, di, states_r, states_i, gr, gi):
    nb, n, d = dr.shape
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((nb, d, d), jnp.float32),  # mbar_r
        jax.ShapeDtypeStruct((nb, d, d), jnp.float32),  # mbar_i
        jax.ShapeDtypeStruct((nb, n, d), jnp.float32),  # dbar_r
        jax.ShapeDtypeStruct((nb, n, d), jnp.float32),  # dbar_i
    )
    mbar_r, mbar_i, dbar_r, dbar_i = pl.pallas_call(
        _bwd_kernel(nb),
        out_shape=out_shape,
        in_specs=[vm] * 8,
        out_specs=(vm, vm, vm, vm),
        interpret=_interpret(),
    )(mt_r, mt_i, dr, di, states_r, states_i, gr, gi)
    return mbar_r, mbar_i, dbar_r, dbar_i


# ── custom-vjp chain op ──────────────────────────────────────────────────────

@jax.custom_vjp
def block_chain(mt_r, mt_i, dr, di):
    """(mt_r, mt_i): (B, D, D) pre-transposed block matrices;
    (dr, di): (B, batch, D) diag phases with the 1/sqrt(D) initial state
    already folded into index 0."""
    sr, si, _, _ = _chain_fwd(mt_r, mt_i, dr, di)
    return sr, si


def _block_chain_fwd(mt_r, mt_i, dr, di):
    sr, si, states_r, states_i = _chain_fwd(mt_r, mt_i, dr, di)
    return (sr, si), (mt_r, mt_i, dr, di, states_r, states_i)


def _block_chain_bwd(res, g):
    mt_r, mt_i, dr, di, states_r, states_i = res
    gr, gi = g
    return _chain_bwd(mt_r, mt_i, dr, di, states_r, states_i, gr, gi)


block_chain.defvjp(_block_chain_fwd, _block_chain_bwd)


# ── engine entry points ──────────────────────────────────────────────────────

def _prepare(spec, weights, x):
    """Shared with the dense path: compile block matrices (Hadamards
    folded, pre-transposed for row-vector matmuls) and hoisted phases."""
    n = spec.n_qubits
    batch = x.shape[0]
    nb = spec.n_blocks

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
    phi = 0.5 * (xb @ zsgn.T)                            # (B, batch, D)
    dr = jnp.cos(phi)
    di = -jnp.sin(phi)
    return mt_r, mt_i, dr, di


def forward_pallas(spec, weights, x):
    """(sr, si) via the fused Pallas chain; falls back to the dense XLA
    path when the working set exceeds the VMEM budget."""
    nb, d = spec.n_blocks, spec.dim
    batch = x.shape[0]
    if _chain_workset_bytes(nb, max(batch, 8), d) > VMEM_BUDGET \
            or not spec.uniform_encode or nb < 2:
        return _hea._forward_dense(spec, weights, x)
    mt_r, mt_i, dr, di = _prepare(spec, weights, x)
    dr_p, n_real = _pad_batch(dr.transpose(1, 0, 2))     # pad batch axis
    di_p, _ = _pad_batch(di.transpose(1, 0, 2))
    dr_p = dr_p.transpose(1, 0, 2)
    di_p = di_p.transpose(1, 0, 2)
    inv_sqrt = 1.0 / np.sqrt(d)
    dr_p = dr_p.at[0].mul(inv_sqrt)   # fold s0 = H|0> = 1/sqrt(D)
    di_p = di_p.at[0].mul(inv_sqrt)
    sr, si = block_chain(mt_r, mt_i, dr_p, di_p)
    return sr[:n_real], si[:n_real]


def hea_expectation_pallas(spec, weights, x, diag):
    sr, si = forward_pallas(spec, weights, x)
    return _hea.diag_expectation_pair(sr, si, jnp.asarray(diag))
