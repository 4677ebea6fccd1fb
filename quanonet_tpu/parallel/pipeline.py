"""
Pipeline parallelism over the block chain (the 'pp' axis).

The HEA circuit in the Hadamard-diagonal formulation is a depth-wise
chain (ops/hea._forward_dense):

    ψ = M_B D(x_B) M_{B-1} ... M_1 D(x_1) s0

Amplitude sharding (parallel/amplitude.py) splits the 2^n STATE over
devices; this module splits the CHAIN: P devices hold P contiguous
stages of nb/P blocks each, and microbatched states flow device-to-
device over the ICI ring (jax.lax.ppermute) on a GPipe schedule —
microbatch m occupies stage p at tick t = m + p, so a batch of M
microbatches drains in M + P - 1 ticks at 1 - (P-1)/(M+P-1) pipeline
efficiency.  This targets DEEP chains (large n_blocks — e.g. the
circuit study's HB=HT=20 nets already run 60 blocks, and block count
grows linearly with net width) where one device's VMEM can't hold the
whole chain's working set at large batch; unlike amplitude sharding it
moves only (mb, 2^n) activations per hop, never the (2^n, 2^n) blocks.

TPU-native design notes:
 - one jitted lax.scan over ticks; every tick is the same static-shape
   program (full-MXU Karatsuba matmuls per stage), so XLA overlaps the
   ppermute hop with the next tick's compute.
 - stage assignment is lax.axis_index arithmetic inside shard_map —
   weights/x stay replicated, each device dynamic-slices its own block
   range, so the SPMD program is identical on every device.
 - STAGE-LOCAL COMPILE: when every block has the same (n_qubits,
   linear_depth) structure — true for all QuanONet/HEAQNN nets — each
   device compiles only its own nb/P blocks from its slice of the
   weights (one static sub-spec shared by all stages; the global-last
   block's missing left Hadamard is a where-mask).  Unitary-compile
   cost and its memory then scale 1/P per device, matching how the
   chain itself is sharded.  Non-uniform specs fall back to
   compile-everything-and-slice.
 - gradients flow through ppermute/scan by plain autodiff (ppermute's
   transpose is the reverse permute; the weight-slice cotangents psum
   back through shard_map's replicated-input rule); no hand-written
   VJP needed.

The reference has no distributed execution at all (SURVEY §5.8: absent;
its backends are single-process CPU/GPU simulators), so this subsystem
is new capability, mirrored on "How to Scale Your Model"'s pipelining
recipe rather than any reference file.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from quanonet_tpu.ops import hea as _hea
from quanonet_tpu.ops.gates import hadamard_kron, z_signs
from quanonet_tpu.ops.hea import HEASpec, diag_expectation_pair


def make_pipeline_hea(spec: HEASpec, mesh, axis='pipe', n_microbatches=None,
                      data_axis=None, stage_local_compile=None,
                      pauli='Z', offset=0.0, coeff=0.0):
    """Build f(weights, x, diag) -> (batch, 1) expectation values with the
    block chain pipelined over ``mesh``'s ``axis``.

    pauli='X'/'Y' measures ⟨offset + coeff·Σᵢ Pᵢ⟩ instead of the
    diagonal (reference quantum_circuits_ms.py:28-39 `pauli` arg): the
    pipeline holds the FULL per-microbatch state on every stage, so the
    observable is a drop-in epilogue swap on the draining stage —
    zero extra communication.  ``diag`` is then ignored (pass zeros).

    ``data_axis``: optional second mesh axis to ALSO shard the batch over
    (dp x pp composition: each data-shard runs its own pipeline over the
    'pipe' axis; weights stay replicated).  The per-shard batch (global
    batch / data size) must then divide by n_microbatches.

    ``stage_local_compile``: compile only this device's blocks from its
    weight slice (defaults to on for uniform block structure, the
    production mode); False forces the compile-everything-and-slice
    fallback.

    Requirements: spec.n_blocks divisible by the pipe-axis size, the
    (per-shard) batch divisible by n_microbatches (default: the
    pipe-axis size).
    """
    n_dev = int(np.prod([mesh.shape[a] for a in (axis,)]))
    nb = spec.n_blocks
    if nb % n_dev:
        raise ValueError(f"n_blocks={nb} not divisible by pipeline "
                         f"size {n_dev}")
    per = nb // n_dev
    M = int(n_microbatches or n_dev)
    n = spec.n_qubits
    D = spec.dim
    inv_sqrt = float(1.0 / np.sqrt(D))

    uniform = len(set(spec.block_configs)) == 1
    if stage_local_compile is None:
        stage_local_compile = uniform
    if stage_local_compile and not uniform:
        raise ValueError("stage-local compile requires uniform block "
                         "structure (all blocks same (n_enc, ld))")
    sub_spec = HEASpec(n, spec.block_configs[:per]) if stage_local_compile \
        else None
    ld = spec.block_configs[0][1]

    def _fold(p, ur, ui):
        """M_b = H U_b H (global-last block: U_b H), pre-transposed.
        ur/ui: (per, D, D) local block unitaries."""
        hk = jnp.asarray(hadamard_kron(n))
        uh_r = ur @ hk
        uh_i = ui @ hk
        is_last = ((p * per + jnp.arange(per)) == nb - 1)[:, None, None]
        m_r = jnp.where(is_last, uh_r, hk[None] @ uh_r)
        m_i = jnp.where(is_last, uh_i, hk[None] @ uh_i)
        return m_r.transpose(0, 2, 1), m_i.transpose(0, 2, 1)

    def _local_mt_phi(p, weights, x):
        """This stage's pre-transposed block matrices (per, D, D) and the
        phi rows it consumes: (per+1, batch, D) = phases of blocks
        p*per .. p*per+per (row 0 feeds injection on device 0 only;
        rows 1..per are the trailing diagonals; the row past the global
        end is a clamped duplicate, masked out in _stage)."""
        batch = x.shape[0]
        if stage_local_compile:
            S_loc = per * ld
            w_loc = lax.dynamic_slice_in_dim(weights, p * S_loc, S_loc, 0)
            ur, ui = _hea.compile_block_unitaries(sub_spec, w_loc)
            mt_r, mt_i = _fold(p, ur, ui)
            xb = x.reshape(batch, nb, n).transpose(1, 0, 2)
            xb = jnp.concatenate([xb, xb[-1:]], 0)       # clamp row nb
            xb_loc = lax.dynamic_slice_in_dim(xb, p * per, per + 1, 0)
            # PRECISION PIN: same quality-critical K=n dot as
            # pallas_hea._prepare (bf16 phase rounding random-walks
            # over the chain)
            phi_loc = 0.5 * jnp.einsum(
                'bxn,dn->bxd', xb_loc, jnp.asarray(z_signs(n)),
                precision=jax.lax.Precision.HIGHEST)
        else:
            from quanonet_tpu.ops.pallas_hea import _prepare
            mt_r, mt_i, phi = _prepare(spec, weights, x)
            mt_r = lax.dynamic_slice_in_dim(mt_r, p * per, per, 0)
            mt_i = lax.dynamic_slice_in_dim(mt_i, p * per, per, 0)
            phi = jnp.concatenate([phi, phi[-1:]], 0)
            phi_loc = lax.dynamic_slice_in_dim(phi, p * per, per + 1, 0)
        return mt_r, mt_i, phi_loc

    def _stage(p, mt_r, mt_i, phi_mb, sr, si):
        """Apply this device's `per` blocks (+ trailing encode diagonals)
        to one resident microbatch.  phi_mb: (per+1, mb, D) local raw
        phases."""
        for k in range(per):
            b = p * per + k            # global block index (traced)
            tr = mt_r[k]
            ti = mt_i[k]
            t1 = sr @ tr
            t2 = si @ ti
            t3 = (sr + si) @ (tr + ti)
            sr, si = t1 - t2, t3 - t1 - t2
            # trailing diagonal D(x_{b+1}); the global last block has
            # none — mask its phase to 0 (cos=1/sin=0 => identity)
            ph = jnp.where(b == nb - 1, 0.0, phi_mb[k + 1])
            dr = jnp.cos(ph)
            di = -jnp.sin(ph)
            sr, si = dr * sr - di * si, dr * si + di * sr
        return sr, si

    def body(weights, x, diag):
        p = lax.axis_index(axis)
        batch = x.shape[0]
        mb = batch // M
        loc_r, loc_i, phi_loc = _local_mt_phi(p, weights, x)

        T = M + n_dev - 1
        perm = [(i, i + 1) for i in range(n_dev - 1)]
        zero = jnp.zeros((mb, D), jnp.float32)

        def tick(carry, t):
            pr, pi_ = carry
            # devices 1..P-1 receive the left neighbour's last output;
            # device 0 injects a fresh microbatch instead
            rr = lax.ppermute(pr, axis, perm)
            ri = lax.ppermute(pi_, axis, perm)
            m_p = jnp.clip(t - p, 0, M - 1)     # resident microbatch id
            phi_mb = lax.dynamic_slice_in_dim(phi_loc, m_p * mb, mb, 1)
            inj_r = jnp.cos(phi_mb[0]) * inv_sqrt   # D(x_1) · H|0..0>
            inj_i = -jnp.sin(phi_mb[0]) * inv_sqrt
            is0 = (p == 0)
            sr = jnp.where(is0, inj_r, rr)
            si = jnp.where(is0, inj_i, ri)
            sr, si = _stage(p, loc_r, loc_i, phi_mb, sr, si)
            if pauli == 'Z':
                e = diag_expectation_pair(sr, si, diag)     # (mb, 1)
            else:
                from quanonet_tpu.ops.hea import pauli_sum_expectation_pair
                e = pauli_sum_expectation_pair(sr, si, pauli, n,
                                               offset, coeff)
            return (sr, si), e

        (_, _), es = lax.scan(tick, (zero, zero), jnp.arange(T))
        # device P-1 emitted microbatch m at tick m + P - 1
        res = es[n_dev - 1:].reshape(batch, 1)
        mask = (p == n_dev - 1).astype(res.dtype)
        return lax.psum(res * mask, axis)

    # x's batch axis (and the per-shard output) shard over data_axis when
    # composing dp x pp; weights/diag stay replicated either way
    x_spec = P(data_axis) if data_axis else P()
    sm = shard_map(body, mesh=mesh,
                   in_specs=(P(), x_spec, P()), out_specs=x_spec,
                   check_vma=False)

    def fn(weights, x, diag):
        batch = x.shape[0]
        shard = batch
        if data_axis:
            d_size = mesh.shape[data_axis]
            if batch % d_size:
                raise ValueError(
                    f"batch={batch} not divisible by data-axis size "
                    f"{d_size}")
            shard = batch // d_size
        if shard % M:
            raise ValueError(
                f"per-shard batch {shard} not divisible by "
                f"n_microbatches={M}")
        return sm(jnp.asarray(weights), jnp.asarray(x), jnp.asarray(diag))

    return fn
