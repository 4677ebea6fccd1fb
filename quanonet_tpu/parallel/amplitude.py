"""
Amplitude-sharded statevector engine — the scaling path for LARGE qubit
counts (SURVEY.md §5.7).  Each extra qubit doubles the state; past ~Q16 a
single chip's memory is the wall.  Here the 2^n amplitude axis is sharded
across a device mesh: with P = 2^k devices in block layout, the top k
qubits' bit values ARE the device index, so

* gates on the n-k LOCAL qubits run entirely on-shard;
* gates on a GLOBAL qubit exchange shards with one partner device via
  ``jax.lax.ppermute`` (pairwise XOR pattern — the direct structural
  analog of ring/context parallelism, riding ICI);
* RZ on a global qubit is FREE of communication (diagonal: the device's
  bit value is constant across its shard);
* the CNOT ring needs at most one ppermute per global-qubit link;
* the measurement is a local partial expectation + one psum.

Everything is split real/imag float32 and differentiable (ppermute has a
transpose rule), so sharded training works end-to-end.

Used via ``hea_expectation_sharded(spec, weights, x, diag, mesh)``;
validated against the single-device engine on a virtual 8-device mesh in
tests/test_amplitude_sharding.py.
"""
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from quanonet_tpu.ops.hea import HEASpec


def _pairs_xor(n_dev, bit):
    """ppermute pairs exchanging device d <-> d ^ (1 << bit)."""
    return [(d, d ^ (1 << bit)) for d in range(n_dev)]


def _swap_with_partner(arr, axis_name, n_dev, dev_bit):
    if n_dev == 1:
        # virtual_global timing mode: partner exchange is a no-op
        return arr
    return jax.lax.ppermute(arr, axis_name, _pairs_xor(n_dev, dev_bit))


def _rx_local(sr, si, q, theta, local_n):
    """Per-sample RX on a local qubit (theta: (batch,))."""
    batch = sr.shape[0]
    half = theta / 2.0
    c = jnp.cos(half)[:, None, None]
    s = jnp.sin(half)[:, None, None]
    lo = 2 ** q
    hi = 2 ** (local_n - 1 - q)
    r = sr.reshape(batch, hi, 2, lo)
    i = si.reshape(batch, hi, 2, lo)
    r0, r1 = r[:, :, 0, :], r[:, :, 1, :]
    i0, i1 = i[:, :, 0, :], i[:, :, 1, :]
    sr = jnp.stack([c * r0 + s * i1, s * i0 + c * r1],
                   axis=2).reshape(batch, -1)
    si = jnp.stack([c * i0 - s * r1, -s * r0 + c * i1],
                   axis=2).reshape(batch, -1)
    return sr, si


def _ry_local(sr, si, q, c, s, local_n):
    batch = sr.shape[0]
    lo = 2 ** q
    hi = 2 ** (local_n - 1 - q)

    def rot(a):
        a = a.reshape(batch, hi, 2, lo)
        a0, a1 = a[:, :, 0, :], a[:, :, 1, :]
        return jnp.stack([c * a0 - s * a1, s * a0 + c * a1],
                         axis=2).reshape(batch, -1)

    return rot(sr), rot(si)


def _rz_local(sr, si, q, half, local_n):
    batch = sr.shape[0]
    lo = 2 ** q
    hi = 2 ** (local_n - 1 - q)
    c, s = jnp.cos(half), jnp.sin(half)
    r = sr.reshape(batch, hi, 2, lo)
    i = si.reshape(batch, hi, 2, lo)
    r0, r1 = r[:, :, 0, :], r[:, :, 1, :]
    i0, i1 = i[:, :, 0, :], i[:, :, 1, :]
    sr = jnp.stack([c * r0 + s * i0, c * r1 - s * i1],
                   axis=2).reshape(batch, -1)
    si = jnp.stack([c * i0 - s * r0, c * i1 + s * r1],
                   axis=2).reshape(batch, -1)
    return sr, si


def make_sharded_hea(spec: HEASpec, mesh, axis='amp', fused=False,
                     virtual_global=None, pauli='Z', offset=0.0,
                     coeff=0.0):
    """Build a jitted sharded expectation fn:
    f(weights, x, diag) -> (batch, 1).

    weights/x replicated; diag sharded over the amplitude axis.

    pauli='X'/'Y' (reference quantum_circuits_ms.py:28-39 `pauli` arg,
    the hamiltonian-study ablation) measures ⟨offset + coeff·Σᵢ Pᵢ⟩
    instead of the diagonal: local qubits use the on-shard pair formula
    (ops/hea.pauli_sum_expectation_pair), each GLOBAL qubit costs one
    partner ppermute — the device contributes Re/Im⟨conj(local),
    partner⟩ and the pair sums to the 2·Re/2·Im of the unsharded
    formula.  ``diag`` is then ignored (pass zeros).

    fused=True swaps the LOCAL-qubit work onto the grouped-kron MXU path
    (ops/fused_gates.py): per sublayer, local rotations become n/7
    128-wide matmuls instead of 3·local_n elementwise state passes, and
    the ring's local CNOT run collapses to ONE composite gather.  Global
    qubits keep the per-gate collective formulas (RZ free, RY/RX one
    ppermute, boundary CNOTs one ppermute) — the communication pattern is
    unchanged, only on-shard compute is restructured.

    virtual_global=k (single-device mesh only) is a TIMING INSTRUMENT:
    it executes exactly ONE shard's local computation of a 2^k-way
    sharded run — same local state size 2^(n-k), same gate/combine
    arithmetic — with every partner exchange a self-ppermute no-op.
    The output is numerically a fixed-gauge variant, NOT the true
    circuit; use it only to measure per-shard compute on real hardware
    (bench_amplitude.py --shard-compute).
    """
    n = spec.n_qubits
    n_dev = mesh.shape[axis]
    if virtual_global is not None:
        if n_dev != 1:
            raise ValueError("virtual_global requires a 1-device mesh")
        k = int(virtual_global)
    else:
        k = int(math.log2(n_dev))
        if 2 ** k != n_dev:
            raise ValueError(f"device count {n_dev} must be a power of 2")
    if k > n:
        raise ValueError(
            f"2^{k} shards ({n_dev} devices) > 2^{n} amplitudes")
    local_n = n - k
    local_dim = 2 ** local_n
    if pauli not in ('Z', 'X', 'Y'):
        raise ValueError(f"pauli must be Z, X or Y, got {pauli}")
    if pauli != 'Z' and virtual_global is not None:
        raise ValueError("virtual_global is a Z-basis timing instrument")

    def measure(sr, si, my_id, diag_local):
        """Local partial expectation + one psum (see docstring)."""
        if pauli == 'Z':
            local = (sr * sr + si * si) @ diag_local       # (batch,)
            return jax.lax.psum(local, axis)[:, None]
        from quanonet_tpu.ops.hea import pauli_sum_total
        batch = sr.shape[0]
        total = (pauli_sum_total(sr, si, pauli, local_n) if local_n > 0
                 else jnp.zeros((batch,), jnp.float32))
        for q in range(local_n, n):
            dev_bit = q - local_n
            pr = _swap_with_partner(sr, axis, n_dev, dev_bit)
            pi = _swap_with_partner(si, axis, n_dev, dev_bit)
            if pauli == 'X':
                # both partners contribute Re⟨conj(me), partner⟩ = the
                # same value; the pair sums to 2·ReΣ conj(ψ0)ψ1
                total = total + jnp.sum(sr * pr + si * pi, axis=1)
            else:
                # Im⟨conj(me), partner⟩ flips sign on the |1⟩ half
                bit = (my_id >> dev_bit) & 1
                sign = 1.0 - 2.0 * bit
                total = total + sign * jnp.sum(sr * pi - si * pr, axis=1)
        total = jax.lax.psum(total, axis)
        return (offset + coeff * total)[:, None]

    def rx_any(sr, si, q, theta, my_id):
        if q < local_n:
            return _rx_local(sr, si, q, theta, local_n)
        # global qubit: partner exchange; uniform combine formula
        dev_bit = q - local_n
        pr = _swap_with_partner(sr, axis, n_dev, dev_bit)
        pi = _swap_with_partner(si, axis, n_dev, dev_bit)
        half = theta / 2.0
        c = jnp.cos(half)[:, None]
        s = jnp.sin(half)[:, None]
        return c * sr + s * pi, c * si - s * pr

    def ry_any(sr, si, q, c, s, my_id):
        if q < local_n:
            return _ry_local(sr, si, q, c, s, local_n)
        dev_bit = q - local_n
        pr = _swap_with_partner(sr, axis, n_dev, dev_bit)
        pi = _swap_with_partner(si, axis, n_dev, dev_bit)
        bit = (my_id >> dev_bit) & 1
        sign = (2.0 * bit - 1.0)   # -s for |0> half, +s for |1> half
        return c * sr + sign * s * pr, c * si + sign * s * pi

    def rz_any(sr, si, q, half, my_id):
        if q < local_n:
            return _rz_local(sr, si, q, half, local_n)
        dev_bit = q - local_n
        bit = (my_id >> dev_bit) & 1
        sgn = 2.0 * bit - 1.0       # e^{+iθ/2} on |1>, e^{-iθ/2} on |0>
        c, s = jnp.cos(half), jnp.sin(half)
        return c * sr - sgn * s * si, c * si + sgn * s * sr

    def cnot_any(sr, si, control, target, my_id):
        kidx = np.arange(local_dim)
        if control < local_n and target < local_n:
            perm = kidx ^ (((kidx >> control) & 1) << target)
            inv = np.empty_like(perm)
            inv[perm] = kidx
            return sr[:, inv], si[:, inv]
        if control >= local_n and target < local_n:
            # flip target locally iff this device's control bit is 1
            cbit = (my_id >> (control - local_n)) & 1
            perm = kidx ^ (1 << target)
            inv = np.empty_like(perm)
            inv[perm] = kidx
            fr, fi = sr[:, inv], si[:, inv]
            return (jnp.where(cbit == 1, fr, sr),
                    jnp.where(cbit == 1, fi, si))
        if control < local_n and target >= local_n:
            # exchange rows where the LOCAL control bit is 1
            dev_bit = target - local_n
            pr = _swap_with_partner(sr, axis, n_dev, dev_bit)
            pi = _swap_with_partner(si, axis, n_dev, dev_bit)
            cmask = jnp.asarray(((kidx >> control) & 1)
                                .astype(np.float32))[None, :]
            return sr * (1 - cmask) + pr * cmask, \
                si * (1 - cmask) + pi * cmask
        # both global
        dev_bit_t = target - local_n
        cbit = (my_id >> (control - local_n)) & 1
        pr = _swap_with_partner(sr, axis, n_dev, dev_bit_t)
        pi = _swap_with_partner(si, axis, n_dev, dev_bit_t)
        return jnp.where(cbit == 1, pr, sr), jnp.where(cbit == 1, pi, si)

    if fused and not spec.uniform_encode:
        raise ValueError("fused sharded engine requires uniform encode")

    # composite permutation of the ring's LOCAL CNOT run (i = 0..local_n-2;
    # the remaining links touch global qubits and keep per-gate handling)
    _kidx = np.arange(local_dim)
    _p = _kidx.copy()
    for _i in range(max(local_n - 1, 0)):
        _c = _i + 1
        _p = _p ^ (((_p >> _c) & 1) << _i)
    _inv_local_ring = np.empty_like(_p)
    _inv_local_ring[_p] = _kidx

    def body_fused(weights, x, diag_local):
        from quanonet_tpu.ops.fused_gates import (
            _apply_group, _apply_hadamard, _group_unitary, _rot2x2,
            qubit_groups,
        )
        from quanonet_tpu.ops.gates import make_perm_apply, z_signs

        my_id = jax.lax.axis_index(axis)
        batch = x.shape[0]
        groups = qubit_groups(local_n) if local_n > 0 else ()
        zs_local = jnp.asarray(z_signs(local_n)) if local_n > 0 else None
        # gather-based VJP: the permutation's transpose is the inverse
        # permutation, not the scatter-add autodiff would emit
        local_ring_apply = make_perm_apply(_inv_local_ring)

        rr, ri = jax.vmap(_rot2x2)(weights)      # (S, n, 2, 2) each

        amp0 = jnp.where(my_id == 0, 1.0, 0.0)
        sr = jnp.zeros((batch, local_dim), jnp.float32).at[:, 0].set(amp0)
        si = jnp.zeros((batch, local_dim), jnp.float32)

        col = 0
        sub = 0
        for n_encode, linear_depth in spec.block_configs:
            # encode — RX gates on distinct wires commute, so reorder:
            # global wires per-gate (1 ppermute each), local wires as
            # H · D(x) · H with the left H deferred into the sublayer
            for i in range(local_n, n):
                sr, si = rx_any(sr, si, i, x[:, col + i], my_id)
            if local_n > 0:
                sr, si = _apply_hadamard(sr, si, groups, local_n)
                phi = 0.5 * (x[:, col:col + local_n] @ zs_local.T)
                dr, di = jnp.cos(phi), -jnp.sin(phi)
                sr, si = dr * sr - di * si, dr * si + di * sr
            pending_h = local_n > 0
            col += n_encode

            for _ in range(linear_depth):
                w = weights[sub]
                # local rotations: one grouped-kron apply per group
                for off, kk in groups:
                    ur, ui = _group_unitary(rr[sub], ri[sub], off, kk,
                                            pending_h)
                    sr, si = _apply_group(sr, si, ur, ui, off, kk,
                                          local_n)
                pending_h = False
                # global rotations per-gate (RZ communication-free)
                for i in range(local_n, n):
                    c0, s0 = jnp.cos(w[0, i] / 2), jnp.sin(w[0, i] / 2)
                    sr, si = ry_any(sr, si, i, c0, s0, my_id)
                    sr, si = rz_any(sr, si, i, w[1, i] / 2, my_id)
                    c2, s2 = jnp.cos(w[2, i] / 2), jnp.sin(w[2, i] / 2)
                    sr, si = ry_any(sr, si, i, c2, s2, my_id)
                if n > 1:
                    if local_n > 1:     # the whole local run in one gather
                        sr, si = local_ring_apply(sr, si)
                    for i in range(max(local_n - 1, 0), n):
                        sr, si = cnot_any(sr, si, (i + 1) % n, i, my_id)
                sub += 1
            if pending_h:               # encoding-only block
                sr, si = _apply_hadamard(sr, si, groups, local_n)

        return measure(sr, si, my_id, diag_local)

    def body(weights, x, diag_local):
        my_id = jax.lax.axis_index(axis)
        batch = x.shape[0]
        # |0...0> lives on device 0's local index 0
        amp0 = jnp.where(my_id == 0, 1.0, 0.0)
        sr = jnp.zeros((batch, local_dim), jnp.float32).at[:, 0].set(amp0)
        si = jnp.zeros((batch, local_dim), jnp.float32)

        col = 0
        sub = 0
        for n_encode, linear_depth in spec.block_configs:
            for j in range(n_encode):
                wire = j % n
                if col < x.shape[1]:
                    sr, si = rx_any(sr, si, wire, x[:, col], my_id)
                col += 1
            for _ in range(linear_depth):
                w = weights[sub]
                for i in range(n):
                    c0, s0 = jnp.cos(w[0, i] / 2), jnp.sin(w[0, i] / 2)
                    sr, si = ry_any(sr, si, i, c0, s0, my_id)
                    sr, si = rz_any(sr, si, i, w[1, i] / 2, my_id)
                    c2, s2 = jnp.cos(w[2, i] / 2), jnp.sin(w[2, i] / 2)
                    sr, si = ry_any(sr, si, i, c2, s2, my_id)
                if n > 1:
                    for i in range(n):
                        sr, si = cnot_any(sr, si, (i + 1) % n, i, my_id)
                sub += 1

        return measure(sr, si, my_id, diag_local)

    sharded = shard_map(
        body_fused if fused else body, mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(),
        check_vma=False)
    return jax.jit(sharded)


def hea_expectation_sharded(spec, weights, x, diag, mesh, axis='amp',
                            fused=False, pauli='Z', offset=0.0, coeff=0.0):
    """One-shot convenience wrapper around make_sharded_hea."""
    f = make_sharded_hea(spec, mesh, axis=axis, fused=fused, pauli=pauli,
                         offset=offset, coeff=coeff)
    if diag is None:
        diag = np.zeros(spec.dim, np.float32)
    return f(jnp.asarray(weights), jnp.asarray(x),
             jnp.asarray(diag, jnp.float32))


def sharded_collective_counts(spec: HEASpec, n_dev: int) -> dict:
    """Analytic ICI-traffic model of one sharded forward pass.

    With k = log2(n_dev) global qubits: per block the encode needs k
    ppermutes (one per global RX; local RXs are the communication-free
    H·D·H path); per sublayer the two global RY rows cost 2k ppermutes
    (global RZ is free — the device's bit is constant across its shard)
    and the ring costs k+1 (the k global-target links plus the wrap link
    control=0 → target=n-1; the local run is one on-shard gather).  The
    measurement adds one psum.  Each ppermute moves the full local shard:
    batch · 2^(n-k) · 2 · 4 bytes.

    Returns {'ppermutes', 'psums', 'bytes_per_sample'} — the numbers the
    scaling table in docs/BENCHMARKS.md reports.
    """
    k = int(math.log2(n_dev))
    if 2 ** k != n_dev:
        raise ValueError("n_dev must be a power of 2")
    if k > spec.n_qubits:
        raise ValueError("more devices than amplitudes")
    pp = 0
    for _, ld in spec.block_configs:
        pp += k                          # encode: global RXs
        per_sub = 2 * k + (k + 1 if spec.n_qubits > 1 and k > 0 else 0)
        pp += ld * per_sub
    shard_bytes = 2 ** (spec.n_qubits - k) * 2 * 4
    return {'ppermutes': pp, 'psums': 1,
            'bytes_per_sample': pp * shard_bytes}
