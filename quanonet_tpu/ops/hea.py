"""
Hardware-Efficient-Ansatz (HEA) statevector engine — the single JAX engine
that replaces the reference's five quantum backends (SURVEY.md §7).

Circuit semantics (reference core/quantum_circuits_ms.py:164-226 and
core/quantum_circuits_tq.py:65-127): a sequence of *blocks*; each block is

    1. encoding: RX(x_j) on qubit j (data re-uploading),
    2. ``linear_depth`` ansatz sublayers: RY(w0)/RZ(w1)/RY(w2) on every
       qubit, then a CNOT ring with control=(i+1)%n -> target=i.

Trainable weights: (total_sublayers, 3, n_qubits), sublayers in circuit
construction order (trunk blocks first for QuanONet), gate order
[RY, RZ, RY'] — exactly the reference's flat checkpoint layout
(utils/weight_transfer.py:25-32).

ALL arithmetic is split real/imaginary float32: the TPU backend in this
environment has no complex64 lowering at all, and split-real is the
Pallas-native layout anyway (pallas_guide: "no native complex — hand-rolled
(re, im) arithmetic").  A statevector is the pair (sr, si), each
(batch, 2^n) float32; a unitary is (ur, ui), each (2^n, 2^n).

Two interchangeable gate-application strategies:

* ``dense``  (TPU-first default, n_qubits <= ~11): every ansatz sublayer is
  *batch-independent*, so each block's ansatz stack compiles to ONE
  (2^n, 2^n) unitary, differentiable w.r.t. the weights.  The forward pass
  is then ``scan over blocks [per-qubit RX (VPU) -> batched real matmuls
  (MXU)]`` — the ~5·linear_depth·n_qubits tiny gate kernels per block of
  the reference's hot loop (SURVEY.md §3.2: ~2,700 gate applications per
  forward) collapse into 4 MXU matmuls per block.
* ``gates`` (oracle + large-n fallback): literal gate-by-gate application
  mirroring the TorchQuantum loop; O(2^n) per gate instead of O(4^n) per
  block.

Both run under jit/vmap/grad; gradients flow by autodiff through the
statevector (adjoint-equivalent, replacing MindQuantum's C++ adjoint ops).
"""
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from quanonet_tpu.ops.gates import (
    cnot_ring_inverse_permutation,
    hadamard_kron,
    kron_chain,
    make_perm_apply,
    ry_matrix,
    z_signs,
)

DENSE_MAX_QUBITS = 11  # beyond this, 4^n block unitaries stop paying off

# A/B knob for the expectation-dot precision pin (see
# diag_expectation_pair): QON_UNPIN_EXPECT=1 drops that one dot back to
# the backend default (bf16 on TPU) while keeping the quality-critical
# phases pin.  Experiment-only — the shipped default keeps both pins.
import os as _os
_EXPECT_PRECISION = (None if _os.environ.get('QON_UNPIN_EXPECT') == '1'
                     else jax.lax.Precision.HIGHEST)


@dataclass(frozen=True)
class HEASpec:
    """Static circuit description (hashable -> usable as a jit static arg).

    block_configs: ((n_encode, linear_depth), ...) in circuit order —
    trunk blocks then branch blocks for QuanONet
    (reference core/quantum_circuits_tq.py:130-138).
    """
    n_qubits: int
    block_configs: tuple

    @property
    def n_blocks(self) -> int:
        return len(self.block_configs)

    @property
    def total_sublayers(self) -> int:
        return sum(ld for _, ld in self.block_configs)

    @property
    def total_encode(self) -> int:
        return sum(ne for ne, _ in self.block_configs)

    @property
    def dim(self) -> int:
        return 2 ** self.n_qubits

    def weight_shape(self):
        return (self.total_sublayers, 3, self.n_qubits)

    @property
    def uniform_encode(self) -> bool:
        return all(ne == self.n_qubits for ne, _ in self.block_configs)


def make_block_configs(num_qubits, trunk_depth, trunk_linear_depth,
                       branch_depth, branch_linear_depth):
    """QuanONet layout: trunk blocks first, then branch blocks
    (reference core/quantum_circuits_tq.py:130-138)."""
    cfg = [(num_qubits, trunk_linear_depth)] * trunk_depth
    cfg += [(num_qubits, branch_linear_depth)] * branch_depth
    return tuple(cfg)


def quanonet_spec(num_qubits, net_size) -> HEASpec:
    """net_size = (branch_depth, branch_ld, trunk_depth, trunk_ld)."""
    bd, bld, td, tld = net_size
    return HEASpec(num_qubits, make_block_configs(num_qubits, td, tld, bd, bld))


def heaqnn_spec(num_qubits, net_size) -> HEASpec:
    """net_size[:2] = (depth, linear_depth)
    (reference core/quantum_circuits_tq.py:178-202)."""
    depth, ld = int(net_size[0]), int(net_size[1])
    return HEASpec(num_qubits, tuple([(num_qubits, ld)] * depth))


# ── split-real primitives ─────────────────────────────────────────────────────

def _init_state(batch, dim):
    sr = jnp.zeros((batch, dim), jnp.float32).at[:, 0].set(1.0)
    si = jnp.zeros((batch, dim), jnp.float32)
    return sr, si


def _apply_ry(sr, si, q, c, s, n_qubits):
    """RY = [[c, -s], [s, c]] (real) on qubit q; c/s scalars or (batch,)."""
    batch = sr.shape[0]
    lo = 2 ** q
    hi = 2 ** (n_qubits - 1 - q)
    if jnp.ndim(c) > 0:
        c = c[:, None, None]
        s = s[:, None, None]

    def rot(a):
        a = a.reshape(batch, hi, 2, lo)
        a0, a1 = a[:, :, 0, :], a[:, :, 1, :]
        return jnp.stack([c * a0 - s * a1, s * a0 + c * a1],
                         axis=2).reshape(batch, -1)

    return rot(sr), rot(si)


def _apply_rz(sr, si, q, half, n_qubits):
    """RZ = diag(e^{-iθ/2}, e^{+iθ/2}) on qubit q; half = θ/2."""
    batch = sr.shape[0]
    lo = 2 ** q
    hi = 2 ** (n_qubits - 1 - q)
    c = jnp.cos(half)
    s = jnp.sin(half)
    r = sr.reshape(batch, hi, 2, lo)
    i = si.reshape(batch, hi, 2, lo)
    r0, r1 = r[:, :, 0, :], r[:, :, 1, :]
    i0, i1 = i[:, :, 0, :], i[:, :, 1, :]
    # e^{-iθ/2}(r0+i i0) ; e^{+iθ/2}(r1+i i1)
    n0r = c * r0 + s * i0
    n0i = c * i0 - s * r0
    n1r = c * r1 - s * i1
    n1i = c * i1 + s * r1
    sr = jnp.stack([n0r, n1r], axis=2).reshape(batch, -1)
    si = jnp.stack([n0i, n1i], axis=2).reshape(batch, -1)
    return sr, si


def _apply_ring(sr, si, n_qubits):
    if n_qubits <= 1:
        return sr, si
    return make_perm_apply(cnot_ring_inverse_permutation(n_qubits))(sr, si)


# ── dense path: compile ansatz stacks to block unitaries ────────────────────

def _sublayer_unitary(w, n_qubits):
    """One ansatz sublayer -> (ur, ui), each (2^n, 2^n) float32.

    w: (3, n_qubits) = [RY θ, RZ θ, RY' θ].  U = Ring · (⊗RY') · (⊗RZ) · (⊗RY);
    ⊗RZ is diagonal and the ring is a static row permutation, so the dense
    work is two real kron chains and two real matmuls.
    """
    u_ry1 = kron_chain(ry_matrix(w[0]))                  # (D, D) real
    u_ry2 = kron_chain(ry_matrix(w[2]))                  # (D, D) real
    zsgn = jnp.asarray(z_signs(n_qubits))                # (D, n)
    phase = 0.5 * (zsgn @ w[1])                          # (D,)
    zr = jnp.cos(phase)                                  # Re e^{-i phase}
    zi = -jnp.sin(phase)                                 # Im e^{-i phase}
    mr = zr[:, None] * u_ry1
    mi = zi[:, None] * u_ry1
    ur = u_ry2 @ mr
    ui = u_ry2 @ mi
    # gather-based VJP: the row permutation's transpose is the inverse
    # permutation gather, not the scatter-add autodiff would emit
    # (ops/gates.make_perm_apply)
    ring_rows = make_perm_apply(cnot_ring_inverse_permutation(n_qubits),
                                axis=-2)
    return ring_rows(ur, ui)


def compile_block_unitaries(spec: HEASpec, weights):
    """weights (S, 3, n) -> (Ur, Ui), each (n_blocks, 2^n, 2^n) float32.

    Sublayer unitaries are built vmapped (uniform small matmuls), then folded
    per block.  Blocks are grouped by linear_depth so the fold is a static
    unrolled chain (trunk/branch groups in practice).
    """
    n = spec.n_qubits
    sub_r, sub_i = jax.vmap(lambda w: _sublayer_unitary(w, n))(weights)

    blocks_r, blocks_i = [], []
    s = 0
    i = 0
    while i < spec.n_blocks:
        ld = spec.block_configs[i][1]
        j = i
        while j < spec.n_blocks and spec.block_configs[j][1] == ld:
            j += 1
        g = j - i  # group of g consecutive blocks with equal linear_depth
        if ld == 0:  # encoding-only block: identity ansatz
            eye = jnp.eye(spec.dim, dtype=jnp.float32)
            ur = jnp.broadcast_to(eye, (g, spec.dim, spec.dim))
            ui = jnp.zeros((g, spec.dim, spec.dim), jnp.float32)
        else:
            gr = sub_r[s:s + g * ld].reshape(g, ld, spec.dim, spec.dim)
            gi = sub_i[s:s + g * ld].reshape(g, ld, spec.dim, spec.dim)
            ur, ui = gr[:, 0], gi[:, 0]
            for d in range(1, ld):
                ar, ai = gr[:, d], gi[:, d]
                # (A)(U): complex product, batched over the group axis
                new_r = jnp.einsum('bij,bjk->bik', ar, ur) \
                    - jnp.einsum('bij,bjk->bik', ai, ui)
                new_i = jnp.einsum('bij,bjk->bik', ar, ui) \
                    + jnp.einsum('bij,bjk->bik', ai, ur)
                ur, ui = new_r, new_i
        blocks_r.append(ur)
        blocks_i.append(ui)
        s += g * ld
        i = j
    if len(blocks_r) > 1:
        return jnp.concatenate(blocks_r, 0), jnp.concatenate(blocks_i, 0)
    return blocks_r[0], blocks_i[0]


def _forward_dense(spec: HEASpec, weights, x, unroll=8):
    """Final statevector (sr, si) via the compiled block-unitary path,
    in the Hadamard-diagonal formulation.

    Since RX(θ) = H RZ(θ) H, each encoding layer is
    ⊗RX(x_b) = H^{⊗n} D(x_b) H^{⊗n} with DIAGONAL
    D(x_b)_k = exp(-i/2 Σ_i zsign[k,i] x_{b,i}).  Folding the Hadamards
    into the (batch-independent) block unitaries, the circuit becomes

        ψ = M_B D(x_B) M_{B-1} ... M_1 D(x_1) s0,
        M_b = H U_b H (b < B),  M_B = U_B H,  s0 = H|0…0⟩ = uniform,

    so ALL per-sample phases are ONE (B·batch, n)x(n, 2^n) matmul hoisted
    out of the block scan, and the scan body is just a complex diagonal
    multiply + one Karatsuba complex matmul (3 real MXU matmuls).

    x: (batch, n_blocks * n_qubits) encoding angles, block-major.
    """
    n = spec.n_qubits
    batch = x.shape[0]
    dim = spec.dim
    nb = spec.n_blocks

    ur, ui = compile_block_unitaries(spec, weights)      # (B, D, D)
    hk = jnp.asarray(hadamard_kron(n))
    # M_b = H @ U_b @ H, except the last block keeps its left side bare
    uh_r = ur @ hk                                       # (B, D, D)
    uh_i = ui @ hk
    m_r = jnp.concatenate([hk @ uh_r[:-1], uh_r[-1:]], axis=0)
    m_i = jnp.concatenate([hk @ uh_i[:-1], uh_i[-1:]], axis=0)
    # pre-transpose for S @ M.T, pre-add for Karatsuba
    mt_r = m_r.transpose(0, 2, 1)
    mt_i = m_i.transpose(0, 2, 1)
    mt_sum = mt_r + mt_i

    # all encoding phases in one hoisted matmul.  PRECISION PIN: bf16
    # rounding of this K=n dot random-walks ~0.4%/block phase error
    # over the chain into ~2% output error (the bulk of the measured
    # bf16 quality gap); at K<=n the 6-pass cost is negligible.
    zsgn = jnp.asarray(z_signs(n))                       # (D, n)
    xb = x.reshape(batch, nb, n).transpose(1, 0, 2)      # (B, batch, n)
    phi = 0.5 * jnp.einsum('bxn,dn->bxd', xb, zsgn,
                           precision=jax.lax.Precision.HIGHEST)
    dr = jnp.cos(phi)
    di = -jnp.sin(phi)

    inv_sqrt = 1.0 / np.sqrt(dim)
    sr = dr[0] * inv_sqrt                                # D(x_1) · H|0>
    si = di[0] * inv_sqrt

    def step(state, inp):
        sr, si = state
        tr, ti, tsum, pr, pi = inp
        # s <- M_b s  (Karatsuba: 3 real matmuls)
        t1 = sr @ tr
        t2 = si @ ti
        t3 = (sr + si) @ tsum
        sr, si = t1 - t2, t3 - t1 - t2
        # s <- D(x_{b+1}) ⊙ s
        nr = pr * sr - pi * si
        ni = pr * si + pi * sr
        return (nr, ni), None

    if nb > 1:
        (sr, si), _ = jax.lax.scan(
            step, (sr, si),
            (mt_r[:-1], mt_i[:-1], mt_sum[:-1], dr[1:], di[1:]),
            unroll=min(unroll, nb - 1))
    # final block matmul
    t1 = sr @ mt_r[-1]
    t2 = si @ mt_i[-1]
    t3 = (sr + si) @ mt_sum[-1]
    return t1 - t2, t3 - t1 - t2


# ── gates path: literal per-gate application (oracle / large-n) ─────────────

def _forward_gates(spec: HEASpec, weights, x):
    """Gate-by-gate statevector evolution mirroring the reference loop
    (core/quantum_circuits_tq.py:79-102)."""
    n = spec.n_qubits
    batch = x.shape[0]
    sr, si = _init_state(batch, spec.dim)

    col = 0
    sub = 0
    for n_encode, linear_depth in spec.block_configs:
        # encoding: RX(x_col) on wire j%n (quantum_circuits_tq.py:79-86)
        for j in range(n_encode):
            wire = j % n
            if col < x.shape[1]:
                sr, si = _rx_single(sr, si, wire, x[:, col], n)
            col += 1
        for _ in range(linear_depth):
            w = weights[sub]  # (3, n)
            for i in range(n):
                c0, s0 = jnp.cos(w[0, i] / 2), jnp.sin(w[0, i] / 2)
                sr, si = _apply_ry(sr, si, i, c0, s0, n)
                sr, si = _apply_rz(sr, si, i, w[1, i] / 2, n)
                c2, s2 = jnp.cos(w[2, i] / 2), jnp.sin(w[2, i] / 2)
                sr, si = _apply_ry(sr, si, i, c2, s2, n)
            sr, si = _apply_ring(sr, si, n)
            sub += 1
    return sr, si


def _rx_single(sr, si, q, theta, n_qubits):
    """RX(θ) on one qubit with per-sample θ (batch,)."""
    batch = sr.shape[0]
    half = theta / 2.0
    c = jnp.cos(half)[:, None, None]
    s = jnp.sin(half)[:, None, None]
    lo = 2 ** q
    hi = 2 ** (n_qubits - 1 - q)
    r = sr.reshape(batch, hi, 2, lo)
    i = si.reshape(batch, hi, 2, lo)
    r0, r1 = r[:, :, 0, :], r[:, :, 1, :]
    i0, i1 = i[:, :, 0, :], i[:, :, 1, :]
    n0r = c * r0 + s * i1
    n0i = c * i0 - s * r1
    n1r = s * i0 + c * r1
    n1i = -s * r0 + c * i1
    sr = jnp.stack([n0r, n1r], axis=2).reshape(batch, -1)
    si = jnp.stack([n0i, n1i], axis=2).reshape(batch, -1)
    return sr, si


# ── expectation ──────────────────────────────────────────────────────────────

def diag_expectation_pair(sr, si, diag):
    """⟨H⟩ for diagonal H: Σ_k |ψ_k|² d_k -> (batch, 1).

    PRECISION PIN: this K=2^n reduction is the model OUTPUT; bf16
    rounding here puts ~0.3% noise directly on every prediction (and on
    every loss gradient).  One tiny matvec per batch — pin it."""
    probs = sr * sr + si * si
    return jnp.einsum('bd,d->b', probs, diag.astype(probs.dtype),
                      precision=_EXPECT_PRECISION)[:, None]


def pauli_sum_total(sr, si, pauli, n_qubits):
    """Raw Σ_q ⟨P_q⟩ for P ∈ {X, Y} -> (batch,).  The ONE home of the
    per-qubit pair formula — also reused for the LOCAL qubits of the
    amplitude-sharded engine (parallel/amplitude.py), so the sharded
    observable can never drift from the single-device one."""
    batch = sr.shape[0]
    total = jnp.zeros((batch,), jnp.float32)
    for q in range(n_qubits):
        lo = 2 ** q
        hi = 2 ** (n_qubits - 1 - q)
        r = sr.reshape(batch, hi, 2, lo)
        i = si.reshape(batch, hi, 2, lo)
        r0, r1 = r[:, :, 0, :], r[:, :, 1, :]
        i0, i1 = i[:, :, 0, :], i[:, :, 1, :]
        if pauli == 'X':
            # <X_q> = 2 Re Σ conj(ψ_0) ψ_1
            val = 2.0 * jnp.sum(r0 * r1 + i0 * i1, axis=(1, 2))
        elif pauli == 'Y':
            # <Y_q> = 2 Im Σ conj(ψ_0) ψ_1
            val = 2.0 * jnp.sum(r0 * i1 - i0 * r1, axis=(1, 2))
        else:
            raise ValueError(f"pauli must be X or Y, got {pauli}")
        total = total + val
    return total


def pauli_sum_expectation_pair(sr, si, pauli, n_qubits, offset, coeff):
    """⟨offset + coeff·Σ_i P_i⟩ for P ∈ {X, Y} (MS-only ablation,
    reference quantum_circuits_ms.py:28-39)."""
    total = pauli_sum_total(sr, si, pauli, n_qubits)
    return (offset + coeff * total)[:, None]


# ── public API ───────────────────────────────────────────────────────────────

FUSED_MIN_QUBITS = 8  # auto switches to the grouped-kron path here:
#                       measured Q10 train (Net40-2-20-2, bs=100, v5e):
#                       fused 10,820 vs dense 1,059 samples/s — the dense
#                       block-unitary fold is O(8^n) per step; the Pallas
#                       chain's VMEM block matrices are 2·nb·4^n floats
#                       (31 MiB at Q8), past the comfortable scoped limit.


ENGINES = ('dense', 'gates', 'fused', 'pallas', 'embed', 'pfused')

# Mesh-sharded engines (parallel/shard_engine.py): never auto-selected;
# chosen via Solver --shard amp|pipe, which installs the mesh context.
SHARDED_ENGINES = ('amp', 'pipe')


def resolve_engine(engine: str, n_qubits: int) -> str:
    if engine in ('auto', None):
        if n_qubits >= FUSED_MIN_QUBITS:
            # VMEM fused-group chain kernel on TPU where it applies
            # (measured 3.7x/1.9x the XLA fused path at Q8/Q10); XLA
            # grouped-kron elsewhere.  forward_pfused itself falls back
            # to forward_fused for non-uniform specs.
            from quanonet_tpu.ops.pallas_fused import AUTO_MAX_QUBITS
            if (n_qubits <= AUTO_MAX_QUBITS
                    and jax.default_backend() == 'tpu'):
                return 'pfused'
            return 'fused'   # grouped-kron MXU path (ops/fused_gates.py)
        # fused Pallas chain on TPU (falls back to dense beyond its VMEM
        # budget); interpret-mode Pallas is slow on CPU, use dense there
        return 'pallas' if jax.default_backend() == 'tpu' else 'dense'
    if engine not in ENGINES + SHARDED_ENGINES:
        raise ValueError(f"unknown engine '{engine}' (choose from "
                         f"{('auto',) + ENGINES + SHARDED_ENGINES})")
    return engine


def resolve_inference_engine(engine, n_qubits: int) -> str:
    """Engine choice for NO-GRAD callers (infer.py / serve.py).

    Identical to :func:`resolve_engine` except Q15-16 prefer the pfused
    VMEM-chain forward — measured 4.9x/8.6x the fused forward there
    (round 5, docs/qubit_scaling.json; Q16 at 36.8% MFU) — which cannot
    train (its residual-saving backward exceeds scoped VMEM above
    TRAIN_MAX_QUBITS) and is therefore never auto-selected on the
    differentiable path."""
    if engine in ('auto', None) and jax.default_backend() == 'tpu':
        from quanonet_tpu.ops.pallas_fused import (
            MAX_QUBITS, TRAIN_MAX_QUBITS,
        )
        if TRAIN_MAX_QUBITS < n_qubits <= MAX_QUBITS:
            return 'pfused'
    return resolve_engine(engine, n_qubits)


def hea_forward_pair(spec: HEASpec, weights, x, engine='auto'):
    """Evolve |0…0⟩; returns (sr, si) each (batch, 2^n) float32."""
    engine = resolve_engine(engine, spec.n_qubits)
    if engine in SHARDED_ENGINES:
        raise ValueError(
            f"engine '{engine}' computes expectations only (the state "
            f"is sharded across the mesh and never materialized); use "
            f"hea_expectation, or a single-device engine for the state")
    if engine == 'dense':
        if not spec.uniform_encode:
            raise ValueError(
                "dense engine requires n_encode == n_qubits per block")
        return _forward_dense(spec, weights, x)
    if engine == 'gates':
        return _forward_gates(spec, weights, x)
    if engine == 'fused':
        from quanonet_tpu.ops.fused_gates import forward_fused
        return forward_fused(spec, weights, x)
    if engine == 'pallas':
        from quanonet_tpu.ops.pallas_hea import forward_pallas
        return forward_pallas(spec, weights, x)
    if engine == 'embed':
        from quanonet_tpu.ops.pallas_embed import forward_embed
        return forward_embed(spec, weights, x)
    if engine == 'pfused':
        from quanonet_tpu.ops.pallas_fused import forward_pfused
        return forward_pfused(spec, weights, x)
    raise ValueError(f"unknown engine '{engine}'")


def hea_forward_state(spec: HEASpec, weights, x, engine='auto'):
    """Complex statevector (batch, 2^n) complex64.  Test/analysis helper —
    complex dtypes do not lower on this TPU backend; use hea_expectation
    or hea_forward_pair on device."""
    sr, si = hea_forward_pair(spec, weights, x, engine=engine)
    return sr + 1j * si


def hea_expectation(spec: HEASpec, weights, x, diag=None, pauli='Z',
                    offset=0.0, coeff=0.0, engine='auto'):
    """Full circuit + measurement.  Returns (batch, 1) float32.

    diag: (2^n,) diagonal Hamiltonian (includes offset/coeff) when pauli='Z';
    offset/coeff parameterise Σ X_i / Σ Y_i observables otherwise.
    """
    resolved = resolve_engine(engine, spec.n_qubits)
    if resolved in SHARDED_ENGINES:
        if pauli == 'Z' and diag is None:
            raise ValueError("Z-basis measurement requires a diagonal")
        from quanonet_tpu.parallel.shard_engine import sharded_expectation
        return sharded_expectation(spec, weights, x, diag, pauli=pauli,
                                   offset=offset, coeff=coeff)
    if pauli == 'Z' and resolved == 'pallas':
        from quanonet_tpu.ops.pallas_hea import hea_expectation_pallas
        return hea_expectation_pallas(spec, weights, x, diag)
    if pauli == 'Z' and resolved == 'embed':
        from quanonet_tpu.ops.pallas_embed import hea_expectation_embed
        return hea_expectation_embed(spec, weights, x, diag)
    sr, si = hea_forward_pair(spec, weights, x, engine=engine)
    if pauli == 'Z':
        if diag is None:
            raise ValueError("Z-basis measurement requires a diagonal")
        return diag_expectation_pair(sr, si, jnp.asarray(diag))
    return pauli_sum_expectation_pair(sr, si, pauli, spec.n_qubits,
                                      offset, coeff)


def init_ansatz_weights(key, spec: HEASpec):
    """U(-π, π) init, matching every reference backend
    (quantum_circuits_ms.py:233, quantum_circuits_tq.py:53)."""
    return jax.random.uniform(key, spec.weight_shape(),
                              minval=-np.pi, maxval=np.pi,
                              dtype=jnp.float32)
