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

Two interchangeable gate-application strategies:

* ``dense``  (TPU-first default, n_qubits <= ~11): every ansatz sublayer is
  *batch-independent*, so each block's ansatz stack compiles to ONE
  (2^n, 2^n) unitary, differentiable w.r.t. the weights.  The forward pass
  is then ``scan over blocks [per-qubit RX (VPU) -> batched complex matmul
  (MXU)]`` — ~5·linear_depth·n_qubits tiny gate kernels per block collapse
  into one matmul (SURVEY.md §3.2: 2,700 gate applications per forward on
  the reference's hot path).
* ``gates`` (oracle + large-n fallback): literal gate-by-gate application
  mirroring the TorchQuantum loop; O(2^n) per gate instead of O(4^n) per
  block.

Both run under jit/vmap/grad; gradients flow by autodiff through the
statevector (adjoint-equivalent, replacing MindQuantum's C++ adjoint ops).
"""
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from quanonet_tpu.ops.gates import (
    apply_cnot_ring,
    apply_rx_layer,
    apply_single_qubit,
    cnot_ring_inverse_permutation,
    kron_chain,
    ry_matrix,
    z_signs,
)

DENSE_MAX_QUBITS = 11  # beyond this, 4^n block unitaries stop paying off


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


# ── dense path: compile ansatz stacks to block unitaries ────────────────────

def _sublayer_unitary(w, n_qubits):
    """One ansatz sublayer -> (2^n, 2^n) complex64 unitary.

    w: (3, n_qubits) = [RY θ, RZ θ, RY' θ].  U = Ring · (⊗RY') · (⊗RZ) · (⊗RY);
    ⊗RZ is diagonal and the ring is a static row permutation, so the only
    dense products are two real kron chains and one matmul.
    """
    u_ry1 = kron_chain(ry_matrix(w[0]))                  # (D, D) real
    u_ry2 = kron_chain(ry_matrix(w[2]))                  # (D, D) real
    zsgn = jnp.asarray(z_signs(n_qubits))                # (D, n)
    zdiag = jnp.exp(-0.5j * (zsgn @ w[1]))               # (D,) complex
    u = (u_ry2.astype(jnp.complex64)
         @ (zdiag[:, None] * u_ry1.astype(jnp.complex64)))
    inv = jnp.asarray(cnot_ring_inverse_permutation(n_qubits))
    return u[inv, :]


def compile_block_unitaries(spec: HEASpec, weights):
    """weights (S, 3, n) -> (n_blocks, 2^n, 2^n) complex64.

    Sublayer unitaries are built vmapped (uniform small matmuls), then folded
    per block.  Blocks are grouped by linear_depth so the fold is a static
    unrolled chain (trunk/branch groups in practice).
    """
    n = spec.n_qubits
    subs = jax.vmap(lambda w: _sublayer_unitary(w, n))(weights)  # (S, D, D)

    blocks = []
    s = 0
    i = 0
    while i < spec.n_blocks:
        ld = spec.block_configs[i][1]
        j = i
        while j < spec.n_blocks and spec.block_configs[j][1] == ld:
            j += 1
        g = j - i  # group of g consecutive blocks with equal linear_depth
        if ld == 0:  # encoding-only block: identity ansatz
            eye = jnp.eye(spec.dim, dtype=jnp.complex64)
            u = jnp.broadcast_to(eye, (g, spec.dim, spec.dim))
        else:
            group = subs[s:s + g * ld].reshape(g, ld, spec.dim, spec.dim)
            u = group[:, 0]
            for d in range(1, ld):
                u = jnp.einsum('bij,bjk->bik', group[:, d], u)
        blocks.append(u)
        s += g * ld
        i = j
    return jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]


def _forward_dense(spec: HEASpec, weights, x):
    """Final statevector via the compiled block-unitary path.

    x: (batch, n_blocks * n_qubits) encoding angles, block-major.
    """
    n = spec.n_qubits
    batch = x.shape[0]
    block_u = compile_block_unitaries(spec, weights)     # (B, D, D)
    xb = x.reshape(batch, spec.n_blocks, n).transpose(1, 0, 2)  # (B, batch, n)

    state0 = jnp.zeros((batch, spec.dim), dtype=jnp.complex64)
    state0 = state0.at[:, 0].set(1.0)

    def step(state, inp):
        ang, u = inp
        state = apply_rx_layer(state, ang, n)
        state = state @ u.T          # (U ψ)_i = Σ_j U[i,j] ψ_j, batched
        return state, None

    state, _ = jax.lax.scan(step, state0, (xb, block_u))
    return state


# ── gates path: literal per-gate application (oracle / large-n) ─────────────

def _forward_gates(spec: HEASpec, weights, x):
    """Gate-by-gate statevector evolution mirroring the reference loop
    (core/quantum_circuits_tq.py:79-102)."""
    n = spec.n_qubits
    batch = x.shape[0]
    state = jnp.zeros((batch, spec.dim), dtype=jnp.complex64)
    state = state.at[:, 0].set(1.0)

    col = 0
    sub = 0
    for n_encode, linear_depth in spec.block_configs:
        for j in range(n_encode):
            wire = j % n
            if col < x.shape[1]:
                th = x[:, col]
                c = jnp.cos(th / 2.0).astype(jnp.complex64)
                s = (-1j * jnp.sin(th / 2.0)).astype(jnp.complex64)
                mat = jnp.stack(
                    [jnp.stack([c, s], axis=-1),
                     jnp.stack([s, c], axis=-1)], axis=-2)  # (batch, 2, 2)
                state = apply_single_qubit(state, wire, mat, n)
            col += 1
        for _ in range(linear_depth):
            w = weights[sub]  # (3, n)
            ry1 = ry_matrix(w[0]).astype(jnp.complex64)   # (n, 2, 2)
            ry2 = ry_matrix(w[2]).astype(jnp.complex64)
            for i in range(n):
                state = apply_single_qubit(state, i, ry1[i], n)
                half = w[1, i] / 2.0
                rz = jnp.array([[1.0, 0.0], [0.0, 0.0]], jnp.complex64) \
                    * jnp.exp(-1j * half) + \
                    jnp.array([[0.0, 0.0], [0.0, 1.0]], jnp.complex64) \
                    * jnp.exp(1j * half)
                state = apply_single_qubit(state, i, rz, n)
                state = apply_single_qubit(state, i, ry2[i], n)
            state = apply_cnot_ring(state, n)
            sub += 1
    return state


# ── expectation ──────────────────────────────────────────────────────────────

def diag_expectation(state, diag):
    """⟨H⟩ for diagonal H: Σ_k |ψ_k|² d_k.  state (batch, D) -> (batch, 1)."""
    probs = jnp.abs(state) ** 2
    return (probs @ diag.astype(probs.dtype))[:, None]


def pauli_sum_expectation(state, pauli, n_qubits, offset, coeff):
    """⟨offset + coeff·Σ_i P_i⟩ for P ∈ {X, Y} (MS-only ablation,
    reference quantum_circuits_ms.py:28-39)."""
    batch = state.shape[0]
    total = jnp.zeros((batch,), jnp.float32)
    for q in range(n_qubits):
        lo = 2 ** q
        hi = 2 ** (n_qubits - 1 - q)
        s = state.reshape(batch, hi, 2, lo)
        s0, s1 = s[:, :, 0, :], s[:, :, 1, :]
        if pauli == 'X':
            # <X_q> = 2 Re Σ conj(ψ_0) ψ_1 over the q-th bit pairing
            val = 2.0 * jnp.sum(jnp.real(jnp.conj(s0) * s1), axis=(1, 2))
        elif pauli == 'Y':
            # Y|0>=i|1>, Y|1>=-i|0>  ->  <Y_q> = 2 Im Σ conj(ψ_0) ψ_1
            val = 2.0 * jnp.sum(jnp.imag(jnp.conj(s0) * s1), axis=(1, 2))
        else:
            raise ValueError(f"pauli must be X or Y, got {pauli}")
        total = total + val
    return (offset + coeff * total)[:, None]


# ── public API ───────────────────────────────────────────────────────────────

def resolve_engine(engine: str, n_qubits: int) -> str:
    if engine in ('auto', None):
        return 'dense' if n_qubits <= DENSE_MAX_QUBITS else 'gates'
    return engine


def hea_forward_state(spec: HEASpec, weights, x, engine='auto'):
    """Evolve |0…0⟩ through the HEA circuit.  Returns (batch, 2^n) complex64."""
    engine = resolve_engine(engine, spec.n_qubits)
    if engine == 'dense':
        if not spec.uniform_encode:
            raise ValueError("dense engine requires n_encode == n_qubits per block")
        return _forward_dense(spec, weights, x)
    if engine == 'gates':
        return _forward_gates(spec, weights, x)
    if engine == 'pallas':
        from quanonet_tpu.ops.pallas_hea import forward_pallas
        return forward_pallas(spec, weights, x)
    raise ValueError(f"unknown engine '{engine}'")


def hea_expectation(spec: HEASpec, weights, x, diag=None, pauli='Z',
                    offset=0.0, coeff=0.0, engine='auto'):
    """Full circuit + measurement.  Returns (batch, 1) float32.

    diag: (2^n,) diagonal Hamiltonian (includes offset/coeff) when pauli='Z';
    offset/coeff parameterise Σ X_i / Σ Y_i observables otherwise.
    """
    if pauli == 'Z' and resolve_engine(engine, spec.n_qubits) == 'pallas':
        from quanonet_tpu.ops.pallas_hea import hea_expectation_pallas
        return hea_expectation_pallas(spec, weights, x, diag)
    state = hea_forward_state(spec, weights, x, engine=engine)
    if pauli == 'Z':
        if diag is None:
            raise ValueError("Z-basis measurement requires a diagonal")
        return diag_expectation(state, jnp.asarray(diag))
    return pauli_sum_expectation(state, pauli, spec.n_qubits, offset, coeff)


def init_ansatz_weights(key, spec: HEASpec):
    """U(-π, π) init, matching every reference backend
    (quantum_circuits_ms.py:233, quantum_circuits_tq.py:53)."""
    return jax.random.uniform(key, spec.weight_shape(),
                              minval=-np.pi, maxval=np.pi,
                              dtype=jnp.float32)
