"""
Statevector engine tests: analytic 1-2 qubit cases, dense-vs-gates
consistency (replacing the reference's cross-backend checks,
compare_backends.py:26-31: forward <=1e-4, grads <=1e-4), and autodiff
gradient checks against finite differences.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanonet_tpu.ops.gates import (
    cnot_ring_permutation, kron_chain, ry_matrix, z_signs,
)
from quanonet_tpu.ops.hamiltonian import (
    resolve_ham_diag, simple_ham_diag, simple_ham_params,
    walsh_hadamard_coeffs, zero_state_ham_diag,
)
from quanonet_tpu.ops.hea import (
    HEASpec, hea_expectation, hea_forward_state, heaqnn_spec, quanonet_spec,
)


def _rand_weights(spec, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(
        rng.uniform(-np.pi, np.pi, spec.weight_shape()).astype(np.float32))


def _rand_x(spec, batch, seed=1):
    rng = np.random.RandomState(seed)
    return jnp.asarray(
        rng.uniform(-2, 2, (batch, spec.total_encode)).astype(np.float32))


# ── analytic cases ────────────────────────────────────────────────────────────

def test_rx_encoding_z_expectation():
    # RX(θ)|0> -> <Z> = cos θ  (checks rotation sign convention e^{-iθX/2})
    spec = HEASpec(1, ((1, 0),))
    w = jnp.zeros(spec.weight_shape())
    thetas = np.linspace(-3, 3, 7).astype(np.float32)
    x = jnp.asarray(thetas)[:, None]
    diag = jnp.asarray([1.0, -1.0])  # Z
    for engine in ('dense', 'gates'):
        out = hea_expectation(spec, w, x, diag=diag, engine=engine)
        np.testing.assert_allclose(np.ravel(out), np.cos(thetas), atol=1e-6)


def test_ry_ansatz_z_expectation():
    # RY(θ)|0> -> <Z> = cos θ via the first ansatz angle
    spec = HEASpec(1, ((1, 1),))
    theta = 0.7
    w = jnp.asarray(np.array([[[theta], [0.0], [0.0]]], np.float32))
    x = jnp.zeros((1, 1))
    diag = jnp.asarray([1.0, -1.0])
    for engine in ('dense', 'gates'):
        out = hea_expectation(spec, w, x, diag=diag, engine=engine)
        np.testing.assert_allclose(float(out[0, 0]), np.cos(theta), atol=1e-6)


def test_little_endian_layout():
    # RX(π) on qubit 0 only -> amplitude at index 1 (bit 0 set), not index 2.
    spec = HEASpec(2, ((2, 0),))
    w = jnp.zeros(spec.weight_shape())
    x = jnp.asarray([[np.pi, 0.0]], np.float32)
    state = hea_forward_state(spec, w, x, engine='gates')
    probs = np.abs(np.asarray(state[0])) ** 2
    np.testing.assert_allclose(probs, [0, 1, 0, 0], atol=1e-12)


def test_cnot_ring_direction():
    # Reference ring: CNOT(control=(i+1)%n, target=i) for i=0..n-1 applied in
    # order (quantum_circuits_ms.py:137-144).  For n=2 starting at |q1q0>=|01>
    # (index 1): i=0 control q1=0 no-op; i=1 control q0=1 flips q1 -> index 3.
    perm = cnot_ring_permutation(2)
    assert perm[1] == 3
    # and |10> (index 2): i=0 control q1=1 flips q0 -> |11> (3); i=1 control
    # q0=1 flips q1 -> |01> (1).
    assert perm[2] == 1
    assert perm[0] == 0


def test_zero_weight_sublayer_is_ring_only():
    spec = HEASpec(3, ((3, 1),))
    w = jnp.zeros(spec.weight_shape())
    x = jnp.asarray([[np.pi, 0.0, 0.0]], np.float32)  # |001> = index 1
    state = hea_forward_state(spec, w, x, engine='dense')
    perm = cnot_ring_permutation(3)
    probs = np.abs(np.asarray(state[0])) ** 2
    expected = np.zeros(8)
    expected[perm[1]] = 1.0
    np.testing.assert_allclose(probs, expected, atol=1e-12)


def test_kron_chain_ordering():
    # kron_chain must place qubit 0 as the fastest-varying index.
    mats = np.zeros((2, 2, 2), np.float32)
    mats[0] = [[0, 1], [1, 0]]  # X on qubit 0
    mats[1] = np.eye(2)
    u = np.asarray(kron_chain(jnp.asarray(mats)))
    # X_0 swaps index 0<->1 and 2<->3
    expected = np.array([[0, 1, 0, 0], [1, 0, 0, 0],
                         [0, 0, 0, 1], [0, 0, 1, 0]], np.float32)
    np.testing.assert_array_equal(u, expected)


# ── dense vs gates cross-validation ──────────────────────────────────────────

@pytest.mark.parametrize("nq,net", [
    (2, (5, 1, 5, 1)),     # shipped Antideriv architecture
    (3, (4, 2, 3, 2)),
    (5, (4, 2, 2, 2)),
    (6, (2, 3, 2, 1)),
])
def test_dense_matches_gates_forward(nq, net):
    spec = quanonet_spec(nq, net)
    w = _rand_weights(spec)
    x = _rand_x(spec, batch=4)
    diag = jnp.asarray(simple_ham_diag(nq, -5, 5))
    out_d = hea_expectation(spec, w, x, diag=diag, engine='dense')
    out_g = hea_expectation(spec, w, x, diag=diag, engine='gates')
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_g),
                               atol=1e-4)
    state_d = hea_forward_state(spec, w, x, engine='dense')
    state_g = hea_forward_state(spec, w, x, engine='gates')
    np.testing.assert_allclose(np.asarray(state_d), np.asarray(state_g),
                               atol=1e-5)


def test_dense_matches_gates_grad():
    spec = quanonet_spec(3, (3, 2, 2, 1))
    w = _rand_weights(spec)
    x = _rand_x(spec, batch=3)
    diag = jnp.asarray(simple_ham_diag(3, -5, 5))

    def loss(weights, engine):
        return jnp.sum(hea_expectation(spec, weights, x, diag=diag,
                                       engine=engine) ** 2)

    g_d = jax.grad(lambda w_: loss(w_, 'dense'))(w)
    g_g = jax.grad(lambda w_: loss(w_, 'gates'))(w)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_g), atol=1e-4)


def test_grad_matches_finite_difference():
    spec = heaqnn_spec(2, (2, 1))
    w = _rand_weights(spec)
    x = _rand_x(spec, batch=2)
    diag = jnp.asarray(simple_ham_diag(2, -5, 5))

    def loss(weights):
        return jnp.sum(hea_expectation(spec, weights, x, diag=diag,
                                       engine='dense'))

    g = np.asarray(jax.grad(loss)(w))
    eps = 1e-3
    wf = np.asarray(w)
    for idx in [(0, 0, 0), (1, 1, 1), (0, 2, 1)]:
        wp, wm = wf.copy(), wf.copy()
        wp[idx] += eps
        wm[idx] -= eps
        fd = (float(loss(jnp.asarray(wp))) - float(loss(jnp.asarray(wm)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, atol=2e-2, rtol=1e-2)


def test_pauli_xy_expectation():
    # RY(π/2)|0> = (|0>+|1>)/√2 -> <X> = 1; RX(-π/2)|0> -> <Y> = 1.
    spec = HEASpec(1, ((1, 1),))
    w = jnp.asarray(np.array([[[np.pi / 2], [0.0], [0.0]]], np.float32))
    x = jnp.zeros((1, 1))
    out = hea_expectation(spec, w, x, pauli='X', offset=0.0, coeff=1.0)
    np.testing.assert_allclose(float(out[0, 0]), 1.0, atol=1e-6)

    spec2 = HEASpec(1, ((1, 0),))
    w2 = jnp.zeros(spec2.weight_shape())
    x2 = jnp.asarray([[-np.pi / 2]], np.float32)
    out2 = hea_expectation(spec2, w2, x2, pauli='Y', offset=0.0, coeff=1.0)
    np.testing.assert_allclose(float(out2[0, 0]), 1.0, atol=1e-6)


# ── Hamiltonian constructors ──────────────────────────────────────────────────

def test_simple_ham_params():
    # offset=(lb+ub)/2, coeff=(ub-lb)/(2n)  (quantum_circuits_tq.py:141-146)
    off, c = simple_ham_params(5, -5, 5)
    assert off == 0.0 and c == 1.0
    off, c = simple_ham_params(2)  # default bounds (-n, n)
    assert off == 0.0 and c == 1.0


def test_simple_ham_diag_values():
    d = simple_ham_diag(2, -5, 5)
    # zsum per state |q1q0>: |00>=2, |01>=0, |10>=0, |11>=-2; coeff=2.5
    np.testing.assert_allclose(d, [5.0, 0.0, 0.0, -5.0])


def test_zero_state_ham_diag():
    d = zero_state_ham_diag(2, 0, 1)
    np.testing.assert_allclose(d, [1, 0, 0, 0])


def test_walsh_hadamard_roundtrip():
    rng = np.random.RandomState(3)
    diag = rng.randn(8).astype(np.float64)
    coeffs = walsh_hadamard_coeffs(diag, 3)
    # Reconstruct: diag_k = Σ_idx coeffs[idx] * Π_{i in idx} (-1)^{bit_i(k)}
    zs = z_signs(3)
    recon = np.zeros(8)
    for idx in range(8):
        term = np.ones(8)
        for q in range(3):
            if (idx >> q) & 1:
                term = term * zs[:, q]
        recon += coeffs[idx] * term
    np.testing.assert_allclose(recon, diag, atol=1e-10)


def test_resolve_ham_diag_precedence():
    d = resolve_ham_diag(2, ham_bound=[-5, 5], ham_diag=[1, 2, 3, 4])
    np.testing.assert_allclose(d, [1, 2, 3, 4])
    d = resolve_ham_diag(2, ham_bound=[-1, 1])
    np.testing.assert_allclose(d, simple_ham_diag(2, -1, 1))


def test_jit_and_vmap_compose():
    spec = quanonet_spec(3, (2, 1, 2, 1))
    w = _rand_weights(spec)
    x = _rand_x(spec, batch=5)
    diag = jnp.asarray(simple_ham_diag(3, -5, 5))
    f = jax.jit(lambda w_, x_: hea_expectation(spec, w_, x_, diag=diag,
                                               engine='dense'))
    out = f(w, x)
    assert out.shape == (5, 1)
    # vmap over a leading seed axis of weights
    ws = jnp.stack([w, w + 0.1])
    outs = jax.vmap(lambda w_: f(w_, x))(ws)
    assert outs.shape == (2, 5, 1)
