"""
Cross-framework oracle: an independent TORCH implementation of the HEA
circuit (complex tensors, textbook gate definitions, torch.kron
composition — sharing NO code or numeric conventions with
quanonet_tpu.ops) must agree with the JAX engine on BOTH the forward
expectation value and its GRADIENTS via torch autograd vs jax.grad.

This plays the role of the reference's compare_backends.py
(/root/reference/compare_backends.py:140-637), which cross-checked
genuinely independent implementations (MindQuantum vs TorchQuantum vs
Qiskit): torch is the one independent autodiff framework baked into
this image.  The NumPy oracle (test_independent_oracle.py) checks
forward values only; finite differences (test_engine.py) check grads at
a few points — torch autograd checks the full analytic gradient of
every parameter at machine precision of the f64 oracle.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from quanonet_tpu.ops.hamiltonian import simple_ham_diag
from quanonet_tpu.ops.hea import hea_expectation, quanonet_spec

C128 = torch.complex128


def _c(x):
    return x.to(C128)


def t_rx(t):
    c, s = _c(torch.cos(t / 2)), _c(torch.sin(t / 2))
    i = torch.tensor(1j, dtype=C128)
    return torch.stack([torch.stack([c, -i * s]),
                        torch.stack([-i * s, c])])


def t_ry(t):
    c, s = _c(torch.cos(t / 2)), _c(torch.sin(t / 2))
    return torch.stack([torch.stack([c, -s]), torch.stack([s, c])])


def t_rz(t):
    i = torch.tensor(1j, dtype=C128)
    zero = torch.zeros((), dtype=C128)
    return torch.stack([
        torch.stack([torch.exp(-i * _c(t) / 2), zero]),
        torch.stack([zero, torch.exp(i * _c(t) / 2)])])


def t_op_on(gate, qubit, n):
    """Embed a 1-qubit gate on `qubit` (little-endian, matching the
    NumPy oracle's convention)."""
    eye = torch.eye(2, dtype=C128)
    u = gate if qubit == n - 1 else eye
    for q in range(n - 2, -1, -1):
        u = torch.kron(u, gate if q == qubit else eye)
    return u


def t_cnot(control, target, n):
    dim = 2 ** n
    u = torch.zeros((dim, dim), dtype=C128)
    for k in range(dim):
        j = k ^ (1 << target) if (k >> control) & 1 else k
        u[j, k] = 1.0
    return u


def torch_quanonet_exp(n, net_size, weights, x_row, diag):
    """One sample through the reference circuit structure (trunk blocks
    then branch blocks; per block RX encode row, then linear_depth x
    [RY, RZ, RY', CNOT ring]), returning <H> = sum |psi|^2 * diag."""
    bd, bld, td, tld = net_size
    psi = torch.zeros(2 ** n, dtype=C128)
    psi[0] = 1.0
    col = 0
    sub = 0
    cnots = [t_cnot((i + 1) % n, i, n) for i in range(n)]
    for depth, ld in ((td, tld), (bd, bld)):
        for _ in range(depth):
            for q in range(n):
                psi = t_op_on(t_rx(x_row[col]), q, n) @ psi
                col += 1
            for _ in range(ld):
                w = weights[sub]
                for q in range(n):
                    psi = t_op_on(t_ry(w[0, q]), q, n) @ psi
                for q in range(n):
                    psi = t_op_on(t_rz(w[1, q]), q, n) @ psi
                for q in range(n):
                    psi = t_op_on(t_ry(w[2, q]), q, n) @ psi
                for u in cnots:
                    psi = u @ psi
                sub += 1
    probs = (psi.conj() * psi).real
    return probs @ diag


@pytest.mark.parametrize("n,net", [(2, (2, 1, 2, 1)), (3, (2, 2, 1, 1))])
def test_forward_matches_torch(n, net):
    rng = np.random.RandomState(11)
    spec = quanonet_spec(n, net)
    weights = rng.uniform(-np.pi, np.pi,
                          spec.weight_shape()).astype(np.float32)
    x = rng.uniform(-2, 2, (3, spec.total_encode)).astype(np.float32)
    diag = simple_ham_diag(n, -5, 5)

    w_t = torch.tensor(weights, dtype=torch.float64)
    d_t = torch.tensor(np.asarray(diag), dtype=torch.float64)
    want = np.asarray([
        torch_quanonet_exp(n, net, w_t,
                           torch.tensor(x[b], dtype=torch.float64),
                           d_t).item()
        for b in range(3)])[:, None]

    for engine in ('dense', 'gates'):
        got = np.asarray(hea_expectation(spec, weights, x, diag=diag,
                                         engine=engine))
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"engine={engine}")


@pytest.mark.parametrize("n,net", [(2, (2, 1, 2, 1)), (3, (2, 2, 1, 1))])
def test_gradients_match_torch_autograd(n, net):
    """d<H>/dweights and d<H>/dx from jax.grad through the JAX engine
    must equal torch autograd through the independent oracle."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(23)
    spec = quanonet_spec(n, net)
    weights = rng.uniform(-np.pi, np.pi,
                          spec.weight_shape()).astype(np.float32)
    x = rng.uniform(-2, 2, (2, spec.total_encode)).astype(np.float32)
    diag = simple_ham_diag(n, -5, 5)

    # torch autograd on the f64 oracle
    w_t = torch.tensor(weights, dtype=torch.float64, requires_grad=True)
    x_t = torch.tensor(x, dtype=torch.float64, requires_grad=True)
    d_t = torch.tensor(np.asarray(diag), dtype=torch.float64)
    total = sum(torch_quanonet_exp(n, net, w_t, x_t[b], d_t)
                for b in range(x.shape[0]))
    total.backward()
    want_dw = w_t.grad.numpy()
    want_dx = x_t.grad.numpy()

    # jax.grad through the engine (f32)
    def loss(w, xx):
        return jnp.sum(hea_expectation(spec, w, xx, diag=diag,
                                       engine='dense'))

    got_dw, got_dx = jax.grad(loss, argnums=(0, 1))(jnp.asarray(weights),
                                                    jnp.asarray(x))
    # f32 engine vs f64 oracle: gradients agree to single precision
    np.testing.assert_allclose(np.asarray(got_dw), want_dw,
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_dx), want_dx,
                               atol=5e-4, rtol=1e-3)
