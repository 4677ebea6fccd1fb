"""
Independent-oracle test: a from-scratch NumPy complex simulator (sharing
NO code with quanonet_tpu.ops — gates built directly from textbook
definitions, composed with numpy kron/matmul) must agree with the engine.
Guards against systematic conventions errors common to the dense/gates
paths.
"""
import numpy as np
import pytest

from quanonet_tpu.ops.hamiltonian import simple_ham_diag
from quanonet_tpu.ops.hea import hea_expectation, quanonet_spec

I2 = np.eye(2, dtype=complex)
X = np.array([[0, 1], [1, 0]], dtype=complex)


def rx(t):
    return np.cos(t / 2) * I2 - 1j * np.sin(t / 2) * X


def ry(t):
    return np.array([[np.cos(t / 2), -np.sin(t / 2)],
                     [np.sin(t / 2), np.cos(t / 2)]], dtype=complex)


def rz(t):
    return np.diag([np.exp(-1j * t / 2), np.exp(1j * t / 2)])


def op_on(gate, qubit, n):
    """Embed a 1-qubit gate on `qubit` (little-endian: qubit 0 = LSB)."""
    mats = [I2] * n
    mats[qubit] = gate
    u = mats[n - 1]
    for q in range(n - 2, -1, -1):
        u = np.kron(u, mats[q])
    return u


def cnot(control, target, n):
    dim = 2 ** n
    u = np.zeros((dim, dim), dtype=complex)
    for k in range(dim):
        j = k ^ (1 << target) if (k >> control) & 1 else k
        u[j, k] = 1.0
    return u


def numpy_quanonet(n, net_size, weights, x_row):
    """Direct simulation of one sample through the reference circuit
    structure: trunk blocks then branch blocks; per block RX encode row,
    then linear_depth x [RY all, RZ all, RY' all, CNOT ring]."""
    bd, bld, td, tld = net_size
    psi = np.zeros(2 ** n, dtype=complex)
    psi[0] = 1.0
    col = 0
    sub = 0
    for depth, ld in ((td, tld), (bd, bld)):
        for _ in range(depth):
            for q in range(n):
                psi = op_on(rx(x_row[col]), q, n) @ psi
                col += 1
            for _ in range(ld):
                w = weights[sub]
                for q in range(n):
                    psi = op_on(ry(w[0, q]), q, n) @ psi
                for q in range(n):
                    psi = op_on(rz(w[1, q]), q, n) @ psi
                for q in range(n):
                    psi = op_on(ry(w[2, q]), q, n) @ psi
                for i in range(n):
                    psi = cnot((i + 1) % n, i, n) @ psi
                sub += 1
    return psi


@pytest.mark.parametrize("n,net", [(2, (2, 1, 2, 1)), (3, (2, 2, 1, 1)),
                                   (4, (1, 2, 2, 1))])
def test_engine_matches_independent_numpy(n, net):
    rng = np.random.RandomState(42)
    spec = quanonet_spec(n, net)
    weights = rng.uniform(-np.pi, np.pi,
                          spec.weight_shape()).astype(np.float32)
    x = rng.uniform(-2, 2, (3, spec.total_encode)).astype(np.float32)
    diag = simple_ham_diag(n, -5, 5)

    # independent oracle, sample by sample
    want = []
    for b in range(3):
        psi = numpy_quanonet(n, net, weights.astype(np.float64),
                             x[b].astype(np.float64))
        probs = np.abs(psi) ** 2
        want.append(probs @ diag)
    want = np.asarray(want)[:, None]

    for engine in ('dense', 'gates'):
        got = np.asarray(hea_expectation(spec, weights, x, diag=diag,
                                         engine=engine))
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"engine={engine}")


def test_xy_observables_match_independent_numpy():
    Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
    n, net = 3, (2, 1, 2, 1)
    rng = np.random.RandomState(7)
    spec = quanonet_spec(n, net)
    weights = rng.uniform(-np.pi, np.pi,
                          spec.weight_shape()).astype(np.float32)
    x = rng.uniform(-2, 2, (2, spec.total_encode)).astype(np.float32)

    for pauli, mat in (('X', X), ('Y', Y)):
        want = []
        for b in range(2):
            psi = numpy_quanonet(n, net, weights.astype(np.float64),
                                 x[b].astype(np.float64))
            total = sum(np.real(np.conj(psi) @ (op_on(mat, q, n) @ psi))
                        for q in range(n))
            want.append(1.5 + 0.7 * total)
        want = np.asarray(want)[:, None]
        for engine in ('dense', 'gates'):
            got = np.asarray(hea_expectation(spec, weights, x, pauli=pauli,
                                             offset=1.5, coeff=0.7,
                                             engine=engine))
            np.testing.assert_allclose(got, want, atol=2e-5,
                                       err_msg=f"{pauli}/{engine}")
