"""
Fused-group engine (ops/fused_gates.py) vs the gate-by-gate oracle:
forward and gradient agreement, group partitioning, remat path, and the
expectation API surface at large n.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanonet_tpu.ops.fused_gates import (
    forward_fused, qubit_groups, build_group_unitaries,
)
from quanonet_tpu.ops.hamiltonian import simple_ham_diag
from quanonet_tpu.ops.hea import (
    hea_expectation, hea_forward_pair, heaqnn_spec, quanonet_spec,
    resolve_engine,
)


def _rand(spec, batch=4, seed=0):
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                (spec.total_sublayers, 3, spec.n_qubits)),
                    jnp.float32)
    x = jnp.asarray(rng.uniform(-2, 2,
                                (batch, spec.n_blocks * spec.n_qubits)),
                    jnp.float32)
    return w, x


def test_qubit_groups():
    assert qubit_groups(3) == ((0, 3),)
    assert qubit_groups(7) == ((0, 7),)
    assert qubit_groups(8) == ((0, 7), (7, 1))
    assert qubit_groups(16) == ((0, 7), (7, 7), (14, 2))


def test_group_unitaries_are_unitary():
    spec = quanonet_spec(4, (2, 1, 2, 1))
    w, _ = _rand(spec)
    gu = build_group_unitaries(spec, w)
    ur, ui = gu[0]
    for s in range(ur.shape[0]):
        u = np.asarray(ur[s]) + 1j * np.asarray(ui[s])
        np.testing.assert_allclose(u @ u.conj().T, np.eye(u.shape[0]),
                                   atol=1e-5)


@pytest.mark.parametrize("spec", [
    quanonet_spec(2, (2, 1, 2, 1)),       # single tiny group
    quanonet_spec(5, (3, 2, 2, 1)),       # flagship size, mixed depths
    heaqnn_spec(8, (3, 2)),               # two groups (7 + 1)
    quanonet_spec(9, (2, 1, 1, 2)),       # two groups (7 + 2)
])
def test_fused_matches_gates_fwd_and_grad(spec):
    w, x = _rand(spec)

    # ONE compiled program per engine (fwd + grad via has_aux): the gates
    # oracle's per-gate graph is huge and this file's cost is pure
    # single-core XLA compile time
    def fwd_and_grad(eng):
        def loss(w_):
            sr, si = hea_forward_pair(spec, w_, x, engine=eng)
            return jnp.sum(sr ** 2) - jnp.sum(si), (sr, si)
        (_, pair), g = jax.value_and_grad(loss, has_aux=True)(w)
        return pair, g

    (g1, grad1) = fwd_and_grad('gates')
    (g2, grad2) = fwd_and_grad('fused')
    np.testing.assert_allclose(g2[0], g1[0], atol=2e-6)
    np.testing.assert_allclose(g2[1], g1[1], atol=2e-6)
    assert float(jnp.abs(grad1 - grad2).max()) < 1e-5


def test_fused_remat_matches():
    spec = quanonet_spec(6, (2, 2, 2, 1))
    w, x = _rand(spec)
    a = forward_fused(spec, w, x, remat=False)
    b = forward_fused(spec, w, x, remat=True)
    np.testing.assert_allclose(a[0], b[0], atol=1e-6)

    def loss(w, remat):
        sr, si = forward_fused(spec, w, x, remat=remat)
        return jnp.sum(sr * si)
    d = jnp.abs(jax.grad(loss)(w, False) - jax.grad(loss)(w, True))
    assert float(d.max()) < 1e-6


def test_fused_is_default_above_dense_max():
    assert resolve_engine('auto', 12) == 'fused'
    assert resolve_engine('gates', 12) == 'gates'


def test_fused_expectation_large_n():
    """Q12 end-to-end expectation: within Hamiltonian bounds, jits, and
    differentiates (the scaling-study path)."""
    spec = heaqnn_spec(12, (2, 1))
    w, x = _rand(spec, batch=2)
    diag = simple_ham_diag(12, -5.0, 5.0)

    @jax.jit
    def f(w):
        return jnp.sum(hea_expectation(spec, w, x, diag=diag,
                                       engine='fused'))
    v = float(f(w))
    assert np.isfinite(v) and abs(v) <= 2 * 5.0
    g = jax.grad(lambda w: f(w))(w)
    assert np.all(np.isfinite(np.asarray(g)))


def test_fused_norm_preserved():
    spec = heaqnn_spec(10, (2, 2))
    w, x = _rand(spec, batch=3)
    sr, si = forward_fused(spec, w, x)
    norms = np.asarray(jnp.sum(sr ** 2 + si ** 2, axis=1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
