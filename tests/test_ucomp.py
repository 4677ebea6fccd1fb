"""
Pallas f32 unitary-compile kernel (ops/pallas_ucomp.py) vs the XLA
path (ops/hea.compile_block_unitaries + Hadamard folding): forward and
gradients.  On CPU both run exact f32 (interpret-mode Pallas; XLA CPU
matmuls are f32), so tolerances are tight.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanonet_tpu.ops import pallas_ucomp
from quanonet_tpu.ops.gates import hadamard_kron
from quanonet_tpu.ops.hea import (
    compile_block_unitaries, heaqnn_spec, quanonet_spec,
)


def _xla_mts(spec, weights):
    ur, ui = compile_block_unitaries(spec, weights)
    hk = jnp.asarray(hadamard_kron(spec.n_qubits))
    uh_r = ur @ hk
    uh_i = ui @ hk
    m_r = jnp.concatenate([hk @ uh_r[:-1], uh_r[-1:]], axis=0)
    m_i = jnp.concatenate([hk @ uh_i[:-1], uh_i[-1:]], axis=0)
    return m_r.transpose(0, 2, 1), m_i.transpose(0, 2, 1)


CASES = [
    quanonet_spec(5, (40, 2, 20, 2)),     # flagship
    quanonet_spec(2, (3, 1, 2, 1)),       # ld=1
    quanonet_spec(3, (2, 3, 2, 3)),       # ld=3
    heaqnn_spec(4, (5, 2)),               # single stream
    quanonet_spec(7, (2, 2, 2, 2)),       # D=128 boundary
]


@pytest.mark.parametrize('spec', CASES,
                         ids=[f"q{s.n_qubits}b{s.n_blocks}" for s in CASES])
def test_ucomp_forward_matches_xla(spec):
    assert pallas_ucomp.ucomp_applicable(spec)
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    want_r, want_i = _xla_mts(spec, w)
    got_r, got_i = pallas_ucomp.compile_block_mats(spec, w)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               atol=2e-6)


@pytest.mark.parametrize('spec', CASES[:4],
                         ids=[f"q{s.n_qubits}b{s.n_blocks}"
                              for s in CASES[:4]])
def test_ucomp_grads_match_xla(spec):
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    # random cotangent projection so every matrix entry participates
    pr = jnp.asarray(rng.randn(spec.n_blocks, spec.dim, spec.dim)
                     .astype(np.float32))
    pi = jnp.asarray(rng.randn(spec.n_blocks, spec.dim, spec.dim)
                     .astype(np.float32))

    def loss_xla(w):
        mr, mi = _xla_mts(spec, w)
        return jnp.sum(mr * pr) + jnp.sum(mi * pi)

    def loss_ucomp(w):
        mr, mi = pallas_ucomp.compile_block_mats(spec, w)
        return jnp.sum(mr * pr) + jnp.sum(mi * pi)

    g_xla = jax.grad(loss_xla)(w)
    g_uc = jax.grad(loss_ucomp)(w)
    np.testing.assert_allclose(np.asarray(g_uc), np.asarray(g_xla),
                               atol=5e-5, rtol=1e-4)


def test_ucomp_not_applicable_mixed_ld():
    from quanonet_tpu.ops.hea import HEASpec
    spec = HEASpec(n_qubits=3,
                   block_configs=((3, 1), (3, 1), (3, 2), (3, 2)))
    assert not pallas_ucomp.ucomp_applicable(spec)


def test_ucomp_under_jit_and_engine_path(monkeypatch):
    """The pallas engine's _prepare routes through ucomp and still
    matches the dense engine end-to-end (interpret mode on CPU)."""
    from quanonet_tpu.ops import pallas_hea
    monkeypatch.setattr(pallas_hea, 'USE_UCOMP', True)
    from quanonet_tpu.ops.hea import hea_expectation
    spec = quanonet_spec(3, (4, 2, 3, 2))
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2, (6, spec.total_encode))
                    .astype(np.float32))
    from quanonet_tpu.ops.hamiltonian import simple_ham_diag
    diag = jnp.asarray(simple_ham_diag(spec.n_qubits, -5, 5))
    want = hea_expectation(spec, w, x, diag=diag, engine='dense')
    got = jax.jit(lambda w, x: hea_expectation(spec, w, x, diag=diag,
                                               engine='pallas'))(w, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-6)


def test_ucomp_bf16_mode_close_to_xla(monkeypatch):
    """UCOMP_BF16=1 casts the packed matmul operands to bf16 (keeping the
    4x issue-count reduction with XLA-default-equivalent numerics).  The
    outputs are unitary-magnitude entries, so bf16 rounding stays within
    ~1e-2 absolute; gradients must remain finite and close."""
    monkeypatch.setattr(pallas_ucomp, 'UCOMP_BF16', True)
    spec = quanonet_spec(4, (3, 2, 3, 2))
    rng = np.random.RandomState(7)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    want_r, want_i = _xla_mts(spec, w)
    got_r, got_i = pallas_ucomp.compile_block_mats(spec, w)
    assert got_r.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               atol=3e-2)

    def loss_ucomp(w):
        mr, mi = pallas_ucomp.compile_block_mats(spec, w)
        return jnp.sum(mr ** 2) + jnp.sum(mi ** 2)

    g = jax.grad(loss_ucomp)(w)
    assert np.all(np.isfinite(np.asarray(g)))
