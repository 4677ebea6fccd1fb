"""
Pipeline-parallel block chain (parallel/pipeline.py) vs the dense
single-device engine: the GPipe schedule over a ppermute ring must be
an exact reformulation — forward and gradients — on the virtual
8-device CPU mesh (tests/conftest.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from quanonet_tpu.ops.hamiltonian import simple_ham_diag
from quanonet_tpu.ops.hea import hea_expectation, init_ansatz_weights, \
    quanonet_spec
from quanonet_tpu.parallel.pipeline import make_pipeline_hea


def _mesh(n):
    return Mesh(mesh_utils.create_device_mesh(
        (n,), devices=jax.devices()[:n]), ('pipe',))


def _case(n_qubits, net, batch, seed=0):
    spec = quanonet_spec(n_qubits, net)
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2, (batch, spec.total_encode))
                    .astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(n_qubits, -5, 5))
    return spec, w, x, diag


@pytest.mark.parametrize('n_dev,n_mb', [(4, 4), (4, 2), (8, 4)])
def test_pipeline_matches_dense(n_dev, n_mb):
    spec, w, x, diag = _case(3, (4, 1, 4, 1), batch=8)
    assert spec.n_blocks % n_dev == 0
    want = np.asarray(hea_expectation(spec, w, x, diag=diag,
                                      engine='dense'))
    f = make_pipeline_hea(spec, _mesh(n_dev), n_microbatches=n_mb)
    got = np.asarray(f(w, x, diag))
    np.testing.assert_allclose(got, want, atol=5e-6)


def _fwd_and_grad(f, w, x, diag):
    """One compiled program for predictions AND gradient (single-core CPU
    compile dominates this file's runtime; never compile fwd twice)."""

    def loss(w_):
        out = f(w_, x, diag)
        return jnp.sum(out ** 2), out

    (_, preds), g = jax.value_and_grad(loss, has_aux=True)(w)
    return np.asarray(preds), np.asarray(g)


@pytest.fixture(scope='module')
def shared_loc():
    """The standardized 4-stage case — spec (4,2,4,2), batch 4, M=2 —
    compiled ONCE (stage-local production mode) and reused by the
    gradient-equivalence and stage-local-vs-full tests."""
    spec, w, x, diag = _case(3, (4, 2, 4, 2), batch=4, seed=1)
    f_loc = make_pipeline_hea(spec, _mesh(4), n_microbatches=2)
    preds, g = _fwd_and_grad(f_loc, w, x, diag)
    return spec, w, x, diag, preds, g


def test_pipeline_gradients_match_dense(shared_loc):
    spec, w, x, diag, preds, g_pipe = shared_loc
    def loss_dense(w_):
        out = hea_expectation(spec, w_, x, diag=diag, engine='dense')
        return jnp.sum(out ** 2), out

    (_, want), g_dense = jax.value_and_grad(loss_dense, has_aux=True)(w)
    np.testing.assert_allclose(preds, np.asarray(want), atol=5e-6)
    np.testing.assert_allclose(g_pipe, np.asarray(g_dense),
                               atol=5e-5, rtol=1e-4)


def test_pipeline_under_jit_with_uneven_schedule():
    """M != P and a deep chain; jitted end-to-end."""
    spec, w, x, diag = _case(2, (8, 1, 8, 1), batch=12, seed=2)
    assert spec.n_blocks == 16
    f = make_pipeline_hea(spec, _mesh(4), n_microbatches=6)
    got = np.asarray(jax.jit(f)(w, x, diag))
    want = np.asarray(hea_expectation(spec, w, x, diag=diag,
                                      engine='dense'))
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_pipeline_rejects_indivisible_blocks():
    spec, w, x, diag = _case(3, (3, 1, 2, 1), batch=8)
    with pytest.raises(ValueError, match='divisible'):
        make_pipeline_hea(spec, _mesh(4))


def test_pipeline_composed_with_data_parallel():
    """dp x pp on a (2, 4) mesh: batch sharded over 'data', each shard
    running a 4-stage pipeline over 'pipe'; must equal the dense engine
    on the full batch — forward and gradient."""
    spec, w, x, diag = _case(3, (4, 1, 4, 1), batch=16, seed=3)
    mesh = Mesh(mesh_utils.create_device_mesh((2, 4)), ('data', 'pipe'))
    f = make_pipeline_hea(spec, mesh, n_microbatches=2, data_axis='data')
    got, g_pipe = _fwd_and_grad(f, w, x, diag)
    want, g_dense = _fwd_and_grad(
        lambda w_, x_, d_: hea_expectation(spec, w_, x_, diag=d_,
                                           engine='dense'), w, x, diag)
    np.testing.assert_allclose(got, want, atol=5e-6)
    np.testing.assert_allclose(g_pipe, g_dense, atol=5e-5, rtol=1e-4)


def test_pipeline_heaqnn_spec():
    """Single-stream HEAQNN chains pipeline identically (block structure
    is spec-driven, not model-specific)."""
    from quanonet_tpu.ops.hea import heaqnn_spec
    spec = heaqnn_spec(3, (8, 2))
    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2, (8, spec.total_encode))
                    .astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(3, -5, 5))
    f = make_pipeline_hea(spec, _mesh(4), n_microbatches=4)
    got = np.asarray(f(w, x, diag))
    want = np.asarray(hea_expectation(spec, w, x, diag=diag,
                                      engine='dense'))
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_stage_local_equals_full_compile(shared_loc):
    """The production stage-local compile path and the
    compile-everything fallback are the same function (fwd + grad);
    the stage-local side comes precompiled from the shared fixture."""
    spec, w, x, diag, preds_loc, g_loc = shared_loc
    f_full = make_pipeline_hea(spec, _mesh(4), n_microbatches=2,
                               stage_local_compile=False)
    preds_full, g_full = _fwd_and_grad(f_full, w, x, diag)
    np.testing.assert_allclose(preds_loc, preds_full, atol=2e-6)
    np.testing.assert_allclose(g_loc, g_full, atol=2e-5, rtol=1e-4)


def test_stage_local_rejects_nonuniform():
    from quanonet_tpu.ops.hea import HEASpec
    spec = HEASpec(3, ((3, 1), (3, 1), (3, 2), (3, 2)))
    with pytest.raises(ValueError, match='uniform'):
        make_pipeline_hea(spec, _mesh(4), stage_local_compile=True)


def test_batch_divisibility_errors():
    """Clear ValueErrors at call time, not opaque reshape failures deep
    inside shard_map."""
    spec, w, x, diag = _case(3, (4, 2, 4, 2), batch=10, seed=7)
    mesh = _mesh(4)
    fn = make_pipeline_hea(spec, mesh)   # M defaults to 4; 10 % 4 != 0
    with pytest.raises(ValueError, match='n_microbatches'):
        fn(w, x, diag)

    fn2 = make_pipeline_hea(spec, mesh, axis='pipe', data_axis=None,
                            n_microbatches=2)
    # batch 10 % 2 == 0 -> runs fine
    out = np.asarray(fn2(w, x, diag))
    assert out.shape == (10, 1)


@pytest.mark.parametrize('pauli', ['X', 'Y'])
def test_pipeline_pauli_xy_matches_single_device(pauli):
    """X/Y Σ-Pauli observables on the pipeline engine (round 5: epilogue
    swap on the draining stage, zero extra communication): values and
    grads must match the single-device gates oracle."""
    from quanonet_tpu.ops.hamiltonian import simple_ham_params
    spec, w, x, diag = _case(3, (2, 1, 2, 1), 8)
    offset, coeff = simple_ham_params(3, -5.0, 5.0)
    f = make_pipeline_hea(spec, _mesh(4), n_microbatches=2,
                          pauli=pauli, offset=offset, coeff=coeff)
    zeros = jnp.zeros(spec.dim, jnp.float32)

    out = np.asarray(f(w, x, zeros))
    ref = np.asarray(hea_expectation(spec, w, x, pauli=pauli,
                                     offset=offset, coeff=coeff,
                                     engine='gates'))
    np.testing.assert_allclose(out, ref, atol=1e-4)

    g = np.asarray(jax.grad(
        lambda w_: jnp.sum(f(w_, x, zeros) ** 2))(w))
    g_ref = np.asarray(jax.grad(
        lambda w_: jnp.sum(hea_expectation(
            spec, w_, x, pauli=pauli, offset=offset, coeff=coeff,
            engine='gates') ** 2))(w))
    np.testing.assert_allclose(g, g_ref, atol=1e-4)
