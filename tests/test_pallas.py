"""
Pallas fused-chain kernel tests (interpret mode on CPU): forward and
gradient agreement with the dense XLA path, padding behaviour, and the
VMEM fallback.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanonet_tpu.ops.hamiltonian import simple_ham_diag
from quanonet_tpu.ops.hea import hea_expectation, quanonet_spec
from quanonet_tpu.ops.pallas_hea import _chain_workset_bytes, forward_pallas


def _setup(nq=3, net=(4, 2, 3, 1), batch=5, seed=0):
    spec = quanonet_spec(nq, net)
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2,
                                (batch, spec.total_encode)).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(nq, -5, 5))
    return spec, w, x, diag


@pytest.mark.parametrize("engine", ["pallas", "embed"])
@pytest.mark.parametrize("nq,net,batch", [
    (2, (5, 1, 5, 1), 4),     # shipped architecture
    (3, (4, 2, 3, 1), 5),     # mixed linear depths, batch not mult of 8
    (5, (4, 2, 2, 2), 16),
])
def test_pallas_matches_dense_forward(nq, net, batch, engine):
    spec, w, x, diag = _setup(nq, net, batch)
    out_p = hea_expectation(spec, w, x, diag=diag, engine=engine)
    out_d = hea_expectation(spec, w, x, diag=diag, engine='dense')
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               atol=1e-4)


@pytest.mark.parametrize("engine", ["pallas", "embed"])
def test_pallas_matches_dense_grad(engine):
    spec, w, x, diag = _setup()

    def loss(weights, xx, eng):
        return jnp.sum(
            hea_expectation(spec, weights, xx, diag=diag, engine=eng) ** 2)

    gw_p, gx_p = jax.grad(lambda w_, x_: loss(w_, x_, engine),
                          argnums=(0, 1))(w, x)
    gw_d, gx_d = jax.grad(lambda w_, x_: loss(w_, x_, 'dense'),
                          argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_d), atol=2e-4)


def test_pallas_fallback_on_vmem_budget():
    # Q12 would need ~GBs of block matrices — must fall back, not crash
    assert _chain_workset_bytes(60, 100, 2 ** 12) > 12 * 1024 * 1024
    spec, w, x, diag = _setup(nq=2, net=(1, 1, 1, 1))
    # nb < 2 path also falls back
    spec1 = quanonet_spec(2, (1, 0, 0, 0))
    w1 = jnp.zeros(spec1.weight_shape())
    x1 = jnp.zeros((2, spec1.total_encode))
    sr, si = forward_pallas(spec1, w1, x1)
    assert sr.shape == (2, 4)


def test_pallas_in_model():
    from quanonet_tpu.models import QuanONet
    kw = dict(num_qubits=2, branch_input_size=6, trunk_input_size=1,
              net_size=(3, 1, 2, 1))
    model_p = QuanONet(engine='pallas', **kw)
    model_d = QuanONet(engine='dense', **kw)
    b = jnp.asarray(np.random.RandomState(1).randn(4, 6).astype(np.float32))
    t = jnp.asarray(np.random.RandomState(2).rand(4, 1).astype(np.float32))
    params = model_d.init(jax.random.PRNGKey(0), b, t)
    np.testing.assert_allclose(np.asarray(model_p.apply(params, b, t)),
                               np.asarray(model_d.apply(params, b, t)),
                               atol=1e-4)


def test_vmem_raise_trigger_thresholds():
    """The flagship Q5 shape must stay on the default scoped limit (the
    blanket raise costs ~8%); D>=256 shapes must raise it even at batch
    1 — Mosaic counts the VMEM-resident block-matrix INPUTS against the
    scoped stack (31.4 MiB at Q8/nb=60, the round-2 OOM)."""
    from quanonet_tpu.ops.pallas_hea import (
        _fwd_stack_bytes, _bwd_stack_bytes, _mat_input_bytes,
        _maybe_params2,
    )
    # flagship: nb=60, batch 100->104, d=32
    assert _maybe_params2(_fwd_stack_bytes(60, 104, 32),
                          _mat_input_bytes(60, 32)) is None
    assert _maybe_params2(_bwd_stack_bytes(60, 104, 32),
                          _mat_input_bytes(60, 32)) is None
    # Q8 at init batch (8): inputs dominate -> must raise
    assert _maybe_params2(_fwd_stack_bytes(60, 8, 256),
                          _mat_input_bytes(60, 256)) is not None


def test_multiseed_guard_demotes_vmem_chains():
    from quanonet_tpu.multiseed import _guard_vmapped_engine
    base = {'model_type': 'QuanONet', 'num_qubits': 5}
    for eng in ('pallas', 'embed'):
        out = _guard_vmapped_engine(dict(base, engine=eng), 5)
        assert out['engine'] == 'dense', (eng, out['engine'])
    # fused passes through (it vmaps cleanly), as does n_seeds == 1
    out = _guard_vmapped_engine(dict(base, engine='fused'), 5)
    assert out['engine'] == 'fused'
    out = _guard_vmapped_engine(dict(base, engine='pallas'), 1)
    assert out['engine'] == 'pallas'
    # auto at large n resolves to fused -> no demotion
    out = _guard_vmapped_engine(
        dict(base, engine='auto', num_qubits=10), 5)
    assert out.get('engine', 'auto') == 'auto'


def test_chunked_batch_past_vmem_budget(monkeypatch):
    """Batches past the whole-batch VMEM budget run as MULTIPLE chain
    calls instead of the dense fallback (round 5, batch frontier):
    fwd + grads must equal the single-call result exactly."""
    import jax
    import jax.numpy as jnp
    from quanonet_tpu.ops import pallas_hea as ph
    from quanonet_tpu.ops.hamiltonian import simple_ham_diag
    from quanonet_tpu.ops.hea import quanonet_spec

    spec = quanonet_spec(3, (2, 1, 2, 1))
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2,
                                (20, spec.total_encode)).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(3, -5, 5))

    def loss(w_, x_):
        a, b = ph.forward_pallas(spec, w_, x_)
        return jnp.sum(((a * a + b * b) @ diag) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss)(w, x)

    # force the chunked path (opt-in since the bs=1000 negative result):
    # claim the 20-row batch is over budget and cap chunks at 8 rows ->
    # 3 calls with padding
    monkeypatch.setenv('PALLAS_CHUNK', '1')
    monkeypatch.setattr(ph, '_chain_workset_bytes',
                        lambda B, N, D: ph.VMEM_BUDGET + 1 if N > 8 else 0)
    monkeypatch.setattr(ph, '_max_chain_batch', lambda nb, d: 8)
    monkeypatch.setattr(ph, 'CHUNK_MIN_BT', 8)
    l_c, g_c = jax.value_and_grad(loss)(w, x)
    np.testing.assert_allclose(float(l_c), float(l_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_ref),
                               atol=1e-5)
