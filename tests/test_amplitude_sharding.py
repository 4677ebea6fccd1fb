"""
Amplitude-sharded statevector tests on the virtual 8-device CPU mesh:
the sharded engine must match the single-device engine exactly, and
gradients must flow through the ppermute collectives.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from quanonet_tpu.ops.hamiltonian import simple_ham_diag
from quanonet_tpu.ops.hea import hea_expectation, heaqnn_spec, quanonet_spec
from quanonet_tpu.parallel.amplitude import (
    hea_expectation_sharded, make_sharded_hea,
)


def _mesh(n):
    devs = mesh_utils.create_device_mesh((n,), devices=jax.devices()[:n])
    return Mesh(devs, ('amp',))


def _case(nq, net, batch, seed=0, quanonet=True):
    spec = quanonet_spec(nq, net) if quanonet else heaqnn_spec(nq, net)
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2,
                                (batch, spec.total_encode)).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(nq, -5, 5))
    return spec, w, x, diag


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("nq,net", [
    (3, (2, 1, 2, 1)),   # 8 devices => fully sharded state (local_dim 1..4)
    (4, (3, 2, 2, 1)),
    (5, (2, 2, 2, 2)),
])
def test_sharded_matches_single_device(n_dev, nq, net):
    if n_dev > 2 ** nq:
        pytest.skip("more devices than amplitudes")
    spec, w, x, diag = _case(nq, net, batch=3)
    ref = np.asarray(hea_expectation(spec, w, x, diag=diag, engine='gates'))
    out = np.asarray(hea_expectation_sharded(spec, w, x, diag, _mesh(n_dev)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_sharded_gradients():
    spec, w, x, diag = _case(3, (2, 1, 2, 1), batch=2)
    mesh = _mesh(4)
    f = make_sharded_hea(spec, mesh)

    def loss_sharded(w_):
        return jnp.sum(f(w_, x, diag) ** 2)

    def loss_ref(w_):
        return jnp.sum(hea_expectation(spec, w_, x, diag=diag,
                                       engine='gates') ** 2)

    g_s = np.asarray(jax.grad(loss_sharded)(w))
    g_r = np.asarray(jax.grad(loss_ref)(w))
    np.testing.assert_allclose(g_s, g_r, atol=1e-4)


def test_rejects_non_power_of_two():
    spec, w, x, diag = _case(3, (1, 1, 1, 1), batch=2)
    devs = mesh_utils.create_device_mesh((3,), devices=jax.devices()[:3])
    mesh = Mesh(devs, ('amp',))
    with pytest.raises(ValueError, match="power of 2"):
        make_sharded_hea(spec, mesh)


def test_rejects_too_many_devices():
    spec, w, x, diag = _case(2, (1, 1, 1, 1), batch=2)
    with pytest.raises(ValueError, match="devices"):
        make_sharded_hea(spec, _mesh(8))  # 8 devices > 2^2 amplitudes
