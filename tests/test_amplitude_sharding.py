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


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("nq,net,quanonet", [
    (3, (2, 1, 2, 1), True),   # n_dev=8 => local_n=0, all qubits global
    (5, (3, 2), False),
    (6, (2, 2, 2, 1), True),
])
def test_fused_sharded_matches_single_device(n_dev, nq, net, quanonet):
    """The grouped-kron local path of the sharded engine (fused=True)
    must agree with the single-device gates oracle."""
    if n_dev > 2 ** nq:
        pytest.skip("more devices than amplitudes")
    spec, w, x, diag = _case(nq, net, batch=3, quanonet=quanonet)
    ref = np.asarray(hea_expectation(spec, w, x, diag=diag, engine='gates'))
    out = np.asarray(hea_expectation_sharded(spec, w, x, diag,
                                             _mesh(n_dev), fused=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fused_sharded_gradients():
    spec, w, x, diag = _case(4, (2, 2, 1, 1), batch=2)
    mesh = _mesh(4)
    f = make_sharded_hea(spec, mesh, fused=True)
    g_s = np.asarray(jax.grad(
        lambda w_: jnp.sum(f(w_, x, diag) ** 2))(w))
    g_r = np.asarray(jax.grad(
        lambda w_: jnp.sum(hea_expectation(spec, w_, x, diag=diag,
                                           engine='gates') ** 2))(w))
    np.testing.assert_allclose(g_s, g_r, atol=1e-4)


def test_collective_counts():
    from quanonet_tpu.parallel.amplitude import sharded_collective_counts
    spec = quanonet_spec(5, (2, 2, 2, 2))     # 4 blocks x 2 sublayers
    c = sharded_collective_counts(spec, 4)    # k=2 global qubits
    # per block: 2 encode + 2 sublayers x (2*2 RY + (2+1) ring) = 2 + 14
    assert c['ppermutes'] == 4 * (2 + 2 * (4 + 3))
    assert c['psums'] == 1
    assert c['bytes_per_sample'] == c['ppermutes'] * (2 ** 3) * 8
    with pytest.raises(ValueError, match="power of 2"):
        sharded_collective_counts(spec, 3)


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


def test_virtual_global_k0_is_true_circuit():
    """virtual_global=0 on a 1-device mesh has no global qubits, so the
    timing instrument degenerates to the real fused circuit — validates
    the plumbing bench_amplitude.py --shard-compute relies on."""
    spec, w, x, diag = _case(5, (2, 2, 2, 2), batch=4)
    f = make_sharded_hea(spec, _mesh(1), fused=True, virtual_global=0)
    ref = hea_expectation(spec, w, x, diag=diag, engine='fused')
    np.testing.assert_allclose(np.asarray(f(w, x, diag)),
                               np.asarray(ref), atol=1e-5)


def test_virtual_global_executes_with_global_qubits():
    """virtual_global=2 runs one shard's local compute (2^(n-2) state)
    with self-no-op exchanges; output is a gauge variant, just assert it
    executes finite at the sharded state size."""
    spec, w, x, diag = _case(6, (2, 2, 2, 2), batch=4)
    f = make_sharded_hea(spec, _mesh(1), fused=True, virtual_global=2)
    out = np.asarray(f(w, x, jnp.asarray(diag[: 2 ** 4])))
    assert out.shape == (4, 1)
    assert np.all(np.isfinite(out))
    with pytest.raises(ValueError, match="1-device"):
        make_sharded_hea(spec, _mesh(2), virtual_global=2)


def test_sharded_training_end_to_end():
    """The amplitude-sharded engine TRAINS, not just differentiates: an
    optax Adam loop over the 8-way-sharded fused expectation tracks the
    unsharded gates-oracle loop step for step (same data, init, and
    optimizer state) and converges.  This is the Q>16 scaling story's
    training path exercised end to end on the virtual mesh."""
    import optax

    spec, w0, x, diag = _case(4, (2, 1, 2, 1), batch=6, seed=3)
    rng = np.random.RandomState(7)
    target = jnp.asarray(rng.randn(6, 1).astype(np.float32))
    mesh = _mesh(4)
    f = make_sharded_hea(spec, mesh, fused=True)
    opt = optax.adam(3e-2)

    def run(loss_fn, steps=12):
        @jax.jit
        def step(params, state):
            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, state = opt.update(g, state, params)
            return optax.apply_updates(params, upd), state, loss

        params, state = w0, opt.init(w0)
        losses = []
        for _ in range(steps):
            params, state, loss = step(params, state)
            losses.append(float(loss))
        return losses, params

    losses_sh, p_sh = run(
        lambda p: jnp.mean((f(p, x, diag) - target) ** 2))
    losses_ref, p_ref = run(
        lambda p: jnp.mean((hea_expectation(spec, p, x, diag=diag,
                                            engine='gates')
                            - target) ** 2))
    assert losses_sh[-1] < 0.7 * losses_sh[0]          # it converges
    np.testing.assert_allclose(losses_sh, losses_ref,  # identical runs
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref),
                               atol=2e-4)


# ── X/Y Σ-Pauli observables (round 5: lifts the amp Z-only restriction) ──────

@pytest.mark.parametrize("n_dev", [2, 8])
@pytest.mark.parametrize("pauli", ['X', 'Y'])
def test_sharded_pauli_xy_matches_single_device(n_dev, pauli):
    """⟨offset + coeff·Σᵢ Pᵢ⟩ for P∈{X,Y} (reference
    quantum_circuits_ms.py:28-39 `pauli` arg): local qubits use the
    on-shard pair formula, each global qubit one partner ppermute.
    Values must match the single-device gates oracle on both the
    per-gate and the fused local path."""
    from quanonet_tpu.ops.hamiltonian import simple_ham_params
    spec, w, x, _ = _case(4, (2, 1, 2, 1), batch=3)
    offset, coeff = simple_ham_params(4, -5.0, 5.0)
    ref = np.asarray(hea_expectation(spec, w, x, pauli=pauli,
                                     offset=offset, coeff=coeff,
                                     engine='gates'))
    mesh = _mesh(n_dev)
    for fused in (False, True):
        out = np.asarray(hea_expectation_sharded(
            spec, w, x, None, mesh, fused=fused, pauli=pauli,
            offset=offset, coeff=coeff))
        np.testing.assert_allclose(out, ref, atol=1e-4)


def test_sharded_pauli_xy_gradients():
    """Autodiff must flow through the partner-ppermute observable."""
    from quanonet_tpu.ops.hamiltonian import simple_ham_params
    spec, w, x, _ = _case(3, (2, 1, 2, 1), batch=2)
    offset, coeff = simple_ham_params(3, -5.0, 5.0)
    mesh = _mesh(4)     # 1 local qubit, 2 global
    for pauli in ('X', 'Y'):
        f = make_sharded_hea(spec, mesh, pauli=pauli, offset=offset,
                             coeff=coeff)
        zeros = jnp.zeros(spec.dim, jnp.float32)
        g_s = np.asarray(jax.grad(
            lambda w_: jnp.sum(f(w_, x, zeros) ** 2))(w))
        g_r = np.asarray(jax.grad(
            lambda w_: jnp.sum(hea_expectation(
                spec, w_, x, pauli=pauli, offset=offset, coeff=coeff,
                engine='gates') ** 2))(w))
        np.testing.assert_allclose(g_s, g_r, atol=1e-4)
