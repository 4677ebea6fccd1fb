"""
Parameter-shift and SPSA gradients (ops/param_shift.py).

The shift rule is an exact identity for exp(-i θ P/2) gates, so the
shift-rule gradients must equal jax.grad to float32 rounding — this file
doubles as a third independent gradient oracle (after the NumPy forward
oracle and the torch-autograd oracle): the gradient is reproduced from
nothing but forward circuit evaluations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from quanonet_tpu.ops import param_shift as ps
from quanonet_tpu.ops.hamiltonian import resolve_ham_diag, simple_ham_params
from quanonet_tpu.ops.hea import (
    hea_expectation, heaqnn_spec, init_ansatz_weights, quanonet_spec,
)

SPEC = heaqnn_spec(2, (2, 1))          # S=2 sublayers -> P=12 params, E=4
DIAG = jnp.asarray(resolve_ham_diag(2, [-5.0, 5.0], None))
BATCH = 4


@pytest.fixture(scope="module")
def wx():
    key = jax.random.PRNGKey(7)
    w = init_ansatz_weights(key, SPEC)
    x = jax.random.uniform(jax.random.fold_in(key, 1),
                           (BATCH, SPEC.total_encode),
                           minval=-1.0, maxval=1.0)
    return w, x


def test_shift_jacobian_matches_autodiff(wx):
    w, x = wx
    jac_ps = ps.shift_jacobian(SPEC, w, x, diag=DIAG, engine='dense')

    def e(w):
        return hea_expectation(SPEC, w, x, diag=DIAG, engine='dense')[:, 0]

    jac_ad = jax.jacrev(e)(w)          # (batch,) + wshape
    assert jac_ps.shape == (BATCH,) + SPEC.weight_shape()
    np.testing.assert_allclose(np.asarray(jac_ps), np.asarray(jac_ad),
                               atol=5e-4)


@pytest.mark.parametrize("pauli", ["Z", "X"])
def test_ps_vjp_matches_autodiff_through_a_loss(wx, pauli):
    """Weight AND encode-input cotangents from the shift VJP equal
    autodiff's through a downstream MSE loss — the property that lets
    the full model (classical encode layers included) train with
    circuit-evaluation-only gradients."""
    w, x = wx
    if pauli == "Z":
        kw = dict(diag=DIAG)
    else:
        off, co = simple_ham_params(2, -5.0, 5.0)
        kw = dict(pauli="X", offset=off, coeff=co)
    f = ps.make_ps_expectation(SPEC, engine='dense', **kw)
    target = jnp.linspace(-1.0, 1.0, BATCH)[:, None]

    def loss_ps(w, x):
        return jnp.mean((f(w, x) - target) ** 2)

    def loss_ad(w, x):
        return jnp.mean(
            (hea_expectation(SPEC, w, x, engine='dense', **kw) - target) ** 2)

    gw_ps, gx_ps = jax.grad(loss_ps, argnums=(0, 1))(w, x)
    gw_ad, gx_ad = jax.grad(loss_ad, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw_ps), np.asarray(gw_ad),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(gx_ps), np.asarray(gx_ad),
                               atol=5e-4)


def test_ps_chunked_equals_unchunked(wx):
    w, x = wx
    f_full = ps.make_ps_expectation(SPEC, diag=DIAG, engine='dense')
    f_chunk = ps.make_ps_expectation(SPEC, diag=DIAG, engine='dense',
                                     chunk=5)   # pads 12 -> 15

    def loss(f, w, x):
        return jnp.sum(f(w, x))

    g1 = jax.grad(lambda w: loss(f_full, w, x))(w)
    g2 = jax.grad(lambda w: loss(f_chunk, w, x))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_ps_finite_shot_gradient_tracks_exact(wx):
    """Finite-shot shift gradients are noisy but unbiased; at 8192 shots
    on a 2-qubit circuit they must point the same way as the exact
    gradient (cosine > 0.9)."""
    w, x = wx
    f = ps.make_ps_expectation(SPEC, diag=DIAG, engine='dense', shots=8192)
    target = jnp.zeros((BATCH, 1))

    def loss_s(w):
        return jnp.mean((f(w, x, jax.random.PRNGKey(3)) - target) ** 2)

    def loss_e(w):
        return jnp.mean(
            (hea_expectation(SPEC, w, x, diag=DIAG, engine='dense')
             - target) ** 2)

    gs = np.asarray(jax.grad(loss_s)(w)).ravel()
    ge = np.asarray(jax.grad(loss_e)(w)).ravel()
    cos = float(gs @ ge / (np.linalg.norm(gs) * np.linalg.norm(ge)))
    assert cos > 0.9, cos


def test_finite_shot_training_decreases_loss(wx):
    """The capability autodiff cannot provide: TRAIN under finite-shot
    readout (multinomial sampling is not differentiable; the shift VJP
    sidesteps it with shifted sampled evaluations)."""
    w0, x = wx
    f = ps.make_ps_expectation(SPEC, diag=DIAG, engine='dense', shots=2048)
    w_true = init_ansatz_weights(jax.random.PRNGKey(11), SPEC)
    target = hea_expectation(SPEC, w_true, x, diag=DIAG, engine='dense')
    opt = optax.adam(0.08)

    def exact_loss(w):
        return jnp.mean(
            (hea_expectation(SPEC, w, x, diag=DIAG, engine='dense')
             - target) ** 2)

    @jax.jit
    def run(w, opt_state, key):
        def step(carry, k):
            w, opt_state = carry

            def loss(w):
                return jnp.mean((f(w, x, k) - target) ** 2)

            g = jax.grad(loss)(w)
            up, opt_state = opt.update(g, opt_state, w)
            return (optax.apply_updates(w, up), opt_state), 0.0

        (w, opt_state), _ = jax.lax.scan(
            step, (w, opt_state), jax.random.split(key, 40))
        return w

    w = run(w0, opt.init(w0), jax.random.PRNGKey(5))
    l0 = float(exact_loss(w0))
    l1 = float(exact_loss(w))
    assert l1 < 0.5 * l0, (l0, l1)


def test_spsa_estimator_direction():
    """Averaged SPSA estimates align with the true gradient (quadratic
    test function, c small => O(c^2) bias negligible)."""
    a = jnp.asarray(np.random.RandomState(0).randn(10).astype(np.float32))
    w = jnp.zeros(10)

    def loss(p):
        return jnp.sum((p - a) ** 2)

    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    grads = jax.vmap(
        lambda k: ps.spsa_gradient(loss, w, k, c=1e-3)[0])(keys)
    g_hat = np.asarray(grads.mean(0))
    g_true = np.asarray(jax.grad(loss)(w))
    cos = float(g_hat @ g_true
                / (np.linalg.norm(g_hat) * np.linalg.norm(g_true)))
    assert cos > 0.95, cos


def test_spsa_step_trains_circuit_loss(wx):
    """make_spsa_step drives a real circuit loss downhill — 2 evaluations
    per step over the FULL parameter pytree (ansatz here)."""
    w0, x = wx
    w_true = init_ansatz_weights(jax.random.PRNGKey(11), SPEC)
    target = hea_expectation(SPEC, w_true, x, diag=DIAG, engine='dense')

    def loss(w):
        return jnp.mean(
            (hea_expectation(SPEC, w, x, diag=DIAG, engine='dense')
             - target) ** 2)

    opt = optax.adam(0.1)
    step = ps.make_spsa_step(loss, opt, c=0.1)

    @jax.jit
    def run(w, opt_state, key):
        def body(carry, k):
            w, opt_state = carry
            w, opt_state, l = step(w, opt_state, k)
            return (w, opt_state), l

        (w, opt_state), _ = jax.lax.scan(
            body, (w, opt_state), jax.random.split(key, 150))
        return w

    w = run(w0, opt.init(w0), jax.random.PRNGKey(2))
    assert float(loss(w)) < 0.5 * float(loss(w0))


# ── model / solver / run-ID integration ──────────────────────────────────────

def test_quanonet_model_shift_grads_match_autodiff():
    """Full-model property: with grad_method='shift' the gradients of the
    loss w.r.t. EVERY parameter — ansatz, classical TrainableFreq encode
    layers, scalar bias — equal autodiff's, because the shift VJP also
    produces the exact encode-input cotangent."""
    from quanonet_tpu.models import QuanONet

    kw = dict(num_qubits=2, branch_input_size=3, trunk_input_size=1,
              net_size=(1, 1, 1, 1), scale_coeff=0.01)
    m_ad = QuanONet(**kw)
    m_ps = QuanONet(grad_method='shift', **kw)
    b = jnp.asarray(np.random.RandomState(1).randn(BATCH, 3), jnp.float32)
    t = jnp.asarray(np.random.RandomState(2).randn(BATCH, 1), jnp.float32)
    params = m_ad.init(jax.random.PRNGKey(0), b, t)
    target = jnp.linspace(-1.0, 1.0, BATCH)[:, None]

    def loss(m):
        return lambda p: jnp.mean((m.apply(p, b, t) - target) ** 2)

    g_ad = jax.grad(loss(m_ad))(params)
    g_ps = jax.grad(loss(m_ps))(params)
    flat_ad = jax.tree_util.tree_leaves_with_path(g_ad)
    flat_ps = jax.tree_util.tree_leaves_with_path(g_ps)
    assert len(flat_ad) == len(flat_ps) >= 4   # ansatz+bias+2 freq layers
    for (pa, la), (pb, lb) in zip(flat_ad, flat_ps):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   atol=5e-4, err_msg=str(pa))


def test_run_id_suffix_round_trips():
    from quanonet_tpu.infer import _parse_path
    from quanonet_tpu.logger import get_experiment_id

    cfg = dict(operator='Antideriv', model_type='QuanONet',
               net_size=[2, 1, 2, 1], num_qubits=2,
               if_trainable_freq='true', scale_coeff=0.01,
               num_train=20, num_points=50, seed=0,
               grad_method='shift', train_shots=512)
    eid = get_experiment_id(cfg)
    assert '_ShiftSh512_' in eid
    parsed = _parse_path(f"outputs/Antideriv/{eid}/best_model.npz")
    assert parsed['grad_method'] == 'shift'
    assert parsed['train_shots'] == 512
    assert parsed['net_size'] == [2, 1, 2, 1]

    cfg.update(grad_method='spsa', spsa_c=0.1, train_shots=None)
    cfg.pop('train_shots')
    eid = get_experiment_id(cfg)
    assert '_SpsaC0.1_' in eid
    parsed = _parse_path(f"outputs/Antideriv/{eid}/x.npz")
    assert parsed['grad_method'] == 'spsa'
    assert parsed['spsa_c'] == 0.1


@pytest.fixture()
def _solver_env(tmp_path, monkeypatch):
    import quanonet_tpu.data.generation as gen
    monkeypatch.setattr(gen, 'DATA_ROOT', str(tmp_path / 'raw'))
    monkeypatch.chdir(tmp_path)
    np.random.seed(0)
    yield


def _tiny_cfg(**over):
    cfg = dict(operator='Antideriv', model_type='QuanONet',
               num_train=20, num_test=10, num_points=50, num_points_0=10,
               train_sample_num=5, test_sample_num=10,
               batch_size=25, num_epochs=8, learning_rate=0.02,
               num_qubits=2, net_size=[1, 1, 1, 1],
               scale_coeff=0.01, if_trainable_freq='true',
               ham_bound=[-5, 5], ham_pauli='Z', seed=0,
               prefix='outputs')
    cfg.update(over)
    return cfg


def test_solver_shift_training_end_to_end(_solver_env):
    """--grad_method shift trains the full model through the shift-rule
    VJP; exact mode must learn exactly like autodiff does."""
    from quanonet_tpu.solver import Solver

    solver = Solver(_tiny_cfg(grad_method='shift'))
    history = solver.train()
    metrics = solver.evaluate(history)
    assert history['loss_train'][-1] < history['loss_train'][0]
    assert np.isfinite(metrics['rel_l2'])
    assert '_Shift_' in solver.exp_logger.exp_name


def test_solver_spsa_finite_shot_training_end_to_end(_solver_env):
    """The full QPU-training emulation: SPSA (2 evaluations/step) over a
    finite-shot sampled loss — no autodiff anywhere in the gradient."""
    from quanonet_tpu.solver import Solver

    solver = Solver(_tiny_cfg(grad_method='spsa', train_shots=256,
                              num_epochs=6))
    history = solver.train()
    metrics = solver.evaluate(history)
    assert len(history['loss_train']) == 6
    assert np.isfinite(metrics['rel_l2'])
    assert '_SpsaSh256_' in solver.exp_logger.exp_name


def test_train_shots_requires_nonautodiff(_solver_env):
    from quanonet_tpu.solver import Solver

    with pytest.raises(ValueError, match='train_shots'):
        Solver(_tiny_cfg(train_shots=128))
