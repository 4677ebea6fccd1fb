"""
Model tests: frequency-layer semantics, QuanONet/HEAQNN parameter counts
and shapes, classical baselines (FNN / DeepONet / FNO) forward + grad.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanonet_tpu.metrics import count_parameters
from quanonet_tpu.models import (
    FNN, FNO, DeepONet, HEAQNN, QuanONet, deeponet_layer_sizes,
)
from quanonet_tpu.models.layers import FixedScale, TrainableFreq, tile_to


def test_tile_to_cyclic():
    x = jnp.asarray([[1., 2., 3.]])
    np.testing.assert_array_equal(np.asarray(tile_to(x, 7)),
                                  [[1, 2, 3, 1, 2, 3, 1]])
    np.testing.assert_array_equal(np.asarray(tile_to(x, 2)), [[1, 2]])
    np.testing.assert_array_equal(np.asarray(tile_to(x, 3)), [[1, 2, 3]])


def test_trainable_freq_init_and_forward():
    layer = TrainableFreq(out_features=6, init_scale=0.5)
    params = layer.init(jax.random.PRNGKey(0), jnp.ones((1, 3)))
    w = np.asarray(params['params']['weights'])
    b = np.asarray(params['params']['bias'])
    np.testing.assert_allclose(w, 0.5)          # scale_coeff constant init
    assert (np.abs(b) <= np.pi).all()           # U(-π, π) (MS convention)
    assert np.std(b) > 0.1
    x = jnp.asarray([[1., 2., 3.]])
    out = layer.apply(params, x)
    expected = np.asarray(tile_to(x, 6)) * w + b
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_fixed_scale_forward():
    layer = FixedScale(out_features=5, scale=0.1)
    params = layer.init(jax.random.PRNGKey(0), jnp.ones((1, 2)))
    assert not jax.tree_util.tree_leaves(params)  # parameter-free
    out = layer.apply(params, jnp.asarray([[2., 4.]]))
    np.testing.assert_allclose(np.asarray(out),
                               [[0.2, 0.4, 0.2, 0.4, 0.2]], rtol=1e-6)


def test_quanonet_param_count_matches_checkpoint():
    # Q2 Net5-1-5-1 TF: 60 ansatz + 1 bias + 2x(10+10) freq = 101
    model = QuanONet(num_qubits=2, branch_input_size=10, trunk_input_size=1,
                     net_size=(5, 1, 5, 1), scale_coeff=0.001,
                     if_trainable_freq=True)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 10)),
                        jnp.ones((1, 1)))
    assert count_parameters(params) == 101
    # Q5 Net40-2-20-2 TF: 1800 + 1 + (200+200+100+100) = 2401
    model5 = QuanONet(num_qubits=5, branch_input_size=100, trunk_input_size=2,
                      net_size=(40, 2, 20, 2), if_trainable_freq=True)
    params5 = model5.init(jax.random.PRNGKey(0), jnp.ones((1, 100)),
                          jnp.ones((1, 2)))
    assert count_parameters(params5) == 2401


def test_quanonet_fixed_freq_has_no_freq_params():
    model = QuanONet(num_qubits=2, branch_input_size=10, trunk_input_size=1,
                     net_size=(5, 1, 5, 1), if_trainable_freq=False)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 10)),
                        jnp.ones((1, 1)))
    assert set(params['params'].keys()) == {'ansatz', 'bias'}


def test_heaqnn_no_bias():
    model = HEAQNN(num_qubits=3, input_size=8, net_size=(4, 2),
                   if_trainable_freq=True)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8)))
    assert set(params['params'].keys()) == {'ansatz', 'freq'}
    out = model.apply(params, jnp.ones((6, 8)))
    assert out.shape == (6, 1)
    assert np.abs(np.asarray(out)).max() <= 5.0 + 1e-5


def test_fnn_forward_and_structure():
    model = FNN(net_size=(3, 16))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 7)))
    # fc0 + 3 hidden + fc_out = 5 Dense layers (reference FNNLayer)
    assert len(params['params']['fnn']) == 5
    out = model.apply(params, jnp.ones((4, 7)))
    assert out.shape == (4, 1)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, jnp.ones((4, 7))) ** 2))(
        params)
    assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(g))


def test_deeponet_sizing_policy():
    # 2-arg: depth=4, width=32 both nets, p=32 (solver_dde.py:130-133)
    b, t = deeponet_layer_sizes([4, 32], 100, 1)
    assert b == (32, 32, 32, 32) and t == (32, 32, 32, 32)
    # 4-arg equal widths
    b, t = deeponet_layer_sizes([3, 16, 2, 16], 100, 1)
    assert b == (16, 16, 16) and t == (16, 16)
    # 4-arg mismatched widths -> p = min
    b, t = deeponet_layer_sizes([3, 32, 2, 16], 100, 1)
    assert b == (32, 32, 16) and t == (16, 16)
    # 5-arg explicit p
    b, t = deeponet_layer_sizes([3, 32, 2, 16, 8], 100, 1)
    assert b == (32, 32, 8) and t == (16, 8)


def test_deeponet_forward():
    bl, tl = deeponet_layer_sizes([2, 8], 10, 1)
    model = DeepONet(branch_layers=bl, trunk_layers=tl)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 10)),
                        jnp.ones((1, 1)))
    out = model.apply(params, jnp.ones((5, 10)), jnp.ones((5, 1)))
    assert out.shape == (5, 1)


def test_fno_forward_and_nyquist_guard():
    model = FNO(modes=8, width=12, layers=2, fc_hidden=16)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 32, 2).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (3, 32, 1)
    # complex weights stored as re+im floats; count matches PT complex x2
    n_spectral = sum(
        v.size for k, v in
        jax.tree_util.tree_leaves_with_path(params['params']['conv_0']))
    assert n_spectral == 12 * 12 * 8 * 2

    bad = FNO(modes=64, width=4, layers=1)
    with pytest.raises(ValueError, match="Nyquist"):
        bad.init(jax.random.PRNGKey(0), x)


@pytest.mark.parametrize("N,modes,ci,co", [
    (32, 8, 2, 3), (100, 15, 4, 4),
    (33, 17, 2, 2),   # odd length, modes == freq_size
    (32, 17, 3, 3),   # even length, Nyquist term included
])
def test_spectral_conv_matches_fft_reference(N, modes, ci, co):
    """The truncated real-DFT implementation (TPU has no complex64) must be
    numerically identical to the reference's rfft->slice->irfft
    (core/models_pt.py:237-252)."""
    from quanonet_tpu.models import SpectralConv1d
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, N, ci).astype(np.float32))
    layer = SpectralConv1d(ci, co, modes)
    params = layer.init(jax.random.PRNGKey(1), x)
    out = np.asarray(layer.apply(params, x))

    w = (np.asarray(params['params']['w_re'])
         + 1j * np.asarray(params['params']['w_im']))
    x_ft = np.fft.rfft(np.asarray(x), axis=1)
    out_modes = np.einsum('bfi,iof->bfo', x_ft[:, :modes, :], w)
    full = np.zeros((2, N // 2 + 1, co), complex)
    full[:, :modes] = out_modes
    ref = np.fft.irfft(full, n=N, axis=1)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fno_spectral_identity():
    # With zero spectral weights the conv output is 0 -> layer reduces to
    # relu(pointwise conv); checks the FFT plumbing doesn't distort shapes.
    from quanonet_tpu.models import SpectralConv1d
    layer = SpectralConv1d(2, 3, 4)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 2).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    out = layer.apply(zeroed, x)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)
    assert out.shape == (2, 16, 3)
