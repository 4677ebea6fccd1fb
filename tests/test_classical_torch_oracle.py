"""
Classical-model cross-implementation oracle: independent TORCH (f64)
implementations of FNN, DeepONet, and FNO — sharing no code with the Flax
modules, and using torch.fft for the FNO spectral layer where the Flax
module uses a truncated real-DFT matmul (models/classical.py:_dft_basis)
— must agree with the JAX models on forward values AND full gradients.

This mirrors the reference's classical parity suite
(/root/reference/compare_backends.py:456-637: FNN/DeepONet/FNO PT vs MS,
fwd <=1e-5, grads <=2e-5, tolerances :26-31) with torch playing the
independent-framework role, exactly as tests/test_torch_oracle.py does
for the quantum engine.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from quanonet_tpu.models import FNN, FNO, DeepONet, deeponet_layer_sizes

FWD_TOL = 1e-5    # reference compare_backends.py:28
GRAD_TOL = 2e-5   # reference compare_backends.py:31

F64 = torch.float64


def _t(arr):
    return torch.tensor(np.asarray(arr, np.float64), dtype=F64,
                        requires_grad=True)


def _params_to_torch(tree):
    """Mirror the flax param pytree as a dict of torch leaf tensors
    (same structure, requires_grad)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): _t(leaf) for path, leaf in flat}


def _compare_grads(jax_grads, torch_params):
    flat = jax.tree_util.tree_flatten_with_path(jax_grads)[0]
    assert flat, "empty gradient tree"
    for path, g in flat:
        tp = torch_params[jax.tree_util.keystr(path)]
        assert tp.grad is not None, f"no torch grad at {path}"
        np.testing.assert_allclose(
            np.asarray(g, np.float64), tp.grad.numpy(),
            atol=GRAD_TOL, rtol=0,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}")


def t_mlp(tp, prefix, x, n_layers, final_act=False):
    """Dense stack, tanh between layers (independent of models.MLP)."""
    for i in range(n_layers):
        w = tp[f"{prefix}['dense_{i}']['kernel']"]
        b = tp[f"{prefix}['dense_{i}']['bias']"]
        x = x @ w + b
        if i < n_layers - 1 or final_act:
            x = torch.tanh(x)
    return x


def test_fnn_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(7, 5).astype(np.float32)
    y = rng.randn(7, 1).astype(np.float32)
    model = FNN(net_size=(2, 8))
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(x))

    def jloss(p):
        out = model.apply(p, jnp.asarray(x))
        return jnp.mean((out - y) ** 2), out

    (jl, jout), jg = jax.value_and_grad(jloss, has_aux=True)(params)

    tp = _params_to_torch(params)
    tout = t_mlp(tp, "['params']['fnn']", _t(x).detach(), n_layers=4)
    tl = torch.mean((tout - torch.tensor(y, dtype=F64)) ** 2)
    tl.backward()

    np.testing.assert_allclose(np.asarray(jout, np.float64),
                               tout.detach().numpy(), atol=FWD_TOL, rtol=0)
    np.testing.assert_allclose(float(jl), float(tl), atol=FWD_TOL, rtol=0)
    _compare_grads(jg, tp)


def test_deeponet_matches_torch():
    rng = np.random.RandomState(1)
    bx = rng.randn(6, 10).astype(np.float32)
    tx = rng.rand(6, 2).astype(np.float32)
    y = rng.randn(6, 1).astype(np.float32)
    bl, tl_sizes = deeponet_layer_sizes([2, 8, 3, 8], 10, 2)
    model = DeepONet(branch_layers=bl, trunk_layers=tl_sizes)
    params = model.init(jax.random.PRNGKey(2), jnp.asarray(bx),
                        jnp.asarray(tx))

    def jloss(p):
        out = model.apply(p, jnp.asarray(bx), jnp.asarray(tx))
        return jnp.mean((out - y) ** 2), out

    (jl, jout), jg = jax.value_and_grad(jloss, has_aux=True)(params)

    tp = _params_to_torch(params)
    b = t_mlp(tp, "['params']['branch']", _t(bx).detach(), len(bl))
    t = t_mlp(tp, "['params']['trunk']", _t(tx).detach(), len(tl_sizes),
              final_act=True)   # trunk basis activation (models_ms.py:175)
    tout = torch.sum(b * t, dim=1, keepdim=True) + tp["['params']['bias']"]
    tloss = torch.mean((tout - torch.tensor(y, dtype=F64)) ** 2)
    tloss.backward()

    np.testing.assert_allclose(np.asarray(jout, np.float64),
                               tout.detach().numpy(), atol=FWD_TOL, rtol=0)
    _compare_grads(jg, tp)


def _t_fno(tp, x, modes, layers):
    """Independent torch FNO using torch.fft.rfft/irfft — checks the Flax
    truncated-real-DFT formulation against a genuine FFT."""
    x = x @ tp["['params']['fc0']['kernel']"] + tp["['params']['fc0']['bias']"]
    n_points = x.shape[1]
    for i in range(layers):
        X = torch.fft.rfft(x, dim=1)                      # (b, f, c)
        W = (tp[f"['params']['conv_{i}']['w_re']"]
             + 1j * tp[f"['params']['conv_{i}']['w_im']"])  # (i, o, modes)
        mixed = torch.einsum('bfi,iof->bfo', X[:, :modes, :], W)
        out_f = torch.zeros((x.shape[0], n_points // 2 + 1, mixed.shape[2]),
                            dtype=torch.complex128)
        out_f[:, :modes] = mixed
        x1 = torch.fft.irfft(out_f, n=n_points, dim=1)
        x2 = x @ tp[f"['params']['w_{i}']['kernel']"] \
            + tp[f"['params']['w_{i}']['bias']"]
        x = torch.relu(x1 + x2)
    x = torch.relu(x @ tp["['params']['fc1']['kernel']"]
                   + tp["['params']['fc1']['bias']"])
    return x @ tp["['params']['fc2']['kernel']"] + tp["['params']['fc2']['bias']"]


@pytest.mark.parametrize('n_points,modes', [(16, 5), (15, 8)])
def test_fno_matches_torch(n_points, modes):
    """Odd and even signal lengths (the irfft weight conventions differ);
    modes=8 on 15 points = full Nyquist band."""
    rng = np.random.RandomState(2)
    x = rng.randn(4, n_points, 2).astype(np.float32)
    y = rng.randn(4, n_points, 1).astype(np.float32)
    model = FNO(modes=modes, width=6, layers=2, fc_hidden=9)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(x))

    def jloss(p):
        out = model.apply(p, jnp.asarray(x))
        return jnp.mean((out - y) ** 2), out

    (jl, jout), jg = jax.value_and_grad(jloss, has_aux=True)(params)

    tp = _params_to_torch(params)
    tout = _t_fno(tp, _t(x).detach(), modes, layers=2)
    tloss = torch.mean((tout - torch.tensor(y, dtype=F64)) ** 2)
    tloss.backward()

    np.testing.assert_allclose(np.asarray(jout, np.float64),
                               tout.detach().numpy(), atol=FWD_TOL, rtol=0)
    _compare_grads(jg, tp)
