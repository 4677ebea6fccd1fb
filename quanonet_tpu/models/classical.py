"""
Classical baseline models: FNN, DeepONet, FNO (Flax).

Semantics mirror the reference:
* FNN — fc0 + depth hidden + fc_out, tanh, Xavier-normal init
  (reference core/layers.py:55-79, core/models_ms.py:129-143);
* DeepONet — branch MLP · σ(trunk MLP), summed, + scalar bias; the extra
  activation on the trunk output is the paper convention
  (core/models_ms.py:146-179, solver_dde.py:108-162 sizing policy lives in
  quanonet_tpu/solver.py);
* FNO — 1-D spectral convolution + 1x1 conv residual stack
  (core/models_pt.py:218-293).  Complex spectral weights are stored as
  separate (re, im) float32 leaves — optax/TPU friendly, and matching the
  MindSpore storage trick (core/models_ms.py:233-238).
"""
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_GLOROT = nn.initializers.glorot_normal()


class MLP(nn.Module):
    """Dense stack; activation after every layer except the last
    (reference FNNLayer, core/layers.py:55-79)."""
    layer_sizes: Tuple[int, ...]   # hidden+output widths (input inferred)

    @nn.compact
    def __call__(self, x):
        n = len(self.layer_sizes)
        for i, width in enumerate(self.layer_sizes):
            x = nn.Dense(width, kernel_init=_GLOROT, name=f'dense_{i}')(x)
            if i < n - 1:
                x = jnp.tanh(x)
        return x


class FNN(nn.Module):
    """net_size = (hidden_depth, hidden_width); output scalar
    (reference core/models_ms.py:129-143: fc0 + depth hidden + fc_out =>
    depth+1 hidden widths)."""
    net_size: Tuple[int, int]
    output_size: int = 1

    @nn.compact
    def __call__(self, x):
        depth, width = int(self.net_size[0]), int(self.net_size[1])
        sizes = tuple([width] * (depth + 1) + [self.output_size])
        return MLP(sizes, name='fnn')(x)


class DeepONet(nn.Module):
    """branch_layers / trunk_layers: widths after the input layer; the last
    entries must match (latent dimension p).  out = Σ_p b_p · σ(t_p) + bias."""
    branch_layers: Tuple[int, ...]
    trunk_layers: Tuple[int, ...]

    @nn.compact
    def __call__(self, branch_input, trunk_input):
        b = MLP(self.branch_layers, name='branch')(branch_input)
        t = MLP(self.trunk_layers, name='trunk')(trunk_input)
        t = jnp.tanh(t)  # basis-function activation (models_ms.py:175)
        bias = self.param('bias', nn.initializers.zeros, ())
        return jnp.sum(b * t, axis=1, keepdims=True) + bias


def deeponet_layer_sizes(net_config, branch_in, trunk_in):
    """The reference's net-size policy (solver_dde.py:119-162):
    2-arg [depth, width]; 4-arg [bd, bw, td, tw] (width-mismatch fallback
    p=min); 5-arg [bd, bw, td, tw, p]."""
    b_depth, b_width = 2, 10
    t_depth, t_width = 2, 10
    p = None
    net_config = list(net_config or [])
    if len(net_config) == 2:
        b_depth = t_depth = net_config[0]
        b_width = t_width = net_config[1]
        p = b_width
    elif len(net_config) == 4:
        b_depth, b_width, t_depth, t_width = net_config
        p = b_width if b_width == t_width else min(b_width, t_width)
    elif len(net_config) == 5:
        b_depth, b_width, t_depth, t_width, p = net_config

    if p is not None and (len(net_config) == 5 or b_width != t_width):
        branch = [b_width] * (b_depth - 1) + [p]
        trunk = [t_width] * (t_depth - 1) + [p]
    else:
        branch = [b_width] * b_depth
        trunk = [t_width] * t_depth
    return tuple(branch), tuple(trunk)


from functools import lru_cache


@lru_cache(maxsize=32)
def _dft_basis(n_points: int, modes: int):
    """Truncated real-DFT analysis/synthesis matrices.

    Exactly equivalent to rfft -> keep first ``modes`` -> zero-pad -> irfft
    (the reference FNO keeps only the low modes, core/models_pt.py:248-252),
    but in PURE REAL arithmetic: the TPU backend here cannot lower
    complex64, and O(N·modes) matmuls ride the MXU better than an FFT for
    the small mode counts FNO uses.

    Returns (cos_f, sin_f, cos_b, sin_b):
      X_re = x @ cos_f, X_im = x @ sin_f          (analysis, (N, modes))
      out  = X_re @ cos_b - X_im @ sin_b          (synthesis, (modes, N))
    """
    p = np.arange(n_points)[:, None]
    f = np.arange(modes)[None, :]
    ang = 2.0 * np.pi * p * f / n_points
    cos_f = np.cos(ang).astype(np.float32)
    sin_f = (-np.sin(ang)).astype(np.float32)
    # irfft synthesis weights: 1/N for f=0, 2/N for 0<f<N/2, 1/N at Nyquist
    weight = np.full(modes, 2.0 / n_points)
    weight[0] = 1.0 / n_points
    if n_points % 2 == 0 and modes == n_points // 2 + 1:
        weight[-1] = 1.0 / n_points
    cos_b = (weight[:, None] * np.cos(ang).T).astype(np.float32)
    sin_b = (weight[:, None] * np.sin(ang).T).astype(np.float32)
    return cos_f, sin_f, cos_b, sin_b


class SpectralConv1d(nn.Module):
    """Fourier spectral convolution (reference core/models_pt.py:218-252).
    Operates on (batch, n_points, channels); truncated real DFT along the
    points axis (see _dft_basis)."""
    in_channels: int
    out_channels: int
    modes: int

    @nn.compact
    def __call__(self, x):
        n_points = x.shape[1]
        freq_size = n_points // 2 + 1
        if self.modes > freq_size:
            raise ValueError(
                f"SpectralConv1d: modes={self.modes} exceeds Nyquist "
                f"freq_size={freq_size} for signal length {n_points}.")
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, self.modes)
        w_re = self.param('w_re', nn.initializers.uniform(scale), shape)
        w_im = self.param('w_im', nn.initializers.uniform(scale), shape)

        cos_f, sin_f, cos_b, sin_b = map(jnp.asarray,
                                         _dft_basis(n_points, self.modes))
        # analysis: (b, p, i) -> (b, modes, i)
        x_re = jnp.einsum('bpi,pf->bfi', x, cos_f)
        x_im = jnp.einsum('bpi,pf->bfi', x, sin_f)
        # complex channel mix per mode
        o_re = (jnp.einsum('bfi,iof->bfo', x_re, w_re)
                - jnp.einsum('bfi,iof->bfo', x_im, w_im))
        o_im = (jnp.einsum('bfi,iof->bfo', x_re, w_im)
                + jnp.einsum('bfi,iof->bfo', x_im, w_re))
        # synthesis back to (b, p, o)
        return (jnp.einsum('bfo,fp->bpo', o_re, cos_b)
                - jnp.einsum('bfo,fp->bpo', o_im, sin_b))


class FNO(nn.Module):
    """1-D Fourier Neural Operator (reference core/models_pt.py:255-293).
    Input (batch, n_points, in_channels) -> (batch, n_points, 1)."""
    modes: int
    width: int
    layers: int = 1
    fc_hidden: int = 32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.width, name='fc0')(x)
        for i in range(self.layers):
            x1 = SpectralConv1d(self.width, self.width, self.modes,
                                name=f'conv_{i}')(x)
            x2 = nn.Dense(self.width, name=f'w_{i}')(x)  # 1x1 conv
            x = nn.relu(x1 + x2)
        x = nn.relu(nn.Dense(self.fc_hidden, name='fc1')(x))
        return nn.Dense(1, name='fc2')(x)
