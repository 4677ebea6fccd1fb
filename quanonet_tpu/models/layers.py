"""
Frequency-mapping layers shared by the quantum models.

Semantics mirror the reference exactly (checkpoint-parity critical):

* trainable-freq (TF) mode: tile the input cyclically to
  depth*num_qubits, then elementwise ``x*w + b``
  (reference core/layers.py:96-107 RepeatLayer + :14-30 LinearLayer,
  composed at core/models_ms.py:56-64).
  Init: w = scale_coeff constant, b ~ U(-π, π) — the MindSpore original's
  convention (core/layers.py:25-27; the reference's PyTorch mirror
  zero-inits bias, models_pt.py:36 — a known cross-framework discrepancy,
  SURVEY.md §2b; we follow the original).
* fixed mode: elementwise * scale_coeff then tile
  (core/models_ms.py:66-73); no parameters.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def tile_to(x, out_features):
    """Cyclically tile (batch, m) -> (batch, out_features)
    (reference core/layers.py:96-107)."""
    m = x.shape[-1]
    reps = out_features // m + 1
    return jnp.tile(x, (1,) * (x.ndim - 1) + (reps,))[..., :out_features]


class TrainableFreq(nn.Module):
    """Tile + trainable elementwise affine (TF mode)."""
    out_features: int
    init_scale: float = 0.01
    bias_init_range: float = float(np.pi)

    @nn.compact
    def __call__(self, x):
        w = self.param(
            'weights',
            lambda key, shape: jnp.full(shape, self.init_scale, jnp.float32),
            (self.out_features,))
        r = self.bias_init_range
        b = self.param(
            'bias',
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, minval=-r, maxval=r),
            (self.out_features,))
        return tile_to(x, self.out_features) * w + b


class FixedScale(nn.Module):
    """Scale by a constant then tile (fixed-freq mode); parameter-free."""
    out_features: int
    scale: float = 0.01

    @nn.compact
    def __call__(self, x):
        return tile_to(x * self.scale, self.out_features)
