from quanonet_tpu.models.classical import (
    FNN, FNO, DeepONet, MLP, SpectralConv1d, deeponet_layer_sizes,
)
from quanonet_tpu.models.quanonet import HEAQNN, QuanONet
