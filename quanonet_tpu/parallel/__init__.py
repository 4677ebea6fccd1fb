from quanonet_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, make_dp_train_step,
)
from quanonet_tpu.parallel.pipeline import make_pipeline_hea
from quanonet_tpu.parallel.shard_engine import (
    clear_shard_context, get_shard_context, set_shard_context,
)
