"""
quanonet_tpu — a TPU-native (JAX/XLA/Pallas) framework for quantum neural
operator learning, feature-complete with the QuanONet reference
(Wang-Ruocheng/QuanONet) but re-designed TPU-first:

* ONE jit/vmap statevector engine replaces the reference's five quantum
  backends (MindQuantum / TorchQuantum / Qiskit / PennyLane / DeepXDE,
  see reference utils/backend.py:49-129).  Circuits compile to dense
  per-block unitaries that ride the MXU; a Pallas fused kernel covers the
  hot path; a gate-by-gate einsum path is the correctness oracle and the
  large-qubit fallback.
* ONE optax solver replaces the reference's three training loops
  (solvers/solver_ms.py, solver_pt.py, solver_dde.py).
* jax.sharding.Mesh data/seed parallelism (new capability — the reference
  has no distributed support, SURVEY.md §5.8).

Checkpoint interchange: the reference's framework-neutral ``.npz`` schema
(keys ``bias``, ``QuanONet.weight``, ``{branch,trunk}_LinearLayer.Net2.*``)
and its MindSpore ``.ckpt`` protobuf are both loaded natively
(quanonet_tpu/checkpoint.py) — no MindSpore required.
"""

__version__ = "0.1.0"

from quanonet_tpu.config import load_config, get_base_parser, set_random_seed
from quanonet_tpu.logger import ExperimentLogger, get_experiment_id
from quanonet_tpu.metrics import compute_metrics, rel_l2
