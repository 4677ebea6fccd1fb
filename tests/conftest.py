"""
Test configuration: run every test on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware (SURVEY.md §4,
"Multi-node testing").  Must set env BEFORE jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the outer env pins the TPU plugin
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU here.
jax.config.update("jax_platforms", "cpu")

# Suite wall time on this single-core box IS XLA compile time; persist
# compiled programs so repeat runs skip them.  Test-specific dir (NOT the
# shared .jax_cache) so no cross-platform/TPU entries ever load here.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
    yield
