"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

This is the TPU-native answer to "test multi-node without a cluster"
(SURVEY.md §4): all sharding/collective tests run against 8 virtual CPU
devices, so the exact pjit/shard_map programs used on a TPU pod slice are
exercised in CI.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The environment's sitecustomize may have imported jax already (with a TPU
# plugin registered); the env var alone is then too late — force the
# platform through the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"


@pytest.fixture
def rng():
    return np.random.default_rng(777)
