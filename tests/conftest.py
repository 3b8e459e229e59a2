"""Test config: force an 8-device virtual CPU platform so sharding tests run
without TPU hardware (mirrors the reference's CPU-marked DeviceThreadPool tests,
see SURVEY.md §4)."""

import os

# Must be set before jax import. Override the session's axon/TPU platform:
# unit tests run on a virtual 8-device CPU mesh (real-chip runs go through
# bench.py / __graft_entry__.py).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
