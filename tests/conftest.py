"""Test config: force an 8-device virtual CPU platform so sharding tests run
without TPU hardware (mirrors the reference's CPU-marked DeviceThreadPool tests,
see SURVEY.md §4).

The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS at register time,
so the env var alone is not enough — we must also update jax.config after
import but before any backend is initialized. Real-chip runs go through
bench.py / __graft_entry__.py, never pytest.
"""

import os

# GPTQ_TPU_REAL_CHIP=1 opts a pytest invocation onto the real device for
# the on-chip-only band/speed tests (tests/test_speed_bands.py,
# tests/test_inference_speed.py) — select those files explicitly; the rest
# of the suite is written for the virtual CPU mesh.
_REAL_CHIP = os.environ.get("GPTQ_TPU_REAL_CHIP", "0") == "1"

if not _REAL_CHIP:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _REAL_CHIP:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
