"""Test harness: CPU backend with 8 virtual devices so pjit/shard_map sharding
is exercised without TPU hardware (SURVEY.md §4 distributed-test strategy).

The container's sitecustomize imports jax and registers the TPU backend before
pytest starts, so env vars alone are too late — we force the platform via
``jax.config.update`` before any backend is initialized by tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # float64 oracles; train paths pin f32 explicitly

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
