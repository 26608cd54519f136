"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding tests spoof devices via
--xla_force_host_platform_device_count (SURVEY.md §4.6); numeric tests run in
float64-capable mode where needed via jax.config.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment may pin JAX_PLATFORMS to a hardware plugin; the config
# update below reliably forces the CPU backend for the test suite
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
