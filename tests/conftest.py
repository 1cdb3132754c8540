"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding paths compile and run without TPU hardware."""

import os

# NOTE: the JAX_PLATFORMS env var is ignored when the axon TPU plugin is
# present; jax.config.update is the reliable way to force the CPU backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
