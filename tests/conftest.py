"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
imports so multi-chip sharding tests run anywhere (SURVEY.md §4)."""

import os
import sys

# Force CPU regardless of the ambient environment (the driver exports
# JAX_PLATFORMS=axon for the real chip and a sitecustomize imports jax before
# this file runs, so plain env mutation is too late — use config.update).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
