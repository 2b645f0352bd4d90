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

import resource

# The full suite compiles hundreds of XLA executables on one process. Late in
# the run the accumulated JIT state can crash LLVM inside
# backend_compile_and_load (observed: deterministic segfault at ~84% of the
# suite that no single module reproduces). Two mitigations, both cheap:
# raise the main-thread stack soft limit (LLVM passes recurse deeply), and
# drop compiled-executable caches between test modules so JIT code mappings
# don't accumulate toward vm.max_map_count.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 * 1024 * 1024
if _soft != resource.RLIM_INFINITY and _soft < _want:
    try:
        resource.setrlimit(
            resource.RLIMIT_STACK,
            (_want if _hard == resource.RLIM_INFINITY else min(_want, _hard),
             _hard),
        )
    except (ValueError, OSError):
        pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_cache_growth():
    """Clear compiled-executable caches after each test module (see above)."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
