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

# Persistent compilation cache for the suite (same mechanism the production
# setup_jax uses, separate dir so test-shaped executables don't mix with the
# chip's). Two effects: reruns skip LLVM entirely for unchanged executables,
# and — because compiles are the segfault surface (see below) — a warm cache
# removes most LLVM invocations from the process.
_test_cache = os.environ.get(
    "ENSLAM_TEST_JAX_CACHE", os.path.expanduser("~/.jax_cache_tests")
)
os.makedirs(_test_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _test_cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_cache_growth():
    """Clear compiled-executable caches after each test module (see above)."""
    yield
    jax.clear_caches()


_TESTS_SINCE_CLEAR = [0]


@pytest.fixture(autouse=True)
def _bound_jit_cache_growth_within_module():
    """The per-module clear was not enough: test_slam.py alone compiles
    enough pipeline executables to crash LLVM late in the module (observed
    segfault in backend_compile_and_load at test 27/27). Clear every 8 tests
    too — with the persistent disk cache above, a clear costs a cache reload,
    not a recompile."""
    yield
    _TESTS_SINCE_CLEAR[0] += 1
    if _TESTS_SINCE_CLEAR[0] >= 8:
        _TESTS_SINCE_CLEAR[0] = 0
        jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
