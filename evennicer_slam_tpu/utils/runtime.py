"""JAX runtime setup: persistent compilation cache + platform knobs.

First-compile latency on TPU is tens of seconds per executable (SURVEY.md
perf note); the persistent cache makes every subsequent process start warm.
"""

from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str = None, cpu: bool = False) -> None:
    """Idempotent JAX configuration. Call before building any pipeline."""
    global _DONE
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    if _DONE:
        return
    cache_dir = cache_dir or os.environ.get(
        "ENSLAM_JAX_CACHE", os.path.expanduser("~/.jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _DONE = True
