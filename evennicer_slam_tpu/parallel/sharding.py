"""Multi-chip scale-out: the PRODUCTION sharding strategy (data parallelism).

The reference's only parallelism is 3 CPU processes + shared memory on one
GPU (reference src/EvenNICER_SLAM.py:313-332; SURVEY.md §2 parallelism
table). The TPU-native scaling axis is different (SURVEY.md §5): rays and
query points shard perfectly. The production strategy is therefore **dp ray
sharding** over a 1-D device mesh: ray batches shard row-wise; rendering and
per-ray losses are embarrassingly parallel; XLA inserts one psum for the
scalar loss / gradient reductions — classic DP riding ICI, expressed as
``NamedSharding`` constraints under ``jit`` with GSPMD choosing the
collective schedule. tests/test_pipeline_sharding.py pins both the numerics
(dp=8 == dp=1) and the compiled structure (no grid-sized collectives in the
hot loops).

Grid-channel tensor parallelism is deliberately NOT a production feature: at
the reference workloads the grids are ~50 MB, so replicating them per chip is
free and the compute lives in the rays. The worked TP recipe for the
far-larger-scene regime lives in ``parallel/tp_example.py`` (example status,
documented there).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_dp_sharding(cfg: Dict[str, Any]) -> Optional[NamedSharding]:
    """Ray-batch sharding for the PRODUCTION pipeline (tracker + mapper).

    ``cfg['parallel']['data_parallel']``: ``'auto'`` (default) uses every
    local accelerator device; an int pins the dp size; 1 disables. On the CPU
    backend 'auto' resolves to 1 so the (virtual-device) test environment
    keeps its single-device numerics; tests opt in with an explicit int.

    Returns a NamedSharding P('dp', None) over a 1-D mesh, or None when dp=1.
    The tracker/mapper jits take this as a static argument and constrain
    their ray batches with it — GSPMD then partitions sampling, grid
    gathers, decoding, and compositing row-wise across chips and inserts one
    psum for the scalar loss / pose-gradient reduction, riding ICI.
    """
    want = cfg.get("parallel", {}).get("data_parallel", "auto")
    devs = jax.devices()
    if want == "auto":
        n = len(devs) if jax.default_backend() != "cpu" else 1
    else:
        n = int(want)
    n = max(1, min(n, len(devs)))
    if n == 1:
        return None
    mesh = Mesh(np.array(devs[:n]), ("dp",))
    return NamedSharding(mesh, P("dp"))


def constrain_dp(x: jnp.ndarray, dp: Optional[NamedSharding]):
    """Shard array rows over the dp mesh axis (no-op when dp is None)."""
    if dp is None:
        return x
    spec = P("dp", *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(dp.mesh, spec)
    )
