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
the reference workloads the grids are small enough that replicating them per
chip is free and the compute lives in the rays. Measured sizes (c_dim 32,
f32, reference grid_len): ~50 MB at the real Replica room0 bound
(configs/Replica/room0.yaml — the number tools/project_dp.py calibrates its
mapping all-reduce estimate with) and ~2.5 MB at the smaller synthetic
bench-scene bound. The worked TP recipe for the far-larger-scene regime
lives in ``parallel/tp_example.py`` (example status, documented there).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

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


# ---------------------------------------------------------------------------
# concurrent tracker/mapper device groups (sync_method: loose | free)
# ---------------------------------------------------------------------------

class SubmeshPlan(NamedTuple):
    """Disjoint device groups for true tracker/mapper concurrency.

    The reference's ``sync_method: loose``/``free`` let the tracker run
    ahead of the mapper because they are separate PROCESSES sharing one GPU
    (reference src/Tracker.py:281-295, src/Mapper.py:743-757). The
    TPU-native equivalent is separate DEVICE GROUPS in one process: the
    tracker's programs execute on ``track`` devices while mapping programs
    execute simultaneously on ``map`` devices — JAX dispatch is
    asynchronous per device, so the two queues drain in parallel with no
    threads and no IPC. Grids flow mapper→tracker by an explicit
    ``jax.device_put`` snapshot at adoption points, exactly the reference's
    ``update_para_from_mapping`` copy.
    """

    track_dp: Optional[NamedSharding]  # ray-dp over the track group (None if 1 device)
    map_dp: Optional[NamedSharding]    # ray-dp over the map group (None if 1 device)
    track_repl: NamedSharding          # replicated placement on the track group
    map_repl: NamedSharding            # replicated placement on the map group

    @property
    def n_track(self) -> int:
        return len(self.track_repl.mesh.devices.ravel())

    @property
    def n_map(self) -> int:
        return len(self.map_repl.mesh.devices.ravel())


def concurrent_submeshes(cfg: Dict[str, Any]) -> Optional[SubmeshPlan]:
    """Build the (track, map) device split, or None when unavailable.

    Enabled by ``sync_method: loose|free`` together with
    ``parallel.map_devices`` = K (int; ``'auto'`` = 1/4 of the devices,
    min 1). The map group takes the LAST K devices; the track group gets the
    rest. With fewer than K+1 devices (e.g. the single bench chip) this
    returns None and loose/free fall back to the strict schedule — the
    documented single-device behavior."""
    sync = cfg.get("sync_method", "strict")
    if sync not in ("loose", "free"):
        return None
    want = cfg.get("parallel", {}).get("map_devices", 0)
    devs = jax.devices()
    if want == "auto":
        k = max(1, len(devs) // 4)
    else:
        k = int(want or 0)
    if k <= 0 or len(devs) < k + 1:
        return None
    track_devs, map_devs = devs[: len(devs) - k], devs[len(devs) - k:]

    def group(ds):
        mesh = Mesh(np.array(ds), ("dp",))
        dp = NamedSharding(mesh, P("dp")) if len(ds) > 1 else None
        return dp, NamedSharding(mesh, P())

    track_dp, track_repl = group(track_devs)
    map_dp, map_repl = group(map_devs)
    return SubmeshPlan(track_dp, map_dp, track_repl, map_repl)
