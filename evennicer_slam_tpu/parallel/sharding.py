"""Multi-chip scale-out: device mesh + sharding strategy for SLAM workloads.

The reference's only parallelism is 3 CPU processes + shared memory on one
GPU (reference src/EvenNICER_SLAM.py:313-332; SURVEY.md §2 parallelism
table). The TPU-native scaling axes are different (SURVEY.md §5): rays and
query points shard perfectly, and the feature-grid channel dimension shards
the grid-gather + per-block feature matmuls.

Strategy implemented here over a 2-D logical mesh ``(dp, tp)``:

- **dp (ray/data parallel)**: ray batches are sharded row-wise; rendering and
  per-ray losses are embarrassingly parallel, and XLA inserts one psum for
  the scalar loss / gradient reduction — this is classic DP riding ICI.
- **tp (feature/tensor parallel)**: feature grids shard on the channel axis
  ``[Z, Y, X, C/tp]`` and each decoder's ``fc_c`` input projections shard on
  their input dim, so grid gathers stay local per shard and the feature
  injection matmul contracts over the sharded axis with a psum — tensor
  parallelism for the scene representation (the dominant memory).

Everything is expressed with ``jax.sharding.NamedSharding`` constraints under
``jit``; GSPMD chooses the collective schedule.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evennicer_slam_tpu.render.renderer import RenderSettings, render_rays
from evennicer_slam_tpu.utils.optim import adam_init, adam_update


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


def make_mesh(n_devices: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """Logical (dp, tp) mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    devs = devs[:n]
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // tp
    arr = np.array(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Feature grids [Z, Y, X, C]: channel axis over tp."""
    return NamedSharding(mesh, P(None, None, None, "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, grids: Dict[str, jnp.ndarray], decoders: Any):
    """Place grids channel-sharded and decoders replicated on the mesh."""
    gsh = grid_sharding(mesh)
    grids = {k: jax.device_put(v, gsh) for k, v in grids.items()}
    decoders = jax.device_put(decoders, replicated(mesh))
    return grids, decoders


def _sharded_loss(
    grids,
    decoders,
    rays_o,
    rays_d,
    gt_depth,
    gt_color,
    bound,
    mesh: Mesh,
    settings: RenderSettings,
    stage: str,
    w_color_loss: float,
):
    # constrain the ray batch to be dp-sharded; everything downstream
    # (sampling, grid gathers, decoder matmuls, compositing) partitions
    # row-wise and the scalar loss reduction becomes a psum over dp
    spec = NamedSharding(mesh, P("dp", None))
    rays_o = jax.lax.with_sharding_constraint(rays_o, spec)
    rays_d = jax.lax.with_sharding_constraint(rays_d, spec)
    depth, _, color = render_rays(
        decoders, grids, rays_o, rays_d, bound, stage, settings, gt_depth=gt_depth
    )
    mask = gt_depth > 0
    loss = jnp.sum(jnp.abs(gt_depth - depth) * mask)
    if stage == "color":
        loss = loss + w_color_loss * jnp.sum(jnp.abs(gt_color - color))
    return loss


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "settings", "stage", "lr", "w_color_loss"),
)
def _multichip_step(
    grids, decoders, adam_state, rays_o, rays_d, gt_depth, gt_color, bound,
    mesh, settings, stage, lr, w_color_loss,
):
    params = (grids, decoders)
    loss, grads = jax.value_and_grad(
        lambda p: _sharded_loss(
            p[0], p[1], rays_o, rays_d, gt_depth, gt_color, bound,
            mesh, settings, stage, w_color_loss,
        )
    )(params)
    new_params, new_state = adam_update(grads, adam_state, params, lr)
    return new_params[0], new_params[1], new_state, loss


def multichip_train_step(
    mesh: Mesh,
    grids,
    decoders,
    adam_state,
    rays_o,
    rays_d,
    gt_depth,
    gt_color,
    bound,
    settings: RenderSettings,
    stage: str = "color",
    lr: float = 0.01,
    w_color_loss: float = 0.2,
):
    """One sharded mapping-style training step: render sharded rays, psum
    gradients, Adam-update grids+decoders. Returns (grids, decoders, state,
    loss). The jitted executable is module-level (keyed on the hashable
    mesh/settings/stage statics) so repeated calls hit the jit cache."""
    with mesh:
        return _multichip_step(
            grids, decoders, adam_state, rays_o, rays_d, gt_depth, gt_color,
            bound, mesh, settings, stage, lr, w_color_loss,
        )


def init_multichip_state(mesh: Mesh, grids, decoders):
    grids, decoders = shard_params(mesh, grids, decoders)
    return grids, decoders, adam_init((grids, decoders))
