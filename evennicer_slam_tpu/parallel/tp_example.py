"""EXAMPLE: grid-channel tensor parallelism for the scene representation.

STATUS: example / experiment — NOT part of the production pipeline.

The production multi-chip strategy is data-parallel ray sharding
(``sharding.pipeline_dp_sharding``), threaded through the real tracker and
mapper: rays are where the compute is, and at the reference workloads the
feature grids are only ~50 MB (Replica room, fine 0.16 m) — replicating them
per chip costs a trivial slice of HBM, so channel-sharding them buys nothing
until scenes grow ~2 orders of magnitude (city-block scale at the same
resolution). This module is kept as the worked recipe for that regime: grids
shard ``[Z, Y, X, C/tp]`` on a 2-D ``(dp, tp)`` mesh, gathers stay local per
channel shard, and the feature-injection matmul psums over tp. It is
exercised by tests/test_parallel.py and the driver dryrun as an example, not
dispatched by any pipeline config.
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
