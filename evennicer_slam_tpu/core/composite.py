"""Volume-rendering compositor: raw decoder outputs -> depth / variance / rgb.

Replaces reference ``raw2outputs_nerf_color`` (src/common.py:256-297) in both
modes: occupancy (``alpha = sigmoid(10 * raw)``, NICE-SLAM) and volume density
(``alpha = 1 - exp(-relu(raw) * dist)``, iMAP*). Pure function — the reference
mutates ``raw[..., 3]`` in place; here nothing is mutated.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def composite_rays(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    occupancy: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite raw predictions along rays.

    Args:
        raw:    [N, S, 4] — rgb in [..., :3], occupancy/density in [..., 3].
        z_vals: [N, S] sample depths along each ray.
        rays_d: [N, 3] ray directions (non-unit; scales density intervals).
        occupancy: True -> occupancy mode; False -> density mode.

    Returns:
        (depth [N], depth_var [N], rgb [N, 3], weights [N, S])
    """
    rgb = raw[..., :-1]
    # interval lengths (used by density mode)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    if occupancy:
        alpha = jax.nn.sigmoid(10.0 * raw[..., -1])
    else:
        alpha = 1.0 - jnp.exp(-jnp.maximum(raw[..., -1], 0.0) * dists)

    # transmittance: cumprod of (1 - alpha + 1e-10), exclusive
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1
        ),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    tmp = z_vals - depth_map[..., None]
    depth_var = jnp.sum(weights * tmp * tmp, axis=-1)
    return depth_map, depth_var, rgb_map, weights
