"""Scene-bound geometry: coordinate normalization and ray/box interaction.

Replaces reference ``normalize_3d_coordinate`` (src/common.py:342-357, which
mutated its input) and the inline ray-bound-exit computations
(src/utils/Renderer.py:99-106, src/Tracker.py:163-169).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_3d_coordinate(p: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """Map world coordinates ``[..., 3]`` into [-1, 1]^3 for the given bound
    ``[3, 2]``. Pure (no in-place mutation, unlike the reference)."""
    lo = bound[:, 0]
    hi = bound[:, 1]
    return (p - lo) / (hi - lo) * 2.0 - 1.0


def ray_bound_exit(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, bound: jnp.ndarray
) -> jnp.ndarray:
    """Distance along each ray to its exit from the axis-aligned scene bound.

    For each axis the ray crosses both bound planes at
    ``t = (bound - o) / d``; the exit distance is
    ``min_axis(max(t_axis_lo, t_axis_hi))`` — exactly the reference recipe
    (src/utils/Renderer.py:100-104). Returns [N].
    """
    t = (bound[None, :, :] - rays_o[..., :, None]) / rays_d[..., :, None]  # [N,3,2]
    return jnp.min(jnp.max(t, axis=-1), axis=-1)


def inside_bound_mask(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gt_depth: jnp.ndarray,
    bound: jnp.ndarray,
) -> jnp.ndarray:
    """Mask of rays whose surface (gt_depth) lies inside the scene bound:
    bound-exit distance >= gt depth (reference src/Tracker.py:163-169).

    The reference drops masked-out rays (dynamic shape); callers here keep the
    fixed shape and zero those rays' loss contributions instead.
    """
    return ray_bound_exit(rays_o, rays_d, bound) >= gt_depth


def points_inside_bound(p: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """Strict inside-test per point ``[..., 3]`` (reference
    src/utils/Renderer.py:44-47 uses strict inequalities)."""
    return jnp.all((p < bound[:, 1]) & (p > bound[:, 0]), axis=-1)
