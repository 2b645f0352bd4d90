"""Ray generation and pixel sampling under explicit PRNG keys.

Replaces reference src/common.py:74-187,300-340. The camera model is the
reference's: pixel (i=u, j=v) maps to camera-frame direction
``[(i-cx)/fx, -(j-cy)/fy, -1]`` (y/z flipped, OpenGL-style), rotated by the
camera-to-world rotation.

All sampling takes a ``jax.random`` key so tracker/mapper steps are fully
deterministic and jittable (the reference used global torch RNG state).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _pixel_dirs(i: jnp.ndarray, j: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Camera-frame direction for pixel coords (i=column/u, j=row/v)."""
    return jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1
    )


def rays_from_uv(
    i: jnp.ndarray,
    j: jnp.ndarray,
    c2w: jnp.ndarray,
    fx,
    fy,
    cx,
    cy,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for given pixel coordinates under pose ``c2w`` ([3,4] or [4,4]).

    Returns (rays_o, rays_d) each ``[..., 3]``. Differentiable wrt ``c2w``
    (used for pose optimization). Mirrors reference ``get_rays_from_uv``
    (src/common.py:74-89).
    """
    dirs = _pixel_dirs(i, j, fx, fy, cx, cy)
    # explicit multiply-add (not matmul): tiny 3x3 contraction stays on the
    # VPU in full f32 — TPU matmul's default bf16 passes would cost ~1e-3 of
    # ray-direction precision.
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays(H: int, W: int, fx, fy, cx, cy, c2w: jnp.ndarray):
    """Full-image ray grid, shapes ``[H, W, 3]`` (reference src/common.py:300-318)."""
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    return rays_from_uv(i, j, c2w, fx, fy, cx, cy)


def get_rays_rescale(H: int, W: int, new_H: int, new_W: int, fx, fy, cx, cy, c2w):
    """Ray grid for a downscaled image: ``new_W x new_H`` pixel centers placed
    on a linspace over the ORIGINAL image plane [0, W-1] x [0, H-1]
    (reference src/common.py:320-340). Used for the 0.15-scale event render.
    """
    ii = jnp.linspace(0.0, W - 1.0, new_W)
    jj = jnp.linspace(0.0, H - 1.0, new_H)
    j, i = jnp.meshgrid(jj, ii, indexing="ij")
    return rays_from_uv(i, j, c2w, fx, fy, cx, cy)


def sample_pixels(
    key: jax.Array,
    n: int,
    H0: int,
    H1: int,
    W0: int,
    W1: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``n`` pixel coordinates uniformly (with replacement) from the
    image region rows [H0, H1), cols [W0, W1).

    Returns float (i, j) arrays of shape [n] — i is the column (u), j the row
    (v), matching reference ``get_sample_uv`` (src/common.py:92-158).
    """
    region = (H1 - H0) * (W1 - W0)
    idx = jax.random.randint(key, (n,), 0, region)
    j = H0 + idx // (W1 - W0)
    i = W0 + idx % (W1 - W0)
    return i.astype(jnp.float32), j.astype(jnp.float32)


def gather_pixels(img: jnp.ndarray, i: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
    """Gather per-pixel values ``img[j, i]`` for float pixel coords that are
    exact integers (as produced by :func:`sample_pixels`)."""
    ji = j.astype(jnp.int32)
    ii = i.astype(jnp.int32)
    return img[ji, ii]


def get_samples(
    key: jax.Array,
    H0: int,
    H1: int,
    W0: int,
    W1: int,
    n: int,
    fx,
    fy,
    cx,
    cy,
    c2w: jnp.ndarray,
    depth: jnp.ndarray,
    color: jnp.ndarray,
    *extra_images: jnp.ndarray,
):
    """Sample ``n`` random rays from an image region with their depth/color
    (and any extra per-pixel images, e.g. event channels).

    Mirrors reference ``get_samples`` / ``get_samples_event``
    (src/common.py:160-187). Returns
    ``(rays_o, rays_d, depth_s, color_s, *extra_s)``.
    """
    i, j = sample_pixels(key, n, H0, H1, W0, W1)
    rays_o, rays_d = rays_from_uv(i, j, c2w, fx, fy, cx, cy)
    out = [rays_o, rays_d, gather_pixels(depth, i, j), gather_pixels(color, i, j)]
    for img in extra_images:
        out.append(gather_pixels(img, i, j))
    return tuple(out)
