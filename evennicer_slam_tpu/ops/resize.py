"""Image resize ops matching torch/torchvision semantics.

The SLAM loop resizes event images, masks, and color frames before the
EventNet loss (reference src/Tracker.py:129-147 uses
``transforms.Resize(..., NEAREST)``; src/utils/Renderer.py:287-292 uses
BILINEAR). torch's ``F.interpolate`` uses half-pixel sampling
(align_corners=False) for bilinear and floor-index mapping for nearest —
reproduced here exactly so losses match the reference numerically.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def resize_nearest(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of ``[H, W, ...]`` to ``out_hw``.

    torch 'nearest' picks source index ``floor(dst * src_size / dst_size)``.
    """
    H, W = img.shape[0], img.shape[1]
    oh, ow = out_hw
    ri = jnp.floor(jnp.arange(oh) * (H / oh)).astype(jnp.int32)
    ci = jnp.floor(jnp.arange(ow) * (W / ow)).astype(jnp.int32)
    return img[ri][:, ci]


def resize_bilinear(
    img: jnp.ndarray, out_hw: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of ``[H, W, ...]`` to ``out_hw``.

    align_corners=False (torch default): source coordinate
    ``(dst + 0.5) * scale - 0.5`` clamped into range.
    """
    H, W = img.shape[0], img.shape[1]
    oh, ow = out_hw

    def src_coords(n_in: int, n_out: int):
        if align_corners and n_out > 1:
            return jnp.linspace(0.0, n_in - 1.0, n_out)
        scale = n_in / n_out
        u = (jnp.arange(n_out) + 0.5) * scale - 0.5
        return jnp.clip(u, 0.0, n_in - 1.0)

    uy = src_coords(H, oh)
    ux = src_coords(W, ow)
    y0 = jnp.floor(uy).astype(jnp.int32)
    x0 = jnp.floor(ux).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = uy - y0
    fx = ux - x0

    # expand fractional weights over trailing dims
    extra = (1,) * (img.ndim - 2)
    fy_r = fy.reshape(-1, 1, *extra)
    fx_r = fx.reshape(1, -1, *extra)

    top = img[y0][:, x0] * (1 - fx_r) + img[y0][:, x1] * fx_r
    bot = img[y1][:, x0] * (1 - fx_r) + img[y1][:, x1] * fx_r
    return top * (1 - fy_r) + bot * fy_r
