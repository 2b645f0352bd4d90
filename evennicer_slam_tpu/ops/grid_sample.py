"""Trilinear feature-grid sampling on TPU.

Numerically equivalent to the reference's
``F.grid_sample(grid, vgrid, padding_mode='border', align_corners=True,
mode='bilinear')`` call (reference src/conv_onet/models/decoder.py:168-175),
but with a TPU-native layout: grids are stored channels-last ``[Z, Y, X, C]``
so each corner lookup is a contiguous [C]-vector gather, and the 8-corner
blend vectorizes on the VPU.

Layout note: the reference keeps grids as ``[1, C, Z, Y, X]`` where the
spatial axes are the world (z, y, x) — the famous axis-0/2 swap
(src/EvenNICER_SLAM.py:238-245). Here ``[Z, Y, X, C]`` keeps the same world
correspondence without the dummy batch/channel-first dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_grid_trilinear(
    grid: jnp.ndarray,
    p_nor: jnp.ndarray,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Sample a feature grid at normalized coordinates.

    Args:
        grid:  [Z, Y, X, C] feature grid.
        p_nor: [N, 3] coordinates in [-1, 1], ordered (x, y, z) — x indexes
               the X axis, etc. Out-of-range coords clamp to the border.
        mode:  'bilinear' (trilinear) or 'nearest'.

    Returns:
        [N, C] sampled features.
    """
    Z, Y, X, C = grid.shape
    # align_corners=True: -1 -> 0, +1 -> size-1
    ux = (p_nor[..., 0] + 1.0) * 0.5 * (X - 1)
    uy = (p_nor[..., 1] + 1.0) * 0.5 * (Y - 1)
    uz = (p_nor[..., 2] + 1.0) * 0.5 * (Z - 1)
    # border padding: clamp the continuous coordinate into the valid range
    ux = jnp.clip(ux, 0.0, X - 1)
    uy = jnp.clip(uy, 0.0, Y - 1)
    uz = jnp.clip(uz, 0.0, Z - 1)

    flat = grid.reshape(-1, C)

    if mode == "nearest":
        ix = jnp.round(ux).astype(jnp.int32)
        iy = jnp.round(uy).astype(jnp.int32)
        iz = jnp.round(uz).astype(jnp.int32)
        return flat[(iz * Y + iy) * X + ix]

    x0 = jnp.floor(ux).astype(jnp.int32)
    y0 = jnp.floor(uy).astype(jnp.int32)
    z0 = jnp.floor(uz).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, X - 1)
    y1 = jnp.minimum(y0 + 1, Y - 1)
    z1 = jnp.minimum(z0 + 1, Z - 1)
    fx = (ux - x0)[..., None]
    fy = (uy - y0)[..., None]
    fz = (uz - z0)[..., None]

    def corner(zi, yi, xi):
        return flat[(zi * Y + yi) * X + xi]

    c000 = corner(z0, y0, x0)
    c001 = corner(z0, y0, x1)
    c010 = corner(z0, y1, x0)
    c011 = corner(z0, y1, x1)
    c100 = corner(z1, y0, x0)
    c101 = corner(z1, y0, x1)
    c110 = corner(z1, y1, x0)
    c111 = corner(z1, y1, x1)

    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


# ---------------------------------------------------------------------------
# packed-corner layout: one gather per point instead of eight
# ---------------------------------------------------------------------------
#
# TPU gathers are per-row-overhead bound: eight separate [N]-row gathers of
# 32-float rows dominate the tracker's decode. The packed layout stores, at
# every cell, the features of all 8 cell corners contiguously
# ([Z, Y, X, 8*C], edge-padded), so a trilinear sample is ONE row gather
# plus a VPU-weighted reduction. 8x memory for the read-only snapshot the
# tracker uses; the mapper keeps optimizing the compact layout.

def pack_corner_grid(grid: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[Z, Y, X, C] -> [Z, Y, X, 8*C] with corner order (dz, dy, dx)
    lexicographic; borders edge-replicated (= 'border' padding)."""
    Z, Y, X, C = grid.shape
    gp = jnp.pad(grid, ((0, 1), (0, 1), (0, 1), (0, 0)), mode="edge")
    parts = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                parts.append(gp[dz : dz + Z, dy : dy + Y, dx : dx + X])
    return jnp.concatenate(parts, axis=-1).astype(dtype)


def packed_rows_and_frac(packed: jnp.ndarray, p_nor: jnp.ndarray):
    """Gather packed-corner rows + trilinear fractions for N points.

    Returns (rows [N, 8C] in the packed dtype, frac [N, 3] f32, (x, y, z)
    order). ``frac`` carries the coordinate gradient (zero where the
    continuous coordinate is clamped at the border, matching
    ``F.grid_sample(padding_mode='border')``); the rows are data. Feeds the
    fused Pallas decode (ops/fused_decode.py)."""
    Z, Y, X, C8 = packed.shape
    ux = jnp.clip((p_nor[..., 0] + 1.0) * 0.5 * (X - 1), 0.0, X - 1)
    uy = jnp.clip((p_nor[..., 1] + 1.0) * 0.5 * (Y - 1), 0.0, Y - 1)
    uz = jnp.clip((p_nor[..., 2] + 1.0) * 0.5 * (Z - 1), 0.0, Z - 1)
    x0 = jnp.floor(jax.lax.stop_gradient(ux)).astype(jnp.int32)
    y0 = jnp.floor(jax.lax.stop_gradient(uy)).astype(jnp.int32)
    z0 = jnp.floor(jax.lax.stop_gradient(uz)).astype(jnp.int32)
    frac = jnp.stack([ux - x0, uy - y0, uz - z0], axis=-1)
    rows = jax.lax.stop_gradient(
        packed.reshape(-1, C8)[(z0 * Y + y0) * X + x0]
    )
    return rows, frac


def sample_packed_trilinear(packed: jnp.ndarray, p_nor: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample from a packed-corner grid. Returns [N, C] float32.

    Numerically identical to :func:`sample_grid_trilinear` on the unpacked
    grid (up to the packed dtype)."""
    Z, Y, X, C8 = packed.shape
    C = C8 // 8
    ux = jnp.clip((p_nor[..., 0] + 1.0) * 0.5 * (X - 1), 0.0, X - 1)
    uy = jnp.clip((p_nor[..., 1] + 1.0) * 0.5 * (Y - 1), 0.0, Y - 1)
    uz = jnp.clip((p_nor[..., 2] + 1.0) * 0.5 * (Z - 1), 0.0, Z - 1)
    x0 = jnp.floor(ux).astype(jnp.int32)
    y0 = jnp.floor(uy).astype(jnp.int32)
    z0 = jnp.floor(uz).astype(jnp.int32)
    fx = ux - x0
    fy = uy - y0
    fz = uz - z0

    rows = packed.reshape(-1, C8)[(z0 * Y + y0) * X + x0]  # [N, 8C]
    # Reduce over corners by SLICING the contiguous row (a [N, 8C] ->
    # [N, 8, C] reshape forces worse layouts), keeping rows in the packed
    # dtype. KNOWN LIMIT: XLA materializes one {1,0}->{0,1} layout copy of
    # the gathered rows for the downstream matmuls (~45% of decode device
    # time in op profiles). Measured alternatives that were SLOWER: a Pallas
    # corner-reduce kernel (residual re-reads in its VJP), optimization
    # barriers (the barrier itself gets the transposed layout), column-major
    # activations, and f32 rows (doubles the copied bytes).
    out = None
    k = 0
    for dz in (0, 1):
        wz = fz if dz else (1 - fz)
        for dy in (0, 1):
            wzy = wz * (fy if dy else (1 - fy))
            for dx in (0, 1):
                w = wzy * (fx if dx else (1 - fx))
                term = rows[:, k * C : (k + 1) * C].astype(jnp.float32) * w[:, None]
                out = term if out is None else out + term
                k += 1
    return out
