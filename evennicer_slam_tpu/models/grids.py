"""Hierarchical dense feature grids (coarse / middle / fine / color).

Reference allocates four ``[1, C, Z, Y, X]`` shared-memory torch tensors with
normal init (std 0.01; fine 0.0001) and sizes ``scene_extent / grid_len``
(reference src/EvenNICER_SLAM.py:217-275). Here grids are a plain pytree of
``[Z, Y, X, C]`` device arrays (channels-last, see ops/grid_sample.py) living
in HBM; the mapper threads them functionally instead of mutating shared
memory.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GRID_LEVELS = ("coarse", "middle", "fine", "color")
GRID_INIT_STD = {"coarse": 0.01, "middle": 0.01, "fine": 0.0001, "color": 0.01}


def grid_shapes(
    bound: np.ndarray,
    grid_len: Dict[str, float],
    coarse: bool,
    coarse_bound_enlarge: float = 2.0,
) -> Dict[str, Tuple[int, int, int]]:
    """Spatial (Z, Y, X) shape per level.

    The reference computes ``int(extent / len)`` per world axis (x, y, z) and
    swaps axes 0/2 for grid_sample layout (src/EvenNICER_SLAM.py:241-273); our
    [Z, Y, X] storage is that same world correspondence.
    """
    xyz_len = bound[:, 1] - bound[:, 0]
    shapes = {}
    for level in GRID_LEVELS:
        if level == "coarse":
            if not coarse:
                continue
            nxyz = [int(v) for v in (xyz_len * coarse_bound_enlarge / grid_len[level])]
        else:
            nxyz = [int(v) for v in (xyz_len / grid_len[level])]
        shapes[level] = (nxyz[2], nxyz[1], nxyz[0])  # (Z, Y, X)
    return shapes


def init_grids(
    key: jax.Array,
    bound: np.ndarray,
    grid_len: Dict[str, float],
    c_dim: int,
    coarse: bool,
    coarse_bound_enlarge: float = 2.0,
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Allocate and normally-initialize the grid pytree."""
    shapes = grid_shapes(bound, grid_len, coarse, coarse_bound_enlarge)
    grids = {}
    for level, shape in shapes.items():
        key, sub = jax.random.split(key)
        grids[level] = (
            jax.random.normal(sub, (*shape, c_dim), dtype=dtype) * GRID_INIT_STD[level]
        )
    return grids


def grid_param_labels(grids: Dict[str, jnp.ndarray]) -> Dict[str, str]:
    """Optax multi-transform labels: each grid level is its own LR group."""
    return {level: f"grid_{level}" for level in grids}
