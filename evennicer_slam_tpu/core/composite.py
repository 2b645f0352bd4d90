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


def composite_two_bands_occupancy(
    raw_a: jnp.ndarray,
    z_a: jnp.ndarray,
    raw_b: jnp.ndarray,
    z_b: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Occupancy-mode compositing of TWO per-row-sorted sample bands WITHOUT
    merging/sorting them.

    In occupancy mode the interval lengths are unused (alpha depends only on
    the raw value), so the merged-order transmittance
    ``T_i = prod_{z_j < z_i} (1 - alpha_j + 1e-10)`` factorizes into an
    in-band exclusive prefix product and a cross-band prefix product looked
    up at the sample's cross rank. Exactly equal to sorting + composite_rays
    (up to fp association), at a fraction of the cost — sorting the 48-wide
    merged rows is one of the renderer's most expensive TPU ops.

    Returns (depth, depth_var, rgb, weights_cat[A+B in concat order]).
    """
    alpha_a = jax.nn.sigmoid(10.0 * raw_a[..., -1])
    alpha_b = jax.nn.sigmoid(10.0 * raw_b[..., -1])
    # clamp: XLA's excess-precision reassociation can fold 1 - alpha + 1e-10
    # to exactly 0 for alpha == 1, and log(0) = -inf poisons the prefix sums
    la = jnp.log(jnp.maximum(1.0 - alpha_a + 1e-10, 1e-10))
    lb = jnp.log(jnp.maximum(1.0 - alpha_b + 1e-10, 1e-10))

    # in-band exclusive prefix sums as matmuls against a constant strictly-
    # lower-triangular matrix (MXU-friendly; TPU cumsum lowers poorly)
    A = la.shape[-1]
    B = lb.shape[-1]
    tril_a = jnp.tril(jnp.ones((A, A), la.dtype), k=-1)
    tril_b = jnp.tril(jnp.ones((B, B), lb.dtype), k=-1)
    ca_excl = la @ tril_a.T
    cb_excl = lb @ tril_b.T

    # cross-band sums: masked reductions over the comparison tensors
    cmp_ba = (z_b[..., None, :] < z_a[..., :, None]).astype(la.dtype)  # [N,A,B]
    cmp_ab = (z_a[..., None, :] <= z_b[..., :, None]).astype(la.dtype)  # [N,B,A]
    cross_a = jnp.sum(cmp_ba * lb[..., None, :], axis=-1)
    cross_b = jnp.sum(cmp_ab * la[..., None, :], axis=-1)

    T_a = jnp.exp(ca_excl + cross_a)
    T_b = jnp.exp(cb_excl + cross_b)
    w_a = alpha_a * T_a
    w_b = alpha_b * T_b

    rgb_map = jnp.sum(w_a[..., None] * raw_a[..., :-1], axis=-2) + jnp.sum(
        w_b[..., None] * raw_b[..., :-1], axis=-2
    )
    depth_map = jnp.sum(w_a * z_a, axis=-1) + jnp.sum(w_b * z_b, axis=-1)
    ta = z_a - depth_map[..., None]
    tb = z_b - depth_map[..., None]
    depth_var = jnp.sum(w_a * ta * ta, axis=-1) + jnp.sum(w_b * tb * tb, axis=-1)
    weights = jnp.concatenate([w_a, w_b], axis=-1)
    return depth_map, depth_var, rgb_map, weights
