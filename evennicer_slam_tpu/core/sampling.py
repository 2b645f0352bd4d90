"""Depth sampling along rays: stratified bins and hierarchical inverse-CDF.

Replaces reference ``sample_pdf`` (src/common.py:19-63) and the stratified /
near-surface z-value construction inside the renderer
(src/utils/Renderer.py:113-171). Fixed shapes, explicit PRNG keys.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def stratified_z_vals(
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    key: Optional[jax.Array] = None,
    perturb: float = 0.0,
    lindisp: bool = False,
) -> jnp.ndarray:
    """Z values between near and far, ``[..., n_samples]``.

    ``near``/``far`` broadcast against each other; with ``perturb > 0`` each
    sample is jittered inside its bin (reference src/utils/Renderer.py:153-167).
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples)
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    if perturb > 0.0 and key is not None:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def surface_z_vals(
    gt_depth: jnp.ndarray,
    n_surface: int,
    span: float = 0.05,
    zero_depth_far: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Near-surface z values: for rays with depth>0, ``n_surface`` uniform
    samples in [0.95 d, 1.05 d]; for zero-depth rays, uniform in
    [0.001, max depth] so interpolated geometry still gets color supervision
    (reference src/utils/Renderer.py:113-151).

    ``gt_depth``: [N]. Returns [N, n_surface].
    """
    t = jnp.linspace(0.0, 1.0, n_surface)
    d = gt_depth[..., None]
    z_nonzero = (1.0 - span) * d * (1.0 - t) + (1.0 + span) * d * t
    far = jnp.max(gt_depth) if zero_depth_far is None else zero_depth_far
    z_zero = 0.001 * (1.0 - t) + far * t
    z_zero = jnp.broadcast_to(z_zero, z_nonzero.shape)
    return jnp.where(d > 0, z_nonzero, z_zero)


def merge_sorted_zvals(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact merge of two per-row SORTED sequences ([N, A], [N, B]) into a
    sorted [N, A+B] — replaces ``jnp.sort(concat(...))`` in the renderer,
    which is one of the hot loop's most expensive ops on TPU.

    Rank of a[i] in the merged row = i + #{j : b[j] < a[i]};
    rank of b[j] = j + #{i : a[i] <= b[j]}. Ties split consistently so the
    ranks form a permutation. Placement is a one-hot matmul (MXU), not a
    scatter."""
    A = a.shape[-1]
    B = b.shape[-1]
    ra = jnp.arange(A) + jnp.sum(b[..., None, :] < a[..., :, None], axis=-1)
    rb = jnp.arange(B) + jnp.sum(a[..., None, :] <= b[..., :, None], axis=-1)
    vals = jnp.concatenate([a, b], axis=-1)
    ranks = jnp.concatenate([ra, rb], axis=-1)
    onehot = jax.nn.one_hot(ranks, A + B, dtype=vals.dtype)
    return jnp.einsum(
        "...ij,...i->...j", onehot, vals, preferred_element_type=vals.dtype
    )


def sample_pdf(
    key: jax.Array,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    det: bool = False,
) -> jnp.ndarray:
    """Hierarchical (importance) sampling by inverting the per-ray CDF.

    ``bins``: [N, B], ``weights``: [N, B-1] -> samples [N, n_samples].
    Matches reference ``sample_pdf`` (src/common.py:19-63): weights get +1e-5,
    CDF prepended with 0, right-searchsorted, degenerate bins get t=u.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, B]

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
