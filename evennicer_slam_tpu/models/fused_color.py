"""Block-diagonal fused NICE color-stage decode.

The color stage runs three structurally identical width-32 MLPs (middle,
fine, color) per point. Issued separately, every matmul pads its 32-wide
operands to the 128x128 MXU tile — ~6% utilization, and the decode dominates
the tracker (SURVEY.md §3 hot loops).

This module stacks the three decoders into block-diagonal weights so each
layer is ONE 96-wide matmul (fc injections: 128-wide — exactly one MXU tile
of contraction). The packing happens inside the traced function, so JAX
autodiff routes gradients back to the original per-decoder leaves — unlike a
custom-VJP kernel, this path trains decoder weights and grids correctly and
is used by both tracker and mapper.

Optionally runs the matmuls in bfloat16 with f32 accumulation (the MXU's
native mode); enable via RenderSettings.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _blockdiag(mats):
    """Stack 2-D matrices into a block-diagonal matrix."""
    rows = sum(m.shape[0] for m in mats)
    cols = sum(m.shape[1] for m in mats)
    out = jnp.zeros((rows, cols), mats[0].dtype)
    r = c = 0
    for m in mats:
        out = jax.lax.dynamic_update_slice(out, m, (r, c))
        r += m.shape[0]
        c += m.shape[1]
    return out


def nice_color_blockdiag(
    decoders: Dict[str, Any],
    p: jnp.ndarray,
    feat_m: jnp.ndarray,
    feat_f: jnp.ndarray,
    feat_c: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Fused color-stage decode: raw [N, 4] = (rgb from color decoder,
    occ = middle + fine). Numerically equal to the three separate MLP
    forwards (decoders.py) up to matmul precision."""
    dm, df, dc = decoders["middle"], decoders["fine"], decoders["color"]
    n_layers = len(dm["lin_w"])
    hidden = dm["lin_w"][0].shape[1]
    emb_dim = dm["B"].shape[1]

    cast = lambda x: x.astype(dtype)
    mm = lambda a, b: jax.lax.dot_general(
        cast(a), cast(b), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    B_cat = jnp.concatenate([dm["B"], df["B"], dc["B"]], axis=1)  # [3, 3*emb]
    emb_all = jnp.sin(mm(p, B_cat))  # [N, 279]
    feat_all = jnp.concatenate([feat_m, feat_f, feat_c], axis=1)  # [N, 128]

    h = None
    for i in range(n_layers):
        W = _blockdiag([dm["lin_w"][i], df["lin_w"][i], dc["lin_w"][i]])
        b = jnp.concatenate([dm["lin_b"][i], df["lin_b"][i], dc["lin_b"][i]])
        F = _blockdiag([dm["fc_w"][i], df["fc_w"][i], dc["fc_w"][i]])
        fb = jnp.concatenate([dm["fc_b"][i], df["fc_b"][i], dc["fc_b"][i]])
        x = emb_all if h is None else h
        h = jax.nn.relu(mm(x, W) + b) + mm(feat_all, F) + fb  # [N, 96]
        # skip: next layer's per-decoder input is [emb_d | h_d]
        next_in = (
            dm["lin_w"][i + 1].shape[0]
            if i + 1 < n_layers
            else dm["out_w"].shape[0]
        )
        if next_in == hidden + emb_dim:
            h = jnp.concatenate(
                [
                    emb_all[:, :emb_dim], h[:, :hidden],
                    emb_all[:, emb_dim : 2 * emb_dim], h[:, hidden : 2 * hidden],
                    emb_all[:, 2 * emb_dim :], h[:, 2 * hidden :],
                ],
                axis=1,
            )

    Wo = _blockdiag([dm["out_w"], df["out_w"], dc["out_w"]])  # [., 1+1+4]
    bo = jnp.concatenate([dm["out_b"], df["out_b"], dc["out_b"]])
    out = mm(h, Wo) + bo  # [N, 6]
    occ = out[:, 0] + out[:, 1]
    rgb = out[:, 2:5]
    return jnp.concatenate([rgb, occ[:, None]], axis=1)
