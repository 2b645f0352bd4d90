"""Pallas TPU kernel: fused NICE color-stage decode.

The color-stage decode runs three 5-block MLPs (middle, fine, color) over
~10^6 ray samples per rendered event image. Under plain XLA every matmul
round-trips its [N, 32..125] intermediate through HBM, making the decode
memory-bound at ~1 TFLOP/s. This kernel keeps the ENTIRE per-point pipeline
(Gaussian-Fourier embedding -> 5 blocks with feature injection + skip ->
output heads, x3 decoders) resident in VMEM per point-block, with all
weights VMEM-resident across the grid — one HBM read of (points, features)
and one write of the [N, 4] output.

Grid features are still gathered by XLA (TPU gathers are fine); the kernel
consumes the gathered per-point features. A custom VJP provides a second
fused kernel for the backward pass (gradients wrt points and features,
recomputing activations in VMEM), which is exactly what tracking (pose-only
gradients) and grid optimization (gradients via features) need. Decoder
WEIGHT gradients are not produced — callers that train decoder weights (the
mapper's color stage) use the unfused path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 8192
VMEM_LIMIT = 100 * 1024 * 1024  # v5e VMEM is 128 MB; default scoped limit is a conservative 16 MB


def _interpret() -> bool:
    """Pallas interpret mode on CPU (tests / virtual multi-device mesh)."""
    return jax.default_backend() == "cpu"


def _mlp_block(p, emb_B, lin_w, lin_b, fc_w, fc_b, out_w, out_b, feat):
    """One reference-MLP forward on a VMEM-resident block. Returns (out, acts)
    where acts holds pre-relu activations + layer inputs for the backward."""
    emb = jnp.sin(jax.lax.dot_general(
        p, emb_B, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ))
    h = emb
    emb_dim = emb.shape[-1]
    n = len(lin_w)
    zs = []
    hs = []
    for i in range(n):
        hs.append(h)
        z = jax.lax.dot_general(
            h, lin_w[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + lin_b[i]
        zs.append(z)
        h = jax.nn.relu(z)
        h = h + jax.lax.dot_general(
            feat, fc_w[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + fc_b[i]
        next_in = lin_w[i + 1].shape[0] if i + 1 < n else out_w.shape[0]
        if next_in == lin_w[i].shape[1] + emb_dim:
            h = jnp.concatenate([emb, h], axis=-1)
    hs.append(h)
    out = jax.lax.dot_general(
        h, out_w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + out_b
    return out, (emb, zs, hs)


def _mlp_block_bwd(g_out, p, emb_B, lin_w, lin_b, fc_w, fc_b, out_w, out_b, feat):
    """Backward of _mlp_block wrt (p, feat); recomputes activations."""
    _, (emb, zs, hs) = _mlp_block(p, emb_B, lin_w, lin_b, fc_w, fc_b, out_w, out_b, feat)
    emb_dim = emb.shape[-1]
    n = len(lin_w)

    def mm_t(a, w):
        # a @ w.T
        return jax.lax.dot_general(
            a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    g_h = mm_t(g_out, out_w)
    g_emb = jnp.zeros_like(emb)
    g_feat = jnp.zeros_like(feat)
    for i in reversed(range(n)):
        next_in = lin_w[i + 1].shape[0] if i + 1 < n else out_w.shape[0]
        if next_in == lin_w[i].shape[1] + emb_dim:
            g_emb = g_emb + g_h[:, :emb_dim]
            g_h = g_h[:, emb_dim:]
        g_feat = g_feat + mm_t(g_h, fc_w[i])
        g_z = g_h * (zs[i] > 0)
        g_h = mm_t(g_z, lin_w[i])
    g_emb = g_emb + g_h
    # emb = sin(p @ B)
    pb = jax.lax.dot_general(
        p, emb_B, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    g_pb = g_emb * jnp.cos(pb)
    g_p = mm_t(g_pb, emb_B)
    return g_p, g_feat


def _pack(params: Dict[str, Any]):
    return (
        params["B"], tuple(params["lin_w"]), tuple(params["lin_b"]),
        tuple(params["fc_w"]), tuple(params["fc_b"]),
        params["out_w"], params["out_b"],
    )


def _deref(w):
    """Load a weight tuple-tree of refs into VMEM values."""
    B, lin_w, lin_b, fc_w, fc_b, out_w, out_b = w
    rd = lambda r: r[...]
    return (
        rd(B), tuple(map(rd, lin_w)), tuple(map(rd, lin_b)),
        tuple(map(rd, fc_w)), tuple(map(rd, fc_b)), rd(out_w), rd(out_b),
    )


def _fwd_kernel(n_dec_leaves, pts_ref, fm_ref, ff_ref, fc_ref, *rest):
    w_leaves = rest[:-1]
    out_ref = rest[-1]
    wm, wf, wc = (_deref(w) for w in _unflatten_weights(w_leaves, n_dec_leaves))
    p = pts_ref[:]
    mid, _ = _mlp_block(p, *wm, fm_ref[:])
    fin, _ = _mlp_block(p, *wf, ff_ref[:])
    col, _ = _mlp_block(p, *wc, fc_ref[:])
    occ = mid[:, :1] + fin[:, :1]
    out_ref[:] = jnp.concatenate([col[:, :3], occ], axis=-1)


def _bwd_kernel(n_dec_leaves, g_ref, pts_ref, fm_ref, ff_ref, fc_ref, *rest):
    w_leaves = rest[:-4]
    gp_ref, gfm_ref, gff_ref, gfc_ref = rest[-4:]
    wm, wf, wc = (_deref(w) for w in _unflatten_weights(w_leaves, n_dec_leaves))
    p = pts_ref[:]
    g = g_ref[:]
    g_occ = g[:, 3:4]
    g_col = jnp.concatenate([g[:, :3], jnp.zeros_like(g_occ)], axis=-1)
    gp_m, gf_m = _mlp_block_bwd(g_occ, p, *wm, fm_ref[:])
    gp_f, gf_f = _mlp_block_bwd(g_occ, p, *wf, ff_ref[:])
    gp_c, gf_c = _mlp_block_bwd(g_col, p, *wc, fc_ref[:])
    gp_ref[:] = gp_m + gp_f + gp_c
    gfm_ref[:] = gf_m
    gff_ref[:] = gf_f
    gfc_ref[:] = gf_c


def _flatten_weights(wm, wf, wc):
    leaves = []
    counts = []
    for w in (wm, wf, wc):
        flat = [w[0], *w[1], *w[2], *w[3], *w[4], w[5], w[6]]
        leaves.extend(flat)
        counts.append((len(w[1]), len(flat)))
    return leaves, tuple(counts)


def _unflatten_weights(leaves, counts):
    out = []
    i = 0
    for n_lin, total in counts:
        chunk = leaves[i : i + total]
        i += total
        B = chunk[0]
        lin_w = tuple(chunk[1 : 1 + n_lin])
        lin_b = tuple(chunk[1 + n_lin : 1 + 2 * n_lin])
        fc_w = tuple(chunk[1 + 2 * n_lin : 1 + 3 * n_lin])
        fc_b = tuple(chunk[1 + 3 * n_lin : 1 + 4 * n_lin])
        out_w, out_b = chunk[1 + 4 * n_lin], chunk[2 + 4 * n_lin]
        out.append((B, lin_w, lin_b, fc_w, fc_b, out_w, out_b))
    return tuple(out)


def _block_spec_rows(width):
    return pl.BlockSpec((BLOCK, width), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_nice_color(pts, feat_m, feat_f, feat_c, wm_leaves, wf_leaves, wc_leaves):
    out, _ = _fused_fwd_impl(pts, feat_m, feat_f, feat_c, wm_leaves, wf_leaves, wc_leaves)
    return out


def _fused_fwd_impl(pts, feat_m, feat_f, feat_c, wm_leaves, wf_leaves, wc_leaves):
    n = pts.shape[0]
    pad = (-n) % BLOCK
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)])
        feat_m = jnp.concatenate([feat_m, jnp.zeros((pad, feat_m.shape[1]), feat_m.dtype)])
        feat_f = jnp.concatenate([feat_f, jnp.zeros((pad, feat_f.shape[1]), feat_f.dtype)])
        feat_c = jnp.concatenate([feat_c, jnp.zeros((pad, feat_c.shape[1]), feat_c.dtype)])
    leaves, counts = _flatten_weights(wm_leaves, wf_leaves, wc_leaves)
    npts = pts.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, counts),
        grid=(npts // BLOCK,),
        in_specs=[
            _block_spec_rows(3),
            _block_spec_rows(feat_m.shape[1]),
            _block_spec_rows(feat_f.shape[1]),
            _block_spec_rows(feat_c.shape[1]),
            *[_full_spec() for _ in leaves],
        ],
        out_specs=_block_spec_rows(4),
        out_shape=jax.ShapeDtypeStruct((npts, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(pts, feat_m, feat_f, feat_c, *leaves)
    return out[:n], None


def _fused_vjp_fwd(pts, feat_m, feat_f, feat_c, wm_leaves, wf_leaves, wc_leaves):
    out, _ = _fused_fwd_impl(pts, feat_m, feat_f, feat_c, wm_leaves, wf_leaves, wc_leaves)
    return out, (pts, feat_m, feat_f, feat_c, wm_leaves, wf_leaves, wc_leaves)


def _fused_vjp_bwd(res, g):
    pts, feat_m, feat_f, feat_c, wm_leaves, wf_leaves, wc_leaves = res
    n = pts.shape[0]
    pad = (-n) % BLOCK
    if pad:
        z = lambda a, w: jnp.concatenate([a, jnp.zeros((pad, w), a.dtype)])
        pts_p = z(pts, 3)
        fm_p = z(feat_m, feat_m.shape[1])
        ff_p = z(feat_f, feat_f.shape[1])
        fc_p = z(feat_c, feat_c.shape[1])
        g_p = z(g, 4)
    else:
        pts_p, fm_p, ff_p, fc_p, g_p = pts, feat_m, feat_f, feat_c, g
    leaves, counts = _flatten_weights(wm_leaves, wf_leaves, wc_leaves)
    npts = pts_p.shape[0]
    gp, gfm, gff, gfc = pl.pallas_call(
        functools.partial(_bwd_kernel, counts),
        grid=(npts // BLOCK,),
        in_specs=[
            _block_spec_rows(4),
            _block_spec_rows(3),
            _block_spec_rows(feat_m.shape[1]),
            _block_spec_rows(feat_f.shape[1]),
            _block_spec_rows(feat_c.shape[1]),
            *[_full_spec() for _ in leaves],
        ],
        out_specs=(
            _block_spec_rows(3),
            _block_spec_rows(feat_m.shape[1]),
            _block_spec_rows(feat_f.shape[1]),
            _block_spec_rows(feat_c.shape[1]),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npts, 3), jnp.float32),
            jax.ShapeDtypeStruct((npts, feat_m.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((npts, feat_f.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((npts, feat_c.shape[1]), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(g_p, pts_p, fm_p, ff_p, fc_p, *leaves)
    zero_w = lambda w: jax.tree.map(jnp.zeros_like, w)
    return (
        gp[:n], gfm[:n], gff[:n], gfc[:n],
        zero_w(wm_leaves), zero_w(wf_leaves), zero_w(wc_leaves),
    )


fused_nice_color.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def nice_color_decode_fused(decoders, pts, feat_m, feat_f, feat_c):
    """Color-stage decode via the fused kernel. ``feat_f`` is the fine
    decoder's 64-dim concat feature (middle part already stop-gradient'ed by
    the caller). Decoder weights receive ZERO gradients through this path."""
    wm = _pack(decoders["middle"])
    wf = _pack(decoders["fine"])
    wc = _pack(decoders["color"])
    return fused_nice_color(pts, feat_m, feat_f, feat_c, wm, wf, wc)
