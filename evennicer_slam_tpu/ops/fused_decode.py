"""Pallas TPU kernel: fused color-stage NICE decode for tracking (opt-in).

The tracking hot loop decodes ~880k ray samples per iteration through three
width-32 MLPs (reference NICE.forward, src/conv_onet/models/decoder.py:
312-342), ~45 ms of a 52 ms tracking iteration on a v5e chip. This kernel
runs the ENTIRE decode (trilinear corner reduction + block-diagonal-batched
middle/fine/color MLPs) on VMEM-resident tiles in transposed ``[C, T]``
orientation, so no activation ever touches HBM.

Measured outcome (see models/decoders.pallas_decode_enabled and
ARCHITECTURE.md): the XLA path was already near the cost floor — the decode
is the MLP math itself at M=32 MXU utilization, not (as round-1 profiling
suggested) a gather-layout copy — so this kernel wins slightly on the
forward (19 vs ~21 ms) and loses on the backward (~30 vs ~23 ms, re-paying
the fourier sin/cos in its in-VMEM recompute). It ships opt-in
(ENSLAM_PALLAS=1) with full parity tests; the production default stays XLA.

Gradients: tracking optimizes the pose only — grids and decoder weights are
frozen snapshots (reference src/Tracker.py:248-260 deep-copies them per
mapping update). The custom VJP therefore emits gradients only for the query
points and the trilinear fractions; the backward kernel re-derives the
forward in-VMEM via ``jax.vjp`` of the same tile function (recompute beats
saving activations to HBM).

The split of labor with XLA: XLA performs the feature-row gathers from the
packed-corner tables (ops/grid_sample.py) — its native gather is fine — and
this kernel consumes the rows before they ever need a relaid buffer.

Only the Gaussian-Fourier positional embedding is supported here (every
shipped config uses it); other ``pos_embedding_method`` values fall back to
the XLA path in models/decoders.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 1024-point tiles fit the forward comfortably but the backward's vjp
# residuals overflow the ~16 MB VMEM budget by a few hundred KB; 512 leaves
# headroom for both kernels.
TILE = 512


def _corner_weights_t(frac_t: jnp.ndarray) -> list:
    """[3, T] fractions -> list of 8 [1, T] trilinear corner weights, corner
    order (dz, dy, dx) lexicographic — matching pack_corner_grid."""
    fx, fy, fz = frac_t[0:1], frac_t[1:2], frac_t[2:3]
    ws = []
    for dz in (0, 1):
        wz = fz if dz else (1.0 - fz)
        for dy in (0, 1):
            wzy = wz * (fy if dy else (1.0 - fy))
            for dx in (0, 1):
                ws.append(wzy * (fx if dx else (1.0 - fx)))
    return ws


def _corner_reduce_t(rows: jnp.ndarray, w8: list, c: int) -> jnp.ndarray:
    """rows [T, 8c] (corner-major) x 8 weights [1, T] -> features [c, T] f32.

    The tile-local transpose makes corner extraction a cheap sublane slice."""
    rows_t = rows.T.astype(jnp.float32)  # [8c, T]
    out = None
    for k in range(8):
        term = rows_t[k * c : (k + 1) * c] * w8[k]
        out = term if out is None else out + term
    return out


# ---------------------------------------------------------------------------
# block-diagonal batching of the three MLPs
#
# Each NICE MLP is width 32: alone, its matmuls use ~1/16 of an MXU pass
# (M = 32 of 128, K = 32..93 of 128). Stacking middle/fine/color into
# block-diagonal weights raises M to 96 and makes the feature-injection
# contraction exactly K = 128 (32 + 64 + 32), halving MXU passes. The skip
# concat [emb | h] @ W3 is decomposed as emb @ W3a + h @ W3b so no in-kernel
# concatenation is needed.
# ---------------------------------------------------------------------------

def _blockdiag_t(ws) -> jnp.ndarray:
    """[ [in_i, out_i] ... ] -> transposed block-diag [sum out, sum in]."""
    ins = [w.shape[0] for w in ws]
    rows = []
    for i, w in enumerate(ws):
        pre = sum(ins[:i])
        post = sum(ins[i + 1:])
        rows.append(jnp.pad(w.T, ((0, 0), (pre, post))))
    return jnp.concatenate(rows, axis=0)  # [sum outs, sum ins]


def build_batched_params(decoders: Dict[str, Any]) -> tuple:
    """Precompute the block-diagonal parameter set for the batched tile
    decode. Tiny weight-side ops — XLA hoists them out of the tracking scan
    (they are loop-invariant)."""
    trio = [decoders[k] for k in ("middle", "fine", "color")]
    cat1 = lambda get: jnp.concatenate([get(m).reshape(-1, 1) for m in trio], 0)

    b_cat = jnp.concatenate([m["B"].T for m in trio], axis=0)  # [279, 3]
    lin, lin_b = [], []
    for i in range(5):
        if i == 3:
            # skip block: input [emb | h]; split into emb-part + h-part
            w3a = _blockdiag_t([m["lin_w"][3][:93] for m in trio])  # [96, 279]
            w3b = _blockdiag_t([m["lin_w"][3][93:] for m in trio])  # [96, 96]
            lin.append((w3a, w3b))
        else:
            lin.append(_blockdiag_t([m["lin_w"][i] for m in trio]))
        lin_b.append(cat1(lambda m, i=i: m["lin_b"][i]))
    fc = [
        _blockdiag_t([m["fc_w"][i] for m in trio]) for i in range(5)
    ]  # [96, 128]
    fc_b = [cat1(lambda m, i=i: m["fc_b"][i]) for i in range(5)]
    out_w = _blockdiag_t([m["out_w"] for m in trio])  # [6, 96]
    out_b = cat1(lambda m: m["out_b"])  # [6, 1]
    return (b_cat, tuple(lin), tuple(lin_b), tuple(fc), tuple(fc_b),
            out_w, out_b)


def _mm(w, x):
    return jax.lax.dot_general(
        w.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _tile_decode_batched(p_t, frac_m_t, frac_f_t, rows_m, rows_f, bp,
                         c_dim: int):
    """Batched trio decode for one tile -> raw [4, T]. Numerically equal to
    running the three MLPs separately (same bf16 matmul precision)."""
    b_cat, lin, lin_b, fc, fc_b, out_w, out_b = bp
    w_m = _corner_weights_t(frac_m_t)
    w_f = _corner_weights_t(frac_f_t)
    middle_feat = _corner_reduce_t(rows_m, w_m, c_dim)        # [32, T]
    fc_feat = _corner_reduce_t(rows_f, w_f, 2 * c_dim)        # [64, T]
    # feature layout matches the block-diag fc rows:
    # [middle(32) | fine(32 fine-grid + 32 stopgrad middle) | color(32)]
    feat_cat = jnp.concatenate(
        [middle_feat, fc_feat[:c_dim], jax.lax.stop_gradient(middle_feat),
         fc_feat[c_dim:]],
        axis=0,
    )  # [128, T]

    emb = jnp.sin(
        jax.lax.dot_general(
            b_cat, p_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )  # [279, T]

    h = jax.nn.relu(_mm(lin[0], emb) + lin_b[0])
    h = h + _mm(fc[0], feat_cat) + fc_b[0]
    for i in (1, 2):
        h = jax.nn.relu(_mm(lin[i], h) + lin_b[i])
        h = h + _mm(fc[i], feat_cat) + fc_b[i]
    w3a, w3b = lin[3]
    h = jax.nn.relu(_mm(w3a, emb) + _mm(w3b, h) + lin_b[3])
    h = h + _mm(fc[3], feat_cat) + fc_b[3]
    h = jax.nn.relu(_mm(lin[4], h) + lin_b[4])
    h = h + _mm(fc[4], feat_cat) + fc_b[4]
    out = _mm(out_w, h) + out_b  # [6, T]: [m_occ, f_occ, r, g, b, col_occ]
    occ = out[0:1] + out[1:2]
    return jnp.concatenate([out[2:5], occ], axis=0)  # [4, T]


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(treedef, c_dim, *refs):
    p_ref, fm_ref, ff_ref, rm_ref, rf_ref = refs[:5]
    param_refs = refs[5:-1]
    out_ref = refs[-1]
    bp = jax.tree_util.tree_unflatten(treedef, [r[:] for r in param_refs])
    out_ref[:] = _tile_decode_batched(
        p_ref[:].T, fm_ref[:].T, ff_ref[:].T, rm_ref[:], rf_ref[:],
        bp, c_dim,
    ).T


def _bwd_kernel(treedef, c_dim, *refs):
    p_ref, fm_ref, ff_ref, rm_ref, rf_ref = refs[:5]
    param_refs = refs[5:-4]
    g_ref, dp_ref, dfm_ref, dff_ref = refs[-4:]
    bp = jax.tree_util.tree_unflatten(treedef, [r[:] for r in param_refs])
    rows_m = rm_ref[:]
    rows_f = rf_ref[:]

    def f(p_t, fm_t, ff_t):
        return _tile_decode_batched(p_t, fm_t, ff_t, rows_m, rows_f, bp, c_dim)

    _, vjp_fn = jax.vjp(f, p_ref[:].T, fm_ref[:].T, ff_ref[:].T)
    dp_t, dfm_t, dff_t = vjp_fn(g_ref[:].T)
    dp_ref[:] = dp_t.T
    dfm_ref[:] = dfm_t.T
    dff_ref[:] = dff_t.T


def _row_spec(cols):
    return pl.BlockSpec((TILE, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _param_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def supports(decoders: Dict[str, Any]) -> bool:
    """The kernel covers the standard NICE decoder trio: fourier embedding,
    five width-32 blocks, skip at block 2 (the shape every shipped config
    uses). Anything else falls back to the XLA path."""

    def ok(m):
        return (
            "B" in m
            and "fc_w" in m
            and len(m["lin_w"]) == 5
            and m["lin_w"][0].shape[1] == 32
            and m["lin_w"][3].shape[0] == 93 + 32
        )

    return all(k in decoders and ok(decoders[k])
               for k in ("middle", "fine", "color"))


def fused_decode_packed(
    decoders: Dict[str, Any],
    p: jnp.ndarray,
    frac_m: jnp.ndarray,
    frac_f: jnp.ndarray,
    rows_m: jnp.ndarray,
    rows_f: jnp.ndarray,
    c_dim: int = 32,
) -> jnp.ndarray:
    """Fused decode of N points. p/frac [N, 3] f32; rows [N, 8c] bf16.
    Returns raw [N, 4]. Differentiable wrt p/frac only (pose tracking);
    rows and decoder params are frozen by construction."""
    n = p.shape[0]
    pad = (-n) % TILE
    if pad:
        padf = lambda x: jnp.pad(x, ((0, pad), (0, 0)))
        p, frac_m, frac_f = padf(p), padf(frac_m), padf(frac_f)
        rows_m, rows_f = padf(rows_m), padf(rows_f)

    bp = build_batched_params(decoders)
    leaves, treedef = jax.tree_util.tree_flatten(bp)
    leaves = tuple(jax.lax.stop_gradient(l) for l in leaves)
    raw = _fused_call(p, frac_m, frac_f, rows_m, rows_f, leaves,
                      treedef, c_dim)
    return raw[: n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_call(p, frac_m, frac_f, rows_m, rows_f, leaves, treedef, c_dim):
    return _fused_fwd_impl(p, frac_m, frac_f, rows_m, rows_f, leaves,
                           treedef, c_dim)


def _fused_fwd_impl(p, frac_m, frac_f, rows_m, rows_f, leaves, treedef, c_dim):
    n = p.shape[0]
    kernel = functools.partial(_fwd_kernel, treedef, c_dim)
    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            _row_spec(3), _row_spec(3), _row_spec(3),
            _row_spec(rows_m.shape[1]), _row_spec(rows_f.shape[1]),
            *[_param_spec() for _ in leaves],
        ],
        out_specs=_row_spec(4),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        interpret=_interpret(),
    )(p, frac_m, frac_f, rows_m, rows_f, *leaves)


def _fused_call_fwd(p, frac_m, frac_f, rows_m, rows_f, leaves, treedef, c_dim):
    raw = _fused_fwd_impl(p, frac_m, frac_f, rows_m, rows_f, leaves,
                          treedef, c_dim)
    return raw, (p, frac_m, frac_f, rows_m, rows_f, leaves)


def _fused_call_bwd(treedef, c_dim, res, g):
    p, frac_m, frac_f, rows_m, rows_f, leaves = res
    n = p.shape[0]
    kernel = functools.partial(_bwd_kernel, treedef, c_dim)
    dp, dfm, dff = pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            _row_spec(3), _row_spec(3), _row_spec(3),
            _row_spec(rows_m.shape[1]), _row_spec(rows_f.shape[1]),
            *[_param_spec() for _ in leaves],
            _row_spec(4),
        ],
        out_specs=(_row_spec(3), _row_spec(3), _row_spec(3)),
        out_shape=(
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
        ),
        interpret=_interpret(),
    )(p, frac_m, frac_f, rows_m, rows_f, *leaves, g)
    # rows/leaves are frozen snapshots (stop_gradient at the call site);
    # their zero cotangents are DCE'd by XLA
    return (dp, dfm, dff, jnp.zeros_like(rows_m), jnp.zeros_like(rows_f),
            tuple(jnp.zeros_like(l) for l in leaves))


_fused_call.defvjp(_fused_call_fwd, _fused_call_bwd)
