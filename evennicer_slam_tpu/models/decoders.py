"""NICE (4-MLP hierarchical) and iMAP (single-MLP) decoders as pytrees.

Functional re-design of reference src/conv_onet/models/decoder.py:7-343:

- parameters are plain nested dicts (optax-friendly, shardable),
- the Gaussian-Fourier positional embedding (93-dim, scale 25, learnable B),
  5-block width-32 MLPs with a skip at block 2 and per-block feature
  injection ``h += fc_c[i](c)`` are reproduced exactly,
- the staged forward ('coarse' | 'middle' | 'fine' | 'color') matches
  NICE.forward (decoder.py:312-342): fine occupancy = fine + middle, color
  stage returns the color decoder's rgb with the fine+middle occupancy,
- grid features come from ops.grid_sample (trilinear, border, align-corners),
- the fine decoder's middle-feature concat is wrapped in stop_gradient,
  matching the reference's ``torch.no_grad()`` (decoder.py:183-187).

All matmuls sit on the MXU; points are processed as one [N, *] batch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from evennicer_slam_tpu.core.bounds import normalize_3d_coordinate
from evennicer_slam_tpu.ops.grid_sample import sample_grid_trilinear

EMBEDDING_SIZE = 93
FOURIER_SCALE = 25.0


def pallas_decode_enabled() -> bool:
    """Opt-in (ENSLAM_PALLAS=1). Measured on a v5e chip the Pallas fused
    decode wins slightly on the forward (19 ms vs ~21 ms per tracking
    iteration at 880k points) but loses on the backward (its in-VMEM
    recompute re-pays the fourier sin/cos, ~30 ms vs ~23 ms for XLA's
    saved-activation backward), so the XLA packed path stays the default.
    The honest accounting: at this model width the decode is near its
    single-chip floor (~45 ms/iter fwd+bwd); the throughput lever is data-
    parallel ray sharding across chips (parallel/sharding.py), not further
    kernel fusion."""
    import os

    return os.environ.get("ENSLAM_PALLAS", "") not in ("", "0", "false")


@jax.custom_vjp
def _bf16_matmul(a, b):
    """Matmul in bf16 with f32 accumulation in BOTH passes. JAX's derived
    VJP would promote the backward dots to f32 (cotangents are f32), wasting
    the MXU's native bf16 rate; tracking tolerates bf16 gradient noise."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bf16_matmul_fwd(a, b):
    # zero-size sentinels carry the primal dtypes: cotangents must match them
    # (the operands may already be bf16, e.g. the materialized fourier emb)
    return _bf16_matmul(a, b), (
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        jnp.zeros((), a.dtype), jnp.zeros((), b.dtype),
    )


def _bf16_matmul_bwd(res, g):
    a16, b16, za, zb = res
    g16 = g.astype(jnp.bfloat16)
    da = jax.lax.dot_general(
        g16, b16, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db = jax.lax.dot_general(
        a16, g16, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return da.astype(za.dtype), db.astype(zb.dtype)


_bf16_matmul.defvjp(_bf16_matmul_fwd, _bf16_matmul_bwd)


@jax.custom_vjp
def _fourier_emb_bf16(p, B):
    """sin(p @ B) materialized ONCE as bf16 (see the barrier note in
    _mlp_forward). The custom VJP saves only p and B — 10 MB instead of the
    [N,93] f32 pre-sine residual XLA would keep (328 MB at tracking shapes)
    — and recomputes cos(p @ B) fused into the backward: measured
    49.6 -> 47.3 ms/iter on the tracking decode, value and pose gradient
    bit-identical."""
    return jax.lax.optimization_barrier(jnp.sin(p @ B).astype(jnp.bfloat16))


def _fourier_emb_bf16_fwd(p, B):
    return _fourier_emb_bf16(p, B), (p, B)


def _fourier_emb_bf16_bwd(res, g):
    p, B = res
    x = p @ B
    gc = g.astype(jnp.float32) * jnp.cos(x)
    return gc @ B.T, p.T @ gc


_fourier_emb_bf16.defvjp(_fourier_emb_bf16_fwd, _fourier_emb_bf16_bwd)


# ---------------------------------------------------------------------------
# initialization (matches torch defaults used by the reference)
# ---------------------------------------------------------------------------

def _xavier_uniform(key, shape, gain: float):
    fan_in, fan_out = shape[0], shape[1]
    a = gain * np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-a, maxval=a)


def _torch_linear_default(key, shape):
    # torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
    bound = 1.0 / np.sqrt(shape[0])
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


POS_EMBEDDING_METHODS = ("fourier", "same", "nerf", "fc_relu")


def _nerf_freq_bands(name: str):
    """Reference Nerf_positional_embedding frequency bands
    (decoder.py:33-67, dispatch at :137-147): color decoders use multires=10
    with log sampling, others multires=5 linear."""
    if "color" in name:
        multires = 10
        bands = 2.0 ** np.linspace(0.0, multires - 1, multires)
    else:
        multires = 5
        bands = np.linspace(2.0 ** 0.0, 2.0 ** (multires - 1), multires)
    return jnp.asarray(bands, jnp.float32)


def _init_mlp(
    key: jax.Array,
    c_dim: int,
    hidden: int,
    n_blocks: int,
    skips,
    color: bool,
    concat_feature: bool,
    pos_embedding_method: str = "fourier",
    name: str = "",
) -> Dict[str, Any]:
    """Parameters for one reference-`MLP` (decoder.py:91-203).

    Weights are stored [in, out] (row-vector convention: y = x @ W + b).
    ``pos_embedding_method`` is the reference's fourier|same|nerf|fc_relu
    dispatch (decoder.py:128-152); unknown values raise.
    """
    relu_gain = np.sqrt(2.0)
    # NOTE: params hold ONLY arrays (optax/jit-safe); architecture facts
    # (skip positions, color head, embedding variant) are inferred from the
    # params' keys/shapes in forward.
    params: Dict[str, Any] = {}
    keys = jax.random.split(key, 4 + 3 * n_blocks)
    ki = iter(range(len(keys)))

    if pos_embedding_method == "fourier":
        params["B"] = jax.random.normal(keys[next(ki)], (3, EMBEDDING_SIZE)) * FOURIER_SCALE
        emb = EMBEDDING_SIZE
    elif pos_embedding_method == "same":
        emb = 3
    elif pos_embedding_method == "nerf":
        params["nerf_freqs"] = _nerf_freq_bands(name)
        emb = 3 + 6 * params["nerf_freqs"].shape[0]
    elif pos_embedding_method == "fc_relu":
        # the reference embedder is a DenseLayer (plain Linear, relu-gain
        # xavier init; no activation applied in forward)
        params["emb_w"] = _xavier_uniform(keys[next(ki)], (3, EMBEDDING_SIZE), relu_gain)
        params["emb_b"] = jnp.zeros((EMBEDDING_SIZE,))
        emb = EMBEDDING_SIZE
    else:
        raise ValueError(
            f"unknown pos_embedding_method {pos_embedding_method!r}; "
            f"expected one of {POS_EMBEDDING_METHODS}"
        )

    feat_dim = c_dim * (2 if concat_feature else 1)
    lin_w, lin_b = [], []
    in_dim = emb
    for i in range(n_blocks):
        w = _xavier_uniform(keys[next(ki)], (in_dim, hidden), relu_gain)
        lin_w.append(w)
        lin_b.append(jnp.zeros((hidden,)))
        in_dim = hidden + emb if i in skips else hidden
    params["lin_w"] = lin_w
    params["lin_b"] = lin_b

    if c_dim != 0:
        fc_w, fc_b = [], []
        for _ in range(n_blocks):
            k1 = keys[next(ki)]
            fc_w.append(_torch_linear_default(k1, (feat_dim, hidden)))
            bound = 1.0 / np.sqrt(feat_dim)
            fc_b.append(jax.random.uniform(k1, (hidden,), minval=-bound, maxval=bound))
        params["fc_w"] = fc_w
        params["fc_b"] = fc_b

    out_dim = 4 if color else 1
    params["out_w"] = _xavier_uniform(keys[next(ki)], (in_dim, out_dim), 1.0)
    params["out_b"] = jnp.zeros((out_dim,))
    return params


def _init_mlp_no_xyz(key, c_dim, hidden, n_blocks, skips, color) -> Dict[str, Any]:
    """Parameters for reference `MLP_no_xyz` (decoder.py:206-274): the grid
    feature itself is the input; no positional embedding."""
    relu_gain = np.sqrt(2.0)
    params: Dict[str, Any] = {}
    keys = jax.random.split(key, 2 + n_blocks)
    lin_w, lin_b = [], []
    in_dim = hidden  # reference layer 0 is DenseLayer(hidden, hidden); c_dim == hidden
    for i in range(n_blocks):
        lin_w.append(_xavier_uniform(keys[i], (in_dim, hidden), relu_gain))
        lin_b.append(jnp.zeros((hidden,)))
        in_dim = hidden + c_dim if i in skips else hidden
    params["lin_w"] = lin_w
    params["lin_b"] = lin_b
    out_dim = 4 if color else 1
    params["out_w"] = _xavier_uniform(keys[-1], (in_dim, out_dim), 1.0)
    params["out_b"] = jnp.zeros((out_dim,))
    return params


def init_nice_decoders(
    key: jax.Array,
    c_dim: int = 32,
    hidden_size: int = 32,
    coarse: bool = False,
    pos_embedding_method: str = "fourier",
) -> Dict[str, Any]:
    """The NICE decoder family (reference NICE.__init__, decoder.py:293-310)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pe = pos_embedding_method
    dec = {
        "middle": _init_mlp(k1, c_dim, hidden_size, 5, (2,), False, False,
                            pos_embedding_method=pe, name="middle"),
        "fine": _init_mlp(k2, c_dim, hidden_size, 5, (2,), False, True,
                          pos_embedding_method=pe, name="fine"),
        "color": _init_mlp(k3, c_dim, hidden_size, 5, (2,), True, False,
                           pos_embedding_method=pe, name="color"),
    }
    if coarse:
        dec["coarse"] = _init_mlp_no_xyz(k4, c_dim, hidden_size, 5, (2,), False)
    return dec


def init_imap_decoder(
    key: jax.Array, pos_embedding_method: str = "fourier"
) -> Dict[str, Any]:
    """iMAP*: single MLP, c_dim=0, hidden 256, 4 blocks, no skips, color
    (reference src/conv_onet/config.py:28-32)."""
    return {"imap": _init_mlp(key, 0, 256, 4, (), True, False,
                              pos_embedding_method=pos_embedding_method,
                              name="imap")}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _mlp_forward(
    params: Dict[str, Any],
    p: jnp.ndarray,
    feat: Optional[jnp.ndarray],
    mm_dtype=None,
) -> jnp.ndarray:
    """Reference MLP.forward (decoder.py:177-203). p: [N,3]; feat: [N,c].

    Skip positions and the color head are inferred from weight shapes
    (a layer expecting ``hidden + emb`` inputs marks a preceding skip).
    """
    if mm_dtype is None:
        mm = lambda a, b: a @ b
    else:
        # reduced-precision matmuls with f32 accumulation (MXU native mode),
        # bf16 in the backward pass too
        mm = _bf16_matmul
    if "B" in params:
        # fourier: the embedding matmul stays f32: sin() is evaluated at
        # arguments of O(+-50), where bf16's absolute error is O(0.25) and
        # would randomize the phase
        if mm_dtype is not None:
            # materialize the bf16 embedding ONCE behind a barrier: without
            # it XLA re-fuses sin+convert into every consumer GEMM (and its
            # backward rematerializations), re-reading the f32 [N,93]
            # pre-sine matmul each time — profiled at 12.8 ms/iter vs 7.0
            # on the tracking decode (same values: the GEMM casts to
            # mm_dtype either way). The custom VJP additionally recomputes
            # cos in the backward instead of saving the f32 pre-sine array.
            emb = _fourier_emb_bf16(p, params["B"])
        else:
            emb = jnp.sin(p @ params["B"])
    elif "nerf_freqs" in params:
        # nerf: [x, sin(x f1), cos(x f1), sin(x f2), ...] (decoder.py:49-66)
        xf = p[..., None, :] * params["nerf_freqs"][:, None]  # [N, F, 3]
        n = p.shape[0]
        sc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)  # [N, F, 2, 3]
        emb = jnp.concatenate([p, sc.reshape(n, -1)], axis=-1)
    elif "emb_w" in params:
        # fc_relu: a plain Linear embedder (init gain is relu's, but no
        # activation is applied — reference decoder.py:149-151)
        emb = p @ params["emb_w"] + params["emb_b"]
    else:
        emb = p  # 'same'
    emb_dim = emb.shape[-1]
    h = emb
    n_blocks = len(params["lin_w"])
    for i, (w, b) in enumerate(zip(params["lin_w"], params["lin_b"])):
        h = jax.nn.relu(mm(h, w) + b)
        if feat is not None:
            h = h + mm(feat, params["fc_w"][i]) + params["fc_b"][i]
        hidden = w.shape[1]
        next_in = (
            params["lin_w"][i + 1].shape[0]
            if i + 1 < n_blocks
            else params["out_w"].shape[0]
        )
        if next_in == hidden + emb_dim:
            if emb.dtype != h.dtype:
                h = jnp.concatenate([emb.astype(h.dtype), h], axis=-1)
            else:
                h = jnp.concatenate([emb, h], axis=-1)
    out = mm(h, params["out_w"]) + params["out_b"]
    if params["out_w"].shape[1] == 1:
        out = out[..., 0]
    return out


def _mlp_no_xyz_forward(params: Dict[str, Any], feat: jnp.ndarray) -> jnp.ndarray:
    """Reference MLP_no_xyz.forward (decoder.py:262-274)."""
    h = feat
    feat_dim = feat.shape[-1]
    n_blocks = len(params["lin_w"])
    for i, (w, b) in enumerate(zip(params["lin_w"], params["lin_b"])):
        h = jax.nn.relu(h @ w + b)
        hidden = w.shape[1]
        next_in = (
            params["lin_w"][i + 1].shape[0]
            if i + 1 < n_blocks
            else params["out_w"].shape[0]
        )
        if next_in == hidden + feat_dim:
            h = jnp.concatenate([feat, h], axis=-1)
    out = h @ params["out_w"] + params["out_b"]
    if params["out_w"].shape[1] == 1:
        out = out[..., 0]
    return out


def _grid_feat(grids, level: str, p: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    p_nor = normalize_3d_coordinate(p, bound)
    return sample_grid_trilinear(grids[level], p_nor)


def nice_forward(
    decoders: Dict[str, Any],
    grids: Dict[str, jnp.ndarray],
    p: jnp.ndarray,
    bound: jnp.ndarray,
    stage: str,
    coarse_bound_enlarge: float = 2.0,
    fused: bool = False,
) -> jnp.ndarray:
    """Staged NICE forward (reference NICE.forward, decoder.py:312-342).

    p: [N, 3] world points -> raw [N, 4] (rgb, occ). ``stage`` is static.
    """
    if stage == "coarse":
        cb = bound * coarse_bound_enlarge
        feat = _grid_feat(grids, "coarse", p, cb)
        occ = _mlp_no_xyz_forward(decoders["coarse"], feat)
        return jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (3,)), occ[..., None]], axis=-1
        )

    if stage == "middle":
        feat = _grid_feat(grids, "middle", p, bound)
        occ = _mlp_forward(decoders["middle"], p, feat)
        return jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (3,)), occ[..., None]], axis=-1
        )

    if stage == "color" and fused:
        return nice_forward_packed(decoders, grids, p, bound)

    middle_feat = _grid_feat(grids, "middle", p, bound)
    fine_feat = jnp.concatenate(
        [_grid_feat(grids, "fine", p, bound), jax.lax.stop_gradient(middle_feat)],
        axis=-1,
    )

    fine_occ = _mlp_forward(decoders["fine"], p, fine_feat)
    middle_occ = _mlp_forward(decoders["middle"], p, middle_feat)
    occ = fine_occ + middle_occ

    if stage == "fine":
        return jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (3,)), occ[..., None]], axis=-1
        )
    if stage == "color":
        color_feat = _grid_feat(grids, "color", p, bound)
        raw = _mlp_forward(decoders["color"], p, color_feat)
        return jnp.concatenate([raw[..., :3], occ[..., None]], axis=-1)
    raise ValueError(f"unknown stage {stage!r}")


def pack_grids_for_tracking(grids: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Read-only packed-corner snapshot of the scene grids for the tracker's
    gather-bound decode: middle packed alone, fine+color packed together
    (ops/grid_sample.py packed layout, bf16 rows). Rebuilt once per mapping
    update; reused by every tracking iteration."""
    from evennicer_slam_tpu.ops.grid_sample import pack_corner_grid

    out = dict(grids)
    out["middle_packed"] = pack_corner_grid(grids["middle"])
    out["fc_packed"] = pack_corner_grid(
        jnp.concatenate([grids["fine"], grids["color"]], axis=-1)
    )
    return out


def nice_forward_packed(
    decoders: Dict[str, Any],
    grids: Dict[str, jnp.ndarray],
    p: jnp.ndarray,
    bound: jnp.ndarray,
) -> jnp.ndarray:
    """Color-stage decode against packed-corner grids: 2 gathers total
    (middle; fine+color) instead of 24 corner gathers. Gradients flow to the
    query points (pose tracking); the packed grids are data, not parameters.

    On TPU the corner reduction + all three MLPs run as one Pallas kernel
    (ops/fused_decode.py) so activations never round-trip through HBM; on CPU
    (and for non-fourier embeddings) the same math runs as XLA ops."""
    from evennicer_slam_tpu.ops.grid_sample import sample_packed_trilinear

    if "fc_packed" not in grids:
        grids = pack_grids_for_tracking(grids)
    p_nor = normalize_3d_coordinate(p, bound)

    from evennicer_slam_tpu.ops import fused_decode

    if fused_decode.supports(decoders) and pallas_decode_enabled():
        from evennicer_slam_tpu.ops.grid_sample import packed_rows_and_frac

        rows_m, frac_m = packed_rows_and_frac(grids["middle_packed"], p_nor)
        rows_f, frac_f = packed_rows_and_frac(grids["fc_packed"], p_nor)
        c_dim = grids["middle_packed"].shape[-1] // 8
        return fused_decode.fused_decode_packed(
            decoders, p, frac_m, frac_f, rows_m, rows_f, c_dim=c_dim
        )
    middle_feat = sample_packed_trilinear(grids["middle_packed"], p_nor)
    fc_feat = sample_packed_trilinear(grids["fc_packed"], p_nor)
    # the injection GEMMs consume bf16 anyway: casting the reduced feats here
    # (once, behind a barrier) halves the feat traffic every per-block
    # injection re-reads — measured 54.0 -> 50.0 ms/iter fwd+bwd, identical
    # values (the f32 corner reduction is rounded once either way)
    middle_feat = middle_feat.astype(jnp.bfloat16)
    fc_feat = fc_feat.astype(jnp.bfloat16)
    c = middle_feat.shape[-1]
    fine_feat = jnp.concatenate(
        [fc_feat[:, :c], jax.lax.stop_gradient(middle_feat)], axis=-1
    )
    color_feat = fc_feat[:, c:]
    middle_feat, fine_feat, color_feat = jax.lax.optimization_barrier(
        (middle_feat, fine_feat, color_feat)
    )
    fine_occ = _mlp_forward(decoders["fine"], p, fine_feat, mm_dtype=jnp.bfloat16)
    middle_occ = _mlp_forward(decoders["middle"], p, middle_feat, mm_dtype=jnp.bfloat16)
    raw = _mlp_forward(decoders["color"], p, color_feat, mm_dtype=jnp.bfloat16)
    occ = fine_occ + middle_occ
    return jnp.concatenate([raw[..., :3], occ[..., None]], axis=-1)


def imap_forward(decoders: Dict[str, Any], p: jnp.ndarray) -> jnp.ndarray:
    """iMAP single-MLP forward -> raw [N, 4]."""
    return _mlp_forward(decoders["imap"], p, None)


def decoder_forward(
    decoders: Dict[str, Any],
    grids: Optional[Dict[str, jnp.ndarray]],
    p: jnp.ndarray,
    bound: jnp.ndarray,
    stage: str,
    nice: bool = True,
    coarse_bound_enlarge: float = 2.0,
    fused: bool = False,
) -> jnp.ndarray:
    """Unified entry: NICE (with grids) or iMAP (grid-free)."""
    if nice:
        return nice_forward(decoders, grids, p, bound, stage,
                            coarse_bound_enlarge, fused=fused)
    return imap_forward(decoders, p)


def decoder_param_labels(decoders: Dict[str, Any]):
    """Optax labels: all decoder params share the 'decoders' LR group."""
    return jax.tree.map(lambda _: "decoders", decoders)
