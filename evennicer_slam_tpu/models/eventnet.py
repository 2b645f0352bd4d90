"""EventNet: 2-head UNet predicting an event image from an intensity pair.

JAX re-implementation of the reference's pretrained event network
(reference event_net/unet_model.py:72-123, event_net/unet_parts.py:8-77):
shared encoder (6 -> 64 -> 128 -> 256 -> 512 -> 512 channels, maxpool downs),
two bilinear-upsampling decoder heads — head 1 regresses per-pixel signed
event counts (2 polarity channels), head 2 a sigmoid event-existence mask —
and ``inference = events * mask_prob`` (reference src/event_net.py:67-99).

TPU notes: NHWC layout, convolutions on the MXU; BatchNorm runs in inference
mode (affine with running stats) exactly as the reference always calls
``net.eval()``. The network is frozen at SLAM time — gradients flow *through*
it into the rendered input image.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evennicer_slam_tpu.ops.resize import resize_bilinear

_DN = ("NHWC", "HWIO", "NHWC")
BN_EPS = 1e-5

# (name, in, mid, out) per DoubleConv; bilinear=True halves up-path channels
_ENCODER = [
    ("inc", 6, 64, 64),
    ("down1", 64, 128, 128),
    ("down2", 128, 256, 256),
    ("down3", 256, 512, 512),
    ("down4", 512, 512, 512),
]
_DECODER = [
    ("up1", 1024, 512, 256),
    ("up2", 512, 256, 128),
    ("up3", 256, 128, 64),
    ("up4", 128, 64, 64),
]


def _init_double_conv(key, cin, mid, cout) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)

    def he(k, shape):
        fan_in = shape[0] * shape[1] * shape[2]
        return jax.random.normal(k, shape) * np.sqrt(2.0 / fan_in)

    return {
        "w1": he(k1, (3, 3, cin, mid)),
        "bn1": {"g": jnp.ones(mid), "b": jnp.zeros(mid),
                "m": jnp.zeros(mid), "v": jnp.ones(mid)},
        "w2": he(k2, (3, 3, mid, cout)),
        "bn2": {"g": jnp.ones(cout), "b": jnp.zeros(cout),
                "m": jnp.zeros(cout), "v": jnp.ones(cout)},
    }


def init_eventnet(key: jax.Array) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    n_keys = len(_ENCODER) + 2 * len(_DECODER) + 2
    keys = jax.random.split(key, n_keys)
    ki = 0
    for name, cin, mid, cout in _ENCODER:
        params[name] = _init_double_conv(keys[ki], cin, mid, cout)
        ki += 1
    for head in ("1", "2"):
        for name, cin, mid, cout in _DECODER:
            params[f"{name}_{head}"] = _init_double_conv(keys[ki], cin, mid, cout)
            ki += 1
        k = keys[ki]
        ki += 1
        params[f"outc_{head}"] = {
            "w": jax.random.normal(k, (1, 1, 64, 2)) * np.sqrt(2.0 / 64),
            "b": jnp.zeros(2),
        }
    return params


def _conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=_DN
    )


def _bn(x, p):
    inv = jax.lax.rsqrt(p["v"] + BN_EPS)
    return (x - p["m"]) * inv * p["g"] + p["b"]


def _double_conv(x, p):
    x = jax.nn.relu(_bn(_conv(x, p["w1"]), p["bn1"]))
    return jax.nn.relu(_bn(_conv(x, p["w2"]), p["bn2"]))


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _up(x1, x2, p):
    """Bilinear x2 upsample (align_corners=True), pad to skip size, concat
    [skip, upsampled], DoubleConv (reference unet_parts.py:42-68)."""
    n, h, w, c = x1.shape
    up = jax.vmap(lambda img: resize_bilinear(img, (h * 2, w * 2), align_corners=True))(x1)
    th, tw = x2.shape[1], x2.shape[2]
    dy, dx = th - up.shape[1], tw - up.shape[2]
    up = jnp.pad(up, ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)))
    return _double_conv(jnp.concatenate([x2, up], axis=-1), p)


def eventnet_forward(
    params: Dict[str, Any], x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [N, H, W, 6] image pair -> (events [N, H, W, 2], mask [N, H, W, 2]).

    Mirrors UNet_2heads.forward (unet_model.py:101-123); the mask head output
    is sigmoided."""
    x1 = _double_conv(x, params["inc"])
    x2 = _double_conv(_maxpool2(x1), params["down1"])
    x3 = _double_conv(_maxpool2(x2), params["down2"])
    x4 = _double_conv(_maxpool2(x3), params["down3"])
    x5 = _double_conv(_maxpool2(x4), params["down4"])

    def head(h):
        y = _up(x5, x4, params[f"up1_{h}"])
        y = _up(y, x3, params[f"up2_{h}"])
        y = _up(y, x2, params[f"up3_{h}"])
        y = _up(y, x1, params[f"up4_{h}"])
        oc = params[f"outc_{h}"]
        return _conv(y, oc["w"]) + oc["b"]

    events = head("1")
    mask = jax.nn.sigmoid(head("2"))
    return events, mask


def inference_event(
    params: Dict[str, Any], img1: jnp.ndarray, img2: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predicted event image for an (previous, current) intensity pair.

    img1/img2: [H, W, 3] in [0, 1]. Returns (event [H, W, 2], mask
    [1, H, W, 2]) — prediction = raw events x existence probability
    (reference src/event_net.py:89-99)."""
    pair = jnp.concatenate([img1, img2], axis=-1)[None]
    events, mask = eventnet_forward(params, pair)
    mask_prob = mask[..., 1:2]
    return (events * mask_prob)[0], mask


def load_eventnet_torch(path: str) -> Dict[str, Any]:
    """Convert the reference UNet_2heads ``.pth`` state_dict to this layout.

    torch conv weights [out, in, kh, kw] -> [kh, kw, in, out]; BN running
    stats kept for inference-mode normalization."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    s = {k: v.detach().cpu().numpy() for k, v in state.items()}

    def conv_w(key):
        return jnp.asarray(np.transpose(s[key], (2, 3, 1, 0)))

    def dconv(prefix):
        # torch Sequential indices: 0 conv, 1 bn, 3 conv, 4 bn
        return {
            "w1": conv_w(f"{prefix}.double_conv.0.weight"),
            "bn1": {
                "g": jnp.asarray(s[f"{prefix}.double_conv.1.weight"]),
                "b": jnp.asarray(s[f"{prefix}.double_conv.1.bias"]),
                "m": jnp.asarray(s[f"{prefix}.double_conv.1.running_mean"]),
                "v": jnp.asarray(s[f"{prefix}.double_conv.1.running_var"]),
            },
            "w2": conv_w(f"{prefix}.double_conv.3.weight"),
            "bn2": {
                "g": jnp.asarray(s[f"{prefix}.double_conv.4.weight"]),
                "b": jnp.asarray(s[f"{prefix}.double_conv.4.bias"]),
                "m": jnp.asarray(s[f"{prefix}.double_conv.4.running_mean"]),
                "v": jnp.asarray(s[f"{prefix}.double_conv.4.running_var"]),
            },
        }

    params: Dict[str, Any] = {"inc": dconv("inc")}
    for i in range(1, 5):
        params[f"down{i}"] = dconv(f"down{i}.maxpool_conv.1")
    for head in ("1", "2"):
        for i in range(1, 5):
            params[f"up{i}_{head}"] = dconv(f"up{i}_{head}.conv")
        params[f"outc_{head}"] = {
            "w": conv_w(f"outc_{head}.conv.weight"),
            "b": jnp.asarray(s[f"outc_{head}.conv.bias"]),
        }
    return params
