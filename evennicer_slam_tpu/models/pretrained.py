"""Torch-checkpoint converters: ConvONet decoder weights and EventNet weights.

The reference loads pretrained ConvONet checkpoints with key-prefix surgery
(reference src/EvenNICER_SLAM.py:184-215): ``pretrained/middle_fine.pt``
holds both the middle decoder (keys ``decoder.coarse_*``) and the fine decoder
(keys ``decoder.fine_*``); ``pretrained/coarse.pt`` holds the coarse decoder
(keys ``decoder.*``). Torch linear weights are [out, in] and are transposed
into this framework's [in, out] layout.

torch (CPU build) is an optional dependency used only here, at load time.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp


def _load_torch_state(path: str) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _mlp_from_torch(state: Dict[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    """Convert a reference-MLP/MLP_no_xyz torch state_dict subtree into the
    decoders.py param layout (weights transposed to [in, out])."""
    params: Dict[str, Any] = {}
    if f"{prefix}embedder._B" in state:
        params["B"] = jnp.asarray(state[f"{prefix}embedder._B"])

    lin_w, lin_b = [], []
    i = 0
    while f"{prefix}pts_linears.{i}.weight" in state:
        lin_w.append(jnp.asarray(state[f"{prefix}pts_linears.{i}.weight"].T))
        lin_b.append(jnp.asarray(state[f"{prefix}pts_linears.{i}.bias"]))
        i += 1
    params["lin_w"], params["lin_b"] = lin_w, lin_b

    if f"{prefix}fc_c.0.weight" in state:
        fc_w, fc_b = [], []
        i = 0
        while f"{prefix}fc_c.{i}.weight" in state:
            fc_w.append(jnp.asarray(state[f"{prefix}fc_c.{i}.weight"].T))
            fc_b.append(jnp.asarray(state[f"{prefix}fc_c.{i}.bias"]))
            i += 1
        params["fc_w"], params["fc_b"] = fc_w, fc_b

    params["out_w"] = jnp.asarray(state[f"{prefix}output_linear.weight"].T)
    params["out_b"] = jnp.asarray(state[f"{prefix}output_linear.bias"])
    return params


def load_pretrained_decoders(
    decoders: Dict[str, Any],
    middle_fine_path: str,
    coarse_path: str | None = None,
) -> Dict[str, Any]:
    """Overwrite middle/fine (and optionally coarse) decoder params from
    ConvONet checkpoints, mirroring reference load_pretrain
    (src/EvenNICER_SLAM.py:184-215)."""
    state = _load_torch_state(middle_fine_path)
    middle: Dict[str, np.ndarray] = {}
    fine: Dict[str, np.ndarray] = {}
    for key, val in state.items():
        if "decoder" in key and "encoder" not in key:
            # reference surgery: 'decoder.coarse_' -> middle, 'decoder.fine_' -> fine
            if "coarse" in key:
                middle[key[8 + 7 :]] = val
            elif "fine" in key:
                fine[key[8 + 5 :]] = val
    out = dict(decoders)
    out["middle"] = _mlp_from_torch(middle)
    out["fine"] = _mlp_from_torch(fine)

    if coarse_path is not None and "coarse" in decoders:
        cstate = _load_torch_state(coarse_path)
        coarse = {
            k[8:]: v
            for k, v in cstate.items()
            if "decoder" in k and "encoder" not in k
        }
        out["coarse"] = _mlp_from_torch(coarse)
    return out
