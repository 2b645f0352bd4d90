"""Config system: YAML files with recursive single-parent inheritance.

API-compatible with the reference config loader (reference src/config.py:10-59):
a config file may name a parent via ``inherit_from``; parents are loaded first
and child keys are merged recursively on top.  ``load_config(path, default)``
falls back to ``default`` when the file has no ``inherit_from`` chain.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import yaml


def load_config(path: str, default_path: Optional[str] = None) -> Dict[str, Any]:
    """Load a YAML config, resolving the ``inherit_from`` chain recursively.

    Matches reference behavior (src/config.py:10-42): the named file's own
    ``inherit_from`` wins over ``default_path``; merge is deep for dicts,
    replace for leaves.
    """
    with open(path, "r") as f:
        cfg_special = yaml.full_load(f) or {}

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        # Relative inherit paths resolve against the CWD (reference behavior),
        # falling back to the directory tree of the child config so the shipped
        # configs/ dir works from anywhere.
        if not os.path.exists(inherit_from):
            candidate = _resolve_relative(inherit_from, path)
            if candidate is not None:
                inherit_from = candidate
        cfg = load_config(inherit_from, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.full_load(f) or {}
    else:
        cfg = {}

    update_recursive(cfg, cfg_special)
    return cfg


def _resolve_relative(inherit_from: str, child_path: str) -> Optional[str]:
    """Resolve an inherit path like ``configs/Replica/replica.yaml`` against
    ancestors of the child config file's directory."""
    d = os.path.dirname(os.path.abspath(child_path))
    for _ in range(6):
        candidate = os.path.join(d, inherit_from)
        if os.path.exists(candidate):
            return candidate
        # also try interpreting the path as rooted at the configs/ tree itself
        parts = inherit_from.split("/", 1)
        if len(parts) == 2 and os.path.basename(d) == parts[0]:
            candidate = os.path.join(d, parts[1])
            if os.path.exists(candidate):
                return candidate
        d = os.path.dirname(d)
    return None


def update_recursive(dict1: Dict[str, Any], dict2: Dict[str, Any]) -> None:
    """Deep-merge ``dict2`` into ``dict1`` (reference src/config.py:45-59)."""
    for k, v in dict2.items():
        if isinstance(v, dict):
            if k not in dict1 or not isinstance(dict1.get(k), dict):
                dict1[k] = {}
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def default_config_path(nice: bool = True) -> str:
    """Path to the shipped mode default (nice_slam.yaml or imap.yaml)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    name = "nice_slam.yaml" if nice else "imap.yaml"
    return os.path.join(here, "configs", name)


def get_model(cfg, nice: bool = True, key=None):
    """Decoder-model dispatch (reference src/config.py:62-79 +
    src/conv_onet/config.py:4-33; the single registered method is
    'conv_onet'). Returns the decoder parameter pytree. This is THE decoder
    init used by the pipeline (pass its PRNG key for identical weights)."""
    from evennicer_slam_tpu.models.decoders import (
        init_imap_decoder,
        init_nice_decoders,
    )

    import jax

    if key is None:
        # the pipeline derives the decoder key as split(PRNGKey(seed), 3)[1]
        key = jax.random.split(
            jax.random.PRNGKey(cfg.get("seed", 42)), 3
        )[1]
    pe = cfg["model"].get("pos_embedding_method", "fourier")
    if nice:
        return init_nice_decoders(
            key, c_dim=cfg["model"]["c_dim"], coarse=cfg.get("coarse", False),
            pos_embedding_method=pe,
        )
    return init_imap_decoder(key, pos_embedding_method=pe)
