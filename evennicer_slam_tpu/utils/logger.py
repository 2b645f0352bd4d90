"""Checkpointing with true resume.

The reference writes torch ``.tar`` checkpoints ({grids, decoder state, pose
lists, keyframe list, idx}) that nothing can reload into a live run
(reference src/utils/Logger.py:21-35; SURVEY.md §5 "no resume path exists").
Here the full SLAM state is a pytree, so save/restore is symmetric: a single
``.npz`` per checkpoint holds every array plus the keyframe registry, and
``CheckpointLogger.restore`` resumes a run mid-sequence.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import numpy as np


def _flatten_tree(tree: Any, prefix: str, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten_tree(v, f"{prefix}.{k}", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten_tree(v, f"{prefix}[{i}]", out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten_into(template: Any, prefix: str, flat: Dict[str, np.ndarray]):
    import jax.numpy as jnp

    if isinstance(template, dict):
        return {
            k: _unflatten_into(v, f"{prefix}.{k}", flat) for k, v in template.items()
        }
    if isinstance(template, (list, tuple)):
        seq = [
            _unflatten_into(v, f"{prefix}[{i}]", flat)
            for i, v in enumerate(template)
        ]
        return type(template)(seq)
    return jnp.asarray(flat[prefix])


class CheckpointLogger:
    """Writes ``{idx:05d}.npz`` checkpoints (+ keyframe pickle)."""

    def __init__(self, ckpt_dir: str, verbose: bool = False):
        self.ckpt_dir = ckpt_dir
        self.verbose = verbose
        os.makedirs(ckpt_dir, exist_ok=True)

    def log(self, slam, idx: int):
        flat: Dict[str, np.ndarray] = {}
        _flatten_tree(slam.grids, "grids", flat)
        _flatten_tree(slam.decoders, "decoders", flat)
        flat["estimate_c2w_list"] = slam.estimate_c2w_list
        flat["gt_c2w_list"] = slam.gt_c2w_list
        flat["idx"] = np.asarray(idx)
        path = os.path.join(self.ckpt_dir, f"{idx:05d}.npz")
        np.savez_compressed(path, **flat)
        with open(os.path.join(self.ckpt_dir, f"{idx:05d}.keyframes.pkl"), "wb") as f:
            pickle.dump(
                {
                    "keyframe_list": slam.mapper.keyframes.indices,
                    "keyframes": slam.mapper.keyframes.frames,
                    "selected_keyframes": slam.mapper.selected_keyframes or None,
                },
                f,
            )
        if self.verbose:
            print("Saved checkpoint at", path)
        return path

    @staticmethod
    def latest(ckpt_dir: str):
        ckpts = sorted(
            f for f in os.listdir(ckpt_dir) if f.endswith(".npz")
        )
        return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None

    @staticmethod
    def restore(slam, path: str) -> int:
        """Load a checkpoint into a live pipeline; returns the frame index to
        resume from (the checkpoint's idx + 1).

        Checkpoints are written right after a mapped frame (``run()``'s ckpt
        cadence), i.e. at an ``every_frame`` window boundary — so the
        tracker/mapper transient state at that point is fully determined by
        the checkpointed frame and is reconstructed here: ``pre_gt_color`` is
        frame ``idx``'s color (set by ``Tracker.end_of_window``), the event
        integral has just been reset, and the mapper's previous-color buffer
        is frame ``idx``'s color (set by ``_map_frame``)."""
        import jax.numpy as jnp

        data = dict(np.load(path, allow_pickle=False))
        slam.grids = _unflatten_into(slam.grids, "grids", data)
        slam.decoders = _unflatten_into(slam.decoders, "decoders", data)
        slam.estimate_c2w_list = data["estimate_c2w_list"]
        slam.gt_c2w_list = data["gt_c2w_list"]
        idx = int(data["idx"])
        kf_path = path.replace(".npz", ".keyframes.pkl")
        if os.path.exists(kf_path):
            with open(kf_path, "rb") as f:
                kf = pickle.load(f)
            slam.mapper.keyframes.frames = kf["keyframes"]
            slam.mapper.selected_keyframes = kf.get("selected_keyframes") or {}
            if slam.coarse_mapper is not None:
                slam.coarse_mapper.keyframes = slam.mapper.keyframes
        slam.idx = idx
        slam.mapping_idx = idx
        if getattr(slam, "concurrent", False):
            # concurrent (loose/free) mode: re-commit the restored scene
            # state to the MAP device group (restore loads uncommitted
            # default-device arrays, which would drag mapping programs onto
            # the tracker's devices) and reset the adoption bookkeeping
            import jax

            slam.grids = jax.device_put(slam.grids, slam.submeshes.map_repl)
            slam.decoders = jax.device_put(
                slam.decoders, slam.submeshes.map_repl
            )
            slam._track_grids = None  # re-adopted lazily on the next track
            slam._track_decoders = None
            slam.adopted_map_idx = idx
            slam._last_map_dispatch_idx = idx

        frame = slam.frame_reader[idx]
        slam.tracker.pre_gt_color = jnp.asarray(frame.color)
        if slam.use_events:
            slam.tracker.reset_event_integration(frame.event.shape)
        slam.pre_gt_color_mapper = frame.color
        return idx + 1
