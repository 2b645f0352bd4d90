"""Procedural synthetic RGB-D + event sequences for tests and benchmarks.

The reference has no test fixtures at all (SURVEY.md §4); this module
generates a tiny Replica-format scene on disk — a textured axis-aligned room
rendered analytically by ray/box intersection — with ESIM-style ground-truth
event frames, so the full pipeline (datasets -> tracker -> mapper -> mesher ->
eval tools) can run hermetically.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import cv2
import numpy as np

PNG_DEPTH_SCALE = 6553.5


def _wall_texture(u: np.ndarray, v: np.ndarray, face: int) -> np.ndarray:
    """Smooth per-face texture in [0,1]^3; face in 0..5 (±x, ±y, ±z)."""
    base = np.array(
        [
            [0.9, 0.3, 0.3],
            [0.3, 0.9, 0.3],
            [0.3, 0.3, 0.9],
            [0.9, 0.9, 0.3],
            [0.3, 0.9, 0.9],
            [0.9, 0.3, 0.9],
        ],
        np.float32,
    )[face]
    # texture with gradient in BOTH face axes so every pose DoF is observable
    # photometrically (a plain wall leaves motion along the wall plane with a
    # flat loss landscape)
    pat = 0.5 + 0.2 * np.sin(6.0 * np.pi * u) * np.cos(5.0 * np.pi * v)
    pat += 0.15 * np.sin(2.5 * np.pi * v) + 0.1 * np.cos(3.5 * np.pi * u)
    check = 0.12 * (((u * 8).astype(int) + (v * 8).astype(int)) % 2)
    c = base[None, :] * (pat + check)[:, None]
    return np.clip(c, 0.0, 1.0)


def render_box_views(
    c2w: np.ndarray,
    H: int,
    W: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bound: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Analytic render of the room interior from one pose.

    Returns (color [H, W, 3] in [0,1], depth [H, W] in meters)."""
    j, i = np.meshgrid(np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij")
    dirs = np.stack([(i - cx) / fx, -(j - cy) / fy, -np.ones_like(i)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)

    flat_d = rays_d.reshape(-1, 3)
    flat_o = rays_o.reshape(-1, 3)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (bound.T[None] - flat_o[:, None, :]) / flat_d[:, None, :]  # [N, 2, 3]
    t = np.where(np.isfinite(t), t, np.inf)
    t_exit = np.min(np.max(t, axis=1), axis=1)  # exit distance per ray
    hit = flat_o + t_exit[:, None] * flat_d
    # pixel dirs have z_cam = -1, so the ray parameter t IS the z-depth —
    # exactly the quantity stored in Replica depth PNGs and consumed by the
    # renderer's depth-guided sampling.
    depth = t_exit

    # texture lookup
    eps = 1e-4
    colors = np.zeros((flat_o.shape[0], 3), np.float32)
    assigned = np.zeros(flat_o.shape[0], bool)
    ext = bound[:, 1] - bound[:, 0]
    for axis in range(3):
        for side in range(2):
            face = axis * 2 + side
            plane = bound[axis, side]
            m = np.abs(hit[:, axis] - plane) < eps * max(1.0, abs(plane))
            m &= ~assigned
            assigned |= m
            if not np.any(m):
                continue
            other = [a for a in range(3) if a != axis]
            u = (hit[m, other[0]] - bound[other[0], 0]) / ext[other[0]]
            v = (hit[m, other[1]] - bound[other[1], 0]) / ext[other[1]]
            colors[m] = _wall_texture(u, v, face)

    return colors.reshape(H, W, 3), depth.reshape(H, W).astype(np.float32)


def _look_at(eye: np.ndarray, target: np.ndarray) -> np.ndarray:
    """c2w rotation for a camera at ``eye`` looking at ``target`` (camera
    convention of core.rays: x right, y up, z backward)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    z = -fwd
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(up, z)
    nx = np.linalg.norm(x)
    if nx < 1e-6:  # looking straight up/down
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        nx = np.linalg.norm(x)
    x = x / nx
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = R
    c2w[:3, 3] = eye
    return c2w


def circular_trajectory(
    n: int,
    center: np.ndarray,
    radius: float = 0.3,
    height_amp: float = 0.05,
    step: float = None,
    jitter: float = 0.0,
    jitter_seed: int = 7,
) -> np.ndarray:
    """Smooth camera path inside the room: the eye orbits the center while the
    gaze pans along the walls (so views hit corners — varied depth gives
    tracking a full 6-DoF signal). ``step`` is the per-frame angle increment
    (radians); default sweeps a quarter turn over the sequence.
    Returns [n, 4, 4] c2w."""
    poses = []
    jr = np.random.default_rng(jitter_seed)
    for k in range(n):
        th = k * step if step is not None else 2.0 * np.pi * k / max(n, 1) * 0.25
        eye = center + np.array(
            [radius * np.cos(th), radius * np.sin(th), height_amp * np.sin(2 * th)]
        )
        if jitter > 0:
            # non-smooth motion: breaks constant-velocity extrapolation so
            # frame-to-frame supervision (events) has something to correct
            eye = eye + jr.normal(scale=jitter, size=3)
        gaze = th + 0.6  # pan ahead of the eye position
        # pitch the gaze down toward the floor corner so depth varies along
        # the image v-axis too (full 6-DoF observability)
        target = center + np.array(
            [2.0 * np.cos(gaze), 2.0 * np.sin(gaze), -0.7 + 0.25 * np.sin(3 * th)]
        )
        poses.append(_look_at(eye, target))
    return np.stack(poses)


def make_synthetic_replica(
    out_dir: str,
    n_frames: int = 8,
    H: int = 120,
    W: int = 200,
    fx: float = 100.0,
    fy: float = 100.0,
    bound: Optional[np.ndarray] = None,
    event_gain: float = 20.0,
    traj_step: float = None,
    traj_jitter: float = 0.0,
) -> Dict:
    """Write a Replica-format dataset (+ event folder) and return a config
    fragment describing it. Layout matches reference expectations:
    ``results/frame*.png``, ``results/depth*.png`` (16-bit, x6553.5),
    ``traj.txt`` (pre-flip poses), ``events/*frame*.png`` ([pos, neg, 0] BGR).
    """
    if bound is None:
        bound = np.array([[-1.2, 1.2], [-1.0, 1.0], [-0.8, 0.8]], np.float32)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    res = os.path.join(out_dir, "results")
    ev_dir = os.path.join(out_dir, "events")
    os.makedirs(res, exist_ok=True)
    os.makedirs(ev_dir, exist_ok=True)
    # remove stale frames from a previous generation with a different length
    import glob as _glob

    for stale in _glob.glob(os.path.join(res, "*.png")) + _glob.glob(
        os.path.join(ev_dir, "*.png")
    ):
        os.remove(stale)

    center = bound.mean(axis=1)
    poses = circular_trajectory(n_frames, center, step=traj_step, jitter=traj_jitter)

    traj_lines = []
    prev_intensity = None
    for k in range(n_frames):
        color, depth = render_box_views(poses[k], H, W, fx, fy, cx, cy, bound)
        cv2.imwrite(
            os.path.join(res, f"frame{k:06d}.png"),
            cv2.cvtColor((color * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
        )
        cv2.imwrite(
            os.path.join(res, f"depth{k:06d}.png"),
            np.clip(depth * PNG_DEPTH_SCALE, 0, 65535).astype(np.uint16),
        )
        intensity = color.mean(axis=-1)
        if k > 0:
            diff = (intensity - prev_intensity) * event_gain
            pos = np.clip(diff, 0, 255)
            neg = np.clip(-diff, 0, 255)
            # file stored BGR = [pos, neg, 0] so BGR->RGB gives [0, neg, pos]
            ev_bgr = np.stack([pos, neg, np.zeros_like(pos)], axis=-1).astype(np.uint8)
            cv2.imwrite(os.path.join(ev_dir, f"frame{k - 1:06d}.png"), ev_bgr)
        prev_intensity = intensity

        # traj.txt stores the pre-flip matrix (loader flips y/z)
        raw = poses[k].copy()
        raw[:3, 1] *= -1
        raw[:3, 2] *= -1
        traj_lines.append(" ".join(f"{v:.9f}" for v in raw.reshape(-1)))

    with open(os.path.join(out_dir, "traj.txt"), "w") as f:
        f.write("\n".join(traj_lines) + "\n")

    margin = 0.02
    cfg_bound = (bound + np.array([-margin, margin])).tolist()
    return {
        "dataset": "replica_event",
        "data": {
            "input_folder": out_dir,
            "event_folder": ev_dir,
            "output": os.path.join(out_dir, "output"),
        },
        "cam": {
            "H": H,
            "W": W,
            "fx": fx,
            "fy": fy,
            "cx": cx,
            "cy": cy,
            "png_depth_scale": PNG_DEPTH_SCALE,
            "crop_edge": 0,
        },
        "mapping": {"bound": cfg_bound, "marching_cubes_bound": cfg_bound},
    }
