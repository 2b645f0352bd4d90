"""Offline trajectory/mesh replay visualizer.

Rebuild of the reference's interactive open3d frontend
(reference src/tools/viz.py:14-209, visualizer.py:15-96) as a headless
matplotlib renderer: loads a checkpoint, draws estimated vs ground-truth
trajectories over the latest mesh (top-down + 3D views), and can write a
frame sequence for video assembly.

Usage:
    python -m evennicer_slam_tpu.tools.viz <config.yaml> [--output DIR]
        [--save_rendering] [--frame_step N]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def draw_trajectory(
    est_c2w: np.ndarray,
    gt_c2w: np.ndarray,
    mesh_path: str = None,
    out_path: str = "traj.png",
    title: str = "",
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(12, 6))
    ax3d = fig.add_subplot(121, projection="3d")
    ax2d = fig.add_subplot(122)

    if mesh_path and os.path.exists(mesh_path):
        from evennicer_slam_tpu.mesh.trimesh_lite import Mesh

        mesh = Mesh.load(mesh_path)
        v = mesh.vertices
        if len(v) > 20000:
            sel = np.random.default_rng(0).choice(len(v), 20000, replace=False)
            v = v[sel]
        ax3d.scatter(v[:, 0], v[:, 1], v[:, 2], s=0.1, c="gray", alpha=0.3)
        ax2d.scatter(v[:, 0], v[:, 1], s=0.1, c="gray", alpha=0.3)

    e = est_c2w[:, :3, 3]
    g = gt_c2w[:, :3, 3]
    ax3d.plot(e[:, 0], e[:, 1], e[:, 2], "b-", label="estimated")
    ax3d.plot(g[:, 0], g[:, 1], g[:, 2], "k--", label="ground truth")
    ax2d.plot(e[:, 0], e[:, 1], "b-", label="estimated")
    ax2d.plot(g[:, 0], g[:, 1], "k--", label="ground truth")
    ax2d.scatter(e[-1:, 0], e[-1:, 1], c="red", marker="^", label="current")
    for ax in (ax2d,):
        ax.legend()
        ax.set_aspect("equal")
    ax3d.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=90)
    plt.close(fig)
    return out_path


def main():
    from evennicer_slam_tpu.config import default_config_path, load_config
    from evennicer_slam_tpu.utils.logger import CheckpointLogger

    parser = argparse.ArgumentParser(description="Replay a SLAM run")
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--save_rendering", action="store_true",
                        help="write one frame per pose for video assembly")
    parser.add_argument("--frame_step", type=int, default=10)
    parser.add_argument("--nice", dest="nice", action="store_true", default=True)
    parser.add_argument("--imap", dest="nice", action="store_false")
    args = parser.parse_args()
    cfg = load_config(args.config, default_config_path(args.nice))
    output = args.output or cfg["data"]["output"]
    ckpt = CheckpointLogger.latest(os.path.join(output, "ckpts"))
    if ckpt is None:
        raise SystemExit(f"no checkpoints under {output}/ckpts")
    data = np.load(ckpt)
    idx = int(data["idx"])
    est = data["estimate_c2w_list"][: idx + 1]
    gt = data["gt_c2w_list"][: idx + 1]
    meshes = sorted(glob.glob(os.path.join(output, "mesh", "*.ply")))
    mesh_path = meshes[-1] if meshes else None

    if args.save_rendering:
        vid_dir = os.path.join(output, "vis", "replay")
        os.makedirs(vid_dir, exist_ok=True)
        for k in range(1, idx + 1, args.frame_step):
            draw_trajectory(
                est[: k + 1], gt[: k + 1], mesh_path,
                os.path.join(vid_dir, f"{k:05d}.png"), title=f"frame {k}",
            )
        print(f"wrote replay frames to {vid_dir} (assemble with ffmpeg)")
    else:
        out = os.path.join(output, "replay.png")
        draw_trajectory(est, gt, mesh_path, out, title=f"frames 0..{idx}")
        print("wrote", out)


if __name__ == "__main__":
    main()
