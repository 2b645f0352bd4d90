"""Trajectory/mesh visualizer: replay, live follow, and video export.

Rebuild of the reference's interactive open3d frontend
(reference src/tools/viz.py:14-209 SLAMFrontend, visualizer.py:15-96):

- loads a checkpoint and draws estimated vs ground-truth trajectories with a
  camera-frustum actor for the current pose, over (a) a point-sampled mesh
  top-down/3D panel and (b) a SHADED MESH RENDER from a chase camera — the
  mesh view the o3d window gave, produced headless by the triangle
  rasterizer in mesh/raster.py,
- ``--follow`` polls the run's output directory for new checkpoints/meshes
  and re-renders as they appear (the live-frontend workflow, headless),
- ``--save_rendering`` writes one frame per pose; ``--gif`` assembles them
  into an animated GIF via Pillow (the reference shells out to ffmpeg, which
  this environment does not ship; the frame sequence remains ffmpeg-ready).

Usage:
    python -m evennicer_slam_tpu.tools.viz <config.yaml> [--output DIR]
        [--save_rendering] [--gif] [--follow] [--frame_step N]
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np


def _frustum_lines(c2w: np.ndarray, scale: float = 0.12):
    """Camera-frustum wireframe segments (reference camera actor)."""
    pts = np.array([
        [0, 0, 0],
        [-1, -0.75, -1.5], [1, -0.75, -1.5], [1, 0.75, -1.5], [-1, 0.75, -1.5],
    ]) * scale
    pts = pts @ c2w[:3, :3].T + c2w[:3, 3]
    segs = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    return [(pts[a], pts[b]) for a, b in segs]


def render_mesh_view(mesh, c2w: np.ndarray, H: int = 240, W: int = 320):
    """Depth-shaded mesh render from a pose (chase-cam panel)."""
    from evennicer_slam_tpu.mesh.raster import rasterize_depth

    f = 0.8 * W
    # convert from the SLAM camera convention (y up, -z forward) to the
    # rasterizer's CV convention (y down, +z forward)
    cv = c2w.copy()
    cv[:3, 1] *= -1
    cv[:3, 2] *= -1
    d = rasterize_depth(mesh.vertices, mesh.faces, np.linalg.inv(cv),
                        H, W, f, f, (W - 1) / 2, (H - 1) / 2)
    return d


def _chase_pose(cur_c2w: np.ndarray, back: float = 0.6, up: float = 0.3):
    """A pose slightly behind/above the current camera, looking the same way."""
    pose = cur_c2w.copy()
    fwd = -pose[:3, 2]
    pose[:3, 3] = pose[:3, 3] - fwd * back + np.array([0, 0, up])
    return pose


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

    mesh = None
    if mesh_path and os.path.exists(mesh_path):
        from evennicer_slam_tpu.mesh.trimesh_lite import Mesh

        mesh = Mesh.load(mesh_path)

    ncols = 3 if mesh is not None else 2
    fig = plt.figure(figsize=(6 * ncols, 6))
    ax3d = fig.add_subplot(1, ncols, 1, projection="3d")
    ax2d = fig.add_subplot(1, ncols, 2)

    if mesh is not None:
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
    for a, b in _frustum_lines(est_c2w[-1]):
        ax3d.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]], "r-", lw=1)
        ax2d.plot([a[0], b[0]], [a[1], b[1]], "r-", lw=0.8)
    for ax in (ax2d,):
        ax.legend()
        ax.set_aspect("equal")
    ax3d.set_title(title)

    if mesh is not None:
        axm = fig.add_subplot(1, ncols, 3)
        d = render_mesh_view(mesh, _chase_pose(est_c2w[-1]))
        shade = np.where(d > 0, d, np.nan)
        axm.imshow(shade, cmap="viridis")
        axm.set_title("mesh (chase cam)")
        axm.axis("off")

    fig.tight_layout()
    fig.savefig(out_path, dpi=90)
    plt.close(fig)
    return out_path


def assemble_gif(frame_dir: str, out_path: str, fps: int = 10):
    """Animated GIF from a frame directory (Pillow; no ffmpeg in this env)."""
    from PIL import Image

    frames = sorted(glob.glob(os.path.join(frame_dir, "*.png")))
    if not frames:
        return None
    imgs = [Image.open(f) for f in frames]
    imgs[0].save(out_path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return out_path


def _load_latest(output: str):
    from evennicer_slam_tpu.utils.logger import CheckpointLogger

    ckpt = CheckpointLogger.latest(os.path.join(output, "ckpts"))
    if ckpt is None:
        return None
    data = np.load(ckpt)
    idx = int(data["idx"])
    meshes = sorted(glob.glob(os.path.join(output, "mesh", "*.ply")))
    return (
        ckpt,
        data["estimate_c2w_list"][: idx + 1],
        data["gt_c2w_list"][: idx + 1],
        meshes[-1] if meshes else None,
        idx,
    )


def replay(output: str, save_rendering: bool = False, gif: bool = False,
           follow: bool = False, poll_s: float = 5.0, frame_step: int = 10):
    """Replay (or follow) a run's artifacts — the offline frontend shared by
    this CLI and the root ``visualizer.py``."""
    if follow:
        seen = None
        print(f"following {output} (ctrl-c to stop)")
        while True:
            state = _load_latest(output)
            if state is not None and state[0] != seen:
                seen, est, gt, mesh_path, idx = state
                out = os.path.join(output, "replay.png")
                draw_trajectory(est, gt, mesh_path, out,
                                title=f"frames 0..{idx}")
                print(f"updated {out} (frame {idx})")
            time.sleep(poll_s)

    state = _load_latest(output)
    if state is None:
        raise SystemExit(f"no checkpoints under {output}/ckpts")
    _, est, gt, mesh_path, idx = state

    if save_rendering or gif:
        vid_dir = os.path.join(output, "vis", "replay")
        os.makedirs(vid_dir, exist_ok=True)
        for k in range(1, idx + 1, frame_step):
            draw_trajectory(
                est[: k + 1], gt[: k + 1], mesh_path,
                os.path.join(vid_dir, f"{k:05d}.png"), title=f"frame {k}",
            )
        if gif:
            out = assemble_gif(vid_dir, os.path.join(output, "replay.gif"))
            print("wrote", out)
        else:
            print(f"wrote replay frames to {vid_dir} (assemble with ffmpeg)")
    else:
        out = os.path.join(output, "replay.png")
        draw_trajectory(est, gt, mesh_path, out, title=f"frames 0..{idx}")
        print("wrote", out)


def main():
    from evennicer_slam_tpu.config import default_config_path, load_config

    parser = argparse.ArgumentParser(description="Replay / follow a SLAM run")
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--save_rendering", action="store_true",
                        help="write one frame per pose for video assembly")
    parser.add_argument("--gif", action="store_true",
                        help="assemble the rendered frames into replay.gif")
    parser.add_argument("--follow", action="store_true",
                        help="poll the run dir and re-render as it progresses")
    parser.add_argument("--poll_s", type=float, default=5.0)
    parser.add_argument("--frame_step", type=int, default=10)
    parser.add_argument("--nice", dest="nice", action="store_true", default=True)
    parser.add_argument("--imap", dest="nice", action="store_false")
    args = parser.parse_args()
    cfg = load_config(args.config, default_config_path(args.nice))
    output = args.output or cfg["data"]["output"]
    replay(output, save_rendering=args.save_rendering, gif=args.gif,
           follow=args.follow, poll_s=args.poll_s, frame_step=args.frame_step)


if __name__ == "__main__":
    main()
