"""Mesh reconstruction evaluation: 3D accuracy/completion metrics + 2D
depth-L1.

Rebuild of reference src/tools/eval_recon.py:24-231 without open3d/trimesh:

- 3D: ICP-align the reconstructed mesh to ground truth, sample 200k surface
  points on each, then KD-tree nearest distances give accuracy (cm),
  completion (cm), and completion ratio (% < 5 cm).
- 2D: depth-L1 (cm) over random interior views; mesh depth maps are rendered
  by z-buffer splatting of dense surface samples (replacing the reference's
  open3d offscreen renderer).

Usage:
    python -m evennicer_slam_tpu.tools.eval_recon --rec_mesh a.ply --gt_mesh b.ply [-3d] [-2d]
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np
from scipy.spatial import cKDTree

from evennicer_slam_tpu.mesh.trimesh_lite import Mesh


def nn_distances(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    tree = cKDTree(dst)
    d, _ = tree.query(src, k=1, workers=-1)
    return d


def icp_align(
    src_pts: np.ndarray, dst_pts: np.ndarray, iters: int = 30, threshold: float = 0.1
) -> np.ndarray:
    """Point-to-point ICP; returns a 4x4 transform mapping src -> dst
    (replaces the reference's o3d.registration_icp, eval_recon.py:54-75)."""
    T = np.eye(4)
    cur = src_pts.copy()
    tree = cKDTree(dst_pts)
    for _ in range(iters):
        d, idx = tree.query(cur, k=1, workers=-1)
        keep = d < threshold
        if keep.sum() < 10:
            break
        a = cur[keep]
        b = dst_pts[idx[keep]]
        ca, cb = a.mean(0), b.mean(0)
        H = (a - ca).T @ (b - cb)
        U, _, Vh = np.linalg.svd(H)
        S = np.eye(3)
        if np.linalg.det(U @ Vh) < 0:
            S[2, 2] = -1
        R = Vh.T @ S @ U.T
        t = cb - R @ ca
        step = np.eye(4)
        step[:3, :3] = R
        step[:3, 3] = t
        cur = cur @ R.T + t
        T = step @ T
    return T


def accuracy(rec_pts, gt_pts):
    return float(nn_distances(rec_pts, gt_pts).mean())


def completion(rec_pts, gt_pts):
    return float(nn_distances(gt_pts, rec_pts).mean())


def completion_ratio(rec_pts, gt_pts, dist_th: float = 0.05):
    return float((nn_distances(gt_pts, rec_pts) < dist_th).mean())


def calc_3d_metric(
    rec_path: str, gt_path: str, n_samples: int = 200000, align: bool = True
) -> Dict[str, float]:
    """3D metrics in the reference's units: accuracy/completion in cm,
    completion ratio in % (reference eval_recon.py:91-117)."""
    rng = np.random.default_rng(0)
    rec = Mesh.load(rec_path)
    gt = Mesh.load(gt_path)
    rec_pts = rec.sample_surface(n_samples, rng)
    gt_pts = gt.sample_surface(n_samples, rng)
    if align:
        T = icp_align(rec_pts[::20], gt_pts[::20])
        rec_pts = rec_pts @ T[:3, :3].T + T[:3, 3]
    acc = accuracy(rec_pts, gt_pts)
    comp = completion(rec_pts, gt_pts)
    ratio = completion_ratio(rec_pts, gt_pts)
    return {
        "accuracy (cm)": acc * 100,
        "completion (cm)": comp * 100,
        "completion ratio (<5cm %)": ratio * 100,
    }


def splat_depth(
    points: np.ndarray,
    c2w: np.ndarray,
    H: int,
    W: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
) -> np.ndarray:
    """Z-buffer depth render of a point set from a camera pose (camera
    convention of core.rays). Zero where nothing projects."""
    w2c = np.linalg.inv(c2w)
    ones = np.ones((points.shape[0], 1))
    cam = (w2c @ np.concatenate([points, ones], 1).T).T[:, :3]
    z = -cam[:, 2]
    front = z > 1e-6
    cam = cam[front]
    z = z[front]
    u = np.round(cx + fx * cam[:, 0] / z).astype(int)
    v = np.round(cy - fy * cam[:, 1] / z).astype(int)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    u, v, z = u[ok], v[ok], z[ok]
    depth = np.full((H, W), np.inf)
    np.minimum.at(depth, (v, u), z)
    depth[~np.isfinite(depth)] = 0.0
    return depth


def calc_2d_metric(
    rec_path: str,
    gt_path: str,
    n_imgs: int = 1000,
    H: int = 500,
    W: int = 500,
    focal: float = 300.0,
    n_points: int = 1500000,
    unseen_pc: np.ndarray = None,
    seed: int = 0,
) -> Dict[str, float]:
    """Depth-L1 (cm) over random interior views (reference
    eval_recon.py:131-210). Views are sampled above the GT mesh centroid
    looking in random directions; views dominated by unseen regions are
    skipped when an unseen point cloud is supplied."""
    rng = np.random.default_rng(seed)
    rec = Mesh.load(rec_path)
    gt = Mesh.load(gt_path)
    gt_pts = gt.sample_surface(n_points, rng)
    rec_pts = rec.sample_surface(n_points, rng)
    unseen_tree = cKDTree(unseen_pc) if unseen_pc is not None else None

    lo = gt.vertices.min(0)
    hi = gt.vertices.max(0)
    center = (lo + hi) / 2
    cx, cy = (W - 1) / 2, (H - 1) / 2

    errs = []
    tries = 0
    while len(errs) < n_imgs and tries < n_imgs * 5:
        tries += 1
        eye = center + (rng.random(3) - 0.5) * (hi - lo) * 0.3
        fwd = rng.normal(size=3)
        fwd[2] *= 0.3
        fwd /= np.linalg.norm(fwd)
        z = -fwd
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(up, z)
        if np.linalg.norm(x) < 1e-6:
            continue
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([x, y, z], 1)
        c2w[:3, 3] = eye

        gt_depth = splat_depth(gt_pts, c2w, H, W, focal, focal, cx, cy)
        if unseen_tree is not None:
            # skip views that mostly see unseen area (reference :169-183)
            jj, ii = np.meshgrid(
                np.arange(0, H, 16), np.arange(0, W, 16), indexing="ij"
            )
            d = gt_depth[jj, ii]
            dirs = np.stack(
                [(ii - cx) / focal, -(jj - cy) / focal, -np.ones_like(ii, float)], -1
            )
            pts = eye + (dirs @ c2w[:3, :3].T) * d[..., None]
            nn, _ = unseen_tree.query(pts.reshape(-1, 3), k=1, workers=-1)
            if (nn < 0.05).mean() > 0.2:
                continue
        rec_depth = splat_depth(rec_pts, c2w, H, W, focal, focal, cx, cy)
        valid = (gt_depth > 0) & (rec_depth > 0)
        if valid.sum() < 100:
            continue
        errs.append(np.abs(gt_depth[valid] - rec_depth[valid]).mean())
    return {"depth L1 (cm)": float(np.mean(errs) * 100) if errs else float("nan")}


def main():
    parser = argparse.ArgumentParser(description="Mesh reconstruction evaluation")
    parser.add_argument("--rec_mesh", required=True)
    parser.add_argument("--gt_mesh", required=True)
    parser.add_argument("-3d", "--metric_3d", action="store_true")
    parser.add_argument("-2d", "--metric_2d", action="store_true")
    parser.add_argument("--n_imgs", type=int, default=1000)
    args = parser.parse_args()
    if args.metric_3d or not args.metric_2d:
        for k, v in calc_3d_metric(args.rec_mesh, args.gt_mesh).items():
            print(f"{k}: {v:.4f}")
    if args.metric_2d:
        for k, v in calc_2d_metric(
            args.rec_mesh, args.gt_mesh, n_imgs=args.n_imgs
        ).items():
            print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
