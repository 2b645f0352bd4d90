"""Keyframe registry, overlap-based window selection, frustum feature masks.

Host-side (numpy) rebuild of reference src/Mapper.py:115-250. Keyframe images
stay in host RAM (the reference kept them on CPU too, src/Mapper.py:834-835);
only the selected optimization window is shipped to the TPU per mapping call.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import cv2
import numpy as np

from evennicer_slam_tpu.slam.camera import Camera


class KeyframeStore:
    """Append-only keyframe list (reference keyframe_list / keyframe_dict).

    Images are kept in host RAM (selection/meshing) plus a lazy device cache:
    the mapper's optimization window would otherwise re-upload ~10 MB/frame
    over the (slow) host link on every mapping call."""

    def __init__(self):
        self.frames: List[Dict] = []
        self._device_cache: Dict[int, tuple] = {}

    def __len__(self):
        return len(self.frames)

    @property
    def indices(self) -> List[int]:
        return [f["idx"] for f in self.frames]

    def append(self, idx: int, color, depth, event, est_c2w, gt_c2w,
               device_images=None):
        self.frames.append(
            {
                "idx": idx,
                "color": np.asarray(color),
                "depth": np.asarray(depth),
                "event": np.asarray(event),
                "est_c2w": np.asarray(est_c2w).copy(),
                "gt_c2w": np.asarray(gt_c2w).copy(),
            }
        )
        if device_images is not None:
            # the frame is already on device (pipeline upload) — seed the
            # cache instead of re-shipping ~10 MB on the next mapping call
            self._device_cache[len(self.frames) - 1] = tuple(device_images)

    def set_pose(self, kf_index: int, est_c2w: np.ndarray):
        self.frames[kf_index]["est_c2w"] = np.asarray(est_c2w).copy()

    def device_images(self, kf_index: int):
        """(color, depth) as device arrays, uploaded once per keyframe."""
        import jax.numpy as jnp

        if kf_index not in self._device_cache:
            f = self.frames[kf_index]
            self._device_cache[kf_index] = (
                jnp.asarray(f["color"]), jnp.asarray(f["depth"])
            )
        return self._device_cache[kf_index]


def _project(points: np.ndarray, w2c: np.ndarray, cam: Camera):
    """World points -> (uv [N,2], z [N]) with the reference's x-negation
    camera convention (src/Mapper.py:144-150)."""
    ones = np.ones((points.shape[0], 1), points.dtype)
    cam_cord = (w2c @ np.concatenate([points, ones], axis=1).T).T[:, :3]
    K = np.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]]
    )
    cam_cord = cam_cord.copy()
    cam_cord[:, 0] *= -1
    uv = (K @ cam_cord.T).T
    z = uv[:, -1:] + 1e-5
    uv = uv[:, :2] / z
    return uv, z[:, 0], cam_cord


def keyframe_selection_overlap(
    gt_color: np.ndarray,
    gt_depth: np.ndarray,
    c2w: np.ndarray,
    keyframes: List[Dict],
    k: int,
    cam: Camera,
    n_samples: int = 16,
    pixels: int = 100,
    rng: Optional[np.random.Generator] = None,
) -> List[int]:
    """Rank keyframes by the fraction of current-frame depth-guided sample
    points inside their frusta; randomly pick k of the nonzero-overlap ones
    (reference src/Mapper.py:188-250)."""
    rng = rng or np.random.default_rng()
    H, W = cam.H, cam.W
    idx = rng.integers(0, H * W, size=(pixels,))
    jj, ii = idx // W, idx % W
    depths = gt_depth[jj, ii]
    dirs = np.stack(
        [(ii - cam.cx) / cam.fx, -(jj - cam.cy) / cam.fy, -np.ones_like(ii, np.float64)],
        -1,
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = c2w[:3, 3]

    t = np.linspace(0.0, 1.0, n_samples)
    near = (depths * 0.8)[:, None]
    far = (depths + 0.5)[:, None]
    z_vals = near * (1 - t) + far * t
    pts = rays_o[None, None] + rays_d[:, None, :] * z_vals[..., None]
    vertices = pts.reshape(-1, 3)

    scored = []
    for kf_id, kf in enumerate(keyframes):
        w2c = np.linalg.inv(kf["est_c2w"])
        uv, z, _ = _project(vertices, w2c, cam)
        edge = 20
        mask = (
            (uv[:, 0] < W - edge) & (uv[:, 0] > edge)
            & (uv[:, 1] < H - edge) & (uv[:, 1] > edge)
            & (z < 0)
        )
        scored.append((kf_id, mask.sum() / uv.shape[0]))

    scored.sort(key=lambda x: x[1], reverse=True)
    nonzero = [kf_id for kf_id, pct in scored if pct > 0.0]
    return list(rng.permutation(np.array(nonzero, dtype=np.int64))[:k])


def random_select(n: int, k: int, rng: Optional[np.random.Generator] = None) -> List[int]:
    """k distinct indices from range(n) (reference src/common.py:66-71)."""
    rng = rng or np.random.default_rng()
    return list(rng.permutation(np.arange(n))[: min(n, k)])


_FRUSTUM_JIT = None
_FRUSTUM_MULTI_JIT = None


def _frustum_mask_trace(c2w_d, depth_d, bound_d, K, Zs, Ys, Xs):
    """Traceable body shared by the single- and multi-level jits."""
    import jax.numpy as jnp
    xs = jnp.linspace(bound_d[0, 0], bound_d[0, 1], Xs)
    ys = jnp.linspace(bound_d[1, 0], bound_d[1, 1], Ys)
    zs = jnp.linspace(bound_d[2, 0], bound_d[2, 1], Zs)
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    points = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)

    w2c = jnp.linalg.inv(c2w_d.astype(jnp.float32))
    cam_cord = points @ w2c[:3, :3].T + w2c[:3, 3]
    cam_cord = cam_cord.at[:, 0].multiply(-1.0)
    uvz = cam_cord @ K.T
    z = uvz[:, 2] + 1e-5
    u = uvz[:, 0] / z
    v = uvz[:, 1] / z

    # cv2.remap(INTER_LINEAR, BORDER_CONSTANT=0): bilinear sample of the
    # depth image at (u, v); out-of-image corners contribute 0
    H, W = depth_d.shape
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx_ = u - x0
    fy_ = v - y0

    def corner(xi, yi):
        ok = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        return jnp.where(ok, depth_d[yi_c, xi_c], 0.0)

    d00 = corner(x0, y0)
    d10 = corner(x0 + 1, y0)
    d01 = corner(x0, y0 + 1)
    d11 = corner(x0 + 1, y0 + 1)
    depths = (
        d00 * (1 - fx_) * (1 - fy_) + d10 * fx_ * (1 - fy_)
        + d01 * (1 - fx_) * fy_ + d11 * fx_ * fy_
    )

    mask = (u < W) & (u > 0) & (v < H) & (v > 0)
    dmax = jnp.max(depths)
    depths = jnp.where(depths == 0, dmax, depths)
    mask &= (0 <= -z) & (-z <= depths + 0.5)

    dist2 = jnp.sum((points - c2w_d[:3, 3]) ** 2, axis=1)
    mask |= dist2 < 0.25
    return mask.reshape(Xs, Ys, Zs).transpose(2, 1, 0)


def _get_frustum_jit():
    global _FRUSTUM_JIT
    if _FRUSTUM_JIT is not None:
        return _FRUSTUM_JIT
    import functools

    import jax

    _FRUSTUM_JIT = functools.partial(jax.jit, static_argnums=(4, 5, 6))(
        _frustum_mask_trace
    )
    return _FRUSTUM_JIT


def _get_frustum_multi_jit():
    """All grid levels' frustum masks in ONE dispatch, already shaped
    ``[Z, Y, X, 1]`` float32 as the mapper consumes them — the per-level
    single-mask path costs 3 jit dispatches plus per-level eager
    ``[..., None].astype`` ops, each a multi-ms round trip on a
    remote-attached device."""
    global _FRUSTUM_MULTI_JIT
    if _FRUSTUM_MULTI_JIT is not None:
        return _FRUSTUM_MULTI_JIT
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("shapes",))
    def _multi(c2w_d, depth_d, bound_d, K, shapes):
        c2w_d = c2w_d.astype(jnp.float32)
        return tuple(
            _frustum_mask_trace(c2w_d, depth_d, bound_d, K, Z, Y, X)[..., None]
            .astype(jnp.float32)
            for (Z, Y, X) in shapes
        )

    _FRUSTUM_MULTI_JIT = _multi
    return _multi


def frustum_feature_masks_dev(c2w, grid_shapes, depth_dev, bound, cam: Camera):
    """Multi-level :func:`frustum_feature_mask_dev`: one jit dispatch for all
    ``grid_shapes`` (a list of (Z, Y, X)), returning a tuple of [Z, Y, X, 1]
    float32 masks. Host-side inputs stay numpy (no eager dispatches)."""
    shapes = tuple(tuple(int(s) for s in shp) for shp in grid_shapes)
    K = np.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]],
        np.float32,
    )
    return _get_frustum_multi_jit()(
        c2w, depth_dev, np.asarray(bound, np.float32), K, shapes
    )


def frustum_feature_mask_dev(c2w, grid_shape_zyx, depth_dev, bound, cam: Camera):
    """Device (jit) version of :func:`frustum_feature_mask`, taking the pose
    and depth as device arrays so the steady-state mapping path needs no
    host round trip (the numpy version forces a pose fetch that drains the
    dispatch queue at every mapping call). Float32 where the numpy one is
    float64 — boundary voxels may differ; the visibility semantics are
    identical (parity-tested in tests/test_slam.py)."""
    import jax.numpy as jnp

    Z, Y, X = (int(s) for s in grid_shape_zyx)
    K = jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    return _get_frustum_jit()(
        jnp.asarray(c2w, jnp.float32), depth_dev,
        jnp.asarray(bound, jnp.float32), K, Z, Y, X,
    )


def frustum_feature_mask(
    c2w: np.ndarray,
    grid_shape_zyx,
    depth_np: np.ndarray,
    bound: np.ndarray,
    cam: Camera,
) -> np.ndarray:
    """Boolean [Z, Y, X] mask of grid nodes visible in the current frustum
    (plus a 0.5 m ball around the camera), used to restrict which grid
    entries the mapper optimizes (reference get_mask_from_c2w,
    src/Mapper.py:115-186)."""
    Z, Y, X = grid_shape_zyx
    xs = np.linspace(bound[0][0], bound[0][1], X)
    ys = np.linspace(bound[1][0], bound[1][1], Y)
    zs = np.linspace(bound[2][0], bound[2][1], Z)
    # meshgrid in (x, y, z) order, then flatten; mask reshaped to [Z, Y, X]
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    points = np.stack([gx, gy, gz], -1).reshape(-1, 3)

    w2c = np.linalg.inv(c2w)
    uv, z, _ = _project(points, w2c, cam)
    uv32 = uv.astype(np.float32)

    H, W = cam.H, cam.W
    remap_chunk = int(3e4)
    depths = []
    for i in range(0, uv32.shape[0], remap_chunk):
        # maps must be column vectors: cv2 interprets a 1-D array as one ROW,
        # which would silently sample a single pixel per chunk
        mx = uv32[i : i + remap_chunk, 0].reshape(-1, 1)
        my = uv32[i : i + remap_chunk, 1].reshape(-1, 1)
        depths.append(
            cv2.remap(depth_np, mx, my, interpolation=cv2.INTER_LINEAR)[:, 0]
        )
    depths = np.concatenate(depths)

    mask = (uv[:, 0] < W) & (uv[:, 0] > 0) & (uv[:, 1] < H) & (uv[:, 1] > 0)
    zero = depths == 0
    if np.any(~zero):
        depths[zero] = np.max(depths)
    mask &= (0 <= -z) & (-z <= depths + 0.5)

    # keep grid features near the camera center regardless of visibility
    dist2 = np.sum((points - c2w[:3, 3]) ** 2, axis=1)
    mask |= dist2 < 0.25

    # flatten order was (x, y, z); grid storage is [Z, Y, X]
    return mask.reshape(X, Y, Z).transpose(2, 1, 0)
