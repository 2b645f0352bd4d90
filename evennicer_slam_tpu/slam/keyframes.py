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
        # device stacks for the grown-registry async fast path
        self._img_stack = None
        self._img_stack_len = 0
        self._poses_dev = None
        self.host_poses_stale = False
        # optional target placement for uploads/stacks: the concurrent
        # pipeline sets this to the MAP device group's replicated sharding so
        # every registry array is committed there (mixing committed groups
        # inside one jit is an error)
        self.sharding = None

    def __len__(self):
        return len(self.frames)

    @property
    def indices(self) -> List[int]:
        return [f["idx"] for f in self.frames]

    def _put(self, x):
        import jax
        import jax.numpy as jnp

        if self.sharding is not None:
            return jax.device_put(np.asarray(x), self.sharding)
        return jnp.asarray(np.asarray(x))

    def _ensure_poses_dev(self, n: int):
        """Make the device pose stack cover the first ``n`` frames, uploading
        host rows for any it does not hold yet (existing device rows are the
        truth — host copies may be stale under device-side BA)."""
        import jax.numpy as jnp

        if n <= 0:
            return
        old = 0 if self._poses_dev is None else int(self._poses_dev.shape[0])
        if old >= n:
            return
        host = np.stack(
            [f["est_c2w"] for f in self.frames[old:n]]
        ).astype(np.float32)
        rows = self._put(host)
        self._poses_dev = (
            rows if self._poses_dev is None
            else jnp.concatenate([self._poses_dev, rows], axis=0)
        )

    def append(self, idx: int, color, depth, event, est_c2w, gt_c2w,
               device_images=None):
        import jax.numpy as jnp

        est_is_dev = isinstance(est_c2w, jnp.ndarray)
        rec = {
            "idx": idx,
            "color": np.asarray(color),
            "depth": np.asarray(depth),
            "event": np.asarray(event),
            # device est pose: host copy deferred (below) — np.asarray here
            # would block the host on the mapping program that produced it
            "est_c2w": (np.eye(4, dtype=np.float32) if est_is_dev
                        else np.asarray(est_c2w).copy()),
            "gt_c2w": np.asarray(gt_c2w).copy(),
        }
        if est_is_dev:
            # concat the device pose row directly onto the pose stack (async
            # device op, no fetch); host est_c2w refreshes lazily via
            # sync_host_poses
            self._ensure_poses_dev(len(self.frames))
            row = est_c2w.astype(jnp.float32).reshape(1, 4, 4)
            if self.sharding is not None:
                import jax

                row = jax.device_put(row, self.sharding)
            self._poses_dev = (
                row if self._poses_dev is None
                else jnp.concatenate([self._poses_dev, row], axis=0)
            )
            self.host_poses_stale = True
        self.frames.append(rec)
        if device_images is not None:
            # the frame is already on device (pipeline upload) — seed the
            # cache instead of re-shipping ~10 MB on the next mapping call
            self._device_cache[len(self.frames) - 1] = tuple(device_images)

    def set_pose(self, kf_index: int, est_c2w: np.ndarray):
        # host-side (non-fast-path) BA write-back. Mixing it with pending
        # device-side updates would silently resurrect stale host rows.
        assert not self.host_poses_stale, (
            "sync_host_poses() before host-side pose writes"
        )
        self.frames[kf_index]["est_c2w"] = np.asarray(est_c2w).copy()
        self._poses_dev = None  # rebuild from (fresh) host rows on next use

    def device_images(self, kf_index: int):
        """(color, depth) as device arrays. Frames already folded into the
        stack are returned as device-side SLICES of it (no duplicate HBM
        copy); newer frames come from the per-frame upload cache."""
        if self._img_stack is not None and kf_index < self._img_stack_len:
            return self._img_stack[0][kf_index], self._img_stack[1][kf_index]
        if kf_index not in self._device_cache:
            f = self.frames[kf_index]
            self._device_cache[kf_index] = (
                self._put(f["color"]), self._put(f["depth"])
            )
        return self._device_cache[kf_index]

    def device_stack(self):
        """(colors [N,H,W,3], depths [N,H,W], poses [N,4,4]) device stacks
        for the grown-registry async fast path (device-side window selection
        + assembly + BA write-back; no host pose fetch per mapping call).

        Image stacks GROW INCREMENTALLY: each append concatenates only the
        new frame's (cached, already-on-device) images onto the stack, and
        the per-frame cache entry is dropped once folded in — the stack is
        the single HBM copy (``device_images`` serves folded frames as
        slices of it). The POSE stack is the source of truth while
        device-side BA is active: rows updated on device are carried over on
        append, and host ``est_c2w`` copies are refreshed lazily by
        :meth:`sync_host_poses`.
        """
        import jax.numpy as jnp

        n = len(self.frames)
        if self._img_stack_len != n:
            new = [self.device_images(i) for i in range(self._img_stack_len, n)]
            cols = [c[None] for c, _ in new]
            deps = [d[None] for _, d in new]
            if self._img_stack is not None:
                cols.insert(0, self._img_stack[0])
                deps.insert(0, self._img_stack[1])
            self._img_stack = (
                jnp.concatenate(cols, axis=0), jnp.concatenate(deps, axis=0)
            )
            self._img_stack_len = n
            # folded frames now live in the stack only
            for i in list(self._device_cache):
                if i < n:
                    del self._device_cache[i]
        self._ensure_poses_dev(n)
        return self._img_stack[0], self._img_stack[1], self._poses_dev

    def set_poses_device(self, poses_dev):
        """Replace the device pose stack (device-side BA write-back); host
        ``est_c2w`` rows become stale until :meth:`sync_host_poses`."""
        self._poses_dev = poses_dev
        self.host_poses_stale = True

    def sync_host_poses(self):
        """Refresh host ``est_c2w`` rows from the device pose stack (one
        batched fetch). Call before any host consumer of keyframe poses
        (meshing, checkpointing, host-side selection/assembly)."""
        if not self.host_poses_stale:
            return
        mats = np.asarray(self._poses_dev)
        # frames appended AFTER the last device write-back are not in the
        # stack yet — their host est_c2w is already the truth
        for i in range(min(len(self.frames), mats.shape[0])):
            self.frames[i]["est_c2w"] = mats[i].copy()
        self.host_poses_stale = False


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


# ---------------------------------------------------------------------------
# device-side window selection / assembly / BA write-back
# (grown-registry async fast path)
# ---------------------------------------------------------------------------

_SELECT_ASSEMBLE_JIT = None
_SCATTER_POSES_JIT = None


def _select_assemble_trace(key, kf_colors, kf_depths, kf_poses, cur_color,
                           cur_depth, cur_c2w, k_sel, cam: Camera):
    """Overlap scoring + random-among-nonzero selection + window assembly as
    ONE device program — the reference scorer's exact math
    (src/Mapper.py:188-250 / keyframe_selection_overlap above) without the
    per-mapping-call host pose fetch that empties the device queue.

    Window layout: [selected (k_sel)..., last keyframe, current frame];
    K = k_sel + 2. Returns (colors [K,...], depths [K,...],
    fixed_c2w [K,4,4], cams [K,7], window_idx [K-1] store indices,
    opt_mask [K] — 0 at the oldest keyframe, the reference's BA gauge anchor,
    src/Mapper.py:296-300).

    One fixed-shape deviation: the reference selects only among
    NONZERO-overlap candidates and shrinks the window when fewer than k
    qualify; here the window stays K-wide and zero-overlap candidates fill
    the remainder (uniformly at random) in that rare case.
    """
    import jax
    import jax.numpy as jnp

    from evennicer_slam_tpu.core.quaternion import tensor_from_pose_matrix

    N = kf_poses.shape[0]
    H, W = cam.H, cam.W
    k_pix, k_pri = jax.random.split(key)

    # current-frame depth-guided sample points (reference: 100 px x 16)
    idx = jax.random.randint(k_pix, (100,), 0, H * W)
    jj = idx // W
    ii = idx % W
    d = cur_depth[jj, ii]
    jf = jj.astype(jnp.float32)
    if_ = ii.astype(jnp.float32)
    dirs = jnp.stack(
        [(if_ - cam.cx) / cam.fx, -(jf - cam.cy) / cam.fy,
         -jnp.ones_like(if_)], axis=-1,
    )
    rays_d = dirs @ cur_c2w[:3, :3].T
    rays_o = cur_c2w[:3, 3]
    t = jnp.linspace(0.0, 1.0, 16)
    z = (d * 0.8)[:, None] * (1.0 - t) + (d + 0.5)[:, None] * t
    verts = (rays_o + rays_d[:, None, :] * z[..., None]).reshape(-1, 3)

    # project into every candidate keyframe (all but the always-included
    # last); x-negation camera convention as in _project above
    w2c = jnp.linalg.inv(kf_poses.astype(jnp.float32))
    camc = (
        jnp.einsum("nij,pj->npi", w2c[:, :3, :3], verts)
        + w2c[:, :3, 3][:, None, :]
    )
    zs = camc[..., 2] + 1e-5
    u = (cam.fx * (-camc[..., 0]) + cam.cx * zs) / zs
    v = (cam.fy * camc[..., 1] + cam.cy * zs) / zs
    edge = 20
    inside = (
        (u < W - edge) & (u > edge) & (v < H - edge) & (v > edge) & (zs < 0)
    )
    score = jnp.mean(inside.astype(jnp.float32), axis=-1)  # [N]

    # random permutation among nonzero-overlap candidates, take k_sel
    pri = jax.random.uniform(k_pri, (N - 1,))
    pri = pri + jnp.where(score[: N - 1] > 0.0, 10.0, 0.0)
    _, sel = jax.lax.top_k(pri, k_sel)
    window_idx = jnp.concatenate(
        [sel.astype(jnp.int32), jnp.array([N - 1], jnp.int32)]
    )
    colors = jnp.concatenate([kf_colors[window_idx], cur_color[None]], axis=0)
    depths = jnp.concatenate([kf_depths[window_idx], cur_depth[None]], axis=0)
    fixed = jnp.concatenate(
        [kf_poses[window_idx], cur_c2w[None]], axis=0
    ).astype(jnp.float32)
    cams = jax.vmap(lambda m: tensor_from_pose_matrix(m[:3]))(fixed)
    oldest_pos = jnp.argmin(window_idx)
    opt_mask = jnp.ones((k_sel + 2,), jnp.float32).at[oldest_pos].set(0.0)
    return colors, depths, fixed, cams, window_idx, opt_mask


def select_assemble_window_dev(key, kf_colors, kf_depths, kf_poses,
                               cur_color, cur_depth, cur_c2w, k_sel: int,
                               cam: Camera):
    global _SELECT_ASSEMBLE_JIT
    import jax

    if _SELECT_ASSEMBLE_JIT is None:
        _SELECT_ASSEMBLE_JIT = jax.jit(
            _select_assemble_trace, static_argnames=("k_sel", "cam")
        )
    return _SELECT_ASSEMBLE_JIT(
        key, kf_colors, kf_depths, kf_poses, cur_color, cur_depth, cur_c2w,
        k_sel=k_sel, cam=cam,
    )


def _scatter_poses_trace(kf_poses, window_idx, new_cams, fixed_c2w, opt_mask):
    """Device-side BA write-back: optimized window poses -> the registry's
    device pose stack; the anchored (opt_mask == 0) slot keeps its original
    pose; returns (new pose stack, new current-frame pose [4,4])."""
    import jax
    import jax.numpy as jnp

    from evennicer_slam_tpu.core.quaternion import pose_matrix_from_tensor

    m34 = jax.vmap(pose_matrix_from_tensor)(new_cams)  # [K, 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        (m34.shape[0], 1, 4),
    )
    m44 = jnp.concatenate([m34, bottom], axis=1)
    upd = jnp.where(opt_mask[:, None, None] > 0.0, m44, fixed_c2w)
    kf_poses = kf_poses.at[window_idx].set(upd[:-1])
    return kf_poses, upd[-1]


def scatter_window_poses_dev(kf_poses, window_idx, new_cams, fixed_c2w,
                             opt_mask):
    global _SCATTER_POSES_JIT
    import jax

    if _SCATTER_POSES_JIT is None:
        _SCATTER_POSES_JIT = jax.jit(_scatter_poses_trace)
    return _SCATTER_POSES_JIT(
        kf_poses, window_idx, new_cams, fixed_c2w, opt_mask
    )
