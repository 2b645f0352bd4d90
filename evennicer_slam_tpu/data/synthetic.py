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
    # monotonic per-channel ramps make every wall position locally UNIQUE at
    # low frequency: periodic texture alone lets the pose slide along a wall
    # once the map's color render is still blurry (high-frequency content
    # washes out; measured 2.5 cm/frame gauge drift in ceiling-corner views),
    # while a ramp survives any blur. Channel directions differ per face so
    # u and v are separately observable in color.
    ramp = np.stack(
        [0.22 * (u - 0.5), 0.22 * (v - 0.5), 0.11 * (v - u)], axis=1
    )
    if face % 2 == 1:  # vary sign across opposite faces
        ramp = -ramp
    c = c + np.roll(ramp, face // 2, axis=1)
    return np.clip(c, 0.0, 1.0)


def scene_primitives(bound: np.ndarray):
    """Interior furniture for the "furnished" scene variant: boxes and
    spheres placed in room-relative coordinates (so any bound works) —
    occluders at different heights, giving the validation scene clutter,
    occlusion, and non-planar geometry (VERDICT r2 item 4)."""
    lo = bound[:, 0].astype(np.float64)
    e = (bound[:, 1] - bound[:, 0]).astype(np.float64)

    def rel(p):
        return lo + np.asarray(p, np.float64) * e

    rmin = float(e.min())
    return [
        # table-like block mid-room
        {"type": "box", "lo": rel([0.55, 0.30, 0.0]), "hi": rel([0.75, 0.50, 0.18]),
         "color": np.array([0.78, 0.55, 0.30]), "pat": 7.0},
        # tall cabinet against the -x wall (strong occluder)
        {"type": "box", "lo": rel([0.05, 0.62, 0.0]), "hi": rel([0.18, 0.85, 0.55]),
         "color": np.array([0.35, 0.45, 0.80]), "pat": 9.0},
        # low sofa block along the -y wall
        {"type": "box", "lo": rel([0.30, 0.05, 0.0]), "hi": rel([0.52, 0.20, 0.28]),
         "color": np.array([0.70, 0.30, 0.55]), "pat": 5.0},
        # ball on the floor
        {"type": "sphere", "c": rel([0.35, 0.70, 0.10]), "r": 0.075 * rmin,
         "color": np.array([0.90, 0.62, 0.20]), "pat": 11.0},
        # floating lamp (mid-air occluder)
        {"type": "sphere", "c": rel([0.50, 0.50, 0.75]), "r": 0.06 * rmin,
         "color": np.array([0.30, 0.85, 0.75]), "pat": 13.0},
        # --- surface relief: every wall/ceiling/floor fronto view must
        # contain a depth discontinuity, or in-plane translation is
        # unconstrained by depth and the const-speed motion model integrates
        # open-loop through the stretch (measured: 2 cm/frame slide through
        # a 40-frame ceiling-only window). Real rooms have relief everywhere;
        # picture frames / shelves / beams give the synthetic scene the same
        # property.
        # pictures on the -y and +y walls
        {"type": "box", "lo": rel([0.15, 0.0, 0.45]), "hi": rel([0.35, 0.03, 0.75]),
         "color": np.array([0.85, 0.75, 0.40]), "pat": 15.0},
        {"type": "box", "lo": rel([0.60, 0.0, 0.35]), "hi": rel([0.85, 0.025, 0.70]),
         "color": np.array([0.45, 0.70, 0.45]), "pat": 17.0},
        {"type": "box", "lo": rel([0.20, 0.97, 0.40]), "hi": rel([0.45, 1.0, 0.72]),
         "color": np.array([0.60, 0.50, 0.85]), "pat": 19.0},
        {"type": "box", "lo": rel([0.65, 0.975, 0.30]), "hi": rel([0.90, 1.0, 0.62]),
         "color": np.array([0.80, 0.45, 0.35]), "pat": 21.0},
        # pictures/shelves on the -x and +x walls
        {"type": "box", "lo": rel([0.0, 0.25, 0.50]), "hi": rel([0.03, 0.50, 0.80]),
         "color": np.array([0.40, 0.80, 0.70]), "pat": 23.0},
        {"type": "box", "lo": rel([0.97, 0.30, 0.35]), "hi": rel([1.0, 0.55, 0.75]),
         "color": np.array([0.75, 0.65, 0.30]), "pat": 25.0},
        {"type": "box", "lo": rel([0.965, 0.70, 0.30]), "hi": rel([1.0, 0.90, 0.60]),
         "color": np.array([0.50, 0.40, 0.75]), "pat": 27.0},
        # ceiling beam (full y span) + hanging lamp box
        {"type": "box", "lo": rel([0.45, 0.0, 0.93]), "hi": rel([0.55, 1.0, 1.0]),
         "color": np.array([0.70, 0.55, 0.40]), "pat": 29.0},
        {"type": "box", "lo": rel([0.72, 0.65, 0.82]), "hi": rel([0.78, 0.72, 1.0]),
         "color": np.array([0.85, 0.85, 0.55]), "pat": 31.0},
        # floor ottoman (thick rug)
        {"type": "box", "lo": rel([0.25, 0.45, 0.0]), "hi": rel([0.60, 0.75, 0.08]),
         "color": np.array([0.55, 0.30, 0.30]), "pat": 33.0},
    ]


_LIGHT = np.array([0.40824829, 0.40824829, 0.81649658])  # fixed scene light


def _prim_color(prim, hit: np.ndarray, normal: np.ndarray) -> np.ndarray:
    """Procedural texture + Lambert shading for a primitive hit batch."""
    p = prim["pat"]
    tex = (
        0.72
        + 0.18 * np.sin(p * hit[:, 0]) * np.cos(p * hit[:, 1])
        + 0.10 * np.sin(p * 1.7 * hit[:, 2])
    )
    lam = 0.55 + 0.45 * np.clip(normal @ _LIGHT, 0.0, 1.0)
    return np.clip(prim["color"][None, :] * (tex * lam)[:, None], 0.0, 1.0)


def render_box_views(
    c2w: np.ndarray,
    H: int,
    W: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bound: np.ndarray,
    prims=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Analytic render of the room interior (plus optional interior
    primitives) from one pose, with correct nearest-hit occlusion.

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
    t_exit = np.min(np.max(t, axis=1), axis=1)  # room-wall exit per ray
    N = flat_o.shape[0]
    t_best = t_exit.copy()
    hit_prim = np.full(N, -1, np.int32)

    for pi, prim in enumerate(prims or ()):
        with np.errstate(divide="ignore", invalid="ignore"):
            if prim["type"] == "box":
                t0 = (prim["lo"][None] - flat_o) / flat_d
                t1 = (prim["hi"][None] - flat_o) / flat_d
                tn = np.nanmax(np.minimum(t0, t1), axis=1)
                tf = np.nanmin(np.maximum(t0, t1), axis=1)
                tp = np.where((tf > tn) & (tn > 1e-4), tn, np.inf)
            else:  # sphere
                oc = flat_o - prim["c"][None]
                b = np.sum(oc * flat_d, axis=1)
                a = np.sum(flat_d * flat_d, axis=1)
                c = np.sum(oc * oc, axis=1) - prim["r"] ** 2
                disc = b * b - a * c
                sq = np.sqrt(np.maximum(disc, 0.0))
                tp = np.where(disc > 0, (-b - sq) / a, np.inf)
                tp = np.where(tp > 1e-4, tp, np.inf)
        closer = tp < t_best
        t_best = np.where(closer, tp, t_best)
        hit_prim = np.where(closer, pi, hit_prim)

    hit = flat_o + t_best[:, None] * flat_d
    # pixel dirs have z_cam = -1, so the ray parameter t IS the z-depth —
    # exactly the quantity stored in Replica depth PNGs and consumed by the
    # renderer's depth-guided sampling.
    depth = t_best

    colors = np.zeros((N, 3), np.float32)
    # wall texture for rays that exit on the room box
    eps = 1e-4
    assigned = hit_prim >= 0
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

    for pi, prim in enumerate(prims or ()):
        m = hit_prim == pi
        if not np.any(m):
            continue
        ph = hit[m]
        if prim["type"] == "box":
            # face normal = axis of the slab the hit lies on
            dlo = np.abs(ph - prim["lo"][None])
            dhi = np.abs(ph - prim["hi"][None])
            d6 = np.concatenate([dlo, dhi], axis=1)
            k = np.argmin(d6, axis=1)
            normal = np.zeros_like(ph)
            normal[np.arange(len(ph)), k % 3] = np.where(k < 3, -1.0, 1.0)
        else:
            normal = ph - prim["c"][None]
            normal /= np.linalg.norm(normal, axis=1, keepdims=True)
        colors[m] = _prim_color(prim, ph, normal)

    return colors.reshape(H, W, 3), depth.reshape(H, W).astype(np.float32)


def scene_gt_mesh(bound: np.ndarray, furnished: bool = False):
    """Analytic ground-truth mesh of the synthetic scene (room interior +
    furniture when ``furnished``) for the recon eval tools."""
    from evennicer_slam_tpu.mesh.trimesh_lite import Mesh, concatenate

    def box_mesh(lo, hi):
        (x0, y0, z0), (x1, y1, z1) = lo, hi
        v = np.array([
            [x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
            [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1],
        ])
        quads = [
            (0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
            (2, 3, 7, 6), (0, 3, 7, 4), (1, 2, 6, 5),
        ]
        faces = []
        for a, b, c, d in quads:
            faces += [[a, b, c], [a, c, d]]
        return Mesh(v, np.array(faces))

    def sphere_mesh(c, r, n_lat=16, n_lon=24):
        th = np.linspace(0, np.pi, n_lat)
        ph = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
        T, P = np.meshgrid(th, ph, indexing="ij")
        v = np.stack([
            c[0] + r * np.sin(T) * np.cos(P),
            c[1] + r * np.sin(T) * np.sin(P),
            c[2] + r * np.cos(T),
        ], axis=-1).reshape(-1, 3)
        faces = []
        for a in range(n_lat - 1):
            for b in range(n_lon):
                b2 = (b + 1) % n_lon
                i00, i01 = a * n_lon + b, a * n_lon + b2
                i10, i11 = (a + 1) * n_lon + b, (a + 1) * n_lon + b2
                faces += [[i00, i10, i11], [i00, i11, i01]]
        return Mesh(v, np.array(faces))

    meshes = [box_mesh(bound[:, 0], bound[:, 1])]
    if furnished:
        for prim in scene_primitives(bound):
            if prim["type"] == "box":
                meshes.append(box_mesh(prim["lo"], prim["hi"]))
            else:
                meshes.append(sphere_mesh(prim["c"], prim["r"]))
    return concatenate(meshes)


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
    gaze_mult: float = 1.0,
    pitch_base: float = -0.7,
    pitch_amp: float = 0.25,
    pitch_freq: float = 3.0,
) -> np.ndarray:
    """Smooth camera path inside the room: the eye orbits the center while the
    gaze pans along the walls (so views hit corners — varied depth gives
    tracking a full 6-DoF signal). ``step`` is the per-frame angle increment
    (radians); default sweeps a quarter turn over the sequence.

    ``gaze_mult``/``pitch_*`` shape surface COVERAGE: the gaze pans at
    ``gaze_mult`` x the eye's angular speed and the gaze target's height
    swings ``pitch_base ± pitch_amp`` — the coverage trajectory
    (validate_synthetic) uses a fast pan + tall pitch sweep to observe
    floor, ceiling, and all four walls.
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
        gaze = th * gaze_mult + 0.6  # pan ahead of the eye position
        # pitch the gaze down toward the floor corner so depth varies along
        # the image v-axis too (full 6-DoF observability)
        target = center + np.array(
            [2.0 * np.cos(gaze), 2.0 * np.sin(gaze),
             pitch_base + pitch_amp * np.sin(pitch_freq * th)]
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
    traj_seed: int = 7,
    furnished: bool = False,
    traj_kwargs: Optional[Dict] = None,
    reuse_if_current: bool = False,
) -> Dict:
    """Write a Replica-format dataset (+ event folder) and return a config
    fragment describing it. Layout matches reference expectations:
    ``results/frame*.png``, ``results/depth*.png`` (16-bit, x6553.5),
    ``traj.txt`` (pre-flip poses), ``events/*frame*.png`` ([pos, neg, 0] BGR).

    With ``reuse_if_current`` an existing directory is kept when it matches
    the requested parameters (frame count, trajectory, and frame-0/1
    render comparisons incl. the event encoding, detecting scene-content
    code or ``event_gain`` changes) — full-resolution generation is minutes
    of host ray tracing per hundred frames.
    """
    if bound is None:
        bound = np.array([[-1.2, 1.2], [-1.0, 1.0], [-0.8, 0.8]], np.float32)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    res = os.path.join(out_dir, "results")
    ev_dir = os.path.join(out_dir, "events")
    os.makedirs(res, exist_ok=True)
    os.makedirs(ev_dir, exist_ok=True)

    if reuse_if_current:
        frag = _reuse_scene_if_current(
            out_dir, res, ev_dir, n_frames, H, W, fx, fy, cx, cy, bound,
            traj_step, traj_jitter, traj_seed, furnished, traj_kwargs,
            event_gain,
        )
        if frag is not None:
            return frag
    # remove stale frames from a previous generation with a different length
    import glob as _glob

    for stale in _glob.glob(os.path.join(res, "*.png")) + _glob.glob(
        os.path.join(ev_dir, "*.png")
    ):
        os.remove(stale)

    center = bound.mean(axis=1)
    poses = circular_trajectory(n_frames, center, step=traj_step,
                                jitter=traj_jitter, jitter_seed=traj_seed,
                                **(traj_kwargs or {}))
    prims = scene_primitives(bound) if furnished else None

    traj_lines = []
    prev_intensity = None
    for k in range(n_frames):
        color, depth = render_box_views(poses[k], H, W, fx, fy, cx, cy, bound,
                                        prims=prims)
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

    return _scene_frag(out_dir, ev_dir, H, W, fx, fy, cx, cy, bound)


def _reuse_scene_if_current(
    out_dir, res, ev_dir, n_frames, H, W, fx, fy, cx, cy, bound,
    traj_step, traj_jitter, traj_seed, furnished, traj_kwargs, event_gain,
) -> Optional[Dict]:
    """Return the config fragment for an on-disk scene iff it matches the
    requested parameters; None forces regeneration. Matching is checked
    against the artifacts themselves: frame/depth/event counts, the stored
    trajectory vs a freshly computed one, and re-renders of frames 0/1
    compared pixel-exactly against the stored color/depth/event images — so
    any change to the scene-content code (textures, primitives, shading) or
    to ``event_gain`` invalidates the cache."""
    traj_path = os.path.join(out_dir, "traj.txt")
    if not os.path.exists(traj_path):
        return None
    n_have = len(
        [f for f in os.listdir(res) if f.startswith("frame")]
    ) if os.path.isdir(res) else 0
    n_ev = len(os.listdir(ev_dir)) if os.path.isdir(ev_dir) else 0
    if n_have != n_frames or n_ev != n_frames - 1:
        return None
    try:
        traj = np.loadtxt(traj_path).reshape(-1, 4, 4)
    except ValueError:
        return None
    if len(traj) != n_frames:
        return None
    center = bound.mean(axis=1)
    poses = circular_trajectory(n_frames, center, step=traj_step,
                                jitter=traj_jitter, jitter_seed=traj_seed,
                                **(traj_kwargs or {}))
    raw0 = poses.copy()
    raw0[:, :3, 1] *= -1
    raw0[:, :3, 2] *= -1
    # traj.txt rounds to 9 decimals
    if not np.allclose(traj, raw0, atol=2e-9):
        return None
    prims = scene_primitives(bound) if furnished else None
    color, depth = render_box_views(poses[0], H, W, fx, fy, cx, cy, bound,
                                    prims=prims)
    disk_c = cv2.imread(os.path.join(res, "frame000000.png"))
    disk_d = cv2.imread(os.path.join(res, "depth000000.png"), cv2.IMREAD_UNCHANGED)
    if disk_c is None or disk_d is None or disk_c.shape[:2] != (H, W):
        return None
    disk_c = cv2.cvtColor(disk_c, cv2.COLOR_BGR2RGB)
    if not np.array_equal(disk_c, (color * 255).astype(np.uint8)):
        return None
    want_d = np.clip(depth * PNG_DEPTH_SCALE, 0, 65535).astype(np.uint16)
    if not np.array_equal(disk_d, want_d):
        return None
    if n_frames > 1:
        # one more render pins the event encoding (incl. event_gain)
        color1, _ = render_box_views(poses[1], H, W, fx, fy, cx, cy, bound,
                                     prims=prims)
        diff = (color1.mean(axis=-1) - color.mean(axis=-1)) * event_gain
        want_ev = np.stack(
            [np.clip(diff, 0, 255), np.clip(-diff, 0, 255),
             np.zeros_like(diff)], axis=-1,
        ).astype(np.uint8)
        disk_ev = cv2.imread(os.path.join(ev_dir, "frame000000.png"))
        if disk_ev is None or not np.array_equal(disk_ev, want_ev):
            return None
    return _scene_frag(out_dir, ev_dir, H, W, fx, fy, cx, cy, bound)


def _scene_frag(out_dir, ev_dir, H, W, fx, fy, cx, cy, bound) -> Dict:
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
