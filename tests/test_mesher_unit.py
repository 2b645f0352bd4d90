"""End-to-end Mesher.get_mesh on an analytic occupancy field.

The extraction path (device sweep -> marching -> seen-clean -> component
filter -> color -> export) had NO unit coverage; the round-3 fragmentation
bug (non-conforming marching producing thousands of hairline-cracked
components that the small-geometry filter deleted) lived exactly in the
interaction between these stages. This test mocks only eval_points — the
occupancy of a sphere — and drives the real Mesher through the full
pipeline with synthetic keyframes, asserting the cleaned mesh is one large
component that retains the sphere's area.
"""

import numpy as np
import pytest

import evennicer_slam_tpu.mesh.mesher as mesher_mod
from evennicer_slam_tpu.mesh.mesher import Mesher
from evennicer_slam_tpu.slam.camera import Camera

R_SPHERE = 0.5


def _sphere_eval_points(decoders, grids, p, bound, stage, settings):
    """occ logit = (R - |p|) * 10; rgb = constant. Shape [N, 4]."""
    import jax.numpy as jnp

    occ = (R_SPHERE - jnp.linalg.norm(p, axis=-1)) * 10.0
    rgb = jnp.full((p.shape[0], 3), 0.5, jnp.float32)
    return jnp.concatenate([rgb, occ[:, None]], axis=-1)


def _look_at_keyframe(origin, cam):
    """c2w looking from `origin` at the world origin (OpenGL-style -z
    forward, matching the repo convention), plus the analytic depth map of
    the R_SPHERE sphere from that pose."""
    origin = np.asarray(origin, np.float64)
    fwd = -origin / np.linalg.norm(origin)  # toward the sphere center
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -fwd  # camera -z looks forward
    c2w[:3, 3] = origin

    jj, ii = np.meshgrid(np.arange(cam.H), np.arange(cam.W), indexing="ij")
    dirs = np.stack(
        [
            (ii - cam.cx) / cam.fx,
            -(jj - cam.cy) / cam.fy,
            -np.ones_like(ii, np.float64),
        ],
        -1,
    )
    rd = dirs @ c2w[:3, :3].T
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    # ray-sphere: |o + t d| = R
    o = origin[None, None]
    b = (rd * o).sum(-1)
    c = (o * o).sum(-1) - R_SPHERE**2
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    depth = np.where((disc > 0) & (t > 0), t, 0.0).astype(np.float32)
    return c2w, depth


@pytest.fixture()
def mesher(monkeypatch):
    monkeypatch.setattr(mesher_mod, "eval_points", _sphere_eval_points)
    cfg = {
        "scale": 1.0,
        "verbose": False,
        "meshing": {
            "resolution": 64,
            "level_set": 0,
            "clean_mesh_bound_scale": 1.02,
            "remove_small_geometry_threshold": 0.2,
            "color_mesh_extraction_method": "direct_point_query",
            "get_largest_components": False,
            "depth_test": False,
            "clean_mesh": True,
        },
        "mapping": {"marching_cubes_bound": [[-1, 1], [-1, 1], [-1, 1]]},
    }
    cam = Camera(H=60, W=80, fx=60.0, fy=60.0, cx=39.5, cy=29.5)
    bound = np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32)
    m = Mesher(cfg, cam, settings=None, bound=bound, points_batch_size=65536)
    return m


def test_get_mesh_full_pipeline(mesher, tmp_path):
    # keyframes orbiting the sphere: enough frusta that the whole surface
    # is seen, so the cleaner must keep (almost) everything
    kfs = []
    for ang in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        origin = [1.6 * np.cos(ang), 1.6 * np.sin(ang), 0.35]
        c2w, depth = _look_at_keyframe(origin, mesher.cam)
        kfs.append({"est_c2w": c2w, "depth": depth})
    est = np.stack([k["est_c2w"] for k in kfs])

    out = str(tmp_path / "m.ply")
    mesh = mesher.get_mesh(out, grids={}, decoders={}, keyframe_dict=kfs,
                           estimate_c2w_list=est, idx=len(kfs) - 1)
    assert mesh is not None and len(mesh.faces) > 100

    # The mesh contains the sphere plus the hull-boundary shell (out-of-hull
    # occupancy is +100 — reference "solid walls" semantics — so the air/
    # hull-exterior transition also extracts). The regression being pinned:
    # the SPHERE must survive the component filter as ONE component of the
    # right area — a cracked extraction shreds it into sub-0.2 m^2 pieces
    # and the filter deletes it entirely.
    labels, ncomp = mesh.face_components()
    areas = np.bincount(labels, weights=mesh.face_areas, minlength=ncomp)
    cent = mesh.vertices[mesh.faces].mean(axis=1)
    on_sphere = np.abs(np.linalg.norm(cent, axis=1) - R_SPHERE) < 0.08
    true_area = 4 * np.pi * R_SPHERE**2
    sphere_comps = np.unique(labels[on_sphere])
    comp_areas = areas[sphere_comps]
    assert comp_areas.max() > 0.88 * true_area, (
        f"sphere fragmented: largest sphere component "
        f"{comp_areas.max():.3f} of {true_area:.3f} m^2"
    )
    # and the sphere faces themselves cover the full sphere area
    sph_area = mesh.face_areas[on_sphere].sum()
    assert abs(sph_area - true_area) / true_area < 0.12
    # colors queried through the mocked field
    assert mesh.vertex_colors is not None
    assert np.all(np.abs(mesh.vertex_colors.astype(int) - 127) <= 1)

    # exported artifact exists and reloads
    from evennicer_slam_tpu.mesh.trimesh_lite import Mesh

    re = Mesh.load(out)
    assert len(re.faces) == len(mesh.faces)


def test_get_mesh_seen_clean_removes_unobserved(mesher, tmp_path):
    """With keyframes on one side only, the far hemisphere must be cleaned
    away (reference point_masks semantics) while the near one survives."""
    kfs = []
    for ang in (-0.3, 0.0, 0.3):
        origin = [1.6 * np.cos(ang), 1.6 * np.sin(ang), 0.0]
        c2w, depth = _look_at_keyframe(origin, mesher.cam)
        kfs.append({"est_c2w": c2w, "depth": depth})
    est = np.stack([k["est_c2w"] for k in kfs])
    mesh = mesher.get_mesh(str(tmp_path / "m.ply"), {}, {}, kfs, est, 2)
    assert mesh is not None and len(mesh.vertices) > 0
    # vertices on the observed (+x) side survive; the -x pole is culled
    assert mesh.vertices[:, 0].max() > 0.4
    assert (mesh.vertices[:, 0] < -0.45).sum() == 0
