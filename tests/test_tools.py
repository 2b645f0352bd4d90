"""Offline tool tests: ATE alignment, reconstruction metrics, mesh culling."""

import numpy as np

from evennicer_slam_tpu.mesh.marching import marching_cubes
from evennicer_slam_tpu.mesh.trimesh_lite import Mesh
from evennicer_slam_tpu.slam.camera import Camera
from evennicer_slam_tpu.tools.cull_mesh import cull_mesh
from evennicer_slam_tpu.tools.eval_ate import align, evaluate_ate
from evennicer_slam_tpu.tools.eval_recon import (
    calc_3d_metric,
    icp_align,
    splat_depth,
)


def sphere_mesh(r=0.5, n=40, center=(0, 0, 0)):
    lin = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = r - np.sqrt(X**2 + Y**2 + Z**2)
    sp = lin[1] - lin[0]
    v, f = marching_cubes(vol, spacing=(sp, sp, sp))
    v = v + lin[0] + np.asarray(center)
    return Mesh(v, f)


class TestATE:
    def test_align_recovers_rigid_transform(self, rng):
        pts = rng.normal(size=(50, 3))
        th = 0.4
        R = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        )
        t = np.array([1.0, -2.0, 0.5])
        moved = pts @ R.T + t
        _, _, err = align(pts.T, moved.T)
        assert err.max() < 1e-9

    def test_evaluate_ate_stats(self, rng):
        gt = rng.normal(size=(30, 3))
        noise = rng.normal(size=(30, 3)) * 0.01
        res = evaluate_ate(gt + noise, gt)
        assert res["compared_pose_pairs"] == 30
        assert 0 < res["absolute_translational_error.rmse"] < 0.05
        assert (
            res["absolute_translational_error.min"]
            <= res["absolute_translational_error.median"]
            <= res["absolute_translational_error.max"]
        )


class TestRecon:
    def test_icp_recovers_offset(self):
        m = sphere_mesh()
        rng = np.random.default_rng(0)
        src = m.sample_surface(2000, rng) + np.array([0.03, -0.02, 0.01])
        dst = m.sample_surface(2000, rng)
        T = icp_align(src, dst)
        aligned = src @ T[:3, :3].T + T[:3, 3]
        from scipy.spatial import cKDTree

        tree = cKDTree(dst)
        d_after, _ = tree.query(aligned)
        d_before, _ = tree.query(src)
        # alignment should reduce the error down to the sampling-density floor
        assert d_after.mean() < d_before.mean() * 0.8
        assert d_after.mean() < 0.03

    def test_3d_metric_identical_meshes(self, tmp_path):
        m = sphere_mesh()
        p = str(tmp_path / "s.ply")
        m.export(p)
        res = calc_3d_metric(p, p, n_samples=5000)
        # floor set by 5000-sample surface density on the sphere (~1.2 cm)
        assert res["accuracy (cm)"] < 2.0
        assert res["completion (cm)"] < 2.0
        assert res["completion ratio (<5cm %)"] > 99.0

    def test_3d_metric_detects_misaligned_scale(self, tmp_path):
        a = sphere_mesh(r=0.5)
        b = sphere_mesh(r=0.6)
        pa, pb = str(tmp_path / "a.ply"), str(tmp_path / "b.ply")
        a.export(pa)
        b.export(pb)
        res = calc_3d_metric(pa, pb, n_samples=5000, align=False)
        assert res["accuracy (cm)"] > 5.0  # radius differs by 10 cm

    def test_splat_depth(self):
        pts = np.array([[0.0, 0.0, -1.0]])
        c2w = np.eye(4)
        d = splat_depth(pts, c2w, 11, 11, 10.0, 10.0, 5.0, 5.0)
        assert abs(d[5, 5] - 1.0) < 1e-9
        assert d.sum() == d[5, 5]


class TestCull:
    def test_cull_keeps_visible(self):
        m = sphere_mesh(r=0.3, center=(0, 0, -1.0))
        cam = Camera(40, 40, 30.0, 30.0, 19.5, 19.5)
        pose_looking = np.eye(4)  # camera at origin looking along -z
        out = cull_mesh(m, np.stack([pose_looking]), cam)
        assert len(out.faces) > 0.5 * len(m.faces)

        pose_away = np.eye(4)
        pose_away[:3, :3] = np.diag([1, -1, -1])  # looking along +z
        out2 = cull_mesh(m, np.stack([pose_away]), cam)
        assert len(out2.faces) == 0
