"""Offline tool tests: ATE alignment, reconstruction metrics, mesh culling."""

import os

import numpy as np

from evennicer_slam_tpu.mesh.marching import marching_cubes
from evennicer_slam_tpu.mesh.trimesh_lite import Mesh
from evennicer_slam_tpu.slam.camera import Camera
from evennicer_slam_tpu.tools.cull_mesh import cull_mesh
from evennicer_slam_tpu.tools.eval_ate import align, evaluate_ate
from evennicer_slam_tpu.tools.eval_recon import (
    calc_2d_metric,
    calc_3d_metric,
    icp_align,
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

    def test_rasterize_depth_quad(self):
        """A z=2 quad rendered with the CV-convention rasterizer: exact
        depth where covered, zero background, and perspective-correct depth
        on a slanted quad."""
        from evennicer_slam_tpu.mesh.raster import rasterize_depth

        v = np.array([
            [-1.0, -1.0, 2.0], [1.0, -1.0, 2.0],
            [1.0, 1.0, 2.0], [-1.0, 1.0, 2.0],
        ])
        f = np.array([[0, 1, 2], [0, 2, 3]])
        d = rasterize_depth(v, f, np.eye(4), 21, 21, 10.0, 10.0, 10.0, 10.0)
        assert abs(d[10, 10] - 2.0) < 1e-6
        assert abs(d[5, 5] - 2.0) < 1e-6
        assert d[0, 0] == 0.0  # quad corners project just past the border

        # slanted quad: depth varies linearly in 1/z across the screen
        v2 = v.copy()
        v2[:, 2] = 2.0 + 0.5 * v2[:, 0]
        d2 = rasterize_depth(v2, f, np.eye(4), 21, 21, 10.0, 10.0, 10.0, 10.0)
        # center ray x=0 -> z=2
        assert abs(d2[10, 10] - 2.0) < 1e-3

    def test_rasterize_near_clipping(self):
        """Faces crossing the near plane are clipped, not dropped."""
        from evennicer_slam_tpu.mesh.raster import rasterize_depth

        v = np.array([
            [0.0, -0.5, -1.0],   # behind the camera
            [0.5, 0.5, 3.0],
            [-0.5, 0.5, 3.0],
        ])
        f = np.array([[0, 1, 2]])
        d = rasterize_depth(v, f, np.eye(4), 21, 21, 10.0, 10.0, 10.0, 10.0)
        assert (d > 0).sum() > 0

    def test_2d_metric_identical_meshes(self, tmp_path):
        """Reference-protocol 2D metric (interior OBB views, mesh
        rasterization): identical meshes give ~0 depth-L1; a radius change
        is detected. Unseen-point rejection discards views that see the
        marked region."""
        m = sphere_mesh(r=0.5, n=24)
        p = str(tmp_path / "s.ply")
        m.export(p)
        res = calc_2d_metric(p, p, n_imgs=4, align=False)
        assert res["depth L1 (cm)"] < 0.5

        b = sphere_mesh(r=0.6, n=24)
        pb = str(tmp_path / "b.ply")
        b.export(pb)
        res2 = calc_2d_metric(p, pb, n_imgs=4, align=False)
        assert res2["depth L1 (cm)"] > res["depth L1 (cm)"]

    def test_2d_metric_unseen_rejection(self, tmp_path):
        # Room-scale BOX: the protocol samples cameras in the OBB scaled by
        # (0.3, 0.7, 0.7) + a 0.4 m z-raise (reference get_cam_position,
        # eval_recon.py:118-127). An ANISOTROPIC box keeps the PCA OBB
        # well-conditioned so its axes align with the walls and the scaled
        # OBB is strictly interior — a symmetric cube has a degenerate
        # vertex covariance, PCA axes can land on the diagonals, and sampled
        # cameras leak outside the room (seen empirically: extent 9.7 m for
        # a 5.6 m cube), where views see nothing and are never rejected.
        lin = np.linspace(-1, 1, 24)
        X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
        vol = 0.1 - np.maximum(
            np.maximum(abs(X) - 0.6, abs(Y) - 0.45), abs(Z) - 0.25
        )
        sp = lin[1] - lin[0]
        v, f = marching_cubes(vol, spacing=(sp, sp, sp))
        m = Mesh(v + lin[0], f)
        m.vertices = m.vertices * 4.0  # half-extent 2.8 m
        p = str(tmp_path / "s.ply")
        m.export(p)
        # every surface point marked unseen -> every view rejected -> nan
        rng = np.random.default_rng(0)
        # dense enough that every interior view must contain a sample: at
        # 500 points (~2.7/m^2 on this box) a wall-hugging view can miss
        # all of them and the "reject every view" premise silently breaks
        unseen = m.sample_surface(20000, rng)
        res = calc_2d_metric(p, p, n_imgs=2, align=False, unseen_pc=unseen)
        assert np.isnan(res["depth L1 (cm)"])


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


class TestViz:
    def test_replay_panel_and_gif(self, tmp_path):
        """Replay rendering incl. the rasterized chase-cam mesh panel and
        Pillow GIF assembly (tools/viz.py, rebuilding the reference's o3d
        frontend headless)."""
        from evennicer_slam_tpu.tools.viz import assemble_gif, draw_trajectory

        m = sphere_mesh(r=0.5, n=16)
        mesh_path = str(tmp_path / "m.ply")
        m.export(mesh_path)
        n = 4
        est = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        est[:, 0, 3] = np.linspace(0, 0.3, n)
        est[:, 2, 3] = 1.2  # outside the sphere looking at it
        gt = est.copy()
        gt[:, 0, 3] += 0.01

        frame_dir = tmp_path / "frames"
        frame_dir.mkdir()
        for k in range(1, n):
            p = draw_trajectory(est[: k + 1], gt[: k + 1], mesh_path,
                                str(frame_dir / f"{k:05d}.png"), title=f"f{k}")
            assert os.path.exists(p)
        gif = assemble_gif(str(frame_dir), str(tmp_path / "replay.gif"))
        assert gif and os.path.getsize(gif) > 0


class TestVizServer:
    def test_endpoints_and_live_reload(self, tmp_path):
        """HTTP viewer server (tools/viz_server.py, the interactive frontend):
        /state.json carries trajectories + current pose, /mesh.bin round-trips
        the packed mesh, and a new mesh file bumps mesh_version on refresh —
        the reference SLAMFrontend's live-reload behavior
        (reference src/tools/viz.py:14-209)."""
        import json
        import struct
        import urllib.request

        from evennicer_slam_tpu.tools.viz_server import (
            pack_mesh, serve, vertex_normals,
        )

        # fake run output: ckpts/*.npz + mesh/*.ply
        out = tmp_path / "run"
        (out / "ckpts").mkdir(parents=True)
        (out / "mesh").mkdir()
        n = 5
        est = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        est[:, 0, 3] = np.linspace(0, 0.4, n)
        gt = est.copy()
        gt[:, 1, 3] += 0.02
        np.savez(out / "ckpts" / "00004.npz", estimate_c2w_list=est,
                 gt_c2w_list=gt, idx=np.asarray(4))
        m = sphere_mesh(r=0.5, n=12)
        m.export(str(out / "mesh" / "00004.ply"))

        httpd, watcher = serve(str(out), port=0, poll_s=60.0, blocking=False)
        try:
            base = f"http://127.0.0.1:{httpd.server_address[1]}"
            page = urllib.request.urlopen(base + "/").read().decode()
            assert "webgl" in page.lower()

            st = json.loads(
                urllib.request.urlopen(base + "/state.json").read())
            assert st["idx"] == 4
            assert len(st["est"]) == n and len(st["gt"]) == n
            np.testing.assert_allclose(
                np.asarray(st["cur_c2w"]), est[-1], atol=1e-4)
            assert st["mesh_version"] == 1
            assert st["n_verts"] == len(m.vertices)

            raw = urllib.request.urlopen(base + "/mesh.bin").read()
            magic, ver, nv, nf = struct.unpack_from("<IIII", raw, 0)
            assert magic == 0x4D455348 and ver == 1
            assert nv == len(m.vertices) and nf == len(m.faces)
            pos = np.frombuffer(raw, "<f4", 3 * nv, 16).reshape(-1, 3)
            np.testing.assert_allclose(pos, m.vertices, atol=1e-5)
            nrm = np.frombuffer(raw, "<f4", 3 * nv, 16 + 12 * nv)
            assert np.isfinite(nrm).all()
            # sphere normals point away from the center
            nrm = nrm.reshape(-1, 3)
            outward = np.einsum("ij,ij->i", nrm, pos)
            assert (outward > 0).mean() > 0.95

            # live reload: newer ckpt + mesh appear -> version bumps
            np.savez(out / "ckpts" / "00009.npz", estimate_c2w_list=est,
                     gt_c2w_list=gt, idx=np.asarray(9))
            m.export(str(out / "mesh" / "00009.ply"))
            watcher.refresh()
            st2 = json.loads(
                urllib.request.urlopen(base + "/state.json").read())
            assert st2["idx"] == 9 and st2["mesh_version"] == 2
        finally:
            httpd.shutdown()
            watcher.stop()

    def test_root_visualizer_cli_replay(self, tmp_path, monkeypatch):
        """Root visualizer.py (reference visualizer.py:15-96 parity) routes
        to the offline replay frontend and writes replay.png."""
        import sys

        sys.path.insert(0, "/root/repo")
        try:
            import visualizer
        finally:
            sys.path.pop(0)

        out = tmp_path / "run"
        (out / "ckpts").mkdir(parents=True)
        est = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        est[:, 0, 3] = [0, 0.1, 0.2]
        np.savez(out / "ckpts" / "00002.npz", estimate_c2w_list=est,
                 gt_c2w_list=est, idx=np.asarray(2))
        cfg = tmp_path / "c.yaml"
        cfg.write_text(f"data:\n  output: {out}\n")
        monkeypatch.setattr(
            "sys.argv", ["visualizer.py", str(cfg)])
        visualizer.main()
        assert (out / "replay.png").exists()

    def test_pack_mesh_empty_and_normals_degenerate(self):
        from evennicer_slam_tpu.tools.viz_server import (
            _EmptyMesh, pack_mesh, vertex_normals,
        )

        raw = pack_mesh(_EmptyMesh(), 0)
        assert len(raw) == 16
        # unreferenced vertex gets the fallback normal, finite everywhere
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]], float)
        f = np.array([[0, 1, 2]])
        n = vertex_normals(v, f)
        assert np.isfinite(n).all()
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1, atol=1e-5)
        np.testing.assert_allclose(n[3], [0, 0, 1])


class TestEventAblationSummary:
    def test_flags_only_when_measured(self):
        """--variants subsets must not claim events-vs-dead-reckoning
        comparisons that never ran (flags derive from measured runs only)."""
        from evennicer_slam_tpu.tools.event_ablation import summarize

        # full grid: both flags present and correct
        full = summarize(
            {"A_dead_reckoning": [0.3, 0.2],
             "C_events_reference": [0.1, 0.12],
             "D_non_rgbd_only": [0.08, 0.09]},
            seeds=[7, 1007], frames=100,
        )
        assert full["events_beat_dead_reckoning_reference"] is True
        assert full["events_beat_dead_reckoning_any_mode"] is True
        assert full["best_event_mode"] == "D_non_rgbd_only"

        # no dead-reckoning run -> no comparison flags at all
        sub = summarize({"D_non_rgbd_only": [0.08]}, seeds=[7], frames=100)
        assert "events_beat_dead_reckoning_reference" not in sub
        assert "events_beat_dead_reckoning_any_mode" not in sub

        # dead reckoning but no reference-mode run -> only the any-mode flag
        sub2 = summarize(
            {"A_dead_reckoning": [0.3], "D_non_rgbd_only": [0.08]},
            seeds=[7], frames=100,
        )
        assert "events_beat_dead_reckoning_reference" not in sub2
        assert sub2["events_beat_dead_reckoning_any_mode"] is True
