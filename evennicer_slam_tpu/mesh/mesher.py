"""Mesher: occupancy sweep on TPU + iso-surface extraction + cleaning.

Rebuild of reference src/utils/Mesher.py:11-574. The decoder occupancy sweep
over the query grid (the dominant cost, 256^3 points) runs batched on TPU via
the renderer's eval_points; marching tetrahedra, visibility masks, hull
cleaning, component filtering, and PLY export run host-side in numpy (the
reference used skimage/open3d/trimesh for these).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from evennicer_slam_tpu.mesh.marching import marching_cubes
from evennicer_slam_tpu.mesh.trimesh_lite import ConvexHullRegion, Mesh
from evennicer_slam_tpu.render.renderer import RenderSettings, eval_points
from evennicer_slam_tpu.slam.camera import Camera
from evennicer_slam_tpu.slam.keyframes import _project


class Mesher:
    def __init__(
        self,
        cfg: Dict,
        cam: Camera,
        settings: RenderSettings,
        bound: np.ndarray,
        renderer=None,
        points_batch_size: int = 500000,
    ):
        mcfg = cfg["meshing"]
        self.cam = cam
        self.settings = settings
        self.bound = jnp.asarray(bound, jnp.float32)
        self.renderer = renderer
        self.scale = cfg["scale"]
        self.resolution = mcfg["resolution"]
        self.level_set = mcfg["level_set"]
        self.clean_mesh_bound_scale = mcfg["clean_mesh_bound_scale"]
        self.remove_small_geometry_threshold = mcfg["remove_small_geometry_threshold"]
        self.color_mesh_extraction_method = mcfg["color_mesh_extraction_method"]
        self.get_largest_components = mcfg["get_largest_components"]
        self.depth_test = mcfg["depth_test"]
        self.clean = mcfg.get("clean_mesh", True)
        self.points_batch_size = points_batch_size
        self.marching_cubes_bound = (
            np.array(cfg["mapping"]["marching_cubes_bound"], np.float64) * self.scale
        )
        self.verbose = cfg.get("verbose", False)

    # ------------------------------------------------------------------

    def get_grid_uniform(self, resolution: int):
        """Query grid over the marching-cubes bound with 0.05 padding
        (reference src/utils/Mesher.py:321-347; note the reference's
        np.meshgrid default 'xy' indexing and the [1,0,2] transpose)."""
        bound = self.marching_cubes_bound
        padding = 0.05
        x = np.linspace(bound[0][0] - padding, bound[0][1] + padding, resolution)
        y = np.linspace(bound[1][0] - padding, bound[1][1] + padding, resolution)
        z = np.linspace(bound[2][0] - padding, bound[2][1] + padding, resolution)
        return {"xyz": [x, y, z]}

    @staticmethod
    def lattice_points(xyz) -> np.ndarray:
        """Materialize the query lattice in the reference's 'xy'-meshgrid
        order (NY, NX, NZ) without three f64 grids + a transpose copy (which
        cost ~20 s at 256^3). Only the forecast path needs host points; the
        default path generates its lattice on device (masked_occ_sweep)."""
        x, y, z = xyz
        points = np.empty((len(y), len(x), len(z), 3), np.float32)
        points[..., 0] = x[None, :, None]
        points[..., 1] = y[:, None, None]
        points[..., 2] = z[None, None, :]
        return points.reshape(-1, 3)

    def _eval_chunks(self, points: np.ndarray, grids, decoders, stage: str,
                     out_slice) -> np.ndarray:
        """Chunked decoder query on device (reference eval_points semantics
        incl. out-of-bound +100). Two throughput rules for the remote chip:
        every chunk is PADDED to points_batch_size so one executable serves
        all calls (an unpadded tail — or a mesh's per-extraction vertex
        count — recompiles for ~20 s each time), and all chunks are
        dispatched before any result is fetched so transfers and decode
        pipeline instead of paying a sync per chunk."""
        n = points.shape[0]
        if n == 0:
            return np.zeros((0,) + (() if out_slice == -1 else (3,)), np.float32)
        bs = self.points_batch_size
        futures = []
        for i in range(0, n, bs):
            p = points[i : i + bs]
            if p.shape[0] < bs:
                p = np.concatenate(
                    [p, np.zeros((bs - p.shape[0], 3), np.float32)]
                )
            futures.append(
                self._eval_jit(decoders, grids, jnp.asarray(p), stage)
            )
        outs = [
            np.asarray(r[:, -1] if out_slice == -1 else r[:, :3])
            for r in futures
        ]
        return np.concatenate(outs)[:n]

    @property
    def _eval_jit(self):
        import functools
        import jax

        if not hasattr(self, "_eval_fn"):
            settings = self.settings
            bound = self.bound

            @functools.partial(jax.jit, static_argnames=("stage",))
            def fn(decoders, grids, p, stage):
                return eval_points(decoders, grids, p, bound, stage, settings)

            self._eval_fn = fn
        return self._eval_fn

    def eval_occ(self, points: np.ndarray, grids, decoders, stage: str) -> np.ndarray:
        return self._eval_chunks(points, grids, decoders, stage, out_slice=-1)

    # -- device-side masked occupancy sweep (the non-forecast fast path) ----

    @property
    def _sweep_jit(self):
        """Per-chunk jit that generates its slice of the query LATTICE on
        device, decodes occupancy, and applies the convex-hull inside test as
        one [bs, F] matmul — so the 256^3 sweep ships NO points over the
        (slow) host link and the hull test rides the MXU instead of a
        quadratic host loop. Hull planes are padded to a fixed bucket with
        always-satisfied dummies so one executable serves every mesh."""
        import functools
        import jax

        if not hasattr(self, "_sweep_fn"):
            settings = self.settings
            bound = self.bound
            bs = self.points_batch_size

            @functools.partial(jax.jit, static_argnames=("stage", "nx", "nz"))
            def fn(decoders, grids, eq, tol, x, y, z, start, stage, nx, nz):
                flat = start + jnp.arange(bs)
                iy = flat // (nx * nz)
                ix = (flat // nz) % nx
                iz = flat % nz
                p = jnp.stack([x[ix], y[iy], z[iz]], axis=-1)
                raw = eval_points(decoders, grids, p, bound, stage, settings)
                # plane blocks bound the [bs, planes] distance matrix to
                # ~256 MB even for many-facet hulls (back-projected depth
                # hulls can reach thousands of facets)
                inside = jnp.ones((bs,), bool)
                for j in range(0, eq.shape[0], 128):
                    eqb = eq[j : j + 128]
                    d = p @ eqb[:, :3].T + eqb[:, 3]
                    # tol scales with hull extent: f32 half-space distances
                    # at meter scale cannot resolve 1e-9
                    inside = inside & jnp.all(d <= tol, axis=1)
                return jnp.where(inside, raw[:, -1], 100.0)

            self._sweep_fn = fn
        return self._sweep_fn

    def masked_occ_sweep(self, xyz, hull: ConvexHullRegion, grids, decoders,
                         stage: str = "fine") -> np.ndarray:
        """Occupancy over the full lattice with out-of-hull set to +100
        (the reference's mesh_bound mask, src/utils/Mesher.py:417-427)."""
        x, y, z = (np.asarray(a, np.float32) for a in xyz)
        nx, ny, nz = len(x), len(y), len(z)
        n = nx * ny * nz
        bs = self.points_batch_size
        eq = hull.equations.astype(np.float32)
        f_bucket = -(-len(eq) // 512) * 512
        pad = np.zeros((f_bucket - len(eq), 4), np.float32)
        pad[:, 3] = -1.0  # 0 . p - 1 <= 0: always satisfied
        eq = jnp.asarray(np.concatenate([eq, pad]))
        xj, yj, zj = jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)
        tol = jnp.asarray(hull.tol, jnp.float32)
        futures = [
            self._sweep_jit(decoders, grids, eq, tol, xj, yj, zj,
                            jnp.asarray(i, jnp.int32), stage, nx, nz)
            for i in range(0, n, bs)
        ]
        out = np.concatenate([np.asarray(f) for f in futures])[:n]
        return out

    def eval_rgb(self, points: np.ndarray, grids, decoders) -> np.ndarray:
        return self._eval_chunks(points, grids, decoders, "color", out_slice=3)

    # ------------------------------------------------------------------

    def point_masks(
        self,
        points: np.ndarray,
        keyframe_dict: List[Dict],
        estimate_c2w_list: np.ndarray,
        idx: int,
        get_mask_use_all_frames: bool = False,
    ):
        """Split points into seen / forecast / unseen by keyframe (or
        all-frame) frustum tests (reference src/utils/Mesher.py:53-212)."""
        cam = self.cam
        H, W = cam.H, cam.W
        N = points.shape[0]
        seen = np.zeros(N, bool)
        forecast = np.zeros(N, bool)

        if get_mask_use_all_frames:
            poses = [estimate_c2w_list[i] for i in range(0, idx + 1)]
            depth_imgs = [None] * len(poses)
            max_depths = [None] * len(poses)
        else:
            poses = [kf["est_c2w"] for kf in keyframe_dict]
            depth_imgs = [kf["depth"] for kf in keyframe_dict]
            max_depths = [float(np.max(kf["depth"])) for kf in keyframe_dict]

        for c2w, depth_img, max_d in zip(poses, depth_imgs, max_depths):
            w2c = np.linalg.inv(np.asarray(c2w, np.float64))
            uv, z, cam_cord = _project(points.astype(np.float64), w2c, cam)
            in_img = (uv[:, 0] < W) & (uv[:, 0] > 0) & (uv[:, 1] < H) & (uv[:, 1] > 0)
            front = z < 0
            cur_seen = in_img & front
            edge = -1000
            cur_forecast = (
                (uv[:, 0] < W - edge) & (uv[:, 0] > edge)
                & (uv[:, 1] < H - edge) & (uv[:, 1] > edge) & front
            )
            proj_depth = -cam_cord[:, 2]

            if depth_img is None:
                # all-frames mode: pure frustum test (reference :88-125)
                pass
            elif self.depth_test:
                # bilinear depth sample at uv with zero padding
                ds = _bilinear_sample(depth_img, uv)
                max_sample = float(ds.max()) if ds.size else 0.0
                cur_forecast &= proj_depth < max_sample
                cur_seen &= (proj_depth < ds + 2.4) & (ds - 2.4 < proj_depth)
            else:
                md = max_d * 1.1
                cur_forecast &= proj_depth < md
                cur_seen &= proj_depth < md

            seen |= cur_seen
            forecast |= cur_forecast

        forecast &= ~seen
        unseen = ~(seen | forecast)
        return seen, forecast, unseen

    def get_bound_from_frames(self, keyframe_dict: List[Dict], scale=1.0):
        """Scene hull from keyframe RGB-D: back-project each keyframe depth
        map plus the camera centers, convex hull, scaled by
        clean_mesh_bound_scale (reference src/utils/Mesher.py:214-279 used an
        open3d TSDF volume; the hull of the fused surface equals the hull of
        the back-projected depth samples)."""
        cam = self.cam
        pts = []
        stride = 8  # subsample pixels; the hull is insensitive to density
        jj, ii = np.meshgrid(
            np.arange(0, cam.H, stride), np.arange(0, cam.W, stride), indexing="ij"
        )
        dirs = np.stack(
            [
                (ii - cam.cx) / cam.fx,
                -(jj - cam.cy) / cam.fy,
                -np.ones_like(ii, np.float64),
            ],
            -1,
        )
        for kf in keyframe_dict:
            c2w = np.asarray(kf["est_c2w"], np.float64)
            d = np.asarray(kf["depth"])[::stride, ::stride]
            valid = d > 0
            rays_d = dirs @ c2w[:3, :3].T
            p = c2w[:3, 3] + rays_d[valid] * d[valid][:, None]
            pts.append(p)
            pts.append(c2w[:3, 3][None])
        allp = np.concatenate(pts, axis=0)
        return ConvexHullRegion(allp, scale=self.clean_mesh_bound_scale)

    # ------------------------------------------------------------------

    def get_mesh(
        self,
        mesh_out_file: str,
        grids,
        decoders,
        keyframe_dict: List[Dict],
        estimate_c2w_list: np.ndarray,
        idx: int,
        device=None,
        show_forecast: bool = False,
        color: bool = True,
        clean_mesh: Optional[bool] = None,
        get_mask_use_all_frames: bool = False,
    ) -> Optional[Mesh]:
        """Extract, clean, colorize, and export the scene mesh
        (reference get_mesh, src/utils/Mesher.py:349-574)."""
        clean_mesh = self.clean if clean_mesh is None else clean_mesh
        grid = self.get_grid_uniform(self.resolution)

        if show_forecast:
            points = self.lattice_points(grid["xyz"])
            seen_m, forecast_m, unseen_m = self.point_masks(
                points, keyframe_dict, estimate_c2w_list, idx,
                get_mask_use_all_frames=get_mask_use_all_frames,
            )
            z = np.full(points.shape[0], -100.0, np.float32)
            if seen_m.any():
                z[seen_m] = self.eval_occ(points[seen_m], grids, decoders, "fine")
            if forecast_m.any():
                z[forecast_m] = (
                    self.eval_occ(points[forecast_m], grids, decoders, "coarse") + 0.2
                )
        else:
            mesh_bound = self.get_bound_from_frames(keyframe_dict, self.scale)
            z = self.masked_occ_sweep(grid["xyz"], mesh_bound, grids, decoders)

        x, y, zax = grid["xyz"]
        volume = z.reshape(len(y), len(x), len(zax)).transpose(1, 0, 2)
        spacing = (x[2] - x[1], y[2] - y[1], zax[2] - zax[1])
        # reference surface orientation: occupied = value > level
        verts, faces = marching_cubes(volume, level=float(self.level_set), spacing=spacing)
        if len(verts) == 0:
            print("marching cubes: no surface extracted from the level set.")
            return None
        vertices = verts + np.array([x[0], y[0], zax[0]])

        mesh = Mesh(vertices, faces)
        if clean_mesh:
            if show_forecast:
                mesh_bound = self.get_bound_from_frames(keyframe_dict, self.scale)
                contain = mesh_bound.contains(mesh.vertices)
                face_out = (~contain)[mesh.faces].all(axis=1)
                mesh.update_faces(~face_out)
            else:
                seen_m, _, _ = self.point_masks(
                    mesh.vertices, keyframe_dict, estimate_c2w_list, idx,
                    get_mask_use_all_frames=get_mask_use_all_frames,
                )
                face_unseen = (~seen_m)[mesh.faces].all(axis=1)
                mesh.update_faces(~face_unseen)

            labels, ncomp = mesh.face_components()
            if ncomp:
                comp_area = np.bincount(
                    labels, weights=mesh.face_areas, minlength=ncomp
                )
                if self.get_largest_components:
                    keep_faces = labels == int(comp_area.argmax())
                else:
                    good = comp_area > (
                        self.remove_small_geometry_threshold
                        * self.scale * self.scale
                    )
                    keep_faces = good[labels]
                if keep_faces.any():
                    mesh.update_faces(keep_faces)

        vertex_colors = None
        if color and len(mesh.vertices):
            if self.color_mesh_extraction_method == "direct_point_query":
                rgb = self.eval_rgb(mesh.vertices.astype(np.float32), grids, decoders)
            else:
                rgb = self._render_along_normals(mesh, grids, decoders)
            vertex_colors = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            if show_forecast:
                _, forecast_m, _ = self.point_masks(
                    mesh.vertices, keyframe_dict, estimate_c2w_list, idx,
                    get_mask_use_all_frames=get_mask_use_all_frames,
                )
                vertex_colors[forecast_m] = np.array([0, 255, 255], np.uint8)

        out = Mesh(mesh.vertices / self.scale, mesh.faces, vertex_colors)
        out.export(mesh_out_file)
        if self.verbose:
            print("Saved mesh at", mesh_out_file)
        return out

    def _render_along_normals(self, mesh: Mesh, grids, decoders) -> np.ndarray:
        """iMAP* vertex colors: render a short ray along the inward vertex
        normal (reference src/utils/Mesher.py:526-553)."""
        normals = _vertex_normals(mesh)
        length = 0.1
        rays_d = jnp.asarray(normals, jnp.float32)
        rays_o = jnp.asarray(mesh.vertices - length * normals, jnp.float32)
        gt_depth = jnp.full((len(mesh.vertices),), length, jnp.float32)
        outs = []
        chunk = 100000
        for i in range(0, rays_d.shape[0], chunk):
            _, _, c = self.renderer.render_batch(
                decoders, grids, rays_o[i : i + chunk], rays_d[i : i + chunk],
                "color", gt_depth[i : i + chunk],
            )
            outs.append(np.asarray(c))
        return np.concatenate(outs)


def _vertex_normals(mesh: Mesh) -> np.ndarray:
    v = mesh.vertices
    f = mesh.faces
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    vn = np.zeros_like(v)
    for k in range(3):
        np.add.at(vn, f[:, k], fn)
    n = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(n, 1e-12)


def _bilinear_sample(img: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Bilinear sample with zero padding (torch grid_sample 'zeros',
    align_corners=True equivalent for pixel coords)."""
    H, W = img.shape
    x = uv[:, 0]
    y = uv[:, 1]
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    out = np.zeros(len(uv))
    for dx in (0, 1):
        for dy in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            w = (1 - np.abs(x - xi)) * (1 - np.abs(y - yi))
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            out[valid] += w[valid] * img[yi[valid], xi[valid]]
    return out
