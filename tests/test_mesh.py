"""Marching tetrahedra + mesh toolkit tests."""

import numpy as np

from evennicer_slam_tpu.mesh.marching import marching_cubes
from evennicer_slam_tpu.mesh.trimesh_lite import ConvexHullRegion, Mesh, concatenate


def sphere_volume(n=32, r=0.6):
    lin = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    # positive inside convention (occupancy-style)
    return r - np.sqrt(X**2 + Y**2 + Z**2), lin


class TestMarching:
    def test_sphere_surface(self):
        vol, lin = sphere_volume()
        sp = lin[1] - lin[0]
        verts, faces = marching_cubes(vol, level=0.0, spacing=(sp, sp, sp))
        verts = verts + lin[0]
        assert len(verts) > 200 and len(faces) > 200
        radii = np.linalg.norm(verts, axis=1)
        # all vertices lie on the r=0.6 sphere within one cell
        assert np.abs(radii - 0.6).max() < sp * 1.5
        assert np.abs(radii - 0.6).mean() < sp * 0.3

    def test_empty_and_full(self):
        v, f = marching_cubes(np.full((8, 8, 8), -1.0))
        assert len(v) == 0
        v, f = marching_cubes(np.full((8, 8, 8), 1.0))
        assert len(v) == 0

    def test_face_indices_valid(self):
        vol, _ = sphere_volume(16)
        verts, faces = marching_cubes(vol)
        assert faces.max() < len(verts)
        assert faces.min() >= 0

    def test_consistent_outward_winding(self):
        """Every face winds so its normal points out of the solid
        (value > level side). Checked on a sphere — face normal vs the
        radial direction at the face centroid — and via the divergence
        theorem: the signed volume of the closed surface must be positive
        and close to the true ball volume."""
        vol, lin = sphere_volume(32)
        sp = lin[1] - lin[0]
        verts, faces = marching_cubes(vol, spacing=(sp, sp, sp))
        verts = verts + lin[0]
        t = verts[faces]  # [F, 3, 3]
        fn = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
        centroid = t.mean(1)
        outward = np.einsum("ij,ij->i", fn, centroid)
        assert (outward > 0).all()
        signed_vol = np.einsum(
            "ij,ij->i", t[:, 0], np.cross(t[:, 1], t[:, 2])
        ).sum() / 6.0
        true = 4.0 / 3.0 * np.pi * 0.6**3
        assert abs(signed_vol - true) / true < 0.05

    def test_closed_surface_area(self):
        vol, lin = sphere_volume(48)
        sp = lin[1] - lin[0]
        verts, faces = marching_cubes(vol, spacing=(sp, sp, sp))
        m = Mesh(verts, faces)
        # surface area within 5% of 4*pi*r^2
        assert abs(m.area - 4 * np.pi * 0.36) / (4 * np.pi * 0.36) < 0.05

    def test_conforming_across_cells(self):
        """The extracted surface must be edge-CONNECTED across cell
        boundaries, not just position-continuous. A translation-invariant
        6-tet decomposition cuts the two sides of a shared cell face along
        opposite diagonals, producing hairline cracks along every cell
        boundary; the mesh cleaner's small-geometry component filter then
        shreds the scene (measured on a real run: 8,778 components, largest
        2.6 m^2 of a 120 m^2 room surface, completion over observed surface
        34.9 cm -> 2.6 cm after the parity-mirroring fix). A sphere must be
        ONE watertight component: every edge incident to exactly 2 faces."""
        vol, lin = sphere_volume(48)
        sp = lin[1] - lin[0]
        verts, faces = marching_cubes(vol, spacing=(sp, sp, sp))
        m = Mesh(verts, faces)
        labels, ncomp = m.face_components()
        assert ncomp == 1
        edges = np.sort(
            np.concatenate(
                [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
            ),
            axis=1,
        )
        key = edges[:, 0] * (len(verts) + 1) + edges[:, 1]
        _, counts = np.unique(key, return_counts=True)
        assert (counts == 2).all(), "surface must be watertight (2 faces/edge)"

    def test_two_blobs_two_components(self):
        lin = np.linspace(-1, 1, 48)
        X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
        vol = np.maximum(
            0.25 - np.sqrt((X - 0.5) ** 2 + Y**2 + Z**2),
            0.25 - np.sqrt((X + 0.5) ** 2 + Y**2 + Z**2),
        )
        verts, faces = marching_cubes(vol)
        _, ncomp = Mesh(verts, faces).face_components()
        assert ncomp == 2


class TestMeshOps:
    def _two_triangles(self):
        # two disconnected triangles
        v = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5], [6, 5, 5], [5, 6, 5], [6, 6, 5]],
            float,
        )
        f = np.array([[0, 1, 2], [3, 4, 5], [4, 6, 5]])
        return Mesh(v, f)

    def test_split_components(self):
        comps = self._two_triangles().split()
        assert len(comps) == 2
        areas = sorted(c.area for c in comps)
        assert abs(areas[0] - 0.5) < 1e-9 and abs(areas[1] - 1.0) < 1e-9

    def test_update_faces_drops_vertices(self):
        m = self._two_triangles()
        m.update_faces(np.array([True, False, False]))
        assert len(m.faces) == 1 and len(m.vertices) == 3

    def test_concatenate(self):
        m = concatenate(self._two_triangles().split())
        assert len(m.faces) == 3

    def test_ply_roundtrip(self, tmp_path):
        m = self._two_triangles()
        m.vertex_colors = np.tile(np.array([[10, 200, 30]], np.uint8), (7, 1))
        p = str(tmp_path / "m.ply")
        m.export(p)
        m2 = Mesh.load(p)
        np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-6)
        np.testing.assert_array_equal(m2.faces, m.faces)
        np.testing.assert_array_equal(m2.vertex_colors, m.vertex_colors)

    def test_sample_surface(self):
        m = self._two_triangles()
        pts = m.sample_surface(500, np.random.default_rng(0))
        assert pts.shape == (500, 3)
        # all samples on one of the two triangle planes
        assert np.all((np.abs(pts[:, 2]) < 1e-9) | (np.abs(pts[:, 2] - 5) < 1e-9))


class TestHull:
    def test_contains(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(100, 3))
        hull = ConvexHullRegion(pts)
        inner = pts.mean(0)[None]
        assert hull.contains(inner)[0]
        assert not hull.contains(np.array([[100.0, 0, 0]]))[0]

    def test_scaling(self):
        pts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1],
             [1, 1, 0], [1, 0, 1], [0, 1, 1]],
            float,
        )
        hull = ConvexHullRegion(pts, scale=2.0)
        # scaled hull contains points outside the unit cube
        assert hull.contains(np.array([[1.2, 1.2, 1.2]]))[0]
