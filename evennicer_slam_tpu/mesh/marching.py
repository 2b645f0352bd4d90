"""Iso-surface extraction: vectorized marching tetrahedra.

The reference delegates to ``skimage.measure.marching_cubes``
(reference src/utils/Mesher.py:437-458); that dependency isn't available
here, so this module implements a table-free *marching tetrahedra* variant:
every grid cell is split into 6 tetrahedra and each tet contributes 0-2
triangles with vertices linearly interpolated onto the iso-level. The
case logic is branch-free numpy over all tets at once.

Compared with classic marching cubes the triangulation is denser (~2x faces)
but the surface positions are identical up to the shared linear edge
interpolation, which is what the reconstruction metrics measure.

The level-set convention matches the reference mesher: occupancy values are
*decoder logits* and the surface is at ``level`` with inside = value > level.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# 6-tetrahedra decomposition of the unit cube (corner indices).
# Cube corners: bit 0 -> +x, bit 1 -> +y, bit 2 -> +z offset.
_TETS = np.array(
    [
        [0, 5, 1, 3],
        [0, 5, 3, 7],
        [0, 5, 7, 4],
        [0, 7, 3, 2],
        [0, 7, 2, 6],
        [0, 7, 6, 4],
    ],
    np.int64,
)

_CORNER_OFFSETS = np.array(
    [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], np.int64
)

# For each of the 16 tet sign cases: up to 2 triangles, each triangle given
# as 3 (edge) pairs of tet-local vertex indices; -1 padding.
# Tet edges: (0,1),(0,2),(0,3),(1,2),(1,3),(2,3)
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int64)


def _tet_case_table() -> np.ndarray:
    """[16, 2, 3] edge indices per case (-1 = unused), built programmatically
    from the inside/outside split of the 4 tet vertices."""
    table = -np.ones((16, 2, 3), np.int64)
    edge_lookup = {tuple(sorted(e)): i for i, e in enumerate(_TET_EDGES.tolist())}

    def edges_from(inside, outside):
        return [edge_lookup[tuple(sorted((a, b)))] for a in inside for b in outside]

    for case in range(16):
        inside = [v for v in range(4) if case & (1 << v)]
        outside = [v for v in range(4) if not case & (1 << v)]
        if len(inside) == 0 or len(inside) == 4:
            continue
        if len(inside) == 1:
            a = inside[0]
            e = edges_from([a], outside)  # 3 edges
            table[case, 0] = e
        elif len(inside) == 3:
            a = outside[0]
            e = edges_from(inside, [a])
            # flip winding relative to the 1-inside case
            table[case, 0] = [e[0], e[2], e[1]]
        else:  # 2 inside, 2 outside -> quad -> 2 triangles
            i0, i1 = inside
            o0, o1 = outside
            e00 = edge_lookup[tuple(sorted((i0, o0)))]
            e01 = edge_lookup[tuple(sorted((i0, o1)))]
            e10 = edge_lookup[tuple(sorted((i1, o0)))]
            e11 = edge_lookup[tuple(sorted((i1, o1)))]
            table[case, 0] = [e00, e10, e11]
            table[case, 1] = [e00, e11, e01]
    return table


_CASE_TABLE = _tet_case_table()


def marching_cubes(
    volume: np.ndarray,
    level: float = 0.0,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the ``level`` iso-surface of ``volume`` [NX, NY, NZ].

    Returns (vertices [V, 3] in spacing units, faces [F, 3]). Vertices are
    deduplicated per interpolated grid edge. Inside = value > level.
    """
    vol = np.asarray(volume, np.float32)
    NX, NY, NZ = vol.shape
    if min(NX, NY, NZ) < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    # cell corner values: [nx, ny, nz, 8]
    nx, ny, nz = NX - 1, NY - 1, NZ - 1
    corner_vals = np.empty((nx, ny, nz, 8), np.float32)
    for c in range(8):
        ox, oy, oz = _CORNER_OFFSETS[c]
        corner_vals[..., c] = vol[ox : ox + nx, oy : oy + ny, oz : oz + nz]

    inside = corner_vals > level  # [nx, ny, nz, 8]
    any_in = inside.any(-1)
    any_out = (~inside).any(-1)
    active = np.argwhere(any_in & any_out)  # [A, 3]
    if active.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    av = corner_vals[active[:, 0], active[:, 1], active[:, 2]]  # [A, 8]
    # Reflected Kuhn triangulation: mirror the 6-tet decomposition by the
    # cell's per-axis coordinate parity (corner id XOR parity mask). A single
    # translation-invariant decomposition cuts the two sides of a shared
    # cell face along OPPOSITE diagonals, so the extracted sheets do not
    # conform across cells — the surface is position-correct but laced with
    # hairline cracks, and edge-connected component analysis (the mesh
    # cleaner's small-geometry filter) sees thousands of sub-0.2 m^2
    # fragments and deletes most of the scene. Mirroring odd cells makes
    # neighbors' shared-face triangulations mirror images, which coincide,
    # so iso-vertices land on the SAME diagonal edge and weld by edge key.
    parity = (active[:, 0] & 1) | ((active[:, 1] & 1) << 1) | ((active[:, 2] & 1) << 2)
    cell_tets = _TETS[None, :, :] ^ parity[:, None, None]  # [A, 6, 4]
    # per-tet processing: [A, 6, 4] corner values
    tet_vals = av[np.arange(av.shape[0])[:, None, None], cell_tets]  # [A, 6, 4]
    tet_in = tet_vals > level
    cases = (
        tet_in[..., 0].astype(np.int64)
        | (tet_in[..., 1] << 1)
        | (tet_in[..., 2] << 2)
        | (tet_in[..., 3] << 3)
    )  # [A, 6]

    tris = _CASE_TABLE[cases]  # [A, 6, 2, 3] edge ids or -1
    valid = tris[..., 0] >= 0  # [A, 6, 2]
    a_idx, t_idx, k_idx = np.nonzero(valid)
    tri_edges = tris[a_idx, t_idx, k_idx]  # [T, 3] tet-edge ids

    # interpolate each triangle vertex on its tet edge
    cell = active[a_idx]  # [T, 3]
    tet_corner = cell_tets[a_idx, t_idx]  # [T, 4] cube-corner ids (mirrored)

    # global unique edge key for dedup: cube-grid node ids of the edge ends
    def node_id(cells, corners):
        off = _CORNER_OFFSETS[corners]  # [..., 3]
        px = cells[..., 0] + off[..., 0]
        py = cells[..., 1] + off[..., 1]
        pz = cells[..., 2] + off[..., 2]
        return (px * NY + py) * NZ + pz, np.stack([px, py, pz], -1)

    verts_out = []
    vert_keys = []
    face_idx = np.empty((tri_edges.shape[0], 3), np.int64)

    all_vals = vol.reshape(-1)
    for corner_slot in range(3):
        e = tri_edges[:, corner_slot]  # [T] tet-edge id
        va = tet_corner[np.arange(e.shape[0]), _TET_EDGES[e][:, 0]]
        vb = tet_corner[np.arange(e.shape[0]), _TET_EDGES[e][:, 1]]
        ida, pa = node_id(cell, va)
        idb, pb = node_id(cell, vb)
        lo = np.minimum(ida, idb)
        hi = np.maximum(ida, idb)
        key = lo * (NX * NY * NZ) + hi
        fa = all_vals[ida]
        fb = all_vals[idb]
        denom = fb - fa
        denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
        t = np.clip((level - fa) / denom, 0.0, 1.0)
        pt = pa + t[:, None] * (pb - pa)
        verts_out.append(pt)
        vert_keys.append(key)
        face_idx[:, corner_slot] = 0  # filled after dedup

    keys = np.concatenate(vert_keys)
    pts = np.concatenate(verts_out, axis=0)
    uniq_keys, first_idx, inv = np.unique(keys, return_index=True, return_inverse=True)
    vertices = pts[first_idx].astype(np.float32)
    T = tri_edges.shape[0]
    faces = np.stack([inv[:T], inv[T : 2 * T], inv[2 * T :]], axis=1)

    # Consistent outward winding: the 6-tet cube decomposition mixes tet
    # parities, so the combinatorial case table alone cannot fix orientation.
    # Orient each triangle so its normal points from the tet's inside corners
    # (value > level) toward its outside corners — i.e. out of the solid.
    p0, p1, p2 = verts_out
    tri_n = np.cross(p1 - p0, p2 - p0)
    tin = tet_in[a_idx, t_idx].astype(np.float64)  # [T, 4] inside mask
    cpos = cell[:, None, :] + _CORNER_OFFSETS[tet_corner]  # [T, 4, 3]
    w_in = tin / np.maximum(tin.sum(-1, keepdims=True), 1.0)
    w_out = (1.0 - tin) / np.maximum((1.0 - tin).sum(-1, keepdims=True), 1.0)
    outward = ((w_out - w_in)[..., None] * cpos).sum(1)  # [T, 3]
    flip = (tri_n * outward).sum(-1) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]

    # drop degenerate faces (duplicate vertices within a face)
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[ok]

    vertices = vertices * np.asarray(spacing, np.float32)[None]
    return vertices, faces
