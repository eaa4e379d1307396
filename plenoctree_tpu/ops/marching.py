"""Isosurface extraction via vectorized marching tetrahedra.

Replaces the reference's external pymcubes C++ dependency
(nerf_sh/gen_mesh.py:29,124) with a self-contained numpy implementation:
each grid cube splits into 6 tetrahedra; each tetrahedron contributes 0-2
triangles with vertices linearly interpolated onto the isosurface. Fully
vectorized over the whole grid (no python loop over cells), so a 256^3 grid
meshes in seconds on the host.
"""

import numpy as np

# Kuhn subdivision: six tetrahedra around the 0-7 main diagonal, each a
# one-bit-at-a-time path 0 -> 7; corner ids bit-coded per _CORNER_OFFSETS.
_CUBE_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 1, 7, 5],
        [0, 5, 7, 4],
        [0, 4, 7, 6],
        [0, 6, 7, 2],
        [0, 2, 7, 3],
    ]
)

_CORNER_OFFSETS = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], dtype=np.int64
)

# For each of the 16 inside/outside sign patterns of a tet's 4 corners, the
# list of (up to 2) triangles as triples of tet-edge ids. Tet edges:
# 0:(0,1) 1:(0,2) 2:(0,3) 3:(1,2) 4:(1,3) 5:(2,3).
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])
_TET_TRIS = {
    0b0001: [(0, 1, 2)],
    0b0010: [(0, 4, 3)],
    0b0100: [(1, 3, 5)],
    0b1000: [(2, 5, 4)],
    0b0011: [(1, 2, 4), (1, 4, 3)],
    0b0101: [(0, 3, 5), (0, 5, 2)],
    0b1001: [(0, 1, 5), (0, 5, 4)],
    0b0110: [(0, 4, 5), (0, 5, 1)],
    0b1010: [(0, 2, 5), (0, 5, 3)],
    0b1100: [(1, 4, 2), (1, 3, 4)],
    0b0111: [(2, 4, 5)],
    0b1011: [(1, 5, 3)],
    0b1101: [(0, 3, 4)],
    0b1110: [(0, 2, 1)],
}


def marching_tetrahedra(volume, iso):
    """Extract the isosurface of a dense scalar volume.

    Args:
      volume: [X, Y, Z] float array of scalar samples.
      iso: isolevel.

    Returns:
      vertices: [V, 3] float64 vertex positions in index coordinates.
      triangles: [T, 3] int64 vertex indices.
    """
    volume = np.asarray(volume, dtype=np.float64)
    nx, ny, nz = volume.shape
    # Cell origins.
    cx, cy, cz = np.meshgrid(
        np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1), indexing="ij"
    )
    cells = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)  # [C, 3]

    # Corner values for all cells: [C, 8].
    corner_idx = cells[:, None, :] + _CORNER_OFFSETS[None]  # [C, 8, 3]
    vals = volume[corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]]

    # Skip cells fully inside/outside early.
    inside = vals > iso
    active = ~(inside.all(1) | (~inside).all(1))
    cells, vals, inside, corner_idx = (
        cells[active],
        vals[active],
        inside[active],
        corner_idx[active],
    )
    if cells.shape[0] == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)

    all_tris = []
    all_verts = []
    n_verts = 0
    for tet in _CUBE_TETS:
        tvals = vals[:, tet]  # [C, 4]
        tin = inside[:, tet]
        code = (
            tin[:, 0].astype(np.int64)
            | (tin[:, 1].astype(np.int64) << 1)
            | (tin[:, 2].astype(np.int64) << 2)
            | (tin[:, 3].astype(np.int64) << 3)
        )
        tpos = corner_idx[:, tet, :].astype(np.float64)  # [C, 4, 3]
        for pattern, tris in _TET_TRIS.items():
            sel = np.nonzero(code == pattern)[0]
            if sel.size == 0:
                continue
            for tri in tris:
                # Interpolate the three edge-crossing vertices.
                tri_verts = []
                for e in tri:
                    a, b = _TET_EDGES[e]
                    va, vb = tvals[sel, a], tvals[sel, b]
                    t = (iso - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
                    t = np.clip(t, 0.0, 1.0)
                    p = tpos[sel, a, :] + t[:, None] * (tpos[sel, b, :] - tpos[sel, a, :])
                    tri_verts.append(p)
                v0, v1, v2 = tri_verts
                base = n_verts + 3 * np.arange(sel.size, dtype=np.int64)
                all_verts.append(np.stack([v0, v1, v2], axis=1).reshape(-1, 3))
                all_tris.append(np.stack([base, base + 1, base + 2], axis=1))
                n_verts += 3 * sel.size

    verts = np.concatenate(all_verts, axis=0)
    tris = np.concatenate(all_tris, axis=0)
    # Weld duplicate vertices (edges shared by neighboring tets/cells).
    keys = np.round(verts * 1e6).astype(np.int64)
    _, uniq_idx, inverse = np.unique(
        keys, axis=0, return_index=True, return_inverse=True
    )
    verts = verts[uniq_idx]
    tris = inverse[tris]
    # Drop degenerate triangles produced by on-corner crossings.
    ok = (
        (tris[:, 0] != tris[:, 1])
        & (tris[:, 1] != tris[:, 2])
        & (tris[:, 0] != tris[:, 2])
    )
    return verts, tris[ok]


def save_obj(vertices, triangles, pth):
    """Write a wavefront OBJ (parity: nerf_sh/gen_mesh.py:133-158)."""
    with open(pth, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in triangles:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")
