"""Hierarchical aperture-7 hexagonal cell index ("H3-style"), vectorized.

The true H3 library is unavailable in this environment (SURVEY.md §0) and
its icosahedral base-cell tables are not reproducible from public first
principles here, so this module implements the same *index semantics* —
aperture-7 hex hierarchy, parent/child containment, k-ring neighborhoods,
cell <-> boundary — on a planar equirectangular (lon, lat) lattice instead
of the icosahedron. API mirrors h3-py (``latlng_to_cell``,
``cell_to_parent``, ``cell_to_children``, ``grid_disk``,
``cell_to_boundary``) and every hierarchy invariant is exact and tested.

Math: hex centers are the lattice Z[omega] (omega = e^{i*pi/3}) scaled per
resolution by the aperture-7 similarity c = 2 + omega (|c| = sqrt(7),
arg(c) = atan(sqrt(3)/5) — the classic Class-III rotation). Encoding a
point at resolution r multiplies by c^r and cube-rounds; the parent of a
cell is the cube-round of its coords divided by c, which is exact because
|A*e| = 1/sqrt(7) < 1/2, the hex Voronoi inradius — hence each parent has
exactly its center child plus that child's 6 neighbors.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15
# Base (res 0) hex size in degrees: circumradius of the lattice spacing.
BASE_SIZE_DEG = 10.0
_OMEGA = complex(0.5, np.sqrt(3.0) / 2.0)  # e^{i pi/3}
_C = 2.0 + _OMEGA  # aperture-7 similarity, |c|^2 = 7

_OFFSET = np.int64(1) << np.int64(29)
_MASK30 = np.uint64((1 << 30) - 1)

# axial unit-ring directions (q, r) in cube/axial coords
_RING_DIRS = [(1, 0), (0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1)]


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    if np.any((q < -_OFFSET) | (q >= _OFFSET) | (r < -_OFFSET) | (r >= _OFFSET)):
        raise OverflowError("hex axial coordinate out of 30-bit range")
    return (
        (np.uint64(res) << np.uint64(60))
        | ((q + _OFFSET).astype(np.uint64) << np.uint64(30))
        | (r + _OFFSET).astype(np.uint64)
    )


def _unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(60)).astype(np.int64)
    q = ((cell >> np.uint64(30)) & _MASK30).astype(np.int64) - _OFFSET
    r = (cell & _MASK30).astype(np.int64) - _OFFSET
    return res, q, r


def get_resolution(cell: np.ndarray) -> np.ndarray:
    return _unpack(cell)[0]


def latlng_to_cell(lng: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized (lon, lat) -> cell id (uint64) at resolution ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    w = (np.asarray(lng, dtype=np.float64) + 1j * np.asarray(lat, dtype=np.float64))
    zeta = w * (_C**res) / BASE_SIZE_DEG
    # solve zeta = q + r*omega over the reals
    rf = zeta.imag / _OMEGA.imag
    qf = zeta.real - rf * _OMEGA.real
    q, r = _cube_round(np.atleast_1d(qf), np.atleast_1d(rf))
    return _pack(res, q, r)


def cell_to_latlng(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell center -> (lng, lat) degrees."""
    res, q, r = _unpack(np.atleast_1d(cell))
    z = (q.astype(np.float64) + r.astype(np.float64) * _OMEGA) * BASE_SIZE_DEG
    w = z / (_C**res.astype(np.float64))
    return w.real, w.imag


def cell_to_parent(cell: np.ndarray, parent_res: int | None = None) -> np.ndarray:
    """Ancestor at ``parent_res`` (default: res-1)."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    res, q, r = _unpack(cell)
    if not np.all(res == res[0]):
        raise ValueError("mixed resolutions in one batch")
    cur = int(res[0])
    target = cur - 1 if parent_res is None else parent_res
    if target < 0 or target > cur:
        raise ValueError(f"invalid parent_res {target} for res {cur}")
    qf = q.astype(np.float64)
    rf = r.astype(np.float64)
    for _ in range(cur - target):
        # child -> parent axial: A = (1/7) [[3, 1], [-1, 2]]
        qf, rf = (3.0 * qf + rf) / 7.0, (-qf + 2.0 * rf) / 7.0
        qi, ri = _cube_round(qf, rf)
        qf, rf = qi.astype(np.float64), ri.astype(np.float64)
    return _pack(target, qf.astype(np.int64), rf.astype(np.int64))


def cell_to_center_child(cell: np.ndarray, child_res: int | None = None) -> np.ndarray:
    cell = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    res, q, r = _unpack(cell)
    cur = int(res[0])
    target = cur + 1 if child_res is None else child_res
    if target < cur or target > MAX_RES:
        raise ValueError(f"invalid child_res {target}")
    for _ in range(target - cur):
        # parent -> child axial: C = [[2, -1], [1, 3]]  (inverse of 7A)
        q, r = 2 * q - r, q + 3 * r
    return _pack(target, q, r)


def cell_to_children(cell: int) -> np.ndarray:
    """The 7 aperture-7 children: center child + its 6 neighbors (exact —
    see module docstring for the inradius argument)."""
    center = cell_to_center_child(np.asarray([cell], dtype=np.uint64))[0]
    res, q, r = _unpack(np.asarray([center], dtype=np.uint64))
    qs = [q[0]] + [q[0] + d[0] for d in _RING_DIRS]
    rs = [r[0]] + [r[0] + d[1] for d in _RING_DIRS]
    return _pack(int(res[0]), np.asarray(qs, dtype=np.int64), np.asarray(rs, dtype=np.int64))


def grid_disk(cell: int, k: int) -> np.ndarray:
    """All cells within hex distance k (the H3 ``grid_disk`` / k-ring)."""
    res, q0, r0 = _unpack(np.asarray([cell], dtype=np.uint64))
    qs = [int(q0[0])]
    rs = [int(r0[0])]
    for ring in range(1, k + 1):
        q = int(q0[0]) + _RING_DIRS[4][0] * ring  # start at direction 4, walk the ring
        r = int(r0[0]) + _RING_DIRS[4][1] * ring
        for d in range(6):
            for _ in range(ring):
                qs.append(q)
                rs.append(r)
                q += _RING_DIRS[d][0]
                r += _RING_DIRS[d][1]
    return _pack(int(res[0]), np.asarray(qs, dtype=np.int64), np.asarray(rs, dtype=np.int64))


def grid_distance(a: int, b: int) -> int:
    """Hex lattice distance between two same-res cells."""
    ra, qa, sa = _unpack(np.asarray([a], dtype=np.uint64))
    rb, qb, sb = _unpack(np.asarray([b], dtype=np.uint64))
    if ra[0] != rb[0]:
        raise ValueError("cells must share a resolution")
    dq = int(qa[0] - qb[0])
    dr = int(sa[0] - sb[0])
    return max(abs(dq), abs(dr), abs(-dq - dr))


def cell_to_boundary(cell: int) -> np.ndarray:
    """(6, 2) array of hex corner (lng, lat): the Voronoi hexagon of the
    lattice at the cell's resolution (circumradius 1/sqrt(3) of spacing)."""
    res, q, r = _unpack(np.asarray([cell], dtype=np.uint64))
    center = (float(q[0]) + float(r[0]) * _OMEGA) * BASE_SIZE_DEG / (_C ** int(res[0]))
    spacing = BASE_SIZE_DEG / abs(_C) ** int(res[0])
    rot = (_C / abs(_C)) ** (-int(res[0]))  # cumulative Class-III rotation
    corners = []
    for k in range(6):
        ang = np.pi / 6.0 + k * np.pi / 3.0  # corners at 30 + k*60 degrees
        corner = center + rot * (spacing / np.sqrt(3.0)) * np.exp(1j * ang)
        corners.append((corner.real, corner.imag))
    return np.asarray(corners, dtype=np.float64)


def cells_contain(parents: np.ndarray, descendants: np.ndarray) -> np.ndarray:
    """Vectorized: is ``parents[i]`` an ancestor of ``descendants[i]``?"""
    pres = get_resolution(np.atleast_1d(parents))
    anc = cell_to_parent(np.atleast_1d(descendants), int(pres[0]))
    return anc == np.atleast_1d(np.asarray(parents, dtype=np.uint64))


#: axial ring-1 offsets in PACKED cell space: (dq, dr) -> dq·2³⁰ + dr.
#: Valid because _pack is linear in (q, r) at fixed res and ring-1 steps
#: never cross the 30-bit field boundary for in-range cells.
RING1_PACKED_OFFSETS = np.array(
    [
        0,  # ( 0,  0) self
        1 << 30,  # ( 1,  0)
        (1 << 30) - 1,  # ( 1, -1)
        -1,  # ( 0, -1)
        -(1 << 30),  # (-1,  0)
        -(1 << 30) + 1,  # (-1,  1)
        1,  # ( 0,  1)
    ],
    dtype=np.int64,
)


def ring1_neighbors_packed(cells: np.ndarray) -> np.ndarray:
    """(n, 7) packed cell ids: each cell and its six axial neighbors —
    the stencil for ring-1 smoothing / convolution over the hex grid.
    Pure packed-space adds (offset table above), no unpack round-trip;
    column j of the result uses RING1_PACKED_OFFSETS[j]."""
    c = np.asarray(cells).astype(np.int64)
    return c[:, None] + RING1_PACKED_OFFSETS[None, :]
