"""Spherical icosahedral aperture-7 hex index — the H3-class cell index
on the real sphere (no planar distortion, no dateline seam, poles work).

Built from public first principles only: the regular icosahedron (golden
ratio vertex coordinates), gnomonic projection per face, and the same
aperture-7 hex lattice math as ``cloudtile_ray.geo.hexgrid``.  It follows
H3's *construction* (icosahedron faces + gnomonic projection + aperture-7
hierarchy, per the public H3 documentation) but does NOT reproduce h3-py
cell ids: the 122-base-cell numbering and face orientation tables of the
H3 library are not derivable in this sandbox, and no h3 binary exists
here to golden-test against (COVERAGE.md §2.1).  What IS exact and
tested: point->cell determinism, parent/child aperture-7 hierarchy
(every cell = center child + its 6 neighbors), round-trip
cell->center->cell, ring sizes, and cross-face/pole/dateline encoding.

Layout of a cell id (uint64)::

    [res:4 bits 55-58][face:5 bits 50-54][q+2^24:25 bits 25-49][r+2^24:25 bits 0-24]

Faces are the 20 icosahedron triangles, numbered by sorted vertex
triples; each has a fixed orthonormal tangent basis.  A point encodes on
the face whose center is nearest (max dot product) — deterministic and
total, so the index is a true partition of the sphere at every
resolution even though lattice cells near face edges never cross into a
neighboring face's lattice.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15
BASE_SPACING = 0.4  # res-0 lattice spacing in gnomonic units (face tan-radius ~0.764)
_OMEGA = complex(0.5, np.sqrt(3.0) / 2.0)
_C = 2.0 + _OMEGA  # aperture-7 similarity, |c|^2 = 7

_OFF = np.int64(1 << 24)
_MASK25 = np.uint64((1 << 25) - 1)
_RING_DIRS = [(1, 0), (0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1)]


def _build_icosahedron() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    verts = []
    for a, b in [(1.0, phi)]:
        for s1 in (-1, 1):
            for s2 in (-1, 1):
                verts.append((0.0, s1 * a, s2 * b))
                verts.append((s1 * a, s2 * b, 0.0))
                verts.append((s1 * b, 0.0, s2 * a))
    V = np.asarray(verts, dtype=np.float64)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    dots = V @ V.T
    np.fill_diagonal(dots, -2.0)
    adj_dot = dots.max()  # edge-neighbor cosine
    adj = dots > adj_dot - 1e-9
    faces = []
    for i in range(12):
        for j in range(i + 1, 12):
            if not adj[i, j]:
                continue
            for k in range(j + 1, 12):
                if adj[i, k] and adj[j, k]:
                    faces.append((i, j, k))
    faces.sort()
    assert len(faces) == 20, len(faces)
    C = np.empty((20, 3))
    E1 = np.empty((20, 3))
    E2 = np.empty((20, 3))
    for f, (i, j, k) in enumerate(faces):
        c = V[i] + V[j] + V[k]
        c /= np.linalg.norm(c)
        e1 = V[i] - np.dot(V[i], c) * c
        e1 /= np.linalg.norm(e1)
        C[f] = c
        E1[f] = e1
        E2[f] = np.cross(c, e1)
    return V, C, E1, E2


_VERTS, _CENTERS, _E1, _E2 = _build_icosahedron()


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


def _pack(res: int, face: np.ndarray, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    if np.any((q < -_OFF) | (q >= _OFF) | (r < -_OFF) | (r >= _OFF)):
        raise OverflowError("icosa axial coordinate out of 25-bit range")
    return (
        (np.uint64(res) << np.uint64(55))
        | (face.astype(np.uint64) << np.uint64(50))
        | ((q + _OFF).astype(np.uint64) << np.uint64(25))
        | (r + _OFF).astype(np.uint64)
    )


def _unpack(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    cell = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    res = (cell >> np.uint64(55)).astype(np.int64) & np.int64(0xF)
    face = (cell >> np.uint64(50)).astype(np.int64) & np.int64(0x1F)
    q = ((cell >> np.uint64(25)) & _MASK25).astype(np.int64) - _OFF
    r = (cell & _MASK25).astype(np.int64) - _OFF
    return res, face, q, r


def get_resolution(cell) -> np.ndarray:
    return _unpack(cell)[0]


def get_face(cell) -> np.ndarray:
    return _unpack(cell)[1]


def _lonlat_to_xyz(lng: np.ndarray, lat: np.ndarray) -> np.ndarray:
    lam = np.radians(np.asarray(lng, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    return np.stack([cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)], axis=1)


def _xyz_to_lonlat(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lng = np.degrees(np.arctan2(v[:, 1], v[:, 0]))
    lat = np.degrees(np.arcsin(np.clip(v[:, 2], -1.0, 1.0)))
    return lng, lat


def _round_in_face(v: np.ndarray, face: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Gnomonic-project points onto the given faces' tangent planes and
    cube-round to the res lattice."""
    c = _CENTERS[face]
    d = np.einsum("ij,ij->i", v, c)
    p = v / d[:, None]
    t = p - c
    x = np.einsum("ij,ij->i", t, _E1[face])
    y = np.einsum("ij,ij->i", t, _E2[face])
    zeta = (x + 1j * y) * (_C**res) / BASE_SPACING
    rf = zeta.imag / _OMEGA.imag
    qf = zeta.real - rf * _OMEGA.real
    return _cube_round(qf, rf)


def _center_xyz(face: np.ndarray, q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    z = (q.astype(np.float64) + r.astype(np.float64) * _OMEGA) * BASE_SPACING
    w = z / (_C**res)
    v = _CENTERS[face] + w.real[:, None] * _E1[face] + w.imag[:, None] * _E2[face]
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def latlng_to_cell(lng, lat, res: int) -> np.ndarray:
    """Vectorized (lon, lat) -> icosahedral cell id at ``res``.

    Canonical face ownership: the point first rounds on its nearest face;
    if the resulting lattice cell's center lies beyond that face's
    territory (nearest face of the center differs — happens for cells
    straddling a face edge), the point re-rounds on the center's owning
    face.  One pass reaches a fixpoint for all but a vanishing boundary
    sliver (tested), giving near-universal cell->center->cell stability
    like real H3's canonical base-cell ownership."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    v = _lonlat_to_xyz(np.atleast_1d(lng), np.atleast_1d(lat))
    face = np.argmax(v @ _CENTERS.T, axis=1)
    q, r = _round_in_face(v, face, res)
    for _ in range(2):  # canonicalization passes (fixpoint almost surely)
        ctr = _center_xyz(face, q, r, res)
        owner = np.argmax(ctr @ _CENTERS.T, axis=1)
        moved = owner != face
        if not moved.any():
            break
        face = np.where(moved, owner, face)
        q2, r2 = _round_in_face(v[moved], face[moved], res)
        q[moved] = q2
        r[moved] = r2
    return _pack(res, face, q, r)


def cell_to_latlng(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell center -> (lng, lat) degrees (inverse gnomonic of the lattice
    point, back onto the sphere)."""
    res, face, q, r = _unpack(cell)
    if not np.all(res == res[0]):
        raise ValueError("mixed resolutions in one batch")
    z = (q.astype(np.float64) + r.astype(np.float64) * _OMEGA) * BASE_SPACING
    w = z / (_C ** int(res[0]))
    v = (
        _CENTERS[face]
        + w.real[:, None] * _E1[face]
        + w.imag[:, None] * _E2[face]
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return _xyz_to_lonlat(v)


def cell_to_parent(cell, parent_res: int | None = None) -> np.ndarray:
    """Ancestor at ``parent_res`` (default res-1) — same face, aperture-7
    axial contraction (exact; see hexgrid docstring for the inradius
    argument)."""
    res, face, q, r = _unpack(cell)
    if not np.all(res == res[0]):
        raise ValueError("mixed resolutions in one batch")
    cur = int(res[0])
    target = cur - 1 if parent_res is None else parent_res
    if target < 0 or target > cur:
        raise ValueError(f"invalid parent_res {target} for res {cur}")
    qf = q.astype(np.float64)
    rf = r.astype(np.float64)
    for _ in range(cur - target):
        qf, rf = (3.0 * qf + rf) / 7.0, (-qf + 2.0 * rf) / 7.0
        qi, ri = _cube_round(qf, rf)
        qf, rf = qi.astype(np.float64), ri.astype(np.float64)
    return _pack(target, face, qf.astype(np.int64), rf.astype(np.int64))


def cell_to_center_child(cell, child_res: int | None = None) -> np.ndarray:
    res, face, q, r = _unpack(cell)
    cur = int(res[0])
    target = cur + 1 if child_res is None else child_res
    if target < cur or target > MAX_RES:
        raise ValueError(f"invalid child_res {target}")
    for _ in range(target - cur):
        q, r = 2 * q - r, q + 3 * r
    return _pack(target, face, q, r)


def cell_to_children(cell: int) -> np.ndarray:
    """The 7 aperture-7 children: center child + its 6 lattice neighbors."""
    center = cell_to_center_child(np.asarray([cell], dtype=np.uint64))[0]
    res, face, q, r = _unpack(np.asarray([center], dtype=np.uint64))
    qs = [q[0]] + [q[0] + d[0] for d in _RING_DIRS]
    rs = [r[0]] + [r[0] + d[1] for d in _RING_DIRS]
    return _pack(
        int(res[0]),
        np.full(7, face[0], dtype=np.int64),
        np.asarray(qs, dtype=np.int64),
        np.asarray(rs, dtype=np.int64),
    )


def grid_disk(cell: int, k: int) -> np.ndarray:
    """All same-face cells within hex distance k.  NOTE: near a face edge
    the true spherical neighborhood continues onto the adjacent face; this
    disk covers only the cell's own face lattice (documented caveat — use
    ``hexgrid`` for the kNN ring-search, whose coverage proof needs
    complete disks)."""
    res, face, q0, r0 = _unpack(np.asarray([cell], dtype=np.uint64))
    qs = [int(q0[0])]
    rs = [int(r0[0])]
    for ring in range(1, k + 1):
        q = int(q0[0]) + _RING_DIRS[4][0] * ring
        r = int(r0[0]) + _RING_DIRS[4][1] * ring
        for d in range(6):
            for _ in range(ring):
                qs.append(q)
                rs.append(r)
                q += _RING_DIRS[d][0]
                r += _RING_DIRS[d][1]
    return _pack(
        int(res[0]),
        np.full(len(qs), face[0], dtype=np.int64),
        np.asarray(qs, dtype=np.int64),
        np.asarray(rs, dtype=np.int64),
    )


# angular circumradius of a face (face center -> farthest vertex), radians
_FACE_CIRCUM_RAD = float(
    np.arccos(np.clip((_CENTERS @ _VERTS.T).min(axis=1), -1, 1)).max()
)
# gnomonic->angular distortion bound inside a face + slack (1/cos^2 at the
# farthest relevant angle, capped at 45 deg)
_GNOMONIC_DISTORT = 2.2


def spacing_angle_deg(res: int) -> float:
    """Angular lattice spacing (degrees) at ``res`` near a face center —
    the minimum; spacing grows away from the center under the gnomonic
    projection, so this is the conservative figure for coverage maths."""
    return float(np.degrees(np.arctan(BASE_SPACING / abs(_C) ** res)))


def cell_circum_deg(res: int) -> float:
    """Upper bound (degrees) on the angular distance from any res-cell's
    center to the farthest point of the cell: one lattice spacing at the
    face center x the gnomonic distortion bound."""
    return spacing_angle_deg(res) * _GNOMONIC_DISTORT


def cells_in_cap(lng: float, lat: float, cover_radius_deg: float, res: int) -> np.ndarray:
    """CROSS-FACE cap enumeration (VERDICT.md r2 #8): every cell id that
    ``latlng_to_cell`` can emit for ANY point within ``cover_radius_deg``
    of (lng, lat) is in the returned set — across face boundaries, at the
    poles and over the dateline.

    Guarantee (the kNN ring-search coverage proof): a point u within the
    cap maps to a cell whose center is within ``cell_circum_deg(res)`` of
    u, hence within cap_radius = cover + circum of the query; every face
    whose territory can hold such a center is visited, and on each face
    the lattice is enumerated out to the gnomonic image of the cap with
    the distortion bound — a deliberate SUPERSET (no ownership filter:
    boundary-sliver cells that canonicalization leaves on a neighboring
    face are enumerated from that face's lattice directly)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    v = _lonlat_to_xyz(np.asarray([lng]), np.asarray([lat]))[0]
    circ = np.radians(cell_circum_deg(res))
    cap = np.radians(cover_radius_deg) + circ
    # faces whose circumcap intersects the search cap
    cos_need = np.cos(min(np.pi, cap + _FACE_CIRCUM_RAD))
    faces = np.nonzero(_CENTERS @ v >= cos_need)[0]
    spacing_g = BASE_SPACING / abs(_C) ** res
    out = []
    for f in faces.tolist():
        d = float(v @ _CENTERS[f])
        if d <= 0.2:  # cap center behind/along this face's horizon: the
            # face is only reachable when the cap is huge — enumerate the
            # whole face territory instead of projecting the far point
            x = y = 0.0
            g_rad = np.tan(_FACE_CIRCUM_RAD) + (
                min(cap, np.pi / 2 * 0.98) * _GNOMONIC_DISTORT
            )
        else:
            p = v / d - _CENTERS[f]
            x = float(p @ _E1[f])
            y = float(p @ _E2[f])
            g_rad = min(cap, np.pi / 2 * 0.98) * _GNOMONIC_DISTORT
        # axial coords of the projected cap center on face f's lattice —
        # the SAME transform as _round_in_face: the res-r lattice is the
        # base lattice scaled and ROTATED by the complex similarity C^res
        zeta = (x + 1j * y) * (_C**res) / BASE_SPACING
        rf = zeta.imag / _OMEGA.imag
        qf = zeta.real - rf * _OMEGA.real
        M = int(np.ceil(g_rad / spacing_g)) + 2
        q0, r0 = int(round(qf)), int(round(rf))
        qq, rr = np.meshgrid(
            np.arange(q0 - M, q0 + M + 1), np.arange(r0 - M, r0 + M + 1)
        )
        qq = qq.ravel().astype(np.int64)
        rr = rr.ravel().astype(np.int64)
        # hex-metric prune of the square enumeration (cheap)
        dq, dr = qq - q0, rr - r0
        hexd = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
        keep = hexd <= M
        qq, rr = qq[keep], rr[keep]
        ctr = _center_xyz(np.full(len(qq), f, dtype=np.int64), qq, rr, res)
        near = ctr @ v >= np.cos(cap)
        if near.any():
            out.append(
                _pack(res, np.full(int(near.sum()), f, dtype=np.int64), qq[near], rr[near])
            )
    if not out:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(out))


def grid_disk_cross(cell: int, k: int) -> np.ndarray:
    """Cross-face grid disk: all cells (any face) within ~k lattice steps
    of ``cell`` — the spherical-cap formulation of :func:`grid_disk`, with
    no same-face caveat.  Radius = k x the angular spacing plus one cell
    circumradius of slack."""
    res = int(get_resolution(np.asarray([cell], dtype=np.uint64))[0])
    lng, lat = cell_to_latlng(np.asarray([cell], dtype=np.uint64))
    radius = k * spacing_angle_deg(res) + cell_circum_deg(res)
    return cells_in_cap(float(lng[0]), float(lat[0]), radius, res)


def cells_contain(parents, descendants) -> np.ndarray:
    """Vectorized: is ``parents[i]`` an ancestor of ``descendants[i]``?"""
    pres = get_resolution(np.atleast_1d(parents))
    anc = cell_to_parent(np.atleast_1d(descendants), int(pres[0]))
    return anc == np.atleast_1d(np.asarray(parents, dtype=np.uint64))
