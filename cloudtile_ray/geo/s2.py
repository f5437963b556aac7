"""S2 cell ids from scratch (public S2 geometry algorithm), vectorized.

Implements the published S2 scheme: lat/lng -> unit sphere XYZ -> cube face
-> (u,v) -> quadratic (s,t) transform -> 30-bit (i,j) -> face-local Hilbert
curve position -> 64-bit cell id ``face(3b) | position(2*level b) | 1-bit
sentinel`` with the standard trailing-bit truncation per level. Parent /
child / level / containment all derive from id arithmetic, so the
hierarchy invariants are exact.

Required by the north rule ("encoded to H3 cells and S2 cell IDs at
configurable zoom/resolution"); the reference itself has no cell indexing —
its spatial semantics live in the tippecanoe options it drives
(/root/reference/src/cloudtile/tippecanoe.yaml).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30

# Hilbert sub-cell orderings (public S2 constants): orientation is a 2-bit
# state (swap | invert). kPosToIJ[orient][pos] -> ij; derived inverse below.
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.int64,
)
_SWAP_MASK, _INVERT_MASK = 1, 2
_POS_TO_ORIENTATION = np.array(
    [_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK], dtype=np.int64
)
# flattened lookup tables indexed by orient*4 + ij / orient*4 + pos
_IJ_TO_POS = np.zeros(16, dtype=np.int64)
_NEXT_ORIENT_FROM_IJ = np.zeros(16, dtype=np.int64)
_NEXT_ORIENT_FROM_POS = np.zeros(16, dtype=np.int64)
for _o in range(4):
    for _pos in range(4):
        _ij = _POS_TO_IJ[_o, _pos]
        _IJ_TO_POS[_o * 4 + _ij] = _pos
        _no = _o ^ _POS_TO_ORIENTATION[_pos]
        _NEXT_ORIENT_FROM_IJ[_o * 4 + _ij] = _no
        _NEXT_ORIENT_FROM_POS[_o * 4 + _pos] = _no


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, ...]:
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat_r)
    return np.cos(lon_r) * cl, np.sin(lon_r) * cl, np.sin(lat_r)


def xyz_to_face_uv(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        for f, (un, ud, vn, vd) in enumerate(
            [
                (y, x, z, x),  # face 0: +x
                (-x, y, z, y),  # face 1: +y
                (-x, z, -y, z),  # face 2: +z
                (z, x, y, x),  # face 3: -x  (u=z/-x -> -z/x ... standard)
                (z, y, -x, y),  # face 4: -y
                (-y, z, -x, z),  # face 5: -z
            ]
        ):
            m = face == f
            u[m] = (un[m] / ud[m])
            v[m] = (vn[m] / vd[m])
    return face, u, v


_FACE_UV_TO_XYZ = [
    lambda u, v: (np.ones_like(u), u, v),
    lambda u, v: (-u, np.ones_like(u), v),
    lambda u, v: (-u, -v, np.ones_like(u)),
    lambda u, v: (-np.ones_like(u), -v, -u),
    lambda u, v: (v, -np.ones_like(u), -u),
    lambda u, v: (v, u, -np.ones_like(u)),
]


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (area-uniformizing)."""
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def lonlat_to_cell(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """Vectorized lon/lat (degrees) -> S2 cell id (uint64) at ``level``."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    lim = np.int64((1 << MAX_LEVEL) - 1)
    i = np.clip((uv_to_st(u) * (1 << MAX_LEVEL)).astype(np.int64), 0, lim)
    j = np.clip((uv_to_st(v) * (1 << MAX_LEVEL)).astype(np.int64), 0, lim)
    # Hilbert position, 30 quad-digits from the top bit down; orientation is
    # data-dependent -> flat table lookups per iteration (30 x O(n))
    orient = face & _SWAP_MASK
    pos = np.zeros(len(np.atleast_1d(face)), dtype=np.uint64)
    i = np.atleast_1d(i)
    j = np.atleast_1d(j)
    orient = np.atleast_1d(orient).astype(np.int64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        idx = orient * 4 + ij
        pos = (pos << np.uint64(2)) | _IJ_TO_POS[idx].astype(np.uint64)
        orient = _NEXT_ORIENT_FROM_IJ[idx]
    cid = (
        (np.atleast_1d(face).astype(np.uint64) << np.uint64(2 * MAX_LEVEL + 1))
        | (pos << np.uint64(1))
        | np.uint64(1)
    )
    if level < MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
        cid = (cid & (~(lsb - np.uint64(1)))) | lsb
    return cid


def cell_level(cid: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    cid = np.atleast_1d(np.asarray(cid, dtype=np.uint64))
    lsb = cid & (~cid + np.uint64(1))
    # log2 of lsb via float conversion is exact for powers of two < 2^64
    shift = np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)
    return MAX_LEVEL - (shift >> 1)


def parent(cid: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at ``level`` (id-arithmetic truncation -> exact prefix
    containment: ``contains(parent(c, l), c)`` always holds)."""
    cid = np.asarray(cid, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (cid & (~(lsb - np.uint64(1)))) | lsb


def contains(ancestor: np.ndarray, descendant: np.ndarray) -> np.ndarray:
    """Range containment: a cell covers the id interval [id-lsb+1, id+lsb-1]."""
    a = np.asarray(ancestor, dtype=np.uint64)
    d = np.asarray(descendant, dtype=np.uint64)
    lsb = a & (~a + np.uint64(1))
    return ((a - lsb) <= d) & (d <= (a + lsb - np.uint64(1)))


def children(cid: int) -> np.ndarray:
    """The 4 direct children of a scalar cell id."""
    cid = np.uint64(cid)
    lsb = cid & (~cid + np.uint64(1))
    q = lsb >> np.uint64(2)
    if q == 0:
        raise ValueError("leaf cell has no children")
    return np.array(
        [cid - lsb + q + np.uint64(2) * np.uint64(k) * q for k in range(4)],
        dtype=np.uint64,
    )


def cell_to_lonlat(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell center (degrees). Inverse of the encode chain."""
    cid = np.atleast_1d(np.asarray(cid, dtype=np.uint64))
    face = (cid >> np.uint64(2 * MAX_LEVEL + 1)).astype(np.int64)
    pos = (cid & ((np.uint64(1) << np.uint64(2 * MAX_LEVEL + 1)) - np.uint64(1))) >> np.uint64(1)
    level = cell_level(cid)
    i = np.zeros(cid.shape, dtype=np.int64)
    j = np.zeros(cid.shape, dtype=np.int64)
    orient = (face & _SWAP_MASK).astype(np.int64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        digit = ((pos >> np.uint64(2 * k)) & np.uint64(3)).astype(np.int64)
        active = (MAX_LEVEL - 1 - k) < level  # only digits above the sentinel
        idx = orient * 4 + digit
        ij = _POS_TO_IJ[orient, digit]
        i = np.where(active, (i << 1) | (ij >> 1), i << 1)
        j = np.where(active, (j << 1) | (ij & 1), j << 1)
        orient = np.where(active, _NEXT_ORIENT_FROM_POS[idx], orient)
    # center of the covered ij block
    half = (np.int64(1) << np.int64(MAX_LEVEL)) >> (level + np.int64(1))
    half = np.maximum(half, 0)
    ic = i + np.where(level < MAX_LEVEL, half, 0)
    jc = j + np.where(level < MAX_LEVEL, half, 0)
    s = (ic.astype(np.float64) + 0.5) / float(1 << MAX_LEVEL)
    t = (jc.astype(np.float64) + 0.5) / float(1 << MAX_LEVEL)
    u = st_to_uv(s)
    v = st_to_uv(t)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f in range(6):
        m = face == f
        if m.any():
            xf, yf, zf = _FACE_UV_TO_XYZ[f](u[m], v[m])
            x[m], y[m], z[m] = xf, yf, zf
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / norm))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat
