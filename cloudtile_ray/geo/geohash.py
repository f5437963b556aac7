"""Geohash (Niemeyer 2008, public domain) cell keys over quantized
lon/lat — the third public cell-index family next to the planar hexgrid
and the spherical icosa grid (and the string-keyed cousin of
``geo/zorder.py``'s integer Morton keys: geohash IS a Morton key,
base32-encoded MSB-first with longitude taking the even bit positions).

A shared prefix of length p is exactly one geohash cell at precision p,
so ``groupby(geohash)`` is a spatial histogram and prefix ranges are
shard boundaries — same scale role as the z-cell, but with the
interoperable string representation every public geo stack understands.

Encode is pure integer arithmetic: quantize each axis to its bit budget
(successive-bisection cell index = one floor division), spread bits with
the binary-magic-number passes, interleave, then slice 5-bit groups into
the base32 alphabet.  All branch-free and vectorized; a SQL oracle
replays it with the same unrolled shift/mask terms plus ``substr`` into
the alphabet string.

Beyond-the-reference operator (the reference has no cell indexing at
all; its spatial keys are tippecanoe-internal tile ids,
/root/reference/src/cloudtile/tippecanoe.py).
"""

from __future__ import annotations

import numpy as np

#: standard geohash base32 (no a, i, l, o)
ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

#: default precision: 5 chars = 25 bits (13 lon + 12 lat), cells ~4.9 km
PRECISION = 5


def spread_bits_16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each lane into the even positions of a
    32-bit lane (Morton interleave-by-magic-numbers, 4 passes)."""
    v = v.astype(np.uint32) & np.uint32(0xFFFF)
    v = (v | (v << np.uint32(8))) & np.uint32(0x00FF00FF)
    v = (v | (v << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    v = (v | (v << np.uint32(2))) & np.uint32(0x33333333)
    v = (v | (v << np.uint32(1))) & np.uint32(0x55555555)
    return v


def geohash_keys_mi(
    lon_mi: np.ndarray, lat_mi: np.ndarray, precision: int = PRECISION
) -> np.ndarray:
    """Integer geohash key (the raw ``5·precision``-bit interleave) of
    integer milli-degree coordinates.  Longitude occupies the even bit
    positions counting from the MSB (bit ``5p-1``), latitude the odd —
    the geohash bit order.  Domain: lon_mi ∈ [-180000, 180000),
    lat_mi ∈ [-90000, 90000)."""
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    if lon_bits > 16 or lat_bits > 16:
        raise ValueError(f"precision {precision} exceeds the 16-bit spread")
    x = lon_mi.astype(np.int64) + 180_000
    y = lat_mi.astype(np.int64) + 90_000
    cx = ((x << lon_bits) // 360_000).astype(np.uint32)
    cy = ((y << lat_bits) // 180_000).astype(np.uint32)
    key = spread_bits_16(cx).astype(np.int64) << np.int64(
        1 if lon_bits == lat_bits else 0
    )
    key |= spread_bits_16(cy).astype(np.int64) << np.int64(
        0 if lon_bits == lat_bits else 1
    )
    return key


def geohash_strings_mi(
    lon_mi: np.ndarray, lat_mi: np.ndarray, precision: int = PRECISION
) -> np.ndarray:
    """Geohash strings of integer milli-degree coordinates: the key's
    5-bit groups MSB-first through the base32 alphabet.  One (n, p)
    uint8 gather + a fixed-width bytes view — no per-row Python."""
    key = geohash_keys_mi(lon_mi, lat_mi, precision)
    lut = np.frombuffer(ALPHABET.encode("ascii"), dtype=np.uint8)
    shifts = np.arange(precision - 1, -1, -1, dtype=np.int64) * 5
    groups = (key[:, None] >> shifts[None, :]) & np.int64(31)
    chars = lut[groups]  # (n, precision) uint8
    return (
        np.ascontiguousarray(chars).view(f"S{precision}").reshape(-1).astype(str)
    )
