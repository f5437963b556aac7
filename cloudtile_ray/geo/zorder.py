"""Morton (Z-order) curve keys over quantized lon/lat.

Z-order interleaves the bits of the two grid coordinates so that keys
close on the curve are (mostly) close in space — the classic
locality-preserving linearization used to range-partition spatial data:
a z-key prefix of 2k bits is exactly one square of the 2^k × 2^k grid,
so ``groupby(zcell)`` doubles as a spatial histogram and contiguous
z-ranges double as shard boundaries for a range-partitioned write.
Hilbert ordering (which the PMTiles writer uses for tile ids,
``state/archive.py``) has strictly better locality; Morton's advantage
is the trivial branch-free encode — three shift-mask passes per axis —
cheap enough to stamp on every row of a corpus-scale stream inside
``map_batches``.

Beyond-the-reference operator (the reference's only spatial ordering is
tippecanoe-internal, /root/reference/src/cloudtile/tippecanoe.py); the
parallel bit-spread is the standard public technique (Morton 1966;
"Bit Twiddling Hacks" interleave-by-binary-magic-numbers).
"""

from __future__ import annotations

import numpy as np

#: grid resolution: bits per axis (cells = 2^BITS × 2^BITS, key < 2^(2·BITS)).
#: The spread kernel below is hardwired to 8-bit lanes; CELLS is derived so
#: the quantizer can't drift from it.
BITS = 8
CELLS = 1 << BITS  # cells per axis


def spread_bits_8(v: np.ndarray) -> np.ndarray:
    """Spread the low 8 bits of each lane: abcdefgh → 0a0b0c0d0e0f0g0h."""
    v = v.astype(np.uint32)
    v = (v | (v << np.uint32(4))) & np.uint32(0x0F0F)
    v = (v | (v << np.uint32(2))) & np.uint32(0x3333)
    v = (v | (v << np.uint32(1))) & np.uint32(0x5555)
    return v


def morton_key_8(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """16-bit Morton key from two 8-bit cell coordinates (x in the even
    bits, y in the odd bits)."""
    return (spread_bits_8(cx) | (spread_bits_8(cy) << np.uint32(1))).astype(
        np.int64
    )


def zorder_cells_mi(lon_mi: np.ndarray, lat_mi: np.ndarray) -> np.ndarray:
    """Z-cell of integer milli-degree coordinates on the 256×256 global
    grid.  Pure integer quantization (``(x·256) // span``), so a SQL
    oracle replays it exactly with ``//`` + unrolled shift/mask terms —
    no float enters the key.  Domain: lon_mi ∈ [-180000, 180000),
    lat_mi ∈ [-90000, 90000) (the generator's range; out-of-range input
    would need a clip the SQL replay does not perform)."""
    x = lon_mi.astype(np.int64) + 180_000
    y = lat_mi.astype(np.int64) + 90_000
    cx = ((x * CELLS) // 360_000).astype(np.uint32)
    cy = ((y * CELLS) // 180_000).astype(np.uint32)
    return morton_key_8(cx, cy)
