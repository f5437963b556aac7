"""WebMercator (EPSG:3857) XYZ tile math — vectorized numpy.

This is the engine's native replacement for the tile addressing tippecanoe
performs internally when cloudtile shells out to it
(/root/reference/src/cloudtile/geofile.py:193-236); the zoom-ladder options
it drives are declared at /root/reference/src/cloudtile/tippecanoe.yaml:25-29.

The formulas are kept in the exact operation order used by the DuckDB
correctness oracles (__ray_entry__.oracle_sql) so integer tile outputs
match bit-for-bit:

    x = floor((lon + 180) / 360 * 2^z)
    y = floor((1 - ln(tan(lat_rad) + 1/cos(lat_rad)) / pi) / 2 * 2^z)

both clamped to [0, 2^z - 1].
"""

from __future__ import annotations

import numpy as np

# WebMercator latitude limit: atan(sinh(pi)) in degrees.
MAX_LAT = 85.05112878
MIN_LAT = -85.05112878

# Default in-tile pixel grid (tippecanoe full-detail default: 2^12 = 4096;
# cf. tippecanoe.yaml:30-33 full-detail/low-detail/minimum-detail).
DEFAULT_EXTENT = 4096


def lonlat_to_tile(
    lon: np.ndarray, lat: np.ndarray, z: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized lon/lat (degrees) -> XYZ tile (x, y) at zoom ``z``."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.float64(1 << z)
    x = np.floor((lon + 180.0) / 360.0 * n)
    lat_rad = np.radians(np.clip(lat, MIN_LAT, MAX_LAT))
    y = np.floor((1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n)
    hi = np.float64((1 << z) - 1)
    x = np.clip(x, 0.0, hi).astype(np.int64)
    y = np.clip(y, 0.0, hi).astype(np.int64)
    return x, y


def lonlat_to_pixel(
    lon: np.ndarray, lat: np.ndarray, z: int, extent: int = DEFAULT_EXTENT
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized lon/lat -> (tile_x, tile_y, px, py) where (px, py) is the
    position inside the tile on an ``extent``-sized grid (tile-local
    quantization, the analog of tippecanoe's detail setting)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.float64(1 << z)
    fx = (lon + 180.0) / 360.0 * n
    lat_rad = np.radians(np.clip(lat, MIN_LAT, MAX_LAT))
    fy = (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n
    hi = np.float64((1 << z) - 1)
    tx = np.clip(np.floor(fx), 0.0, hi)
    ty = np.clip(np.floor(fy), 0.0, hi)
    px = np.clip(((fx - tx) * extent).astype(np.int64), 0, extent - 1)
    py = np.clip(((fy - ty) * extent).astype(np.int64), 0, extent - 1)
    return tx.astype(np.int64), ty.astype(np.int64), px, py


def tile_bounds(z: int, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, ...]:
    """(west, south, east, north) degree bounds of tiles at zoom ``z``."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = np.float64(1 << z)
    west = x / n * 360.0 - 180.0
    east = (x + 1.0) / n * 360.0 - 180.0
    north = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / n))))
    south = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (y + 1.0) / n))))
    return west, south, east, north


def tile_key(z, x, y) -> np.ndarray:
    """Pack (z, x, y) into one uint64 shuffle key: ``z<<58 | x<<29 | y``.
    Valid for z <= 29 (x, y < 2^29). This is the groupby key of the tile
    build shuffle (SURVEY.md §7.4)."""
    z = np.asarray(z, dtype=np.uint64)
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    return (z << np.uint64(58)) | (x << np.uint64(29)) | y


def unpack_tile_key(key: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    key = np.asarray(key, dtype=np.uint64)
    z = (key >> np.uint64(58)).astype(np.int64)
    x = ((key >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(np.int64)
    y = (key & np.uint64((1 << 29) - 1)).astype(np.int64)
    return z, x, y


def pixel_size_degrees(z: int, extent: int = DEFAULT_EXTENT) -> float:
    """Longitude degrees per in-tile pixel at zoom ``z`` — the unit of the
    simplification tolerance ladder (``simplification`` setting x pixel
    size; tippecanoe.yaml:69-77)."""
    return 360.0 / float((1 << z) * extent)


def hilbert_xy2d(order_bits: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized Hilbert curve distance of integer (x, y) on a
    2^order_bits grid (classic Wikipedia xy2d) — used for the ``hilbert``
    in-tile feature ordering (tippecanoe.yaml:89) and archive layout."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros(x.shape, dtype=np.int64)
    s = np.int64(1 << (order_bits - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        flip = ry == 0
        inv = flip & (rx == 1)
        x2 = np.where(inv, s - 1 - x, x)
        y2 = np.where(inv, s - 1 - y, y)
        x, y = np.where(flip, y2, x2), np.where(flip, x2, y2)
        s >>= 1
    return d


def guess_zoom_for_density(n_features: int, max_features_per_tile: int = 20000) -> int:
    """A cheap ``-zg`` ("guess maximum zoom") analog: the smallest zoom at
    which a uniform spread of ``n_features`` would put fewer than
    ``max_features_per_tile`` in each tile (zoom sentinel "g" parsed at
    /root/reference/src/cloudtile/cli/parsers.py:146-150)."""
    z = 0
    while z < 22 and n_features / float(4**z) > max_features_per_tile:
        z += 1
    return z
