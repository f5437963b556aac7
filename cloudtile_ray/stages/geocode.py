"""Geocoding stage: parse lon/lat signals out of ``url`` / ``html`` /
``text`` and polygon footprints out of ``html`` — stateless, fully
vectorized ``map_batches`` transforms (Arrow RE2 ``extract_regex``, no
Python per-row work).

Per the input_hint invariant, geocoding only APPENDS columns — ``text`` is
never rewritten (byte-identity per url through every stage). The reference
analog is the vector->FlatGeobuf normalization step
(/root/reference/src/cloudtile/geofile.py:151-163): re-encode the raw
source into the normalized feature table.

Precedence: URL query coords > HTML data attributes > free-text decimal
coordinates. Rows with no signal keep null lon/lat (they survive as
anti-join rows; tippecanoe-analog predicates can drop them later).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_URL_LAT = r"[?&]lat_mi=(-?[0-9]+)"
_URL_LON = r"[?&]lon_mi=(-?[0-9]+)"
_HTML_LAT = r'data-lat-mi="(-?[0-9]+)"'
_HTML_LON = r'data-lon-mi="(-?[0-9]+)"'
_URL_LAT_DEC = r"[?&]lat=(-?[0-9]+\.[0-9]+)"
_URL_LON_DEC = r"[?&]lon=(-?[0-9]+\.[0-9]+)"
_TEXT_COORD = r"located at (-?[0-9]+\.[0-9]+), (-?[0-9]+\.[0-9]+)"
_FOOTPRINT = r'data-footprint="([-0-9 ,.]+)"'
_POLYLINE = r'data-polyline="([-0-9 ,.]+)"'


def _extract_one(arr: pa.Array, pattern: str) -> pa.Array:
    """First capture group, null where unmatched."""
    m = pc.extract_regex(arr, pattern=pattern.replace("(", "(?P<g>", 1))
    return pc.struct_field(m, "g")


def geocode_batch(batch: pa.Table) -> pa.Table:
    url = batch.column("url")
    html = pc.cast(batch.column("html"), pa.string())
    text = batch.column("text")

    # integer milli-degree paths (exact; driver-facing)
    lat_mi = pc.cast(_extract_one(url, _URL_LAT), pa.int64())
    lon_mi = pc.cast(_extract_one(url, _URL_LON), pa.int64())
    lat_mi = pc.coalesce(lat_mi, pc.cast(_extract_one(html, _HTML_LAT), pa.int64()))
    lon_mi = pc.coalesce(lon_mi, pc.cast(_extract_one(html, _HTML_LON), pa.int64()))

    # decimal-degree fallbacks (engine-generated fixtures / realistic pages)
    lat_dec = pc.cast(_extract_one(url, _URL_LAT_DEC), pa.float64())
    lon_dec = pc.cast(_extract_one(url, _URL_LON_DEC), pa.float64())
    tm = pc.extract_regex(
        text, pattern=r"located at (?P<lat>-?[0-9]+\.[0-9]+), (?P<lon>-?[0-9]+\.[0-9]+)"
    )
    lat_dec = pc.coalesce(lat_dec, pc.cast(pc.struct_field(tm, "lat"), pa.float64()))
    lon_dec = pc.coalesce(lon_dec, pc.cast(pc.struct_field(tm, "lon"), pa.float64()))

    lat = pc.coalesce(pc.divide(pc.cast(lat_mi, pa.float64()), 1000.0), lat_dec)
    lon = pc.coalesce(pc.divide(pc.cast(lon_mi, pa.float64()), 1000.0), lon_dec)

    footprint = _extract_one(html, _FOOTPRINT)
    polyline = _extract_one(html, _POLYLINE)

    out = batch
    for name, col in [
        ("lat_mi", lat_mi),
        ("lon_mi", lon_mi),
        ("lat", lat),
        ("lon", lon),
        ("has_geo", pc.is_valid(lat)),
        ("footprint_mi", footprint),
        ("line_mi", polyline),
    ]:
        out = out.append_column(name, col)
    return out


def drop_html(batch: pa.Table) -> pa.Table:
    """Project away the heavy binary column the moment it is no longer
    needed (SURVEY.md §7.5 hard part 4 — html is dead weight at 100 TB)."""
    return batch.drop_columns(["html"]) if "html" in batch.column_names else batch


def parse_footprints(footprint_mi: pa.Array) -> list[np.ndarray | None]:
    """Parse ``"lon_mi lat_mi,..."`` strings into degree rings. Only called
    on the minority of rows that carry a footprint; returns None elsewhere."""
    out: list[np.ndarray | None] = []
    for s in footprint_mi.to_pylist():
        if not s:
            out.append(None)
            continue
        pts = np.array(
            [p.split(" ") for p in s.split(",")], dtype=np.float64
        )
        out.append(pts / 1000.0)
    return out
