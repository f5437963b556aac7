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

# PAIRED extractions: the corpus always writes lat/lon adjacently (URL
# query string and HTML data attrs), so each pair is ONE RE2 pass with two
# capture groups instead of two full scans — geocode runs 6 regex passes
# total, and every pass matters: this stage scans every html byte of the
# corpus (a whole extra pass cost ~15% of the r2 headline).
_URL_PAIR = r"[?&]lat_mi=(?P<lat>-?[0-9]+)&lon_mi=(?P<lon>-?[0-9]+)"
_HTML_PAIR = r'data-lat-mi="(?P<lat>-?[0-9]+)" data-lon-mi="(?P<lon>-?[0-9]+)"'
_URL_DEC_PAIR = r"[?&]lat=(?P<lat>-?[0-9]+\.[0-9]+)&lon=(?P<lon>-?[0-9]+\.[0-9]+)"
_FOOTPRINT = r'data-footprint="([-0-9 ,.]+)"'
_POLYLINE = r'data-polyline="([-0-9 ,.]+)"'


def _extract_one(arr: pa.Array, pattern: str) -> pa.Array:
    """First capture group, null where unmatched."""
    m = pc.extract_regex(arr, pattern=pattern.replace("(", "(?P<g>", 1))
    return pc.struct_field(m, "g")


def _extract_pair(arr: pa.Array, pattern: str) -> tuple[pa.Array, pa.Array]:
    m = pc.extract_regex(arr, pattern=pattern)
    return pc.struct_field(m, "lat"), pc.struct_field(m, "lon")


def geocode_batch(batch: pa.Table) -> pa.Table:
    url = batch.column("url")
    html = pc.cast(batch.column("html"), pa.string())
    text = batch.column("text")

    # integer milli-degree paths (exact; driver-facing)
    u_lat, u_lon = _extract_pair(url, _URL_PAIR)
    h_lat, h_lon = _extract_pair(html, _HTML_PAIR)
    lat_mi = pc.coalesce(pc.cast(u_lat, pa.int64()), pc.cast(h_lat, pa.int64()))
    lon_mi = pc.coalesce(pc.cast(u_lon, pa.int64()), pc.cast(h_lon, pa.int64()))

    # decimal-degree fallbacks (engine-generated fixtures / realistic pages)
    d_lat, d_lon = _extract_pair(url, _URL_DEC_PAIR)
    lat_dec = pc.cast(d_lat, pa.float64())
    lon_dec = pc.cast(d_lon, pa.float64())
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


def redact_geo_urls(batch: pa.Table, col: str = "url") -> pa.Table:
    """Location-privacy scrub (the geospatial flavour of a PII-redaction
    stage): replace coordinate query parameters embedded in URLs with a
    REDACTED token and count the redactions per row.  The inverse of
    :func:`geocode_batch`'s URL extraction — a corpus published for
    training must not leak per-page geolocation.

    Pure Arrow RE2 kernels (one match-count + one global replace per
    batch, no row loop); DuckDB's ``regexp_replace(..., 'g')`` is the
    same RE2 dialect, so the oracle replays it byte-for-byte."""
    import pyarrow.compute as pc

    pat = r"lat_mi=-?[0-9]+&lon_mi=-?[0-9]+"
    u = batch.column(col)
    n = pc.cast(pc.count_substring_regex(u, pattern=pat), pa.int64())
    scrubbed = pc.replace_substring_regex(
        u, pattern=pat, replacement="coords=REDACTED"
    )
    out = batch.append_column("scrubbed_url", scrubbed)
    return out.append_column("n_redactions", n)


def extract_domain(batch: pa.Table, col: str = "url") -> pa.Table:
    """Append ``domain`` extracted from the URL (one Arrow RE2
    ``extract_regex`` pass; DuckDB replays it with ``regexp_extract``).
    Crawl-ops staple: per-domain rollups drive politeness budgets and
    domain-level quality decisions."""
    import pyarrow.compute as pc

    st = pc.extract_regex(batch.column(col), pattern=r"^https://(?P<domain>[^/]+)/")
    return batch.append_column("domain", pc.struct_field(st, "domain"))
