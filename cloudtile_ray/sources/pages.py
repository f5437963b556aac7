"""Deterministic Common-Crawl-style ``pages`` table (BASELINE.json:input_hint
schema ``url, warc_ts, html, text, lang``) derived from the driver's
``documents`` table, plus the polygon ``zones`` join side.

Every derivation is integer arithmetic on ``doc_id`` so the DuckDB
correctness oracles (__ray_entry__.oracle_sql) can reproduce the exact same
values — coordinates are embedded in URLs/HTML as integer **milli-degrees**
(``lat_mi`` / ``lon_mi``), never as formatted floats, eliminating
float-printing mismatches between Python and SQL.

Derivation rules (m = doc_id):
- metro cluster (hot tiles, FIXTURES.md §1 skew): m % 10 < 3 ->
  lon_mi = -87900 + (m*13) % 800, lat_mi = 41600 + (m*17) % 700
- otherwise: lon_mi = (m*7919) % 360000 - 180000,
  lat_mi = (m*4409) % 170000 - 85000
- no geo signal at all (anti-join rows): m % 13 == 7
- coords live in the URL query string, except m % 3 == 2 where they are
  only in HTML data attributes (exercises the HTML geocode path)
- m % 5 == 0 rows additionally carry a polygon footprint in HTML
  (``data-footprint="lon_mi lat_mi,..."``, a diamond around the point)
- m % 7 == 3 rows additionally carry a LineString polyline in HTML
  (``data-polyline="lon_mi lat_mi,..."``, a 3-point chevron:
  (lon-dx, lat-dy) -> (lon, lat+dy) -> (lon+dx, lat-dy) with
  dx = 300 + (m*11) % 150, dy = 150 + (m*5) % 120 — all integer mi so the
  ``line_assign_z6`` oracle reproduces the bbox exactly)
- ``text`` is the *unmodified* documents.text — the byte-identity
  invariant column (input_hint); ``lang`` passes through likewise
- warc_ts = 2024-01-01T00:00:00 + m seconds

The reference analog: this replaces ``VectorFile`` ingestion
(/root/reference/src/cloudtile/geofile.py:129-163) — our "raw vector
source" is the web-page corpus per the north rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EPOCH_2024_US = 1704067200 * 1_000_000  # 2024-01-01T00:00:00 UTC in micro-s

# ---------------------------------------------------------------------------
# pages derivation (vectorized Arrow; zero Python-per-row work)
# ---------------------------------------------------------------------------


def derive_geo_arrays(doc_id: np.ndarray) -> dict[str, np.ndarray]:
    """The ground-truth integer geometry columns for a doc_id vector."""
    m = np.asarray(doc_id, dtype=np.int64)
    is_metro = (m % 10) < 3
    no_geo = (m % 13) == 7
    lon_mi = np.where(is_metro, -87900 + (m * 13) % 800, (m * 7919) % 360000 - 180000)
    lat_mi = np.where(is_metro, 41600 + (m * 17) % 700, (m * 4409) % 170000 - 85000)
    return {
        "is_metro": is_metro,
        "has_geo": ~no_geo,
        "lon_mi": lon_mi,
        "lat_mi": lat_mi,
        "in_url": ~no_geo & ((m % 3) != 2),
        "in_html": ~no_geo & ((m % 3) == 2),
        "has_footprint": ~no_geo & ((m % 5) == 0),
        "has_line": ~no_geo & ((m % 7) == 3),
    }


def build_pages_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> pages batch. Stateless ``map_batches`` transform,
    all-vectorized (numpy for the arithmetic, Arrow kernels for strings)."""
    m = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    g = derive_geo_arrays(m)
    site = (m % 97).astype(np.int64)

    def s(a: np.ndarray) -> pa.Array:
        return pc.cast(pa.array(a), pa.string())

    geo_url = pc.binary_join_element_wise(
        "https://site", s(site), ".example/geo/", s(m),
        "?lat_mi=", s(g["lat_mi"]), "&lon_mi=", s(g["lon_mi"]), "",
    )
    plain_url = pc.binary_join_element_wise(
        "https://site", s(site), ".example/p/", s(m), ""
    )
    url = pc.if_else(pa.array(g["in_url"]), geo_url, plain_url)

    # HTML: data attrs for the html-geocode rows, diamond footprint ring for
    # every 5th geo row, text body for all
    data_attr = pc.if_else(
        pa.array(g["in_html"]),
        pc.binary_join_element_wise(
            ' data-lat-mi="', s(g["lat_mi"]), '" data-lon-mi="', s(g["lon_mi"]), '"', ""
        ),
        pa.array(np.full(len(m), "", dtype=object), type=pa.string()),
    )
    # diamond around the point: (lon±d, lat), (lon, lat±d), d = 200 + m%100 mi
    d = 200 + (m % 100)
    fp = pc.binary_join_element_wise(
        ' data-footprint="',
        s(g["lon_mi"] - d), " ", s(g["lat_mi"]),
        ",", s(g["lon_mi"]), " ", s(g["lat_mi"] + d),
        ",", s(g["lon_mi"] + d), " ", s(g["lat_mi"]),
        ",", s(g["lon_mi"]), " ", s(g["lat_mi"] - d),
        '"', "",
    )
    fp = pc.if_else(
        pa.array(g["has_footprint"]), fp,
        pa.array(np.full(len(m), "", dtype=object), type=pa.string()),
    )
    # 3-point chevron polyline for every 7th geo row (the LineString
    # feature class): dx/dy integer mi per the module docstring
    ldx = 300 + (m * 11) % 150
    ldy = 150 + (m * 5) % 120
    ln = pc.binary_join_element_wise(
        ' data-polyline="',
        s(g["lon_mi"] - ldx), " ", s(g["lat_mi"] - ldy),
        ",", s(g["lon_mi"]), " ", s(g["lat_mi"] + ldy),
        ",", s(g["lon_mi"] + ldx), " ", s(g["lat_mi"] - ldy),
        '"', "",
    )
    ln = pc.if_else(
        pa.array(g["has_line"]), ln,
        pa.array(np.full(len(m), "", dtype=object), type=pa.string()),
    )
    html = pc.binary_join_element_wise(
        "<html><body", data_attr, fp, ln, "><p>", batch.column("text"), "</p></body></html>", ""
    )
    ts = pa.array(EPOCH_2024_US + m * 1_000_000).cast(pa.timestamp("us"))
    return pa.table(
        {
            "url": url,
            "warc_ts": ts,
            "html": pc.cast(html, pa.binary()),
            "text": batch.column("text"),  # byte-identical passthrough
            "lang": batch.column("lang"),
            "doc_id": batch.column("doc_id"),  # carried for oracle joins
        }
    )


# SQL CTE reproducing derive_geo_arrays + the URL exactly (DuckDB dialect;
# every modulo operand is non-negative so % semantics match numpy).
PAGES_SQL_CTE = """
pages AS (
  SELECT
    doc_id,
    text,
    lang,
    (doc_id % 10) < 3 AS is_metro,
    (doc_id % 13) <> 7 AS has_geo,
    ((doc_id % 13) <> 7) AND ((doc_id % 3) <> 2) AS in_url,
    CASE WHEN (doc_id % 10) < 3 THEN -87900 + (doc_id * 13) % 800
         ELSE (doc_id * 7919) % 360000 - 180000 END AS lon_mi,
    CASE WHEN (doc_id % 10) < 3 THEN 41600 + (doc_id * 17) % 700
         ELSE (doc_id * 4409) % 170000 - 85000 END AS lat_mi
  FROM documents
),
pages_url AS (
  SELECT *,
    CASE WHEN in_url
      THEN 'https://site' || (doc_id % 97) || '.example/geo/' || doc_id
           || '?lat_mi=' || lat_mi || '&lon_mi=' || lon_mi
      ELSE 'https://site' || (doc_id % 97) || '.example/p/' || doc_id
    END AS url
  FROM pages
),
geo AS (SELECT * FROM pages_url WHERE has_geo)
"""


# ---------------------------------------------------------------------------
# zones: the point-in-polygon join right side (30 polygons, deterministic)
# ---------------------------------------------------------------------------

N_ZONES = 30


def zone_boxes_mi() -> np.ndarray:
    """(N_ZONES, 4) inclusive integer milli-degree boxes
    (west, south, east, north). Zones 28/29 are wide overlapping bands that
    cover the metro cluster -> hot polygons + multi-match rows."""
    j = np.arange(N_ZONES, dtype=np.int64)
    west = -180000 + j * 12000
    east = west + 11000
    south = -85000 + (j * 7321) % 151000
    north = south + 9000
    boxes = np.stack([west, south, east, north], axis=1)
    boxes[28] = [-180000, 40000, 180000, 50000]
    boxes[29] = [-100000, -85000, -80000, 85000]
    return boxes


def zone_rings() -> list[list[np.ndarray]]:
    """Degree-space rings for the PiP index: each inclusive integer box is
    grown by half a milli-degree so integer points are never on an edge
    (membership <=> the inclusive integer box test used by the SQL oracle)."""
    out = []
    for w, s, e, n in zone_boxes_mi():
        w_d, s_d, e_d, n_d = (
            (w - 0.5) / 1000.0,
            (s - 0.5) / 1000.0,
            (e + 0.5) / 1000.0,
            (n + 0.5) / 1000.0,
        )
        out.append(
            [np.array([[w_d, s_d], [e_d, s_d], [e_d, n_d], [w_d, n_d]], dtype=np.float64)]
        )
    return out


ZONES_SQL_CTE = """
zones AS (
  SELECT
    CAST(j AS BIGINT) AS zone_id,
    'zone-' || j AS zone_name,
    CASE WHEN j = 28 THEN -180000 WHEN j = 29 THEN -100000
         ELSE -180000 + j * 12000 END AS west_mi,
    CASE WHEN j = 28 THEN 40000 WHEN j = 29 THEN -85000
         ELSE -85000 + (j * 7321) % 151000 END AS south_mi,
    CASE WHEN j = 28 THEN 180000 WHEN j = 29 THEN -80000
         ELSE -180000 + j * 12000 + 11000 END AS east_mi,
    CASE WHEN j = 28 THEN 50000 WHEN j = 29 THEN 85000
         ELSE -85000 + (j * 7321) % 151000 + 9000 END AS north_mi
  FROM range(0, 30) t(j)
)
"""

# fixed kNN query points (lon_mi, lat_mi): null island, the metro center,
# and a far oceanic point
KNN_QUERIES_MI = np.array([[0, 0], [-87900, 41600], [100000, -45000]], dtype=np.int64)


# ---------------------------------------------------------------------------
# standalone richer generator (pytest fixtures; FIXTURES.md §1-2) — decimal
# coords in text, duplicate urls, edge rows. Oracles for these live in the
# tests themselves (scalar Python), not DuckDB.
# ---------------------------------------------------------------------------


def generate_pages(n: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    i = np.arange(n, dtype=np.int64)
    metro = (i % 10) < 3
    lon = np.where(metro, -87.9 + (i * 13 % 800) / 1000.0, rng.uniform(-180, 180, n))
    lat = np.where(metro, 41.6 + (i * 17 % 700) / 1000.0, rng.uniform(-85.0511, 85.0511, n))
    # edge rows
    if n >= 8:
        lon[-4:] = [-180.0, 180.0, 0.0, 12.5]
        lat[-4:] = [-85.0511, 85.0511, 0.0, 0.0]
    no_geo = (i % 13) == 7
    in_text = (i % 3) == 2
    urls, texts = [], []
    for k in range(n):
        base = f"https://site{k % 97}.example/us/page-{k}"
        if no_geo[k]:
            urls.append(base)
            texts.append(f"plain document {k} with no coordinates at all")
        elif in_text[k]:
            urls.append(base)
            texts.append(f"page {k} located at {lat[k]:.4f}, {lon[k]:.4f} downtown")
        else:
            urls.append(f"{base}?lat={lat[k]:.4f}&lon={lon[k]:.4f}")
            texts.append(f"page {k} body text")
    # duplicate urls for exact-dedup tests
    if n >= 12:
        urls[-1] = urls[0]
        urls[-2] = urls[1]
    html = [f'<html><body><p>{t}</p></body></html>'.encode() for t in texts]
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(EPOCH_2024_US + i * 1_000_000).cast(pa.timestamp("us")),
            "html": pa.array(html, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([["en", "es", "fr", "de", "pt"][k % 5] for k in range(n)]),
        }
    )
