"""Format-dispatched source readers (the ``Converter.load_file`` analog,
/root/reference/src/cloudtile/converter.py:90-130): a suffix registry maps
input paths to Ray Data readers that normalize into the pages schema.

The reference's ``VectorFile`` accepts {geojson, gpkg, parquet}
(/root/reference/src/cloudtile/geofile.py:136) and rejects anything else at
construction (geofile.py:138-145); we mirror that registry and extend it
with the formats this engine natively parses (json, csv).  ``.geojson`` is
parsed into the engine's feature columns (doc_id, lon, lat, footprint_mi,
line_mi, + scalar properties) inside a Ray task; ``.gpkg`` parses natively
via stdlib sqlite3 + a small WKB codec (sources/gpkg.py) — no GDAL — into
the exact same feature columns, so both suffixes of the reference's
registry load without shelling out.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable

import numpy as np
import pyarrow as pa

from cloudtile_ray.stages.util import strip_schema_metadata

ALLOWED_SUFFIXES = {"geojson", "gpkg", "parquet", "json", "csv"}


def _read_parquet(path: str):
    from cloudtile_ray.stages.util import read_parquet_clean

    return read_parquet_clean(path)


def _read_json(path: str):
    import ray.data

    return ray.data.read_json(path)


def _read_csv(path: str):
    import ray.data

    return ray.data.read_csv(path)


def _ring_to_mi(coords: list) -> str:
    """[[lon, lat], ...] degrees -> the engine's millidegree coord-list
    string ``"lon_mi lat_mi,..."`` (see lines.parse_coord_lists)."""
    return ",".join(
        f"{int(round(c[0] * 1000))} {int(round(c[1] * 1000))}" for c in coords
    )


def parse_geojson_features(payload: bytes | str) -> pa.Table:
    """One GeoJSON document -> the engine's feature table.

    Geometry mapping: Point -> (lon, lat); Polygon -> footprint_mi (exterior
    ring, millidegree string) with (lon, lat) = vertex mean; LineString ->
    line_mi with (lon, lat) = vertex mean.  Multi* take the first part
    (parity with a flattened ogr2ogr conversion of simple fixtures).  Scalar
    properties (str/int/float/bool) become columns; ``doc_id`` comes from
    properties when present, else the feature index."""
    obj = json.loads(payload)
    if obj.get("type") == "FeatureCollection":
        feats = obj.get("features", [])
    elif obj.get("type") == "Feature":
        feats = [obj]
    else:
        raise ValueError(
            "geojson payload is neither a FeatureCollection nor a Feature"
        )
    n = len(feats)
    lon = np.full(n, np.nan)
    lat = np.full(n, np.nan)
    footprint: list[str | None] = [None] * n
    line: list[str | None] = [None] * n
    prop_cols: dict[str, list] = {}
    for i, f in enumerate(feats):
        geom = f.get("geometry") or {}
        gt = geom.get("type")
        coords = geom.get("coordinates")
        if gt == "MultiPoint" and coords:
            gt, coords = "Point", coords[0]
        elif gt == "MultiLineString" and coords:
            gt, coords = "LineString", coords[0]
        elif gt == "MultiPolygon" and coords:
            gt, coords = "Polygon", coords[0]
        if gt == "Point" and coords:
            lon[i], lat[i] = float(coords[0]), float(coords[1])
        elif gt == "LineString" and coords:
            pts = np.asarray(coords, dtype=np.float64)
            if pts.ndim == 2 and len(pts):  # empty/degenerate path -> null
                lon[i], lat[i] = pts[:, 0].mean(), pts[:, 1].mean()
                line[i] = _ring_to_mi(coords)
        elif gt == "Polygon" and coords:
            ring = coords[0]
            pts = np.asarray(ring, dtype=np.float64)
            if pts.ndim == 2 and len(pts):  # empty/degenerate ring -> null
                lon[i], lat[i] = pts[:, 0].mean(), pts[:, 1].mean()
                footprint[i] = _ring_to_mi(ring)
        for k, v in (f.get("properties") or {}).items():
            if isinstance(v, (str, int, float, bool)) or v is None:
                prop_cols.setdefault(k, [None] * n)[i] = v
    return assemble_feature_table(n, lon, lat, footprint, line, prop_cols)


def assemble_feature_table(
    n: int,
    lon: np.ndarray,
    lat: np.ndarray,
    footprint: list,
    line: list,
    prop_cols: dict[str, list],
) -> pa.Table:
    """Shared tail of the geojson/gpkg parsers: doc_id resolution +
    property-column typing over pre-extracted geometry arrays."""
    cols: dict[str, pa.Array] = {}
    # doc_id from properties only when every present value is an integer
    # (bool excluded); string/float ids stay a plain property column and
    # ids are synthesized from the feature index — int(v) on "site-42"
    # would crash the read, and truncating 7.9 -> 7 could collide ids.
    ids = prop_cols.get("doc_id")
    if ids is not None and all(
        v is None or (isinstance(v, int) and not isinstance(v, bool)) for v in ids
    ):
        prop_cols.pop("doc_id")
        cols["doc_id"] = pa.array(ids, pa.int64())
    else:
        if ids is not None:  # keep the original under a non-clobbering name
            prop_cols["source_doc_id"] = prop_cols.pop("doc_id")
        cols["doc_id"] = pa.array(np.arange(n, dtype=np.int64))
    cols["lon"] = pa.array(lon)
    cols["lat"] = pa.array(lat)
    cols["footprint_mi"] = pa.array(footprint, pa.string())
    cols["line_mi"] = pa.array(line, pa.string())
    for k in sorted(prop_cols):
        vals = prop_cols[k]
        try:
            cols[k] = pa.array(vals)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # mixed value types across features (int 12 vs str "A-12" is
            # common in real exports): degrade the column to string
            cols[k] = pa.array(
                [None if v is None else str(v) for v in vals], pa.string()
            )
    return pa.table(cols)


def _read_geojson(path: str):
    """GeoJSON FeatureCollection reader.  A .geojson file is ONE JSON
    document — not line-splittable — so the parse runs as a single Ray
    task per file (``read_binary_files`` -> parse ``map_batches``), the
    same per-file unit of work the reference hands ogr2ogr
    (geofile.py:151-163).  Corpus-scale inputs arrive as parquet; a
    directory of .geojson files still parses file-parallel."""
    import ray.data

    raw = ray.data.read_binary_files(path)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_geojson_features(b.as_py())
            for b in batch.column("bytes")
        ]
        if not tables:
            return parse_geojson_features(
                b'{"type": "FeatureCollection", "features": []}'
            )
        # files in one batch may carry different property sets: promote
        # (absent columns -> null) instead of requiring identical schemas
        return pa.concat_tables(tables, promote_options="default")

    return raw.map_batches(parse, batch_format="pyarrow")


def _read_gpkg(path: str):
    """GeoPackage reader: one Ray task deserializes one file's bytes into
    an in-memory SQLite connection and parses the feature tables
    (sources/gpkg.py) — the same per-file unit of work the reference
    hands ogr2ogr (geofile.py:151-163).  A directory of .gpkg files
    parses file-parallel; corpus-scale inputs arrive as parquet."""
    import ray.data

    from cloudtile_ray.sources.gpkg import read_gpkg_bytes

    raw = ray.data.read_binary_files(path)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [read_gpkg_bytes(b.as_py()) for b in batch.column("bytes")]
        if not tables:
            return assemble_feature_table(0, np.empty(0), np.empty(0), [], [], {})
        return pa.concat_tables(tables, promote_options="default")

    return raw.map_batches(parse, batch_format="pyarrow")


READERS: dict[str, Callable[[str], "ray.data.Dataset"]] = {
    "parquet": _read_parquet,
    "geojson": _read_geojson,
    "gpkg": _read_gpkg,
    "json": _read_json,
    "csv": _read_csv,
}


def load_source(origin: str) -> "ray.data.Dataset":
    """Suffix-dispatch a source path to its reader. Missing file ->
    FileNotFoundError (FilePath existence check parity, geofile.py:268-271);
    unsupported suffix -> ValueError (geofile.py:138-145 parity)."""
    p = Path(origin)
    if not p.exists():
        raise FileNotFoundError(f"{origin} not found")
    if p.is_dir():  # a directory of parquet part files (our own sink layout)
        return _read_parquet(str(p))
    suffix = p.suffix.lstrip(".").lower()
    if suffix not in READERS:
        raise ValueError(
            f"{suffix!r} is not a supported format; expected one of "
            f"{sorted(ALLOWED_SUFFIXES)}"
        )
    return READERS[suffix](origin)
