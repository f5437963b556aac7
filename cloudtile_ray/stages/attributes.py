"""Attribute-level transform semantics from the tippecanoe option surface
cloudtile drives (/root/reference/src/cloudtile/tippecanoe.yaml:34-48,95-104)
— all stateless vectorized Arrow ops:

- ``exclude`` / ``include`` / ``exclude-all`` column projection (yaml:34-37)
- ``attribute-type`` casts among string/float/int/bool (yaml:39)
- ``empty-csv-columns-are-null`` (yaml:42)
- ``convert-stringified-ids-to-numbers`` (yaml:43)
- ``use-attribute-for-id`` (yaml:44)
- ``single-precision`` (yaml:45)
- ``feature-filter`` expression predicates (yaml:46-48) — a JSON expression
  mini-language mirroring tippecanoe's filter shape
- ``generate-ids`` (yaml:97) — deterministic ids from the url hash (stable
  across parallelism, unlike a row counter)
- ``detect-longitude-wraparound`` (yaml:99) and ``clip-bounding-box``
  (yaml:102) normalization
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TYPE_MAP = {
    "string": pa.string(),
    "float": pa.float64(),
    "int": pa.int64(),
    "bool": pa.bool_(),
}

_PROTECTED = {"url", "doc_id", "lon", "lat", "text"}  # never dropped implicitly


def apply_attribute_settings(batch: pa.Table, settings: dict) -> pa.Table:
    """Apply the attribute-projection / mutation settings to one batch."""
    s = settings
    if s.get("exclude-all", False):
        keep = [c for c in batch.column_names if c in _PROTECTED]
        batch = batch.select(keep)
    include = s.get("include")
    if include:
        keep = [c for c in batch.column_names if c in set(include) | _PROTECTED]
        batch = batch.select(keep)
    exclude = s.get("exclude")
    if exclude:
        drop = [c for c in batch.column_names if c in set(exclude) - _PROTECTED]
        batch = batch.drop_columns(drop)

    if s.get("empty-csv-columns-are-null", False):
        for i, name in enumerate(batch.column_names):
            col = batch.column(name)
            if pa.types.is_string(col.type):
                nulled = pc.if_else(pc.equal(col, ""), pa.nulls(len(batch), pa.string()), col)
                batch = batch.set_column(i, name, nulled)

    for name, typ in (s.get("attribute-type") or {}).items():
        if name in batch.column_names:
            i = batch.column_names.index(name)
            batch = batch.set_column(
                i, name, pc.cast(batch.column(name), _TYPE_MAP[typ])
            )

    if s.get("convert-stringified-ids-to-numbers", False):
        for i, name in enumerate(batch.column_names):
            col = batch.column(name)
            if pa.types.is_string(col.type):
                digits = pc.match_substring_regex(col, "^[0-9]+$")
                if pc.all(pc.fill_null(digits, False)).as_py() and len(batch):
                    batch = batch.set_column(i, name, pc.cast(col, pa.int64()))

    if s.get("single-precision", False):
        for i, name in enumerate(batch.column_names):
            col = batch.column(name)
            if pa.types.is_float64(col.type):
                batch = batch.set_column(i, name, pc.cast(col, pa.float32()))

    if s.get("use-attribute-for-id"):
        src = s["use-attribute-for-id"]
        if src in batch.column_names:
            batch = batch.append_column(
                "feature_id", pc.cast(batch.column(src), pa.int64())
            )
    elif s.get("generate-ids", False) and "url" in batch.column_names:
        from cloudtile_ray.stages.util import stable_hash_strings

        ids = stable_hash_strings(batch.column("url")).astype(np.int64) & ((1 << 62) - 1)
        batch = batch.append_column("feature_id", pa.array(ids))

    if s.get("detect-longitude-wraparound", False) and "lon" in batch.column_names:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        wrapped = ((lon + 180.0) % 360.0) - 180.0
        mask = np.isnan(lon)
        i = batch.column_names.index("lon")
        batch = batch.set_column(i, "lon", pa.array(wrapped, mask=mask))

    bbox = s.get("clip-bounding-box")
    if bbox and {"lon", "lat"} <= set(batch.column_names):
        w, so, e, n = bbox
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        keep = (lon >= w) & (lon <= e) & (lat >= so) & (lat <= n)
        keep |= np.isnan(lon)  # ungeocodable rows pass through
        batch = batch.take(pa.array(np.nonzero(keep)[0]))
    return batch


# --- feature-filter expression mini-language (tippecanoe.yaml:46-48) -------
# expr := ["all", expr...] | ["any", expr...] | ["not", expr]
#       | [op, attr, value]  with op in ==, !=, <, <=, >, >=, in, !in

_OPS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}


def eval_feature_filter(batch: pa.Table, expr: list) -> pa.ChunkedArray:
    head = expr[0]
    if head == "all":
        out = eval_feature_filter(batch, expr[1])
        for sub in expr[2:]:
            out = pc.and_kleene(out, eval_feature_filter(batch, sub))
        return out
    if head == "any":
        out = eval_feature_filter(batch, expr[1])
        for sub in expr[2:]:
            out = pc.or_kleene(out, eval_feature_filter(batch, sub))
        return out
    if head == "not":
        return pc.invert(eval_feature_filter(batch, expr[1]))
    if head in _OPS:
        _, attr, value = expr
        return _OPS[head](batch.column(attr), pa.scalar(value))
    if head == "in":
        _, attr, values = expr
        return pc.is_in(batch.column(attr), value_set=pa.array(values))
    if head == "!in":
        _, attr, values = expr
        return pc.invert(pc.is_in(batch.column(attr), value_set=pa.array(values)))
    raise ValueError(f"unknown filter op {head!r}")


def feature_filter(batch: pa.Table, expr: list) -> pa.Table:
    mask = eval_feature_filter(batch, expr)
    return batch.filter(pc.fill_null(mask, False))


def _json_native(t: pa.DataType) -> bool:
    return (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_boolean(t)
        or pa.types.is_null(t)
    )


def make_command_filter(cmd: str):
    """External-command ``prefilter``/``postfilter`` parity
    (/root/reference/src/cloudtile/tippecanoe.yaml:125-127): tippecanoe's
    surface is a SHELL command (pipes/redirection work — the string runs
    via ``sh -c``) fed features as newline-delimited JSON on stdin and
    read back the same way from stdout; the command may drop, reorder, or
    mutate rows.

    Only JSON-native columns (string/int/float/bool) are shipped to the
    command; binary and timestamp columns would not survive a JSON round
    trip (a tile blob would come back as its Python repr), so they stay
    in Arrow and are re-attached by row via a ``_cmdf_idx`` key the
    command must echo back (identity-style filters like ``jq -c`` do so
    for free; the key is stripped afterwards).  Unknown extra keys in the
    output are ignored.  Returns a ``fn(pa.Table) -> pa.Table`` for the
    engine's filter hooks — one subprocess per BATCH (spawn cost
    amortizes; per-row serialization is inherent to the ndjson
    protocol, exactly as tippecanoe pays it)."""
    import json
    import subprocess

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        native = [
            f.name for f in t.schema if _json_native(f.type) and f.name != "_cmdf_idx"
        ]
        ship = t.select(native).to_pylist()
        payload = "\n".join(
            json.dumps({**row, "_cmdf_idx": i}) for i, row in enumerate(ship)
        )
        proc = subprocess.run(
            ["/bin/sh", "-c", cmd],
            input=payload.encode(),
            capture_output=True,
            check=False,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"filter command {cmd!r} failed "
                f"(exit {proc.returncode}): {proc.stderr.decode()[:500]}"
            )
        rows = [
            json.loads(line)
            for line in proc.stdout.decode().splitlines()
            if line.strip()
        ]
        idx = []
        for r in rows:
            if "_cmdf_idx" not in r:
                raise RuntimeError(
                    f"filter command {cmd!r} dropped the _cmdf_idx key; "
                    "the command must preserve unknown feature keys "
                    "(tippecanoe filters do) so non-JSON columns can be "
                    "re-attached"
                )
            idx.append(int(r["_cmdf_idx"]))
        base = t.take(pa.array(idx, pa.int64()))
        # honor mutations to the JSON-native columns
        for name in native:
            field = t.schema.field(name)
            arr = pa.array([r.get(name) for r in rows], field.type)
            base = base.set_column(base.column_names.index(name), field, arr)
        return base

    return fn
