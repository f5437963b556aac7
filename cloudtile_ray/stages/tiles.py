"""The tile-build shuffle: per-batch partial aggregation, explicit salt-key
skew splitting for hot tiles, per-tile coalesce/drop ladder, size caps, and
deterministic tile encoding.

This is the engine-native replacement for the fgb->pmtiles stage the
reference runs by shelling out to tippecanoe
(/root/reference/src/cloudtile/geofile.py:193-236). The pressure-valve
semantics mirror the options cloudtile drives (defaults in
/root/reference/src/cloudtile/tippecanoe.yaml:57-65,105-116 and the golden
dict /root/reference/tests/test_tippecanoe.py:75-85):

- ``coalesce-densest-as-needed`` (default True): features stacking on the
  same in-tile pixel merge into one feature carrying a count — *hot tiles
  are shrunk, not split* (SURVEY.md §4), and pixel-coalescing is
  associative, so it runs as a batch-local partial aggregation BEFORE the
  shuffle (the pre-aggregate pattern), then again at merge.
- ``maximum-tile-features`` (20000) and ``maximum-tile-bytes`` (2500000):
  enforced in the finalize step with a deterministic drop ladder — every
  drop decision is a pure function of (pixel position, input order), so
  output is identical at any parallelism level.
- skew: tiles whose partial count exceeds ``hot_threshold`` get an explicit
  salt key (hash % n_salts) for a first merge round
  (``groupby([tile_key, salt])``), then a second tiny merge per tile —
  the salt-key skew splitting required verbatim by the north rule.
- final ``sort(["z", "x", "y"])`` for archive layout (PMTiles-style
  clustered ordering).

Every stage is Arrow-in/Arrow-out ``map_batches`` / ``map_groups``; the
only all-to-all exchanges are the two groupbys over already-reduced
partials and the final small sort.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from cloudtile_ray.config import TilingSettings
from cloudtile_ray.geo import webmercator as wm
from cloudtile_ray.stages.util import stable_hash_strings

TILE_MAGIC = b"RTL1"


def _coalesce_pixels(
    px: np.ndarray, py: np.ndarray, cnt: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge features sharing an in-tile pixel, summing counts. Associative
    + commutative -> safe as both partial and final aggregation. Output is
    sorted by (py, px): deterministic regardless of input order."""
    key = py.astype(np.int64) * (wm.DEFAULT_EXTENT + 1) + px.astype(np.int64)
    order = np.argsort(key, kind="stable")
    key = key[order]
    cnt = cnt[order]
    uniq, start = np.unique(key, return_index=True)
    sums = np.add.reduceat(cnt, start) if len(cnt) else cnt
    return (
        (uniq % (wm.DEFAULT_EXTENT + 1)).astype(np.int32),
        (uniq // (wm.DEFAULT_EXTENT + 1)).astype(np.int32),
        sums.astype(np.int64),
    )


class PartialTileAgg:
    """Batch-local partial tile state: one output row per tile touched by
    the batch, pixel-coalesced. Runs as stateless tasks (no cross-batch
    state); this is what keeps hot tiles from flooding the shuffle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        tk = batch.column("tile_key").to_numpy(zero_copy_only=False).astype(np.uint64)
        px = batch.column("px").to_numpy(zero_copy_only=False).astype(np.int32)
        py = batch.column("py").to_numpy(zero_copy_only=False).astype(np.int32)
        order = np.argsort(tk, kind="stable")
        tk, px, py = tk[order], px[order], py[order]
        uniq, start = np.unique(tk, return_index=True)
        out = {
            "tile_key": [], "z": [], "x": [], "y": [],
            "px_blob": [], "py_blob": [], "cnt_blob": [], "n_raw": [],
        }
        bounds = list(start[1:]) + [len(tk)]
        for u, s, e in zip(uniq, start, bounds):
            cpx, cpy, ccnt = _coalesce_pixels(
                px[s:e], py[s:e], np.ones(e - s, dtype=np.int64)
            )
            z, x, y = (int(a[0]) for a in wm.unpack_tile_key(np.array([u])))
            out["tile_key"].append(u)
            out["z"].append(z)
            out["x"].append(x)
            out["y"].append(y)
            out["px_blob"].append(cpx.tobytes())
            out["py_blob"].append(cpy.tobytes())
            out["cnt_blob"].append(ccnt.tobytes())
            out["n_raw"].append(e - s)
        return pa.table(
            {
                "tile_key": pa.array(np.array(out["tile_key"], dtype=np.uint64)),
                "z": pa.array(out["z"], pa.int64()),
                "x": pa.array(out["x"], pa.int64()),
                "y": pa.array(out["y"], pa.int64()),
                "px_blob": pa.array(out["px_blob"], pa.binary()),
                "py_blob": pa.array(out["py_blob"], pa.binary()),
                "cnt_blob": pa.array(out["cnt_blob"], pa.binary()),
                "n_raw": pa.array(out["n_raw"], pa.int64()),
            }
        )


def _merge_rows(group: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    px = np.concatenate(
        [np.frombuffer(b.as_py(), dtype=np.int32) for b in group.column("px_blob")]
    )
    py = np.concatenate(
        [np.frombuffer(b.as_py(), dtype=np.int32) for b in group.column("py_blob")]
    )
    cnt = np.concatenate(
        [np.frombuffer(b.as_py(), dtype=np.int64) for b in group.column("cnt_blob")]
    )
    n_raw = int(sum(group.column("n_raw").to_pylist()))
    cpx, cpy, ccnt = _coalesce_pixels(px, py, cnt)
    return cpx, cpy, ccnt, n_raw


def merge_partials(group: pa.Table) -> pa.Table:
    """Combine salted partials of one (tile, salt) shard -> same schema."""
    cpx, cpy, ccnt, n_raw = _merge_rows(group)
    return pa.table(
        {
            "tile_key": group.column("tile_key").slice(0, 1),
            "z": group.column("z").slice(0, 1),
            "x": group.column("x").slice(0, 1),
            "y": group.column("y").slice(0, 1),
            "px_blob": pa.array([cpx.tobytes()], pa.binary()),
            "py_blob": pa.array([cpy.tobytes()], pa.binary()),
            "cnt_blob": pa.array([ccnt.tobytes()], pa.binary()),
            "n_raw": pa.array([n_raw], pa.int64()),
        }
    )


class FinalizeTile:
    """Per-tile finalize: drop ladder + size caps + deterministic byte
    encoding. Pure function of the merged pixel multiset -> reproducible
    across parallelism levels."""

    def __init__(self, settings: dict | None = None):
        self.settings = TilingSettings(**(settings or {}))

    def __call__(self, group: pa.Table) -> pa.Table:
        s = self.settings
        cpx, cpy, ccnt, n_raw = _merge_rows(group)
        n_coalesced = len(cpx)
        max_feat = s.get("maximum-tile-features", 20000)
        max_bytes = s.get("maximum-tile-bytes", 2500000)
        dropped = 0
        if not s.get("no-feature-limit", False) and n_coalesced > max_feat:
            # drop ladder step 2: deterministic subset — keep the max_feat
            # densest pixels (ties broken by pixel position, which is the
            # sort order of _coalesce_pixels)
            order = np.lexsort((np.arange(len(ccnt)), -ccnt))[:max_feat]
            order.sort()
            dropped = n_coalesced - max_feat
            cpx, cpy, ccnt = cpx[order], cpy[order], ccnt[order]
        blob = self._encode(group, cpx, cpy, ccnt)
        while not s.get("no-tile-size-limit", False) and len(blob) > max_bytes and len(cpx) > 1:
            # drop ladder step 3: halve densest-first until under the cap
            keep = np.lexsort((np.arange(len(ccnt)), -ccnt))[: max(1, len(cpx) // 2)]
            keep.sort()
            dropped += len(cpx) - len(keep)
            cpx, cpy, ccnt = cpx[keep], cpy[keep], ccnt[keep]
            blob = self._encode(group, cpx, cpy, ccnt)
        return pa.table(
            {
                "z": group.column("z").slice(0, 1),
                "x": group.column("x").slice(0, 1),
                "y": group.column("y").slice(0, 1),
                "n_features": pa.array([len(cpx)], pa.int64()),
                "n_source_points": pa.array([n_raw], pa.int64()),
                "n_dropped": pa.array([dropped], pa.int64()),
                "tile_nbytes": pa.array([len(blob)], pa.int64()),
                "tile_bytes": pa.array([blob], pa.binary()),
            }
        )

    def _encode(self, group: pa.Table, px, py, cnt) -> bytes:
        z = int(group.column("z")[0].as_py())
        x = int(group.column("x")[0].as_py())
        y = int(group.column("y")[0].as_py())
        header = TILE_MAGIC + np.array([z, x, y, len(px)], dtype=np.int32).tobytes()
        body = header + px.tobytes() + py.tobytes() + cnt.astype(np.int64).tobytes()
        if not self.settings.get("no-tile-compression", True):
            body = zlib.compress(body, level=6)  # deterministic for fixed level
        return body


def encode_tiles(
    exploded: "ray.data.Dataset",
    settings: dict | None = None,
    hot_threshold: int = 64,
    n_salts: int = 16,
) -> "ray.data.Dataset":
    """Full tile-build DAG over an exploded (feature x zoom) dataset with
    ``tile_key/px/py`` columns:

    partials (batch-local, no shuffle) -> hot-tile pre-count (tiny groupby
    over 1 row/tile/batch) -> salted merge for hot tiles -> per-tile
    finalize -> sort(z, x, y).
    """
    import ray

    partials = exploded.map_batches(
        PartialTileAgg(), batch_format="pyarrow", batch_size=65536
    ).materialize()  # small: one row per (tile, batch); reused twice below

    # hot tiles = tiles with many partial rows (i.e. touched by many blocks)
    counts = partials.groupby("tile_key").count().to_pandas()
    hot = set(
        counts.loc[counts["count()"] > hot_threshold, "tile_key"].astype(np.uint64).tolist()
    )
    hot_ref = ray.put(hot)

    def add_salt(batch: pa.Table) -> pa.Table:
        hot_set = ray.get(hot_ref)
        tk = batch.column("tile_key").to_numpy(zero_copy_only=False).astype(np.uint64)
        salt = np.zeros(len(tk), dtype=np.int64)
        if hot_set:
            is_hot = np.isin(tk, np.fromiter(hot_set, dtype=np.uint64))
            if is_hot.any():
                h = stable_hash_strings(
                    [f"{t}-{i}" for i, t in enumerate(tk[is_hot].tolist())]
                )
                salt[is_hot] = (h % np.uint64(n_salts)).astype(np.int64)
        return batch.append_column("salt", pa.array(salt))

    salted = partials.map_batches(add_salt, batch_format="pyarrow")
    merged = salted.groupby(["tile_key", "salt"]).map_groups(
        lambda g: merge_partials(g.drop_columns(["salt"])), batch_format="pyarrow"
    )
    finalizer = FinalizeTile(settings)

    def finalize_tile(g: pa.Table) -> pa.Table:
        return finalizer(g)

    tiles = merged.groupby("tile_key").map_groups(finalize_tile, batch_format="pyarrow")
    return tiles.sort(["z", "x", "y"])


def decode_tile(blob: bytes) -> dict:
    """Inverse of FinalizeTile._encode (for tests and consumers)."""
    if not blob.startswith(TILE_MAGIC):
        blob = zlib.decompress(blob)
    assert blob[:4] == TILE_MAGIC
    z, x, y, n = np.frombuffer(blob[4:20], dtype=np.int32)
    off = 20
    px = np.frombuffer(blob[off : off + 4 * n], dtype=np.int32)
    off += 4 * n
    py = np.frombuffer(blob[off : off + 4 * n], dtype=np.int32)
    off += 4 * n
    cnt = np.frombuffer(blob[off : off + 8 * n], dtype=np.int64)
    return {"z": int(z), "x": int(x), "y": int(y), "px": px, "py": py, "cnt": cnt}
