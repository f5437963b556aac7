"""Resumable partitioned output with per-partition lineage manifests.

Generalizes the reference's only idempotency mechanism — S3 upload skip when
name + md5 match (/root/reference/src/cloudtile/s3.py:128-132,151-187, md5
stored as object metadata at s3.py:144) — to record level: each output
partition is written atomically (temp file + rename) together with a JSON
manifest entry carrying

    {partition_id, config_hash, n_rows, content_hash}

On resume, a partition whose manifest entry verifies (file exists, config
hash matches, stored content hash matches the file) is SKIPPED — the
md5-skip analog — and only missing/stale partitions are recomputed. The
north rule requires exactly this: "resumable from checkpoint with
per-partition lineage + row-count metrics".
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq


def config_hash(settings: dict) -> str:
    """Stable hash of the run configuration (dict order-insensitive)."""
    canon = json.dumps(settings, sort_keys=True, default=str)
    return hashlib.md5(canon.encode()).hexdigest()


def _file_md5(path: Path) -> str:
    h = hashlib.md5()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


class PartitionedWriter:
    """Writes named partitions of a dataset as parquet + manifest; skips
    partitions already recorded as complete for the same config."""

    def __init__(self, out_dir: str | Path, settings: dict | None = None):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.cfg_hash = config_hash(settings or {})
        self.manifest_path = self.out_dir / "_manifest.json"
        self.manifest: dict[str, dict] = {}
        if self.manifest_path.exists():
            self.manifest = json.loads(self.manifest_path.read_text())

    def partition_path(self, partition_id: str) -> Path:
        return self.out_dir / f"part-{partition_id}.parquet"

    def is_complete(self, partition_id: str) -> bool:
        """The md5-skip check (s3.py:128-132 analog): entry present, config
        unchanged, file bytes verify."""
        entry = self.manifest.get(partition_id)
        if not entry or entry.get("config_hash") != self.cfg_hash:
            return False
        path = self.partition_path(partition_id)
        if not path.exists():
            return False
        return _file_md5(path) == entry["content_hash"]

    def write_partition(self, partition_id: str, table: pa.Table) -> dict:
        """Atomic write (temp + rename) + manifest update. Returns the
        lineage entry."""
        path = self.partition_path(partition_id)
        tmp = path.with_suffix(".tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        entry = {
            "partition_id": partition_id,
            "config_hash": self.cfg_hash,
            "n_rows": table.num_rows,
            "content_hash": _file_md5(path),
        }
        self.manifest[partition_id] = entry
        self._flush()
        return entry

    def _flush(self) -> None:
        tmp = self.manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self.manifest, indent=1, sort_keys=True))
        os.replace(tmp, self.manifest_path)

    def run(
        self,
        partition_ids: list[str],
        compute: Callable[[str], pa.Table],
    ) -> dict:
        """Compute + write every incomplete partition; skip verified ones.
        Returns {written: [...], skipped: [...], total_rows: N}."""
        written, skipped, total = [], [], 0
        for pid in partition_ids:
            if self.is_complete(pid):
                skipped.append(pid)
                total += self.manifest[pid]["n_rows"]
                continue
            table = compute(pid)
            entry = self.write_partition(pid, table)
            written.append(pid)
            total += entry["n_rows"]
        return {"written": written, "skipped": skipped, "total_rows": total}


def write_tiles_resumable(
    tiles: "ray.data.Dataset", out_dir: str | Path, settings: dict | None = None
) -> dict:
    """Write a tiles dataset partitioned BY ZOOM (one parquet + manifest
    entry per z — a failed run resumes by skipping finished zoom levels).
    The tiles dataset is small (one row per tile), so per-zoom filters
    re-use the already-computed dataset without re-shuffling."""
    import pyarrow.compute as pc

    writer = PartitionedWriter(out_dir, settings)
    try:
        zs = sorted(tiles.unique("z"))
    except Exception:  # empty dataset -> nothing to partition
        zs = []
    tbl = None

    def compute(pid: str) -> pa.Table:
        nonlocal tbl
        if tbl is None:
            tbl = pa.concat_tables(
                [b for b in tiles.iter_batches(batch_format="pyarrow", batch_size=65536)]
            )
        return tbl.filter(pc.equal(tbl.column("z"), int(pid)))

    return writer.run([str(z) for z in zs], compute)
