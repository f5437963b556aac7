"""Distributed ordered prefix-sum (segmented scan) — the primitive behind
sequence packing for training (assign each document a position / chunk in
a global token stream ordered by a stable key).

Beyond-the-reference operator (the reference has no ordered computation
at all; its pipeline is per-file independent,
/root/reference/src/cloudtile/ecs.py:104-143).

Two-level scan, no global sort:

1. coarse range buckets ``order_col // bucket`` — per-bucket totals via
   ONE tiny ``groupby(bucket).sum`` (bucket-count rows reach the driver,
   never documents);
2. driver computes exclusive offsets over the sorted bucket list
   (O(n_buckets) — at 10^12 docs with bucket=10^6 that is 10^6 rows,
   megabytes) and broadcasts them once with ``ray.put``;
3. ONE hash shuffle on the bucket key; inside each group a lexsort +
   ``cumsum`` assigns exact global prefixes: offset[bucket] + local
   exclusive cumsum.

The result is a pure function of the input multiset — independent of
partitioning, block order or parallelism — so a resumed run packs
documents into byte-identical chunks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def ordered_prefix_sum(
    ds,
    val_col: str,
    order_col: str = "doc_id",
    bucket: int = 65536,
    out_col: str = "prefix",
):
    """Append ``out_col`` = exclusive prefix sum of ``val_col`` in global
    ``order_col`` order.  ``order_col`` must be a unique integer key."""
    from ray.data.aggregate import Sum

    def add_bucket(t: pa.Table) -> pa.Table:
        o = t.column(order_col).to_numpy().astype(np.int64)
        return t.append_column("_bkt", pa.array(o // bucket))

    # pin the scan input: both passes (bucket totals, then the bucketed
    # scan) consume it, and without materializing, the SECOND pass
    # re-executes the caller's entire upstream chain (for curated_pack
    # that meant running the dedup exchange twice — measured ~1.4 s of
    # pure recompute at sf0.1).  Callers pass the slim post-filter
    # projection (id + value columns, no text), so pinning is cheap even
    # at corpus scale; blocks spill to disk rather than hold heap.
    with_b = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()
    totals = (
        with_b.groupby("_bkt").aggregate(Sum(val_col, alias_name="_tot")).to_pandas()
    )
    totals = totals.sort_values("_bkt")
    bkts = totals["_bkt"].to_numpy().astype(np.int64)
    offs = np.concatenate(
        [[0], np.cumsum(totals["_tot"].to_numpy().astype(np.int64))[:-1]]
    )
    oref = ray.put((bkts, offs))

    def scan_group(g: pa.Table) -> pa.Table:
        bk, off = ray.get(oref)
        o = g.column(order_col).to_numpy().astype(np.int64)
        v = g.column(val_col).to_numpy().astype(np.int64)
        order = np.argsort(o, kind="stable")
        excl = np.zeros(len(v), dtype=np.int64)
        excl[order[1:]] = np.cumsum(v[order])[:-1]
        base = off[np.searchsorted(bk, o[0] // bucket)]
        out = g.append_column(out_col, pa.array(excl + base))
        return out.drop_columns(["_bkt"])

    return with_b.groupby("_bkt").map_groups(scan_group, batch_format="pyarrow")


def sequence_pack(
    ds,
    val_col: str = "n_chars",
    order_col: str = "doc_id",
    budget: int = 4096,
    bucket: int = 65536,
):
    """Sequence packing: assign each document the training-chunk id it
    starts in when documents are concatenated in ``order_col`` order and
    split every ``budget`` units — ``chunk_id = exclusive_prefix //
    budget``.  One prefix-sum pass (above) over the pinned slim
    projection; only bucket totals ever reach the driver."""

    def chunk(t: pa.Table) -> pa.Table:
        p = t.column("prefix").to_numpy()
        return t.append_column("chunk_id", pa.array((p // budget).astype(np.int64)))

    return ordered_prefix_sum(
        ds, val_col, order_col=order_col, bucket=bucket
    ).map_batches(chunk, batch_format="pyarrow")
