"""General relational equi-joins between two Datasets.

The spatial joins in :mod:`cloudtile_ray.stages.join` (broadcast/shuffle
point-in-polygon, kNN) and the dedup anti-join
(:func:`cloudtile_ray.stages.dedup.anti_join_ids`) cover the engine's
geometry-driven paths; this module is the generic column-equality case —
attach embeddings to documents, metadata to crawl records.

Built directly on Ray Data's hash-partitioned ``Dataset.join`` (an
all-to-all exchange on the key: both sides shuffle by ``hash(key) %
num_partitions`` and each partition joins independently), so partition
count — not a broadcast — bounds per-task memory.  Use
``broadcast_semi_join``-style ``map_batches`` lookups instead when one
side is small enough for ``ray.put`` (see ``__ray_entry__.q_semi_broadcast``);
use this when BOTH sides are big.
"""

from __future__ import annotations

from typing import Optional, Sequence

_HOW = {
    "inner": "inner",
    "left": "left_outer",
    "right": "right_outer",
    "full": "full_outer",
    "semi": "left_semi",
    "anti": "left_anti",
}

_shuffle_patch_applied = False


def _patch_ray_hash_shuffle_schema_broadcast() -> None:
    """Fix a Ray 2.49 hash-shuffle defect that breaks ``Dataset.join``
    whenever a join input contains an empty block.

    The join operator broadcasts each side's schema to the aggregator
    actors via empty shards sent by the FIRST shuffle task of that side
    (``hash_shuffle.py:584``, ``send_empty_blocks=True``) and marks the
    side as broadcast as soon as that task is *submitted*.  Two composed
    defects break this: (a) ``_shuffle_block`` early-returns on zero-row
    blocks (``hash_shuffle.py:223``) without sending anything, and (b)
    Ray's hash aggregate emits ZERO-COLUMN empty blocks for partitions
    with no groups, so even broadcasting one would ship no schema.  When
    such a block is scheduled first — a groupby whose output partitions
    outnumber its groups makes this likely — the schema never reaches
    the aggregators, every join partition that received no real shard
    finalizes a zero-column table, and Arrow's join rejects it with "No
    match for key field".  (``map_batches`` cannot repair this either:
    Ray never invokes the UDF on empty blocks, and
    ``repartition(target_num_rows_per_block=...)`` forwards empty blocks
    too — both verified on 2.49.2.)

    The fix: drop zero-row blocks from every input bundle before the
    shuffle operator sees them (block metadata carries ``num_rows``, so
    this fetches nothing).  Empty blocks contribute no rows to any
    hash-shuffled op, and the schema broadcast then always rides a real
    block.  A side whose blocks are ALL empty still reproduces the
    upstream error — Ray cannot join a schema-less dataset — but that
    requires a genuinely empty join input.  Idempotent; applied lazily
    by :func:`hash_join`."""
    global _shuffle_patch_applied
    if _shuffle_patch_applied:
        return
    from ray.data._internal.execution.interfaces import RefBundle
    from ray.data._internal.execution.operators import hash_shuffle as hs

    original = hs.HashShufflingOperatorBase._do_add_input_inner

    def _do_add_input_inner_fixed(self, input_bundle, input_index):
        kept = [
            (ref, meta)
            for ref, meta in input_bundle.blocks
            if meta.num_rows is None or meta.num_rows > 0
        ]
        if len(kept) != len(input_bundle.blocks):
            if not kept:
                return
            input_bundle = RefBundle(
                blocks=tuple(kept),
                schema=input_bundle.schema,
                owns_blocks=input_bundle.owns_blocks,
            )
        return original(self, input_bundle, input_index)

    hs.HashShufflingOperatorBase._do_add_input_inner = _do_add_input_inner_fixed
    _shuffle_patch_applied = True


def hash_join(
    left,
    right,
    on: Sequence[str],
    right_on: Optional[Sequence[str]] = None,
    how: str = "inner",
    num_partitions: Optional[int] = None,
):
    """Join two Datasets on key columns.  ``how`` is one of
    inner/left/right/full/semi/anti (mapped onto Ray's join types).
    Project both sides down to needed columns BEFORE calling — every
    carried column rides the shuffle.  Arrow's hash join rejects nested
    (``list<...>``) payload columns: pre-project them to scalars, or pack
    them to a ``binary`` column and decode after the join.

    Applies :func:`_patch_ray_hash_shuffle_schema_broadcast` so inputs
    containing empty blocks (aggregated or filtered sides) join
    correctly."""
    if how not in _HOW:
        raise ValueError(f"how={how!r}; expected one of {sorted(_HOW)}")
    _patch_ray_hash_shuffle_schema_broadcast()
    if num_partitions is None:
        # Ray's join runs one aggregator pool sized to the partition
        # count; on a small cluster an oversized count stalls waiting for
        # actor slots.  Default to ~2 partitions per CPU (min 4) and let
        # big-data callers pass an explicit count sized to their data.
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(4, 2 * cpus)
    return left.join(
        right,
        join_type=_HOW[how],
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on is not None else None,
    )


def grouped_topk(
    ds,
    group_col: str,
    order_col: str,
    k: int,
    descending: bool = True,
    tie_col: Optional[str] = None,
):
    """Per-group top-``k`` rows — the distributed form of SQL's
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY order_col) <= k``
    (beyond-the-reference relational operator; the reference's only
    ordering is tippecanoe's in-tile feature order,
    /root/reference/src/cloudtile/tippecanoe.yaml:86-90).

    Scale shape: a batch-local combiner first cuts every batch to at most
    ``k`` rows per group present (one ``np.lexsort``, no Python loop), so
    the groupby shuffle moves at most ``k x groups x batches`` rows — not
    the corpus; a per-group ``map_groups`` then applies the same
    selection exactly.  Ties beyond ``tie_col`` would make the answer
    nondeterministic, so ``tie_col`` (ascending, must be unique per
    group, e.g. a row id) is required for an oracle-exact result."""
    import pyarrow as pa

    def _topk(batch: "pa.Table") -> "pa.Table":
        import numpy as np

        if batch.num_rows == 0:
            return batch
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(order_col).to_numpy(zero_copy_only=False)
        keys = [v]
        if tie_col is not None:
            keys = [batch.column(tie_col).to_numpy(zero_copy_only=False), v]
        if descending:
            keys[-1] = -keys[-1].astype(np.float64, copy=False) if v.dtype.kind == "f" else -v.astype(np.int64)
        # lexsort: last key is primary -> (group, order, tie)
        order = np.lexsort(keys + [g])
        gs = g[order]
        first = np.empty(len(gs), dtype=bool)
        first[0] = True
        first[1:] = gs[1:] != gs[:-1]
        starts = np.nonzero(first)[0]
        rank = np.arange(len(gs)) - np.repeat(starts, np.diff(np.append(starts, len(gs))))
        keep = order[rank < k]
        keep.sort()  # preserve input order within the batch
        return batch.take(pa.array(keep, type=pa.int64()))

    partial = ds.map_batches(_topk, batch_format="pyarrow")
    return partial.groupby(group_col).map_groups(_topk, batch_format="pyarrow")
