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


def hash_join(
    left,
    right,
    on: Sequence[str],
    right_on: Optional[Sequence[str]] = None,
    how: str = "inner",
    num_partitions: int = 64,
):
    """Join two Datasets on key columns.  ``how`` is one of
    inner/left/right/full/semi/anti (mapped onto Ray's join types).
    Project both sides down to needed columns BEFORE calling — every
    carried column rides the shuffle.  Arrow's hash join rejects nested
    (``list<...>``) payload columns: pre-project them to scalars, or pack
    them to a ``binary`` column and decode after the join."""
    if how not in _HOW:
        raise ValueError(f"how={how!r}; expected one of {sorted(_HOW)}")
    return left.join(
        right,
        join_type=_HOW[how],
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on is not None else None,
    )
