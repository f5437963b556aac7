"""Chunk-level (paragraph-proxy) dedup for training corpora.

Beyond-the-reference operator family (the reference has no text
processing at all; its row-level unit is a geographic feature,
/root/reference/src/cloudtile/geofile.py): large-scale curation removes
duplicated PASSAGES, not just duplicated documents — Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") dedup at
sub-document granularity and keep the first occurrence.  The corpora
here are single-line token streams, so the paragraph proxy is a fixed
``n_tokens`` window: explode every document into chunks, keep the
globally-first occurrence of each distinct chunk text (ordered by
(doc_id, chunk_idx) — reproducible under any parallelism), and
reassemble the surviving chunks back into documents.

Scale shape: the explode is a zero-copy offset re-slice of the Arrow
token buffers (no per-row Python, no value copies until the final
``binary_join``); keep-first routes through :func:`relational.grouped_topk`
(batch-local combiner, then ONE hash-bucket exchange on the chunk text —
chunk keys are near-unique, so Ray's per-group machinery is never
driven); reassembly is one more bucket exchange keyed by ``doc_id`` with
an Arrow ``binary_join`` per partition.  Two corpus-wide exchanges total
— the honest minimum for an exact global passage dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def explode_token_chunks(batch: pa.Table, n_tokens: int = 20) -> pa.Table:
    """(doc_id, text) rows -> (doc_id, chunk_idx, chunk) rows where
    ``chunk`` is the space-join of the doc's tokens [i*n : (i+1)*n) —
    identical to DuckDB's
    ``string_split(text, ' ')`` + ``FLOOR((i-1)/n)`` + ordered
    ``string_agg`` (the oracle), including the trailing short chunk.

    Vectorized: the token ListArray's offset buffer is re-sliced into
    chunk offsets with one repeat/cumsum build; chunk strings come from
    ``pc.binary_join`` over a ListArray that SHARES the token values
    buffer (zero-copy until the join materializes the chunk text)."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.string()),
            }
        )
    toks = pc.split_pattern(batch.column("text").combine_chunks(), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    loffs = np.frombuffer(toks.buffers()[1], np.int32)[
        toks.offset : toks.offset + len(toks) + 1
    ].astype(np.int64)
    n_toks = np.diff(loffs)
    n_chunks = (n_toks + n_tokens - 1) // n_tokens  # empty list -> 0 chunks
    total = int(n_chunks.sum())
    if total == 0:
        return explode_token_chunks(batch.slice(0, 0), n_tokens)
    # chunk start offsets: doc start + n_tokens * (rank within doc)
    doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_chunks)
    starts_of_doc = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
    chunk_idx = np.arange(total, dtype=np.int64) - starts_of_doc[doc_of]
    chunk_starts = loffs[doc_of] + chunk_idx * n_tokens
    chunk_offsets = np.append(chunk_starts, loffs[-1])
    chunk_list = pa.ListArray.from_arrays(
        pa.array(chunk_offsets, pa.int32()), toks.values
    )
    chunks = pc.binary_join(chunk_list, " ")
    return pa.table(
        {
            "doc_id": pc.take(
                batch.column("doc_id"), pa.array(doc_of, pa.int64())
            ),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "chunk": chunks,
        }
    )


def _reassemble_docs(ds, num_buckets: int | None = None):
    """(doc_id, chunk_idx, chunk) Dataset -> (doc_id, text) Dataset:
    one hash-bucket exchange on doc_id, then per partition a lexsort by
    (doc_id, chunk_idx) and an Arrow ``binary_join`` over the per-doc
    chunk lists — no per-doc Python."""
    if num_buckets is None:
        from cloudtile_ray.stages.util import default_num_buckets

        num_buckets = default_num_buckets(ds)

    def add_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_part", pa.array([], pa.int64()))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (ids * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        return t.append_column("_part", pa.array(part.astype(np.int64)))

    def per_part(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_part"]).combine_chunks()
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                }
            )
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        cix = g.column("chunk_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((cix, ids))
        ids_s = ids[order]
        new_doc = np.r_[True, ids_s[1:] != ids_s[:-1]]
        doc_starts = np.flatnonzero(new_doc)
        offsets = np.append(doc_starts, len(ids_s))
        chunks_sorted = g.column("chunk").take(pa.array(order))
        if isinstance(chunks_sorted, pa.ChunkedArray):
            chunks_sorted = chunks_sorted.combine_chunks()
        doc_lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), chunks_sorted
        )
        return pa.table(
            {
                "doc_id": pa.array(ids_s[doc_starts], pa.int64()),
                "text": pc.binary_join(doc_lists, " "),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def _distinct_doc_chunks(t: pa.Table) -> pa.Table:
    """Batch-side (doc_id, chunk) distinct -> one ``chunk`` row per
    document that contains it.  A document's chunks are all emitted in
    the batch holding its row, so batch-local distinct IS globally
    distinct per (doc, chunk) — summing row counts per chunk downstream
    yields the exact document frequency with no distinct-aggregate."""
    if t.num_rows == 0:
        return pa.table({"chunk": pa.array([], pa.string())})
    d = t.group_by(["doc_id", "chunk"]).aggregate([])
    return d.select(["chunk"])


def strip_frequent_chunks(
    ds,
    n_tokens: int = 20,
    max_df: int = 1,
    broadcast_byte_budget: int = 64 << 20,
    num_buckets: int | None = None,
):
    """CCNet-style boilerplate removal at passage granularity: drop every
    ``n_tokens``-token chunk whose document frequency (count of DISTINCT
    documents containing it) exceeds ``max_df``, and reassemble the
    surviving chunks into documents.  Wenzek et al. 2020 (CCNet) strip
    lines shared across many pages; the corpora here are single-line
    token streams, so the line proxy is the fixed token window (same
    chunking as :func:`dedup_text_chunks` — and unlike keep-first dedup,
    a repeated chunk is removed from EVERY document, including the
    first).  Documents whose every chunk is boilerplate disappear.

    Scale shape: df is computed without ever moving a chunk twice —
    batch-side (doc, chunk) distinct (exact because a doc lives in one
    row), then :func:`relational.bucketed_group_aggregate` sums the
    per-doc rows per chunk in ONE hash-bucket exchange with Arrow C++
    aggregation.  The frequent set (df > max_df) is boilerplate-sized,
    not corpus-sized: when its measured bytes fit
    ``broadcast_byte_budget`` it broadcasts once per worker and each
    batch drops its own rows with an Arrow ``is_in`` probe (zero extra
    exchanges); a pathological frequent set falls back to a
    hash-partitioned ANTI join on the chunk text.  Reassembly is the
    shared one-exchange ``binary_join`` pass."""
    import ray

    from cloudtile_ray.stages.relational import bucketed_group_aggregate, hash_join

    exploded = ds.map_batches(
        lambda t: explode_token_chunks(t, n_tokens), batch_format="pyarrow"
    )
    pairs = exploded.map_batches(_distinct_doc_chunks, batch_format="pyarrow")
    df = bucketed_group_aggregate(
        pairs, ["chunk"], [("chunk", "count", "df")], num_buckets=num_buckets
    )
    frequent = df.map_batches(
        lambda t: t.filter(pc.greater(t.column("df"), max_df)).select(["chunk"]),
        batch_format="pyarrow",
    ).materialize()

    if (frequent.size_bytes() or 0) <= int(broadcast_byte_budget):
        tables = [
            t for t in ray.get(list(frequent.to_arrow_refs())) if t.num_rows
        ]
        bad = (
            pa.concat_tables(tables).column("chunk").combine_chunks()
            if tables
            else pa.array([], pa.string())
        )
        ref = ray.put(bad)

        def drop_frequent(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            bad_arr = ray.get(ref)
            if len(bad_arr) == 0:
                return t
            keep = pc.invert(pc.is_in(t.column("chunk"), value_set=bad_arr))
            return t.filter(keep)

        kept = exploded.map_batches(drop_frequent, batch_format="pyarrow")
    else:
        kept = hash_join(exploded, frequent, on=["chunk"], how="anti")
    return _reassemble_docs(kept, num_buckets=num_buckets)


def dedup_text_chunks(ds, n_tokens: int = 20):
    """Exact passage-level dedup, keep-first (Lee et al. 2022 shape):
    explode documents into ``n_tokens``-token chunks, keep the first
    occurrence of every distinct chunk text (first = smallest
    (doc_id, chunk_idx) — partition- and parallelism-independent),
    reassemble survivors into (doc_id, text).  Documents whose every
    chunk was seen earlier disappear entirely, matching the SQL oracle's
    ``row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx)``
    + grouped ordered ``string_agg``."""
    from cloudtile_ray.stages.relational import grouped_topk

    exploded = ds.map_batches(
        lambda t: explode_token_chunks(t, n_tokens), batch_format="pyarrow"
    )
    kept = grouped_topk(
        exploded,
        group_col="chunk",
        order_col="doc_id",
        k=1,
        descending=False,
        tie_col="chunk_idx",
    )
    return _reassemble_docs(kept)
