"""Corpus-wide duplicated n-gram span statistics — the measurement core of
exact-substring deduplication (Lee et al., "Deduplicating Training Data
Makes Language Models Better", ACL 2022: find every length-n token span
that occurs more than once across the corpus).

Beyond-the-reference training-data operator: the reference's only text
handling is attribute casting (/root/reference/src/cloudtile/tippecanoe.yaml:38-45);
span-level dedup is the standard companion to the doc-level MinHash /
SimHash operators in :mod:`cloudtile_ray.stages.dedup`.

Per document the operator reports ``n_spans`` (number of n-token windows)
and ``n_dup_spans`` (how many of those windows' n-grams occur >= 2 times
corpus-wide, including within-document repeats — exactly the spans
exact-substring dedup would cut).  ``n_dup_spans / n_spans`` is the
standard "duplicated text fraction" quality signal.

Scale shape (what each stage moves at 100 TB):

1. **Gram partials** (``map_batches``, streaming): tokenize with one Arrow
   ``split_pattern`` pass, hash every token once
   (:func:`cloudtile_ray.stages.util.poly_hash_strings` — the
   SQL-replayable base-1000003 polynomial hash proven by the
   ``simhash_pairs`` oracle), then form every window's 64-bit gram hash
   with ``n`` strided uint64 multiply-adds over the *flattened* hash
   array (the :func:`rolling_fingerprint_batch` technique — no per-doc
   Python).  Windows are pre-aggregated to ``(doc_id, gh, k)`` within the
   batch, so the shuffle moves one 24-byte row per *distinct* gram per
   doc-batch, never a gram string.
2. **Frequency**: ``groupby(gh).sum(k)`` — the one token-scale all-to-all,
   over fixed-width rows.
3. **Attach**: hash-partitioned :func:`~cloudtile_ray.stages.relational.hash_join`
   of the gram partials against the frequency table (both sides big ->
   shuffle join, never a broadcast; the full table, not a ``c >= 2``
   pre-filter, so a duplicate-free corpus never produces an all-empty
   join side — Ray 2.49 cannot schema-broadcast one).
4. **Rollup**: per-doc span totals from a separate streaming pass (one
   list-length kernel) are unioned with the per-doc duplicated-span
   partials and summed by ONE doc-sized ``groupby`` — zero-dup docs keep
   ``n_dup_spans = 0`` without an outer join.

The gram partials Dataset is consumed twice (frequency + attach); Ray
re-executes the lineage rather than materializing a token-scale
intermediate — two streaming corpus passes instead of pinning
O(tokens) in the object store.

Grouping on the 64-bit hash instead of the gram string is exact by
construction against the oracle: DuckDB replays the *same* polynomial
recurrence with HUGEINT arithmetic (see
``__ray_entry__.oracle_sql['dup_ngrams']``), so any collision collides
identically on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cloudtile_ray.stages.util import poly_hash_strings

_GRAM_B = np.uint64(1000003)


def _token_hashes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat token hashes, doc offsets into them, doc_ids) for a batch.

    Tokenization is ``split_pattern(text, " ")`` — the same convention as
    :class:`~cloudtile_ray.stages.dedup.SimHasher`, matching DuckDB's
    ``string_split(text, ' ')`` byte-for-byte on the pages/documents
    corpora."""
    words = pc.split_pattern(batch.column("text").combine_chunks(), pattern=" ")
    flat = words.flatten()
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    h = poly_hash_strings(flat)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    return h, offs, ids


def _window_gram_hashes(
    h: np.ndarray, offs: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """All within-document n-token window hashes over a flattened token-hash
    array: ``g = fold(g * B + h_tok) mod 2^64`` across the window — ``n``
    strided multiply-adds total, windows crossing a doc boundary masked
    out.  Returns (gram hashes, doc index of each window)."""
    total = len(h)
    n_win = total - n + 1
    if n_win <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    pows = _GRAM_B ** np.arange(n - 1, -1, -1, dtype=np.uint64)
    g = np.zeros(n_win, dtype=np.uint64)
    for j in range(n):
        g += h[j : j + n_win] * pows[j]
    win_pos = np.arange(n_win, dtype=np.int64)
    doc_of = np.searchsorted(offs, win_pos, side="right") - 1
    valid = win_pos + n <= offs[doc_of + 1]
    return g[valid], doc_of[valid]


def dup_ngram_partials(batch: pa.Table, n: int) -> pa.Table:
    """Batch combiner: ``(doc_id, gh, k)`` — each document's distinct
    window-gram hashes with within-doc multiplicity ``k`` (lexsort +
    run-length, no Python loop)."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "gh": pa.array([], pa.int64()),
            "k": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    h, offs, ids = _token_hashes(batch)
    g, doc_of = _window_gram_hashes(h, offs, n)
    if len(g) == 0:
        return empty
    d = ids[doc_of]
    order = np.lexsort((g, d))
    g, d = g[order], d[order]
    new = np.empty(len(g), dtype=bool)
    new[0] = True
    new[1:] = (g[1:] != g[:-1]) | (d[1:] != d[:-1])
    starts = np.nonzero(new)[0]
    k = np.diff(np.append(starts, len(g)))
    return pa.table(
        {
            "doc_id": pa.array(d[starts]),
            # int64 bit-reinterpretation of the uint64 hash: Ray's hash
            # aggregate/join keys need a signed type; grouping semantics
            # are unchanged (bijective view)
            "gh": pa.array(g[starts].view(np.int64)),
            "k": pa.array(k.astype(np.int64)),
        }
    )


def span_totals(batch: pa.Table, n: int) -> pa.Table:
    """Per-doc window counts ``(doc_id, n_spans)``; documents shorter than
    ``n`` tokens have no windows and are excluded (matching the SQL
    oracle's ``generate_series`` emitting nothing)."""
    if batch.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_spans": pa.array([], pa.int64())}
        )
    words = pc.split_pattern(batch.column("text"), pattern=" ")
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    spans = lens - n + 1
    keep = spans > 0
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids[keep]),
            "n_spans": pa.array(spans[keep]),
        }
    )


def dup_ngram_stats(ds, n: int = 8) -> "ray.data.Dataset":
    """Per-document duplicated-span statistics:
    ``(doc_id, n_spans, n_dup_spans)`` where a span is duplicated iff its
    n-gram occurs >= 2 times corpus-wide (see module docstring for the
    distributed shape)."""
    from ray.data.aggregate import Sum

    from cloudtile_ray.stages.relational import hash_join

    grams = ds.map_batches(
        lambda b: dup_ngram_partials(b, n), batch_format="pyarrow"
    )
    freq = (
        grams.map_batches(
            lambda t: t.select(["gh", "k"]), batch_format="pyarrow"
        )
        .groupby("gh")
        .aggregate(Sum("k", alias_name="c"))
    )
    # Join grams against the FULL frequency table (mirrors the oracle's
    # `JOIN freq USING (gh)`), not a pre-filtered duplicated-vocab side:
    # a corpus with zero duplicated grams would make that side entirely
    # empty, which Ray's hash join cannot schema-broadcast (see
    # relational._patch_ray_hash_shuffle_schema_broadcast).  The freq side
    # is distinct-gram-sized fixed-width rows — the same order as the
    # grams side already riding this shuffle.
    hits = hash_join(grams, freq, on=("gh",), how="inner")

    def dup_part(t: pa.Table) -> pa.Table:
        is_dup = pc.greater_equal(t.column("c"), 2)
        kdup = pc.if_else(is_dup, t.column("k"), pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "n_spans": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
                "n_dup_spans": pc.cast(kdup, pa.int64()),
            }
        )

    totals = ds.map_batches(lambda b: span_totals(b, n), batch_format="pyarrow")

    def tot_part(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "n_spans": pc.cast(t.column("n_spans"), pa.int64()),
                "n_dup_spans": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
            }
        )

    # zero-dup docs need no outer join: union the two partial streams and
    # let ONE doc-sized groupby sum both counters
    parts = totals.map_batches(tot_part, batch_format="pyarrow").union(
        hits.map_batches(dup_part, batch_format="pyarrow")
    )
    return parts.groupby("doc_id").aggregate(
        Sum("n_spans", alias_name="n_spans"),
        Sum("n_dup_spans", alias_name="n_dup_spans"),
    )
