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
2. **Gram-bucket rollup**: ONE token-scale exchange, keyed by
   ``gh % num_buckets`` — a SMALL-cardinality bucket key, not the
   near-unique hash itself.  Ray's ``groupby().aggregate()`` machinery
   runs Python per *group*; with grams (groups ~= rows) that is Python
   per row — measured ~400us/row on 2.49.2.  Bucketing instead gives
   ``map_groups`` a few hundred groups, and corpus-wide frequencies and
   per-doc duplicated-span counts are computed *inside* each bucket with
   two ``np.lexsort`` + ``reduceat`` passes (every occurrence of a gram
   hash lands in the same bucket, so in-bucket counts ARE corpus-wide
   counts).  This is the engine's established wide-op shape (the packed
   tile exchange, ``scan.py``'s bucketed prefix sums).
3. **Doc-bucket rollup**: each gram bucket emits per-doc partials for
   BOTH counters (total window multiplicity = the doc's span-count
   contribution, and duplicated-window multiplicity), so a second bucket
   exchange on ``doc_id % num_buckets`` finishes both sums in one pass —
   one corpus read total, zero-dup docs keep ``n_dup_spans = 0`` without
   an outer join, and no Ray join or AggregateFn appears in the DAG.

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


def _per_key_sums(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(unique keys, per-key sums) via one stable sort + ``reduceat``."""
    order = np.argsort(keys, kind="stable")
    ks, vs = keys[order], vals[order]
    new = np.empty(len(ks), dtype=bool)
    new[0] = True
    new[1:] = ks[1:] != ks[:-1]
    starts = np.nonzero(new)[0]
    return ks[starts], np.add.reduceat(vs, starts)


def _gh_bucket_rollup(t: pa.Table, flag_col: str = "n_dup_spans") -> pa.Table:
    """Inside one gram-hash bucket (which holds EVERY corpus occurrence of
    its gram hashes): corpus-wide count per gh via sort+reduceat, then
    per-doc sums of (a) ALL window multiplicities — the doc's span count
    contribution from this bucket — and (b) the multiplicities of the
    flagged grams: duplicated (c >= 2) for ``flag_col='n_dup_spans'``,
    corpus-unique (c == 1) for ``'n_uniq_spans'``.  Emitting both here
    makes the separate span-totals corpus pass unnecessary."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_spans": pa.array([], pa.int64()),
            flag_col: pa.array([], pa.int64()),
        }
    )
    if t.num_rows == 0:
        return empty
    gh = t.column("gh").to_numpy(zero_copy_only=False)
    k = t.column("k").to_numpy(zero_copy_only=False)
    doc = t.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.argsort(gh, kind="stable")
    ghs, ks, ds_ = gh[order], k[order], doc[order]
    new = np.empty(len(ghs), dtype=bool)
    new[0] = True
    new[1:] = ghs[1:] != ghs[:-1]
    starts = np.nonzero(new)[0]
    sizes = np.diff(np.append(starts, len(ghs)))
    totals = np.add.reduceat(ks, starts)
    c_per_row = np.repeat(totals, sizes)
    if flag_col == "n_uniq_spans":
        flag = (c_per_row == 1).astype(np.int64)
    else:
        flag = (c_per_row >= 2).astype(np.int64)
    d_ids, span_sums = _per_key_sums(ds_, ks)
    _, flag_sums = _per_key_sums(ds_, ks * flag)
    return pa.table(
        {
            "doc_id": pa.array(d_ids),
            "n_spans": pa.array(span_sums.astype(np.int64)),
            flag_col: pa.array(flag_sums.astype(np.int64)),
        }
    )


def _doc_bucket_rollup(t: pa.Table, flag_col: str = "n_dup_spans") -> pa.Table:
    """Inside one doc bucket: per-doc sums of both partial counters."""
    if t.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_spans": pa.array([], pa.int64()),
                flag_col: pa.array([], pa.int64()),
            }
        )
    doc = t.column("doc_id").to_numpy(zero_copy_only=False)
    ns = t.column("n_spans").to_numpy(zero_copy_only=False)
    nd = t.column(flag_col).to_numpy(zero_copy_only=False)
    ids, s1 = _per_key_sums(doc, ns)
    _, s2 = _per_key_sums(doc, nd)
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "n_spans": pa.array(s1.astype(np.int64)),
            flag_col: pa.array(s2.astype(np.int64)),
        }
    )


def _span_stats(ds, n: int, num_buckets: int | None, flag_col: str):
    """Shared two-exchange span-statistics driver (module docstring):
    gram partials -> gram-bucket rollup -> doc-bucket rollup, counting
    the grams selected by ``flag_col``'s frequency predicate."""
    if num_buckets is None:
        from cloudtile_ray.stages.util import default_num_buckets

        num_buckets = default_num_buckets(ds)

    def add_gh_bucket(t: pa.Table) -> pa.Table:
        b = t.column("gh").to_numpy(zero_copy_only=False) % num_buckets
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    grams = ds.map_batches(
        lambda b: add_gh_bucket(dup_ngram_partials(b, n)), batch_format="pyarrow"
    )
    parts = grams.groupby("bucket").map_groups(
        lambda t: _gh_bucket_rollup(t, flag_col), batch_format="pyarrow"
    )

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        b = t.column("doc_id").to_numpy(zero_copy_only=False) % num_buckets
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    return (
        parts.map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda t: _doc_bucket_rollup(t, flag_col), batch_format="pyarrow")
    )


def dup_ngram_stats(ds, n: int = 8, num_buckets: int | None = None) -> "ray.data.Dataset":
    """Per-document duplicated-span statistics:
    ``(doc_id, n_spans, n_dup_spans)`` where a span is duplicated iff its
    n-gram occurs >= 2 times corpus-wide (see module docstring for the
    distributed shape).  ``num_buckets`` sizes both bucket exchanges;
    default 4x cluster CPUs — raise it so one bucket's gram rows fit a
    worker's heap (rows/bucket ~= total grams / num_buckets)."""
    return _span_stats(ds, n, num_buckets, "n_dup_spans")


def novel_ngram_stats(
    ds, n: int = 8, num_buckets: int | None = None
) -> "ray.data.Dataset":
    """Per-document n-gram NOVELTY statistics — the complement signal to
    :func:`dup_ngram_stats` and the "fraction of unique n-grams" metric
    Lee et al. 2022 report when measuring memorization risk:
    ``(doc_id, n_spans, n_uniq_spans)`` where a span is novel iff its
    n-token gram occurs EXACTLY ONCE corpus-wide.  ``n_uniq_spans /
    n_spans`` near 1 marks genuinely fresh text; near 0 marks templated
    or duplicated content.  Identical distributed shape to
    ``dup_ngram_stats`` (two bucket exchanges, no gram strings moved);
    only the in-bucket frequency predicate differs (c == 1 vs c >= 2)."""
    return _span_stats(ds, n, num_buckets, "n_uniq_spans")


def _doc_token_lists(batch: pa.Table):
    """(tokens ListArray, numpy int64 offsets, doc_id array) for a batch —
    the split shared by the span-removal kernels."""
    toks = pc.split_pattern(batch.column("text").combine_chunks(), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy().astype(np.int64)
    return toks, offs


def _cut_covered_tokens(
    batch: pa.Table, covered_starts_of: "callable", n: int
) -> pa.Table:
    """Shared removal kernel: drop every token covered by a window start
    reported by ``covered_starts_of(gram_hashes, window_flat_positions)``
    (FLAT positions into the batch's concatenated token-hash array), then
    reassemble per-doc text.  Documents with zero surviving tokens
    disappear (matching the oracle's GROUP BY over surviving rows).

    Coverage is computed with one difference-array + cumsum over the flat
    token axis — windows never cross documents, so +1 at each covered
    window start and -1 at start+n marks exactly the covered tokens."""
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    if batch.num_rows == 0:
        return empty
    h, offs, _ids = _token_hashes(batch)
    toks = pc.split_pattern(batch.column("text").combine_chunks(), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    g, _doc_of = _window_gram_hashes(h, offs, n)
    # valid window FLAT start positions (the same validity mask
    # _window_gram_hashes applies internally)
    total = len(h)
    n_win = total - n + 1
    win_pos = np.empty(0, np.int64)
    if n_win > 0:
        pos_all = np.arange(n_win, dtype=np.int64)
        d_all = np.searchsorted(offs, pos_all, side="right") - 1
        valid = pos_all + n <= offs[d_all + 1]
        win_pos = pos_all[valid]
    diff = np.zeros(total + 1, np.int64)
    if len(g):
        hit_starts = covered_starts_of(g, win_pos)
        if len(hit_starts):
            np.add.at(diff, hit_starts, 1)
            np.add.at(diff, hit_starts + n, -1)
    covered = np.cumsum(diff[:-1]) > 0
    keep = ~covered
    kept_vals = toks.values.filter(pa.array(keep))
    cs = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
    new_offs = cs[offs]
    doc_kept = np.diff(new_offs)
    lists = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), kept_vals)
    out = pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text": pc.binary_join(lists, " "),
        }
    )
    return out.filter(pa.array(doc_kept > 0))


def remove_dup_ngram_spans(
    ds,
    n: int = 8,
    num_buckets: int | None = None,
    broadcast_byte_budget: int = 256 << 20,
) -> "ray.data.Dataset":
    """Exact-substring duplicate TEXT REMOVAL — the transform half of Lee
    et al. 2022 (this module's :func:`dup_ngram_stats` is the measurement
    half): cut every token covered by at least one n-token window whose
    gram occurs >= 2 times corpus-wide, reassemble the surviving tokens
    in order, and drop documents left empty.  This is the SYMMETRIC
    variant — every copy of a duplicated span is removed, including the
    first (Lee et al.'s suffix-array form keeps one copy; keep-one at
    span granularity needs a global occurrence order and is not
    reproducibly SQL-replayable, so the engine offers keep-first at
    chunk granularity via :func:`chunks.dedup_text_chunks` instead and
    documents the difference here).

    Scale shape: the duplicated-gram set D comes from the established
    (gh, k) partials + ONE bucket-exchange rollup (gram strings never
    move).  D is duplication-sized, not corpus-sized; when its measured
    bytes fit ``broadcast_byte_budget`` it broadcasts once per worker as
    a sorted hash array and each batch finishes its own documents with a
    ``searchsorted`` probe + difference-array coverage — zero further
    exchanges.  A corpus-scale D falls back to tagging window
    occurrences and D into one gh-bucket exchange (semi-join), packing
    each doc's covered starts into a binary blob (doc-bucket exchange),
    and ONE hash join against the original docs — text rides only that
    final join."""
    import ray

    from cloudtile_ray.stages.relational import (
        bucketed_group_aggregate,
        hash_join,
    )

    partials = ds.map_batches(
        lambda b: dup_ngram_partials(b, n).select(["gh", "k"]),
        batch_format="pyarrow",
    )
    dup_set = bucketed_group_aggregate(
        partials, ["gh"], [("k", "sum", "c")], num_buckets=num_buckets
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("c"), 2)).select(["gh"]),
        batch_format="pyarrow",
    ).materialize()

    if (dup_set.size_bytes() or 0) <= int(broadcast_byte_budget):
        tables = [t for t in ray.get(list(dup_set.to_arrow_refs())) if t.num_rows]
        ghs = (
            np.sort(
                np.concatenate(
                    [t.column("gh").to_numpy(zero_copy_only=False) for t in tables]
                )
            )
            if tables
            else np.empty(0, np.int64)
        )
        ref = ray.put(ghs)

        def per_batch(batch: pa.Table) -> pa.Table:
            dup = ray.get(ref)

            def covered(g: np.ndarray, win_pos: np.ndarray) -> np.ndarray:
                if len(dup) == 0:
                    return np.empty(0, np.int64)
                gi = g.view(np.int64)
                pos = np.searchsorted(dup, gi)
                hit = (pos < len(dup)) & (dup[np.minimum(pos, len(dup) - 1)] == gi)
                return win_pos[hit]

            return _cut_covered_tokens(batch, covered, n)

        return ds.map_batches(per_batch, batch_format="pyarrow")

    # ---- bucketed fallback: D too big to broadcast ----
    if num_buckets is None:
        from cloudtile_ray.stages.util import default_num_buckets

        num_buckets = default_num_buckets(ds)

    def win_rows(batch: pa.Table) -> pa.Table:
        """(doc_id, s, gh) per window — s is the DOC-RELATIVE start."""
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "gh": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        h, offs, ids = _token_hashes(batch)
        total = len(h)
        n_win = total - n + 1
        if n_win <= 0:
            return empty
        pos_all = np.arange(n_win, dtype=np.int64)
        d_all = np.searchsorted(offs, pos_all, side="right") - 1
        valid = pos_all + n <= offs[d_all + 1]
        g, doc_of = _window_gram_hashes(h, offs, n)
        s = pos_all[valid] - offs[d_all[valid]]
        gi = g.view(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_of]),
                "s": pa.array(s),
                "gh": pa.array(gi),
                "bucket": pa.array((gi % num_buckets).astype(np.int64)),
            }
        )

    def tag_dup(t: pa.Table) -> pa.Table:
        g = t.column("gh").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.full(len(g), -1, np.int64)),
                "s": pa.array(np.zeros(len(g), np.int64)),
                "gh": pa.array(g),
                "bucket": pa.array((g % num_buckets).astype(np.int64)),
            }
        )

    def semi_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        g = t.column("gh").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        is_dup = d == -1
        dset = np.unique(g[is_dup])
        wd, wg, ws = d[~is_dup], g[~is_dup], s[~is_dup]
        if len(dset) == 0 or len(wg) == 0:
            return empty
        pos = np.searchsorted(dset, wg)
        hit = (pos < len(dset)) & (dset[np.minimum(pos, len(dset) - 1)] == wg)
        return pa.table({"doc_id": pa.array(wd[hit]), "s": pa.array(ws[hit])})

    covered = (
        ds.map_batches(win_rows, batch_format="pyarrow")
        .union(dup_set.map_batches(tag_dup, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(lambda t: semi_bucket(t.drop_columns(["bucket"])), batch_format="pyarrow")
    )

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        b = t.column("doc_id").to_numpy(zero_copy_only=False) % num_buckets
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def pack_starts(t: pa.Table) -> pa.Table:
        """Per doc: sorted covered starts packed into one binary blob
        (int64 little-endian) — joinable through Arrow's hash join,
        which rejects list payloads."""
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "starts": pa.array([], pa.binary()),
            }
        )
        if t.num_rows == 0:
            return empty
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, d))
        d, s = d[order], s[order]
        new = np.r_[True, d[1:] != d[:-1]]
        starts_idx = np.flatnonzero(new)
        byte_offs = np.append(starts_idx, len(d)) * 8
        blob = s.astype("<i8").tobytes()
        return pa.table(
            {
                "doc_id": pa.array(d[starts_idx]),
                "starts": pa.BinaryArray.from_buffers(
                    pa.binary(),
                    len(starts_idx),
                    [
                        None,
                        pa.py_buffer(byte_offs.astype(np.int32).tobytes()),
                        pa.py_buffer(blob),
                    ],
                ),
            }
        )

    packed = (
        covered.map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda t: pack_starts(t.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
    )
    joined = hash_join(
        ds.select_columns(["doc_id", "text"]), packed, on=["doc_id"], how="left"
    )

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        if batch.num_rows == 0:
            return empty
        toks, offs = _doc_token_lists(batch)
        total = int(offs[-1])
        diff = np.zeros(total + 1, np.int64)
        blobs = batch.column("starts").combine_chunks()
        # vectorized blob decode: the binary column's value buffer is the
        # concatenation of every doc's little-endian int64 starts — one
        # frombuffer + gather, no per-row Python
        if blobs.null_count < len(blobs):
            boffs = np.frombuffer(blobs.buffers()[1], np.int32)[
                blobs.offset : blobs.offset + len(blobs) + 1
            ].astype(np.int64)
            lens = np.diff(boffs) // 8  # int64 entries per row
            if blobs.null_count:
                lens = np.where(np.asarray(blobs.is_null()), 0, lens)
            m = int(lens.sum())
            if m:
                flat = np.frombuffer(
                    blobs.buffers()[2], dtype="<i8", count=int(boffs[-1]) // 8
                )
                row_first = np.repeat(boffs[:-1] // 8, lens)
                within = np.arange(m) - np.repeat(
                    np.concatenate([[0], np.cumsum(lens)])[:-1], lens
                )
                rel = flat[row_first + within]
                st = rel + np.repeat(offs[:-1], lens)
                np.add.at(diff, st, 1)
                np.add.at(diff, st + n, -1)
        covered_m = np.cumsum(diff[:-1]) > 0
        keep = ~covered_m
        kept_vals = toks.values.filter(pa.array(keep))
        cs = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        new_offs = cs[offs]
        doc_kept = np.diff(new_offs)
        lists = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), kept_vals)
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pc.binary_join(lists, " "),
            }
        )
        return out.filter(pa.array(doc_kept > 0))

    return joined.map_batches(finish, batch_format="pyarrow")


def ngram_decontam(
    train_ds,
    eval_ds,
    n: int = 8,
    num_buckets: int | None = None,
    broadcast_byte_budget: int = 256 << 20,
) -> "ray.data.Dataset":
    """Train-vs-eval exact n-gram decontamination (the GPT-3-style
    n-gram overlap screen): per TRAIN document, ``(doc_id, n_spans,
    n_hit_spans)`` where a span hits iff its n-token gram occurs anywhere
    in the eval corpus.  ``n_hit_spans > 0`` flags a contaminated doc;
    the ratio is the span-level contamination fraction.

    Scale shape: both sides reduce to gram-hash partials batch-side (the
    :func:`dup_ngram_partials` kernel — SQL-replayable polynomial
    hashes, no gram strings ever move).  Routing gates on the MEASURED
    bytes of the eval side's distinct-gram table: an eval benchmark
    (10^4-10^6 docs) broadcasts its sorted gram-hash array once and each
    train batch finishes its own documents with one ``searchsorted`` —
    zero exchanges, because each row IS one document so no doc spans
    batches.  An eval side too big to broadcast falls back to tagging
    both sides into one gram-bucket exchange (train partials + eval
    distinct grams; every occurrence of a gram lands in one bucket) and
    a doc-bucket rollup — the :func:`dup_ngram_stats` shape."""
    import ray

    if num_buckets is None:
        from cloudtile_ray.stages.util import default_num_buckets

        num_buckets = default_num_buckets(train_ds)

    ev = eval_ds.map_batches(
        lambda b: dup_ngram_partials(b, n).select(["gh"]), batch_format="pyarrow"
    ).materialize()

    if (ev.size_bytes() or 0) <= int(broadcast_byte_budget):
        tables = [t for t in ray.get(list(ev.to_arrow_refs())) if t.num_columns]
        gh_ev = (
            np.unique(
                np.concatenate(
                    [t.column("gh").to_numpy(zero_copy_only=False) for t in tables]
                )
            )
            if tables
            else np.empty(0, np.int64)
        )
        ref = ray.put(gh_ev)

        def per_batch(b: pa.Table) -> pa.Table:
            p = dup_ngram_partials(b, n)
            if p.num_rows == 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "n_spans": pa.array([], pa.int64()),
                        "n_hit_spans": pa.array([], pa.int64()),
                    }
                )
            evs = ray.get(ref)
            g = p.column("gh").to_numpy(zero_copy_only=False)
            k = p.column("k").to_numpy(zero_copy_only=False)
            d = p.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(evs, g)
            hit = (pos < len(evs)) & (evs[np.minimum(pos, len(evs) - 1)] == g) if len(evs) else np.zeros(len(g), bool)
            ids, spans = _per_key_sums(d, k)
            _, hits = _per_key_sums(d, k * hit.astype(np.int64))
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "n_spans": pa.array(spans.astype(np.int64)),
                    "n_hit_spans": pa.array(hits.astype(np.int64)),
                }
            )

        return train_ds.map_batches(per_batch, batch_format="pyarrow")

    # bucketed fallback: one gram exchange, eval rows tagged with
    # doc_id = -1 (never a real id) so each bucket can split sides
    def tag_train(b: pa.Table) -> pa.Table:
        p = dup_ngram_partials(b, n)
        bkt = p.column("gh").to_numpy(zero_copy_only=False) % num_buckets
        return p.append_column("bucket", pa.array(bkt.astype(np.int64)))

    def tag_eval(t: pa.Table) -> pa.Table:
        g = t.column("gh").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.full(len(g), -1, np.int64)),
                "gh": pa.array(g),
                "k": pa.array(np.zeros(len(g), np.int64)),
                "bucket": pa.array((g % num_buckets).astype(np.int64)),
            }
        )

    def bucket_rollup(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_spans": pa.array([], pa.int64()),
                "n_hit_spans": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        g = t.column("gh").to_numpy(zero_copy_only=False)
        k = t.column("k").to_numpy(zero_copy_only=False)
        is_ev = d == -1
        tr_g, tr_k, tr_d = g[~is_ev], k[~is_ev], d[~is_ev]
        if len(tr_g) == 0:
            return empty
        evs = np.unique(g[is_ev])
        pos = np.searchsorted(evs, tr_g)
        hit = (
            (pos < len(evs)) & (evs[np.minimum(pos, len(evs) - 1)] == tr_g)
            if len(evs)
            else np.zeros(len(tr_g), bool)
        )
        ids, spans = _per_key_sums(tr_d, tr_k)
        _, hits = _per_key_sums(tr_d, tr_k * hit.astype(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_spans": pa.array(spans.astype(np.int64)),
                "n_hit_spans": pa.array(hits.astype(np.int64)),
            }
        )

    tagged = train_ds.map_batches(tag_train, batch_format="pyarrow").union(
        ev.map_batches(tag_eval, batch_format="pyarrow")
    )
    parts = tagged.groupby("bucket").map_groups(bucket_rollup, batch_format="pyarrow")

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        b = t.column("doc_id").to_numpy(zero_copy_only=False) % num_buckets
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def doc_rollup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_spans": pa.array([], pa.int64()),
                    "n_hit_spans": pa.array([], pa.int64()),
                }
            )
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = t.column("n_spans").to_numpy(zero_copy_only=False)
        h = t.column("n_hit_spans").to_numpy(zero_copy_only=False)
        ids, s1 = _per_key_sums(d, s)
        _, s2 = _per_key_sums(d, h)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_spans": pa.array(s1.astype(np.int64)),
                "n_hit_spans": pa.array(s2.astype(np.int64)),
            }
        )

    return (
        parts.map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(doc_rollup, batch_format="pyarrow")
    )
