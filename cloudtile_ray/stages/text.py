"""Text-analysis stages for the web-page corpus: token counting, quality
scoring, language-ID, document fingerprinting. All stateless
``map_batches`` transforms; the hot kernels are Arrow compute / numpy
vectorized ops (no Python row loops — the only remaining per-row work is
``hashlib.md5``, which has no vectorized form).

These are the "beyond the reference" training-data-pipeline operators the
build brief requires as first-class components; the reference's only text
handling is attribute casting (/root/reference/src/cloudtile/tippecanoe.yaml:38-45).

Exactness notes (for the DuckDB oracles): ``n_tokens`` is computed as
``count(' ') + 1`` which equals DuckDB's
``length(text) - length(replace(text, ' ', '')) + 1`` for any text;
``alpha_chars`` equals ``length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))``;
``fingerprint`` is hex MD5, equal to DuckDB's ``md5(text)``;
``rolling_fp`` is the min over 16-byte windows of a base-1000003
polynomial hash mod 2^64 — reproduced exactly in SQL with HUGEINT
arithmetic and precomputed power-of-base literals (see
``__ray_entry__.oracle_sql['rolling_fp']``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cloudtile_ray.stages.util import stable_hash_strings


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """Append ``n_tokens`` (single-space separated, matching the corpus
    format) and ``n_chars_actual``."""
    text = batch.column("text")
    spaces = pc.count_substring(text, pattern=" ")
    n_tokens = pc.add(spaces, 1)
    out = batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    out = out.append_column(
        "n_chars_actual", pc.cast(pc.utf8_length(text), pa.int64())
    )
    return out


def quality_batch(batch: pa.Table) -> pa.Table:
    """Append quality-score columns: alpha_chars, alpha_ratio,
    mean_token_len.  Pure Arrow kernels (``count_substring_regex`` for the
    alpha count — no pandas detour); ratios are single divisions of exact
    integers, so they are bit-identical to the SQL oracle's."""
    text = batch.column("text")
    alpha = pc.cast(
        pc.count_substring_regex(text, pattern="[a-zA-Z]"), pa.int64()
    ).to_numpy(zero_copy_only=False)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(zero_copy_only=False)
    spaces = pc.cast(
        pc.count_substring(text, pattern=" "), pa.int64()
    ).to_numpy(zero_copy_only=False)
    n_tokens = spaces + 1
    out = batch.append_column("alpha_chars", pa.array(alpha))
    out = out.append_column(
        "alpha_ratio", pa.array(alpha / np.maximum(n_chars, 1))
    )
    out = out.append_column(
        "mean_token_len", pa.array((n_chars - spaces) / np.maximum(n_tokens, 1))
    )
    return out


class LangId:
    """Actor-pool language-ID: stopword-profile heuristic, batch-vectorized.
    Profiles are interned once per actor (``__init__``); per batch the
    tokenization is Arrow (lower -> strip non-alpha -> split), the unique
    (doc, word) pairs come from one ``np.unique``, and per-language scores
    are ``np.bincount`` sums — no per-doc Python loop."""

    PROFILES = {
        "en": {"the", "and", "of", "a", "to", "in", "is", "that", "it", "for"},
        "es": {"el", "la", "de", "que", "y", "en", "un", "es", "no", "por"},
        "fr": {"le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"},
        "de": {"der", "die", "und", "das", "ist", "von", "ein", "mit", "den", "zu"},
        "pt": {"o", "a", "de", "que", "e", "em", "um", "para", "com", "uma"},
    }

    def __init__(self):
        self.langs = list(self.PROFILES)
        self.profiles = [frozenset(self.PROFILES[k]) for k in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        if n_docs == 0:
            out = batch.append_column("lang_pred", pa.array([], pa.string()))
            return out.append_column("lang_score", pa.array([], pa.float64()))
        cleaned = pc.replace_substring_regex(
            pc.utf8_lower(batch.column("text").combine_chunks()),
            pattern="[^a-z]+",
            replacement=" ",
        )
        words_list = pc.split_pattern(cleaned, pattern=" ")
        flat = words_list.flatten().to_numpy(zero_copy_only=False)
        offs = words_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
        nonempty = flat != ""
        flat, doc_of = flat[nonempty], doc_of[nonempty]
        import pandas as pd

        codes, uniques = pd.factorize(flat)
        # unique (doc, word) pairs — set semantics per doc
        pair_key = doc_of * np.int64(len(uniques) + 1) + codes
        upairs = np.unique(pair_key)
        u_doc = upairs // np.int64(len(uniques) + 1)
        u_code = upairs % np.int64(len(uniques) + 1)
        scores = np.zeros((n_docs, len(self.langs)), dtype=np.float64)
        uniques_arr = np.asarray(uniques, dtype=object)
        for li, prof in enumerate(self.profiles):
            in_prof = np.fromiter(
                (w in prof for w in uniques_arr), dtype=bool, count=len(uniques_arr)
            )
            m = in_prof[u_code]
            counts = np.bincount(u_doc[m], minlength=n_docs)
            scores[:, li] = counts / len(prof)
        best = scores.argmax(axis=1)
        best_score = scores[np.arange(n_docs), best]
        preds = np.where(
            best_score > 0, np.asarray(self.langs, dtype=object)[best], "und"
        )
        out = batch.append_column(
            "lang_pred", pa.array(preds.tolist(), pa.string())
        )
        out = out.append_column("lang_score", pa.array(best_score))
        return out


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Hex-MD5 content fingerprint per document — the direct analog of the
    reference's md5-based content addressing
    (/root/reference/src/cloudtile/s3.py:211-227), per row instead of per
    file. Exactly DuckDB's ``md5(text)``."""
    texts = batch.column("text").to_pylist()
    fp = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("fingerprint", pa.array(fp, pa.string()))


_ROLL_B = np.uint64(1000003)


def rolling_fingerprint_batch(batch: pa.Table, window: int = 16) -> pa.Table:
    """Winnowing-style rolling-hash fingerprint: min of a polynomial rolling
    hash over byte windows (mod 2^64) — robust to local edits (used for
    near-dup candidate blocking).  Batch-vectorized: one concatenated byte
    buffer, ``window`` strided adds (no per-doc Python except the rare
    shorter-than-window fold)."""
    texts = batch.column("text").to_pylist()
    n_docs = len(texts)
    out = np.empty(n_docs, dtype=np.uint64)
    bufs = [t.encode("utf-8") for t in texts]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    short = lens < window
    for i in np.nonzero(short)[0]:
        h = np.uint64(0)
        for c in bufs[int(i)]:
            h = h * _ROLL_B + np.uint64(c)
        out[int(i)] = h
    long_idx = np.nonzero(~short)[0]
    if len(long_idx):
        lbufs = [bufs[int(i)] for i in long_idx]
        llens = lens[long_idx]
        buf = np.frombuffer(b"".join(lbufs), dtype=np.uint8)
        starts = np.concatenate([[0], np.cumsum(llens)])
        n_win = len(buf) - window + 1
        pows = _ROLL_B ** np.arange(window - 1, -1, -1, dtype=np.uint64)
        h = np.zeros(n_win, dtype=np.uint64)
        for j in range(window):
            h += buf[j : j + n_win].astype(np.uint64) * pows[j]
        win_pos = np.arange(n_win, dtype=np.int64)
        doc_of = np.searchsorted(starts, win_pos, side="right") - 1
        valid = win_pos <= starts[doc_of] + llens[doc_of] - window
        # invalid (cross-doc) windows must never win the min
        h = np.where(valid, h, np.uint64(0xFFFFFFFFFFFFFFFF))
        out[long_idx] = np.minimum.reduceat(h, starts[:-1])
    return batch.append_column("rolling_fp", pa.array(out))


def token_count_partials(batch: pa.Table) -> pa.Table:
    """Per-batch token-frequency partials — the combiner half of the
    heavy-hitters operator: lowercase, split on non-alphanumeric runs
    (Arrow RE2 kernel, identical semantics to DuckDB's
    ``regexp_split_to_array(lower(text), '[^a-z0-9]+')``), then collapse
    to (tok, n) with ``value_counts`` so the shuffle moves one row per
    distinct token per batch instead of one per occurrence."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(batch.column("text")), pattern="[^a-z0-9]+"
    )
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    flat = flat.filter(pc.not_equal(flat, ""))
    vc = pc.value_counts(flat)
    return pa.table(
        {
            "tok": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        }
    )


def heavy_hitters(ds, k: int = 20) -> "ray.data.Dataset":
    """Exact top-``k`` most frequent tokens across the corpus
    (beyond-the-reference training-data operator; the reference's only
    text handling is attribute casting,
    /root/reference/src/cloudtile/tippecanoe.yaml:38-45).

    Shape: batch-local partial counts (above) -> one hash-partitioned
    ``groupby(tok).sum`` over the vocabulary (corpus-sized input collapses
    to vocab-sized — the partial pre-agg is what keeps the shuffle small)
    -> distributed sort on (n desc, tok asc) -> ``limit(k)``.  The sort
    runs over the aggregated vocab table, not the corpus; ties at the
    rank-k boundary are broken by token so the answer is deterministic.
    """
    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(token_count_partials, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
    )
    return counts.sort(["n", "tok"], descending=[True, False]).limit(k)


def mask_rare_tokens(ds, vocab_size: int = 20, unk: str = "<unk>"):
    """Vocabulary truncation — the classic fixed-vocab preprocessing step:
    keep the ``vocab_size`` most frequent tokens (ties broken by token
    text, so the cut is a total order and deterministic), replace every
    other token with ``unk``, and return ``(doc_id, text, n_unk)`` with
    the document's token order preserved.

    Tokenization is ``string_split(text, ' ')`` (NOT the regexp
    tokenizer) so that ``binary_join(' ')`` is its exact inverse and the
    masked text round-trips byte-for-byte against DuckDB's
    ``string_agg(tok, ' ' ORDER BY pos)`` oracle.

    Scale shape: batch-local ``value_counts`` partials collapse the
    corpus to vocab-sized rows before ONE hash-partitioned
    ``groupby(tok).sum`` (the :func:`heavy_hitters` shape); the top-V cut
    sorts the *aggregated vocab table* only.  The kept set is
    ``vocab_size`` rows by construction — broadcast once via ``ray.put``
    — and the masking pass is a zero-shuffle ``map_batches``: one Arrow
    ``is_in`` probe over the flattened token values, ``if_else`` on the
    shared buffer, re-list on the original offsets, ``binary_join``.
    Per-doc ``n_unk`` falls out of a ``sum`` over the list-shaped mask —
    no per-row Python anywhere."""
    import ray
    from ray.data.aggregate import Sum

    def space_count_partials(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "tok": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    keep_tbl = (
        ds.map_batches(space_count_partials, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "tok"], descending=[True, False])
        .limit(vocab_size)
    )
    kept = pa.array([r["tok"] for r in keep_tbl.take(vocab_size)], pa.string())
    ref = ray.put(kept)

    def mask_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                    "n_unk": pa.array([], pa.int64()),
                }
            )
        keep_set = ray.get(ref)
        toks = pc.split_pattern(
            batch.column("text").combine_chunks(), pattern=" "
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        in_vocab = pc.is_in(flat, value_set=keep_set)
        masked = pc.if_else(in_vocab, flat, pa.scalar(unk, pa.string()))
        relist = pa.ListArray.from_arrays(toks.offsets, masked)
        # per-doc OOV counts: prefix-sum difference over the list offsets
        # (handles empty docs, unlike reduceat on repeated indices)
        offs = toks.offsets.to_numpy().astype(np.int64)
        oov = np.concatenate(
            [[0], np.cumsum(~in_vocab.to_numpy(zero_copy_only=False))]
        )
        n_unk = oov[offs[1:]] - oov[offs[:-1]]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pc.binary_join(relist, " "),
                "n_unk": pa.array(n_unk.astype(np.int64)),
            }
        )

    return ds.map_batches(mask_batch, batch_format="pyarrow")


def keyword_rank(ds, terms: list[str], k: int = 20):
    """Retrieval-style ranked keyword search: score every document by
    ``sum_i tf(term_i, doc) / df(term_i)`` (term frequency weighted by
    inverse document frequency — the log-free tf-idf core; ln is
    deliberately avoided because DuckDB's and libm's ``ln`` are not
    bit-identical, while IEEE division and fixed-order addition are) and
    return the global top-``k`` by ``(score DESC, doc_id)``.

    Float determinism contract: each per-term ``tf/df`` is one
    correctly-rounded IEEE-754 division, and the terms are accumulated
    LEFT TO RIGHT in the caller's ``terms`` order on both sides (the SQL
    oracle spells the additions out per term in the same order), so the
    score is bit-identical between numpy and DuckDB — ties and the
    rank-k boundary cannot diverge.

    Scale shape: pass 1 reduces each batch to one ``(term, df)`` partial
    row per term (documents never leave the batch) and the final df
    table is ``len(terms)`` rows — driver-collected and closed over by
    the scoring pass.  Pass 2 emits only hit documents, and the global
    top-k routes through :func:`relational.grouped_topk` (batch-local
    top-k combiner, so the exchange moves at most ``k x batches`` rows)
    under a single constant group."""
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    terms = list(terms)

    def _per_doc_term_counts(batch: pa.Table) -> tuple:
        toks = pc.split_pattern(
            batch.column("text").combine_chunks(), pattern=" "
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        offs = toks.offsets.to_numpy().astype(np.int64)
        tfs = []
        for term in terms:
            eq = pc.equal(flat, term)
            cs = np.concatenate(
                [[0], np.cumsum(eq.to_numpy(zero_copy_only=False))]
            )
            tfs.append(cs[offs[1:]] - cs[offs[:-1]])
        return tfs

    def df_partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        tfs = _per_doc_term_counts(batch)
        return pa.table(
            {
                "term": pa.array(terms),
                "df": pa.array(
                    [int((tf > 0).sum()) for tf in tfs], pa.int64()
                ),
            }
        )

    df_rows = (
        ds.map_batches(df_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .take(len(terms))
    )
    df_of = {r["term"]: r["df"] for r in df_rows}
    dfs = [df_of.get(t, 0) for t in terms]

    def score_batch(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        tfs = _per_doc_term_counts(batch)
        score = np.zeros(batch.num_rows, np.float64)
        hit = np.zeros(batch.num_rows, bool)
        for tf, df in zip(tfs, dfs):
            if df > 0:
                # left-to-right accumulation — see determinism contract
                score = score + tf.astype(np.float64) / np.float64(df)
            hit |= tf > 0
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score": pa.array(score),
            }
        )
        return out.filter(pa.array(hit))

    from cloudtile_ray.stages.relational import grouped_topk

    scored = ds.map_batches(score_batch, batch_format="pyarrow").map_batches(
        lambda t: t.append_column(
            "_g", pa.array(np.zeros(t.num_rows, np.int64))
        ),
        batch_format="pyarrow",
    )
    top = grouped_topk(
        scored, group_col="_g", order_col="score", k=k, descending=True,
        tie_col="doc_id",
    )
    return top.map_batches(
        lambda t: t.drop_columns(["_g"]), batch_format="pyarrow"
    )


def token_repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-document token-repetition stats (Gopher-style repetition
    signals for quality filtering): ``n_tokens``, ``n_unique`` and
    ``top_tok_n`` (occurrences of the most frequent token).  Purely
    integer outputs so the DuckDB oracle (``string_split`` + unnest +
    two GROUP BYs) matches bit-for-bit.

    Vectorized shape: one Arrow literal-space split, ``dictionary_encode``
    to integer token codes (C++ hash table, no Python string loop), then
    a single ``np.unique`` over ``doc_index * vocab + code`` composite
    keys and ``np.maximum.reduceat`` over the grouped counts.  Stateless
    per-batch — each document sits wholly inside one row, so the stats
    never cross batches and the stage needs no shuffle at all."""
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    de = flat.dictionary_encode()
    codes = de.indices.to_numpy().astype(np.int64)
    vocab = len(de.dictionary)
    parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    pair, cnt = np.unique(parent * max(vocab, 1) + codes, return_counts=True)
    pu = pair // max(vocab, 1)
    starts = np.flatnonzero(np.r_[True, pu[1:] != pu[:-1]])
    n_unique = np.zeros(len(lens), dtype=np.int64)
    top = np.zeros(len(lens), dtype=np.int64)
    if len(pair):
        owners = pu[starts]
        n_unique[owners] = np.diff(np.r_[starts, len(pu)])
        top[owners] = np.maximum.reduceat(cnt, starts)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(lens),
            "n_unique": pa.array(n_unique),
            "top_tok_n": pa.array(top),
        }
    )


def doc_term_freqs(batch: pa.Table) -> pa.Table:
    """Explode each document into unique ``(doc_id, tk, tf)`` rows — the
    map side of :func:`top_terms`.  Same dictionary-encode machinery as
    :func:`token_repetition_batch`; output is one row per distinct token
    per document (so downstream ``groupby(tk).count`` IS document
    frequency — no count-distinct needed)."""
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    de = flat.dictionary_encode()
    codes = de.indices.to_numpy().astype(np.int64)
    vocab = max(len(de.dictionary), 1)
    parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    pair, cnt = np.unique(parent * vocab + codes, return_counts=True)
    doc_ids = batch.column("doc_id").to_numpy()[pair // vocab]
    tk = pc.take(de.dictionary, pa.array(pair % vocab))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "tk": tk,
            "tf": pa.array(cnt.astype(np.int64)),
        }
    )


def top_terms(ds) -> "ray.data.Dataset":
    """Per-document most-DISTINCTIVE term: the token maximising
    ``(tf DESC, df ASC, tk ASC)`` — highest in-document frequency, rarest
    across the corpus, lexicographic tie-break.  The classic TF-IDF
    argmax reshaped to pure integer ordering so the DuckDB oracle
    (window ``row_number()`` over the same triple) matches exactly —
    float ``ln()`` scores are NOT bit-portable across engines, integer
    triples are.

    Scale shape: per-batch explode to unique (doc, tk, tf) rows (combiner
    above) -> document frequency via ``groupby(tk).count`` (vocab-sized
    result, combiner-backed — a stopword's count folds in partials, it
    never assembles its 10^12 member rows anywhere) -> df attached by a
    hash-partitioned ``Dataset.join`` on tk (per-task memory bounded by
    partition count, not by the hottest token) -> ONE doc-bucket exchange
    picking every bucket's per-doc argmax with Arrow's C++ multi-key sort
    (doc ids are near-unique keys, so this avoids both Ray's per-group
    AggregateFn Python and a per-doc ``map_groups`` call — see
    ``relational.bucketed_group_aggregate`` for the measured cost).  An
    earlier draft attached df with ``groupby(tk).map_groups``; that
    materializes every document containing 'the' in ONE task at web
    scale — the join keeps hot tokens streaming."""
    from cloudtile_ray.stages.relational import bucketed_group_aggregate, hash_join
    from cloudtile_ray.stages.util import default_num_buckets

    num_buckets = default_num_buckets(ds)

    freqs = ds.map_batches(doc_term_freqs, batch_format="pyarrow")
    dfs = bucketed_group_aggregate(
        freqs, ["tk"], [("doc_id", "count", "df")]
    ).materialize()
    # df attach: the df table is vocab-sized — BROADCAST it (ray.put once,
    # index_in per batch: freqs never shuffle) while its measured bytes
    # fit the budget; a web-scale heavy-tail vocab (distinct tokens can
    # reach 10^8-10^9) exceeds it and falls back to the hash-partitioned
    # join (per-task memory bounded by partition count, hot tokens keep
    # streaming — see the earlier map_groups caveat below).
    df_budget = 256 << 20
    if (dfs.size_bytes() or 0) <= df_budget:
        import ray

        df_tbl = pa.concat_tables(
            [t for t in ray.get(list(dfs.to_arrow_refs())) if t.num_columns]
        ).combine_chunks()
        dref = ray.put(df_tbl)

        def attach_df(t: pa.Table) -> pa.Table:
            lut = ray.get(dref)
            idx = pc.index_in(
                t.column("tk").combine_chunks(), value_set=lut.column("tk")
            )
            return t.append_column("df", pc.take(lut.column("df"), idx))

        with_df = freqs.map_batches(attach_df, batch_format="pyarrow")
    else:
        with_df = hash_join(freqs, dfs, on=("tk",))

    def add_bkt(t: pa.Table) -> pa.Table:
        b = t.column("doc_id").to_numpy(zero_copy_only=False) % num_buckets
        return t.append_column("_bkt", pa.array(b.astype(np.int64)))

    def pick_top_bucket(g: pa.Table) -> pa.Table:
        g = g.select(["doc_id", "tk", "tf", "df"]).combine_chunks()
        if g.num_rows == 0:
            return g
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("doc_id", "ascending"),
                ("tf", "descending"),
                ("df", "ascending"),
                ("tk", "ascending"),
            ],
        )
        d_s = pc.take(g.column("doc_id"), idx).to_numpy(zero_copy_only=False)
        first = np.empty(len(d_s), dtype=bool)
        first[0] = True
        first[1:] = d_s[1:] != d_s[:-1]
        keep = idx.to_numpy(zero_copy_only=False)[first]
        return g.take(pa.array(np.sort(keep)))

    return (
        with_df.map_batches(add_bkt, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(pick_top_bucket, batch_format="pyarrow")
    )


def contamination_scan(ds, probes: list[str]) -> "ray.data.Dataset":
    """Benchmark-decontamination screen: find every document containing
    any of a small set of probe strings (eval-set n-grams, canary
    phrases).  Emits one ``(doc_id, probe)`` row per hit.

    Scale shape: the probe list is tiny and fixed — broadcast once via
    ``ray.put``, scanned per batch with Arrow's ``match_substring``
    kernel (one vectorized pass per probe, no row loop, no shuffle).
    The corpus streams; output is hit-sized.  DuckDB oracle: a VALUES
    cross join with ``contains()``."""
    import ray

    pref = ray.put(list(probes))

    def scan(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ps = _ray.get(pref)
        text = batch.column("text")
        ids = batch.column("doc_id")
        out_ids, out_probe = [], []
        for p in ps:  # len(ps) is O(10-1000): per-probe vectorized kernel
            m = pc.match_substring(text, p)
            hit = ids.filter(m)
            if len(hit):
                out_ids.append(
                    hit.combine_chunks() if isinstance(hit, pa.ChunkedArray) else hit
                )
                out_probe.append(
                    pa.array([p] * len(hit), pa.string())
                )
        if not out_ids:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "probe": pa.array([], pa.string())}
            )
        return pa.table(
            {
                "doc_id": pa.concat_arrays([a.cast(pa.int64()) for a in out_ids]),
                "probe": pa.concat_arrays(out_probe),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def bigram_counts(ds, k: int = 20) -> "ray.data.Dataset":
    """Exact top-``k`` corpus bigrams (phrase mining).  Same
    partial-combine shape as :func:`heavy_hitters`: per batch, adjacent
    token pairs are formed positionally from the flattened split (numpy
    shift within document boundaries — vectorized, no row loop) and
    pre-counted with ``value_counts``; one vocab-sized
    ``groupby(bigram).sum`` and a tiny sort+limit finish it."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = len(flat)
        if n == 0:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        # positions of each doc's last token: a bigram never crosses docs
        ends = np.cumsum(lens) - 1
        keep = np.ones(n, dtype=bool)
        keep[ends] = False  # drop pairs (last-of-doc, first-of-next)
        left = flat.slice(0, n - 1).filter(pa.array(keep[: n - 1]))
        right = flat.slice(1).filter(pa.array(keep[: n - 1]))
        big = pc.binary_join_element_wise(left, right, " ")
        vc = pc.value_counts(
            big.combine_chunks() if isinstance(big, pa.ChunkedArray) else big
        )
        return pa.table(
            {"bigram": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    counts = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )
    return counts.sort(["n", "bigram"], descending=[True, False]).limit(k)


def bigram_pmi(ds, k: int = 50, min_count: int = 5) -> "ray.data.Dataset":
    """Top-``k`` adjacent-token bigrams by pointwise mutual information
    — collocation mining, the standard phrase detector
    (word2vec-phrases / NLTK collocations; beyond-the-reference: the
    reference has no text analysis at all).

    Scale shape: ONE corpus pass emits both bigram and unigram partials
    (pre-counted batch-side with Arrow hash aggregation, tagged by an
    ``is_uni`` key so the two keyspaces can't collide), so the corpus is
    read and tokenized once; one vocab²-bounded ``groupby().sum``
    exchange finishes both count tables.  The unigram table is collected
    driver-side — VOCAB-bounded, never corpus-bounded — and attached to
    the bigram rows vectorized (``pc.index_in`` against the in-closure
    token array; at cluster scale this closure ships via the plan
    exactly once per worker).  The score column is ``lift`` —
    ``(nxy·T)/(nx·ny)``, i.e. e^PMI — NOT the ln form: ln is monotone,
    so the ranking is exactly the PMI ranking, and the replayed float
    op is a single IEEE division of two exact int64 products (< 2⁵³
    for corpora up to ~10⁸ tokens at the default min_count), where
    ln's value would differ at the last ulp between numpy's vectorized
    log and a SQL engine's libm ln."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = len(flat)
        empty = pa.table(
            {
                "tk1": pa.array([], pa.string()),
                "tk2": pa.array([], pa.string()),
                "is_uni": pa.array([], pa.int8()),
                "n": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        uni = (
            pa.table({"tk1": flat})
            .group_by("tk1")
            .aggregate([("tk1", "count")])
        )
        parts = [
            pa.table(
                {
                    "tk1": uni.column("tk1"),
                    "tk2": pa.nulls(uni.num_rows, pa.string()).fill_null(""),
                    "is_uni": pa.array(
                        np.ones(uni.num_rows, dtype=np.int8)
                    ),
                    "n": pc.cast(uni.column("tk1_count"), pa.int64()),
                }
            )
        ]
        if n > 1:
            ends = np.cumsum(lens) - 1
            keep = np.ones(n, dtype=bool)
            keep[ends] = False
            left = flat.slice(0, n - 1).filter(pa.array(keep[: n - 1]))
            right = flat.slice(1).filter(pa.array(keep[: n - 1]))
            big = (
                pa.table({"tk1": left, "tk2": right})
                .group_by(["tk1", "tk2"])
                .aggregate([("tk1", "count")])
            )
            parts.append(
                pa.table(
                    {
                        "tk1": big.column("tk1"),
                        "tk2": big.column("tk2"),
                        "is_uni": pa.array(np.zeros(big.num_rows, dtype=np.int8)),
                        "n": pc.cast(big.column("tk1_count"), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    counts = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["tk1", "tk2", "is_uni"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # vocab²-bounded — read twice below, tokenize once
    )
    # vocab-bounded driver gather: the unigram side only
    uni_tbl = (
        counts.filter(expr="is_uni == 1")
        .select_columns(["tk1", "n"])
        .to_pandas()
    )
    tok_arr = pa.array(uni_tbl["tk1"].tolist(), pa.string())
    nx_arr = uni_tbl["n"].to_numpy(dtype=np.int64)
    total = int(nx_arr.sum())

    def attach_pmi(t: pa.Table) -> pa.Table:
        nxy = t.column("n").to_numpy(zero_copy_only=False)
        i1 = pc.index_in(t.column("tk1"), tok_arr).to_numpy(zero_copy_only=False)
        i2 = pc.index_in(t.column("tk2"), tok_arr).to_numpy(zero_copy_only=False)
        num = (nxy * total).astype(np.float64)
        den = (nx_arr[i1] * nx_arr[i2]).astype(np.float64)
        return pa.table(
            {
                "tk1": t.column("tk1"),
                "tk2": t.column("tk2"),
                "nxy": t.column("n"),
                "lift": pa.array(num / den),
            }
        )

    scored = (
        counts.filter(expr=f"is_uni == 0 and n >= {int(min_count)}")
        .map_batches(attach_pmi, batch_format="pyarrow")
    )
    return scored.sort(["lift", "tk1", "tk2"], descending=[True, False, False]).limit(k)


def keyword_search(ds, terms: list[str], out_cols: list[str] | None = None) -> "ray.data.Dataset":
    """Conjunctive (AND) token-exact keyword search: documents containing
    EVERY term as a whole token (the probe side of an inverted-index
    lookup; complements :func:`contamination_scan`'s substring-OR).
    ``out_cols`` selects the hit projection (default: every non-text
    column).

    Scale shape: the term list is broadcast once via ``ray.put``; each
    batch runs one Arrow ``equal`` kernel per term over the flattened
    token array and reduces per doc with a prefix-sum difference over the
    list offsets (exact for empty and null docs — a ``reduceat`` over
    clamped offsets would truncate the final doc's last token when the
    batch ends with empty docs) — no shuffle, hit-sized output, corpus
    streams.  DuckDB oracle: ``list_contains(string_split(text, ' '),
    term)`` conjunction."""
    import ray

    tref = ray.put([str(t) for t in terms])

    def scan(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ts = _ray.get(tref)
        cols = out_cols or [c for c in batch.column_names if c != "text"]
        if batch.num_rows == 0:
            return batch.select(cols)
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        words = pc.split_pattern(text, pattern=" ")
        flat = words.flatten()
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ok = np.ones(batch.num_rows, dtype=bool)
        for t in ts:  # O(len(terms)) vectorized kernels
            eq = pc.equal(flat, t).to_numpy(zero_copy_only=False).astype(np.int64)
            cs = np.concatenate(([0], np.cumsum(eq)))
            ok &= (cs[offs[1:]] - cs[offs[:-1]]) > 0
        return batch.select(cols).filter(pa.array(ok))

    return ds.map_batches(scan, batch_format="pyarrow")


def encode_with_vocab(ds, vocab_tokens, vocab_ids) -> "ray.data.Dataset":
    """Tokenizer-encode stage: map each document's tokens to integer ids
    through a broadcast vocabulary (the id-assignment half of a trained
    tokenizer; pair with :func:`~cloudtile_ray.stages.relational.enumerate_sorted`
    -built ids).  Emits per-doc ``(doc_id, n_tokens, id_sum, n_oov)`` —
    integer outputs so the DuckDB oracle (explode + dictionary join)
    matches exactly; the packed id list itself is a trivial extra column
    when a sink needs it.

    Scale shape: the vocabulary is ``ray.put`` ONCE and interned per
    worker process (``worker_cached``), not re-shipped per batch; each
    batch runs one Arrow ``index_in`` kernel over the flattened token
    array and per-doc ``reduceat`` sums — no shuffle, corpus streams.
    Out-of-vocabulary tokens count into ``n_oov`` and are excluded from
    ``id_sum``."""
    import ray

    from cloudtile_ray.stages.util import worker_cached

    vt = pa.array([str(t) for t in vocab_tokens], pa.string())
    vi = np.asarray(vocab_ids, dtype=np.int64)
    vref = ray.put((vt, vi))

    def encode(batch: pa.Table) -> pa.Table:
        import ray as _ray

        vtok, vid = worker_cached(("vocab", vref.hex()), lambda: _ray.get(vref))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "id_sum": pa.array([], pa.int64()),
                    "n_oov": pa.array([], pa.int64()),
                }
            )
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text").combine_chunks()), pattern="[^a-z0-9]+"
        )
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        pos_arr = pc.index_in(flat, value_set=vtok)  # null where OOV
        known = pc.is_valid(pos_arr).to_numpy(zero_copy_only=False)
        pos = pc.fill_null(pos_arr, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        nonword = flat.to_numpy(zero_copy_only=False) == ""
        known = known & ~nonword
        ids = np.where(known, vid[pos], 0)
        valid_tok = ~nonword
        n = len(flat)
        doc_rows = len(offs) - 1

        def seg_sum(vals):
            if n == 0:
                return np.zeros(doc_rows, np.int64)
            cs = np.concatenate(([0], np.cumsum(vals)))
            return cs[np.minimum(offs[1:], n)] - cs[np.minimum(offs[:-1], n)]

        n_tokens = seg_sum(valid_tok.astype(np.int64))
        id_sum = seg_sum(ids)
        n_oov = seg_sum((valid_tok & ~known).astype(np.int64))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens),
                "id_sum": pa.array(id_sum),
                "n_oov": pa.array(n_oov),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def cooccurrence_pairs(ds, k: int = 20) -> "ray.data.Dataset":
    """Exact top-``k`` within-document term co-occurrence pairs — the
    count table under PMI / association mining: for every document, each
    unordered pair of DISTINCT tokens co-occurring in it counts once;
    pairs are globally summed and ranked (counts kept as exact integers;
    the PMI log transform is monotone per margin and left to the caller,
    which also keeps the oracle bit-exact).

    Scale shape: per batch, Arrow's C++ ``group_by`` dedups (doc, token)
    and a two-key ``sort_indices`` orders tokens within each doc — pair
    (i, j) with i<j then satisfies tok_i < tok_j by construction, so the
    unordered-pair canonical form costs nothing.  The quadratic pair
    expansion is pure index arithmetic (repeat/cumsum over segment
    sizes — no loop over docs, rows, or pairs) followed by one Arrow
    ``take`` + ``binary_join_element_wise`` + ``value_counts``, and is
    bounded per doc by distinct-token count squared — long repetitive
    documents collapse at the dedup, and the df-style cap belongs
    upstream (callers curating raw web text should length-clip first,
    as the reference pipeline does).  Partials then flow through ONE
    hash-bucket exchange (:func:`~cloudtile_ray.stages.relational.\
    bucketed_group_aggregate` — pair cardinality is vocab², too big for
    per-group Python) and a pair-cardinality-sized sort+limit."""
    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tok_a": pa.array([], pa.string()),
                "tok_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(batch.column("text").combine_chunks(), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = toks.values
        did = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pairs = pa.table({"d": pa.array(did), "tok": flat})
        dist = pairs.group_by(["d", "tok"]).aggregate([])
        order = pc.sort_indices(
            dist, sort_keys=[("d", "ascending"), ("tok", "ascending")]
        )
        dist = dist.take(order)
        d_s = dist.column("d").to_numpy(zero_copy_only=False)
        tok_s = dist.column("tok").combine_chunks()
        # distinct-token count per doc (docs with <2 distinct drop out)
        _, m = np.unique(d_s, return_counts=True)
        if len(m) == 0:
            return empty
        tot = int(m.sum())
        seg_start = np.cumsum(m) - m
        gi = np.arange(tot) - np.repeat(seg_start, m)  # local token index i
        reps = np.repeat(m, m) - 1 - gi  # pairs led by slot i: m_d - 1 - i
        n_pairs = int(reps.sum())
        if n_pairs == 0:
            return empty
        left_idx = np.repeat(np.arange(tot, dtype=np.int64), reps)
        block_start = np.cumsum(reps) - reps
        right_idx = (
            np.arange(n_pairs, dtype=np.int64)
            - np.repeat(block_start, reps)
            + left_idx
            + 1
        )
        joined = pc.binary_join_element_wise(
            tok_s.take(pa.array(left_idx)),
            tok_s.take(pa.array(right_idx)),
            "\x00",  # NUL can't occur inside a space-split token
        )
        vc = pc.value_counts(
            joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) else joined
        )
        split_back = pc.split_pattern(vc.field("values"), pattern="\x00")
        return pa.table(
            {
                "tok_a": pc.list_element(split_back, 0),
                "tok_b": pc.list_element(split_back, 1),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts = bucketed_group_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["tok_a", "tok_b"],
        [("n", "sum", "n")],
    )
    return counts.sort(
        ["n", "tok_a", "tok_b"], descending=[True, False, False]
    ).limit(k)


def phrase_search(ds, phrase: list[str], id_col: str = "doc_id", text_col: str = "text"):
    """Token-level PHRASE search via a positional inverted index: return
    the ids of documents whose whitespace token stream contains the exact
    consecutive sequence ``phrase`` (the retrieval-engine primitive
    ``\"w1 w2 ...\"`` — token-boundary-aware, unlike a raw substring scan;
    the SQL oracle replays it as ``' '||text||' ' LIKE '% w1 w2 ... %'``,
    which is equivalent for a single-space-delimited corpus).

    Scale shape: tokenize emits positions ONLY for the |phrase| query
    terms (the posting stream is pruned map-side to a vanishing fraction
    of the token stream — the index-the-query trick), each term-i posting
    is rebased to ``pos - i`` so a phrase occurrence is |phrase| postings
    agreeing on one (doc, anchor) key, and ONE doc-bucket exchange +
    a per-bucket sorted structured-array intersection finds the docs.
    No full positional index is materialized; for a standing index the
    unpruned emit + write_parquet of the same stream is the build."""
    import numpy as np

    from cloudtile_ray.stages.relational import bucketed_group_aggregate
    from cloudtile_ray.stages.util import default_num_buckets

    if len(phrase) < 1:
        raise ValueError("phrase must have at least one token")
    term_ids = {w: i for i, w in enumerate(phrase)}
    if len(term_ids) != len(phrase):
        # repeated words are fine — postings for a repeated word fan out
        # to every position the word holds in the phrase
        term_ids = None
    nterms = len(phrase)
    num_buckets = default_num_buckets(ds)

    def postings(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column(text_col).combine_chunks(), pattern=" ")
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(ids, counts)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offs[:-1].astype(np.int64), counts
        )
        out_doc, out_anchor, out_term = [], [], []
        for i, w in enumerate(phrase):
            m = pc.equal(flat, w).to_numpy(zero_copy_only=False)
            m = np.asarray(m, dtype=bool)
            out_doc.append(doc_of[m])
            out_anchor.append(pos[m] - i)  # rebase to the phrase start
            out_term.append(np.full(int(m.sum()), i, dtype=np.int64))
        return pa.table(
            {
                "doc": pa.array(np.concatenate(out_doc)),
                "anchor": pa.array(np.concatenate(out_anchor)),
                "term": pa.array(np.concatenate(out_term)),
            }
        )

    posts = ds.map_batches(postings, batch_format="pyarrow")

    def add_bkt(t: pa.Table) -> pa.Table:
        d = t.column("doc").to_numpy(zero_copy_only=False)
        h = d.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "_bkt", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def match_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        d = g.column("doc").to_numpy(zero_copy_only=False)
        a = g.column("anchor").to_numpy(zero_copy_only=False)
        tm = g.column("term").to_numpy(zero_copy_only=False)
        # an anchor fires when all nterms distinct term slots agree on
        # (doc, anchor): count DISTINCT (doc, anchor, term) triples per
        # (doc, anchor) — duplicates are impossible (one term occupies one
        # position once), so a plain count works
        key = np.empty(len(d), dtype=np.dtype([("d", np.int64), ("a", np.int64)]))
        key["d"], key["a"] = d, a
        order = np.argsort(key, kind="stable")
        ks, ts = key[order], tm[order]
        new = np.empty(len(ks), dtype=bool)
        new[0] = True
        new[1:] = ks[1:] != ks[:-1]
        gid = np.cumsum(new) - 1
        hits = np.bincount(gid, minlength=gid[-1] + 1)
        full = hits == nterms
        anchor_doc = ks["d"][new]
        # anchors must be >= 0 (a term matched before the phrase start
        # rebases negative) — they never complete, but guard anyway
        docs = np.unique(anchor_doc[full[: len(anchor_doc)]])
        return pa.table({id_col: pa.array(docs)})

    matched = (
        posts.map_batches(add_bkt, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(
            lambda g: match_bucket(g.drop_columns(["_bkt"])),
            batch_format="pyarrow",
        )
    )
    # bucket outputs are already doc-distinct and doc-disjoint
    return matched


def _word_count_partials(batch: pa.Table, min_len: int = 2) -> pa.Table:
    """Per-batch (word, n) partials over lowercase ALPHA tokens (split on
    ``[^a-z]+`` — same semantics as the langid oracle's
    ``string_split(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'))``).
    Batch-local ``value_counts`` collapses occurrences before the word
    exchange, so the shuffle moves one row per distinct word per batch."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(batch.column("text")), pattern="[^a-z]+"
    )
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    flat = flat.filter(
        pc.greater_equal(pc.utf8_length(flat), min_len)
    )
    vc = pc.value_counts(flat)
    return pa.table(
        {
            "word": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        }
    )


def _bigram_partials(t: pa.Table) -> pa.Table:
    """Expand a (word, n) table to weighted adjacent-character-pair
    partials — one BPE-training count step.  Fully vectorized on the
    Arrow string buffers: words are ascii (the upstream split keeps
    [a-z] only), so pair ids are byte pairs ``b[i]*256 + b[i+1]`` read
    straight from the data buffer; per-word position masks come from the
    offsets buffer; the batch collapses to distinct pair ids with an
    int64-exact ``np.add.at`` before anything ships."""
    arr = t.column("word")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return pa.table(
            {"pair_id": pa.array([], type=pa.int64()),
             "cnt": pa.array([], type=pa.int64())}
        )
    n = t.column("n").to_numpy(zero_copy_only=False)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts, ends = off[:-1], off[1:]
    k = np.maximum(ends - starts - 1, 0)
    wi = np.repeat(np.arange(len(k)), k)
    cum = np.concatenate(([0], np.cumsum(k)))
    p = starts[wi] + (np.arange(cum[-1]) - cum[wi])
    pair_id = buf[p].astype(np.int64) * 256 + buf[p + 1]
    uniq, inv = np.unique(pair_id, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(acc, inv, n[wi])
    return pa.table({"pair_id": pa.array(uniq), "cnt": pa.array(acc)})


def bpe_pair_counts(ds, k: int = 50) -> "ray.data.Dataset":
    """Top-``k`` adjacent character pairs by word-frequency-weighted count
    — exactly the statistic one BPE-training merge iteration maximizes
    (beyond-the-reference training-data operator).

    Shape: batch-local (word, n) partials -> ONE bucket exchange to
    global word counts (words are a near-unique key — see
    ``relational.bucketed_group_aggregate``) -> vectorized bigram
    expansion batch-side, collapsing each batch to <= 676 distinct pair
    ids -> one tiny ``groupby(pair_id).sum`` (pair space is bounded by
    the alphabet squared, so Ray's sort aggregate is fine) -> decode ids
    to 2-char strings, sort (cnt desc, pair asc), limit ``k``.  The
    corpus never shuffles at word-occurrence or pair-occurrence grain."""
    from ray.data.aggregate import Sum

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    words = ds.map_batches(_word_count_partials, batch_format="pyarrow")
    wc = bucketed_group_aggregate(words, ["word"], [("n", "sum", "n")])
    pairs = (
        wc.map_batches(_bigram_partials, batch_format="pyarrow")
        .groupby("pair_id")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def decode(t: pa.Table) -> pa.Table:
        ids = t.column("pair_id").to_numpy(zero_copy_only=False)
        raw = np.empty((len(ids), 2), dtype=np.uint8)
        raw[:, 0], raw[:, 1] = ids // 256, ids % 256
        s = raw.tobytes().decode("ascii")
        pair = pa.array([s[i : i + 2] for i in range(0, 2 * len(ids), 2)],
                        type=pa.string())
        return pa.table({"pair": pair, "cnt": t.column("cnt")})

    return (
        pairs.map_batches(decode, batch_format="pyarrow")
        .sort(["cnt", "pair"], descending=[True, False])
        .limit(k)
    )


def bigram_familiarity(ds) -> "ray.data.Dataset":
    """Per-document corpus-familiarity score: Σ over the doc's word
    bigrams of that bigram's CORPUS frequency (count duplicates on both
    sides) — the integer-exact core of an n-gram LM perplexity screen
    (high = stock phrasing, low = novel text), SQL-replayable because no
    log/float enters.

    Two passes over the stream, zero corpus-sized shuffles:

    1. **model build** — batch-local (bigram → count) partials (the
       doc-boundary-safe positional pairing from :func:`bigram_counts`)
       collapse through one bigram-keyed bucket exchange
       (:func:`~cloudtile_ray.stages.relational.bucketed_group_aggregate`
       — bigram keys are vocab²-cardinality, never Ray per-group Python).
    2. **score** — batch-local (doc, bigram → count) partials attach the
       model via :func:`~cloudtile_ray.stages.relational.broadcast_lookup`
       (byte-gated ``ray.put``; hash-join fallback when the model
       outgrows the budget), multiply, and collapse to doc grain through
       a second bucket exchange.

    Docs with fewer than two tokens have no bigrams and are absent from
    the output (inner-join semantics, matching the SQL oracle)."""
    from cloudtile_ray.stages.relational import (
        broadcast_lookup,
        bucketed_group_aggregate,
    )

    def doc_bigrams(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "bigram": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(
            pc.fill_null(batch.column("text").combine_chunks(), ""), pattern=" "
        )
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = len(flat)
        if n < 2:
            return empty
        ends = np.cumsum(lens) - 1
        keep = np.ones(n, dtype=bool)
        keep[ends] = False
        left = flat.slice(0, n - 1).filter(pa.array(keep[: n - 1]))
        right = flat.slice(1).filter(pa.array(keep[: n - 1]))
        big = pc.binary_join_element_wise(left, right, " ")
        doc_of_tok = np.repeat(
            batch.column("doc_id").to_numpy(zero_copy_only=False), lens
        )
        docs = pa.array(doc_of_tok[: n - 1][keep[: n - 1]])
        part = (
            pa.table({"doc_id": docs, "bigram": big})
            .group_by(["doc_id", "bigram"])
            .aggregate([("doc_id", "count")])
        )
        return pa.table(
            {
                "doc_id": part.column("doc_id"),
                "bigram": part.column("bigram"),
                "cnt": pc.cast(part.column("doc_id_count"), pa.int64()),
            }
        )

    pairs = ds.map_batches(doc_bigrams, batch_format="pyarrow")
    model = bucketed_group_aggregate(pairs, ["bigram"], [("cnt", "sum", "c")])
    scored = broadcast_lookup(pairs, model, on=["bigram"])

    def weigh(t: pa.Table) -> pa.Table:
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "cnt": t.column("cnt"),
                "w": pa.array(cnt * c),
            }
        )

    return bucketed_group_aggregate(
        scored.map_batches(weigh, batch_format="pyarrow"),
        ["doc_id"],
        [("cnt", "sum", "n_bigrams"), ("w", "sum", "familiarity")],
    ).sort(["doc_id"])


def readability_batch(batch: pa.Table) -> pa.Table:
    """Flesch reading-ease per document via the classic vowel-group
    syllable heuristic (no dictionary): words = maximal non-space runs,
    sentences = maximal ``[.!?]+`` terminator runs (floor 1), syllables =
    maximal ``[aeiouyAEIOUY]+`` vowel groups.  Counting is three single
    RE2 passes (``count_substring_regex``) — no Python over rows — and
    the score is the fixed-order IEEE expression

        206.835 - 1.015 * (W / S) - 84.6 * (V / W)

    on doubles cast from the int64 counts, so a DuckDB oracle using
    ``len(regexp_extract_all(...))`` and the same left-to-right
    expression replays it bit-exactly.  Beyond-reference operator from
    the brief's text-analysis family (quality scoring)."""
    text = batch.column("text")
    w = pc.cast(pc.count_substring_regex(text, pattern="[^ ]+"), pa.int64())
    s = pc.cast(pc.count_substring_regex(text, pattern="[.!?]+"), pa.int64())
    v = pc.cast(
        pc.count_substring_regex(text, pattern="[aeiouyAEIOUY]+"), pa.int64()
    )
    wn = w.to_numpy(zero_copy_only=False)
    sn = np.maximum(s.to_numpy(zero_copy_only=False), 1)
    vn = v.to_numpy(zero_copy_only=False)
    wd = np.maximum(wn, 1).astype(np.float64)
    flesch = 206.835 - 1.015 * (wd / sn) - 84.6 * (vn / wd)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": w,
            "n_sentences": pa.array(sn),
            "n_vowel_groups": v,
            "flesch": pa.array(flesch),
        }
    )


def sentence_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-document sentence statistics: split on ``[.!?]+`` terminator
    runs, keep non-empty pieces, report count / total chars / longest
    sentence chars (all int64 — no float compare risk).  The split is one
    RE2 ``split_pattern_regex`` kernel; per-doc folds are bincount /
    maximum.at over the flattened piece lengths (lengths in CODEPOINTS,
    matching SQL ``length``).  Oracle: ``regexp_split_to_array`` +
    unnest, identical piece semantics (verified char-exact incl. empty
    trailing fields, which both sides drop via ``length > 0``)."""
    n_docs = batch.num_rows
    if n_docs == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_sentences": pa.array([], pa.int64()),
                "sum_sentence_chars": pa.array([], pa.int64()),
                "max_sentence_chars": pa.array([], pa.int64()),
            }
        )
    pieces = pc.split_pattern_regex(
        batch.column("text").combine_chunks(), pattern="[.!?]+"
    )
    offs = pieces.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pieces.flatten()
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
    keep = lens > 0
    doc_k, len_k = doc_of[keep], lens[keep]
    n_sent = np.bincount(doc_k, minlength=n_docs)
    sum_chars = np.bincount(doc_k, weights=len_k, minlength=n_docs).astype(
        np.int64
    )
    max_chars = np.zeros(n_docs, dtype=np.int64)
    np.maximum.at(max_chars, doc_k, len_k)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_sentences": pa.array(n_sent.astype(np.int64)),
            "sum_sentence_chars": pa.array(sum_chars),
            "max_sentence_chars": pa.array(max_chars),
        }
    )


def build_postings(
    ds,
    min_df: int = 5,
    max_df: int | None = 50,
    max_df_ratio: float | None = None,
):
    """Inverted-index build: per term with document frequency in
    ``[min_df, max_df]``, the comma-joined sorted doc-id posting list —
    the search-engine index-construction operator over the corpus.
    ``max_df_ratio`` (overrides ``max_df``) sets the cap RELATIVE to the
    corpus size — ``floor(ratio * n_docs)`` via a metadata-only count —
    so the stopword cutoff scales with the input instead of being an
    absolute constant.

    Scale shape (the order of stages is the point):

    1. batch-side DISTINCT (term, doc) pairs — a doc is one row, so an
       in-batch ``np.unique`` over factorized pair keys IS the global
       distinct; token-grain rows collapse before anything moves;
    2. df via one term-keyed bucket exchange
       (:func:`~cloudtile_ray.stages.relational.bucketed_group_aggregate`
       — near-unique keys never hit Ray's per-group Python);
    3. the df-band filter runs BEFORE any posting string exists, so
       stopword-grade terms (df ~ corpus size) never build their
       gigantic lists — the surviving term set is small by construction
       and broadcast as a semi filter over the pairs;
    4. posting strings via one
       :func:`~cloudtile_ray.stages.relational.grouped_string_agg`
       exchange (``string_agg ORDER BY doc_id`` semantics), df attached
       by broadcast.

    Tokenizer matches the vocab family: lowercase, split ``[^a-z0-9]+``,
    drop empties (SQL-replayable)."""
    import pyarrow.compute as pc

    from cloudtile_ray.stages.relational import (
        broadcast_lookup,
        bucketed_group_aggregate,
        grouped_string_agg,
    )

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        if n_docs == 0:
            return pa.table(
                {
                    "tok": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text").combine_chunks()),
            pattern="[^a-z0-9]+",
        )
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc_of = np.repeat(doc, np.diff(offs))
        ok = flat != ""
        flat, doc_of = flat[ok], doc_of[ok]
        import pandas as pd

        codes, uniques = pd.factorize(flat)
        pair = doc_of * np.int64(len(uniques) + 1) + codes
        upair, uidx = np.unique(pair, return_index=True)
        return pa.table(
            {
                "tok": pa.array(flat[uidx].tolist(), pa.string()),
                "doc_id": pa.array(doc_of[uidx]),
            }
        )

    if max_df_ratio is not None:
        import math

        max_df = int(math.floor(max_df_ratio * ds.count()))
    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow").materialize()
    df = bucketed_group_aggregate(pairs, ["tok"], [("tok", "count", "df")])

    def band(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t.column("df"), min_df)
        if max_df is not None:  # None = no upper cap
            keep = pc.and_(keep, pc.less_equal(t.column("df"), max_df))
        return t.filter(keep)

    sel = df.map_batches(band, batch_format="pyarrow").materialize()
    survivors = broadcast_lookup(pairs, sel, on=["tok"], semi=True)
    as_str = survivors.map_batches(
        lambda t: t.append_column(
            "doc_str", pc.cast(t.column("doc_id"), pa.string())
        ),
        batch_format="pyarrow",
    )
    postings = grouped_string_agg(
        as_str,
        ["tok"],
        "doc_str",
        out_name="postings",
        sep=",",
        order_cols=["doc_id"],
    )
    return broadcast_lookup(postings, sel, on=["tok"])


def tfidf_topk(
    ds, n_docs: int, k: int = 3, idf_scale: int = 1_000_000
) -> "ray.data.Dataset":
    """Per-document top-``k`` terms by INTEGER-SCALED TF-IDF:
    ``score = tf * ((n_docs * idf_scale) // df)`` — a fixed-point idf
    (integer floor division, identical in int64 and in the DuckDB
    replay) so the ranking certifies bit-exactly where a float
    ``ln(N/df)`` would not.  Ties break (tk ascending).  The top-1
    (tf, df, tk) lexicographic variant is :func:`top_terms`; this is
    the magnitude-weighted k>1 family (keyword extraction for
    curation / retrieval).

    Scale shape identical to :func:`top_terms`: per-batch (doc, tk, tf)
    explode -> vocab-sized df aggregate -> broadcast df attach under a
    measured byte budget (hash-join fallback above it) -> ONE
    doc-bucket exchange whose kernel is an Arrow multi-key sort plus a
    segmented rank filter (no per-doc Python).  Score fits int64 for
    any corpus below ~9e18 / (idf_scale * max_tf)."""
    from cloudtile_ray.stages.relational import bucketed_group_aggregate, hash_join
    from cloudtile_ray.stages.util import default_num_buckets

    num_buckets = default_num_buckets(ds)
    idf_num = np.int64(n_docs) * np.int64(idf_scale)

    freqs = ds.map_batches(doc_term_freqs, batch_format="pyarrow")
    dfs = bucketed_group_aggregate(
        freqs, ["tk"], [("doc_id", "count", "df")]
    ).materialize()
    df_budget = 256 << 20
    if (dfs.size_bytes() or 0) <= df_budget:
        import ray

        dtabs = [
            t for t in ray.get(list(dfs.to_arrow_refs())) if t.num_columns
        ]
        df_tbl = (
            pa.concat_tables(dtabs).combine_chunks()
            if dtabs
            else pa.table(
                {
                    "tk": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                }
            )
        )
        dref = ray.put(df_tbl)

        def attach_df(t: pa.Table) -> pa.Table:
            lut = ray.get(dref)
            idx = pc.index_in(
                t.column("tk").combine_chunks(), value_set=lut.column("tk")
            )
            return t.append_column("df", pc.take(lut.column("df"), idx))

        with_df = freqs.map_batches(attach_df, batch_format="pyarrow")
    else:
        with_df = hash_join(freqs, dfs, on=("tk",))

    def score_bkt(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(zero_copy_only=False)
        df = t.column("df").to_numpy(zero_copy_only=False)
        score = tf * (idf_num // df)
        b = t.column("doc_id").to_numpy(zero_copy_only=False) % num_buckets
        t = t.append_column("score", pa.array(score.astype(np.int64)))
        return t.append_column("_bkt", pa.array(b.astype(np.int64)))

    def pick_topk(g: pa.Table) -> pa.Table:
        g = g.select(["doc_id", "tk", "tf", "df", "score"]).combine_chunks()
        if g.num_rows == 0:
            return g
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("doc_id", "ascending"),
                ("score", "descending"),
                ("tk", "ascending"),
            ],
        )
        d_s = pc.take(g.column("doc_id"), idx).to_numpy(zero_copy_only=False)
        n = len(d_s)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = d_s[1:] != d_s[:-1]
        starts = np.nonzero(new)[0]
        lens = np.diff(np.append(starts, n))
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        keep = idx.to_numpy(zero_copy_only=False)[rank < k]
        return g.take(pa.array(np.sort(keep)))

    return (
        with_df.map_batches(score_bkt, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(pick_topk, batch_format="pyarrow")
    )


def vocab_coverage(ds, ks=(1, 10, 100, 1000, 10000)) -> "ray.data.Dataset":
    """Token-coverage curve for vocabulary sizing — for each candidate
    vocab size ``k``, how many corpus token OCCURRENCES the top-``k``
    tokens (by count desc, token asc) cover, plus the corpus total.
    The standard tokenizer-design diagnostic (what OOV rate does a 10k
    vocab buy?), exact integers end to end.

    Scale shape: corpus-sized work stays distributed (the same
    tokenize + bucketed count exchange as :func:`top_terms`); only the
    VOCAB-SIZED count table is gathered (the documented bound shared
    with the top_terms broadcast — distinct tokens, not corpus rows),
    ranked once with one argsort + cumsum, and probed at the ladder
    points."""
    import ray
    import ray.data

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    freqs = ds.map_batches(doc_term_freqs, batch_format="pyarrow")
    counts = bucketed_group_aggregate(
        freqs, ["tk"], [("tf", "sum", "c")]
    ).materialize()
    tabs = [t for t in ray.get(list(counts.to_arrow_refs())) if t.num_columns]
    tbl = (
        pa.concat_tables(tabs).combine_chunks()
        if tabs
        else pa.table(
            {"tk": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
        )
    )
    c = tbl.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    idx = pc.sort_indices(
        tbl, sort_keys=[("c", "descending"), ("tk", "ascending")]
    ).to_numpy(zero_copy_only=False)
    cum = np.cumsum(c[idx])
    total = int(cum[-1]) if len(cum) else 0
    covered = [
        int(cum[min(int(k), len(cum)) - 1]) if len(cum) and k >= 1 else 0
        for k in ks
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([int(k) for k in ks], pa.int64()),
                "covered": pa.array(covered, pa.int64()),
                "total_tokens": pa.array([total] * len(ks), pa.int64()),
            }
        )
    )


def max_token_run_batch(batch: pa.Table) -> pa.Table:
    """Per-document LONGEST CONSECUTIVE RUN of one token — the
    Gopher-style consecutive-repetition quality signal the plain
    top-token frequency (:func:`token_repetition_batch`) cannot see
    ("the the the" vs three spread-out "the"s).  Emits (doc_id, tk,
    run_len) with ties broken (run_len DESC, tk ASC), matching the SQL
    islands replay bit-for-bit.

    Vectorized: one split + dictionary_encode, run boundaries =
    code-change OR doc-boundary flags, run lengths by diff over
    boundary indices, per-(doc, tk) max then per-doc argmax — all
    numpy segment ops, stateless per batch (a doc sits in one row)."""
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    de = flat.dictionary_encode()
    codes = de.indices.to_numpy().astype(np.int64)
    n = len(codes)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "tk": pa.array([], pa.string()),
            "run_len": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return empty
    brk = np.empty(n, dtype=bool)
    brk[0] = True
    brk[1:] = (codes[1:] != codes[:-1]) | (doc_idx[1:] != doc_idx[:-1])
    starts = np.nonzero(brk)[0]
    run_len = np.diff(np.append(starts, n))
    run_doc = doc_idx[starts]
    run_code = codes[starts]
    vocab = np.int64(max(len(de.dictionary), 1))
    # per-(doc, tk) max run
    key = run_doc * vocab + run_code
    uk, inv = np.unique(key, return_inverse=True)
    mx = np.zeros(len(uk), dtype=np.int64)
    np.maximum.at(mx, inv, run_len)
    # per-doc argmax by (run_len DESC, tk ASC): tk order via the SORTED
    # dictionary rank, not the encounter-order code
    tk_arr = pc.take(de.dictionary, pa.array(uk % vocab))
    rank = pc.rank(tk_arr, sort_keys="ascending", tiebreaker="dense")
    tkrank = rank.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((tkrank, -mx, uk // vocab))
    d_s = (uk // vocab)[order]
    first = np.empty(len(d_s), dtype=bool)
    first[0] = True
    first[1:] = d_s[1:] != d_s[:-1]
    pick = order[first]
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[(uk // vocab)[pick]]),
            "tk": pc.take(de.dictionary, pa.array(uk[pick] % vocab)),
            "run_len": pa.array(mx[pick]),
        }
    )
