"""Deduplication operators over the document corpus: exact,
MinHash+LSH, SimHash, n-gram Jaccard verification, embedding-cosine
near-dup.

The reference's only dedup/idempotency mechanism is file-level md5 skip
(/root/reference/src/cloudtile/s3.py:128-132,151-187); these generalize it
to record level as Ray-Data-first shuffles:

- exact: hash-partitioned ``groupby(key)`` keeping the minimum doc_id —
  one shuffle over (key, doc_id) pairs only (columns pruned first).
- MinHash-LSH: per-batch vectorized shingle->minhash signatures, exploded
  to (band, band_hash, doc_id) rows, ``groupby`` on the band bucket,
  candidate pairs from same-bucket groups, exact-Jaccard verification of
  candidates only. Signature generation is numpy (batched matrix min);
  nothing quadratic ever leaves a bucket.
- SimHash: 64-bit sign-of-weighted-sum signatures; Hamming-adjacent pairs
  found by 4-way band blocking (any pair with distance <= 3 shares an
  exact 16-bit band).
- embedding near-dup: cosine > threshold pairs via random-hyperplane LSH
  bucketing + in-bucket exact cosine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cloudtile_ray.stages.util import stable_hash_strings

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_keys(ds, key_expr_col: str, id_col: str = "doc_id"):
    """Keep-first exact dedup: -> (key, keep_id, n_dups). The shuffle moves
    only the key + id columns."""
    from ray.data.aggregate import Count, Min

    pruned = ds.map_batches(
        lambda t: t.select([key_expr_col, id_col]), batch_format="pyarrow"
    )
    return pruned.groupby(key_expr_col).aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups")
    )


def add_text_prefix_key(batch: pa.Table, n: int = 64) -> pa.Table:
    """Dedup key = first n chars of text (ASCII corpus: chars == bytes ==
    DuckDB ``substr(text, 1, n)``)."""
    return batch.append_column(
        "text_prefix", pc.utf8_slice_codeunits(batch.column("text"), 0, n)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Actor-pool signature stage: random (a, b) rows are generated ONCE per
    actor from a fixed seed (identical across actors -> deterministic
    output), signatures per batch are numpy matrix ops."""

    def __init__(self, n_hashes: int = 64, shingle: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, n_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, n_hashes, dtype=np.uint64)
        self.n = n_hashes
        self.k = shingle

    def shingle_hashes(self, text: str) -> np.ndarray:
        b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        if len(b) < self.k:
            b = np.pad(b, (0, self.k - len(b)))
        win = np.lib.stride_tricks.sliding_window_view(b, self.k).astype(np.uint64)
        pows = np.uint64(257) ** np.arange(self.k - 1, -1, -1, dtype=np.uint64)
        return np.unique((win * pows).sum(axis=1))  # mod 2^64 rolling hash

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingle_hashes(text)
        # (n_hashes, n_shingles) universal hashing, min per row
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else np.empty((0, self.n), np.uint64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array(list(sigs), type=pa.list_(pa.uint64(), self.n)),
            }
        )


def explode_bands(batch: pa.Table, n_bands: int = 8) -> pa.Table:
    """Signature -> (band_id, band_hash, doc_id) rows for the LSH groupby."""
    sigs = np.stack(batch.column("sig").to_numpy(zero_copy_only=False))
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    n, h = sigs.shape
    rows_per_band = h // n_bands
    band_ids, band_hashes, doc_ids = [], [], []
    for bi in range(n_bands):
        chunk = sigs[:, bi * rows_per_band : (bi + 1) * rows_per_band]
        # mix the band rows into one 64-bit bucket hash
        mix = np.zeros(n, dtype=np.uint64)
        for c in range(rows_per_band):
            mix = mix * np.uint64(1099511628211) + chunk[:, c]
        band_ids.append(np.full(n, bi, dtype=np.int64))
        band_hashes.append(mix)
        doc_ids.append(ids)
    return pa.table(
        {
            "band_id": pa.array(np.concatenate(band_ids)),
            "band_hash": pa.array(np.concatenate(band_hashes)),
            "doc_id": pa.array(np.concatenate(doc_ids)),
        }
    )


def bucket_pairs(group: pa.Table) -> pa.Table:
    """Same-bucket candidate pairs (a < b). Buckets are tiny by
    construction; quadratic work never escapes a bucket."""
    ids = np.sort(group.column("doc_id").to_numpy(zero_copy_only=False))
    if len(ids) < 2:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    a, b = np.triu_indices(len(ids), k=1)
    return pa.table({"doc_a": pa.array(ids[a]), "doc_b": pa.array(ids[b])})


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard (verification step)."""
    sa = {text_a[i : i + k] for i in range(max(1, len(text_a) - k + 1))}
    sb = {text_b[i : i + k] for i in range(max(1, len(text_b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_pairs(ds, threshold: float = 0.7, n_hashes: int = 64, n_bands: int = 8):
    """Full MinHash-LSH near-dup pipeline -> verified pairs table
    (doc_a, doc_b, jaccard). ``ds`` must have doc_id + text."""
    import ray

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"n_hashes": n_hashes},
        batch_format="pyarrow",
        concurrency=2,
    )
    bands = sigs.map_batches(
        lambda t: explode_bands(t, n_bands), batch_format="pyarrow"
    )
    cands = bands.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    pairs = cands.to_pandas().drop_duplicates()
    if pairs.empty:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    # verification: fetch the candidate texts once (candidate set << corpus)
    need = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
    texts = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        m = pc.is_in(b.column("doc_id"), value_set=pa.array(need))
        sub = b.filter(m)
        for i, t in zip(sub.column("doc_id").to_pylist(), sub.column("text").to_pylist()):
            texts[i] = t
    keep_a, keep_b, jac = [], [], []
    for a, bb in pairs.itertuples(index=False):
        j = jaccard(texts[int(a)], texts[int(bb)])
        if j >= threshold:
            keep_a.append(int(a))
            keep_b.append(int(bb))
            jac.append(j)
    return pa.table(
        {"doc_a": pa.array(keep_a, pa.int64()), "doc_b": pa.array(keep_b, pa.int64()),
         "jaccard": pa.array(jac, pa.float64())}
    )


def ngram_jaccard_pairs(ds, threshold: float = 0.6, k: int = 5):
    """n-gram Jaccard near-dup: candidate blocking by the winnowing
    rolling-hash fingerprint (documents sharing a minimal window hash are
    candidates — robust to local edits), then exact k-shingle Jaccard on
    candidates only. Distinct from MinHash-LSH: deterministic single-hash
    blocking, exact verification, no signature matrix."""
    from cloudtile_ray.stages.text import rolling_fingerprint_batch

    fps = ds.map_batches(rolling_fingerprint_batch, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.sort(group.column("doc_id").to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"doc_a": pa.array(ids[a]), "doc_b": pa.array(ids[b])})

    cands = fps.groupby("rolling_fp").map_groups(pairs, batch_format="pyarrow").to_pandas()
    if cands.empty:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    cands = cands.drop_duplicates()
    need = sorted(set(cands["doc_a"]) | set(cands["doc_b"]))
    texts = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        m = pc.is_in(b.column("doc_id"), value_set=pa.array(need))
        sub = b.filter(m)
        for i, t in zip(sub.column("doc_id").to_pylist(), sub.column("text").to_pylist()):
            texts[i] = t
    keep_a, keep_b, jac = [], [], []
    for a, bb in cands.itertuples(index=False):
        j = jaccard(texts[int(a)], texts[int(bb)], k=k)
        if j >= threshold:
            keep_a.append(int(a))
            keep_b.append(int(bb))
            jac.append(j)
    return pa.table({"doc_a": pa.array(keep_a, pa.int64()),
                     "doc_b": pa.array(keep_b, pa.int64()),
                     "jaccard": pa.array(jac, pa.float64())})


def resolve_clusters(pairs: pa.Table, id_cols: tuple[str, str] = ("doc_a", "doc_b")) -> pa.Table:
    """Near-dup pairs -> (doc_id, cluster_id, keep) via union-find on the
    driver. Safe because the candidate pair set is already bounded by the
    LSH bucketing (quadratic work never escapes a bucket — the guide's
    stated condition for driver-side components); cluster_id = min doc_id
    in the component, keep = (doc_id == cluster_id), i.e. keep-first."""
    a = pairs.column(id_cols[0]).to_numpy(zero_copy_only=False)
    b = pairs.column(id_cols[1]).to_numpy(zero_copy_only=False)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            # union by min id -> deterministic roots
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    members = sorted(parent)
    roots = [find(m) for m in members]
    return pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "cluster_id": pa.array(roots, pa.int64()),
            "keep": pa.array([m == r for m, r in zip(members, roots)], pa.bool_()),
        }
    )


def drop_near_dups(ds, pairs: pa.Table):
    """Filter a documents dataset to drop non-keeper members of near-dup
    clusters (broadcast the small drop-set, filter inside map_batches)."""
    import ray

    clusters = resolve_clusters(pairs)
    drop = {
        d
        for d, k in zip(clusters.column("doc_id").to_pylist(), clusters.column("keep").to_pylist())
        if not k
    }
    drop_ref = ray.put(drop)

    def flt(batch: pa.Table) -> pa.Table:
        dset = ray.get(drop_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, np.fromiter(dset, dtype=np.int64)) if dset else np.ones(len(ids), bool)
        return batch.take(pa.array(np.nonzero(keep)[0]))

    return ds.map_batches(flt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word tokens; per-batch vectorized accumulation."""

    def __init__(self, seed: int = 42):
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            words = t.split(" ")
            h = stable_hash_strings(np.asarray(words, dtype=object))
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for b in range(64):
                if v[b] > 0:
                    sig |= np.uint64(1) << np.uint64(b)
            out[i] = sig
        return pa.table({"doc_id": batch.column("doc_id"), "simhash": pa.array(out)})


def simhash_near_pairs(ds, max_hamming: int = 3):
    """Pairs with Hamming distance <= max_hamming via 4x16-bit band
    blocking (pigeonhole: any such pair agrees exactly on >= 1 band)."""
    sigs = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=2)

    def explode(batch: pa.Table) -> pa.Table:
        s = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        parts = []
        for b in range(4):
            band = (s >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            parts.append(
                pa.table(
                    {
                        "band_id": pa.array(np.full(len(s), b, dtype=np.int64)),
                        "band_val": pa.array(band),
                        "doc_id": pa.array(ids),
                        "simhash": pa.array(s),
                    }
                )
            )
        return pa.concat_tables(parts)

    def pairs(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        sh = group.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        a, b = np.triu_indices(len(ids), k=1)
        x = sh[a] ^ sh[b]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pa.table(
            {"doc_a": pa.array(ids[a[keep]]), "doc_b": pa.array(ids[b[keep]]),
             "hamming": pa.array(ham[keep])}
        )

    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    res = exploded.groupby(["band_id", "band_val"]).map_groups(pairs, batch_format="pyarrow")
    return res.to_pandas().drop_duplicates(subset=["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# embedding near-dup (cosine)
# ---------------------------------------------------------------------------


class HyperplaneLsh:
    """Random-hyperplane bucketing: planes drawn once per actor from a
    fixed seed; bucket = sign bits of V @ planes."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        V = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        bits = (V @ self.planes) > 0
        bucket = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "bucket": pa.array(bucket),
                "embedding": batch.column("embedding"),
            }
        )


def embedding_neardup_pairs(ds, threshold: float = 0.95, dim: int = 64):
    """cosine >= threshold pairs via hyperplane-LSH buckets + in-bucket
    exact cosine (float64)."""
    bucketed = ds.map_batches(
        HyperplaneLsh, fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow", concurrency=2,
    )

    def pairs(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        V = np.stack(group.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        order = np.argsort(ids)
        ids, V = ids[order], V[order]
        empty = pa.table({"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if len(ids) < 2:
            return empty
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sim = Vn @ Vn.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = sim[a, b] >= threshold
        if not keep.any():
            return empty
        return pa.table(
            {"vec_a": pa.array(ids[a[keep]]), "vec_b": pa.array(ids[b[keep]]),
             "cosine": pa.array(sim[a[keep], b[keep]])}
        )

    res = bucketed.groupby("bucket").map_groups(pairs, batch_format="pyarrow")
    df = res.to_pandas()
    if df.empty:
        # preserve the schema even when no pair clears the threshold
        import pandas as pd

        df = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                           "vec_b": pd.Series(dtype="int64"),
                           "cosine": pd.Series(dtype="float64")})
        return df
    return df.drop_duplicates(subset=["vec_a", "vec_b"]).reset_index(drop=True)
