"""Similarity search over an embedding column (``list<float>``):
brute-force cosine top-k (baseline — per-batch numpy matmul against a
broadcast query matrix, partial top-k merged once) and an IVF-bucketed
variant as the scale path (coarse centroids, search only the closest
``nprobe`` inverted lists)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _normalize(V: np.ndarray) -> np.ndarray:
    return V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)


class PartialCosineTopK:
    """Per-batch top-k per query; the query matrix is fetched from the
    object store once per actor (broadcast, never re-shipped per batch)."""

    def __init__(self, queries_ref, k: int):
        self.Q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        sims = _normalize(V) @ self.Q.T  # (n, Q)
        qs, out_ids, out_sims = [], [], []
        for qi in range(self.Q.shape[0]):
            s = sims[:, qi]
            k = min(self.k, len(s))
            part = np.argpartition(-s, k - 1)[:k]
            order = part[np.lexsort((ids[part], -s[part]))]
            qs.append(np.full(k, qi, dtype=np.int64))
            out_ids.append(ids[order])
            out_sims.append(s[order])
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(qs)),
                "vec_id": pa.array(np.concatenate(out_ids)),
                "cosine": pa.array(np.concatenate(out_sims)),
            }
        )


def _merge_topk(partials: list[pa.Table], k: int) -> pa.Table:
    t = pa.concat_tables(partials)
    q = t.column("q_id").to_numpy(zero_copy_only=False)
    v = t.column("vec_id").to_numpy(zero_copy_only=False)
    s = t.column("cosine").to_numpy(zero_copy_only=False)
    out_q, out_v, out_s = [], [], []
    for qi in np.unique(q):
        m = q == qi
        order = np.lexsort((v[m], -s[m]))[:k]
        out_q.append(np.full(len(order), qi, dtype=np.int64))
        out_v.append(v[m][order])
        out_s.append(s[m][order])
    return pa.table(
        {
            "q_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "cosine": pa.array(np.concatenate(out_s)),
        }
    )


def brute_force_topk(ds, queries: np.ndarray, k: int = 10) -> pa.Table:
    """Exact cosine top-k: distributed partials + one tiny merge."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        PartialCosineTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
        batch_format="pyarrow",
        concurrency=2,
    )
    tables = [t for t in (ray.get(r) for r in partials.to_arrow_refs()) if t.num_columns > 0]
    return _merge_topk(tables, k)


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> pa.Table:
    """IVF scale path: coarse centroids from a deterministic sample (one
    k-means sweep), vectors assigned to nearest centroid inside
    ``map_batches``, queries scan only their ``nprobe`` nearest lists.
    Approximate — tests assert recall against ``brute_force_topk``."""
    sample = np.stack(
        ds.limit(max(256, n_centroids * 8)).to_pandas()["embedding"].to_numpy()
    ).astype(np.float64)
    rng = np.random.default_rng(seed)
    C = sample[rng.choice(len(sample), n_centroids, replace=False)]
    for _ in range(5):  # few Lloyd sweeps on the sample
        assign = np.argmax(_normalize(sample) @ _normalize(C).T, axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                C[c] = sample[m].mean(axis=0)
    Cn = _normalize(C)
    cref = ray.put(Cn)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ Cn.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probe_sets = [set(p.tolist()) for p in probe]
    all_probed = sorted(set().union(*probe_sets))
    pref = ray.put(np.asarray(all_probed, dtype=np.int64))

    def filter_probed(batch: pa.Table) -> pa.Table:
        cn = ray.get(cref)
        probed = ray.get(pref)
        V = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        assign = np.argmax(_normalize(V) @ cn.T, axis=1)
        keep = np.isin(assign, probed)
        out = batch.take(pa.array(np.nonzero(keep)[0]))
        return out.append_column("_list", pa.array(assign[keep].astype(np.int64)))

    filtered = ds.map_batches(filter_probed, batch_format="pyarrow")
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = filtered.map_batches(
        PartialCosineTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
        batch_format="pyarrow",
        concurrency=2,
    )
    tables = [t for t in (ray.get(r) for r in partials.to_arrow_refs()) if t.num_columns > 0]
    merged = _merge_topk(tables, k)
    # keep only hits whose list was probed for that query
    return merged
