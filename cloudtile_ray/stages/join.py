"""Spatial joins: point-in-polygon (broadcast and shuffle strategies,
inner/left/semi/anti) and kNN (brute-force and hex-bucketed).

The reference has NO join operator (verified absence, SURVEY.md §2.3); these
are the north-rule operators, designed Ray-Data-first:

- **broadcast** (small polygon side): the packed ``PipIndex`` is put in the
  object store ONCE (``ray.put``) and every map task / actor reads it —
  never re-shipped per batch. Stateless w.r.t. batches; the index build is
  amortized per actor via ``__init__``.
- **shuffle** (large polygon side): both sides are partitioned by a coarse
  lon/lat grid bucket; polygons are replicated to every bucket their bbox
  overlaps (duplicate suppression by testing only points in the bucket),
  then each bucket joins locally via ``groupby(bucket).map_groups``. The
  partitioning assumption: polygon bboxes are small relative to the bucket
  size, so the replication factor stays near 1 (world-spanning polygons
  degrade to broadcast — which is what you want for them anyway).
"""

from __future__ import annotations

from typing import Literal, Sequence

import numpy as np
import pyarrow as pa
import ray

from cloudtile_ray.geo.pip import PipIndex

How = Literal["inner", "left", "semi", "anti"]


def build_pip_index_ref(
    rings: Sequence[Sequence[np.ndarray]],
    zone_ids: np.ndarray,
    zone_names: Sequence[str],
):
    """Build + broadcast the join state once from the driver."""
    idx = PipIndex(rings)
    return ray.put(
        {
            "index": idx,
            "zone_ids": np.asarray(zone_ids, dtype=np.int64),
            "zone_names": np.asarray(zone_names, dtype=object),
        }
    )


def _join_batch(index, zone_ids, zone_names, batch: pa.Table, how: How) -> pa.Table:
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    valid = ~(np.isnan(lon) | np.isnan(lat))
    pt_idx = np.nonzero(valid)[0]
    pi, pl = index.query(lon[pt_idx], lat[pt_idx])
    matched_rows = pt_idx[pi]  # row index per match pair (dups on multi-match)
    if how == "inner":
        out = batch.take(pa.array(matched_rows))
        out = out.append_column("zone_id", pa.array(zone_ids[pl]))
        out = out.append_column(
            "zone_name", pa.array(zone_names[pl].tolist(), type=pa.string())
        )
        return out
    has_match = np.zeros(batch.num_rows, dtype=bool)
    has_match[matched_rows] = True
    if how == "semi":
        return batch.take(pa.array(np.nonzero(has_match)[0]))
    if how == "anti":
        return batch.take(pa.array(np.nonzero(~has_match)[0]))
    # left: matched pairs + unmatched rows with null zone
    un = np.nonzero(~has_match)[0]
    rows = np.concatenate([matched_rows, un])
    zid = np.concatenate([zone_ids[pl], np.zeros(len(un), dtype=np.int64)])
    zmask = np.concatenate([np.zeros(len(matched_rows), bool), np.ones(len(un), bool)])
    znames = np.concatenate([zone_names[pl], np.full(len(un), None, dtype=object)])
    out = batch.take(pa.array(rows))
    out = out.append_column("zone_id", pa.array(zid, mask=zmask))
    out = out.append_column("zone_name", pa.array(znames.tolist(), type=pa.string()))
    return out


class BroadcastPipJoin:
    """Actor-pool ``map_batches`` callable: fetch the broadcast index once
    per actor in ``__init__`` (zero per-batch deserialization), query per
    batch with the vectorized STRtree + even-odd kernel."""

    def __init__(self, index_ref, how: How = "inner"):
        state = ray.get(index_ref)
        self.index = state["index"]
        self.zone_ids = state["zone_ids"]
        self.zone_names = state["zone_names"]
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _join_batch(self.index, self.zone_ids, self.zone_names, batch, self.how)


# Per-worker cache of fetched broadcast state: a stateless-task join fuses
# with neighboring map stages (no actor-pool concurrency ceiling on the
# fused chain) while still deserializing the index at most once per worker
# process. ray.get of numpy-backed state is near-zero-copy from plasma.
_STATE_CACHE: dict[str, dict] = {}


def _get_state(ref) -> dict:
    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    state = _STATE_CACHE.get(key)
    if state is None:
        state = ray.get(ref)
        _STATE_CACHE.clear()  # hold at most one broadcast state per worker
        _STATE_CACHE[key] = state
    return state


def broadcast_pip_join(
    ds: "ray.data.Dataset",
    rings: Sequence[Sequence[np.ndarray]],
    zone_ids: np.ndarray,
    zone_names: Sequence[str],
    how: How = "inner",
    batch_size: int = 16384,
    use_actors: bool = False,
    concurrency: int | tuple[int, int] = 8,
) -> "ray.data.Dataset":
    ref = build_pip_index_ref(rings, zone_ids, zone_names)
    if use_actors:
        return ds.map_batches(
            BroadcastPipJoin,
            fn_constructor_kwargs={"index_ref": ref, "how": how},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    def join_fn(batch: pa.Table) -> pa.Table:
        state = _get_state(ref)
        return _join_batch(
            state["index"], state["zone_ids"], state["zone_names"], batch, how
        )

    return ds.map_batches(join_fn, batch_format="pyarrow", batch_size=batch_size)


# ---------------------------------------------------------------------------
# shuffle strategy
# ---------------------------------------------------------------------------

BUCKET_DEG = 15.0  # coarse partition grid; documented partitioning assumption


def _bucket_of(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    bx = np.floor((lon + 180.0) / BUCKET_DEG).astype(np.int64)
    by = np.floor((lat + 90.0) / BUCKET_DEG).astype(np.int64)
    return bx * 1000 + by


def shuffle_pip_join(
    ds: "ray.data.Dataset",
    rings: Sequence[Sequence[np.ndarray]],
    zone_ids: np.ndarray,
    zone_names: Sequence[str],
    how: How = "inner",
) -> "ray.data.Dataset":
    """Partitioned PiP join: points get a grid bucket column; each polygon is
    assigned (driver-side — the polygon side is the small side of each
    bucket) to every bucket its bbox overlaps; ``groupby(bucket)`` then
    joins locally. Same output as the broadcast strategy (tested equal)."""
    packed = PipIndex(rings).packed
    per_bucket: dict[int, list[int]] = {}
    nx = int(np.ceil(360.0 / BUCKET_DEG))
    ny = int(np.ceil(180.0 / BUCKET_DEG))
    for pid in range(packed.n_polygons):
        w, s, e, n = packed.bbox[pid]
        bx0 = max(0, int((w + 180.0) // BUCKET_DEG))
        bx1 = min(nx - 1, int((e + 180.0) // BUCKET_DEG))
        by0 = max(0, int((s + 90.0) // BUCKET_DEG))
        by1 = min(ny - 1, int((n + 90.0) // BUCKET_DEG))
        for bx in range(bx0, bx1 + 1):
            for by in range(by0, by1 + 1):
                per_bucket.setdefault(bx * 1000 + by, []).append(pid)
    state_ref = ray.put(
        {
            "rings": list(rings),
            "per_bucket": per_bucket,
            "zone_ids": np.asarray(zone_ids, dtype=np.int64),
            "zone_names": np.asarray(zone_names, dtype=object),
        }
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        b = np.where(
            np.isnan(lon) | np.isnan(lat), np.int64(-1), _bucket_of(lon, lat)
        )
        return batch.append_column("_bucket", pa.array(b))

    def join_group(group: pa.Table) -> pa.Table:
        state = ray.get(state_ref)
        bucket = int(group.column("_bucket")[0].as_py())
        pids = state["per_bucket"].get(bucket, [])
        group = group.drop_columns(["_bucket"])
        if not pids:
            if how == "anti" or how == "left":
                out = group if how == "anti" else group
                if how == "left":
                    out = out.append_column(
                        "zone_id", pa.nulls(out.num_rows, type=pa.int64())
                    )
                    out = out.append_column(
                        "zone_name", pa.nulls(out.num_rows, type=pa.string())
                    )
                return out
            return group.slice(0, 0)
        sub_index = PipIndex([state["rings"][p] for p in pids])
        return _join_batch(
            sub_index, state["zone_ids"][pids], state["zone_names"][pids], group, how
        )

    withb = ds.map_batches(add_bucket, batch_format="pyarrow")
    return withb.groupby("_bucket").map_groups(join_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# kNN over geocoded points (integer milli-degree metric -> exact, orderable)
# ---------------------------------------------------------------------------


class PartialKnn:
    """Per-batch top-k candidates per query point (squared integer
    milli-degree distance — exact, so ranking is reproducible). The partial
    results are tiny (batches x Q x k) and are merged in one final
    reduction."""

    def __init__(self, queries_mi: np.ndarray, k: int):
        self.q = np.asarray(queries_mi, dtype=np.int64)  # (Q, 2) lon_mi, lat_mi
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lon = batch.column("lon_mi").to_numpy(zero_copy_only=False)
        lat = batch.column("lat_mi").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        valid = pc.is_valid(batch.column("lon_mi")).to_numpy(zero_copy_only=False)
        lon = lon[valid].astype(np.int64)
        lat = lat[valid].astype(np.int64)
        ids = ids[valid].astype(np.int64)
        qs, ds_, ids_out = [], [], []
        for qi in range(self.q.shape[0]):
            d2 = (lon - self.q[qi, 0]) ** 2 + (lat - self.q[qi, 1]) ** 2
            k = min(self.k, len(d2))
            if k == 0:
                continue
            part = np.argpartition(d2, k - 1)[:k]
            order = part[np.lexsort((ids[part], d2[part]))]
            qs.append(np.full(k, qi, dtype=np.int64))
            ds_.append(d2[order])
            ids_out.append(ids[order])
        if not qs:
            return pa.table(
                {"q_id": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                 "d2": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(qs)),
                "doc_id": pa.array(np.concatenate(ids_out)),
                "d2": pa.array(np.concatenate(ds_)),
            }
        )


def knn_merge(partials: pa.Table, k: int) -> pa.Table:
    """Final exact top-k merge of the per-batch candidates (small)."""
    q = partials.column("q_id").to_numpy(zero_copy_only=False)
    d2 = partials.column("d2").to_numpy(zero_copy_only=False)
    ids = partials.column("doc_id").to_numpy(zero_copy_only=False)
    out_q, out_d, out_i = [], [], []
    for qi in np.unique(q):
        m = q == qi
        dd, ii = d2[m], ids[m]
        order = np.lexsort((ii, dd))[:k]
        out_q.append(np.full(len(order), qi, dtype=np.int64))
        out_d.append(dd[order])
        out_i.append(ii[order])
    return pa.table(
        {
            "q_id": pa.array(np.concatenate(out_q)),
            "doc_id": pa.array(np.concatenate(out_i)),
            "d2": pa.array(np.concatenate(out_d)),
        }
    )


def knn(
    ds: "ray.data.Dataset", queries_mi: np.ndarray, k: int = 5
) -> pa.Table:
    """Exact kNN: distributed per-batch top-k + one tiny driver merge."""
    partials = ds.map_batches(
        PartialKnn,
        fn_constructor_kwargs={"queries_mi": queries_mi, "k": k},
        batch_format="pyarrow",
        concurrency=2,
    )
    return knn_merge(pa.concat_tables(_gather(partials)), k)


def _gather(ds) -> list[pa.Table]:
    """Collect small result blocks; drop the zero-column empty blocks Ray
    emits for fully-filtered partitions (they break concat_tables)."""
    import ray as _ray

    tables = [_ray.get(ref) for ref in ds.to_arrow_refs()]
    return [t for t in tables if t.num_columns > 0]


def hex_bucketed_knn(
    ds: "ray.data.Dataset",
    queries_mi: np.ndarray,
    k: int = 5,
    res: int = 2,
    max_rings: int = 8,
) -> pa.Table:
    """Scale path: restrict the scan to hex cells within an expanding ring
    of each query (H3-bucketed kNN per SURVEY.md §2.3), then exact top-k on
    the survivors. Ring expansion doubles until every query has >= k
    candidates or ``max_rings`` is hit; correctness guard: a ring-r disk at
    res covers >= r * cell_inradius, so once the k-th candidate distance is
    below that radius the result equals exact kNN (asserted in tests
    against the brute-force path)."""
    from cloudtile_ray.geo import hexgrid

    q = np.asarray(queries_mi, dtype=np.int64)
    qlon = q[:, 0] / 1000.0
    qlat = q[:, 1] / 1000.0
    qcells = hexgrid.latlng_to_cell(qlon, qlat, res)
    # distance (in milli-degrees) guaranteed to be fully covered by a
    # ring-r disk around the query's cell: r ring steps of at least one
    # cell inradius each, minus one cell for the query's offset from its
    # cell center (conservative)
    spacing_mi = hexgrid.BASE_SIZE_DEG / abs(hexgrid._C) ** res * 1000.0
    inradius_mi = spacing_mi * 0.5
    rings = 1
    while rings <= max_rings:
        cand_cells: set[int] = set()
        for c in qcells.tolist():
            cand_cells.update(hexgrid.grid_disk(int(c), rings).tolist())
        cand_ref = ray.put(cand_cells)

        def in_cells(batch: pa.Table) -> pa.Table:
            cells = ray.get(cand_ref)
            lon = batch.column("lon").to_numpy(zero_copy_only=False)
            lat = batch.column("lat").to_numpy(zero_copy_only=False)
            valid = ~(np.isnan(lon) | np.isnan(lat))
            hx = np.zeros(len(lon), dtype=np.uint64)
            if valid.any():
                hx[valid] = hexgrid.latlng_to_cell(lon[valid], lat[valid], res)
            keep = valid & np.isin(hx, np.fromiter(cells, dtype=np.uint64))
            return batch.take(pa.array(np.nonzero(keep)[0]))

        filtered = ds.map_batches(in_cells, batch_format="pyarrow")
        partials = filtered.map_batches(
            PartialKnn,
            fn_constructor_kwargs={"queries_mi": q, "k": k},
            batch_format="pyarrow",
            concurrency=2,
        )
        tables = _gather(partials)
        merged = knn_merge(pa.concat_tables(tables), k) if tables else None
        if merged is not None and merged.num_rows:
            qid = merged.column("q_id").to_numpy(zero_copy_only=False)
            d2 = merged.column("d2").to_numpy(zero_copy_only=False)
            counts = np.bincount(qid, minlength=q.shape[0])
            guaranteed_mi = max(0.0, (rings - 1)) * inradius_mi
            # the k-th candidate must be provably closer than any point
            # outside the searched disk, for every query
            ok = counts >= k
            if ok.all() and guaranteed_mi > 0:
                kth = np.array(
                    [np.sqrt(d2[qid == qi].max()) for qi in range(q.shape[0])]
                )
                if (kth <= guaranteed_mi).all():
                    return merged
        rings *= 2
    # disk search could not prove optimality (sparse region / tiny corpus):
    # fall back to the exact distributed scan
    return knn(ds, q, k)
