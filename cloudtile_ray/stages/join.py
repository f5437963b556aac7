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
    n_salts: int = 8,
    hot_threshold: int | None = None,
) -> "ray.data.Dataset":
    """Partitioned PiP join: points get a grid bucket column; each polygon is
    assigned (driver-side — the polygon side is the small side of each
    bucket) to every bucket its bbox overlaps; ``groupby(bucket)`` then
    joins locally. Same output as the broadcast strategy (tested equal).

    Skew: a density pre-count (column-pruned partial counts, tiny exchange)
    finds hot buckets — e.g. a metro cluster landing 30% of the corpus in
    one grid cell — and splits them into ``n_salts`` sub-partitions by a
    content hash of the point coordinates; the bucket's polygon list is
    replicated to every salt, so each point still joins against exactly the
    polygons of its bucket and the output is unchanged (equality-tested
    against broadcast).  ``hot_threshold`` defaults to 4x the mean
    non-empty bucket count (min 65536 rows so small inputs never salt)."""
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

    # --- density pre-count: find hot buckets before the shuffle ----------
    def bucket_counts(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        b = np.where(np.isnan(lon) | np.isnan(lat), np.int64(-1), _bucket_of(lon, lat))
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(ub), "n": pa.array(cnt.astype(np.int64))})

    pruned = ds.map_batches(
        lambda t: t.select(["lon", "lat"]), batch_format="pyarrow"
    )
    parts = [
        t
        for t in (
            ray.get(r)
            for r in pruned.map_batches(
                bucket_counts, batch_format="pyarrow"
            ).to_arrow_refs()
        )
        if t.num_columns > 0
    ]
    hot: set[int] = set()
    if parts:
        allc = pa.concat_tables(parts)
        bs = allc.column("b").to_numpy(zero_copy_only=False)
        ns = allc.column("n").to_numpy(zero_copy_only=False)
        ub = np.unique(bs)
        totals = np.zeros(len(ub), dtype=np.int64)
        np.add.at(totals, np.searchsorted(ub, bs), ns)
        if hot_threshold is None:
            hot_threshold = max(65536, int(4 * totals.mean()))
        hot = set(ub[totals > hot_threshold].tolist())
    hot_ref = ray.put(np.fromiter(hot, dtype=np.int64) if hot else np.empty(0, np.int64))

    def add_bucket(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        b = np.where(
            np.isnan(lon) | np.isnan(lat), np.int64(-1), _bucket_of(lon, lat)
        )
        hot_arr = ray.get(hot_ref)
        salt = np.zeros(len(b), dtype=np.int64)
        if len(hot_arr):
            is_hot = np.isin(b, hot_arr)
            # content hash of the point coords -> deterministic sub-split
            mix = (
                lon.view(np.uint64) * np.uint64(2654435761)
                + lat.view(np.uint64) * np.uint64(40503)
            )
            salt[is_hot] = (mix[is_hot] % np.uint64(n_salts)).astype(np.int64)
        out = batch.append_column("_bucket", pa.array(b))
        return out.append_column("_salt", pa.array(salt))

    def join_group(group: pa.Table) -> pa.Table:
        state = ray.get(state_ref)
        bucket = int(group.column("_bucket")[0].as_py())
        pids = state["per_bucket"].get(bucket, [])
        group = group.drop_columns(["_bucket", "_salt"])
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
    return withb.groupby(["_bucket", "_salt"]).map_groups(
        join_group, batch_format="pyarrow"
    )


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

        if batch.num_rows == 0 or "lon_mi" not in batch.column_names:
            return pa.table(
                {"q_id": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                 "d2": pa.array([], pa.int64())}
            )
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


def _partial_knn_ds(ds, queries_mi: np.ndarray, k: int):
    """Stateless-task partial kNN: the query matrix rides the object store
    once (ray.put), instances cache per worker — the stage fuses with
    neighbors and no constructor args are pinned against actor restart."""
    from cloudtile_ray.stages.util import worker_cached

    qref = ray.put(np.asarray(queries_mi, dtype=np.int64))
    key = ("pknn", qref.hex(), k)

    def fn(batch: pa.Table) -> pa.Table:
        inst = worker_cached(key, lambda: PartialKnn(ray.get(qref), k))
        return inst(batch)

    return ds.map_batches(fn, batch_format="pyarrow")


def knn(
    ds: "ray.data.Dataset", queries_mi: np.ndarray, k: int = 5
) -> pa.Table:
    """Exact kNN: distributed per-batch top-k + one tiny driver merge."""
    partials = _partial_knn_ds(ds, queries_mi, k)
    return knn_merge(pa.concat_tables(_gather(partials)), k)


def _gather(ds) -> list[pa.Table]:
    """Collect small result blocks; drop the zero-column empty blocks Ray
    emits for fully-filtered partitions (they break concat_tables)."""
    import ray as _ray

    tables = [_ray.get(ref) for ref in ds.to_arrow_refs()]
    return [t for t in tables if t.num_columns > 0]


def _index_fs(path: str):
    """Resolve (filesystem, root) for an index path with ``pyarrow.fs`` —
    the SAME filesystem ``read_parquet`` resolves, so partition listings
    work on s3://, gs://, hdfs:// etc., not just local disk (ADVICE r2 #3
    — a driver-local ``glob`` returns nothing on object storage and would
    silently disable ring pruning)."""
    from pyarrow import fs as pafs

    try:
        fsys, root = pafs.FileSystem.from_uri(path)
    except Exception:
        import os

        fsys, root = pafs.LocalFileSystem(), os.path.abspath(path)
    return fsys, root


_HEXKNN_META = "_HEXKNN_META.json"


def _hexknn_partitions(index_path: str) -> tuple[dict[int, list[str]], "object"]:
    """Authoritative partition listing of a hex-kNN index: returns
    ({parent_cell: [parquet file paths]}, filesystem) and VALIDATES the
    listing against the build-time manifest — on a cluster where the index
    landed on worker-local disks the driver would otherwise see a PARTIAL
    index and the exactness guard could certify wrong answers."""
    import json

    from pyarrow import fs as pafs

    fsys, root = _index_fs(index_path)
    infos = fsys.get_file_info(pafs.FileSelector(root, recursive=False))
    part_dirs = {
        fi.base_name: fi.path
        for fi in infos
        if fi.type == pafs.FileType.Directory and fi.base_name.startswith("cell_p=")
    }
    meta = None
    try:
        with fsys.open_input_stream(f"{root}/{_HEXKNN_META}") as f:
            meta = json.loads(f.read().decode())
    except (FileNotFoundError, OSError):
        pass
    if meta is not None and meta.get("n_partitions") != len(part_dirs):
        raise RuntimeError(
            f"hex-kNN index at {index_path} is PARTIAL: manifest records "
            f"{meta.get('n_partitions')} partitions but the filesystem shows "
            f"{len(part_dirs)} — the index must live on shared storage "
            "visible to the driver"
        )
    if not part_dirs:
        raise RuntimeError(
            f"hex-kNN index at {index_path} has no cell_p= partitions "
            "(missing index, or not on storage this process can list)"
        )
    out: dict[int, list[str]] = {}
    for name, p in part_dirs.items():
        cell = int(name.split("=", 1)[1])
        files = [
            fi.path
            for fi in fsys.get_file_info(pafs.FileSelector(p, recursive=False))
            if fi.type == pafs.FileType.File and fi.base_name.endswith(".parquet")
        ]
        out[cell] = sorted(files)
    return out, fsys


def build_hex_knn_index(
    ds: "ray.data.Dataset", res: int, path: str
) -> None:
    """ONE pass over the corpus: hex cell per point, written as slim
    (cell, doc_id, lon_mi, lat_mi) parquet partitioned by the res-0 parent
    cell — the scale-path index for ``hex_bucketed_knn``.  Each ring
    expansion then reads ONLY the partitions its candidate cells fall in
    (partition-filter pushdown at the read) instead of re-scanning and
    re-geocoding the corpus per ring (VERDICT.md r1 #6).  Build once,
    query many; at 10^12 docs the index is the durable artifact.  A
    ``_HEXKNN_META.json`` manifest (underscore-prefixed: ignored by
    parquet dataset readers) records the partition count so queries can
    detect a partially-visible index."""
    from cloudtile_ray.geo import hexgrid

    def add_cells(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(lon) | np.isnan(lat))
        idx = np.nonzero(valid)[0]
        cell = hexgrid.latlng_to_cell(lon[idx], lat[idx], res)
        parent = hexgrid.cell_to_parent(cell, 0).astype(np.int64) if len(idx) else np.empty(0, np.int64)
        sub = batch.take(pa.array(idx))
        return pa.table(
            {
                "cell": pa.array(cell),
                "cell_p": pa.array(parent),
                "doc_id": sub.column("doc_id"),
                "lon_mi": sub.column("lon_mi"),
                "lat_mi": sub.column("lat_mi"),
            }
        )

    ds.map_batches(add_cells, batch_format="pyarrow").write_parquet(
        path, partition_cols=["cell_p"]
    )
    import json

    from pyarrow import fs as pafs

    fsys, root = _index_fs(path)
    n_parts = sum(
        1
        for fi in fsys.get_file_info(pafs.FileSelector(root, recursive=False))
        if fi.type == pafs.FileType.Directory and fi.base_name.startswith("cell_p=")
    )
    with fsys.open_output_stream(f"{root}/{_HEXKNN_META}") as f:
        f.write(json.dumps({"n_partitions": n_parts, "res": res}).encode())


def build_icosa_knn_index(ds: "ray.data.Dataset", res: int, path: str) -> None:
    """Spherical-index variant of :func:`build_hex_knn_index`: cells from
    the icosahedral aperture-7 index (``geo/icosa.py`` — no dateline seam,
    poles work), partitioned by FACE (20 hive directories).  Same manifest
    mechanism, same slim schema."""
    from cloudtile_ray.geo import icosa

    def add_cells(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(lon) | np.isnan(lat))
        idx = np.nonzero(valid)[0]
        cell = (
            icosa.latlng_to_cell(lon[idx], lat[idx], res)
            if len(idx)
            else np.empty(0, np.uint64)
        )
        face = icosa.get_face(cell).astype(np.int64) if len(idx) else np.empty(0, np.int64)
        sub = batch.take(pa.array(idx))
        return pa.table(
            {
                "cell": pa.array(cell),
                "cell_p": pa.array(face),
                "doc_id": sub.column("doc_id"),
                "lon_mi": sub.column("lon_mi"),
                "lat_mi": sub.column("lat_mi"),
            }
        )

    ds.map_batches(add_cells, batch_format="pyarrow").write_parquet(
        path, partition_cols=["cell_p"]
    )
    import json

    from pyarrow import fs as pafs

    fsys, root = _index_fs(path)
    n_parts = sum(
        1
        for fi in fsys.get_file_info(pafs.FileSelector(root, recursive=False))
        if fi.type == pafs.FileType.Directory and fi.base_name.startswith("cell_p=")
    )
    with fsys.open_output_stream(f"{root}/{_HEXKNN_META}") as f:
        f.write(json.dumps({"n_partitions": n_parts, "res": res}).encode())


def icosa_bucketed_knn(
    ds: "ray.data.Dataset",
    queries_mi: np.ndarray,
    k: int = 5,
    res: int = 2,
    max_rounds: int = 8,
    index_path: str | None = None,
    stats: dict | None = None,
) -> pa.Table:
    """Cell-bucketed kNN on the SPHERICAL icosahedral index (VERDICT.md r2
    #8): the candidate set per round is a cross-face spherical cap
    (``icosa.cells_in_cap``), so pruning works across the dateline and at
    the poles where the planar hexgrid has seams.

    Exactness guard (the metric bridge): the kNN metric is planar
    milli-degree distance; great-circle distance in degrees never exceeds
    the planar lon/lat degree distance, so a cap that covers every point
    within ANGULAR radius R also covers every point within PLANAR radius
    R — once every query holds >= k candidates with k-th planar distance
    <= the round's cover radius, no point outside the searched cap can
    displace them, and the answer equals exact kNN.  ``stats['path']``
    records whether the ring proof ('ring') or the exact fallback
    ('fallback') produced the answer."""
    import tempfile

    import ray
    import ray.data

    from cloudtile_ray.geo import icosa

    q = np.asarray(queries_mi, dtype=np.int64)
    qlon = q[:, 0] / 1000.0
    qlat = q[:, 1] / 1000.0
    created_tmp = index_path is None
    if created_tmp:
        index_path = tempfile.mkdtemp(prefix="icosaknn_idx_")
        build_icosa_knn_index(ds, res, index_path)
    try:
        part_files, fsys = _hexknn_partitions(index_path)
        radius = icosa.spacing_angle_deg(res)
        for _ in range(max_rounds):
            cand = np.unique(
                np.concatenate(
                    [
                        icosa.cells_in_cap(float(qlon[i]), float(qlat[i]), radius, res)
                        for i in range(len(qlon))
                    ]
                )
            )
            faces = np.unique(icosa.get_face(cand).astype(np.int64))
            paths = [f for v in faces.tolist() for f in part_files.get(int(v), [])]
            if not paths:
                radius *= 2
                continue
            cand_ref = ray.put(cand)
            filtered = ray.data.read_parquet(paths, filesystem=fsys)

            def in_cells(batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0 or "cell" not in batch.column_names:
                    return pa.table(
                        {"doc_id": pa.array([], pa.int64()),
                         "lon_mi": pa.array([], pa.int64()),
                         "lat_mi": pa.array([], pa.int64())}
                    )
                cells = ray.get(cand_ref)
                hx = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
                keep = np.isin(hx, cells)
                return batch.select(["doc_id", "lon_mi", "lat_mi"]).take(
                    pa.array(np.nonzero(keep)[0])
                )

            survivors = filtered.map_batches(in_cells, batch_format="pyarrow")
            tables = _gather(_partial_knn_ds(survivors, q, k))
            merged = knn_merge(pa.concat_tables(tables), k) if tables else None
            if merged is not None and merged.num_rows:
                qid = merged.column("q_id").to_numpy(zero_copy_only=False)
                d2 = merged.column("d2").to_numpy(zero_copy_only=False)
                counts = np.bincount(qid, minlength=q.shape[0])
                if (counts >= k).all():
                    kth_deg = np.array(
                        [np.sqrt(d2[qid == qi].max()) / 1000.0 for qi in range(q.shape[0])]
                    )
                    if (kth_deg <= radius).all():
                        if stats is not None:
                            stats["path"] = "ring"
                            stats["radius_deg"] = radius
                        return merged
            radius *= 2
        all_files = sorted(f for files in part_files.values() for f in files)
        full = ray.data.read_parquet(
            all_files, filesystem=fsys, columns=["doc_id", "lon_mi", "lat_mi"]
        )
        if stats is not None:
            stats["path"] = "fallback"
        return knn_merge(
            pa.concat_tables(_gather(_partial_knn_ds(full, q, k))), k
        )
    finally:
        if created_tmp:
            import shutil

            shutil.rmtree(index_path, ignore_errors=True)


def hex_bucketed_knn(
    ds: "ray.data.Dataset",
    queries_mi: np.ndarray,
    k: int = 5,
    res: int = 2,
    max_rings: int = 8,
    index_path: str | None = None,
) -> pa.Table:
    """Scale path: restrict the scan to hex cells within an expanding ring
    of each query (H3-bucketed kNN per SURVEY.md §2.3), then exact top-k on
    the survivors.  The corpus is geocoded into a cell-partitioned index
    ONCE (``build_hex_knn_index``); each ring expansion reads only the
    index partitions overlapping the candidate disk.  Ring expansion
    doubles until every query has >= k candidates or ``max_rings`` is hit;
    correctness guard: a ring-r disk at res covers >= (r-1) *
    cell_inradius, so once the k-th candidate distance is below that
    radius the result equals exact kNN (asserted in tests against the
    brute-force path)."""
    import tempfile

    import ray.data

    from cloudtile_ray.geo import hexgrid

    q = np.asarray(queries_mi, dtype=np.int64)
    qlon = q[:, 0] / 1000.0
    qlat = q[:, 1] / 1000.0
    qcells = hexgrid.latlng_to_cell(qlon, qlat, res)
    created_tmp = index_path is None
    if created_tmp:
        index_path = tempfile.mkdtemp(prefix="hexknn_idx_")
        build_hex_knn_index(ds, res, index_path)
    try:
        return _hex_knn_search(
            q, qcells, k, res, max_rings, index_path
        )
    finally:
        # an internally-built index is a per-call scratch artifact: remove
        # it (ADVICE r2 #5 — repeated default-arg calls must not accumulate
        # unbounded disk).  Callers wanting build-once/query-many reuse
        # pass index_path explicitly.
        if created_tmp:
            import shutil

            shutil.rmtree(index_path, ignore_errors=True)


def _hex_knn_search(
    q: np.ndarray,
    qcells: np.ndarray,
    k: int,
    res: int,
    max_rings: int,
    index_path: str,
) -> pa.Table:
    import ray
    import ray.data

    from cloudtile_ray.geo import hexgrid

    # authoritative, manifest-validated partition listing via pyarrow.fs —
    # the same filesystem read_parquet uses (works on object storage;
    # raises instead of silently certifying results off a partial index)
    part_files, fsys = _hexknn_partitions(index_path)
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
        cand_arr = np.fromiter(cand_cells, dtype=np.uint64)
        parents = np.unique(hexgrid.cell_to_parent(cand_arr, 0).astype(np.int64))
        cand_ref = ray.put(cand_arr)

        # partition pruning: only the res-0 parent directories that can
        # contain a candidate cell are read at all
        paths = [f for v in parents.tolist() for f in part_files.get(int(v), [])]
        if not paths:
            rings *= 2
            continue
        filtered = ray.data.read_parquet(paths, filesystem=fsys)

        def in_cells(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "cell" not in batch.column_names:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "lon_mi": pa.array([], pa.int64()),
                     "lat_mi": pa.array([], pa.int64())}
                )
            cells = ray.get(cand_ref)
            hx = batch.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
            keep = np.isin(hx, cells)
            return batch.select(["doc_id", "lon_mi", "lat_mi"]).take(
                pa.array(np.nonzero(keep)[0])
            )

        survivors = filtered.map_batches(in_cells, batch_format="pyarrow")
        partials = _partial_knn_ds(survivors, q, k)
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
    # fall back to the exact scan over the slim index (4 columns — never
    # the raw corpus); explicit file list keeps the manifest json out
    all_files = sorted(f for files in part_files.values() for f in files)
    full = ray.data.read_parquet(
        all_files, filesystem=fsys, columns=["doc_id", "lon_mi", "lat_mi"]
    )
    return knn_merge(
        pa.concat_tables(_gather(_partial_knn_ds(full, q, k))), k
    )


def box_overlap_pairs(
    ds,
    id_col: str = "doc_id",
    cols: Sequence[str] = ("west", "south", "east", "north"),
    cell_mi: int = 100,
    num_parts: int | None = None,
):
    """All unordered pairs of rectangles that overlap (inclusive edges) —
    the rectangle-intersection / range-overlap spatial join (beyond the
    reference, which has no join operator; the bbox prefilter shape every
    R-tree join uses, here as the join itself).

    Scale shape: each box is replicated to every ``cell_mi``-sized grid
    cell its extent touches (boxes must be smaller than a cell, so at
    most 2×2 cells per box — asserted); one cell-keyed exchange
    (:func:`~cloudtile_ray.stages.dedup.grouped_buckets_apply`) then
    pairs boxes locally with a vectorized triangular expansion.  A pair
    that co-occurs in several cells is emitted ONLY by the cell that
    contains the overlap region's (west, south) corner, so no dedup
    exchange is needed — the output is exact with zero post-processing.
    Partitioning assumption (documented per the custom-operator rule):
    box extents are bounded by ``cell_mi``; a corpus of boxes larger
    than a cell needs a coarser ``cell_mi`` or a broadcast plan.

    Returns (doc_a, doc_b, ov_area) with ``doc_a < doc_b`` and
    ``ov_area`` the integer width×height of the (inclusive-coordinate)
    overlap region — 0 for boxes that merely touch along an edge."""
    from cloudtile_ray.stages.dedup import grouped_buckets_apply

    wcol, scol, ecol, ncol = cols
    OFF = np.int64(1) << np.int64(20)

    def to_cells(t: pa.Table) -> pa.Table:
        w = t.column(wcol).to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column(scol).to_numpy(zero_copy_only=False).astype(np.int64)
        e = t.column(ecol).to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column(ncol).to_numpy(zero_copy_only=False).astype(np.int64)
        if t.num_rows and (
            int((e - w).max()) >= cell_mi or int((n - s).max()) >= cell_mi
        ):
            raise ValueError(
                f"box extent exceeds cell_mi={cell_mi}; pass a coarser grid"
            )
        doc = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cx0, cx1 = w // cell_mi, e // cell_mi
        cy0, cy1 = s // cell_mi, n // cell_mi
        parts = []
        for cx, cy, mask in (
            (cx0, cy0, None),
            (cx1, cy0, cx1 != cx0),
            (cx0, cy1, cy1 != cy0),
            (cx1, cy1, (cx1 != cx0) & (cy1 != cy0)),
        ):
            if mask is None:
                keep = np.ones(len(doc), dtype=bool)
            else:
                keep = mask
            parts.append(
                {
                    "cell": (cx[keep] + OFF) * (OFF * 2) + (cy[keep] + OFF),
                    id_col: doc[keep],
                    "w": w[keep],
                    "s": s[keep],
                    "e": e[keep],
                    "n": n[keep],
                }
            )
        out = {
            k: pa.array(np.concatenate([p[k] for p in parts]))
            for k in parts[0]
        }
        return pa.table(out)

    cells = ds.map_batches(to_cells, batch_format="pyarrow")

    def pair_cell(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "ov_area": pa.array([], pa.int64()),
            }
        )
        m = g.num_rows
        if m < 2:
            return empty
        cell = int(g.column("cell")[0].as_py())
        ccx, ccy = cell // int(OFF * 2) - int(OFF), cell % int(OFF * 2) - int(OFF)
        doc = g.column(id_col).to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        s = g.column("s").to_numpy(zero_copy_only=False)
        e = g.column("e").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        i, j = np.triu_indices(m, 1)
        ow, oe = np.maximum(w[i], w[j]), np.minimum(e[i], e[j])
        os_, on = np.maximum(s[i], s[j]), np.minimum(n[i], n[j])
        keep = (ow <= oe) & (os_ <= on)
        # corner-cell ownership: only the cell holding the overlap's
        # (west, south) corner emits the pair
        keep &= (ow // cell_mi == ccx) & (os_ // cell_mi == ccy)
        if not keep.any():
            return empty
        i, j = i[keep], j[keep]
        area = (oe[keep] - ow[keep]) * (on[keep] - os_[keep])
        da, db = np.minimum(doc[i], doc[j]), np.maximum(doc[i], doc[j])
        return pa.table(
            {
                "doc_a": pa.array(da),
                "doc_b": pa.array(db),
                "ov_area": pa.array(area.astype(np.int64)),
            }
        )

    return grouped_buckets_apply(cells, ["cell"], pair_cell, num_parts=num_parts)


def radius_pairs(
    ds,
    radius: int,
    id_col: str = "doc_id",
    lon_col: str = "lon_mi",
    lat_col: str = "lat_mi",
    num_parts: int | None = None,
):
    """All unordered point pairs within planar distance ``radius``
    (inclusive, integer milli-degree coordinates) — the fixed-radius
    near-neighbor join (beyond the reference; complements :func:`knn`'s
    k-nearest semantics with distance-threshold semantics).

    Scale shape: grid cells of side ``radius``; every candidate pair
    spans cells at Chebyshev distance ≤ 1, and the 8-neighborhood splits
    into half received and half sent — each point is a RESIDENT of its
    home cell and a GHOST in 4 fixed backward neighbors, so every
    cross-cell pair materializes in exactly one cell and same-cell pairs
    pair residents triangularly: no dedup exchange exists.  One
    cell-keyed exchange (:func:`~cloudtile_ray.stages.dedup.
    grouped_buckets_apply`), vectorized distance check per cell.
    Partitioning assumption: point density per radius-sized cell is
    bounded (a hot cell's pair expansion is quadratic in its own
    population — matching the output size, which a join must emit
    anyway).

    Returns (doc_a, doc_b, d2) with ``doc_a < doc_b`` and ``d2`` the
    squared integer distance."""
    from cloudtile_ray.stages.dedup import grouped_buckets_apply

    if radius < 1:
        raise ValueError("radius must be >= 1")
    r2 = radius * radius
    OFF = np.int64(1) << np.int64(20)
    GHOST_SHIFTS = ((-1, 0), (-1, -1), (0, -1), (1, -1))

    def to_cells(t: pa.Table) -> pa.Table:
        x = t.column(lon_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(lat_col).to_numpy(zero_copy_only=False).astype(np.int64)
        doc = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = x // radius, y // radius
        docs, xs, ys, cells, ghosts = [], [], [], [], []
        for dx, dy in ((0, 0),) + GHOST_SHIFTS:
            docs.append(doc)
            xs.append(x)
            ys.append(y)
            cells.append((cx + dx + OFF) * (OFF * 2) + (cy + dy + OFF))
            ghosts.append(
                np.full(len(doc), 0 if (dx, dy) == (0, 0) else 1, np.int64)
            )
        return pa.table(
            {
                "cell": pa.array(np.concatenate(cells)),
                id_col: pa.array(np.concatenate(docs)),
                "x": pa.array(np.concatenate(xs)),
                "y": pa.array(np.concatenate(ys)),
                "g": pa.array(np.concatenate(ghosts)),
            }
        )

    cells = ds.map_batches(to_cells, batch_format="pyarrow")

    def pair_cell(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "d2": pa.array([], pa.int64()),
            }
        )
        if t.num_rows < 2:
            return empty
        doc = t.column(id_col).to_numpy(zero_copy_only=False)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        g = t.column("g").to_numpy(zero_copy_only=False)
        res = np.flatnonzero(g == 0)
        gho = np.flatnonzero(g == 1)
        out_i, out_j = [], []
        if len(res) >= 2:
            i, j = np.triu_indices(len(res), 1)
            out_i.append(res[i])
            out_j.append(res[j])
        if len(res) and len(gho):
            i, j = np.meshgrid(res, gho, indexing="ij")
            out_i.append(i.ravel())
            out_j.append(j.ravel())
        if not out_i:
            return empty
        i = np.concatenate(out_i)
        j = np.concatenate(out_j)
        d2 = (x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2
        keep = d2 <= r2
        if not keep.any():
            return empty
        i, j, d2 = i[keep], j[keep], d2[keep]
        da, db = np.minimum(doc[i], doc[j]), np.maximum(doc[i], doc[j])
        return pa.table(
            {
                "doc_a": pa.array(da),
                "doc_b": pa.array(db),
                "d2": pa.array(d2.astype(np.int64)),
            }
        )

    return grouped_buckets_apply(cells, ["cell"], pair_cell, num_parts=num_parts)


def zonal_box_overlap(ds, boxes_mi: np.ndarray) -> "ray.data.Dataset":
    """Area-weighted zonal aggregation over axis-aligned boxes: for every
    zone box, the summed intersection area (mi², integer) and overlap
    count against a stream of feature bounding boxes — the vector form of
    raster zonal statistics (beyond-the-reference; the reference's only
    spatial aggregate is tippecanoe's in-tile accumulate,
    /root/reference/src/cloudtile/tippecanoe.yaml:96-101).

    ``ds`` carries integer milli-degree bbox columns (w_mi, s_mi, e_mi,
    n_mi); ``boxes_mi`` is the small zone table ((id, west, south, east,
    north) int64 rows).  Scale shape: the zone table rides into the plan
    as a closure constant (30 rows here; ``ray.put`` + an actor pool is
    the swap-in at thousands of zones), every batch computes the full
    rows × zones clamp product vectorized and collapses it to ONE
    zones-sized partial, so the only exchange is a ``groupby(zone_id)``
    over n_batches × n_zones tiny rows.  All arithmetic is int64 —
    distributed float summation order can't leak in, so a SQL oracle
    replays it exactly."""
    from ray.data.aggregate import Sum

    boxes = np.asarray(boxes_mi, dtype=np.int64)
    zid = boxes[:, 0].copy()
    zw, zs, ze, zn = (boxes[:, i].copy() for i in range(1, 5))

    def partial(t: pa.Table) -> pa.Table:
        w = t.column("w_mi").to_numpy(zero_copy_only=False)[:, None]
        s = t.column("s_mi").to_numpy(zero_copy_only=False)[:, None]
        e = t.column("e_mi").to_numpy(zero_copy_only=False)[:, None]
        n = t.column("n_mi").to_numpy(zero_copy_only=False)[:, None]
        dx = np.clip(np.minimum(e, ze[None, :]) - np.maximum(w, zw[None, :]), 0, None)
        dy = np.clip(np.minimum(n, zn[None, :]) - np.maximum(s, zs[None, :]), 0, None)
        area = dx * dy  # (rows, zones) int64
        return pa.table(
            {
                "zone_id": pa.array(zid),
                "overlap_mi2": pa.array(area.sum(axis=0)),
                "n_overlaps": pa.array((area > 0).sum(axis=0).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("zone_id")
        .aggregate(
            Sum("overlap_mi2", alias_name="overlap_mi2"),
            Sum("n_overlaps", alias_name="n_overlaps"),
        )
    )


def nearest_box(ds, boxes_mi: np.ndarray) -> "ray.data.Dataset":
    """Nearest-region assignment: for every point, the zone box with the
    minimum squared L2 distance (0 inside; clamp-to-box per axis), ties
    broken by the LOWEST zone id — the completion of the PiP anti join
    (points matching no region still get a canonical region, the
    coastal-assignment convention).  Pure map work: the small box table
    rides in the closure (grid-bucket the boxes before scaling past
    ~10³ zones), each batch computes the rows × zones clamp matrix
    vectorized and one argmin — ZERO exchanges; all arithmetic int64 so
    the SQL replay is exact."""
    boxes = np.asarray(boxes_mi, dtype=np.int64)
    zid = boxes[:, 0].copy()
    order = np.argsort(zid, kind="stable")  # argmin tie => lowest zone id
    zid = zid[order]
    zw, zs, ze, zn = (boxes[order, i].copy() for i in range(1, 5))

    def assign(t: pa.Table) -> pa.Table:
        x = t.column("lon_mi").to_numpy(zero_copy_only=False)[:, None]
        y = t.column("lat_mi").to_numpy(zero_copy_only=False)[:, None]
        dx = np.maximum(np.maximum(zw[None, :] - x, x - ze[None, :]), 0)
        dy = np.maximum(np.maximum(zs[None, :] - y, y - zn[None, :]), 0)
        d2 = dx * dx + dy * dy
        j = np.argmin(d2, axis=1)
        rows = np.arange(len(j))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "zone_id": pa.array(zid[j]),
                "d2": pa.array(d2[rows, j]),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def snap_to_segments(
    points,
    segs,
    radius: int,
    id_col: str = "doc_id",
    num_parts: int | None = None,
):
    """Map-matching primitive: snap every point to its NEAREST polyline
    segment within planar distance ``radius`` (integer milli-degree
    coordinates) — the ST_ClosestPoint / GPS-trace-to-road-network join.
    Points with no segment inside ``radius`` are absent (semi semantics).

    ``points``: Dataset with (id_col, lon_mi, lat_mi) int64 columns.
    ``segs``: Dataset with (seg_id, ax_mi, ay_mi, bx_mi, by_mi) int64
    endpoint columns.

    EXACTNESS.  The squared point-segment distance is the rational
    ``num/den`` with ``den = |b-a|^2`` and ``num`` all-int64 (clamped
    projection: endpoint form ``|p-e|^2 * den``, interior form
    ``|p-a|^2 * den - dot(p-a, b-a)^2``), so the radius test is the exact
    integer comparison ``num <= radius^2 * den`` and the per-point argmin
    orders by ``(CAST(num AS DOUBLE)/den, seg_id)`` — the same correctly
    rounded division of the same integers on the engine and the SQL
    oracle, with the integer seg_id tie-break absorbing any sub-ulp
    double collision.  Emitted: (id_col, seg_id, num, den, d2).

    SCALE SHAPE.  Grid cells of side ``radius``: each point is RESIDENT
    in exactly its home cell; each segment is replicated to every cell its
    radius-expanded bbox overlaps (if dist(p, s) <= radius then s's
    expanded bbox contains p, hence overlaps p's cell) — so every
    candidate materializes in the point's home cell and the argmin is
    CELL-LOCAL: one exchange total, no dedup or second pass.  Replication
    factor per segment ~ (len/radius + 3)^2; points never replicate.
    Partitioning assumption: per-cell point x segment density is bounded
    (the within-cell check is a vectorized slab product).  int64 safety:
    within a cell all relative coordinates are bounded by
    ~(cell + radius + max segment length), giving |num| << 2^62 for any
    radius and segment length below ~10^5 milli-degrees — guarded loudly."""
    from cloudtile_ray.stages.dedup import grouped_buckets_apply

    if radius < 1:
        raise ValueError("radius must be >= 1")
    r2 = np.int64(radius) * np.int64(radius)
    OFF = np.int64(1) << np.int64(20)
    SPAN = OFF * 2

    def pt_cells(t: pa.Table) -> pa.Table:
        x = t.column("lon_mi").to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column("lat_mi").to_numpy(zero_copy_only=False).astype(np.int64)
        pid = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cell = (x // radius + OFF) * SPAN + (y // radius + OFF)
        z = np.zeros(len(pid), np.int64)
        return pa.table(
            {
                "cell": pa.array(cell),
                "kind": pa.array(z),
                "sid": pa.array(pid),
                "x1": pa.array(x),
                "y1": pa.array(y),
                "x2": pa.array(z),
                "y2": pa.array(z),
            }
        )

    def seg_cells(t: pa.Table) -> pa.Table:
        sid = t.column("seg_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ax = t.column("ax_mi").to_numpy(zero_copy_only=False).astype(np.int64)
        ay = t.column("ay_mi").to_numpy(zero_copy_only=False).astype(np.int64)
        bx = t.column("bx_mi").to_numpy(zero_copy_only=False).astype(np.int64)
        by = t.column("by_mi").to_numpy(zero_copy_only=False).astype(np.int64)
        cx0 = (np.minimum(ax, bx) - radius) // radius
        cx1 = (np.maximum(ax, bx) + radius) // radius
        cy0 = (np.minimum(ay, by) - radius) // radius
        cy1 = (np.maximum(ay, by) + radius) // radius
        nx = cx1 - cx0 + 1
        ny = cy1 - cy0 + 1
        cnt = nx * ny
        tot = int(cnt.sum())
        rep = np.repeat(np.arange(len(sid), dtype=np.int64), cnt)
        local = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(cnt[:-1]))), cnt
        )
        cx = cx0[rep] + local // ny[rep]
        cy = cy0[rep] + local % ny[rep]
        cell = (cx + OFF) * SPAN + (cy + OFF)
        one = np.ones(tot, np.int64)
        return pa.table(
            {
                "cell": pa.array(cell),
                "kind": pa.array(one),
                "sid": pa.array(sid[rep]),
                "x1": pa.array(ax[rep]),
                "y1": pa.array(ay[rep]),
                "x2": pa.array(bx[rep]),
                "y2": pa.array(by[rep]),
            }
        )

    both = points.map_batches(pt_cells, batch_format="pyarrow").union(
        segs.map_batches(seg_cells, batch_format="pyarrow")
    )
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "seg_id": pa.array([], pa.int64()),
            "num": pa.array([], pa.int64()),
            "den": pa.array([], pa.int64()),
            "d2": pa.array([], pa.float64()),
        }
    )

    def per_cell(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        pts = np.flatnonzero(kind == 0)
        sgs = np.flatnonzero(kind == 1)
        if len(pts) == 0 or len(sgs) == 0:
            return empty
        sid = g.column("sid").to_numpy(zero_copy_only=False)
        x1 = g.column("x1").to_numpy(zero_copy_only=False)
        y1 = g.column("y1").to_numpy(zero_copy_only=False)
        x2 = g.column("x2").to_numpy(zero_copy_only=False)
        y2 = g.column("y2").to_numpy(zero_copy_only=False)
        px, py, pid = x1[pts], y1[pts], sid[pts]
        # segments sorted by seg_id so argmin's first-min IS the lowest
        # seg_id tie-break
        so = np.argsort(sid[sgs], kind="stable")
        sg = sgs[so]
        sax, say, sbx, sby, ssid = x1[sg], y1[sg], x2[sg], y2[sg], sid[sg]
        dx = sbx - sax
        dy = sby - say
        den = dx * dx + dy * dy
        if den.max(initial=0) >= np.int64(1) << 31:
            raise OverflowError(
                "snap_to_segments: segment length^2 >= 2^31 breaks the "
                "int64 rational bound — pre-split long segments"
            )
        den_max = int(den.max(initial=1))
        # The radius test below computes r2 * den in int64; a silent wrap
        # would DROP valid snaps, so bound it loudly like the other guards.
        if int(r2) > (2**63 - 1) // den_max:
            raise OverflowError(
                "snap_to_segments: radius^2 * segment_length^2 exceeds "
                "int64 — shrink the radius or pre-split long segments"
            )
        # |num| <= 2*relmax^2*den and tnum^2 <= same bound: keep the
        # product strictly inside int64
        rel_cap = int(np.sqrt((2**61) / max(den_max, 1)))
        out_pid, out_sid, out_num, out_den, out_d2 = [], [], [], [], []
        slab = max(1, (1 << 20) // max(len(sg), 1))
        for s0 in range(0, len(pts), slab):
            qx = px[s0 : s0 + slab, None]
            qy = py[s0 : s0 + slab, None]
            dax = sax[None, :] - qx
            day = say[None, :] - qy
            dbx = sbx[None, :] - qx
            dby = sby[None, :] - qy
            if max(
                np.abs(dax).max(initial=0), np.abs(day).max(initial=0),
                np.abs(dbx).max(initial=0), np.abs(dby).max(initial=0),
            ) >= rel_cap:
                raise OverflowError(
                    "snap_to_segments: relative coordinate exceeds the "
                    "int64 rational safety bound for this segment length"
                )
            a2 = dax * dax + day * day
            tnum = -(dax * dx[None, :] + day * dy[None, :])
            num = np.where(
                tnum <= 0,
                a2 * den[None, :],
                np.where(
                    tnum >= den[None, :],
                    (dbx * dbx + dby * dby) * den[None, :],
                    a2 * den[None, :] - tnum * tnum,
                ),
            )
            ok = num <= r2 * den[None, :]
            d2 = num.astype(np.float64) / den[None, :].astype(np.float64)
            d2 = np.where(ok, d2, np.inf)
            j = np.argmin(d2, axis=1)  # first min -> lowest seg_id on ties
            rows = np.flatnonzero(np.isfinite(d2[np.arange(len(j)), j]))
            if len(rows) == 0:
                continue
            jj = j[rows]
            out_pid.append(pid[s0 : s0 + slab][rows])
            out_sid.append(ssid[jj])
            out_num.append(num[rows, jj])
            out_den.append(den[jj])
            out_d2.append(d2[rows, jj])
        if not out_pid:
            return empty
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_pid)),
                "seg_id": pa.array(np.concatenate(out_sid)),
                "num": pa.array(np.concatenate(out_num)),
                "den": pa.array(np.concatenate(out_den)),
                "d2": pa.array(np.concatenate(out_d2)),
            }
        )

    return grouped_buckets_apply(both, ["cell"], per_cell, num_parts=num_parts)


def segment_intersection_pairs(
    segs,
    id_col: str = "seg_id",
    cell_mi: int = 1024,
    num_parts: int | None = None,
):
    """All unordered pairs of line segments that INTERSECT — proper
    crossings, endpoint touches, and collinear overlaps — decided by the
    exact integer orientation predicate (CLRS §33.1: four cross-product
    signs + collinear bbox containment).  The map-overlay / conflation
    primitive (street-grid crossing detection); complements
    :func:`box_overlap_pairs` (bbox-only) with the exact geometry test.

    ``segs``: Dataset with (id_col, ax_mi, ay_mi, bx_mi, by_mi) int64
    endpoints.  Returns (seg_a, seg_b, proper) with ``seg_a < seg_b`` and
    ``proper`` 1 for a strict interior crossing, 0 for touch/overlap.

    Scale shape: each segment replicates to every ``cell_mi``-sized grid
    cell its bbox touches (extents must be < cell_mi — asserted, so at
    most 2x2 cells); ONE cell-keyed exchange, vectorized triangular
    candidate expansion + bbox prefilter per cell, and a pair co-located
    in several cells is tested ONLY by the cell owning the bbox-overlap
    region's (west, south) corner — exact output with no dedup pass
    (the box_overlap_pairs ownership rule).  All arithmetic int64: cross
    products are (segment extent) x (candidate gap), both < cell_mi, so
    |d| < 2*cell_mi^2 and the d*d straddle products stay << 2^62."""
    from cloudtile_ray.stages.dedup import grouped_buckets_apply

    OFF = np.int64(1) << np.int64(20)
    SPAN = OFF * 2

    def to_cells(t: pa.Table) -> pa.Table:
        sid = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ax = t.column("ax_mi").to_numpy(zero_copy_only=False).astype(np.int64)
        ay = t.column("ay_mi").to_numpy(zero_copy_only=False).astype(np.int64)
        bx = t.column("bx_mi").to_numpy(zero_copy_only=False).astype(np.int64)
        by = t.column("by_mi").to_numpy(zero_copy_only=False).astype(np.int64)
        w, e = np.minimum(ax, bx), np.maximum(ax, bx)
        s, n = np.minimum(ay, by), np.maximum(ay, by)
        if t.num_rows and (
            int((e - w).max()) >= cell_mi or int((n - s).max()) >= cell_mi
        ):
            raise ValueError(
                f"segment extent exceeds cell_mi={cell_mi}; coarsen the grid"
            )
        cx0, cx1 = w // cell_mi, e // cell_mi
        cy0, cy1 = s // cell_mi, n // cell_mi
        outs = []
        for gx, gy in ((0, 0), (0, 1), (1, 0), (1, 1)):
            cx = cx0 if gx == 0 else cx1
            cy = cy0 if gy == 0 else cy1
            outs.append(
                pa.table(
                    {
                        "cell": pa.array((cx + OFF) * SPAN + (cy + OFF)),
                        id_col: pa.array(sid),
                        "ax": pa.array(ax),
                        "ay": pa.array(ay),
                        "bx": pa.array(bx),
                        "by_": pa.array(by),
                    }
                )
            )
        merged = pa.concat_tables(outs)
        # drop duplicate (cell, id) copies created when a bbox spans < 2x2
        c = merged.column("cell").to_numpy(zero_copy_only=False)
        i = merged.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((i, c))
        cs, is_ = c[order], i[order]
        keep = np.empty(len(cs), dtype=bool)
        if len(cs):
            keep[0] = True
            keep[1:] = (cs[1:] != cs[:-1]) | (is_[1:] != is_[:-1])
        return merged.take(pa.array(order[keep], pa.int64()))

    cells = segs.map_batches(to_cells, batch_format="pyarrow")
    empty = pa.table(
        {
            "seg_a": pa.array([], pa.int64()),
            "seg_b": pa.array([], pa.int64()),
            "proper": pa.array([], pa.int64()),
        }
    )

    def per_cell(g: pa.Table) -> pa.Table:
        m = g.num_rows
        if m < 2:
            return empty
        cell0 = int(g.column("cell").to_numpy(zero_copy_only=False)[0])
        cell_x = cell0 // SPAN - OFF
        cell_y = cell0 % SPAN - OFF
        sid = g.column(id_col).to_numpy(zero_copy_only=False)
        ax = g.column("ax").to_numpy(zero_copy_only=False)
        ay = g.column("ay").to_numpy(zero_copy_only=False)
        bx = g.column("bx").to_numpy(zero_copy_only=False)
        by = g.column("by_").to_numpy(zero_copy_only=False)
        w, e = np.minimum(ax, bx), np.maximum(ax, bx)
        s, n = np.minimum(ay, by), np.maximum(ay, by)
        i, j = np.triu_indices(m, 1)
        # bbox prefilter + ownership: only the cell holding the overlap
        # region's (west, south) corner tests this pair
        ow = np.maximum(w[i], w[j])
        os_ = np.maximum(s[i], s[j])
        cand = (
            (ow <= np.minimum(e[i], e[j]))
            & (os_ <= np.minimum(n[i], n[j]))
            & (ow // cell_mi == cell_x)
            & (os_ // cell_mi == cell_y)
            & (sid[i] != sid[j])
        )
        i, j = i[cand], j[cand]
        if len(i) == 0:
            return empty
        d1x, d1y = bx[i] - ax[i], by[i] - ay[i]
        d2x, d2y = bx[j] - ax[j], by[j] - ay[j]

        def cross(ux, uy, vx, vy):
            return ux * vy - uy * vx

        d1 = cross(d1x, d1y, ax[j] - ax[i], ay[j] - ay[i])
        d2 = cross(d1x, d1y, bx[j] - ax[i], by[j] - ay[i])
        d3 = cross(d2x, d2y, ax[i] - ax[j], ay[i] - ay[j])
        d4 = cross(d2x, d2y, bx[i] - ax[j], by[i] - ay[j])
        proper = ((d1 > 0) != (d2 > 0)) & (d1 != 0) & (d2 != 0) & (
            (d3 > 0) != (d4 > 0)
        ) & (d3 != 0) & (d4 != 0)

        def onseg(px, py, k):
            return (w[k] <= px) & (px <= e[k]) & (s[k] <= py) & (py <= n[k])

        touch = (
            ((d1 == 0) & onseg(ax[j], ay[j], i))
            | ((d2 == 0) & onseg(bx[j], by[j], i))
            | ((d3 == 0) & onseg(ax[i], ay[i], j))
            | ((d4 == 0) & onseg(bx[i], by[i], j))
        )
        hit = proper | touch
        if not hit.any():
            return empty
        ii, jj, pp = i[hit], j[hit], proper[hit]
        sa = np.minimum(sid[ii], sid[jj])
        sb = np.maximum(sid[ii], sid[jj])
        return pa.table(
            {
                "seg_a": pa.array(sa),
                "seg_b": pa.array(sb),
                "proper": pa.array(pp.astype(np.int64)),
            }
        )

    return grouped_buckets_apply(cells, ["cell"], per_cell, num_parts=num_parts)


def hausdorff_pairs(
    lines,
    h: int,
    cell_mi: int = 2048,
    id_col: str = "doc_id",
    max_vertices: int = 16,
    num_parts: int | None = None,
):
    """Trajectory-similarity join: all unordered pairs of polylines whose
    symmetric DISCRETE Hausdorff distance is <= ``h`` — every vertex of
    each line within ``h`` of SOME segment of the other (the PostGIS
    ST_HausdorffDistance discretization; similar-route / GPS-trace
    clustering primitive).

    ``lines``: Dataset with (id_col, vx_mi: list<int64>, vy_mi:
    list<int64>) integer milli-degree vertex lists (>= 2 vertices,
    <= ``max_vertices`` — pre-densify longer traces; the bound keeps the
    padded per-cell tensor small).

    EXACTNESS.  Vertex-to-segment distance is the same int64 rational
    num/den as :func:`snap_to_segments`; the threshold test
    ``num <= h^2 * den`` is exact, and the Hausdorff predicate is pure
    boolean algebra over those tests (AND over vertices of OR over
    segments, both directions) — no fraction ever compares against
    another, so a SQL oracle replays it with integer CASE terms.

    SCALE SHAPE.  Each line replicates to every cell its h-inflated bbox
    touches (cell side = 2 * (h + max extent), so <= 2x2 cells); one
    cell exchange; candidate pairs are inflated-bbox overlaps owned by
    the cell containing the overlap's (west, south) corner (the
    box_overlap_pairs rule) — output exact with no dedup pass.  The
    per-cell predicate evaluates as one (pairs x V x S) broadcast over
    the padded vertex tensor."""
    from cloudtile_ray.stages.dedup import grouped_buckets_apply

    if h < 0:
        raise ValueError("h must be >= 0")
    h2 = np.int64(h) * np.int64(h)
    OFF = np.int64(1) << np.int64(20)
    SPAN = OFF * 2

    def unpack(t: pa.Table):
        vx = t.column("vx_mi")
        vy = t.column("vy_mi")
        if isinstance(vx, pa.ChunkedArray):
            vx, vy = vx.combine_chunks(), vy.combine_chunks()
        offs = vx.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        x = vx.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        y = vy.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        npts = np.diff(offs)
        if t.num_rows and (int(npts.min()) < 2 or int(npts.max()) > max_vertices):
            raise ValueError(
                f"hausdorff_pairs: vertex counts must be in [2, {max_vertices}]"
            )
        return offs, x, y, npts

    def to_cells(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "vx_mi": pa.array([], pa.list_(pa.int64())),
                    "vy_mi": pa.array([], pa.list_(pa.int64())),
                }
            )
        offs, x, y, npts = unpack(t)
        sid = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.minimum.reduceat(x, offs[:-1]) - h
        e = np.maximum.reduceat(x, offs[:-1]) + h
        s = np.minimum.reduceat(y, offs[:-1]) - h
        n = np.maximum.reduceat(y, offs[:-1]) + h
        # cell_mi is a GLOBAL operator parameter (a per-batch choice would
        # misalign grids across batches and silently drop pairs)
        if int(max((e - w).max(), (n - s).max())) >= cell_mi:
            raise ValueError(
                f"hausdorff_pairs: inflated line extent exceeds "
                f"cell_mi={cell_mi}; pass a coarser grid"
            )
        outs = []
        for gx, gy in ((0, 0), (0, 1), (1, 0), (1, 1)):
            cx = (w if gx == 0 else e) // cell_mi
            cy = (s if gy == 0 else n) // cell_mi
            outs.append((cx + OFF) * SPAN + (cy + OFF))
        cells4 = np.stack(outs, axis=1)  # (rows, 4)
        rows = np.repeat(np.arange(t.num_rows, dtype=np.int64), 4)
        flat = cells4.ravel()
        order = np.lexsort((flat, rows))
        rs, cs = rows[order], flat[order]
        keep = np.empty(len(rs), dtype=bool)
        keep[0] = True
        keep[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])
        rs, cs = rs[keep], cs[keep]
        out = t.take(pa.array(rs, pa.int64()))
        out = out.append_column("cell", pa.array(cs))
        return out.select(["cell", id_col, "vx_mi", "vy_mi"])

    cells = lines.map_batches(to_cells, batch_format="pyarrow")
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )

    def per_cell(g: pa.Table) -> pa.Table:
        m = g.num_rows
        if m < 2:
            return empty
        cell0 = int(g.column("cell").to_numpy(zero_copy_only=False)[0])
        cell_x = cell0 // SPAN - OFF
        cell_y = cell0 % SPAN - OFF
        offs, x, y, npts = unpack(g)
        sid = g.column(id_col).to_numpy(zero_copy_only=False)
        V = int(npts.max())
        # padded vertex tensor: pads repeat the LAST vertex (a repeated
        # vertex adds a zero-length segment and a duplicate vertex —
        # both predicate-neutral)
        idx = np.minimum(
            np.arange(V)[None, :], (npts - 1)[:, None]
        ) + offs[:-1][:, None]
        PX, PY = x[idx], y[idx]  # (m, V)
        w = PX.min(axis=1) - h
        e = PX.max(axis=1) + h
        s = PY.min(axis=1) - h
        n = PY.max(axis=1) + h
        i, j = np.triu_indices(m, 1)
        ow = np.maximum(w[i], w[j])
        os_ = np.maximum(s[i], s[j])
        cand = (
            (ow <= np.minimum(e[i], e[j]))
            & (os_ <= np.minimum(n[i], n[j]))
            & (ow // cell_mi == cell_x)
            & (os_ // cell_mi == cell_y)
            & (sid[i] != sid[j])
        )
        i, j = i[cand], j[cand]
        if len(i) == 0:
            return empty

        def directed(src, dst):
            # every vertex of src within h of some segment of dst:
            # (pairs, V_src, S_dst) broadcast of the exact rational test
            px = PX[src][:, :, None].astype(np.int64)
            py = PY[src][:, :, None].astype(np.int64)
            ax = PX[dst][:, None, :-1].astype(np.int64)
            ay = PY[dst][:, None, :-1].astype(np.int64)
            bx = PX[dst][:, None, 1:].astype(np.int64)
            by = PY[dst][:, None, 1:].astype(np.int64)
            dx, dy = bx - ax, by - ay
            den = dx * dx + dy * dy  # 0 for pad segments
            dax, day = ax - px, ay - py
            dbx, dby = bx - px, by - py
            a2 = dax * dax + day * day
            b2 = dbx * dbx + dby * dby
            tnum = -(dax * dx + day * dy)
            num = np.where(
                tnum <= 0, a2 * den,
                np.where(tnum >= den, b2 * den, a2 * den - tnum * tnum),
            )
            # degenerate (pad / zero-length) segment: den == 0 -> point
            # distance, exact test a2 <= h^2
            near = np.where(den > 0, num <= h2 * den, a2 <= h2)
            # pad VERTICES duplicate the last real vertex: harmless in AND
            return near.any(axis=2).all(axis=1)

        ok = directed(i, j) & directed(j, i)
        if not ok.any():
            return empty
        ii, jj = i[ok], j[ok]
        return pa.table(
            {
                "doc_a": pa.array(np.minimum(sid[ii], sid[jj])),
                "doc_b": pa.array(np.maximum(sid[ii], sid[jj])),
            }
        )

    return grouped_buckets_apply(cells, ["cell"], per_cell, num_parts=num_parts)


def zone_clip_lengths(ds, boxes_mi: np.ndarray) -> "ray.data.Dataset":
    """Polyline-in-zone intersection lengths (ST_Length(ST_Intersection)
    for axis-aligned zones): for every (zone, line segment) pair whose
    Liang-Barsky clip is non-degenerate, one row with the clipped length
    — the line-density zonal statistic (road-miles-per-district shape).

    ``ds`` carries integer milli-degree segment endpoints (doc_id,
    seg_no, x1, y1, x2, y2 — axis-parallel segments are allowed only when
    the zero-delta axis is handled by the caller; this kernel requires
    dx != 0 and dy != 0, which the corpus's diagonal chevron segments
    guarantee).  ``boxes_mi`` is the small (id, west, south, east, north)
    zone table, a closure constant like :func:`zonal_box_overlap`.

    Float contract (SQL-replayable): t-parameters are single IEEE double
    divisions of int64 differences; min/max composition is EXACT (no
    rounding), the inside test is strict ``t1 > t0``, and the length is
    ``(t1 - t0) * sqrt(dx*dx + dy*dy)`` — two more correctly-rounded ops
    in a fixed order.  Emitting PAIR-grain rows (never a float sum)
    keeps the whole operator bit-deterministic under any parallelism.

    Scale shape: zero exchanges — every batch computes its rows x zones
    clip product vectorized and emits only hits; rollups belong to the
    caller (int counts are safe anywhere; float length sums need a
    deterministic fold)."""
    boxes = np.asarray(boxes_mi, dtype=np.int64)
    zid = boxes[:, 0].copy()
    zw, zs, ze, zn = (boxes[:, i].copy() for i in range(1, 5))

    def clip(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "zone_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "seg_no": pa.array([], pa.int64()),
                "len_mi": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        seg = t.column("seg_no").to_numpy(zero_copy_only=False)
        x1 = t.column("x1").to_numpy(zero_copy_only=False).astype(np.int64)
        y1 = t.column("y1").to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = t.column("x2").to_numpy(zero_copy_only=False).astype(np.int64)
        y2 = t.column("y2").to_numpy(zero_copy_only=False).astype(np.int64)
        dx = x2 - x1
        dy = y2 - y1
        if (dx == 0).any() or (dy == 0).any():
            raise ValueError(
                "zone_clip_lengths: axis-parallel segment (dx or dy == 0); "
                "pre-split such segments with an interval clip"
            )
        # (rows, zones) t-parameters; int64 diffs divided as doubles —
        # identical to the oracle's (z.west_mi - x1) / dx
        ta = (zw[None, :] - x1[:, None]) / dx[:, None]
        tb = (ze[None, :] - x1[:, None]) / dx[:, None]
        txmin = np.minimum(ta, tb)
        txmax = np.maximum(ta, tb)
        tc = (zs[None, :] - y1[:, None]) / dy[:, None]
        td = (zn[None, :] - y1[:, None]) / dy[:, None]
        tymin = np.minimum(tc, td)
        tymax = np.maximum(tc, td)
        t0 = np.maximum(np.maximum(txmin, tymin), 0.0)
        t1 = np.minimum(np.minimum(txmax, tymax), 1.0)
        hit = t1 > t0
        if not hit.any():
            return empty
        ri, zi = np.nonzero(hit)
        seg_len = np.sqrt(
            (dx[ri] * dx[ri] + dy[ri] * dy[ri]).astype(np.float64)
        )
        lens = (t1[ri, zi] - t0[ri, zi]) * seg_len
        return pa.table(
            {
                "zone_id": pa.array(zid[zi]),
                "doc_id": pa.array(doc[ri]),
                "seg_no": pa.array(seg[ri]),
                "len_mi": pa.array(lens),
            }
        )

    return ds.map_batches(clip, batch_format="pyarrow")
