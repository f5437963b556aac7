"""Ray-based end-to-end tests: flagship pipeline invariants, join strategy
equivalence vs the naive oracle, tile determinism across parallelism
shapes, dedup behavior on constructed near-duplicates (FIXTURES.md §4)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def tiny_pages_ds(ray_session):
    import ray.data

    from cloudtile_ray.sources.pages import generate_pages

    return ray.data.from_arrow(generate_pages(1000)).repartition(4)


class TestFlagship:
    def test_tiles_match_scalar_oracle(self, sf_tiny):
        """Tile ladder counts from the full pipeline equal an independent
        scalar recomputation from the deterministic derivation rules."""
        import math

        from cloudtile_ray.pipelines.single_step import single_step
        from cloudtile_ray.sources.pages import derive_geo_arrays

        df = single_step(sf_tiny, 5, 6).to_pandas()
        got = df.groupby("z")["n_source_points"].sum().to_dict()
        # oracle: per-doc scalar tile assignment (multi-match join dups NOT
        # included — n_source_points counts exploded rows, and single_step
        # explodes the joined-left rows, so compute the join fan-out too)
        g = derive_geo_arrays(np.arange(500))
        from cloudtile_ray.sources.pages import zone_boxes_mi

        boxes = zone_boxes_mi()
        per_z = 0
        for i in range(500):
            if not g["has_geo"][i]:
                continue
            lon_mi, lat_mi = g["lon_mi"][i], g["lat_mi"][i]
            matches = sum(
                1
                for (w, s, e, n) in boxes
                if w <= lon_mi <= e and s <= lat_mi <= n
            )
            per_z += max(1, matches)  # left join: unmatched rows survive once
        assert got[5] == per_z and got[6] == per_z

    def test_text_byte_identity(self, sf_tiny):
        """sha256(text) per url unchanged through geocode+index stages."""
        import hashlib

        import pyarrow.parquet as pq

        from cloudtile_ray.pipelines.single_step import geocoded_dataset

        src = pq.read_table(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        want = {
            i: hashlib.sha256(t.encode()).hexdigest()
            for i, t in zip(src.column("doc_id").to_pylist(), src.column("text").to_pylist())
        }
        out = geocoded_dataset(sf_tiny).to_pandas()
        got = {
            int(r.doc_id): hashlib.sha256(r.text.encode()).hexdigest()
            for r in out.itertuples()
        }
        assert got == want

    def test_salted_equals_default(self, sf_tiny):
        from cloudtile_ray.pipelines.single_step import geocoded_dataset
        from cloudtile_ray.stages.index import AssignTiles
        from cloudtile_ray.stages.tiles import encode_tiles

        ex = (
            geocoded_dataset(sf_tiny)
            .map_batches(lambda t: t.select(["doc_id", "lon", "lat"]), batch_format="pyarrow")
            .map_batches(AssignTiles(4, 6), batch_format="pyarrow")
        )
        cols = ["z", "x", "y", "n_features", "n_source_points", "tile_nbytes"]
        key = ["z", "x", "y"]
        a = (
            encode_tiles(ex, salted=False).to_pandas()[cols]
            .sort_values(key).reset_index(drop=True)
        )
        b = (
            encode_tiles(ex, salted=True, hot_threshold=2, n_salts=4).to_pandas()[cols]
            .sort_values(key).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_determinism_across_batch_shapes(self, sf_tiny):
        """Identical tiles regardless of partitioning/batch shape — the
        reproducibility-under-parallelism requirement (SURVEY.md §7.5.3)."""
        import ray.data

        from cloudtile_ray.pipelines.single_step import geocoded_dataset
        from cloudtile_ray.stages.index import AssignTiles
        from cloudtile_ray.stages.tiles import encode_tiles

        base = geocoded_dataset(sf_tiny).map_batches(
            lambda t: t.select(["doc_id", "lon", "lat"]), batch_format="pyarrow"
        )
        outs = []
        for nparts in (1, 7):
            ex = base.repartition(nparts).map_batches(AssignTiles(4, 6), batch_format="pyarrow")
            outs.append(
                encode_tiles(ex, n_partitions=5)
                .to_pandas()
                .drop(columns=["tile_bytes"])
                .reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_tile_bytes_decode(self, sf_tiny):
        from cloudtile_ray.pipelines.single_step import single_step
        from cloudtile_ray.stages.tiles import decode_tile

        df = single_step(sf_tiny, 5, 5).to_pandas()
        row = df.iloc[10]
        d = decode_tile(row.tile_bytes)
        assert (d["z"], d["x"], d["y"]) == (row.z, row.x, row.y)
        assert len(d["px"]) == row.n_features
        assert row.n_features <= d["cnt"].sum() <= row.n_source_points

    def test_feature_cap_enforced(self, sf_tiny):
        from cloudtile_ray.pipelines.single_step import geocoded_dataset
        from cloudtile_ray.stages.index import AssignTiles
        from cloudtile_ray.stages.tiles import encode_tiles

        ex = (
            geocoded_dataset(sf_tiny)
            .map_batches(lambda t: t.select(["doc_id", "lon", "lat"]), batch_format="pyarrow")
            .map_batches(AssignTiles(2, 3), batch_format="pyarrow")
        )
        df = encode_tiles(ex, settings={"maximum-tile-features": 10}).to_pandas()
        assert df.n_features.max() <= 10
        assert (df.n_dropped > 0).any()

    def test_byte_cap_enforced(self, sf_tiny):
        from cloudtile_ray.pipelines.single_step import geocoded_dataset
        from cloudtile_ray.stages.index import AssignTiles
        from cloudtile_ray.stages.tiles import encode_tiles

        ex = (
            geocoded_dataset(sf_tiny)
            .map_batches(lambda t: t.select(["doc_id", "lon", "lat"]), batch_format="pyarrow")
            .map_batches(AssignTiles(2, 3), batch_format="pyarrow")
        )
        df = encode_tiles(ex, settings={"maximum-tile-bytes": 200}).to_pandas()
        assert df.tile_nbytes.max() <= 200


class TestJoins:
    @pytest.fixture(scope="class")
    def fixture_polys(self):
        rng = np.random.default_rng(3)
        polys = []
        for _ in range(40):
            cx, cy = rng.uniform(-60, 60, 2)
            angles = np.sort(rng.uniform(0, 2 * np.pi, 8))
            r = rng.uniform(3, 12)
            polys.append([np.c_[cx + r * np.cos(angles), cy + r * np.sin(angles)]])
        return polys

    def test_broadcast_equals_shuffle_equals_naive(self, tiny_pages_ds, fixture_polys):
        from cloudtile_ray.geo.pip import naive_pip
        from cloudtile_ray.stages import geocode, join as join_stage

        geo = tiny_pages_ds.map_batches(geocode.geocode_batch, batch_format="pyarrow")
        geo = geo.map_batches(
            lambda t: t.filter(pa.compute.is_valid(t.column("lat"))),
            batch_format="pyarrow",
        )
        ids = np.arange(len(fixture_polys), dtype=np.int64)
        names = [f"p{j}" for j in ids]
        res_b = join_stage.broadcast_pip_join(geo, fixture_polys, ids, names, how="inner").to_pandas()
        res_s = join_stage.shuffle_pip_join(geo, fixture_polys, ids, names, how="inner").to_pandas()
        key = lambda df: sorted(zip(df.url, df.zone_id))
        assert key(res_b) == key(res_s)
        # naive oracle over the same points
        pts = geo.to_pandas()
        hits = naive_pip(fixture_polys, pts.lon.to_numpy(), pts.lat.to_numpy())
        want = sorted((pts.url.iloc[i], ids[p]) for i, p in hits)
        assert key(res_b) == want
        assert len(want) > 20

    def test_salted_shuffle_join_equals_broadcast(self, tiny_pages_ds, fixture_polys):
        """Force hot-bucket salting (hot_threshold=1: EVERY non-empty
        bucket splits into salt sub-partitions) and assert the join output
        is unchanged — skew handling must be a pure repartitioning."""
        from cloudtile_ray.stages import geocode, join as join_stage

        geo = tiny_pages_ds.map_batches(geocode.geocode_batch, batch_format="pyarrow")
        geo = geo.map_batches(
            lambda t: t.filter(pa.compute.is_valid(t.column("lat"))),
            batch_format="pyarrow",
        )
        ids = np.arange(len(fixture_polys), dtype=np.int64)
        names = [f"p{j}" for j in ids]
        res_b = join_stage.broadcast_pip_join(
            geo, fixture_polys, ids, names, how="inner"
        ).to_pandas()
        res_s = join_stage.shuffle_pip_join(
            geo, fixture_polys, ids, names, how="inner",
            hot_threshold=1, n_salts=4,
        ).to_pandas()
        key = lambda df: sorted(zip(df.url, df.zone_id))
        assert key(res_b) == key(res_s)

    def test_semi_anti_partition(self, tiny_pages_ds, fixture_polys):
        from cloudtile_ray.stages import geocode, join as join_stage

        geo = tiny_pages_ds.map_batches(geocode.geocode_batch, batch_format="pyarrow")
        geo = geo.map_batches(
            lambda t: t.filter(pa.compute.is_valid(t.column("lat"))),
            batch_format="pyarrow",
        )
        ids = np.arange(len(fixture_polys), dtype=np.int64)
        names = [f"p{j}" for j in ids]
        n_all = geo.count()
        n_semi = join_stage.broadcast_pip_join(geo, fixture_polys, ids, names, how="semi").count()
        n_anti = join_stage.broadcast_pip_join(geo, fixture_polys, ids, names, how="anti").count()
        assert n_semi + n_anti == n_all
        left = join_stage.broadcast_pip_join(geo, fixture_polys, ids, names, how="left").to_pandas()
        assert left.zone_id.isna().sum() == n_anti

    def test_hex_knn_equals_exact(self, sf_tiny):
        import __ray_entry__ as e

        exact = e.q_knn_points(sf_tiny)
        bucketed = e.q_hex_knn(sf_tiny)
        pd.testing.assert_frame_equal(
            exact.to_pandas().sort_values(["q_id", "doc_id"]).reset_index(drop=True),
            bucketed.to_pandas().sort_values(["q_id", "doc_id"]).reset_index(drop=True),
        )

    def test_hex_knn_index_prunes_partitions(self, sf_tiny, tmp_path):
        """The cell-partitioned index really prunes: the partitions a
        ring-1 disk selects hold far fewer rows than the corpus (the
        VERDICT.md wrong-#6 'done' criterion: scan rows << corpus rows)."""
        import glob

        import pyarrow.parquet as pq

        import __ray_entry__ as e
        from cloudtile_ray.geo import hexgrid
        from cloudtile_ray.sources.pages import KNN_QUERIES_MI
        from cloudtile_ray.stages.join import build_hex_knn_index

        geo = e._geo_only(sf_tiny)
        idx = str(tmp_path / "hexidx")
        res = 2
        build_hex_knn_index(geo, res, idx)
        total = sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(f"{idx}/**/*.parquet", recursive=True)
        )
        assert total > 0
        q = KNN_QUERIES_MI
        qcells = hexgrid.latlng_to_cell(q[:, 0] / 1000.0, q[:, 1] / 1000.0, res)
        cand = set()
        for c in qcells.tolist():
            cand.update(hexgrid.grid_disk(int(c), 1).tolist())
        parents = {
            int(v)
            for v in hexgrid.cell_to_parent(
                np.fromiter(cand, dtype=np.uint64), 0
            ).astype(np.int64)
        }
        scanned = sum(
            pq.read_metadata(f).num_rows
            for p in parents
            for f in glob.glob(f"{idx}/cell_p={p}/*.parquet")
        )
        assert scanned < total * 0.5  # ring-1 reads a strict subset

    def test_hex_knn_index_manifest_detects_partial_index(self, sf_tiny, tmp_path):
        """ADVICE r2 #3: a partially-visible index (e.g. partitions on
        worker-local disks) must raise instead of letting the exactness
        guard certify answers from an incomplete scan."""
        import shutil

        import __ray_entry__ as e
        from cloudtile_ray.stages.join import _hexknn_partitions, build_hex_knn_index

        geo = e._geo_only(sf_tiny)
        idx = str(tmp_path / "hexidx2")
        build_hex_knn_index(geo, 2, idx)
        parts, _ = _hexknn_partitions(idx)  # intact: listing succeeds
        assert len(parts) > 0
        # simulate a partition missing from the driver's view
        victim = sorted(parts)[0]
        shutil.rmtree(f"{idx}/cell_p={victim}")
        with pytest.raises(RuntimeError, match="PARTIAL"):
            _hexknn_partitions(idx)

    def test_hex_knn_temp_index_cleaned_up(self, sf_tiny):
        """ADVICE r2 #5: index_path=None builds a scratch index and must
        remove it after the call."""
        import glob

        import __ray_entry__ as e
        from cloudtile_ray.stages.join import hex_bucketed_knn
        from cloudtile_ray.sources.pages import KNN_QUERIES_MI

        before = set(glob.glob("/tmp/hexknn_idx_*"))
        geo = e._geo_only(sf_tiny)
        out = hex_bucketed_knn(geo, KNN_QUERIES_MI, k=3, res=2)
        assert out.num_rows > 0
        assert set(glob.glob("/tmp/hexknn_idx_*")) == before


class TestDedup:
    @pytest.fixture(scope="class")
    def near_dup_ds(self, ray_session):
        import ray.data

        base = (
            "the quick brown fox jumps over the lazy dog again and again "
            "while the market data pipeline keeps streaming batches of rows"
        )
        rng = np.random.default_rng(7)
        words = [f"w{j}tok" for j in range(500)]
        texts, ids = [], []
        for i in range(60):
            ids.append(i)
            if i % 20 == 1:
                texts.append(base + f" variant tail {i % 3}")  # near-dups of base
            elif i % 20 == 2:
                texts.append(base)  # exact dup content
            else:
                # genuinely unrelated: disjoint-ish random vocabularies
                texts.append(" ".join(rng.choice(words, 30, replace=False)))
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
        ).repartition(3)

    def test_minhash_finds_near_dups(self, near_dup_ds):
        from cloudtile_ray.stages.dedup import minhash_dedup_pairs

        pairs = minhash_dedup_pairs(near_dup_ds, threshold=0.6).to_pandas()
        dup_ids = {1, 2, 21, 22, 41, 42}
        found = set(pairs.doc_a) | set(pairs.doc_b)
        assert dup_ids <= found
        # no false positives among the unrelated docs
        assert all(a in dup_ids and b in dup_ids for a, b in zip(pairs.doc_a, pairs.doc_b))

    def test_simhash_finds_near_dups(self, near_dup_ds):
        from cloudtile_ray.stages.dedup import simhash_near_pairs

        pairs = simhash_near_pairs(near_dup_ds, max_hamming=6).to_pandas()
        found = set(pairs.doc_a) | set(pairs.doc_b)
        assert {2, 22, 42} <= found  # the exact-content trio at minimum

    def test_bucket_cap_subsplits_hot_bucket(self, ray_session):
        """A pathological bucket (thousands of identical docs -> one LSH
        bucket) must not go quadratic: pairs stay O(cap * n) and the
        bridge pairs keep the duplicate cluster connected."""
        import ray.data

        from cloudtile_ray.stages.dedup import (
            minhash_dedup_pairs,
            resolve_clusters,
        )

        n = 3000
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(["same boilerplate text body here"] * n),
            }
        )
        ds = ray.data.from_arrow(t).repartition(4)
        # expand_clusters=False: this test asserts the CAPPED candidate
        # shape; the expansion pass (tested separately) would restore the
        # full quadratic pair set for this all-duplicates cluster.
        pairs = minhash_dedup_pairs(
            ds, threshold=0.9, bucket_cap=256, expand_clusters=False
        )
        pt = pairs.to_pandas()
        # quadratic would be ~4.5M pairs; capped is ~ n * cap / 2 per band
        assert 0 < len(pt) < 1_000_000
        clusters = resolve_clusters(pa.Table.from_pandas(pt[["doc_a", "doc_b"]]))
        # the bridges keep all duplicates in ONE cluster, keep-first = id 0
        roots = set(clusters.column("cluster_id").to_pylist())
        assert roots == {0}
        assert clusters.num_rows == n

    def test_expand_clusters_restores_capped_pairs(self, ray_session):
        """A duplicate cluster bigger than bucket_cap loses cross-chunk
        candidate pairs to the cap; expand_cluster_pairs (default on) must
        restore the complete s*(s-1)/2 intra-cluster pair set (ADVICE r2
        #2 — pair-level exactness past the cap)."""
        import ray.data

        from cloudtile_ray.stages.dedup import minhash_dedup_pairs

        n = 100
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(["identical boilerplate body text here"] * n),
            }
        )
        ds = ray.data.from_arrow(t).repartition(3)
        capped = minhash_dedup_pairs(
            ds, threshold=0.9, bucket_cap=16, expand_clusters=False
        ).to_pandas()
        assert len(capped) < n * (n - 1) // 2  # the cap really truncated
        full = minhash_dedup_pairs(
            ds, threshold=0.9, bucket_cap=16, expand_clusters=True
        ).to_pandas()
        assert len(full) == n * (n - 1) // 2
        assert (full.jaccard == 1.0).all()

    def test_expansion_skipped_when_no_bucket_capped(
        self, ray_session, monkeypatch
    ):
        """When no LSH bucket exceeds the cap (the overwhelmingly common
        case) the pipeline must not pay the expand_cluster_pairs
        materialize + component-check round-trip at all (VERDICT r3 #2)."""
        import ray.data

        import cloudtile_ray.stages.dedup as dd

        n = 60
        texts = ["shared duplicate body text for the pair"] * 2 + [
            f"unique background document {i} body text" for i in range(n - 2)
        ]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts),
            }
        )
        ds = ray.data.from_arrow(t).repartition(3)

        def boom(*a, **kw):  # pragma: no cover - called only on regression
            raise AssertionError("expand_cluster_pairs must be skipped")

        monkeypatch.setattr(dd, "expand_cluster_pairs", boom)
        pairs = dd.minhash_dedup_pairs(ds, threshold=0.9).to_pandas()
        assert {(0, 1)} == set(zip(pairs.doc_a, pairs.doc_b))

    def test_pairs_runs_vectorized_matches_per_bucket_loop(self):
        """The whole-part vectorized pair expansion must emit exactly the
        per-bucket _capped_pairs set (incl. the capped flag) on random
        runs with singletons, small runs, and over-cap runs."""
        from cloudtile_ray.stages.dedup import (
            _capped_pairs,
            pairs_runs_vectorized,
        )

        rng = np.random.default_rng(7)
        cap = 8
        lens = rng.integers(1, 20, 40)  # mixes singletons/small/over-cap
        ids = rng.permutation(np.arange(10_000))[: lens.sum()].astype(np.int64)
        starts = np.cumsum(np.concatenate([[0], lens[:-1]])).astype(np.int64)
        ends = (starts + lens).astype(np.int64)
        sorted_g = pa.table({"doc_id": pa.array(ids)})

        got = pairs_runs_vectorized(
            sorted_g, starts, ends, cap=cap, what="t", with_flag=True
        )
        want = []
        for s, e in zip(starts, ends):
            if e - s >= 2:
                want.append(_capped_pairs(ids[s:e], cap, "t", with_flag=True))
        want_tbl = pa.concat_tables(want)

        def canon(t):
            return sorted(
                zip(
                    t.column("doc_a").to_pylist(),
                    t.column("doc_b").to_pylist(),
                    t.column("capped").to_pylist(),
                )
            )

        assert canon(got) == canon(want_tbl)
        # empty part pins the schema
        empty = pairs_runs_vectorized(
            sorted_g.slice(0, 0), np.empty(0, np.int64), np.empty(0, np.int64),
            with_flag=True,
        )
        assert empty.column_names == ["doc_a", "doc_b", "capped"]

    def test_jaccard_kernel_paths_match_reference_loop(self):
        """Both exact-Jaccard kernel layouts (bitset popcount(AND) for
        small shingle vocabularies, epoch-stamp membership for large)
        must emit exactly the per-pair intersect1d reference — same pair
        set, same jaccard values — across empty docs, sub-k docs,
        duplicate pairs, and every threshold regime."""
        import cloudtile_ray.stages.dedup as dd
        from cloudtile_ray.stages.dedup import (
            _jaccard_intersect_kernel,
            _shingle_hashes_concat,
        )

        def ref(h, bounds, pos, av, bv, thr):
            rows = []
            for aa, bb in zip(av.tolist(), bv.tolist()):
                i, j = pos[aa], pos[bb]
                sa = h[bounds[i] : bounds[i + 1]]
                sb = h[bounds[j] : bounds[j + 1]]
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = len(sa) + len(sb) - inter
                jac = 1.0 if union == 0 else inter / union
                if jac >= thr:
                    rows.append((aa, bb, round(jac, 12)))
            return sorted(rows)

        rng = np.random.default_rng(11)
        base = "the quick brown fox jumps over the lazy dog sphinx of "
        old_budget = dd._BITSET_BUDGET
        try:
            for budget in (64 << 20, 0):  # bitset path, then stamp path
                dd._BITSET_BUDGET = budget
                for _ in range(4):
                    nd = int(rng.integers(2, 50))
                    texts = []
                    for _i in range(nd):
                        r = rng.random()
                        if r < 0.15:
                            texts.append("")
                        elif r < 0.3:
                            texts.append(base[: int(rng.integers(1, 5))])
                        else:
                            s = int(rng.integers(0, 30))
                            texts.append(
                                (base * 3)[s : s + int(rng.integers(5, 90))]
                            )
                    h, bounds = _shingle_hashes_concat(pa.array(texts), 5)
                    ids = rng.permutation(500)[:nd].astype(np.int64)
                    pos = {int(d): i for i, d in enumerate(ids)}
                    npairs = int(rng.integers(0, 250))
                    av = ids[rng.integers(0, nd, npairs)]
                    bv = ids[rng.integers(0, nd, npairs)]
                    thr = float(rng.choice([0.0, 0.3, 0.5, 0.9]))
                    got = _jaccard_intersect_kernel(h, bounds, pos, av, bv, thr)
                    got_rows = sorted(
                        zip(
                            got.column("doc_a").to_pylist(),
                            got.column("doc_b").to_pylist(),
                            [
                                round(x, 12)
                                for x in got.column("jaccard").to_pylist()
                            ],
                        )
                    )
                    assert got_rows == ref(h, bounds, pos, av, bv, thr)
        finally:
            dd._BITSET_BUDGET = old_budget

    def test_any_capped_flag(self, ray_session):
        """_capped_pairs tags over-cap buckets; _any_capped reads it back
        from the materialized pair blocks."""
        import ray.data

        from cloudtile_ray.stages.dedup import _any_capped, _capped_pairs

        small = _capped_pairs(np.arange(5), cap=16, what="t", with_flag=True)
        assert small.column("capped").to_pylist() == [0] * small.num_rows
        big = _capped_pairs(np.arange(40), cap=16, what="t", with_flag=True)
        assert set(big.column("capped").to_pylist()) == {1}
        assert not _any_capped(ray.data.from_arrow(small).materialize())
        assert _any_capped(
            ray.data.from_arrow(pa.concat_tables([small, big])).materialize()
        )

    def test_expand_clusters_distributed_matches_driver(self, ray_session):
        """The fully distributed expansion (CC labels -> per-cluster pair
        enumeration -> hash-partitioned anti-join -> distributed verify)
        must produce exactly the driver-path pair set — including the
        verification step rejecting non-transitive low-Jaccard pairs."""
        import ray.data

        from cloudtile_ray.stages.dedup import (
            expand_cluster_pairs,
            expand_cluster_pairs_distributed,
            minhash_dedup_pairs,
            verify_pairs_distributed,
        )

        n = 80
        # two genuine duplicate clusters plus distinct background docs
        texts = (
            ["cluster one shares this exact boilerplate body"] * 30
            + ["cluster two repeats a different template text"] * 30
            + [f"unique background document number {i} with its own words" for i in range(n - 60)]
        )
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts),
            }
        )
        ds = ray.data.from_arrow(t).repartition(3)
        capped = minhash_dedup_pairs(
            ds, threshold=0.9, bucket_cap=8, expand_clusters=False
        ).materialize()

        def norm(d):
            return (
                d.to_pandas()
                .sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True)
            )

        driver = norm(
            expand_cluster_pairs(ds, capped, 0.9, k=5)
        )
        dist = norm(
            expand_cluster_pairs_distributed(ds, capped, 0.9, k=5)
        )
        assert len(driver) == 2 * (30 * 29 // 2)
        pd.testing.assert_frame_equal(driver, dist)

    def test_verify_byte_budget_routes_to_shuffle(self, near_dup_ds):
        """A candidate set within the PAIR gate but over the BYTE budget
        must fall through to the shuffle join (ADVICE r2 #1) and still
        produce identical pairs."""
        import ray.data

        from cloudtile_ray.stages.dedup import verify_pairs_distributed

        cands = ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([1, 2, 1], pa.int64()),
                    "doc_b": pa.array([21, 22, 41], pa.int64()),
                }
            )
        )
        fast = (
            verify_pairs_distributed(near_dup_ds, cands, 0.6)
            .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
        shuf = (
            verify_pairs_distributed(
                near_dup_ds, cands, 0.6, broadcast_byte_budget=0
            )
            .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, shuf)
        assert len(fast) > 0

    def test_verify_shuffle_path_equals_broadcast_path(self, near_dup_ds):
        """broadcast_threshold=0 forces the hash-partitioned shuffle-join
        verification (the web-scale path); it must produce exactly the
        broadcast fast path's pairs."""
        from cloudtile_ray.stages.dedup import minhash_dedup_pairs

        fast = (
            minhash_dedup_pairs(near_dup_ds, threshold=0.6)
            .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
        shuf = (
            minhash_dedup_pairs(near_dup_ds, threshold=0.6, broadcast_threshold=0)
            .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, shuf)
        assert len(fast) > 0

    def test_anti_join_ids_matches_broadcast(self, near_dup_ds):
        from cloudtile_ray.stages.dedup import (
            drop_near_dups,
            minhash_dedup_pairs,
        )

        pairs = minhash_dedup_pairs(near_dup_ds, threshold=0.6)
        pt = pairs.to_pandas()
        bcast = sorted(
            drop_near_dups(near_dup_ds, pa.Table.from_pandas(pt), strategy="broadcast")
            .to_pandas()["doc_id"]
        )
        shuf = sorted(
            drop_near_dups(near_dup_ds, pa.Table.from_pandas(pt), strategy="shuffle")
            .to_pandas()["doc_id"]
        )
        assert bcast == shuf and len(bcast) < 60

    def test_exact_dedup_counts(self, near_dup_ds):
        from cloudtile_ray.stages.dedup import exact_dedup_keys

        res = exact_dedup_keys(
            near_dup_ds.map_batches(
                lambda t: t.append_column("key", t.column("text")), batch_format="pyarrow"
            ),
            "key",
        ).to_pandas()
        trio = res[res.n_dups == 3]
        assert len(trio) == 1 and trio.keep_id.iloc[0] == 2

    def test_embedding_neardup_schema_and_hits(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.dedup import embedding_neardup_pairs

        rng = np.random.default_rng(0)
        V = rng.standard_normal((50, 16)).astype(np.float32)
        V[30] = V[10] + 0.01  # planted near-dup
        t = pa.table(
            {"vec_id": pa.array(np.arange(50), pa.int64()),
             "embedding": pa.array([v.tolist() for v in V], pa.list_(pa.float32(), 16))}
        )
        ds = ray.data.from_arrow(t)
        pairs = embedding_neardup_pairs(ds, threshold=0.95, dim=16).to_pandas()
        assert list(pairs.columns) == ["vec_a", "vec_b", "cosine"]
        assert {(10, 30)} <= set(zip(pairs.vec_a, pairs.vec_b))

    def test_embedding_neardup_empty_keeps_schema(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.dedup import embedding_neardup_pairs

        rng = np.random.default_rng(1)
        V = rng.standard_normal((20, 16)).astype(np.float32)
        t = pa.table(
            {"vec_id": pa.array(np.arange(20), pa.int64()),
             "embedding": pa.array([v.tolist() for v in V], pa.list_(pa.float32(), 16))}
        )
        pairs = embedding_neardup_pairs(
            ray.data.from_arrow(t), threshold=0.9999, dim=16
        )
        # Dataset-level schema survives the empty result (ray's to_pandas
        # drops columns on ANY 0-row dataset, so assert on the Dataset)
        assert pairs.schema().names == ["vec_a", "vec_b", "cosine"]
        assert pairs.count() == 0


class TestSimilarity:
    def test_ivf_recall_vs_brute(self, sf_tiny):
        import pyarrow.parquet as pq
        import ray.data

        from cloudtile_ray.stages.similarity import brute_force_topk, ivf_topk

        t = pq.read_table(f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"])
        queries = np.stack(t.slice(0, 3).column("embedding").to_numpy(zero_copy_only=False))
        ds = ray.data.from_arrow(t)
        exact = brute_force_topk(ds, queries, k=10).to_pandas()
        approx = ivf_topk(ds, queries, k=10, n_centroids=8, nprobe=4).to_pandas()
        recalls = []
        for q in range(3):
            e = set(exact[exact.q_id == q].vec_id)
            a = set(approx[approx.q_id == q].vec_id)
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.5  # approximate, but not garbage

    def test_ivf_recall_survives_cluster_sorted_layout(self, ray_session):
        """VERDICT r2 #3: centroids come from a hash-mod sample, not
        first-rows — on a partition-correlated layout (vectors sorted by
        cluster, so the first blocks are ONE cluster) recall must match
        the unsorted layout instead of collapsing."""
        import ray.data

        from cloudtile_ray.stages.similarity import brute_force_topk, ivf_topk

        rng = np.random.default_rng(5)
        centers = rng.standard_normal((6, 32)) * 4
        vecs, labels = [], []
        for ci, c in enumerate(centers):
            vecs.append(c + rng.standard_normal((200, 32)) * 0.3)
            labels += [ci] * 200
        V = np.concatenate(vecs)  # SORTED by cluster — worst case for limit()
        ids = np.arange(len(V), dtype=np.int64)
        t = pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array(list(V.astype(np.float32)), pa.list_(pa.float32(), 32)),
            }
        )
        ds = ray.data.from_arrow([t.slice(i, 100) for i in range(0, len(V), 100)])
        queries = np.stack([centers[i] + 0.1 for i in range(6)])
        exact = brute_force_topk(ds, queries, k=10).to_pandas()
        approx = ivf_topk(ds, queries, k=10, n_centroids=6, nprobe=2).to_pandas()
        recalls = []
        for q in range(6):
            e = set(exact[exact.q_id == q].vec_id)
            a = set(approx[approx.q_id == q].vec_id)
            recalls.append(len(e & a) / max(1, len(e)))
        # first-rows seeding sees only cluster 0 and flatlines; hash-mod
        # sampling must keep every cluster probed
        assert np.mean(recalls) >= 0.8


class TestMultimodal:
    def test_fake_decode_plumbing(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.multimodal import decode_media, synthesize_media_table

        ds = ray.data.from_arrow(synthesize_media_table(30))
        out = decode_media(ds, fake=True, concurrency=2, batch_size=8).to_pandas()
        assert len(out) == 30
        assert all(len(f) == 16 for f in out.features)
        assert "payload" not in out.columns  # heavy bytes replaced by features

    def test_real_decode_raises(self):
        from cloudtile_ray.stages.multimodal import DecodeStub, synthesize_media_table

        stub = DecodeStub(fake=False)
        with pytest.raises(NotImplementedError):
            stub(synthesize_media_table(2))


class TestDropRate:
    def test_drop_rate_deterministic_and_monotonic(self, tiny_pages_ds):
        from cloudtile_ray.stages import geocode
        from cloudtile_ray.stages.index import AssignTiles

        geo = tiny_pages_ds.map_batches(geocode.geocode_batch, batch_format="pyarrow")
        geo = geo.map_batches(
            lambda t: t.filter(pa.compute.is_valid(t.column("lat"))), batch_format="pyarrow"
        )
        a = geo.map_batches(
            AssignTiles(3, 5, drop_rate=0.5, base_zoom=5), batch_format="pyarrow"
        ).to_pandas()
        b = geo.map_batches(
            AssignTiles(3, 5, drop_rate=0.5, base_zoom=5), batch_format="pyarrow"
        ).to_pandas()
        ka = sorted(zip(a.url, a.z, a.x, a.y))
        assert ka == sorted(zip(b.url, b.z, b.x, b.y))  # deterministic
        per_z = a.groupby("z").size()
        assert per_z[3] < per_z[4] < per_z[5]  # rate^(base-z) thinning

class TestIcosaKnn:
    def test_icosa_knn_equals_exact_and_uses_ring_at_extremes(self, sf_tiny):
        """The spherical-index kNN equals exact kNN on the extended query
        set (dateline + near-pole), and the RING PROOF (not the exact
        fallback) certifies the answer (VERDICT r2 #8 done-criterion)."""
        import __ray_entry__ as e
        from cloudtile_ray.stages.join import icosa_bucketed_knn, knn

        exact = knn(e._geo_only(sf_tiny), e.ICOSA_KNN_QUERIES_MI, k=5).to_pandas()
        stats = {}
        ring = icosa_bucketed_knn(
            e._geo_only(sf_tiny), e.ICOSA_KNN_QUERIES_MI, k=5, res=2, stats=stats
        ).to_pandas()
        pd.testing.assert_frame_equal(
            exact.sort_values(["q_id", "doc_id"]).reset_index(drop=True),
            ring.sort_values(["q_id", "doc_id"]).reset_index(drop=True),
        )
        assert stats.get("path") == "ring", stats
