"""Round-3 additions: as-of join, interval (range) join, heavy hitters,
exact distributed quantiles.  Each is checked against a brute-force
in-memory oracle on a deterministic synthetic fixture, plus the
shape/edge properties the distributed form relies on."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _events_table(n_users: int = 7, per_user: int = 40, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    n = n_users * per_user
    user = np.repeat(np.arange(n_users, dtype=np.int64), per_user)
    ts = rng.integers(0, 10_000, size=n).astype(np.int64) * 1_000_000
    # force some exact ts ties within and across users
    ts[1] = ts[0]
    ts[2] = ts[0]
    types = np.array(["click", "purchase", "view"])[rng.integers(0, 3, size=n)]
    eid = rng.permutation(n).astype(np.int64)
    val = rng.integers(0, 50_000, size=n).astype(np.float64) / 100.0
    import pandas as pd

    return pa.table(
        {
            "event_id": eid,
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": user,
            "event_type": types,
            "value": val,
        }
    )


def _brute_asof(t: pa.Table, lt: str, rt: str):
    ts = t.column("ts").to_pandas().astype("datetime64[us]").astype(np.int64).to_numpy()
    eid = t.column("event_id").to_numpy()
    uid = t.column("user_id").to_numpy()
    et = t.column("event_type").to_numpy(zero_copy_only=False)
    out = {}
    for i in np.nonzero(et == lt)[0]:
        best = None
        for j in np.nonzero((et == rt) & (uid == uid[i]))[0]:
            if (ts[j], eid[j]) < (ts[i], eid[i]):
                if best is None or (ts[j], eid[j]) > (ts[best], eid[best]):
                    best = j
        out[int(eid[i])] = (
            (int(eid[best]), int(ts[i] - ts[best])) if best is not None else (-1, -1)
        )
    return out


class TestAsofJoin:
    def test_matches_brute_force(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.events import asof_join

        t = _events_table()
        res = asof_join(ray.data.from_arrow(t), "click", "purchase").to_pandas()
        want = _brute_asof(t, "click", "purchase")
        got = {
            int(r.left_id): (int(r.right_id), int(r.lag_us))
            for r in res.itertuples()
        }
        assert got == want
        # sentinel never collides: every matched lag is >= 0
        assert (res.loc[res.right_id >= 0, "lag_us"] >= 0).all()

    def test_no_rights(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.events import asof_join

        t = _events_table()
        res = asof_join(ray.data.from_arrow(t), "click", "nosuch").to_pandas()
        assert (res.right_id == -1).all() and (res.lag_us == -1).all()
        assert len(res) == (np.array(t.column("event_type")) == "click").sum()


class TestIntervalIndex:
    def test_probe_matches_brute(self):
        from cloudtile_ray.stages.events import IntervalIndex

        rng = np.random.default_rng(3)
        starts = rng.integers(0, 1_000, 50).astype(np.int64)
        ends = starts + rng.integers(0, 300, 50).astype(np.int64)
        idx = IntervalIndex(starts, ends, np.arange(50, dtype=np.int64))
        ts = rng.integers(-50, 1_400, 500).astype(np.int64)
        pi, ii = idx.probe(ts)
        got = set(zip(pi.tolist(), ii.tolist()))
        want = {
            (p, i)
            for p in range(len(ts))
            for i in range(50)
            if starts[i] <= ts[p] <= ends[i]
        }
        assert got == want

    def test_point_intervals_bounded_grid(self):
        # degenerate zero-length intervals must not explode the bucket grid
        from cloudtile_ray.stages.events import IntervalIndex

        starts = np.array([0, 10_000_000_000], dtype=np.int64)
        ends = starts.copy()
        idx = IntervalIndex(starts, ends, np.arange(2, dtype=np.int64))
        assert len(idx._bk) <= 16
        pi, ii = idx.probe(np.array([0, 5, 10_000_000_000], dtype=np.int64))
        assert set(zip(pi.tolist(), ii.tolist())) == {(0, 0), (2, 1)}

    def test_end_before_start_rejected(self):
        from cloudtile_ray.stages.events import IntervalIndex

        with pytest.raises(ValueError):
            IntervalIndex(
                np.array([5], dtype=np.int64),
                np.array([4], dtype=np.int64),
                np.array([0], dtype=np.int64),
            )

    def test_big_interval_side_routes_to_bucketed_exchange(
        self, ray_session, monkeypatch
    ):
        """interval_join gates the driver collect on the interval side's
        measured bytes (VERDICT r3 missing #3): beyond the budget both
        sides time-bucket on a shared grid and the probe runs per bucket.
        The bucketed answer must equal the broadcast answer exactly."""
        import ray.data

        import cloudtile_ray.stages.events as ev

        rng = np.random.default_rng(11)
        n_iv, n_ev = 200, 2_000
        starts = rng.integers(0, 10**9, n_iv).astype(np.int64)
        ends = starts + rng.integers(0, 10**7, n_iv).astype(np.int64)
        intervals = pa.table(
            {
                "ivl_user": pa.array(rng.integers(0, 50, n_iv), pa.int64()),
                "ivl_seq": pa.array(np.arange(n_iv), pa.int64()),
                "start_us": pa.array(starts),
                "end_us": pa.array(ends),
            }
        )
        ts = rng.integers(0, 10**9 + 10**7, n_ev).astype("datetime64[us]")
        events = pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(ts),
                "value": pa.array(rng.normal(size=n_ev)),
            }
        )
        ivl_ds = ray.data.from_arrow(intervals).repartition(3)
        ev_ds = ray.data.from_arrow(events).repartition(4)

        def canon(df):
            return sorted(zip(df.ivl_user, df.ivl_seq, df.event_id))

        broadcast = canon(ev.interval_join(ev_ds, ivl_ds).to_pandas())
        assert broadcast  # fixture must produce containments

        routed = {}
        orig = ev._interval_join_bucketed

        def spy(big, ivl_mat):
            routed["bucketed"] = True
            return orig(big, ivl_mat)

        monkeypatch.setattr(ev, "_interval_join_bucketed", spy)
        bucketed = canon(
            ev.interval_join(ev_ds, ivl_ds, broadcast_byte_budget=0).to_pandas()
        )
        assert routed.get("bucketed")
        assert bucketed == broadcast


class TestHeavyHitters:
    def test_exact_topk(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.text import heavy_hitters

        docs = [
            "the cat sat on the mat",
            "The DOG!  the dog, the dog...",
            "cat and dog and bird",
            "zzz 123 zzz-123 ZZZ",
        ]
        t = pa.table({"text": docs})
        res = heavy_hitters(ray.data.from_arrow(t), k=4).to_pandas()
        # brute force
        import re
        from collections import Counter

        c = Counter()
        for d in docs:
            c.update(x for x in re.split("[^a-z0-9]+", d.lower()) if x)
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        assert list(map(tuple, res[["tok", "n"]].itertuples(index=False))) == want

    def test_tie_break_deterministic(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.text import heavy_hitters

        t = pa.table({"text": ["b a", "a b", "c d"]})
        res = heavy_hitters(ray.data.from_arrow(t), k=3).to_pandas()
        assert res["tok"].tolist() == ["a", "b", "c"]


class TestExactQuantiles:
    @pytest.mark.parametrize("n", [1, 7, 1000])
    def test_matches_rank_definition(self, ray_session, n):
        import math

        import ray.data

        from cloudtile_ray.stages.quantiles import exact_quantiles

        rng = np.random.default_rng(n)
        v = rng.integers(-10_000, 10_000, size=n).astype(np.int64)
        t = pa.table({"x": v})
        qs = {"p10": 0.1, "p50": 0.5, "p99": 0.99}
        res = exact_quantiles(
            ray.data.from_arrow(t), "x", qs, bucket_count=8, collect_threshold=4
        )
        sv = np.sort(v)
        for name, q in qs.items():
            want = int(sv[max(0, math.ceil(q * n) - 1)])
            assert res.column(name)[0].as_py() == want, name

    def test_duplicated_values(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.quantiles import exact_quantiles

        v = np.repeat(np.array([5, 5, 5, 9], dtype=np.int64), 100)
        res = exact_quantiles(
            ray.data.from_arrow(pa.table({"x": v})),
            "x",
            {"p50": 0.5, "p90": 0.9},
            bucket_count=4,
            collect_threshold=2,
        )
        assert res.column("p50")[0].as_py() == 5
        assert res.column("p90")[0].as_py() == 9

    def test_empty_raises(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.quantiles import exact_quantiles

        with pytest.raises(ValueError):
            exact_quantiles(
                ray.data.from_arrow(pa.table({"x": pa.array([], type=pa.int64())})),
                "x",
                {"p50": 0.5},
            )


def _planted_embeddings(n_per: int = 120, dim: int = 32, k: int = 3, seed: int = 5):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim)) * 10.0
    V = np.concatenate(
        [centers[j] + rng.standard_normal((n_per, dim)) * 0.2 for j in range(k)]
    ).astype(np.float32)
    labels = np.repeat(np.arange(k), n_per)
    order = rng.permutation(len(V))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(V), dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in V[order]], type=pa.list_(pa.float32())
            ),
        }
    ), labels[order]


class TestKMeans:
    def test_recovers_planted_clusters(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.similarity import kmeans_assign, kmeans_fit

        t, labels = _planted_embeddings()
        ds = ray.data.from_arrow(t).repartition(6)
        C = kmeans_fit(ds, n_clusters=3, n_iter=8)
        res = kmeans_assign(ds, C).to_pandas().sort_values("vec_id")
        got = res["cluster"].to_numpy()
        want = labels[np.argsort(t.column("vec_id").to_numpy())]
        # cluster ids are arbitrary: check the partition matches via
        # majority-label mapping, requiring perfect recovery on this
        # well-separated fixture
        import pandas as pd

        m = pd.crosstab(got, want)
        assert (m.max(axis=1).sum()) == len(got)
        assert len(np.unique(got)) == 3

    def test_bit_deterministic_across_block_shapes(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.similarity import kmeans_fit

        t, _ = _planted_embeddings(n_per=80)
        c1 = kmeans_fit(ray.data.from_arrow(t).repartition(2), n_clusters=3, n_iter=6)
        c2 = kmeans_fit(ray.data.from_arrow(t).repartition(11), n_clusters=3, n_iter=6)
        assert np.array_equal(c1, c2)  # bit-identical, not just close


class TestTokenRepetition:
    def test_matches_python_counter(self):
        from collections import Counter

        from cloudtile_ray.stages.text import token_repetition_batch

        texts = ["a b a c a", "x", "", "q q q q", "one two three two"]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        out = token_repetition_batch(t).to_pydict()
        for i, s in enumerate(texts):
            c = Counter(s.split(" "))  # '' -> [''] like string_split
            toks = s.split(" ")
            assert out["n_tokens"][i] == len(toks)
            assert out["n_unique"][i] == len(c)
            assert out["top_tok_n"][i] == max(c.values())


class TestTopTerms:
    def test_matches_brute(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.text import top_terms

        texts = ["rare common common", "common common common",
                 "rare rare unique", "zeta zeta common rare"]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        got = (
            top_terms(ray.data.from_arrow(t).repartition(3))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # brute force: (tf desc, df asc, tk asc)
        from collections import Counter
        dfc = Counter()
        tfs = []
        for s in texts:
            c = Counter(s.split(" "))
            tfs.append(c)
            dfc.update(c.keys())
        for i, c in enumerate(tfs):
            best = min(c.items(), key=lambda kv: (-kv[1], dfc[kv[0]], kv[0]))
            assert got.loc[i, "tk"] == best[0], (i, got.loc[i])
            assert got.loc[i, "tf"] == best[1]
            assert got.loc[i, "df"] == dfc[best[0]]


class TestSampling:
    def test_stratified_partition_independent(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.sampling import hash_stratified_sample

        t = pa.table({
            "doc_id": pa.array(range(1000), pa.int64()),
            "lang": pa.array(["en", "de", "fr", "zh"][i % 4] for i in range(1000)),
        })
        rates = {"en": 0.25, "de": 0.5, "*": 0.8}
        a = hash_stratified_sample(ray.data.from_arrow(t).repartition(2), rates)
        b = hash_stratified_sample(ray.data.from_arrow(t).repartition(13), rates)
        ia = sorted(a.to_pandas()["doc_id"])
        ib = sorted(b.to_pandas()["doc_id"])
        assert ia == ib
        # rates actually bite per group
        df = a.to_pandas()
        n_en = (df["lang"] == "en").sum()
        n_fr = (df["lang"] == "fr").sum()
        assert 0 < n_en < 250 and n_en / 250 < 0.4
        assert n_fr / 250 > 0.6

    def test_split_stable_and_disjoint(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.sampling import hash_split

        t = pa.table({"doc_id": pa.array(range(500), pa.int64())})
        df = hash_split(ray.data.from_arrow(t), val_frac=0.2).to_pandas()
        assert set(df["split"]) == {"train", "val"}
        frac = (df["split"] == "val").mean()
        assert 0.1 < frac < 0.3
        df2 = hash_split(ray.data.from_arrow(t).repartition(7), val_frac=0.2).to_pandas()
        m = df.merge(df2, on="doc_id")
        assert (m["split_x"] == m["split_y"]).all()


class TestGeoRedact:
    def test_scrubs_and_counts(self):
        from cloudtile_ray.stages.geocode import redact_geo_urls

        t = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "url": pa.array([
                "https://site1.example/geo/0?lat_mi=41600&lon_mi=-87900",
                "https://site2.example/p/1",
            ]),
        })
        out = redact_geo_urls(t).to_pydict()
        assert out["scrubbed_url"][0] == "https://site1.example/geo/0?coords=REDACTED"
        assert out["scrubbed_url"][1] == "https://site2.example/p/1"
        assert out["n_redactions"] == [1, 0]
        assert "lat_mi" not in out["scrubbed_url"][0]


class TestContamination:
    def test_finds_planted_probes(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.text import contamination_scan

        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([
                "clean document here",
                "contains the secret canary phrase ok",
                "secret canary phrase and eval question one",
                "nothing to see",
            ]),
        })
        got = contamination_scan(
            ray.data.from_arrow(t).repartition(2),
            ["secret canary phrase", "eval question one", "absent"],
        ).to_pandas().sort_values(["doc_id", "probe"]).reset_index(drop=True)
        assert list(map(tuple, got.itertuples(index=False))) == [
            (1, "secret canary phrase"),
            (2, "eval question one"),
            (2, "secret canary phrase"),
        ]


class TestBigrams:
    def test_matches_brute(self, ray_session):
        from collections import Counter

        import ray.data

        from cloudtile_ray.stages.text import bigram_counts

        texts = ["a b c a b", "b c b c", "x", "a b"]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        got = bigram_counts(ray.data.from_arrow(t).repartition(3), k=50).to_pandas()
        want = Counter()
        for s in texts:
            w = s.split(" ")
            want.update(f"{a} {b}" for a, b in zip(w, w[1:]))
        assert dict(zip(got["bigram"], got["n"])) == dict(want)
        # deterministic order: n desc, bigram asc
        key = list(zip(-got["n"], got["bigram"]))
        assert key == sorted(key)


class TestPrefixSum:
    def test_exclusive_prefix_cross_partition(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.scan import ordered_prefix_sum

        rng = np.random.default_rng(3)
        ids = rng.permutation(5000).astype(np.int64)  # scrambled order
        vals = rng.integers(0, 100, size=5000).astype(np.int64)
        t = pa.table({"doc_id": pa.array(ids), "v": pa.array(vals)})
        got = (
            ordered_prefix_sum(
                ray.data.from_arrow(t).repartition(9), "v", bucket=257
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        order = np.argsort(ids, kind="stable")
        want = np.zeros(5000, dtype=np.int64)
        want[order[1:]] = np.cumsum(vals[order])[:-1]
        df = dict(zip(ids, want))
        assert (got["prefix"].to_numpy() == [df[i] for i in got["doc_id"]]).all()

    def test_sequence_pack_chunks_monotone(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.scan import sequence_pack

        t = pa.table({
            "doc_id": pa.array(range(100), pa.int64()),
            "n_chars": pa.array([300] * 100, pa.int64()),
        })
        got = (
            sequence_pack(ray.data.from_arrow(t), val_col="n_chars", budget=1000,
                          bucket=17)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # 300 chars/doc, 1000 budget: chunk advances every 3-4 docs, monotone
        assert got.loc[0, "chunk_id"] == 0
        assert (np.diff(got["chunk_id"]) >= 0).all()
        assert got["chunk_id"].iloc[-1] == (99 * 300) // 1000


class TestDomainExtract:
    def test_extracts(self):
        from cloudtile_ray.stages.geocode import extract_domain

        t = pa.table({"url": pa.array([
            "https://site42.example/geo/7?lat_mi=1&lon_mi=2",
            "https://a.b.c/p/9",
        ])})
        assert extract_domain(t).column("domain").to_pylist() == [
            "site42.example", "a.b.c",
        ]


class TestHashJoin:
    def test_join_types(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import hash_join

        left = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                         "a": pa.array(["w", "x", "y", "z"])})
        right = pa.table({"kk": pa.array([2, 3, 3, 5], pa.int64()),
                          "b": pa.array([20, 30, 31, 50], pa.int64())})
        L = ray.data.from_arrow(left).repartition(2)
        R = ray.data.from_arrow(right).repartition(3)

        inner = hash_join(L, R, on=("k",), right_on=("kk",),
                          num_partitions=4).to_pandas()
        assert sorted(zip(inner["k"], inner["b"])) == [(2, 20), (3, 30), (3, 31)]

        semi = hash_join(L, R, on=("k",), right_on=("kk",), how="semi",
                         num_partitions=4).to_pandas()
        assert sorted(semi["k"]) == [2, 3]

        anti = hash_join(L, R, on=("k",), right_on=("kk",), how="anti",
                         num_partitions=4).to_pandas()
        assert sorted(anti["k"]) == [1, 4]

    def test_small_materialized_sides_clamp_partitions(self, ray_session, monkeypatch):
        # The size probe must run BEFORE the metadata-strip map_batches:
        # a lazy map plan on materialized data reports
        # has_computed_output() == False, which silently disabled the
        # 8-partition clamp for sub-64MB joins (code-review r4 finding).
        import ray.data

        from cloudtile_ray.stages import relational

        L = ray.data.from_arrow(
            pa.table({"k": pa.array([1, 2, 3], pa.int64())})
        ).materialize()
        R = ray.data.from_arrow(
            pa.table({"k": pa.array([2, 3, 4], pa.int64()),
                      "b": pa.array([20, 30, 40], pa.int64())})
        ).materialize()
        seen = {}
        orig = ray.data.Dataset.join

        def spy(self, other, **kw):
            seen["num_partitions"] = kw.get("num_partitions")
            return orig(self, other, **kw)

        monkeypatch.setattr(ray.data.Dataset, "join", spy)
        out = relational.hash_join(L, R, on=("k",)).to_pandas()
        assert sorted(out["k"]) == [2, 3]
        assert seen["num_partitions"] == 8

    def test_bad_how_rejected(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import hash_join

        ds = ray.data.range(3)
        with pytest.raises(ValueError):
            hash_join(ds, ds, on=("id",), how="cross")

    def test_aggregated_side_with_empty_blocks(self, ray_session):
        # Regression: a groupby-aggregate side has more output partitions
        # than groups, so it carries empty blocks; Ray 2.49's join skips
        # the schema broadcast when an empty block shuffles first and the
        # aggregators then build zero-column partitions Arrow rejects.
        # hash_join's coalesce_empty_blocks guard must absorb this.
        import ray.data
        from ray.data.aggregate import Count

        from cloudtile_ray.stages.relational import hash_join

        t = pa.table({"k": pa.array([i % 3 for i in range(60)], pa.int64()),
                      "v": pa.array(range(60), pa.int64())})
        L = ray.data.from_arrow(t).repartition(4)
        R = L.groupby("k").aggregate(Count(alias_name="n"))
        out = hash_join(L, R, on=("k",), num_partitions=16).to_pandas()
        assert len(out) == 60
        assert sorted(out["n"].unique()) == [20]

    def test_metadata_bearing_inputs_join_clean(self, ray_session, capfd):
        # Schema metadata (the b'pandas' blob on pandas-written parquet)
        # makes pyarrow schemas unhashable and used to defeat Ray's
        # schema-dedup cache in the shuffle aggregators, logging `Failed
        # to hash the schemas` per shard (VERDICT r3 wrong #2).  hash_join
        # must strip it on both sides.
        import ray.data

        from cloudtile_ray.stages.relational import hash_join

        meta = {b"pandas": b'{"columns": []}'}
        left = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                         "a": pa.array(["x", "y", "z"])})
        right = pa.table({"k": pa.array([2, 3, 4], pa.int64()),
                          "b": pa.array([20, 30, 40], pa.int64())})
        L = ray.data.from_arrow(left.replace_schema_metadata(meta)).repartition(2)
        R = ray.data.from_arrow(right.replace_schema_metadata(meta)).repartition(2)
        out = hash_join(L, R, on=("k",), num_partitions=4).to_pandas()
        assert sorted(zip(out["k"], out["b"])) == [(2, 20), (3, 30)]
        captured = capfd.readouterr()
        assert "Failed to hash the schemas" not in captured.err
        assert "Failed to hash the schemas" not in captured.out


class TestDupNgrams:
    def _brute(self, docs: list[str], n: int):
        from collections import Counter

        grams: Counter = Counter()
        per_doc: list[list[tuple[str, ...]]] = []
        for d in docs:
            toks = d.split(" ")
            g = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            per_doc.append(g)
            grams.update(g)
        out = {}
        for i, g in enumerate(per_doc):
            if g:
                out[i] = (len(g), sum(1 for x in g if grams[x] >= 2))
        return out

    def test_matches_brute_force(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.ngrams import dup_ngram_stats

        rng = np.random.default_rng(11)
        vocab = ["a", "b", "c", "d", "e", "f"]
        docs = [
            " ".join(rng.choice(vocab, size=int(rng.integers(1, 20))))
            for _ in range(60)
        ]
        docs.append(docs[5])  # exact duplicate -> every span duplicated
        t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()), "text": docs})
        n = 4
        res = (
            dup_ngram_stats(ray.data.from_arrow(t).repartition(7), n=n)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        want = self._brute(docs, n)
        assert set(res.index) == set(want)
        for i, (ns, nd) in want.items():
            assert (res.loc[i, "n_spans"], res.loc[i, "n_dup_spans"]) == (ns, nd)

    def test_short_docs_excluded_and_zero_dups(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.ngrams import dup_ngram_stats

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": ["a b", "p q r s t", "u v w x y"],
            }
        )
        res = dup_ngram_stats(ray.data.from_arrow(t), n=4).to_pandas()
        res = res.set_index("doc_id").sort_index()
        assert list(res.index) == [1, 2]  # doc 0 has < 4 tokens
        assert res["n_spans"].tolist() == [2, 2]
        assert res["n_dup_spans"].tolist() == [0, 0]


class TestGroupedTopk:
    def test_matches_window_function(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.relational import grouped_topk

        rng = np.random.default_rng(3)
        n = 500
        t = pa.table(
            {
                "rid": pa.array(range(n), pa.int64()),
                "grp": pa.array(rng.integers(0, 12, n).astype("int64")),
                "val": pa.array(rng.integers(0, 40, n).astype("int64")),
            }
        )
        res = (
            grouped_topk(
                ray.data.from_arrow(t).repartition(9), "grp", "val", k=3,
                descending=True, tie_col="rid",
            )
            .to_pandas()
            .sort_values(["grp", "rid"])
            .reset_index(drop=True)
        )
        want = duckdb.sql(
            """SELECT rid, grp, val FROM (
                 SELECT *, row_number() OVER (PARTITION BY grp
                     ORDER BY val DESC, rid) AS rn FROM t)
               WHERE rn <= 3 ORDER BY grp, rid"""
        ).df()
        assert res[["rid", "grp", "val"]].values.tolist() == want.values.tolist()

    def test_ascending(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import grouped_topk

        t = pa.table(
            {
                "rid": pa.array([0, 1, 2, 3], pa.int64()),
                "grp": pa.array([0, 0, 0, 1], pa.int64()),
                "val": pa.array([5, 1, 3, 9], pa.int64()),
            }
        )
        res = (
            grouped_topk(ray.data.from_arrow(t), "grp", "val", k=2,
                         descending=False, tie_col="rid")
            .to_pandas()
            .sort_values(["grp", "val"])
        )
        assert res["rid"].tolist() == [1, 2, 3]


class TestKeywordSearch:
    def test_token_and_semantics(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.text import keyword_search

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "lang": ["en"] * 5,
                "n_chars": pa.array([10] * 5, pa.int64()),
                "text": [
                    "spark merge join",          # both terms
                    "spark only here",           # missing merge
                    "sparkle merged",            # substrings, not tokens
                    "merge then spark again",    # both
                    "",                          # empty doc
                ],
            }
        )
        res = keyword_search(ray.data.from_arrow(t).repartition(3), ["spark", "merge"])
        got = sorted(res.to_pandas()["doc_id"].tolist())
        assert got == [0, 3]


class TestCorpusOverlap:
    def test_semi_join_on_content_key(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.dedup import cross_corpus_overlap

        train = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text_prefix": ["aaa", "bbb", "ccc", "aaa"],
            }
        )
        evald = pa.table(
            {
                "doc_id": pa.array([10, 11], pa.int64()),
                "text_prefix": ["aaa", "zzz"],
            }
        )
        res = cross_corpus_overlap(
            ray.data.from_arrow(train).repartition(3),
            ray.data.from_arrow(evald),
        ).to_pandas()
        assert sorted(res["doc_id"].tolist()) == [0, 3]
        # a right side over the broadcast budget must route through the
        # hash-partitioned semi join and give the identical answer
        joined = cross_corpus_overlap(
            ray.data.from_arrow(train).repartition(3),
            ray.data.from_arrow(evald),
            broadcast_byte_budget=0,
        ).to_pandas()
        assert sorted(joined["doc_id"].tolist()) == [0, 3]


class TestNgramDecontam:
    def test_broadcast_and_bucketed_routes_agree(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.ngrams import ngram_decontam

        rng = np.random.default_rng(13)
        vocab = [f"w{i}" for i in range(50)]
        eval_texts = [
            " ".join(rng.choice(vocab, 20).tolist()) for _ in range(5)
        ]
        train_texts = [
            " ".join(rng.choice(vocab, 25).tolist()) for _ in range(20)
        ]
        # plant a verbatim eval passage inside two train docs
        train_texts[3] = train_texts[3] + " " + eval_texts[0]
        train_texts[11] = eval_texts[2] + " " + train_texts[11]
        train = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(20), pa.int64()),
            "text": pa.array(train_texts),
        })).repartition(3)
        evald = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(100, 105), pa.int64()),
            "text": pa.array(eval_texts),
        })).repartition(2)

        def canon(df):
            return sorted(zip(df.doc_id, df.n_spans, df.n_hit_spans))

        bc = canon(ngram_decontam(train, evald, n=8).to_pandas())
        planted = {d: h for d, _s, h in bc}
        assert planted[3] >= 13 and planted[11] >= 13  # 20-token plant -> 13+ hit windows
        assert sum(1 for _d, _s, h in bc if h > 0) >= 2
        bucketed = canon(
            ngram_decontam(train, evald, n=8, broadcast_byte_budget=0).to_pandas()
        )
        assert bucketed == bc


class TestEnumerateSorted:
    def test_global_ranking_matches_argsort(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import enumerate_sorted

        rng = np.random.default_rng(9)
        vals = rng.permutation(10_000).astype("int64")  # unique keys
        t = pa.table({"v": pa.array(vals)})
        res = (
            enumerate_sorted(
                ray.data.from_arrow(t).repartition(13), ["v"], [False],
                rank_col="rank",
            )
            .to_pandas()
            .sort_values("v")
        )
        # rank of v in ascending order == v itself (permutation of 0..n-1)
        assert (res["rank"].to_numpy() == res["v"].to_numpy()).all()

    def test_descending_and_tiebreak(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import enumerate_sorted

        t = pa.table(
            {
                "n": pa.array([5, 5, 3, 9], pa.int64()),
                "tok": ["b", "a", "c", "z"],
            }
        )
        res = (
            enumerate_sorted(
                ray.data.from_arrow(t).repartition(2), ["n", "tok"],
                [True, False], rank_col="r",
            )
            .to_pandas()
            .sort_values("r")
        )
        assert res["tok"].tolist() == ["z", "a", "b", "c"]


class TestEncodeWithVocab:
    def test_oov_and_empty_docs(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.text import encode_with_vocab

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": ["cat dog cat", "cat UNKNOWN bird", ""],
            }
        )
        res = (
            encode_with_vocab(
                ray.data.from_arrow(t), ["cat", "dog"], [7, 9]
            )
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # doc 0: 3 tokens, ids 7+9+7, 0 oov
        assert tuple(res.loc[0]) == (3, 23, 0)
        # doc 1: 3 tokens ("unknown" and "bird" OOV), id_sum 7, 2 oov
        assert tuple(res.loc[1]) == (3, 7, 2)
        # doc 2: empty -> zero row kept
        assert tuple(res.loc[2]) == (0, 0, 0)


class TestGroupedDistinctCount:
    def test_matches_pandas_nunique(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import grouped_distinct_count

        rng = np.random.default_rng(4)
        t = pa.table(
            {
                "g": pa.array(rng.integers(0, 6, 2000).astype("int64")),
                "v": pa.array(rng.integers(0, 150, 2000).astype("int64")),
            }
        )
        res = (
            grouped_distinct_count(
                ray.data.from_arrow(t).repartition(7), "g", "v"
            )
            .to_pandas()
            .set_index("g")["n_distinct"]
            .sort_index()
        )
        want = t.to_pandas().groupby("g")["v"].nunique()
        assert res.to_dict() == want.to_dict()


class TestReviewRegressions:
    def test_keyword_search_trailing_empty_doc(self, ray_session):
        """A batch ending with empty/null docs must not truncate the last
        real doc's final token (clamped-reduceat regression)."""
        import ray.data

        from cloudtile_ray.stages.text import keyword_search

        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": ["foo bar dup", None],
            }
        )
        res = keyword_search(ray.data.from_arrow(t), ["dup"]).to_pandas()
        assert res["doc_id"].tolist() == [0]

    def test_grouped_topk_uint64_no_overflow(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import grouped_topk

        big = np.uint64(2**63 + 5)
        t = pa.table(
            {
                "rid": pa.array([0, 1, 2], pa.int64()),
                "grp": pa.array([0, 0, 0], pa.int64()),
                "val": pa.array(np.array([big, np.uint64(10), np.uint64(7)])),
            }
        )
        res = grouped_topk(
            ray.data.from_arrow(t), "grp", "val", k=1, descending=True,
            tie_col="rid",
        ).to_pandas()
        assert res["rid"].tolist() == [0]  # the 2^63+5 value wins


class TestBucketedGroupAggregate:
    @pytest.mark.parametrize("nkeys", [5, 1500])  # dup-heavy and near-unique
    def test_parity_with_pandas(self, ray_session, nkeys):
        import ray.data

        from cloudtile_ray.stages.relational import bucketed_group_aggregate

        rng = np.random.default_rng(nkeys)
        n = 2000
        t = pa.table(
            {
                "k_str": pa.array([f"key-{i}" for i in rng.integers(0, nkeys, n)]),
                "k_int": pa.array(rng.integers(0, 3, n).astype("int64")),
                "v": pa.array(rng.integers(-50, 50, n).astype("int64")),
            }
        )
        res = (
            bucketed_group_aggregate(
                ray.data.from_arrow(t).repartition(9),
                ["k_str", "k_int"],
                [("v", "sum", "v_sum"), ("v", "min", "v_min"), ("v", "count", "n")],
            )
            .to_pandas()
            .sort_values(["k_str", "k_int"])
            .reset_index(drop=True)
        )
        want = (
            t.to_pandas()
            .groupby(["k_str", "k_int"], as_index=False)
            .agg(v_sum=("v", "sum"), v_min=("v", "min"), n=("v", "count"))
            .sort_values(["k_str", "k_int"])
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(
            res[["k_str", "k_int", "v_sum", "v_min", "n"]],
            want.astype({"n": "int64"}),
        )


class TestIvfIndex:
    def test_recall_and_partial_detection(self, ray_session, tmp_path):
        import shutil

        import ray.data

        from cloudtile_ray.stages.similarity import (
            brute_force_topk,
            build_ivf_index,
            ivf_index_topk,
        )

        t, _ = _planted_embeddings(n_per=80, dim=16, k=4, seed=2)
        X = np.stack(t.column("embedding").to_numpy(zero_copy_only=False))
        ds = ray.data.from_arrow(t).repartition(5)
        idx = str(tmp_path / "ivf")
        build_ivf_index(ds, idx, n_centroids=4)
        Q = X[:3]
        got = ivf_index_topk(idx, Q, k=5, nprobe=2).to_pandas()
        want = brute_force_topk(ds, Q, k=5).to_pandas()
        # recall@5 >= 0.8 against brute force
        rec = np.mean(
            [
                len(
                    set(got[got.q_id == q].vec_id) & set(want[want.q_id == q].vec_id)
                )
                / 5.0
                for q in range(3)
            ]
        )
        assert rec >= 0.8
        # a partially-visible index must fail loudly
        import glob as _glob

        victim = sorted(_glob.glob(f"{idx}/list_id=*"))[0]
        shutil.rmtree(victim)
        with pytest.raises(RuntimeError, match="PARTIAL"):
            ivf_index_topk(idx, Q, k=5, nprobe=2)

    def test_dirty_target_refused_and_stale_tree_detected(
        self, ray_session, tmp_path
    ):
        """ADVICE r3 #1: building into a directory that already holds an
        index must fail (write_parquet would silently merge stale
        list_id=* partitions in), overwrite=True replaces it, and
        byte-level contamination appearing after a clean build fails the
        query's fingerprint check."""
        import ray.data

        from cloudtile_ray.stages.similarity import build_ivf_index, ivf_index_topk

        t, _ = _planted_embeddings(n_per=40, dim=16, k=4, seed=5)
        X = np.stack(t.column("embedding").to_numpy(zero_copy_only=False))
        ds = ray.data.from_arrow(t).repartition(3)
        idx = str(tmp_path / "ivf2")
        build_ivf_index(ds, idx, n_centroids=4)
        with pytest.raises(FileExistsError, match="overwrite=True"):
            build_ivf_index(ds, idx, n_centroids=4)
        # overwrite replaces the index; queries still work
        build_ivf_index(ds, idx, n_centroids=4, overwrite=True)
        Q = X[:2]
        assert len(ivf_index_topk(idx, Q, k=3, nprobe=2).to_pandas()) == 6
        # contamination after a clean build: an extra parquet file dropped
        # into a partition changes the fingerprint -> loud failure
        import glob as _glob
        import shutil

        part = sorted(_glob.glob(f"{idx}/list_id=*"))[0]
        src = _glob.glob(f"{part}/*.parquet")[0]
        shutil.copy(src, f"{part}/stale_extra.parquet")
        with pytest.raises(RuntimeError, match="PARTIAL or STALE"):
            ivf_index_topk(idx, Q, k=3, nprobe=2)


class TestChunkDedup:
    def test_explode_token_chunks_shapes(self):
        """Chunk boundaries: exact multiples, trailing short chunk,
        single-token docs — chunk texts must re-join to the original."""
        import pyarrow as pa

        from cloudtile_ray.stages.chunks import explode_token_chunks

        texts = [
            "a b c d e f",        # 6 tokens / n=3 -> 2 full chunks
            "x y z w q",          # 5 tokens -> chunk of 3 + chunk of 2
            "solo",               # 1 token -> 1 chunk
        ]
        t = pa.table({"doc_id": pa.array([10, 20, 30], pa.int64()),
                      "text": pa.array(texts)})
        out = explode_token_chunks(t, n_tokens=3)
        got = list(zip(out.column("doc_id").to_pylist(),
                       out.column("chunk_idx").to_pylist(),
                       out.column("chunk").to_pylist()))
        assert got == [
            (10, 0, "a b c"), (10, 1, "d e f"),
            (20, 0, "x y z"), (20, 1, "w q"),
            (30, 0, "solo"),
        ]
        # empty input pins the schema
        empty = explode_token_chunks(t.slice(0, 0), n_tokens=3)
        assert empty.column_names == ["doc_id", "chunk_idx", "chunk"]

    def test_dedup_text_chunks_matches_duckdb(self, ray_session):
        """End-to-end keep-first passage dedup vs the SQL oracle shape:
        duplicated chunks across docs AND within one doc; a doc made
        entirely of seen chunks disappears."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from cloudtile_ray.stages.chunks import dedup_text_chunks

        texts = [
            "a b c d e f",      # doc 1: chunks "a b c", "d e f"
            "a b c x y z",      # doc 2: "a b c" dropped, keeps "x y z"
            "d e f a b c",      # doc 3: both chunks seen -> doc vanishes
            "p q r p q r",      # doc 4: within-doc dup -> keeps first only
        ]
        t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "text": pa.array(texts)})
        ds = ray.data.from_arrow(t).repartition(3)
        got = (
            dedup_text_chunks(ds, n_tokens=3)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        con = duckdb.connect()
        con.register("documents", t)
        want = con.sql("""
            WITH tt AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
                 tok AS (SELECT doc_id, unnest(l) AS tk,
                                generate_subscripts(l, 1) AS i FROM tt),
                 ch AS (SELECT doc_id, CAST(FLOOR((i - 1) / 3) AS BIGINT) AS ci,
                               string_agg(tk, ' ' ORDER BY i) AS chunk
                        FROM tok GROUP BY doc_id, FLOOR((i - 1) / 3)),
                 k AS (SELECT doc_id, ci, chunk,
                              row_number() OVER (PARTITION BY chunk
                                                 ORDER BY doc_id, ci) AS rn
                       FROM ch)
            SELECT doc_id, string_agg(chunk, ' ' ORDER BY ci) AS text
            FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id
        """).df()
        pd.testing.assert_frame_equal(got, want)
        assert 3 not in got.doc_id.values


class TestEpochResample:
    def test_copies_and_determinism(self, ray_session):
        """floor(w) copies plus the id-hash fraction; copy index 1..n;
        identical output across different partitionings."""
        import pyarrow as pa
        import ray.data

        from cloudtile_ray.stages.sampling import BUCKETS, _PRIME, epoch_resample

        n = 200
        ids = list(range(n))
        src = ["hot" if i % 3 == 0 else ("cold" if i % 3 == 1 else "warm")
               for i in ids]
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "source": pa.array(src)})
        epochs = {"hot": 2.5, "cold": 0.25, "*": 1.0}

        def expected_copies(i, s):
            w = epochs.get(s, 1.0)
            base = int(w)
            frac_cut = int(round((w - base) * BUCKETS))
            return base + (1 if (i * _PRIME) % BUCKETS < frac_cut else 0)

        for parts in (1, 7):
            ds = ray.data.from_arrow(t).repartition(parts)
            out = epoch_resample(ds, epochs).to_pandas()
            got = out.groupby("doc_id").copy.agg(["count", "min", "max"])
            for i, s in zip(ids, src):
                exp = expected_copies(i, s)
                if exp == 0:
                    assert i not in got.index
                else:
                    assert got.loc[i, "count"] == exp
                    assert got.loc[i, "min"] == 1 and got.loc[i, "max"] == exp


class TestReadParquetClean:
    def test_blocks_born_without_metadata(self, ray_session, tmp_path):
        """Pandas-written parquet: blocks must come out hashable straight
        from the read task (schema handed to the scanner), columns
        pruned; filter= callers fall back to read+strip and stay clean
        too."""
        import pandas as pd
        import pyarrow.compute as pc

        from cloudtile_ray.stages.util import read_parquet_clean

        p = str(tmp_path / "d.parquet")
        pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"],
                      "c": [1.0, 2.0, 3.0]}).to_parquet(p)
        import pyarrow.parquet as pq

        assert pq.read_schema(p).metadata  # pandas blob present on disk

        ds = read_parquet_clean(p, columns=["a", "b"])
        t = ds.take_batch(3, batch_format="pyarrow")
        assert t.column_names == ["a", "b"]
        assert t.schema.metadata is None
        hash(t.schema)  # raises TypeError when the blob leaks through

        ds2 = read_parquet_clean(p, filter=pc.field("a") > 1)
        t2 = ds2.take_batch(3, batch_format="pyarrow")
        assert t2.num_rows == 2
        assert t2.schema.metadata is None
        hash(t2.schema)


class TestBoilerplateStrip:
    def test_matches_duckdb_and_fallback_path(self, ray_session):
        """Chunks in >= 2 docs are cut from EVERY doc (unlike keep-first);
        a doc of pure boilerplate disappears; within-doc repeats with
        df == 1 survive in full.  The anti-join fallback (byte budget 0)
        must equal the broadcast path."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from cloudtile_ray.stages.chunks import strip_frequent_chunks

        texts = [
            "a b c d e f",      # "a b c" shared by docs 1-3 -> cut
            "a b c x y z",
            "a b c",            # only boilerplate -> doc vanishes
            "p q r p q r",      # within-doc dup, df=1 -> kept twice
        ]
        t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "text": pa.array(texts)})
        ds = ray.data.from_arrow(t).repartition(3)
        got = (
            strip_frequent_chunks(ds, n_tokens=3, max_df=1)
            .to_pandas().sort_values("doc_id", ignore_index=True)
        )
        con = duckdb.connect()
        con.register("documents", t)
        want = con.sql("""
            WITH tt AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
                 tok AS (SELECT doc_id, unnest(l) AS tk,
                                generate_subscripts(l, 1) AS i FROM tt),
                 ch AS (SELECT doc_id, CAST(FLOOR((i - 1) / 3) AS BIGINT) AS ci,
                               string_agg(tk, ' ' ORDER BY i) AS chunk
                        FROM tok GROUP BY doc_id, FLOOR((i - 1) / 3)),
                 df AS (SELECT chunk, count(DISTINCT doc_id) AS c
                        FROM ch GROUP BY chunk)
            SELECT doc_id, string_agg(chunk, ' ' ORDER BY ci) AS text
            FROM ch JOIN df USING (chunk)
            WHERE df.c <= 1 GROUP BY doc_id ORDER BY doc_id
        """).df()
        pd.testing.assert_frame_equal(got, want)
        assert 3 not in got.doc_id.values
        assert got.set_index("doc_id").loc[4, "text"] == "p q r p q r"

        ds2 = ray.data.from_arrow(t).repartition(2)
        via_join = (
            strip_frequent_chunks(ds2, n_tokens=3, max_df=1,
                                  broadcast_byte_budget=0)
            .to_pandas().sort_values("doc_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(via_join, want)


class TestNovelNgramStats:
    def test_matches_python_reference(self, ray_session):
        """n_uniq_spans counts spans whose gram occurs exactly once
        corpus-wide (within-doc repeats disqualify too); n_spans matches
        dup_ngram_stats' totals."""
        import collections

        import pyarrow as pa
        import ray.data

        from cloudtile_ray.stages.ngrams import novel_ngram_stats

        texts = [
            "a b c d e",        # grams: abc bcd cde
            "c d e f g",        # cde shared -> not novel
            "x y x y x",        # xyx appears twice IN-DOC -> not novel
        ]
        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(texts)})
        freq = collections.Counter()
        doc_grams = {}
        for i, s in zip((1, 2, 3), texts):
            w = s.split(" ")
            gs = [tuple(w[j:j + 3]) for j in range(len(w) - 2)]
            doc_grams[i] = gs
            freq.update(gs)
        want = {
            i: (len(gs), sum(freq[g] == 1 for g in gs))
            for i, gs in doc_grams.items()
        }
        ds = ray.data.from_arrow(t).repartition(2)
        out = novel_ngram_stats(ds, n=3).to_pandas().set_index("doc_id")
        for i, (spans, uniq) in want.items():
            assert out.loc[i, "n_spans"] == spans
            assert out.loc[i, "n_uniq_spans"] == uniq
        # doc 3: gram (x,y,x) twice in-doc, (y,x,y) once -> 1 novel of 3
        assert out.loc[3, "n_uniq_spans"] == 1


class TestMaskRareTokens:
    def test_matches_duckdb_and_determinism(self, ray_session):
        """Top-V cut is (count desc, token asc) — boundary ties resolve by
        token text; masked text round-trips token order; n_unk exact;
        output independent of partitioning."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from cloudtile_ray.stages.text import mask_rare_tokens

        texts = [
            "a a b c rare",
            "b b c c a",
            "zz a b",
            "",                  # empty doc: 1 empty token -> masked
        ]
        t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "text": pa.array(texts)})
        con = duckdb.connect()
        con.register("documents", t)
        want = con.sql("""
            WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                                 generate_subscripts(string_split(text, ' '), 1) AS i
                          FROM documents),
            counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
            keep AS (SELECT tok FROM counts ORDER BY n DESC, tok LIMIT 3)
            SELECT t.doc_id,
                   string_agg(CASE WHEN k.tok IS NULL THEN '<unk>' ELSE t.tok END,
                              ' ' ORDER BY i) AS text,
                   CAST(sum(CASE WHEN k.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_unk
            FROM toks t LEFT JOIN keep k USING (tok)
            GROUP BY t.doc_id ORDER BY t.doc_id
        """).df()
        for parts in (1, 3):
            ds = ray.data.from_arrow(t).repartition(parts)
            got = (
                mask_rare_tokens(ds, vocab_size=3)
                .to_pandas().sort_values("doc_id", ignore_index=True)
            )
            pd.testing.assert_frame_equal(got, want)


class TestRemoveDupNgramSpans:
    def test_both_routes_match_duckdb(self, ray_session):
        """Symmetric exact-substring removal: every copy of a duplicated
        n-gram's span is cut (including within-doc repeats); fully
        covered docs vanish; untouched docs round-trip.  The bucketed
        fallback (budget 0) must equal the broadcast path."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from cloudtile_ray.stages.ngrams import remove_dup_ngram_spans

        texts = [
            "a b c d e f g",    # shares "a b c".."c d e" grams with 2,3
            "z a b c y w q",
            "a b c d e",        # fully covered -> vanishes
            "p q r s t",        # untouched
            "a b c",            # fully covered -> vanishes
            "m m m m m m",      # within-doc repeated gram -> fully covered
        ]
        t = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                      "text": pa.array(texts)})
        con = duckdb.connect()
        con.register("documents", t)
        want = con.sql("""
            WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
                   FROM documents),
            th AS (SELECT doc_id, pos, list_reduce([CAST(0 AS HUGEINT)] ||
                   list_transform(range(1, length(w) + 1),
                                  i -> CAST(ord(substr(w, i, 1)) AS HUGEINT)),
                   (h, c) -> (h * 1000003 + c) % 18446744073709551616) AS h
                   FROM toks),
            doc_th AS (SELECT doc_id, list(h ORDER BY pos) AS hs
                       FROM th GROUP BY doc_id),
            grams AS (SELECT doc_id, i,
                   CAST(list_reduce([CAST(0 AS HUGEINT)] || hs[i:i+2],
                   (a, c) -> (a * 1000003 + c) % 18446744073709551616)
                   AS UBIGINT) AS gh
                   FROM (SELECT doc_id, hs, unnest(range(1, len(hs) - 1)) AS i
                         FROM doc_th)),
            freq AS (SELECT gh, count(*) AS c FROM grams GROUP BY gh),
            cov AS (SELECT DISTINCT g.doc_id, unnest(range(g.i, g.i + 3)) AS pos
                    FROM grams g JOIN freq f USING (gh) WHERE f.c >= 2)
            SELECT t.doc_id, string_agg(t.w, ' ' ORDER BY t.pos) AS text
            FROM toks t LEFT JOIN cov
              ON cov.doc_id = t.doc_id AND cov.pos = t.pos
            WHERE cov.pos IS NULL GROUP BY t.doc_id ORDER BY t.doc_id
        """).df()
        for budget in (256 << 20, 0):
            ds = ray.data.from_arrow(t).repartition(3)
            got = (
                remove_dup_ngram_spans(ds, n=3, broadcast_byte_budget=budget)
                .to_pandas().sort_values("doc_id", ignore_index=True)
            )
            pd.testing.assert_frame_equal(got, want)
        assert set(want.doc_id) == {1, 2, 4}
        assert want.set_index("doc_id").loc[4, "text"] == "p q r s t"

    def test_duplicate_free_corpus_is_identity(self, ray_session):
        """With no duplicated grams both routes return every doc
        unchanged."""
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from cloudtile_ray.stages.ngrams import remove_dup_ngram_spans

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["a b c d", "e f g h"])})
        for budget in (256 << 20, 0):
            ds = ray.data.from_arrow(t).repartition(2)
            got = (
                remove_dup_ngram_spans(ds, n=3, broadcast_byte_budget=budget)
                .to_pandas().sort_values("doc_id", ignore_index=True)
            )
            pd.testing.assert_frame_equal(got, t.to_pandas())


class TestKeywordRank:
    def test_matches_duckdb_bitwise(self, ray_session):
        """sum(tf/df) scores are bit-identical to the SQL oracle
        (IEEE division + left-to-right addition in term order); top-k
        boundary ties resolve by doc_id; docs with no hits excluded."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from cloudtile_ray.stages.text import keyword_rank

        texts = [
            "x y dup z",            # rare term -> big score
            "spark spark merge",    # common terms
            "merge y z",
            "x y z w",              # no hits -> excluded
            "dup spark merge",      # all three
            "spark q",
            "merge q",
        ]
        t = pa.table({"doc_id": pa.array(range(1, 8), pa.int64()),
                      "text": pa.array(texts)})
        con = duckdb.connect()
        con.register("documents", t)
        want = con.sql("""
            WITH tfp AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN tok = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS tf1,
                     CAST(sum(CASE WHEN tok = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS tf2,
                     CAST(sum(CASE WHEN tok = 'merge' THEN 1 ELSE 0 END) AS BIGINT) AS tf3
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents) GROUP BY doc_id),
            dfs AS (SELECT
              (SELECT count(*) FROM tfp WHERE tf1 > 0) AS df1,
              (SELECT count(*) FROM tfp WHERE tf2 > 0) AS df2,
              (SELECT count(*) FROM tfp WHERE tf3 > 0) AS df3)
            SELECT doc_id,
                   CAST(tf1 AS DOUBLE) / df1
                   + CAST(tf2 AS DOUBLE) / df2
                   + CAST(tf3 AS DOUBLE) / df3 AS score
            FROM tfp, dfs WHERE tf1 + tf2 + tf3 > 0
            ORDER BY score DESC, doc_id LIMIT 4
        """).df()
        ds = ray.data.from_arrow(t).repartition(3)
        got = (
            keyword_rank(ds, ["dup", "spark", "merge"], k=4)
            .to_pandas()
            .sort_values(["score", "doc_id"], ascending=[False, True],
                         ignore_index=True)
        )
        # bitwise: no tolerance
        pd.testing.assert_frame_equal(got, want, check_exact=True)
        assert 4 not in got.doc_id.values

    def test_absent_term_contributes_zero(self, ray_session):
        """A probe term missing from the corpus is skipped (df=0 division
        guarded) and the remaining terms still rank."""
        import pyarrow as pa
        import ray.data

        from cloudtile_ray.stages.text import keyword_rank

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["merge a", "b c"])})
        ds = ray.data.from_arrow(t)
        got = keyword_rank(ds, ["nosuchterm", "merge"], k=5).to_pandas()
        assert got.doc_id.tolist() == [1]
        assert got.score.tolist() == [1.0]


class TestMultimodalResizeAndFrames:
    def test_resize_contract(self, ray_session):
        """Images: payload replaced (decimated in the fake), width/height
        rewritten to the target; audio/video rows byte-identical; output
        schema == input schema."""
        import ray.data

        from cloudtile_ray.stages.multimodal import (
            resize_media,
            synthesize_media_table,
        )

        t = synthesize_media_table(30)
        ds = ray.data.from_arrow(t).repartition(3)
        out = (
            resize_media(ds, target_w=64, target_h=48, fake=True,
                         batch_size=8)
            .to_pandas().sort_values("media_id", ignore_index=True)
        )
        src = t.to_pandas().sort_values("media_id", ignore_index=True)
        assert list(out.columns) == list(src.columns)
        for i in range(len(out)):
            if src.kind[i] == "image":
                assert out.width[i] == 64 and out.height[i] == 48
                stride = max(1, (src.width[i] * src.height[i]) // (64 * 48))
                assert out.payload[i] == src.payload[i][::stride]
            else:
                assert out.payload[i] == src.payload[i]
                assert out.width[i] == src.width[i]

    def test_frame_sample_contract(self, ray_session):
        """One-to-many expansion: exactly n_frames rows per video with
        evenly spaced ts_ms; non-video rows dropped; deterministic."""
        import ray.data

        from cloudtile_ray.stages.multimodal import (
            sample_frames,
            synthesize_media_table,
        )

        t = synthesize_media_table(30)
        n_video = sum(1 for k in t.column("kind").to_pylist() if k == "video")
        ds = ray.data.from_arrow(t).repartition(3)
        out = (
            sample_frames(ds, n_frames=4, fake=True, batch_size=8)
            .to_pandas().sort_values(["media_id", "frame_idx"],
                                     ignore_index=True)
        )
        assert len(out) == 4 * n_video
        one = out[out.media_id == out.media_id.iloc[0]]
        assert one.frame_idx.tolist() == [0, 1, 2, 3]
        assert one.ts_ms.tolist() == [0, 1250, 2500, 3750]  # dur 5000 / 4
        out2 = (
            sample_frames(ray.data.from_arrow(t), n_frames=4, fake=True)
            .to_pandas().sort_values(["media_id", "frame_idx"],
                                     ignore_index=True)
        )
        assert out.frame.tolist() == out2.frame.tolist()

    def test_real_codecs_raise(self):
        import pytest

        from cloudtile_ray.stages.multimodal import (
            FrameSampleStub,
            ResizeStub,
            synthesize_media_table,
        )

        with pytest.raises(NotImplementedError):
            ResizeStub(fake=False)(synthesize_media_table(3))
        with pytest.raises(NotImplementedError):
            FrameSampleStub(fake=False)(synthesize_media_table(3))


class TestValueDeltas:
    def test_matches_lag_window(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.events import prep_events, value_deltas

        rng = np.random.default_rng(11)
        n = 600
        base = np.datetime64("2024-01-01T00:00:00", "us")
        # duplicate timestamps on purpose — event_id must break the ties
        ts = base + rng.integers(0, 200, n).astype("timedelta64[s]")
        t = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts),
                "user_id": pa.array(rng.integers(0, 40, n).astype("int64")),
                "value": pa.array(rng.integers(0, 10_000, n) / 100.0),
            }
        )
        res = (
            value_deltas(
                ray.data.from_arrow(t)
                .repartition(7)
                .map_batches(prep_events, batch_format="pyarrow")
            )
            .to_pandas()
            .sort_values(["user_id", "event_id"], ignore_index=True)
        )
        want = duckdb.sql(
            """WITH e AS (SELECT user_id, event_id, ts,
                                 CAST(round(value * 100) AS BIGINT) AS cents
                          FROM t),
               d AS (SELECT user_id, event_id,
                            cents - lag(cents) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)
                              AS delta_cents
                     FROM e)
               SELECT user_id, event_id, CAST(delta_cents AS BIGINT) AS delta_cents
               FROM d WHERE delta_cents IS NOT NULL
               ORDER BY user_id, event_id"""
        ).df()
        assert res["delta_cents"].tolist() == want["delta_cents"].tolist()
        assert res["event_id"].tolist() == want["event_id"].tolist()
        # each user loses exactly its first event
        n_users = t.column("user_id").to_pandas().nunique()
        assert len(res) == n - n_users

    def test_single_event_users_vanish(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.events import prep_events, value_deltas

        base = np.datetime64("2024-01-01T00:00:00", "us")
        t = pa.table(
            {
                "event_id": pa.array([0, 1, 2], pa.int64()),
                "ts": pa.array([base, base, base + np.timedelta64(1, "s")]),
                "user_id": pa.array([1, 2, 2], pa.int64()),
                "value": pa.array([1.0, 2.0, 3.5]),
            }
        )
        res = value_deltas(
            ray.data.from_arrow(t).map_batches(prep_events, batch_format="pyarrow")
        ).to_pandas()
        assert res["user_id"].tolist() == [2]
        assert res["delta_cents"].tolist() == [150]


class TestGlobalNtile:
    def test_matches_sql_ntile(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.relational import global_ntile

        rng = np.random.default_rng(5)
        # n NOT divisible by k — exercises the ragged-bucket rule
        n, k = 503, 10
        t = pa.table(
            {
                "rid": pa.array(range(n), pa.int64()),
                "v": pa.array(rng.integers(0, 50, n).astype("int64")),
            }
        )
        res = (
            global_ntile(
                ray.data.from_arrow(t).repartition(6), ["v", "rid"], k=k,
                out_col="tile",
            )
            .to_pandas()
            .sort_values("rid", ignore_index=True)
        )
        want = duckdb.sql(
            """SELECT rid, ntile(10) OVER (ORDER BY v, rid) AS tile
               FROM t ORDER BY rid"""
        ).df()
        assert res["tile"].tolist() == want["tile"].tolist()

    def test_small_n_fewer_rows_than_tiles(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import global_ntile

        t = pa.table({"rid": pa.array([2, 0, 1], pa.int64())})
        res = (
            global_ntile(ray.data.from_arrow(t), ["rid"], k=10)
            .to_pandas()
            .sort_values("rid", ignore_index=True)
        )
        # SQL NTILE with N < k gives each row its own 1-based tile
        assert res["tile"].tolist() == [1, 2, 3]


class TestCohortRetention:
    def test_matches_sql_triangle(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.events import cohort_retention

        rng = np.random.default_rng(23)
        n = 800
        base = np.datetime64("2024-03-01T00:00:00", "us")
        ts = base + rng.integers(0, 30 * 86400, n).astype("timedelta64[s]")
        t = pa.table(
            {
                "ts": pa.array(ts),
                "user_id": pa.array(rng.integers(0, 60, n).astype("int64")),
            }
        )
        prepped = pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(
                    ts.astype("datetime64[us]").astype(np.int64)
                ),
            }
        )
        res = (
            cohort_retention(ray.data.from_arrow(prepped).repartition(7))
            .to_pandas()
            .sort_values(["cohort_day", "day_offset"], ignore_index=True)
        )
        want = duckdb.sql(
            """WITH e AS (SELECT user_id,
                                 epoch_us(ts) // 86400000000 AS day FROM t),
               f AS (SELECT user_id, min(day) AS cohort_day
                     FROM e GROUP BY user_id),
               a AS (SELECT DISTINCT e.user_id, f.cohort_day,
                            e.day - f.cohort_day AS day_offset
                     FROM e JOIN f USING (user_id))
               SELECT cohort_day, day_offset, count(*) AS n_users
               FROM a GROUP BY cohort_day, day_offset
               ORDER BY cohort_day, day_offset"""
        ).df()
        assert res["n_users"].tolist() == want["n_users"].tolist()
        assert res["cohort_day"].tolist() == want["cohort_day"].tolist()
        assert res["day_offset"].tolist() == want["day_offset"].tolist()
        # offset 0 row exists for every cohort (the cohort itself)
        zero = res[res["day_offset"] == 0]
        assert set(zero["cohort_day"]) == set(res["cohort_day"])


class TestRollupAggregate:
    @pytest.mark.parametrize("budget", [32 << 20, 0])
    def test_matches_sql_rollup_three_keys(self, ray_session, budget):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.relational import rollup_aggregate

        rng = np.random.default_rng(31)
        n = 700
        t = pa.table(
            {
                "a": pa.array(rng.choice(["x", "y", "z"], n)),
                "b": pa.array(rng.choice(["p", "q"], n)),
                "c": pa.array(rng.choice(["m", "n", "o", "r"], n)),
                "rid": pa.array(range(n), pa.int64()),
                "v": pa.array(rng.integers(-50, 50, n).astype("int64")),
            }
        )
        res = (
            rollup_aggregate(
                ray.data.from_arrow(t).repartition(6),
                ["a", "b", "c"],
                [
                    ("rid", "count", "n"),
                    ("v", "sum", "sum_v"),
                    ("v", "min", "min_v"),
                    ("v", "max", "max_v"),
                ],
                driver_byte_budget=budget,
            )
            .to_pandas()
            .sort_values(["a", "b", "c"], ignore_index=True)
        )
        want = duckdb.sql(
            """SELECT coalesce(a,'ALL') AS a, coalesce(b,'ALL') AS b,
                      coalesce(c,'ALL') AS c,
                      count(rid) AS n, CAST(sum(v) AS BIGINT) AS sum_v,
                      min(v) AS min_v, max(v) AS max_v
               FROM t GROUP BY ROLLUP (a, b, c)
               ORDER BY a, b, c"""
        ).df()
        assert res[["a", "b", "c"]].values.tolist() == want[["a", "b", "c"]].values.tolist()
        for col in ["n", "sum_v", "min_v", "max_v"]:
            assert res[col].tolist() == want[col].tolist(), col

    def test_single_key_and_empty_keys_rejected(self, ray_session):
        import pytest
        import ray.data

        from cloudtile_ray.stages.relational import rollup_aggregate

        t = pa.table(
            {
                "k": pa.array(["a", "a", "b"]),
                "v": pa.array([1, 2, 3], pa.int64()),
            }
        )
        res = (
            rollup_aggregate(
                ray.data.from_arrow(t), ["k"], [("v", "sum", "s")]
            )
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert res["k"].tolist() == ["ALL", "a", "b"]
        assert res["s"].tolist() == [6, 3, 3]
        with pytest.raises(ValueError):
            rollup_aggregate(ray.data.from_arrow(t), [], [("v", "sum", "s")])


class TestFunnelCounts:
    def test_matches_nested_min_sql(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.events import funnel_counts

        rng = np.random.default_rng(41)
        n = 1200
        types = np.array(["view", "click", "purchase", "error", "signup"])
        base = 1_700_000_000_000_000
        t = pa.table(
            {
                "user_id": pa.array(rng.integers(0, 80, n).astype("int64")),
                "ts_us": pa.array(base + rng.integers(0, 10**9, n).astype("int64")),
                "event_type": pa.array(types[rng.integers(0, 5, n)]),
            }
        )
        res = (
            funnel_counts(ray.data.from_arrow(t).repartition(5))
            .to_pandas()
            .sort_values("stage_idx", ignore_index=True)
        )
        want = duckdb.sql(
            """WITH s0 AS (SELECT user_id, min(ts_us) AS t FROM t
                           WHERE event_type = 'view' GROUP BY user_id),
               s1 AS (SELECT t.user_id, min(t.ts_us) AS t2
                      FROM t JOIN s0 USING (user_id)
                      WHERE t.event_type = 'click' AND t.ts_us > s0.t
                      GROUP BY t.user_id),
               s2 AS (SELECT t.user_id, min(t.ts_us) AS t3
                      FROM t JOIN s1 USING (user_id)
                      WHERE t.event_type = 'purchase' AND t.ts_us > s1.t2
                      GROUP BY t.user_id)
               SELECT (SELECT count(*) FROM s0) AS a,
                      (SELECT count(*) FROM s1) AS b,
                      (SELECT count(*) FROM s2) AS c"""
        ).df()
        assert res["stage"].tolist() == ["view", "click", "purchase"]
        assert res["n_users"].tolist() == [
            int(want["a"][0]), int(want["b"][0]), int(want["c"][0])
        ]
        # funnel counts are monotone non-increasing
        assert res["n_users"].is_monotonic_decreasing or (
            res["n_users"].tolist() == sorted(res["n_users"].tolist(), reverse=True)
        )

    def test_same_microsecond_does_not_qualify(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.events import funnel_counts

        t = pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "ts_us": pa.array([10, 10, 20, 5, 6], pa.int64()),
                "event_type": pa.array(
                    ["view", "click", "purchase", "view", "click"]
                ),
            }
        )
        res = (
            funnel_counts(ray.data.from_arrow(t))
            .to_pandas()
            .sort_values("stage_idx", ignore_index=True)
        )
        # user 1's click shares the view's microsecond -> not counted, so
        # its purchase is unreachable; user 2 converts view->click.
        assert res["n_users"].tolist() == [2, 1, 0]


class TestIvfRecallSweep:
    def test_ladder_monotone_and_saturates(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.similarity import ivf_recall_sweep

        rng = np.random.default_rng(7)
        n, d = 600, 16
        V = rng.normal(size=(n, d))
        t = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in V],
                    pa.list_(pa.float32()),
                ),
            }
        )
        queries = rng.normal(size=(4, d))
        res = ivf_recall_sweep(
            ray.data.from_arrow(t).repartition(5), queries, k=10,
            n_centroids=8, nprobes=(1, 2, 4, 8),
        ).to_pandas()
        rec = res["recall_at_k"].tolist()
        assert res["nprobe"].tolist() == [1, 2, 4, 8]
        # shared centroids: ladder is non-decreasing; probing all 8 of 8
        # lists IS brute force, so the top rung is exact
        assert all(a <= b + 1e-12 for a, b in zip(rec, rec[1:]))
        assert rec[-1] == 1.0
        assert (res["n_queries"] == 4).all()
        # determinism: a second run reproduces the ladder exactly
        res2 = ivf_recall_sweep(
            ray.data.from_arrow(t).repartition(5), queries, k=10,
            n_centroids=8, nprobes=(1, 2, 4, 8),
        ).to_pandas()
        assert res2["recall_at_k"].tolist() == rec


class TestCooccurrencePairs:
    def test_matches_self_join_sql(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.text import cooccurrence_pairs

        rng = np.random.default_rng(13)
        vocab = np.array(["ant", "bee", "cat", "dog", "elk", "fox", "gnu"])
        texts = [
            " ".join(vocab[rng.integers(0, 7, rng.integers(0, 12))])
            for _ in range(300)
        ]
        texts.append("")  # empty doc: one empty token, no pairs
        texts.append("solo")  # single-token doc: no pairs
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
        res = (
            cooccurrence_pairs(ray.data.from_arrow(t).repartition(5), k=15)
            .to_pandas()
            .reset_index(drop=True)
        )
        want = duckdb.sql(
            """WITH raw AS (SELECT doc_id,
                                   unnest(string_split(text, ' ')) AS tk
                            FROM t),
               tok AS (SELECT DISTINCT doc_id, tk FROM raw)
               SELECT a.tk AS tok_a, b.tk AS tok_b, count(*) AS n
               FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.tk < b.tk
               GROUP BY a.tk, b.tk
               ORDER BY n DESC, tok_a, tok_b LIMIT 15"""
        ).df()
        assert res[["tok_a", "tok_b", "n"]].values.tolist() == want.values.tolist()

    def test_duplicate_tokens_count_once_per_doc(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.text import cooccurrence_pairs

        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a b a b a", "b a"]),
            }
        )
        res = cooccurrence_pairs(ray.data.from_arrow(t), k=5).to_pandas()
        assert res["tok_a"].tolist() == ["a"]
        assert res["tok_b"].tolist() == ["b"]
        assert res["n"].tolist() == [2]


class TestDupDensity:
    def test_matches_sql_and_crosses_groups(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.dedup import dup_density

        rng = np.random.default_rng(17)
        n = 400
        # small key space forces corpus-wide duplicates, including keys
        # shared ACROSS groups (a doc counts as dup even when its twin
        # lives in another source)
        keys = np.array([f"k{v}" for v in rng.integers(0, 150, n)])
        grp = np.array([f"s{v}" for v in rng.integers(0, 6, n)])
        t = pa.table(
            {
                "key": pa.array(keys),
                "grp": pa.array(grp),
            }
        )
        res = (
            dup_density(ray.data.from_arrow(t).repartition(7), "key", "grp")
            .to_pandas()
            .sort_values("grp", ignore_index=True)
        )
        want = duckdb.sql(
            """WITH c AS (SELECT key, count(*) AS cnt FROM t GROUP BY key)
               SELECT grp, count(*) AS n_docs,
                      CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_dup
               FROM t JOIN c USING (key)
               GROUP BY grp ORDER BY grp"""
        ).df()
        assert res["grp"].tolist() == want["grp"].tolist()
        assert res["n_docs"].tolist() == want["n_docs"].tolist()
        assert res["n_dup"].tolist() == want["n_dup"].tolist()

    def test_all_unique_gives_zero_dup(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.dedup import dup_density

        t = pa.table(
            {
                "key": pa.array([f"u{i}" for i in range(50)]),
                "grp": pa.array(["a"] * 25 + ["b"] * 25),
            }
        )
        res = dup_density(ray.data.from_arrow(t), "key", "grp").to_pandas()
        assert res["n_dup"].tolist() == [0, 0]
        assert sorted(res["n_docs"].tolist()) == [25, 25]


class TestTransitionCounts:
    def test_matches_lag_pairs(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.events import transition_counts

        rng = np.random.default_rng(29)
        n = 900
        types = np.array(["view", "click", "purchase", "error"])
        t = pa.table(
            {
                "user_id": pa.array(rng.integers(0, 50, n).astype("int64")),
                "event_id": pa.array(range(n), pa.int64()),
                # duplicate timestamps: event_id must break ties
                "ts_us": pa.array(rng.integers(0, 400, n).astype("int64")),
                "event_type": pa.array(types[rng.integers(0, 4, n)]),
            }
        )
        res = (
            transition_counts(ray.data.from_arrow(t).repartition(6))
            .to_pandas()
            .sort_values(["prev_type", "next_type"], ignore_index=True)
        )
        want = duckdb.sql(
            """WITH o AS (SELECT user_id, event_type,
                                 lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts_us, event_id) AS prev_type
                          FROM t)
               SELECT prev_type, event_type AS next_type, count(*) AS n
               FROM o WHERE prev_type IS NOT NULL
               GROUP BY prev_type, next_type
               ORDER BY prev_type, next_type"""
        ).df()
        assert res[["prev_type", "next_type"]].values.tolist() == \
            want[["prev_type", "next_type"]].values.tolist()
        assert res["n"].tolist() == want["n"].tolist()
        # total transitions == total events minus one per user present
        n_users = len(np.unique(t.column("user_id").to_numpy()))
        assert res["n"].sum() == n - n_users


class TestPivotCounts:
    def test_matches_duckdb_pivot(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.relational import pivot_counts

        rng = np.random.default_rng(37)
        n = 500
        t = pa.table(
            {
                "idx": pa.array([f"i{v}" for v in rng.integers(0, 40, n)]),
                "pv": pa.array([f"p{v}" for v in rng.integers(0, 7, n)]),
            }
        )
        res = (
            pivot_counts(ray.data.from_arrow(t).repartition(6), "idx", "pv")
            .to_pandas()
            .sort_values("idx", ignore_index=True)
        )
        want = duckdb.sql(
            "PIVOT t ON pv USING count(*) GROUP BY idx ORDER BY idx"
        ).df()
        assert sorted(res.columns) == sorted(want.columns)
        want = want[res.columns.tolist()]
        assert res.values.tolist() == want.values.tolist()

    def test_zero_fill_for_absent_combinations(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import pivot_counts

        t = pa.table(
            {
                "idx": pa.array(["a", "a", "b"]),
                "pv": pa.array(["x", "x", "y"]),
            }
        )
        res = (
            pivot_counts(ray.data.from_arrow(t), "idx", "pv")
            .to_pandas()
            .sort_values("idx", ignore_index=True)
        )
        assert res["x"].tolist() == [2, 0]
        assert res["y"].tolist() == [0, 1]


class TestUnpivot:
    def test_matches_duckdb_unpivot(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.relational import unpivot

        rng = np.random.default_rng(43)
        n = 300
        t = pa.table(
            {
                "rid": pa.array(range(n), pa.int64()),
                "a": pa.array(rng.normal(size=n)),
                "b": pa.array(rng.integers(0, 9, n).astype("int64")),
                "c": pa.array(rng.normal(size=n)),
            }
        )
        res = (
            unpivot(ray.data.from_arrow(t).repartition(4), ["rid"], ["a", "b", "c"])
            .to_pandas()
            .sort_values(["rid", "measure"], ignore_index=True)
        )
        want = duckdb.sql(
            """SELECT rid, measure, CAST(value AS DOUBLE) AS value
               FROM (UNPIVOT t ON a, b, c INTO NAME measure VALUE value)
               ORDER BY rid, measure"""
        ).df()
        assert res["measure"].tolist() == want["measure"].tolist()
        # bit-exact float passthrough (int column promoted to float64)
        assert res["value"].tolist() == want["value"].tolist()
        assert len(res) == 3 * n


class TestCubeAndGroupingSets:
    @pytest.mark.parametrize("budget", [32 << 20, 0])
    def test_cube_matches_sql(self, ray_session, budget):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.relational import cube_aggregate

        rng = np.random.default_rng(47)
        n = 600
        t = pa.table(
            {
                "a": pa.array(rng.choice(["x", "y", "z"], n)),
                "b": pa.array(rng.choice(["p", "q", "r"], n)),
                "rid": pa.array(range(n), pa.int64()),
                "v": pa.array(rng.integers(-30, 30, n).astype("int64")),
            }
        )
        res = (
            cube_aggregate(
                ray.data.from_arrow(t).repartition(5),
                ["a", "b"],
                [("rid", "count", "n"), ("v", "sum", "sum_v")],
                driver_byte_budget=budget,
            )
            .to_pandas()
            .sort_values(["a", "b"], ignore_index=True)
        )
        want = duckdb.sql(
            """SELECT coalesce(a,'ALL') AS a, coalesce(b,'ALL') AS b,
                      count(rid) AS n, CAST(sum(v) AS BIGINT) AS sum_v
               FROM t GROUP BY CUBE (a, b) ORDER BY a, b"""
        ).df()
        assert res[["a", "b"]].values.tolist() == want[["a", "b"]].values.tolist()
        assert res["n"].tolist() == want["n"].tolist()
        assert res["sum_v"].tolist() == want["sum_v"].tolist()

    def test_grouping_sets_subset_validation(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import grouping_sets_aggregate

        t = pa.table({"a": pa.array(["x"]), "v": pa.array([1], pa.int64())})
        with pytest.raises(ValueError):
            grouping_sets_aggregate(
                ray.data.from_arrow(t), ["a"], [["zz"]], [("v", "sum", "s")]
            )


class TestResampleFill:
    def test_matches_generate_series(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.events import resample_fill

        rng = np.random.default_rng(53)
        n = 200
        # sparse: 200 events across ~5000 buckets -> gaps guaranteed
        t = pa.table(
            {
                "ts_us": pa.array(
                    (rng.integers(0, 5000, n) * 60_000_000
                     + rng.integers(0, 60_000_000, n)).astype("int64")
                ),
                "value_cents": pa.array(rng.integers(-100, 100, n).astype("int64")),
            }
        )
        res = (
            resample_fill(ray.data.from_arrow(t).repartition(4), unit_us=60_000_000)
            .to_pandas()
            .sort_values("bucket", ignore_index=True)
        )
        want = duckdb.sql(
            """WITH e AS (SELECT ts_us // 60000000 AS bucket, value_cents FROM t),
               b AS (SELECT bucket, count(*) AS n,
                            CAST(sum(value_cents) AS BIGINT) AS sum_cents
                     FROM e GROUP BY bucket),
               r AS (SELECT unnest(generate_series((SELECT min(bucket) FROM b),
                                                   (SELECT max(bucket) FROM b)))
                       AS bucket)
               SELECT bucket, coalesce(b.n, 0) AS n,
                      coalesce(b.sum_cents, 0) AS sum_cents
               FROM r LEFT JOIN b USING (bucket) ORDER BY bucket"""
        ).df()
        assert res["bucket"].tolist() == want["bucket"].tolist()
        assert res["n"].tolist() == want["n"].tolist()
        assert res["sum_cents"].tolist() == want["sum_cents"].tolist()
        # the fill actually produced empty buckets
        assert (res["n"] == 0).any()
        # dense: no missing bucket between min and max
        assert len(res) == res["bucket"].iloc[-1] - res["bucket"].iloc[0] + 1

    def test_empty_input(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.events import resample_fill

        t = pa.table(
            {
                "ts_us": pa.array([], pa.int64()),
                "value_cents": pa.array([], pa.int64()),
            }
        )
        res = resample_fill(ray.data.from_arrow(t)).to_pandas()
        assert len(res) == 0


class TestFuzzyPairs:
    def test_matches_levenshtein_sql(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.dedup import fuzzy_pairs

        rng = np.random.default_rng(59)
        # dense short-string space -> substitutions, insertions, AND the
        # ab/ba false-positive shape all occur
        alpha = np.array(list("abc"))
        vals = ["".join(alpha[rng.integers(0, 3, rng.integers(1, 5))]) for _ in range(400)]
        t = pa.table({"s": pa.array(vals)})
        res = (
            fuzzy_pairs(ray.data.from_arrow(t).repartition(5), "s")
            .to_pandas()
            .sort_values(["a", "b"], ignore_index=True)
        )
        want = duckdb.sql(
            """WITH v AS (SELECT DISTINCT s FROM t)
               SELECT a.s AS a, b.s AS b
               FROM v a JOIN v b ON a.s < b.s
               WHERE levenshtein(a.s, b.s) = 1
               ORDER BY a, b"""
        ).df()
        assert res[["a", "b"]].values.tolist() == want.values.tolist()

    def test_transposition_is_not_ed1(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.dedup import fuzzy_pairs

        t = pa.table({"s": pa.array(["ab", "ba", "aa", "abc"])})
        res = (
            fuzzy_pairs(ray.data.from_arrow(t), "s")
            .to_pandas()
            .sort_values(["a", "b"], ignore_index=True)
        )
        got = set(map(tuple, res[["a", "b"]].values.tolist()))
        # ab<->ba is ed 2 (shared deletion variants 'a' and 'b' are the
        # classic false positive); aa-ab, aa-ba, ab-abc, ba... check SQL set
        assert ("ab", "ba") not in got
        assert ("aa", "ab") in got and ("ab", "abc") in got


class TestJsonExtract:
    """Vectorized JSON integer-field extraction (events.json_field_int)."""

    def test_matches_duckdb_json_extract(self):
        import duckdb

        from cloudtile_ray.stages.events import json_field_int

        props = [
            '{"k": 87}', '{"k": 0}', '{"k": -3}', '{ "k" : 12 }',
            '{"j": 5}', None, '{"k": "x"}', '{"kk": 9, "k": 41}',
        ]
        t = pa.table({"props": pa.array(props, pa.string())})
        got = json_field_int(t).column("k").to_pylist()
        want = duckdb.sql(
            """SELECT TRY_CAST(json_extract_string(p, '$.k') AS BIGINT)
               FROM (SELECT unnest($1::VARCHAR[]) AS p)""",
            params=[props[:5] + ["{}"] + props[6:]],
        ).fetchall()
        # row 5 (None) stays null either way; DuckDB can't take a NULL in
        # the array literal so it's swapped for {} (also null k)
        assert got == [w[0] for w in want]

    def test_missing_and_nonint_are_null(self):
        from cloudtile_ray.stages.events import json_field_int

        t = pa.table({"props": pa.array(['{"a":1}', '{"k":2.5}', '{"k":7}'])})
        got = json_field_int(t).column("k").to_pylist()
        # 2.5 must NOT half-match as 2 (TRY_CAST('2.5' AS BIGINT) is null)
        assert got == [None, None, 7]


class TestGroupedStringAgg:
    """Order-sensitive per-group concat (relational.grouped_string_agg)."""

    def test_matches_duckdb_string_agg(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.relational import grouped_string_agg

        rng = np.random.default_rng(7)
        n = 500
        t = pa.table({
            "k": pa.array(rng.integers(0, 40, n)),
            "o": pa.array(rng.permutation(n)),
            "v": pa.array([f"w{i%17}" for i in range(n)]),
        })
        got = (
            grouped_string_agg(
                ray.data.from_arrow(t).repartition(7), ["k"], "v",
                out_name="s", sep="|", order_cols=["o"],
            )
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        want = duckdb.sql(
            """SELECT k, string_agg(v, '|' ORDER BY o) AS s
               FROM t GROUP BY k ORDER BY k"""
        ).df()
        assert got[["k", "s"]].values.tolist() == want.values.tolist()

    def test_nulls_dropped_and_string_keys(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.relational import grouped_string_agg

        t = pa.table({
            "g": pa.array(["a", "a", "b", "b", "a"]),
            "v": pa.array(["x", None, "y", "z", "q"]),
        })
        got = (
            grouped_string_agg(ray.data.from_arrow(t), ["g"], "v", out_name="s")
            .to_pandas()
            .sort_values("g", ignore_index=True)
        )
        want = duckdb.sql(
            """SELECT g, string_agg(v, ',' ORDER BY v) AS s
               FROM t GROUP BY g ORDER BY g"""
        ).df()
        assert got[["g", "s"]].values.tolist() == want.values.tolist()


class TestRowsWindowSum:
    """Bounded ROWS-frame moving sum (events.rows_window_sum)."""

    def test_matches_duckdb_rows_frame(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.events import rows_window_sum

        rng = np.random.default_rng(11)
        n = 400
        t = pa.table({
            "event_id": pa.array(np.arange(n)),
            "user_id": pa.array(rng.integers(0, 25, n)),
            "ts": pa.array(
                rng.integers(0, 10**9, n).astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
        })
        got = (
            rows_window_sum(ray.data.from_arrow(t).repartition(6), frame=3)
            .to_pandas()
            .sort_values(["user_id", "event_id"], ignore_index=True)
        )
        want = duckdb.sql(
            """WITH e AS (SELECT user_id, event_id, ts,
                                 CAST(round(value * 100) AS BIGINT) AS cents
                          FROM t)
               SELECT user_id, event_id,
                      CAST(sum(cents) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id
                                            ROWS BETWEEN 2 PRECEDING
                                                     AND CURRENT ROW)
                           AS BIGINT) AS win_cents
               FROM e ORDER BY user_id, event_id"""
        ).df()
        assert got[["user_id", "event_id", "win_cents"]].values.tolist() == \
            want.values.tolist()

    def test_frame_1_is_identity(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.events import rows_window_sum

        t = pa.table({
            "event_id": pa.array([0, 1, 2]),
            "user_id": pa.array([5, 5, 5]),
            "ts": pa.array(
                np.array([10, 20, 30], dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "value": pa.array([1.0, 2.0, 3.0]),
        })
        got = (
            rows_window_sum(ray.data.from_arrow(t), frame=1)
            .to_pandas()
            .sort_values("event_id", ignore_index=True)
        )
        assert got["win_cents"].tolist() == [100, 200, 300]


class TestGlobalDenseRank:
    """Tied-value global ranking (relational.global_dense_rank)."""

    def test_matches_duckdb_dense_rank(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.relational import global_dense_rank

        rng = np.random.default_rng(3)
        n = 300
        t = pa.table({
            "id": pa.array(np.arange(n)),
            "v": pa.array(rng.integers(0, 40, n)),  # heavy ties
        })
        got = (
            global_dense_rank(ray.data.from_arrow(t).repartition(5), "v")
            .to_pandas()
            .sort_values("id", ignore_index=True)
        )
        want = duckdb.sql(
            """SELECT id, v,
                      CAST(dense_rank() OVER (ORDER BY v) AS BIGINT) AS rank
               FROM t ORDER BY id"""
        ).df()
        assert got[["id", "v", "rank"]].values.tolist() == want.values.tolist()

    def test_all_equal_is_rank_one(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import global_dense_rank

        t = pa.table({"id": pa.array([0, 1, 2]), "v": pa.array([7, 7, 7])})
        got = global_dense_rank(ray.data.from_arrow(t), "v").to_pandas()
        assert got["rank"].tolist() == [1, 1, 1]


class TestHllDistinct:
    """HyperLogLog approximate distinct (sketches.hll_distinct)."""

    def test_error_bound_and_determinism(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.sketches import hll_distinct

        rng = np.random.default_rng(0)
        n = 100_000
        t = pa.table({
            "g": pa.array(rng.integers(0, 3, n)),
            "v": pa.array(rng.integers(0, 30_000, n)),
        })
        got = (
            hll_distinct(ray.data.from_arrow(t).repartition(8), "g", "v")
            .to_pandas().sort_values("g", ignore_index=True)
        )
        exact = t.to_pandas().groupby("g")["v"].nunique()
        for _, r in got.iterrows():
            ex = exact[r["g"]]
            assert abs(r["approx_distinct"] - ex) / ex < 0.05  # 3x the RSE
        got2 = (
            hll_distinct(ray.data.from_arrow(t).repartition(3), "g", "v")
            .to_pandas().sort_values("g", ignore_index=True)
        )
        assert got.equals(got2)  # deterministic at any parallelism

    def test_small_range_linear_counting(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.sketches import hll_distinct

        # 20 distinct values: the linear-counting branch is near-exact
        t = pa.table({
            "g": pa.array([0] * 200),
            "v": pa.array([f"u{i % 20}" for i in range(200)]),
        })
        got = hll_distinct(ray.data.from_arrow(t), "g", "v").to_pandas()
        assert got["approx_distinct"].tolist() == [20]

    def test_p_out_of_range_rejected(self):
        from cloudtile_ray.stages.sketches import hll_partials

        t = pa.table({"g": pa.array([1]), "v": pa.array([1])})
        with pytest.raises(ValueError):
            hll_partials(t, "g", "v", p=8)


class TestBloomFilter:
    """Broadcast Bloom prefilter (sketches.bloom_build/bloom_prefilter)."""

    def test_no_false_negatives_and_fp_rate(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.sketches import bloom_build, bloom_prefilter

        rng = np.random.default_rng(5)
        keys = pa.table({"k": pa.array(np.arange(2000, dtype=np.int64))})
        bits = bloom_build(
            ray.data.from_arrow(keys).repartition(4), "k", num_bits=((10 * 2000) // 8) * 8
        )
        probe = pa.table({"k": pa.array(rng.integers(0, 40_000, 10_000))})
        kept = bloom_prefilter(probe, "k", bits)
        kept_set = set(kept.column("k").to_pylist())
        member = probe.column("k").to_numpy() < 2000
        # every true member survives
        assert set(probe.column("k").to_numpy()[member].tolist()) <= kept_set
        # false-positive rate small: non-members that survived
        non_members = int((~member).sum())
        fps = len([v for v in kept.column("k").to_pylist() if v >= 2000])
        assert fps / non_members < 0.03

    def test_empty_batch_passthrough(self):
        from cloudtile_ray.stages.sketches import bloom_prefilter

        t = pa.table({"k": pa.array([], pa.int64())})
        assert bloom_prefilter(t, "k", np.zeros(128, np.uint8)).num_rows == 0


class TestCrossGroupDots:
    """Blocked Gram matmul for group count vectors (cross_group_dots)."""

    def test_matches_duckdb_self_join(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.relational import cross_group_dots

        rng = np.random.default_rng(9)
        n = 2000
        t = pa.table({
            "g": pa.array(rng.choice(["a", "b", "c"], n)),
            "k": pa.array(rng.integers(0, 50, n).astype(str)),
            "v": pa.array(np.ones(n, dtype=np.int64)),
        })
        got = (
            cross_group_dots(ray.data.from_arrow(t).repartition(6), "g", "k", "v")
            .to_pandas().sort_values(["ga", "gb"], ignore_index=True)
        )
        want = duckdb.sql(
            """WITH c AS (SELECT g, k, CAST(sum(v) AS BIGINT) AS n
                          FROM t GROUP BY g, k)
               SELECT a.g AS ga, b.g AS gb, CAST(sum(a.n * b.n) AS BIGINT) AS dot
               FROM c a JOIN c b ON a.k = b.k AND a.g <= b.g
               GROUP BY 1, 2 ORDER BY ga, gb"""
        ).df()
        assert got[["ga", "gb", "dot"]].values.tolist() == want.values.tolist()


class TestDenseRankFallback:
    def test_join_path_equals_broadcast_path(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import global_dense_rank

        rng = np.random.default_rng(13)
        t = pa.table({
            "id": pa.array(np.arange(500)),
            "v": pa.array(rng.integers(0, 60, 500)),
        })
        ds = ray.data.from_arrow(t).repartition(4)
        bc = global_dense_rank(ds, "v").to_pandas().sort_values("id", ignore_index=True)
        # byte budget 0 forces the enumerate_sorted + hash-join route
        jn = (
            global_dense_rank(ds, "v", broadcast_byte_budget=0)
            .to_pandas().sort_values("id", ignore_index=True)
        )
        assert bc[["id", "v", "rank"]].values.tolist() == \
            jn[["id", "v", "rank"]].values.tolist()


class TestDDQuantiles:
    """DDSketch relative-error quantiles (sketches.dd_quantiles)."""

    def test_relative_error_bound_and_determinism(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.sketches import dd_quantiles

        rng = np.random.default_rng(1)
        n = 60_000
        t = pa.table({
            "g": pa.array(rng.integers(0, 2, n)),
            "v": pa.array(rng.lognormal(5, 2, n)),
        })
        got = (
            dd_quantiles(ray.data.from_arrow(t).repartition(7), "g", "v", alpha=0.01)
            .to_pandas().sort_values(["g", "q"], ignore_index=True)
        )
        df = t.to_pandas()
        for _, r in got.iterrows():
            true = df[df.g == r.g]["v"].quantile(r.q, interpolation="lower")
            # bucket-midpoint estimate: guaranteed within alpha (1%); allow 2%
            assert abs(r.value - true) / true < 0.02
        got2 = (
            dd_quantiles(ray.data.from_arrow(t).repartition(2), "g", "v", alpha=0.01)
            .to_pandas().sort_values(["g", "q"], ignore_index=True)
        )
        assert got.equals(got2)

    def test_nonpositive_values_report_zero(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.sketches import dd_quantiles

        t = pa.table({"g": pa.array([0] * 10), "v": pa.array([-1.0] * 6 + [0.0] * 4)})
        got = dd_quantiles(ray.data.from_arrow(t), "g", "v", qs=(0.5,))
        assert got.to_pandas()["value"].tolist() == [0.0]

    def test_alpha_validated(self):
        from cloudtile_ray.stages.sketches import dd_quantiles

        with pytest.raises(ValueError):
            dd_quantiles(None, "g", "v", alpha=0.5)


class TestFirstLastValues:
    def test_single_event_user_first_equals_last(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.events import first_last_values

        t = pa.table({
            "event_id": pa.array([0, 1, 2]),
            "user_id": pa.array([1, 2, 2]),
            "ts": pa.array(
                np.array([5, 9, 3], dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "value": pa.array([1.5, 2.0, 3.0]),
        })
        got = (
            first_last_values(ray.data.from_arrow(t))
            .to_pandas().sort_values("user_id", ignore_index=True)
        )
        # user 1: single event -> first == last; user 2: ts orders (3us, 9us)
        assert got.values.tolist() == [[1, 150, 150, 1], [2, 300, 200, 2]]


class TestCompetitionRank:
    def test_matches_duckdb_rank_both_paths(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.relational import global_dense_rank

        rng = np.random.default_rng(21)
        t = pa.table({
            "id": pa.array(np.arange(400)),
            "v": pa.array(rng.integers(0, 30, 400)),  # heavy ties
        })
        want = duckdb.sql(
            """SELECT id, v, CAST(rank() OVER (ORDER BY v) AS BIGINT) AS rank
               FROM t ORDER BY id"""
        ).df()
        ds = ray.data.from_arrow(t).repartition(5)
        for budget in (128 << 20, 0):  # broadcast path, then join fallback
            got = (
                global_dense_rank(ds, "v", method="rank",
                                  broadcast_byte_budget=budget)
                .to_pandas().sort_values("id", ignore_index=True)
            )
            assert got[["id", "v", "rank"]].values.tolist() == \
                want.values.tolist()

    def test_method_validated(self):
        from cloudtile_ray.stages.relational import global_dense_rank

        with pytest.raises(ValueError):
            global_dense_rank(None, "v", method="percent")


class TestRangeWindowSum:
    """Time-RANGE-frame moving sum (events.range_window_sum): value-based
    frame edges including equal-ts peers — vs the ROWS frame's index
    arithmetic."""

    def test_matches_duckdb_range_frame_with_peers(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.events import range_window_sum

        rng = np.random.default_rng(31)
        n = 500
        # coarse second grid => plenty of exact-ts peers within users
        t = pa.table({
            "event_id": pa.array(np.arange(n)),
            "user_id": pa.array(rng.integers(0, 12, n)),
            "ts": pa.array(
                (rng.integers(0, 120, n) * 1_000_000).astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
        })
        got = (
            range_window_sum(
                ray.data.from_arrow(t).repartition(6), width_us=30_000_000
            )
            .to_pandas()
            .sort_values(["user_id", "event_id"], ignore_index=True)
        )
        want = duckdb.sql(
            """WITH e AS (SELECT user_id, event_id, ts,
                                 CAST(round(value * 100) AS BIGINT) AS cents
                          FROM t)
               SELECT user_id, event_id,
                      CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts
                           RANGE BETWEEN INTERVAL 30 SECONDS PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS win_cents
               FROM e ORDER BY user_id, event_id"""
        ).df()
        assert got[["user_id", "event_id", "win_cents"]].values.tolist() == \
            want.values.tolist()

    def test_width_zero_sums_exact_ts_peers(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.events import range_window_sum

        t = pa.table({
            "event_id": pa.array([0, 1, 2]),
            "user_id": pa.array([5, 5, 5]),
            "ts": pa.array(
                np.array([10, 10, 30], dtype="datetime64[us]"),
                pa.timestamp("us"),
            ),
            "value": pa.array([1.0, 2.0, 3.0]),
        })
        got = (
            range_window_sum(ray.data.from_arrow(t), width_us=0)
            .to_pandas()
            .sort_values("event_id", ignore_index=True)
        )
        # the two ts=10 rows are RANGE peers: both frames hold both rows
        assert got["win_cents"].tolist() == [300, 300, 300]

    def test_width_validated(self):
        from cloudtile_ray.stages.events import range_window_sum

        with pytest.raises(ValueError):
            range_window_sum(None, width_us=-1)


class TestGlobalRankDist:
    """PERCENT_RANK + CUME_DIST (relational.global_rank_dist) — bit-exact
    IEEE quotients on both the broadcast and the enumerate+join path."""

    def test_matches_duckdb_both_paths(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.relational import global_rank_dist

        rng = np.random.default_rng(41)
        t = pa.table({
            "id": pa.array(np.arange(500)),
            "v": pa.array(rng.integers(0, 40, 500)),  # heavy ties
        })
        want = duckdb.sql(
            """SELECT id, v,
                      percent_rank() OVER (ORDER BY v) AS prank,
                      cume_dist() OVER (ORDER BY v) AS cume_dist
               FROM t ORDER BY id"""
        ).df()
        ds = ray.data.from_arrow(t).repartition(5)
        for budget in (128 << 20, 0):
            got = (
                global_rank_dist(ds, "v", broadcast_byte_budget=budget)
                .to_pandas().sort_values("id", ignore_index=True)
            )
            # bit-exact float comparison, not approx
            assert got["prank"].values.tolist() == want["prank"].values.tolist()
            assert got["cume_dist"].values.tolist() == \
                want["cume_dist"].values.tolist()

    def test_single_row_percent_rank_zero(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import global_rank_dist

        t = pa.table({"id": pa.array([1]), "v": pa.array([42])})
        got = global_rank_dist(ray.data.from_arrow(t), "v").to_pandas()
        assert got["prank"].tolist() == [0.0]
        assert got["cume_dist"].tolist() == [1.0]


class TestSourceJaccardQuery:
    """q_source_jaccard: repeated tokens (within a doc, across docs and
    across batches) must not inflate the DISTINCT-set intersection."""

    def test_duplicate_tokens_count_once(self, ray_session, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        import __ray_entry__ as entry

        docs = pa.table({
            "doc_id": pa.array(np.arange(6, dtype=np.int64)),
            "text": pa.array([
                "apple banana apple",   # src_a: {apple, banana}
                "banana cherry",        # src_a: {banana, cherry}
                "apple apple",          # src_b: {apple}
                "banana date",          # src_b: {banana, date}
                "cherry cherry cherry", # src_b: {cherry}
                "elderberry",           # src_b: {elderberry}
            ]),
            "lang": pa.array(["en"] * 6),
            "source": pa.array(["sa", "sa", "sb", "sb", "sb", "sb"]),
            "n_chars": pa.array([1] * 6, pa.int64()),
        })
        pq.write_table(docs, tmp_path / "documents.parquet")
        got = entry.q_source_jaccard(str(tmp_path)).to_pandas()
        # A={apple,banana,cherry} (3), B={apple,banana,cherry,date,elderberry} (5)
        # inter=3, union=5 -> 0.6
        assert got["src_a"].tolist() == ["sa"]
        assert got["n_inter"].tolist() == [3]
        assert got["jaccard"].tolist() == [3 / 5]


class TestNameClustersQuery:
    """q_name_clusters: e2e entity-resolution labels through the
    distributed CC operator on a fixture with two known clusters and one
    isolated name (which must be absent — no self-edge rows)."""

    def test_known_clusters(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        import __ray_entry__ as entry

        cust = pa.table({
            "c_custkey": pa.array([10, 11, 12, 13, 14], pa.int64()),
            "c_name": pa.array(["cat", "cut", "dog", "dot", "zebra"]),
            "c_nationkey": pa.array([0] * 5, pa.int32()),
            "c_acctbal": pa.array([0.0] * 5),
            "c_mktsegment": pa.array(["BUILDING"] * 5),
        })
        pq.write_table(cust, tmp_path / "customer.parquet")
        got = (
            entry.q_name_clusters(str(tmp_path))
            .to_pandas()
            .sort_values("c_name", ignore_index=True)
        )
        assert got["c_name"].tolist() == ["cat", "cut", "dog", "dot"]
        assert got["cluster_id"].tolist() == [10, 10, 12, 12]


class TestCustOrderDistQuery:
    """q_cust_order_dist: the zero-order bucket (LEFT-JOIN semantics) is
    synthesized from two scalars, never an outer join."""

    def test_zero_order_customers_counted(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        import __ray_entry__ as entry

        cust = pa.table({
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_name": pa.array(["a", "b", "c", "d"]),
            "c_nationkey": pa.array([0] * 4, pa.int32()),
            "c_acctbal": pa.array([0.0] * 4),
            "c_mktsegment": pa.array(["BUILDING"] * 4),
        })
        orders = pa.table({
            "o_orderkey": pa.array([100, 101, 102], pa.int64()),
            "o_custkey": pa.array([1, 1, 2], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 3),
            "o_totalprice": pa.array([1.0, 2.0, 3.0]),
            "o_orderdate": pa.array(
                np.array([0, 1, 2], dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * 3),
        })
        pq.write_table(cust, tmp_path / "customer.parquet")
        pq.write_table(orders, tmp_path / "orders.parquet")
        got = entry.q_cust_order_dist(str(tmp_path)).to_pandas()
        dist = dict(zip(got["n_orders"], got["n_custs"]))
        # custs 3 and 4 have no orders; cust 1 has 2; cust 2 has 1
        assert dist == {0: 2, 1: 1, 2: 1}


class TestTriangleCounts:
    """Distributed triangle counting (graph.triangle_counts)."""

    def test_known_graph_both_paths(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.graph import triangle_counts

        # K4 minus edge (1,4): triangles {1,2,3} and {2,3,4};
        # input has duplicates, reversed pairs and a self-loop to exercise
        # canonicalization
        t = pa.table({
            "a": pa.array([1, 2, 1, 3, 3, 4, 2, 2], pa.int64()),
            "b": pa.array([2, 1, 3, 2, 4, 2, 3, 2], pa.int64()),
        })
        want = {1: 1, 2: 2, 3: 2, 4: 1}
        ds = ray.data.from_arrow(t).repartition(3)
        for budget in (64 << 20, 0):  # broadcast orientation, join fallback
            got = (
                triangle_counts(ds, broadcast_byte_budget=budget)
                .to_pandas()
            )
            assert dict(zip(got["node"], got["n_tri"])) == want

    def test_matches_brute_force_random(self, ray_session):
        import itertools

        import ray.data

        from cloudtile_ray.stages.graph import triangle_counts

        rng = np.random.default_rng(53)
        n_nodes, n_edges = 40, 200
        a = rng.integers(0, n_nodes, n_edges)
        b = rng.integers(0, n_nodes, n_edges)
        es = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
        adj = {i: set() for i in range(n_nodes)}
        for u, v in es:
            adj[u].add(v)
            adj[v].add(u)
        want: dict[int, int] = {}
        for x, y, z in itertools.combinations(range(n_nodes), 3):
            if y in adj[x] and z in adj[x] and z in adj[y]:
                for q in (x, y, z):
                    want[q] = want.get(q, 0) + 1
        t = pa.table({
            "a": pa.array(a.astype(np.int64)),
            "b": pa.array(b.astype(np.int64)),
        })
        got = (
            triangle_counts(ray.data.from_arrow(t).repartition(4))
            .to_pandas()
        )
        assert dict(zip(got["node"], got["n_tri"])) == want

    def test_triangle_free_graph_empty(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.graph import triangle_counts

        # a path graph has no triangles
        t = pa.table({
            "a": pa.array([0, 1, 2, 3], pa.int64()),
            "b": pa.array([1, 2, 3, 4], pa.int64()),
        })
        got = triangle_counts(ray.data.from_arrow(t)).to_pandas()
        assert len(got) == 0


class TestExactQuantilesCont:
    """Interpolated PERCENTILE_CONT selection (quantiles.exact_quantiles_cont)."""

    def test_matches_duckdb_bit_exact(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.quantiles import exact_quantiles_cont

        rng = np.random.default_rng(61)
        t = pa.table({"v": pa.array(rng.integers(-500, 10_000, 777))})
        got = exact_quantiles_cont(
            ray.data.from_arrow(t).repartition(5),
            "v",
            {"p10": 0.1, "p50": 0.5, "p95": 0.95},
            collect_threshold=16,  # force several refinement passes
        )
        want = duckdb.sql(
            """SELECT quantile_cont(v, 0.1) AS p10,
                      quantile_cont(v, 0.5) AS p50,
                      quantile_cont(v, 0.95) AS p95 FROM t"""
        ).df()
        for c in ("p10", "p50", "p95"):
            assert got.column(c).to_pylist() == [want[c][0]]  # bit-exact

    def test_integer_rank_no_interpolation(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.quantiles import exact_quantiles_cont

        # n=5: q=0.5 -> h=2.0 exactly, no interpolation
        t = pa.table({"v": pa.array([10, 20, 30, 40, 50])})
        got = exact_quantiles_cont(ray.data.from_arrow(t), "v", {"p50": 0.5})
        assert got.column("p50").to_pylist() == [30.0]


class TestBroadcastLookup:
    """Map-side dimension attach (relational.broadcast_lookup)."""

    def _fixtures(self):
        big = pa.table({
            "k": pa.array([1, 2, 3, 2, 9], pa.int64()),
            "x": pa.array([10, 20, 30, 40, 50], pa.int64()),
        })
        lut = pa.table({
            "key": pa.array([1, 2, 3, 4], pa.int64()),
            "name": pa.array(["a", "b", "c", "d"]),
            "w": pa.array([100, 200, 300, 400], pa.int64()),
        })
        return big, lut

    def test_broadcast_path_inner(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import broadcast_lookup

        big, lut = self._fixtures()
        got = (
            broadcast_lookup(
                ray.data.from_arrow(big).repartition(3),
                ray.data.from_arrow(lut),
                on=["k"],
                right_on=["key"],
            )
            .to_pandas()
            .sort_values(["k", "x"], ignore_index=True)
        )
        # k=9 dropped (inner); lookup key column not duplicated
        assert list(got.columns) == ["k", "x", "name", "w"]
        assert got["k"].tolist() == [1, 2, 2, 3]
        assert got["name"].tolist() == ["a", "b", "b", "c"]
        assert got["w"].tolist() == [100, 200, 200, 300]

    def test_left_semantics_keeps_missing(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import broadcast_lookup

        big, lut = self._fixtures()
        got = (
            broadcast_lookup(
                ray.data.from_arrow(big),
                ray.data.from_arrow(lut),
                on=["k"],
                right_on=["key"],
                drop_missing=False,
            )
            .to_pandas()
            .sort_values(["k", "x"], ignore_index=True)
        )
        assert len(got) == 5
        assert got[got["k"] == 9]["name"].isna().all()

    def test_fallback_matches_broadcast(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import broadcast_lookup

        big, lut = self._fixtures()
        fast = (
            broadcast_lookup(
                ray.data.from_arrow(big),
                ray.data.from_arrow(lut),
                on=["k"],
                right_on=["key"],
            )
            .to_pandas()
        )
        slow = (
            broadcast_lookup(
                ray.data.from_arrow(big),
                ray.data.from_arrow(lut),
                on=["k"],
                right_on=["key"],
                byte_budget=0,  # force the hash_join fallback
            )
            .to_pandas()
        )
        key = ["k", "x"]
        fast = fast.sort_values(key, ignore_index=True)[sorted(fast.columns)]
        slow = slow.sort_values(key, ignore_index=True)[sorted(slow.columns)]
        assert fast.equals(slow)

    def test_semi_never_duplicates_probe_rows(self, ray_session):
        """semi=True is a pure existence filter: duplicate lookup keys
        must not fan out probe rows on the broadcast path OR the
        hash_join fallback, and no lookup columns are appended."""
        import ray.data

        from cloudtile_ray.stages.relational import broadcast_lookup

        big, _ = self._fixtures()
        dup_keys = pa.table({
            "key": pa.array([2, 2, 3, 3, 3, 7], pa.int64()),
            "junk": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        })
        for budget in (256 << 20, 0):  # broadcast path, then fallback
            got = (
                broadcast_lookup(
                    ray.data.from_arrow(big).repartition(3),
                    ray.data.from_arrow(dup_keys),
                    on=["k"],
                    right_on=["key"],
                    byte_budget=budget,
                    semi=True,
                )
                .to_pandas()
                .sort_values(["k", "x"], ignore_index=True)
            )
            assert list(got.columns) == ["k", "x"], budget
            assert got["k"].tolist() == [2, 2, 3], budget
            assert got["x"].tolist() == [20, 40, 30], budget


class TestParetoFrontier:
    """2-D skyline (relational.pareto_frontier)."""

    def test_matches_brute_force(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import pareto_frontier

        rng = np.random.default_rng(71)
        n = 500
        size = rng.integers(1, 40, n)
        price = rng.integers(1, 1000, n)
        # plant an exact duplicate pair on the frontier: neither dominates
        size[0] = size[1] = 50
        price[0] = price[1] = 1
        t = pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "size": pa.array(size.astype(np.int64)),
            "price": pa.array(price.astype(np.int64)),
        })
        want = set()
        for i in range(n):
            dominated = np.any(
                (size >= size[i]) & (price <= price[i])
                & ((size > size[i]) | (price < price[i]))
            )
            if not dominated:
                want.add(i)
        got = pareto_frontier(
            ray.data.from_arrow(t).repartition(7),
            max_cols=["size"],
            min_cols=["price"],
        ).to_pandas()
        assert set(got["id"]) == want
        assert 0 in want and 1 in want  # both duplicate copies survive

    def test_single_block_equals_many_blocks(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import pareto_frontier

        rng = np.random.default_rng(73)
        t = pa.table({
            "id": pa.array(np.arange(300, dtype=np.int64)),
            "a": pa.array(rng.integers(0, 50, 300).astype(np.int64)),
            "b": pa.array(rng.integers(0, 50, 300).astype(np.int64)),
        })
        one = pareto_frontier(
            ray.data.from_arrow(t), max_cols=["a"], min_cols=["b"]
        ).to_pandas()
        many = pareto_frontier(
            ray.data.from_arrow(t).repartition(11), max_cols=["a"], min_cols=["b"]
        ).to_pandas()
        assert set(one["id"]) == set(many["id"])


class TestBfsHops:
    """Capped multi-source BFS (graph.bfs_hops)."""

    @staticmethod
    def _brute(edges, seeds, cap):
        from collections import deque

        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        dist = {s: 0 for s in seeds}
        dq = deque(seeds)
        while dq:
            u = dq.popleft()
            if dist[u] >= cap:
                continue
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        return dist

    def test_matches_brute_force(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.graph import bfs_hops

        rng = np.random.default_rng(83)
        n_nodes, n_edges = 200, 350
        a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        es = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
        seeds = [0, 7, 42]
        for cap in (0, 2, 6):
            want = self._brute(es, seeds, cap)
            got = bfs_hops(
                ray.data.from_arrow(
                    pa.table({"a": pa.array(a), "b": pa.array(b)})
                ).repartition(4),
                ray.data.from_arrow(
                    pa.table({"node": pa.array(seeds, pa.int64())})
                ),
                max_hops=cap,
            ).to_pandas()
            assert dict(zip(got["node"], got["dist"])) == want, cap

    def test_join_fallback_matches(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.graph import bfs_hops

        rng = np.random.default_rng(89)
        a = rng.integers(0, 60, 120).astype(np.int64)
        b = rng.integers(0, 60, 120).astype(np.int64)
        t = pa.table({"a": pa.array(a), "b": pa.array(b)})
        seeds = ray.data.from_arrow(pa.table({"node": pa.array([3], pa.int64())}))
        fast = bfs_hops(
            ray.data.from_arrow(t), seeds, max_hops=4
        ).to_pandas()
        slow = bfs_hops(
            ray.data.from_arrow(t), seeds, max_hops=4, frontier_byte_budget=0
        ).to_pandas()
        assert dict(zip(fast["node"], fast["dist"])) == dict(
            zip(slow["node"], slow["dist"])
        )


class TestPhraseSearch:
    """Positional inverted-index phrase match (text.phrase_search)."""

    def test_matches_python_token_scan(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.text import phrase_search

        docs = [
            "the quick brown fox",          # no
            "table table table scan",       # 'table table' x2 overlapping
            "fast table table slow",        # yes
            "table slow table",             # no (not consecutive)
            "table",                        # no (only one token)
            "x table tabletop table table", # yes (boundary-aware)
        ]
        t = pa.table({
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs),
        })
        phrase = ["table", "table"]
        want = {
            i for i, d in enumerate(docs)
            if any(
                d.split()[j : j + 2] == phrase
                for j in range(len(d.split()) - 1)
            )
        }
        got = phrase_search(
            ray.data.from_arrow(t).repartition(3), phrase
        ).to_pandas()
        assert set(got["doc_id"]) == want == {1, 2, 5}

    def test_three_term_phrase(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.text import phrase_search

        rng = np.random.default_rng(97)
        vocab = ["a", "b", "c", "d"]
        docs = [
            " ".join(rng.choice(vocab, rng.integers(3, 30)))
            for _ in range(300)
        ]
        t = pa.table({
            "doc_id": pa.array(np.arange(300, dtype=np.int64)),
            "text": pa.array(docs),
        })
        phrase = ["a", "b", "a"]
        want = {
            i for i, d in enumerate(docs)
            if any(
                d.split()[j : j + 3] == phrase
                for j in range(len(d.split()) - 2)
            )
        }
        got = phrase_search(
            ray.data.from_arrow(t).repartition(5), phrase
        ).to_pandas()
        assert set(got["doc_id"]) == want


class TestGroupedQuantilesCont:
    """Per-group PERCENTILE_CONT (quantiles.grouped_quantiles_cont)."""

    def test_matches_duckdb_bit_exact(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.quantiles import grouped_quantiles_cont

        rng = np.random.default_rng(101)
        n = 900
        t = pa.table({
            "g": pa.array(rng.choice(["x", "y", "z"], n)),
            "v": pa.array(rng.integers(-100, 5000, n)),
        })
        got = grouped_quantiles_cont(
            ray.data.from_arrow(t).repartition(6),
            "g",
            "v",
            {"p10": 0.1, "p50": 0.5, "p95": 0.95},
            collect_threshold=16,
        ).to_pandas()
        want = duckdb.sql(
            """SELECT g, quantile_cont(v, 0.1) AS p10,
                      quantile_cont(v, 0.5) AS p50,
                      quantile_cont(v, 0.95) AS p95
               FROM t GROUP BY g ORDER BY g"""
        ).df()
        got = got.sort_values("g", ignore_index=True)
        for c in ("p10", "p50", "p95"):
            assert got[c].tolist() == want[c].tolist()  # bit-exact


class TestPagerank:
    """Power-iteration PageRank (graph.pagerank)."""

    def test_matches_dense_reference(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.graph import pagerank

        rng = np.random.default_rng(103)
        n_nodes, n_edges = 40, 120
        a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        # dense reference on the same symmetrized multigraph
        nodes = np.unique(np.concatenate([a, b]))
        idx = {int(v): i for i, v in enumerate(nodes)}
        m = len(nodes)
        A = np.zeros((m, m))
        for x, y in zip(a, b):
            A[idx[int(y)], idx[int(x)]] += 1.0
            A[idx[int(x)], idx[int(y)]] += 1.0
        deg = A.sum(axis=0)
        P = A / deg
        r = np.full(m, 1.0 / m)
        d = 0.85
        for _ in range(10):
            r = (1 - d) / m + d * (P @ r)
        got = pagerank(
            ray.data.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)}))
            .repartition(4),
            n_iters=10,
        ).to_pandas()
        got_r = dict(zip(got["node"], got["rank"]))
        assert len(got_r) == m
        for v in nodes:
            assert abs(got_r[int(v)] - r[idx[int(v)]]) < 1e-9
        assert abs(sum(got_r.values()) - 1.0) < 1e-9


class TestExactQuantilesFloat:
    """Float64 quantile_disc via the bit-pattern order isomorphism."""

    def test_matches_duckdb_bit_exact(self, ray_session):
        import duckdb
        import ray.data

        from cloudtile_ray.stages.quantiles import exact_quantiles_float

        rng = np.random.default_rng(107)
        v = np.concatenate([
            rng.standard_normal(500) * 1e4,
            rng.standard_normal(300) * 1e-7,
            -rng.exponential(5.0, 200),
        ])
        t = pa.table({"v": pa.array(v)})
        got = exact_quantiles_float(
            ray.data.from_arrow(t).repartition(5),
            "v",
            {"p01": 0.01, "p50": 0.5, "p99": 0.99},
            collect_threshold=16,  # force several refinement passes
        )
        want = duckdb.sql(
            """SELECT quantile_disc(v, 0.01) AS p01,
                      quantile_disc(v, 0.5) AS p50,
                      quantile_disc(v, 0.99) AS p99 FROM t"""
        ).df()
        for c in ("p01", "p50", "p99"):
            assert got.column(c).to_pylist() == [want[c][0]]  # bit-exact

    def test_nan_and_null_dropped(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.quantiles import exact_quantiles_float

        t = pa.table({"v": pa.array([3.0, float("nan"), 1.0, None, 2.0])})
        got = exact_quantiles_float(ray.data.from_arrow(t), "v", {"p50": 0.5})
        assert got.column("p50").to_pylist() == [2.0]


class TestAsofForward:
    """Forward as-of join (events.asof_join_forward)."""

    def test_matches_python_reference(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.events import asof_join_forward

        rng = np.random.default_rng(109)
        n = 400
        base = np.datetime64("2024-01-01T00:00:00", "us")
        ts = base + rng.integers(0, 3_600_000_000, n).astype("timedelta64[us]")
        t = pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, 25, n).astype(np.int64)),
            "event_type": pa.array(rng.choice(["click", "purchase", "view"], n)),
            "value": pa.array(rng.random(n)),
        })
        got = asof_join_forward(
            ray.data.from_arrow(t).repartition(4), "click", "purchase"
        ).to_pandas()
        # python reference
        rows = list(zip(
            t.column("user_id").to_pylist(),
            t.column("ts").to_pylist(),
            t.column("event_id").to_pylist(),
            t.column("event_type").to_pylist(),
        ))
        want = {}
        for u, tts, eid, et in rows:
            if et != "click":
                continue
            cands = [
                (rt, rid) for (ru, rt, rid, ret) in rows
                if ru == u and ret == "purchase"
                and (rt, rid) > (tts, eid)
            ]
            if cands:
                rt, rid = min(cands)
                want[eid] = (rid, int((rt - tts).total_seconds() * 1e6))
            else:
                want[eid] = (-1, -1)
        got_map = {
            int(r.left_id): (int(r.right_id), int(r.lead_us))
            for r in got.itertuples()
        }
        assert got_map == want


class TestBandSelfJoin:
    """Numeric band (range) self-join (relational.band_self_join)."""

    def test_matches_brute_force(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import band_self_join

        rng = np.random.default_rng(113)
        n = 300
        v = rng.integers(0, 200, n).astype(np.int64)  # heavy value ties
        ids = np.arange(n, dtype=np.int64)
        t = pa.table({"id": pa.array(ids), "v": pa.array(v)})
        for eps in (0, 3, 10):
            want = set()
            for i in range(n):
                for j in range(i + 1, n):
                    if abs(int(v[i]) - int(v[j])) <= eps:
                        want.add((min(i, j), max(i, j)))
            got = band_self_join(
                ray.data.from_arrow(t).repartition(5), "id", "v", eps
            ).to_pandas()
            pairs = set(zip(got["a"], got["b"]))
            assert len(got) == len(pairs), f"dup pairs at eps={eps}"
            assert pairs == want, eps
            assert (got["diff"].abs() <= eps).all()

    def test_few_buckets_forces_adjacent_band_collisions(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import band_self_join

        rng = np.random.default_rng(127)
        v = rng.integers(0, 50, 150).astype(np.int64)
        ids = np.arange(150, dtype=np.int64)
        t = pa.table({"id": pa.array(ids), "v": pa.array(v)})
        want = {
            (i, j)
            for i in range(150)
            for j in range(i + 1, 150)
            if abs(int(v[i]) - int(v[j])) <= 4
        }
        got = band_self_join(
            ray.data.from_arrow(t), "id", "v", 4, num_buckets_hint=2
        ).to_pandas()
        pairs = set(zip(got["a"], got["b"]))
        assert len(got) == len(pairs)
        assert pairs == want


class TestGroupedParetoFrontier:
    """Per-group skyline (pareto_frontier with group_col)."""

    def test_matches_brute_force_per_group(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.relational import pareto_frontier

        rng = np.random.default_rng(131)
        n = 400
        g = rng.choice(["b1", "b2", "b3"], n)
        size = rng.integers(1, 30, n).astype(np.int64)
        price = rng.integers(1, 400, n).astype(np.int64)
        t = pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "brand": pa.array(g),
            "size": pa.array(size),
            "price": pa.array(price),
        })
        want = set()
        for i in range(n):
            dom = np.any(
                (g == g[i]) & (size >= size[i]) & (price <= price[i])
                & ((size > size[i]) | (price < price[i]))
            )
            if not dom:
                want.add(i)
        got = pareto_frontier(
            ray.data.from_arrow(t).repartition(7),
            max_cols=["size"],
            min_cols=["price"],
            group_col="brand",
        ).to_pandas()
        assert set(got["id"]) == want


def test_bigram_partials_buffer_math():
    import pyarrow as pa

    from cloudtile_ray.stages.text import _bigram_partials

    t = pa.table({"word": ["hello", "ab", "xy"], "n": [3, 2, 5]})
    out = _bigram_partials(t)
    d = dict(zip(out.column("pair_id").to_pylist(), out.column("cnt").to_pylist()))

    def pid(s):
        return ord(s[0]) * 256 + ord(s[1])

    assert d[pid("he")] == 3 and d[pid("el")] == 3
    assert d[pid("ll")] == 3 and d[pid("lo")] == 3
    assert d[pid("ab")] == 2 and d[pid("xy")] == 5
    assert sum(d.values()) == 4 * 3 + 2 + 5

    # a sliced (non-zero offset) array must read the right buffer window
    arr = pa.array(["zz", "abc"]).slice(1, 1)
    out2 = _bigram_partials(pa.table({"word": arr, "n": pa.array([7])}))
    d2 = dict(zip(out2.column("pair_id").to_pylist(), out2.column("cnt").to_pylist()))
    assert d2 == {pid("ab"): 7, pid("bc"): 7}

    # empty input keeps the schema
    empty = _bigram_partials(pa.table({"word": pa.array([], type=pa.string()),
                                       "n": pa.array([], type=pa.int64())}))
    assert empty.num_rows == 0 and empty.column_names == ["pair_id", "cnt"]


def test_box_overlap_pairs_brute_force(ray_session):
    """Grid-cell plan == quadratic truth, including boxes that straddle
    cell borders and pairs co-resident in several cells (the corner-cell
    ownership rule must emit each exactly once)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from cloudtile_ray.stages.join import box_overlap_pairs

    rng = np.random.default_rng(7)
    n = 120
    # spread across ~6x6 cells of 100 so many boxes straddle borders;
    # include negatives to exercise floor-division cells
    w = rng.integers(-300, 300, n)
    s = rng.integers(-300, 300, n)
    e = w + rng.integers(0, 99, n)
    no = s + rng.integers(0, 99, n)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "west": pa.array(w),
            "south": pa.array(s),
            "east": pa.array(e),
            "north": pa.array(no),
        }
    )
    got = (
        box_overlap_pairs(ray.data.from_arrow(t).repartition(5))
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    want = {}
    for i in range(n):
        for j in range(i + 1, n):
            ow, oe = max(w[i], w[j]), min(e[i], e[j])
            os_, on = max(s[i], s[j]), min(no[i], no[j])
            if ow <= oe and os_ <= on:
                want[(i, j)] = (oe - ow) * (on - os_)
    got_pairs = {
        (a, b): ar
        for a, b, ar in zip(got["doc_a"], got["doc_b"], got["ov_area"])
    }
    assert got_pairs == want
    # duplicates would betray broken corner ownership
    assert len(got) == len(got_pairs)


def test_box_overlap_pairs_rejects_oversized(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray

    from cloudtile_ray.stages.join import box_overlap_pairs

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "west": pa.array([0, 10], type=pa.int64()),
            "south": pa.array([0, 10], type=pa.int64()),
            "east": pa.array([150, 20], type=pa.int64()),  # wider than cell
            "north": pa.array([5, 20], type=pa.int64()),
        }
    )
    with pytest.raises(Exception, match="cell_mi"):
        box_overlap_pairs(ray.data.from_arrow(t)).materialize()


def test_kcore_peel_brute_force(ray_session):
    """3-round 2-core peel == the same peel computed densely, on a random
    sparse graph; includes a chain (fully peeled) and a clique (kept)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from cloudtile_ray.stages.graph import kcore_peel

    rng = np.random.default_rng(3)
    n = 60
    a = rng.integers(0, n, 150)
    b = rng.integers(0, n, 150)
    # chain 100-101-102-103 (degree-1 ends peel it entirely)
    # clique 200..204 (every degree 4: survives any number of rounds)
    extra_a = [100, 101, 102] + [i for i in range(200, 205) for j in range(i + 1, 205)]
    extra_b = [101, 102, 103] + [j for i in range(200, 205) for j in range(i + 1, 205)]
    a = np.concatenate([a, np.array(extra_a)])
    b = np.concatenate([b, np.array(extra_b)])
    keep = a != b
    edges = {tuple(sorted(p)) for p in zip(a[keep].tolist(), b[keep].tolist())}

    k, rounds = 2, 3
    es = set(edges)
    for _ in range(rounds):
        deg = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        alive = {u for u, d in deg.items() if d >= k}
        es = {(u, v) for u, v in es if u in alive and v in alive}
    want = {}
    for u, v in es:
        want[u] = want.get(u, 0) + 1
        want[v] = want.get(v, 0) + 1

    ea, eb = zip(*sorted(edges))
    ds = ray.data.from_arrow(
        pa.table({"a": pa.array(ea, pa.int64()), "b": pa.array(eb, pa.int64())})
    ).repartition(4)
    got = kcore_peel(ds, k=k, rounds=rounds).to_pandas()
    got_map = dict(zip(got["n"], got["deg"]))
    assert got_map == want
    assert 103 not in got_map and 200 in got_map


def test_radius_pairs_brute_force(ray_session):
    """Ghost-cell plan == quadratic truth; exactly-once emission across
    cell borders (points straddling cells at distance == radius)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from cloudtile_ray.stages.join import radius_pairs

    rng = np.random.default_rng(11)
    n = 150
    x = rng.integers(-120, 120, n)
    y = rng.integers(-120, 120, n)
    # boundary-exact pair: distance exactly == radius across a cell line
    x = np.concatenate([x, [0, 30]])
    y = np.concatenate([y, [50, 50]])
    ids = np.arange(len(x), dtype=np.int64)
    t = pa.table(
        {"doc_id": pa.array(ids), "lon_mi": pa.array(x), "lat_mi": pa.array(y)}
    )
    r = 30
    got = radius_pairs(ray.data.from_arrow(t).repartition(5), radius=r).to_pandas()
    got_pairs = {
        (a, b): d for a, b, d in zip(got["doc_a"], got["doc_b"], got["d2"])
    }
    want = {}
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            d2 = int((x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2)
            if d2 <= r * r:
                want[(i, j)] = d2
    assert got_pairs == want
    assert len(got) == len(got_pairs)  # no duplicate emissions
    assert (n, n + 1) in got_pairs and got_pairs[(n, n + 1)] == r * r


def test_cms_sketch_bounds_and_merge(ray_session):
    """CMS point estimates are one-sided (est >= true), within the
    epsilon bound for a comfortable width, identical across block splits
    (merge == element-wise add), and deterministic across runs."""
    import numpy as np
    import pyarrow as pa
    import ray

    from cloudtile_ray.stages.sketches import cms_build, cms_query

    rng = np.random.default_rng(5)
    # zipf-ish key stream: key i appears ~ n/(i+1) times
    keys = np.repeat(
        [f"k{i}" for i in range(200)], (4000 / np.arange(1, 201)).astype(int)
    )
    rng.shuffle(keys)
    t = pa.table({"key": pa.array(keys.astype(object), pa.string())})
    true = {f"k{i}": int(4000 // (i + 1)) for i in range(200)}
    n_total = len(keys)

    depth, width = 4, 1 << 12
    s1 = cms_build(ray.data.from_arrow(t).repartition(7), "key", None, depth, width)
    s2 = cms_build(ray.data.from_arrow(t).repartition(2), "key", None, depth, width)
    assert (s1 == s2).all()  # partitioning-invariant (mergeable)
    assert s1.sum() == n_total * depth

    probe = pa.array([f"k{i}" for i in range(200)])
    est = cms_query(s1, probe)
    tr = np.array([true[f"k{i}"] for i in range(200)])
    assert (est >= tr).all()  # never undercounts
    # standard bound: overcount <= e*N/width whp; allow 2x slack
    assert (est - tr).max() <= 2 * np.e * n_total / width

    # weighted build == unweighted on the expanded stream
    import pyarrow.compute as pc

    vc = pc.value_counts(t.column("key").combine_chunks())
    wt = pa.table(
        {"key": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
    )
    s3 = cms_build(ray.data.from_arrow(wt).repartition(3), "key", "n", depth, width)
    assert (s3 == s1).all()


def test_ring_double_areas():
    """Shoelace double areas: open + closed rings, odd double-area,
    empty ring, degree->milli snapping, and slice-offset safety."""
    import numpy as np
    import pyarrow as pa

    from cloudtile_ray.stages.polygons import ring_double_areas_mi2

    lon = pa.array(
        [[0, 2, 2, 0], [0, 1, 0], [0, 1, 0], [], [0, 2, 2, 0, 0]],
        type=pa.list_(pa.float64()),
    )
    lat = pa.array(
        [[0, 0, 2, 2], [0, 0, 1], [0, 2, 0], [], [0, 0, 2, 2, 0]],
        type=pa.list_(pa.float64()),
    )
    got = ring_double_areas_mi2(lon, lat, scale=1)
    # square 2x2 -> 2A=8; triangle -> 2A=1 (odd!); degenerate -> 0;
    # empty -> 0; explicitly closed square -> same 8
    assert got.tolist() == [8, 1, 0, 0, 8]

    # degrees scale to the milli lattice: 0.002 deg square -> 2A = 8 mi^2
    lond = pa.array([[0.0, 0.002, 0.002, 0.0]], type=pa.list_(pa.float64()))
    latd = pa.array([[0.0, 0.0, 0.002, 0.002]], type=pa.list_(pa.float64()))
    assert ring_double_areas_mi2(lond, latd).tolist() == [8]


def test_bigram_familiarity_cross_partition(ray_session):
    """Familiarity = Σ doc-bigram count × corpus count, with bigrams never
    crossing document boundaries and the model built across partitions."""
    import pyarrow as pa
    import ray

    from cloudtile_ray.stages.text import bigram_familiarity

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a b a b",   # bigrams: (a b)x2, (b a)x1
                    "a b",       # (a b)x1
                    "c",         # no bigram -> absent from output
                    "b a",       # (b a)x1
                ]
            ),
        }
    )
    # corpus counts: (a b)=3, (b a)=2
    got = bigram_familiarity(
        ray.data.from_arrow(docs).repartition(4)
    ).to_pandas().set_index("doc_id")
    assert got.loc[0, "n_bigrams"] == 3 and got.loc[0, "familiarity"] == 2 * 3 + 1 * 2
    assert got.loc[1, "n_bigrams"] == 1 and got.loc[1, "familiarity"] == 3
    assert got.loc[3, "n_bigrams"] == 1 and got.loc[3, "familiarity"] == 2
    assert 2 not in got.index


def test_bigram_pmi_cross_partition(ray_session):
    """Lift scores must be partition-independent: the unigram/bigram
    partials fold across batches, and a doc never splits, so 1 block
    and 5 blocks give identical top-k."""
    import ray

    from cloudtile_ray.stages.text import bigram_pmi

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 9)).tolist())
        for _ in range(200)
    ]
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(texts)})
    one = bigram_pmi(ray.data.from_arrow(t), k=10, min_count=2).to_pandas()
    many = bigram_pmi(
        ray.data.from_arrow(t).repartition(5), k=10, min_count=2
    ).to_pandas()
    assert one.values.tolist() == many.values.tolist()
    # brute-force check of one row
    toks = [s.split(" ") for s in texts]
    flat = [w for d in toks for w in d]
    total = len(flat)
    from collections import Counter
    uni = Counter(flat)
    big = Counter((d[i], d[i + 1]) for d in toks for i in range(len(d) - 1))
    r = one.iloc[0]
    want = float(np.float64(big[(r.tk1, r.tk2)] * total)
                 / np.float64(uni[r.tk1] * uni[r.tk2]))
    assert r.nxy == big[(r.tk1, r.tk2)]
    assert r.lift == want


def test_zonal_box_overlap_brute_force(ray_session):
    import ray

    from cloudtile_ray.stages.join import zonal_box_overlap

    rng = np.random.default_rng(5)
    n = 300
    w = rng.integers(-1000, 900, n)
    s = rng.integers(-1000, 900, n)
    e = w + rng.integers(0, 300, n)
    nn = s + rng.integers(0, 300, n)
    t = pa.table({"w_mi": pa.array(w), "s_mi": pa.array(s),
                  "e_mi": pa.array(e), "n_mi": pa.array(nn)})
    boxes = np.array([[0, -500, -500, 0, 0],
                      [1, -2000, -2000, 2000, 2000],
                      [2, 5000, 5000, 6000, 6000]], dtype=np.int64)
    got = (
        zonal_box_overlap(ray.data.from_arrow(t).repartition(4), boxes)
        .to_pandas().sort_values("zone_id").reset_index(drop=True)
    )
    for _, row in got.iterrows():
        zid = int(row.zone_id)
        zw, zs, ze, zn = boxes[zid, 1:]
        dx = np.clip(np.minimum(e, ze) - np.maximum(w, zw), 0, None)
        dy = np.clip(np.minimum(nn, zn) - np.maximum(s, zs), 0, None)
        assert row.overlap_mi2 == int((dx * dy).sum()), zid
        assert row.n_overlaps == int(((dx * dy) > 0).sum()), zid
    assert got.loc[2, "overlap_mi2"] == 0  # disjoint zone still reported


def test_path_lengths_deg_boundaries():
    from cloudtile_ray.stages.lines import path_lengths_deg

    lon = pa.array([[0.0, 3.0, 3.0], [0.0, 1.0], [], [5.0], [1.0, 4.0]],
                   pa.list_(pa.float64()))
    lat = pa.array([[0.0, 4.0, 8.0], [0.0, 0.0], [], [5.0], [1.0, 5.0]],
                   pa.list_(pa.float64()))
    got = path_lengths_deg(lon, lat)
    assert got.tolist() == [9.0, 1.0, 0.0, 0.0, 5.0]
    # all-empty input
    empty = pa.array([[], []], pa.list_(pa.float64()))
    assert path_lengths_deg(empty, empty).tolist() == [0.0, 0.0]


def test_event_gaps_cross_partition(ray_session):
    import ray

    from cloudtile_ray.stages.events import event_gaps

    rng = np.random.default_rng(9)
    n = 400
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 25, n)),
            "ts_us": pa.array(rng.integers(0, 10_000, n)),
        }
    )
    got = (
        event_gaps(ray.data.from_arrow(t).repartition(6))
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    # brute-force with pandas
    df = t.to_pandas().sort_values(["user_id", "ts_us", "event_id"])
    df["gap_us"] = df.groupby("user_id")["ts_us"].diff()
    want = (
        df.dropna(subset=["gap_us"])
        .astype({"gap_us": "int64"})[["user_id", "event_id", "gap_us"]]
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert got[["user_id", "event_id", "gap_us"]].values.tolist() == want.values.tolist()


def test_nearest_box_brute_force(ray_session):
    import ray

    from cloudtile_ray.stages.join import nearest_box

    rng = np.random.default_rng(21)
    n = 500
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lon_mi": pa.array(rng.integers(-2000, 2000, n)),
            "lat_mi": pa.array(rng.integers(-2000, 2000, n)),
        }
    )
    # overlapping boxes + a tie pair (1 and 2 identical) to pin tie-break
    boxes = np.array(
        [
            [2, -500, -500, 500, 500],
            [1, -500, -500, 500, 500],
            [0, 1000, 1000, 1500, 1500],
        ],
        dtype=np.int64,
    )
    got = (
        nearest_box(ray.data.from_arrow(t).repartition(3), boxes)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    x = t.column("lon_mi").to_numpy()
    y = t.column("lat_mi").to_numpy()
    srt = boxes[np.argsort(boxes[:, 0])]
    for i in range(n):
        d2s = []
        for zid, w, s, e, nn in srt:
            dx = max(w - x[i], x[i] - e, 0)
            dy = max(s - y[i], y[i] - nn, 0)
            d2s.append((dx * dx + dy * dy, zid))
        best = min(d2s)
        assert got.loc[i, "d2"] == best[0], i
        assert got.loc[i, "zone_id"] == best[1], i
    # inside the duplicate boxes (zones 1 and 2) -> lowest id (1) wins
    dup = got[(np.abs(x) <= 500) & (np.abs(y) <= 500)]
    assert len(dup) and (dup.zone_id == 1).all() and (dup.d2 == 0).all()


def test_running_max_exclusive_cross_partition(ray_session):
    import ray

    from cloudtile_ray.stages.relational import running_max_exclusive

    rng = np.random.default_rng(13)
    n = 1000
    t = pa.table(
        {
            "k": pa.array(rng.permutation(n).astype(np.int64)),
            "v": pa.array(rng.integers(-500, 500, n)),
        }
    )
    got = (
        running_max_exclusive(
            ray.data.from_arrow(t).repartition(7), ["k"], "v", out_col="mp"
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    df = t.to_pandas().sort_values("k").reset_index(drop=True)
    want = np.empty(n, dtype=np.int64)
    want[0] = -(2**63)
    np.maximum.accumulate(df["v"].values[:-1], out=want[1:])
    want[1:] = np.maximum(want[1:], -(2**63))
    assert got["mp"].values.tolist() == want.tolist()


def test_burst_scores_brute_force(ray_session):
    import ray

    from cloudtile_ray.stages.events import burst_scores

    rng = np.random.default_rng(31)
    n = 600
    t = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 20, n)),
            "ts_us": pa.array(rng.integers(0, 5000, n)),  # dense ts with ties
        }
    )
    W = 100
    got = (
        burst_scores(ray.data.from_arrow(t).repartition(5), window_us=W)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    df = t.to_pandas()
    for _, row in got.iterrows():
        ts = np.sort(df[df.user_id == row.user_id]["ts_us"].values)
        want = max(
            int(((ts >= a) & (ts <= a + W - 1)).sum()) for a in ts
        )
        assert row.burst == want, row.user_id


def test_grouped_rank_dist_both_paths(ray_session):
    import ray

    from cloudtile_ray.stages.relational import grouped_rank_dist

    rng = np.random.default_rng(41)
    n = 800
    t = pa.table(
        {
            "rid": pa.array(np.arange(n, dtype=np.int64)),
            "g": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
            "v": pa.array(rng.integers(0, 50, n)),  # heavy ties
        }
    )
    df = t.to_pandas()
    want = df.copy()
    want["prank"] = df.groupby("g")["v"].rank(method="min").sub(1) / (
        df.groupby("g")["v"].transform("size") - 1
    )
    want["cume_dist"] = df.groupby("g")["v"].rank(method="max") / df.groupby("g")[
        "v"
    ].transform("size")
    for budget in (128 << 20, 1):  # broadcast path, then join path
        got = (
            grouped_rank_dist(
                ray.data.from_arrow(t).repartition(4), "g", "v",
                broadcast_byte_budget=budget,
            )
            .to_pandas().sort_values("rid").reset_index(drop=True)
        )
        assert got["prank"].values.tolist() == want["prank"].values.tolist(), budget
        assert (
            got["cume_dist"].values.tolist() == want["cume_dist"].values.tolist()
        ), budget


def test_max_drawdown_cross_partition(ray_session):
    import ray

    from cloudtile_ray.stages.relational import max_drawdown

    rng = np.random.default_rng(43)
    n = 5000
    t = pa.table(
        {
            "k": pa.array(rng.permutation(n).astype(np.int64)),
            "v": pa.array(rng.integers(-100, 100, n)),
        }
    )
    got = max_drawdown(ray.data.from_arrow(t).repartition(9), ["k"], "v")
    df = t.to_pandas().sort_values("k")
    x = np.cumsum(df["v"].values)
    want = int((np.maximum.accumulate(x) - x).max())
    assert got == want


def test_user_changepoints_brute_force(ray_session):
    import ray.data as rd

    from cloudtile_ray.stages.events import user_changepoints

    rng = np.random.default_rng(23)
    n = 4000
    uid = rng.integers(0, 70, n).astype(np.int64)
    ts = rng.integers(0, 10**9, n).astype(np.int64)
    eid = rng.permutation(n).astype(np.int64)
    val = rng.integers(-500, 2000, n).astype(np.int64)
    # a user with a single event (no valid split), and a constant-value
    # user (all diffs 0.0 -> k=1 by the tie-break)
    uid[0], uid[1:5] = 900, 901
    val[1:5] = 7
    t = pa.table({"user_id": uid, "ts_us": ts, "event_id": eid, "value_cents": val})
    res = (
        user_changepoints(rd.from_arrow(t))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert 900 not in set(res["user_id"])
    assert int(res.loc[res.user_id == 901, "k_split"].iloc[0]) == 1
    import pandas as pd

    df = pd.DataFrame({"u": uid, "ts": ts, "e": eid, "v": val}).sort_values(
        ["u", "ts", "e"]
    )
    for u, g in df.groupby("u"):
        v = g["v"].to_numpy()
        nn = len(v)
        if nn < 2:
            continue
        s = np.cumsum(v)
        best = None
        for k in range(1, nn):
            num = int(s[k - 1]) * (nn - k) - int(s[-1] - s[k - 1]) * k
            den = k * (nn - k)
            d = abs(num) / den
            if best is None or d > best[0]:
                best = (d, k, num, den)
        row = res[res.user_id == u].iloc[0]
        assert (int(row.k_split), int(row.n_events)) == (best[1], nn)
        assert (int(row.num), int(row.den)) == (best[2], best[3])
        assert float(row["diff"]) == best[0]


def test_snap_to_segments_brute_force(ray_session):
    import ray.data as rd

    from cloudtile_ray.stages.join import snap_to_segments

    rng = np.random.default_rng(31)
    NP_, NS, R = 1500, 300, 250
    px = rng.integers(-4000, 4000, NP_).astype(np.int64)
    py = rng.integers(-4000, 4000, NP_).astype(np.int64)
    ax = rng.integers(-4000, 4000, NS).astype(np.int64)
    ay = rng.integers(-4000, 4000, NS).astype(np.int64)
    bx = ax + rng.integers(-450, 450, NS)
    by = ay + rng.integers(-450, 450, NS)
    z = (ax == bx) & (ay == by)
    bx[z] += 1
    pts = rd.from_arrow(
        pa.table(
            {"doc_id": np.arange(NP_, dtype=np.int64), "lon_mi": px, "lat_mi": py}
        )
    )
    sgs = rd.from_arrow(
        pa.table(
            {
                "seg_id": np.arange(NS, dtype=np.int64),
                "ax_mi": ax, "ay_mi": ay, "bx_mi": bx, "by_mi": by,
            }
        )
    )
    res = (
        snap_to_segments(pts, sgs, R)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    dx, dy = (bx - ax).astype(np.int64), (by - ay).astype(np.int64)
    den = dx * dx + dy * dy
    exp = []
    for i in range(NP_):
        dax, day = ax - px[i], ay - py[i]
        dbx, dby = bx - px[i], by - py[i]
        a2 = dax * dax + day * day
        tnum = -(dax * dx + day * dy)
        num = np.where(
            tnum <= 0, a2 * den,
            np.where(tnum >= den, (dbx * dbx + dby * dby) * den,
                     a2 * den - tnum * tnum),
        )
        ok = num <= R * R * den
        if not ok.any():
            continue
        d2 = np.where(ok, num.astype(float) / den.astype(float), np.inf)
        j = int(np.argmin(d2))  # first min == lowest seg_id tie-break
        exp.append((i, j, int(num[j]), int(den[j]), float(d2[j])))
    assert len(res) == len(exp)
    got = list(
        zip(res.doc_id.astype(int), res.seg_id.astype(int),
            res.num.astype(int), res.den.astype(int), res.d2.astype(float))
    )
    assert got == exp


def test_interpolate_at_fraction_scalar_parity():
    import math

    from cloudtile_ray.stages.lines import interpolate_at_fraction

    rng = np.random.default_rng(41)
    lines = [
        (rng.uniform(-10, 10, int(n)).round(3), rng.uniform(-10, 10, int(n)).round(3))
        for n in rng.integers(1, 9, 80)
    ]
    lines.append((np.array([1.0]), np.array([2.0])))  # lone vertex
    lines.append((np.array([0.0, 0.0, 1.0]), np.array([0.0, 0.0, 0.0])))  # 0-len seg
    lon = pa.array([l[0].tolist() for l in lines], type=pa.list_(pa.float64()))
    lat = pa.array([l[1].tolist() for l in lines], type=pa.list_(pa.float64()))
    for frac in (0.0, 0.25, 0.5, 0.9, 1.0):
        ix, iy = interpolate_at_fraction(lon, lat, frac)
        for r, (xs, ys) in enumerate(lines):
            if len(xs) == 1:
                assert ix[r] == xs[0] and iy[r] == ys[0]
                continue
            cum, c = [], 0.0
            for i in range(len(xs) - 1):
                dx, dy = xs[i + 1] - xs[i], ys[i + 1] - ys[i]
                c = c + math.sqrt(dx * dx + dy * dy)
                cum.append(c)
            target = c * frac
            j = next((i for i, cv in enumerate(cum) if cv > target), None)
            if j is None:
                ex, ey = xs[-1], ys[-1]
            else:
                cb = cum[j - 1] if j > 0 else 0.0
                dx, dy = xs[j + 1] - xs[j], ys[j + 1] - ys[j]
                sl = math.sqrt(dx * dx + dy * dy)
                t = (target - cb) / sl
                ex, ey = xs[j] + t * dx, ys[j] + t * dy
            # bit-exact: identical op sequence on both sides
            assert ix[r] == ex and iy[r] == ey


def test_containment_overlap_pairs_brute_force(ray_session):
    import itertools

    import ray.data as rd

    from cloudtile_ray.stages.dedup import containment_overlap_pairs

    rng = np.random.default_rng(3)
    alphabet = list("abcdefghij xyz")

    def rand_text(n):
        return "".join(rng.choice(alphabet, n))

    texts = [rand_text(400) for _ in range(60)]
    texts.append(texts[0][50:250])  # contained substring of doc 0
    texts.append(texts[1])  # exact duplicate of doc 1
    # a hot shingle everywhere would be blocked by the rare-pivot rule:
    # stamp a shared boilerplate suffix on every doc (df >> max_df)
    texts = [t + " lorem ipsum dolor sit amet" for t in texts]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    res = (
        containment_overlap_pairs(rd.from_arrow(t), threshold=0.9, max_df=16)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
    )

    def shingles(s, k=5):
        return {s[i : i + k] for i in range(max(1, len(s) - k + 1))}

    def h5(g):
        h = 0
        for ch in g.encode():
            h = (h * 257 + ch) % (1 << 64)
        return h

    sh = [shingles(x) for x in texts]
    from collections import defaultdict

    anchors = defaultdict(set)
    for d, ss in enumerate(sh):
        for g in ss:
            if len(g) == 5:
                hv = h5(g)
                if hv % 16 == 0:
                    anchors[hv].add(d)
    cand = set()
    for hv, docs in anchors.items():
        if 2 <= len(docs) <= 16:
            cand.update(itertools.combinations(sorted(docs), 2))
    exp = []
    for a, b in sorted(cand):
        inter = len(sh[a] & sh[b])
        ov = inter / min(len(sh[a]), len(sh[b]))
        if ov >= 0.9:
            exp.append((a, b, ov))
    got = [
        (int(r.doc_a), int(r.doc_b), float(r.overlap)) for r in res.itertuples()
    ]
    assert got == exp
    # the contained-substring pair survives (junction shingles at the
    # boilerplate suffix cost a little overlap; Jaccard would be ~0.5)
    assert any(a == 0 and b == len(texts) - 2 and ov >= 0.9 for a, b, ov in got)
    assert (1, len(texts) - 1, 1.0) in got  # the exact duplicate


def test_clustering_coefficients_brute_force(ray_session):
    import itertools

    import ray.data as rd

    from cloudtile_ray.stages.graph import clustering_coefficients

    rng = np.random.default_rng(53)
    n_nodes, n_edges = 60, 220
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    ds = rd.from_arrow(pa.table({"a": a, "b": b}))
    res = (
        clustering_coefficients(ds)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    edges = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    exp = []
    for node in sorted(adj):
        nb = adj[node]
        deg = len(nb)
        tri = sum(
            1 for x, y in itertools.combinations(sorted(nb), 2)
            if (min(x, y), max(x, y)) in edges
        )
        cc = (2 * tri) / (deg * (deg - 1)) if deg > 1 else 0.0
        exp.append((node, deg, tri, cc))
    got = [
        (int(r.node), int(r.deg), int(r.n_tri), float(r.cc))
        for r in res.itertuples()
    ]
    assert got == exp


def test_user_ewma_recurrence_parity(ray_session):
    import ray.data as rd

    from cloudtile_ray.stages.events import user_ewma

    rng = np.random.default_rng(61)
    n = 3000
    uid = rng.integers(0, 50, n).astype(np.int64)
    ts = rng.integers(0, 10**9, n).astype(np.int64)
    eid = rng.permutation(n).astype(np.int64)
    val = rng.integers(-500, 2000, n).astype(np.int64)
    t = pa.table({"user_id": uid, "ts_us": ts, "event_id": eid, "value_cents": val})
    res = (
        user_ewma(rd.from_arrow(t))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    df = pd.DataFrame({"u": uid, "ts": ts, "e": eid, "v": val}).sort_values(
        ["u", "ts", "e"]
    )
    for u, g in df.groupby("u"):
        y = None
        for x in g["v"]:
            y = float(x) if y is None else (y + float(x)) / 2.0
        row = res[res.user_id == u].iloc[0]
        # bit-exact: identical addition sequence
        assert float(row.ewma) == y and int(row.n_events) == len(g)


def test_segment_intersection_pairs_brute_force(ray_session):
    import ray.data as rd

    from cloudtile_ray.stages.join import segment_intersection_pairs

    rng = np.random.default_rng(17)
    NS = 500
    ax = rng.integers(-3000, 3000, NS).astype(np.int64)
    ay = rng.integers(-3000, 3000, NS).astype(np.int64)
    bx = ax + rng.integers(-500, 500, NS)
    by = ay + rng.integers(-500, 500, NS)
    # planted degeneracies: interior touch, collinear overlap, shared endpoint
    ax[0], ay[0], bx[0], by[0] = 0, 0, 100, 0
    ax[1], ay[1], bx[1], by[1] = 50, 0, 50, 100
    ax[2], ay[2], bx[2], by[2] = 60, 0, 200, 0
    ax[3], ay[3], bx[3], by[3] = 100, 0, 150, 80
    sgs = rd.from_arrow(
        pa.table(
            {
                "seg_id": np.arange(NS, dtype=np.int64),
                "ax_mi": ax, "ay_mi": ay, "bx_mi": bx, "by_mi": by,
            }
        )
    )
    res = (
        segment_intersection_pairs(sgs)
        .to_pandas()
        .sort_values(["seg_a", "seg_b"])
        .reset_index(drop=True)
    )

    def inter(i, j):
        d1x, d1y = bx[i] - ax[i], by[i] - ay[i]
        d2x, d2y = bx[j] - ax[j], by[j] - ay[j]

        def cr(ux, uy, vx, vy):
            return int(ux) * int(vy) - int(uy) * int(vx)

        d1 = cr(d1x, d1y, ax[j] - ax[i], ay[j] - ay[i])
        d2 = cr(d1x, d1y, bx[j] - ax[i], by[j] - ay[i])
        d3 = cr(d2x, d2y, ax[i] - ax[j], ay[i] - ay[j])
        d4 = cr(d2x, d2y, bx[i] - ax[j], by[i] - ay[j])
        proper = (
            (d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0
            and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0
        )

        def on(px, py, k):
            return (
                min(ax[k], bx[k]) <= px <= max(ax[k], bx[k])
                and min(ay[k], by[k]) <= py <= max(ay[k], by[k])
            )

        touch = (
            (d1 == 0 and on(ax[j], ay[j], i))
            or (d2 == 0 and on(bx[j], by[j], i))
            or (d3 == 0 and on(ax[i], ay[i], j))
            or (d4 == 0 and on(bx[i], by[i], j))
        )
        return proper, (proper or touch)

    exp = []
    for i in range(NS):
        for j in range(i + 1, NS):
            p, h = inter(i, j)
            if h:
                exp.append((i, j, int(p)))
    got = [(int(r.seg_a), int(r.seg_b), int(r.proper)) for r in res.itertuples()]
    assert got == exp
    assert (0, 1, 0) in got and (0, 2, 0) in got and (0, 3, 0) in got


def test_hausdorff_pairs_brute_force(ray_session):
    import ray.data as rd

    from cloudtile_ray.stages.join import hausdorff_pairs

    rng = np.random.default_rng(19)
    NL, H = 300, 120
    lines = []
    for _ in range(NL):
        n = int(rng.integers(2, 6))
        x0, y0 = rng.integers(-4000, 4000, 2)
        xs = (x0 + np.cumsum(rng.integers(-300, 300, n))).astype(np.int64)
        ys = (y0 + np.cumsum(rng.integers(-300, 300, n))).astype(np.int64)
        lines.append((xs, ys))
    lines[1] = (lines[0][0] + 5, lines[0][1] - 5)  # planted near-identical pair
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(NL, dtype=np.int64)),
            "vx_mi": pa.array([l[0].tolist() for l in lines], type=pa.list_(pa.int64())),
            "vy_mi": pa.array([l[1].tolist() for l in lines], type=pa.list_(pa.int64())),
        }
    )
    res = (
        hausdorff_pairs(rd.from_arrow(t), h=H)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )

    def p2seg(px, py, ax, ay, bx, by):
        dx, dy = bx - ax, by - ay
        den = dx * dx + dy * dy
        if den == 0:
            return (px - ax) ** 2 + (py - ay) ** 2, 1
        tn = -((ax - px) * dx + (ay - py) * dy)
        if tn <= 0:
            num = ((ax - px) ** 2 + (ay - py) ** 2) * den
        elif tn >= den:
            num = ((bx - px) ** 2 + (by - py) ** 2) * den
        else:
            num = ((ax - px) ** 2 + (ay - py) ** 2) * den - tn * tn
        return num, den

    def directed(a, b):
        xs, ys = lines[a]
        bx, by = lines[b]
        for px, py in zip(xs, ys):
            if not any(
                p2seg(int(px), int(py), int(bx[k]), int(by[k]),
                      int(bx[k + 1]), int(by[k + 1]))[0]
                <= H * H * p2seg(int(px), int(py), int(bx[k]), int(by[k]),
                                 int(bx[k + 1]), int(by[k + 1]))[1]
                for k in range(len(bx) - 1)
            ):
                return False
        return True

    exp = [
        (a, b)
        for a in range(NL)
        for b in range(a + 1, NL)
        if directed(a, b) and directed(b, a)
    ]
    got = [(int(r.doc_a), int(r.doc_b)) for r in res.itertuples()]
    assert got == exp
    assert (0, 1) in got


def test_quantize_embeddings_batch_edge_cases():
    from cloudtile_ray.stages.similarity import quantize_embeddings_batch

    rng = np.random.default_rng(71)
    vecs = [rng.normal(size=8).astype(np.float32) for _ in range(20)]
    vecs.append(np.zeros(4, dtype=np.float32))  # all-zero vector
    vecs.append(np.array([127.0, -127.0], dtype=np.float32))
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    out = quantize_embeddings_batch(t)
    scale = out.column("scale").to_numpy()
    cmin = out.column("code_min").to_numpy()
    cmax = out.column("code_max").to_numpy()
    err = out.column("max_abs_err").to_numpy()
    for i, v in enumerate(vecs):
        v64 = v.astype(np.float64)
        s = np.abs(v64).max() / 127.0 if len(v) else 0.0
        if s == 0.0:
            assert scale[i] == 0.0 and cmin[i] == 0 and cmax[i] == 0 and err[i] == 0.0
            continue
        q = np.floor(v64 / s + 0.5)
        assert scale[i] == s
        assert cmin[i] == int(q.min()) and cmax[i] == int(q.max())
        assert err[i] == np.abs(q * s - v64).max()
        # int8 range honored: |codes| <= 127
        assert -127 <= cmin[i] and cmax[i] <= 127
        # reconstruction error bounded by half a step
        assert err[i] <= s / 2 + 1e-12


def test_readability_batch_hand_computed():
    import pyarrow as pa

    from cloudtile_ray.stages.text import readability_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "Hello world. How are you?? I am fine!",
                    "",  # degenerate: zero words/sentences/vowels
                    "queueing theory",
                ]
            ),
        }
    )
    out = readability_batch(t)
    assert out.column("n_words").to_pylist() == [8, 0, 2]
    # terminator runs: "." "??" "!" -> 3; floor 1 for the others
    assert out.column("n_sentences").to_pylist() == [3, 1, 1]
    # vowel groups incl. y: e,o | o | o | a,e | you | I | a | i,e = 11;
    # "queueing theory" = ueueei | eo | y = 3
    assert out.column("n_vowel_groups").to_pylist() == [11, 0, 3]
    f = out.column("flesch").to_pylist()
    assert f[0] == 206.835 - 1.015 * (8.0 / 3) - 84.6 * (11.0 / 8)
    # zero-word doc: clamped divisors, zero numerators
    assert f[1] == 206.835 - 1.015 * (1.0 / 1) - 84.6 * (0.0 / 1)


def test_sentence_stats_batch_hand_computed():
    import pyarrow as pa

    from cloudtile_ray.stages.text import sentence_stats_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "One two. Three!  Four five six?",
                    "no terminator at all",
                    "...",  # splits to ['',''] -> zero sentences
                ]
            ),
        }
    )
    out = sentence_stats_batch(t)
    # pieces doc1: 'One two', ' Three', '  Four five six', '' -> 3 kept
    assert out.column("n_sentences").to_pylist() == [3, 1, 0]
    assert out.column("sum_sentence_chars").to_pylist() == [
        len("One two") + len(" Three") + len("  Four five six"),
        len("no terminator at all"),
        0,
    ]
    assert out.column("max_sentence_chars").to_pylist() == [15, 20, 0]


def test_build_postings_brute_force(ray_session):
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.text import build_postings

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for d in range(40):
        words = rng.choice(vocab, size=rng.integers(3, 9)).tolist()
        docs.append(" ".join(words))
    t = pa.table(
        {"doc_id": pa.array(range(40), pa.int64()), "text": pa.array(docs)}
    )
    # brute-force reference: term -> sorted distinct doc ids
    ref: dict[str, list[int]] = {}
    for d, txt in enumerate(docs):
        for w in set(txt.split()):
            ref.setdefault(w, []).append(d)
    lo, hi = 3, 25
    want = {
        w: (len(ids), ",".join(str(i) for i in sorted(ids)))
        for w, ids in ref.items()
        if lo <= len(ids) <= hi
    }
    ds = ray.data.from_arrow(t).repartition(5)
    out = build_postings(ds, min_df=lo, max_df=hi).to_pandas()
    got = {
        r.tok: (int(r.df), r.postings) for r in out.itertuples(index=False)
    }
    assert got == want


def test_densify_at_fractions_matches_single_interp():
    import pyarrow as pa
    import pyarrow.compute as pc

    from cloudtile_ray.stages.lines import (
        densify_at_fractions,
        interpolate_at_fraction,
    )

    lon = pa.array(
        [[0.0, 1.0, 1.0], [2.0, 2.0], [5.0]], pa.list_(pa.float64())
    )
    lat = pa.array(
        [[0.0, 0.0, 3.0], [1.0, 4.0], [5.0]], pa.list_(pa.float64())
    )
    t = pa.table({"doc_id": pa.array([10, 11, 12], pa.int64()),
                  "ln_lon": lon, "ln_lat": lat})
    fracs = [0.125, 0.5, 0.875]
    out = densify_at_fractions(t, fracs)
    assert out.num_rows == 9
    for k, f in enumerate(fracs):
        ix, iy = interpolate_at_fraction(lon, lat, f)
        sub = out.filter(
            pc.equal(out.column("frac_num"), k + 1)
        )
        got_x = sub.column("ix_deg").to_numpy(zero_copy_only=False)
        got_y = sub.column("iy_deg").to_numpy(zero_copy_only=False)
        assert np.array_equal(got_x, ix, equal_nan=True)
        assert np.array_equal(got_y, iy, equal_nan=True)
    # empty fraction list yields the typed empty table
    empty = densify_at_fractions(t, [])
    assert empty.num_rows == 0 and empty.column_names == [
        "doc_id", "frac_num", "ix_deg", "iy_deg",
    ]


def test_common_neighbor_pairs_brute_force(ray_session):
    import itertools

    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.graph import common_neighbor_pairs

    rng = np.random.default_rng(11)
    n_nodes = 30
    edges = set()
    for _ in range(80):
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    adj: dict[int, set[int]] = {i: set() for i in range(n_nodes)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    want = {}
    for a, b in itertools.combinations(range(n_nodes), 2):
        if (a, b) in edges:
            continue
        k = len(adj[a] & adj[b])
        if k >= 2:
            want[(a, b)] = k
    el = list(edges) + list(edges)[:10]  # duplicates must not matter
    t = pa.table(
        {
            "a": pa.array([u for u, _ in el], pa.int64()),
            "b": pa.array([v for _, v in el], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    for budget in (64 << 20, 0):  # broadcast path, then anti-join path
        out = common_neighbor_pairs(
            ds, id_cols=("a", "b"), min_common=2,
            broadcast_byte_budget=budget,
        ).to_pandas()
        got = {
            (int(r.a), int(r.b)): int(r.n_common)
            for r in out.itertuples(index=False)
        }
        assert got == want, f"budget={budget}"
    # max_degree drops hub-witnessed pairs only
    cap = 4
    want_cap = {}
    for a, b in itertools.combinations(range(n_nodes), 2):
        if (a, b) in edges:
            continue
        k = len({c for c in adj[a] & adj[b] if len(adj[c]) <= cap})
        if k >= 2:
            want_cap[(a, b)] = k
    out = common_neighbor_pairs(
        ds, id_cols=("a", "b"), min_common=2, max_degree=cap
    ).to_pandas()
    got = {
        (int(r.a), int(r.b)): int(r.n_common)
        for r in out.itertuples(index=False)
    }
    assert got == want_cap


def test_session_entry_exit_brute_force(ray_session):
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import session_entry_exit

    rng = np.random.default_rng(3)
    gap = 100
    n = 400
    uid = rng.integers(0, 12, n)
    ts = rng.integers(0, 2000, n)
    types = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    eid = np.arange(n)
    t = pa.table(
        {
            "user_id": pa.array(uid.astype(np.int64)),
            "ts_us": pa.array(ts.astype(np.int64)),
            "event_id": pa.array(eid.astype(np.int64)),
            "event_type": pa.array(types.tolist(), pa.string()),
        }
    )
    # brute force
    want: dict[tuple[str, str], list[int]] = {}
    for u in np.unique(uid):
        m = uid == u
        order = np.lexsort((eid[m], ts[m]))
        tss, tys = ts[m][order], types[m][order]
        sess = [[0]]
        for i in range(1, len(tss)):
            if tss[i] - tss[i - 1] > gap:
                sess.append([])
            sess[-1].append(i)
        for s in sess:
            key = (tys[s[0]], tys[s[-1]])
            rec = want.setdefault(key, [0, 0])
            rec[0] += 1
            rec[1] += int(len(s) == 1)
    ds = ray.data.from_arrow(t).repartition(6)
    out = session_entry_exit(ds, gap_us=gap).to_pandas()
    got = {
        (r.entry_type, r.exit_type): [int(r.n_sessions), int(r.n_bounce)]
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_kmv_sketch_brute_force(ray_session):
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.sketches import kmv_sketch

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 5000, 20000).astype(np.int64)
    t = pa.table({"k": pa.array(keys)})
    ds = ray.data.from_arrow(t).repartition(7)
    k = 64
    out = kmv_sketch(ds, "k", k=k).to_pandas()
    mult, mod = 2654435761, 1 << 32
    hv = np.unique((keys * mult) % mod)
    kth = int(np.sort(hv)[k - 1])
    assert int(out.kth_hash[0]) == kth
    assert float(out.est_distinct[0]) == (k - 1) * float(mod) / kth
    n_true = len(np.unique(keys))
    # KMV standard error ~ 1/sqrt(k-1): accept 4 sigma
    assert abs(float(out.est_distinct[0]) - n_true) < 4 * n_true / np.sqrt(k - 1)


def test_zone_clip_lengths_brute_force(ray_session):
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.join import zone_clip_lengths

    rng = np.random.default_rng(13)
    n = 300
    x1 = rng.integers(-100, 100, n)
    y1 = rng.integers(-100, 100, n)
    dx = rng.integers(1, 60, n) * rng.choice([-1, 1], n)
    dy = rng.integers(1, 60, n) * rng.choice([-1, 1], n)
    x2, y2 = x1 + dx, y1 + dy
    boxes = np.array(
        [[0, -50, -50, 50, 50], [1, 20, -120, 90, -10], [2, -200, -200, 200, 200]],
        dtype=np.int64,
    )
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "seg_no": pa.array(np.ones(n, dtype=np.int64)),
            "x1": pa.array(x1.astype(np.int64)),
            "y1": pa.array(y1.astype(np.int64)),
            "x2": pa.array(x2.astype(np.int64)),
            "y2": pa.array(y2.astype(np.int64)),
        }
    )
    want = {}
    for i in range(n):
        for zid, w, s, e, nn in boxes:
            ta, tb = (w - x1[i]) / dx[i], (e - x1[i]) / dx[i]
            tc, td = (s - y1[i]) / dy[i], (nn - y1[i]) / dy[i]
            t0 = max(min(ta, tb), min(tc, td), 0.0)
            t1 = min(max(ta, tb), max(tc, td), 1.0)
            if t1 > t0:
                L = (t1 - t0) * np.sqrt(float(dx[i] * dx[i] + dy[i] * dy[i]))
                want[(int(zid), i)] = L
    ds = ray.data.from_arrow(t).repartition(4)
    out = zone_clip_lengths(ds, boxes).to_pandas()
    got = {(int(r.zone_id), int(r.doc_id)): float(r.len_mi)
           for r in out.itertuples(index=False)}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k  # bit-exact contract
    # fully-contained segment: clip == full length
    full = [k for k in want if k[0] == 2]
    assert len(full) == n
    # axis-parallel input is rejected loudly
    bad = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "seg_no": pa.array([1], pa.int64()),
            "x1": pa.array([0], pa.int64()),
            "y1": pa.array([0], pa.int64()),
            "x2": pa.array([0], pa.int64()),
            "y2": pa.array([5], pa.int64()),
        }
    )
    import pytest

    with pytest.raises(Exception):
        zone_clip_lengths(ray.data.from_arrow(bad), boxes).materialize()


def test_range_search_brute_force(ray_session):
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.similarity import range_search

    rng = np.random.default_rng(17)
    V = rng.normal(size=(200, 16))
    Q = rng.normal(size=(4, 16))
    qids = np.array([100, 200, 300, 400], dtype=np.int64)
    theta = 0.3
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Vn @ Qn.T
    want = {
        (int(qids[q]), int(i))
        for i, q in zip(*np.nonzero(sims >= theta))
    }
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32) for row in V],
                pa.list_(pa.float32()),
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    out = range_search(ds, Q.astype(np.float32), qids, theta=theta)
    got = {
        (int(r.q_id), int(r.vec_id))
        for r in out.to_pandas().itertuples(index=False)
    }
    # float32 storage: recompute the reference from the f32-rounded vectors
    Vf = np.stack([row.astype(np.float32) for row in V]).astype(np.float64)
    Qf = Q.astype(np.float32).astype(np.float64)
    Vfn = Vf / np.linalg.norm(Vf, axis=1, keepdims=True)
    Qfn = Qf / np.linalg.norm(Qf, axis=1, keepdims=True)
    want_f = {
        (int(qids[q]), int(i))
        for i, q in zip(*np.nonzero(Vfn @ Qfn.T >= theta))
    }
    assert got == want_f


def test_degree_assortativity_brute_force(ray_session):
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.graph import degree_assortativity

    rng = np.random.default_rng(23)
    edges = set()
    while len(edges) < 60:
        a, b = rng.integers(0, 25, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    x, y = np.array(xs, dtype=np.int64), np.array(ys, dtype=np.int64)
    n = len(x)
    num = n * int((x * y).sum()) - int(x.sum()) ** 2
    den = n * int((x * x).sum()) - int(x.sum()) ** 2
    want_r = num / den
    # sanity vs the float Pearson formula
    assert abs(want_r - np.corrcoef(x, y)[0, 1]) < 1e-12
    t = pa.table(
        {
            "a": pa.array([u for u, _ in edges], pa.int64()),
            "b": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    out = degree_assortativity(
        ray.data.from_arrow(t).repartition(4)
    ).to_pandas()
    assert int(out.n_directed[0]) == n
    assert int(out.num[0]) == num and int(out.den[0]) == den
    assert float(out.assortativity[0]) == num / den


def test_seasonal_naive_error_brute_force(ray_session):
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import seasonal_naive_error

    rng = np.random.default_rng(29)
    n = 3000
    et = np.array(["x", "y"])[rng.integers(0, 2, n)]
    # sparse hours with gaps so the both-references-exist filter matters
    hours = rng.integers(0, 90, n)
    ts_us = hours * 3_600_000_000 + rng.integers(0, 3_600_000_000, n)
    t = pa.table(
        {
            "event_type": pa.array(et.tolist(), pa.string()),
            "ts_us": pa.array(ts_us.astype(np.int64)),
        }
    )
    season = 24
    want = {}
    for typ in ("x", "y"):
        m = et == typ
        hh, cnt = np.unique(hours[m], return_counts=True)
        lookup = dict(zip(hh.tolist(), cnt.tolist()))
        sae_s = sae_n = n_eval = 0
        for h, c in lookup.items():
            if (h - season) in lookup and (h - 1) in lookup:
                n_eval += 1
                sae_s += abs(c - lookup[h - season])
                sae_n += abs(c - lookup[h - 1])
        want[typ] = (n_eval, sae_s, sae_n, sae_s / sae_n if sae_n else None)
    ds = ray.data.from_arrow(t).repartition(5)
    out = seasonal_naive_error(ds, season=season).to_pandas()
    got = {
        r.event_type: (int(r.n_eval), int(r.sae_seasonal), int(r.sae_naive),
                       float(r.mase) if r.mase == r.mase else None)
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_user_bot_features_brute_force(ray_session):
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import user_bot_features

    rng = np.random.default_rng(31)
    n = 600
    uid = rng.integers(0, 25, n)
    ts = rng.integers(0, 50 * 3_600_000_000, n)
    et = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, n)]
    # one forced bot: user 99, single type, packed into one hour
    uid = np.r_[uid, np.full(30, 99)]
    ts = np.r_[ts, np.arange(30) * 1000 + 7 * 3_600_000_000]
    et = np.r_[et, np.full(30, "a")]
    t = pa.table(
        {
            "user_id": pa.array(uid.astype(np.int64)),
            "ts_us": pa.array(ts.astype(np.int64)),
            "event_type": pa.array(et.tolist(), pa.string()),
        }
    )
    bt, mt = 8, 20
    want = {}
    for u in np.unique(uid):
        m = uid == u
        n_ev = int(m.sum())
        n_ty = len(np.unique(et[m]))
        hours = ts[m] // 3_600_000_000
        _, hc = np.unique(hours, return_counts=True)
        mh = int(hc.max())
        bot = int(mh >= bt or (n_ty == 1 and n_ev >= mt))
        want[int(u)] = (n_ev, n_ty, mh, bot)
    out = user_bot_features(
        ray.data.from_arrow(t).repartition(6), burst_threshold=bt,
        mono_threshold=mt,
    ).to_pandas()
    got = {
        int(r.user_id): (int(r.n_events), int(r.n_types), int(r.max_hourly),
                         int(r.is_bot))
        for r in out.itertuples(index=False)
    }
    assert got == want
    assert got[99][3] == 1


def test_degree_assortativity_empty_graph(ray_session):
    """ADVICE r4: empty edge list — SQL's sum() over zero rows is NULL,
    so the moment columns must be NULL (n_directed stays count=0)."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.graph import degree_assortativity

    t = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    out = degree_assortativity(ray.data.from_arrow(t)).to_pandas()
    assert int(out.n_directed[0]) == 0
    for c in ("sxy", "sx", "sxx", "num", "den", "assortativity"):
        assert out[c].isna().all(), c


def test_seasonal_naive_error_null_event_type(ray_session):
    """ADVICE r4: null event_type rows are skipped (the oracle's inner
    self-joins drop NULL-type groups), not a TypeError in np.unique."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import seasonal_naive_error

    hours = [0, 1, 24, 25, 0, 1, 24, 25]
    et = ["x", "x", "x", "x", None, None, None, None]
    t = pa.table(
        {
            "event_type": pa.array(et, pa.string()),
            "ts_us": pa.array(
                [h * 3_600_000_000 for h in hours], pa.int64()
            ),
        }
    )
    out = seasonal_naive_error(
        ray.data.from_arrow(t), season=24
    ).to_pandas()
    assert out.event_type.tolist() == ["x"]
    assert int(out.n_eval[0]) == 1  # hour 25 has both h-24 and h-1


def test_kmv_sketch_rejects_overflowing_keys(ray_session):
    """ADVICE r4: keys >= 2**63 // mult would wrap int64 where a SQL
    oracle promotes to HUGEINT — the stage must reject them to keep its
    bit-exact-replay contract."""
    import pyarrow as pa
    import pytest
    import ray.data

    from cloudtile_ray.stages.sketches import kmv_sketch

    big = (1 << 63) // 2654435761 + 1
    t = pa.table({"k": pa.array([1, 2, big], pa.int64())})
    with pytest.raises(Exception, match="kmv_sketch keys"):
        kmv_sketch(ray.data.from_arrow(t), "k", k=4).to_pandas()


def test_pagerank_fixed_point_brute_force(ray_session):
    """Integer-mass damped power iteration: exact vs a dict-based replay
    (share = m*17 // (20*deg), base 150000), independent of partitioning."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.graph import pagerank_fixed_point

    rng = np.random.default_rng(41)
    edges = set()
    while len(edges) < 40:
        a, b = rng.integers(0, 18, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    sym: dict[int, list[int]] = {}
    for u, v in edges:
        sym.setdefault(u, []).append(v)
        sym.setdefault(v, []).append(u)
    mass = {v: 1_000_000 for v in sym}
    for _ in range(4):
        share = {u: (mass[u] * 17) // (20 * len(sym[u])) for u in sym}
        mass = {
            v: 150_000 + sum(share[u] for u in sym[v]) for v in sym
        }
    t = pa.table(
        {
            "a": pa.array([u for u, _ in edges], pa.int64()),
            "b": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    out = pagerank_fixed_point(
        ray.data.from_arrow(t).repartition(5), n_iters=4
    ).to_pandas()
    got = dict(zip(out.node, out.mass))
    assert got == mass

    # empty edge list -> empty (node, mass) table
    e = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    assert pagerank_fixed_point(ray.data.from_arrow(e)).count() == 0


def test_hll_registers_exact_brute_force(ray_session):
    """Register state equals a dict replay of the Knuth multiplicative
    hash (bucket = low p bits, rho = (64-p) - bitlen + 1), exact under
    partitioning — the SQL-certifiable HLL variant."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.sketches import hll_registers_exact

    rng = np.random.default_rng(53)
    keys = rng.integers(0, 100_000, 5000).astype(np.int64)
    grp = np.array(["a", "b"])[rng.integers(0, 2, 5000)]
    p, mult = 12, 0x9E3779B97F4A7C15
    want: dict = {}
    for g, x in zip(grp, keys):
        h = (int(x) * mult) % (1 << 64)
        b = h & ((1 << p) - 1)
        w = h >> p
        rho = (64 - p) - w.bit_length() + 1
        k = (str(g), int(b))
        want[k] = max(want.get(k, 0), rho)
    t = pa.table({"g": pa.array(grp.tolist()), "k": pa.array(keys)})
    out = hll_registers_exact(
        ray.data.from_arrow(t).repartition(7), "g", "k", p=p, mult=mult
    ).to_pandas()
    got = {(r.g, int(r.hllb)): int(r.rho) for r in out.itertuples(index=False)}
    assert got == want


def test_pagerank_fixed_point_driver_vs_distributed_parity(ray_session):
    """The byte-gated small-graph fast path must be bit-equal to the
    forced-distributed path (driver_gate_bytes=0)."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.graph import pagerank_fixed_point

    rng = np.random.default_rng(61)
    edges = set()
    while len(edges) < 80:
        a, b = rng.integers(0, 30, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    t = pa.table(
        {
            "a": pa.array([u for u, _ in edges], pa.int64()),
            "b": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    fast = pagerank_fixed_point(ds, n_iters=4).to_pandas()
    dist = pagerank_fixed_point(ds, n_iters=4, driver_gate_bytes=0).to_pandas()
    f = dict(zip(fast.node, fast.mass))
    d = dict(zip(dist.node, dist.mass))
    assert f == d and len(f) == 30


def test_quantile_driver_gate_parity(ray_session):
    """The byte-gated driver rank-selection path must return exactly what
    the distributed bracket refinement returns (driver_gate_bytes=0
    forces the old path) for disc, cont, and both grouped variants."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.quantiles import (
        exact_quantiles,
        exact_quantiles_cont,
        grouped_quantiles,
        grouped_quantiles_cont,
    )

    rng = np.random.default_rng(71)
    v = rng.integers(-10_000, 10_000, 20_000).astype(np.int64)
    g = np.array(["a", "b", "c"])[rng.integers(0, 3, 20_000)]
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(g.tolist()), "v": pa.array(v)})
    ).repartition(6)
    qs = {"p25": 0.25, "p50": 0.5, "p90": 0.9}
    for fn in (exact_quantiles, exact_quantiles_cont):
        fast = fn(ds, "v", qs).to_pydict()
        slow = fn(ds, "v", qs, driver_gate_bytes=0).to_pydict()
        assert fast == slow, fn.__name__
    for fn in (grouped_quantiles, grouped_quantiles_cont):
        fast = fn(ds, "g", "v", qs).to_pandas().sort_values("g", ignore_index=True)
        slow = (
            fn(ds, "g", "v", qs, driver_gate_bytes=0)
            .to_pandas()
            .sort_values("g", ignore_index=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(fast, slow)


def test_cms_registers_exact_brute_force(ray_session):
    """Counter state equals a dict replay of the per-row Fibonacci hash
    (cell = high lg(width) bits of x * mult mod 2**64), exact under
    partitioning; row estimates (min over rows) upper-bound true counts."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.sketches import _CMS_EXACT_MULTS, cms_registers_exact

    rng = np.random.default_rng(67)
    keys = rng.integers(0, 3000, 8000).astype(np.int64)
    depth, width = 4, 256
    shift = 64 - 8
    want: dict = {}
    for x in keys:
        for j in range(depth):
            cell = ((int(x) * _CMS_EXACT_MULTS[j]) % (1 << 64)) >> shift
            want[(j, cell)] = want.get((j, cell), 0) + 1
    t = pa.table({"k": pa.array(keys)})
    out = cms_registers_exact(
        ray.data.from_arrow(t).repartition(7), "k", depth=depth, width=width
    ).to_pandas()
    got = {(int(r.row), int(r.cell)): int(r.n) for r in out.itertuples(index=False)}
    assert got == want
    # point-estimate sanity: min over rows >= true count for a hot key
    true = int((keys == keys[0]).sum())
    est = min(
        want[(j, ((int(keys[0]) * _CMS_EXACT_MULTS[j]) % (1 << 64)) >> shift)]
        for j in range(depth)
    )
    assert est >= true

    with pytest.raises(ValueError):
        cms_registers_exact(ray.data.from_arrow(t), "k", width=300)


def test_interval_union_brute_force(ray_session):
    """Gaps-and-islands vs a pure-python interval merge: overlapping AND
    touching (s == prev end) spans merge; per-user island count /
    coverage / longest island all exact."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import interval_union

    rng = np.random.default_rng(83)
    n = 4000
    u = rng.integers(0, 40, n).astype(np.int64)
    s = rng.integers(0, 100_000, n).astype(np.int64)
    e = s + rng.integers(0, 5_000, n).astype(np.int64)
    want = {}
    for uu in np.unique(u):
        m = u == uu
        iv = sorted(zip(s[m].tolist(), e[m].tolist()))
        merged = []
        for a, b in iv:
            if merged and a <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])
        lens = [b - a for a, b in merged]
        want[int(uu)] = (len(merged), sum(lens), max(lens))
    t = pa.table({"user_id": pa.array(u), "s_us": pa.array(s), "e_us": pa.array(e)})
    out = interval_union(ray.data.from_arrow(t).repartition(6)).to_pandas()
    got = {
        int(r.user_id): (int(r.n_islands), int(r.covered_us), int(r.max_island_us))
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_priority_division_brute_force(ray_session):
    """Relational division by counting vs a pandas replay: keep keys
    covering ALL distinct divisor values."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    out = entrymod.q_priority_division("/root/testdata/sf0.001").to_pandas()
    o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet",
                        columns=["o_custkey", "o_orderpriority"])
    per = o.groupby("o_custkey").agg(
        n_prio=("o_orderpriority", "nunique"), n_orders=("o_orderpriority", "size")
    )
    want = per[per.n_prio == o.o_orderpriority.nunique()].n_orders
    got = out.set_index("o_custkey").n_orders
    assert got.sort_index().astype(int).to_dict() == want.sort_index().astype(int).to_dict()


def test_common_neighbor_driver_vs_distributed_parity(ray_session):
    """The byte-gated driver wedge path must match the distributed
    three-exchange path (broadcast_byte_budget=0 forces it) exactly."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.graph import common_neighbor_pairs

    rng = np.random.default_rng(91)
    edges = set()
    while len(edges) < 120:
        a, b = rng.integers(0, 35, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    t = pa.table(
        {
            "a": pa.array([u for u, _ in edges], pa.int64()),
            "b": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    fast = common_neighbor_pairs(ds, min_common=2).to_pandas()
    slow = common_neighbor_pairs(
        ds, min_common=2, broadcast_byte_budget=0
    ).to_pandas()
    key = lambda df: {  # noqa: E731
        (int(r.a), int(r.b)): int(r.n_common)
        for r in df.itertuples(index=False)
    }
    assert key(fast) == key(slow) and len(fast) > 0


def test_triangle_counts_driver_vs_distributed_parity(ray_session):
    """The byte-gated driver triangle path must match the distributed
    wedge/close/rollup path (broadcast_byte_budget=0) exactly, with and
    without return_degrees."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(97)
    edges = set()
    while len(edges) < 150:
        a, b = rng.integers(0, 40, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    t = pa.table(
        {
            "a": pa.array([u for u, _ in edges], pa.int64()),
            "b": pa.array([v for _, v in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    fast, fdeg = triangle_counts(ds, return_degrees=True)
    slow, sdeg = triangle_counts(
        ds, broadcast_byte_budget=0, return_degrees=True
    )
    f = {int(r.node): int(r.n_tri) for r in fast.to_pandas().itertuples(index=False)}
    s = {int(r.node): int(r.n_tri) for r in slow.to_pandas().itertuples(index=False)}
    assert f == s and len(f) > 0
    fd = {int(r.node): int(r.deg) for r in fdeg.to_pandas().itertuples(index=False)}
    sd = {int(r.node): int(r.deg) for r in sdeg.to_pandas().itertuples(index=False)}
    assert fd == sd


def test_exact_weighted_median_brute_force(ray_session):
    """Weighted median vs a sort+cumsum replay, including the
    forced-distributed refinement path (driver_gate_bytes=0) and edge
    weights (zeros, heavy single value)."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.quantiles import exact_weighted_median

    rng = np.random.default_rng(101)
    v = rng.integers(-500, 500, 6000).astype(np.int64)
    w = rng.integers(0, 9, 6000).astype(np.int64)
    w[17] = 50_000  # one dominating weight
    order = np.argsort(v, kind="stable")
    cw = np.cumsum(w[order])
    want = int(v[order][np.searchsorted(cw, (int(cw[-1]) + 1) // 2)])
    t = pa.table({"v": pa.array(v), "w": pa.array(w)})
    ds = ray.data.from_arrow(t).repartition(6)
    fast = exact_weighted_median(ds, "v", "w")
    assert int(fast.column("wmedian")[0].as_py()) == want
    slow = exact_weighted_median(
        ds, "v", "w", driver_gate_bytes=0, collect_threshold=256
    )
    assert int(slow.column("wmedian")[0].as_py()) == want
    # dominating weight: median must equal that value
    assert want == int(v[17])


def test_grouped_weighted_median_brute_force(ray_session):
    """Grouped weighted median vs a per-group sort+cumsum replay, both
    the gated driver path and the forced shared-pass refinement."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.quantiles import grouped_weighted_median

    rng = np.random.default_rng(103)
    n = 9000
    g = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    v = rng.integers(-2000, 2000, n).astype(np.int64)
    w = rng.integers(0, 7, n).astype(np.int64)
    want = {}
    for gg in ("a", "b", "c"):
        m = g == gg
        order = np.argsort(v[m], kind="stable")
        cw = np.cumsum(w[m][order])
        want[gg] = int(v[m][order][np.searchsorted(cw, (int(cw[-1]) + 1) // 2)])
    t = pa.table({"g": pa.array(g.tolist()), "v": pa.array(v), "w": pa.array(w)})
    ds = ray.data.from_arrow(t).repartition(6)
    fast = grouped_weighted_median(ds, "g", "v", "w")
    got = dict(zip(fast.column("g").to_pylist(),
                   fast.column("wmedian").to_pylist()))
    assert got == want
    slow = grouped_weighted_median(
        ds, "g", "v", "w", driver_gate_bytes=0, collect_threshold=128
    )
    got2 = dict(zip(slow.column("g").to_pylist(),
                    slow.column("wmedian").to_pylist()))
    assert got2 == want


def test_peak_concurrency_brute_force(ray_session):
    """Sweep-line max-overlap vs a pure-python boundary walk: half-open
    [s, e) spans, ends-before-starts at equal t; tiny chunk_us forces
    the multi-chunk associative combine path."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import peak_concurrency

    rng = np.random.default_rng(97)
    n = 3000
    types = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    s = rng.integers(0, 50_000, n).astype(np.int64)
    e = s + rng.integers(0, 2_000, n).astype(np.int64)  # incl. zero-length
    want = {}
    for tt in np.unique(types):
        m = types == tt
        bounds = sorted(
            [(int(x), 1) for x in s[m]] + [(int(x), -1) for x in e[m]],
            key=lambda p: (p[0], p[1]),
        )
        c = peak = 0
        first_t = None
        for t, d in bounds:
            c += d
            if c > peak:
                peak, first_t = c, t
        want[str(tt)] = (peak, first_t)
    t = pa.table(
        {
            "event_type": pa.array(types),
            "s_us": pa.array(s),
            "e_us": pa.array(e),
        }
    )
    out = peak_concurrency(
        ray.data.from_arrow(t).repartition(7), chunk_us=1_000
    ).to_pandas()
    got = {
        r.event_type: (int(r.peak), int(r.first_peak_us))
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_hourly_ohlc_brute_force(ray_session):
    """OHLC partial-combine vs a pandas groupby replay: open/close by
    (ts, event_id) order across many small blocks."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import hourly_ohlc

    rng = np.random.default_rng(11)
    n = 5000
    ts = rng.integers(0, 20 * 3_600_000_000, n).astype(np.int64)
    eid = rng.permutation(n).astype(np.int64)
    types = np.array(["x", "y"])[rng.integers(0, 2, n)]
    value = np.round(rng.uniform(-50, 150, n), 2)
    t = pa.table(
        {
            "event_type": pa.array(types),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "event_id": pa.array(eid),
            "value": pa.array(value),
        }
    )
    out = (
        hourly_ohlc(ray.data.from_arrow(t).repartition(9))
        .to_pandas()
        .sort_values(["event_type", "hour"], ignore_index=True)
    )
    df = pd.DataFrame(
        {
            "event_type": types,
            "hour": ts // 3_600_000_000,
            "ts": ts,
            "eid": eid,
            "cents": np.rint(value * 100).astype(np.int64),
        }
    ).sort_values(["event_type", "hour", "ts", "eid"])
    want = (
        df.groupby(["event_type", "hour"], as_index=False)
        .agg(
            open_cents=("cents", "first"),
            high_cents=("cents", "max"),
            low_cents=("cents", "min"),
            close_cents=("cents", "last"),
            n=("cents", "size"),
        )
        .sort_values(["event_type", "hour"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"n": np.int64}), want.astype({"n": np.int64})
    )


def test_scd2_intervals_brute_force(ray_session):
    """SCD-2 change compression vs a python replay: same-type runs
    collapse, versions count per user, last interval open-ended, null
    types dropped."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import SCD_OPEN_END_US, scd2_intervals

    rng = np.random.default_rng(5)
    n = 4000
    u = rng.integers(0, 60, n).astype(np.int64)
    ts = rng.integers(0, 1_000_000, n).astype(np.int64)
    eid = rng.permutation(n).astype(np.int64)
    pool = ["p", "q", "r", None]
    types = [pool[i] for i in rng.integers(0, 4, n)]
    rows = sorted(
        (
            (int(uu), int(tt), int(ee), ty)
            for uu, tt, ee, ty in zip(u, ts, eid, types)
            if ty is not None
        ),
    )
    want = []
    by_user = {}
    for uu, tt, ee, ty in rows:
        by_user.setdefault(uu, []).append((tt, ee, ty))
    for uu, evs in by_user.items():
        changes = []
        prev = None
        for tt, ee, ty in evs:
            if prev is None or ty != prev:
                changes.append((tt, ty))
            prev = ty
        for i, (tt, ty) in enumerate(changes):
            vt = changes[i + 1][0] if i + 1 < len(changes) else SCD_OPEN_END_US
            want.append((uu, ty, i + 1, tt, vt))
    t = pa.table(
        {
            "user_id": pa.array(u),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "event_id": pa.array(eid),
            "event_type": pa.array(types, pa.string()),
        }
    )
    out = scd2_intervals(ray.data.from_arrow(t).repartition(8)).to_pandas()
    got = sorted(
        (
            int(r.user_id),
            r.event_type,
            int(r.version),
            int(r.valid_from_us),
            int(r.valid_to_us),
        )
        for r in out.itertuples(index=False)
    )
    assert got == sorted(want)


def test_tfidf_topk_brute_force(ray_session):
    """Integer-scaled tf-idf top-k vs a python replay on a tiny corpus:
    score = tf * ((n_docs * scale) // df), ties by token."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.text import tfidf_topk

    docs = {
        0: "a a a b c rare",
        1: "a b b c c c",
        2: "b c d d unique token",
        3: "a d e e e e",
        4: "f f g common a",
    }
    n_docs, scale, k = len(docs), 1_000_000, 2
    tf = {}
    df = {}
    for d, text in docs.items():
        seen = {}
        for tk in text.split(" "):
            seen[tk] = seen.get(tk, 0) + 1
        for tk, c in seen.items():
            tf[(d, tk)] = c
            df[tk] = df.get(tk, 0) + 1
    want = []
    for d in docs:
        scored = sorted(
            (
                (-(tf[(dd, tk)] * ((n_docs * scale) // df[tk])), tk)
                for (dd, tk) in tf
                if dd == d
            ),
        )[:k]
        for neg, tk in scored:
            want.append((d, tk, -neg))
    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values())),
        }
    )
    out = tfidf_topk(
        ray.data.from_arrow(t).repartition(3), n_docs=n_docs, k=k
    ).to_pandas()
    got = sorted(
        (int(r.doc_id), r.tk, int(r.score)) for r in out.itertuples(index=False)
    )
    assert got == sorted(want)
    assert set(out.columns) == {"doc_id", "tk", "tf", "df", "score"}


def test_media_dedup_brute_force(ray_session):
    """Binary content dedup vs the synthesis rule: ids sharing
    media_id % key_mod share payload bytes, survivor = lowest id."""
    import ray.data

    from cloudtile_ray.stages.multimodal import media_dedup, synthesize_media_table

    t = synthesize_media_table(150, sql_replayable=True, key_mod=40)
    out = media_dedup(ray.data.from_arrow(t).repartition(5)).to_pandas()
    got = sorted(
        (int(r.keep_id), int(r.n_copies), int(r.nbytes))
        for r in out.itertuples(index=False)
    )
    want = []
    for k in range(40):
        ids = [i for i in range(150) if i % 40 == k]
        want.append((min(ids), len(ids), 64 + k % 128))
    assert got == sorted(want)


def test_media_dedup_rng_payloads_all_distinct(ray_session):
    """Seeded-RNG payloads are all distinct -> every row survives with
    n_copies == 1."""
    import ray.data

    from cloudtile_ray.stages.multimodal import media_dedup, synthesize_media_table

    t = synthesize_media_table(80)
    out = media_dedup(ray.data.from_arrow(t).repartition(3)).to_pandas()
    assert len(out) == 80
    assert (out["n_copies"] == 1).all()
    assert sorted(out["keep_id"]) == list(range(80))


def test_bloom_registers_brute_force(ray_session):
    """Counting-Bloom cell state vs a numpy replay: per-cell counts sum
    exactly across blocks for every hash function."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.sketches import BLOOM_MULTS, bloom_registers_exact

    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 40, 5000).astype(np.int64)
    want = {}
    for j, m in enumerate(BLOOM_MULTS):
        h = (x.astype(np.uint64) * np.uint64(m)) >> np.uint64(52)
        b, c = np.unique(h.astype(np.int64), return_counts=True)
        for bb, cc in zip(b, c):
            want[(j, int(bb))] = int(cc)
    ds = ray.data.from_arrow(pa.table({"user_id": pa.array(x)})).repartition(6)
    out = bloom_registers_exact(ds, "user_id").to_pandas()
    got = {
        (int(r.j), int(r.bit)): int(r.n) for r in out.itertuples(index=False)
    }
    assert got == want


def test_compact_tiles_brute_force(ray_session):
    """Quadtree compaction vs a set replay: full sibling quads collapse
    recursively; the output cover expands back to exactly the input
    set at max zoom and no output cell's parent is fully covered."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.tiles import compact_tiles

    z = 4
    rng = np.random.default_rng(21)
    # dense block (guaranteed promotions) + sparse scatter
    xs, ys = np.meshgrid(np.arange(4, 12), np.arange(0, 8))
    cells = {(int(a), int(b)) for a, b in zip(xs.ravel(), ys.ravel())}
    cells |= {
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 16, 60), rng.integers(0, 16, 60))
    }
    full = {z: set(cells)}
    for zz in range(z, 0, -1):
        parents = {}
        for (a, b) in full[zz]:
            parents.setdefault((a // 2, b // 2), 0)
            parents[(a // 2, b // 2)] += 1
        full[zz - 1] = {p for p, c in parents.items() if c == 4}
    want = set()
    for zz in range(z, -1, -1):
        for (a, b) in full[zz]:
            if zz == 0 or (a // 2, b // 2) not in full[zz - 1]:
                want.add((zz, a, b))
    arr = np.array(sorted(cells), dtype=np.int64)
    # feed duplicates to exercise the distinct exchange
    arr = np.concatenate([arr, arr[: len(arr) // 2]])
    t = pa.table({"x": pa.array(arr[:, 0]), "y": pa.array(arr[:, 1])})
    out = compact_tiles(ray.data.from_arrow(t).repartition(5), z).to_pandas()
    got = {(int(r.z), int(r.x), int(r.y)) for r in out.itertuples(index=False)}
    assert got == want
    # expansion sanity: the cover expands back to exactly the input set
    expanded = set()
    for (zz, a, b) in got:
        f = 1 << (z - zz)
        for da in range(f):
            for db in range(f):
                expanded.add((a * f + da, b * f + db))
    assert expanded == cells


def test_source_checksums_brute_force(ray_session):
    """Wrapping-sum manifest vs a numpy replay, invariant under
    parallelism and row order."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.relational import source_checksums

    rng = np.random.default_rng(8)
    n = 4000
    keys = rng.integers(0, 1 << 48, n).astype(np.int64)
    chars = rng.integers(0, 1000, n).astype(np.int64)
    grp = np.array(["s0", "s1", "s2"])[rng.integers(0, 3, n)]
    mult = np.uint64(0x9E3779B97F4A7C15)
    want = {}
    for g in np.unique(grp):
        m = grp == g
        ck = int((keys[m].astype(np.uint64) * mult).sum(dtype=np.uint64))
        if ck >= 1 << 63:
            ck -= 1 << 64
        want[str(g)] = (int(m.sum()), int(chars[m].sum()), ck)
    t = pa.table(
        {
            "doc_id": pa.array(keys),
            "source": pa.array(grp),
            "n_chars": pa.array(chars),
        }
    )
    out = source_checksums(
        ray.data.from_arrow(t).repartition(7), "doc_id", "source", "n_chars"
    ).to_pandas()
    got = {
        r.source: (int(r.n_rows), int(r.sum_chars), int(r.checksum))
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_vocab_coverage_brute_force(ray_session):
    """Coverage ladder vs a python replay with (count desc, token asc)
    rank ties."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.text import vocab_coverage

    docs = ["a a a b", "b c c a", "d e a b", "f f f f a"]
    toks = " ".join(docs).split(" ")
    from collections import Counter

    cnt = Counter(toks)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = len(toks)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
        }
    )
    out = vocab_coverage(
        ray.data.from_arrow(t).repartition(2), ks=(1, 2, 3, 100)
    ).to_pandas()
    got = {int(r.k): (int(r.covered), int(r.total_tokens)) for r in out.itertuples(index=False)}
    want = {}
    for k in (1, 2, 3, 100):
        want[k] = (sum(c for _, c in ranked[:k]), total)
    assert got == want


def test_debounce_events_brute_force(ray_session):
    """Windowed first-event dedup vs a python replay with ts ties
    broken by event_id; null types dropped."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import debounce_events

    rng = np.random.default_rng(15)
    n = 3000
    u = rng.integers(0, 30, n).astype(np.int64)
    ts = rng.integers(0, 5_000, n).astype(np.int64)  # tiny window forces ties
    eid = rng.permutation(n).astype(np.int64)
    pool = ["a", "b", None]
    types = [pool[i] for i in rng.integers(0, 3, n)]
    W = 1000
    best = {}
    cnt = {}
    for uu, tt, ee, ty in zip(u, ts, eid, types):
        if ty is None:
            continue
        k = (int(uu), ty, int(tt) // W)
        cnt[k] = cnt.get(k, 0) + 1
        if k not in best or (int(tt), int(ee)) < best[k]:
            best[k] = (int(tt), int(ee))
    want = {k: (v[1], cnt[k]) for k, v in best.items()}
    t = pa.table(
        {
            "user_id": pa.array(u),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "event_id": pa.array(eid),
            "event_type": pa.array(types, pa.string()),
        }
    )
    out = debounce_events(
        ray.data.from_arrow(t).repartition(6), window_us=W
    ).to_pandas()
    got = {
        (int(r.user_id), r.event_type, int(r.win)): (
            int(r.keep_event_id),
            int(r.n_events),
        )
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_rank_u_statistic_brute_force(ray_session):
    """2U vs the O(n*m) pair count: 2*#(a>b) + #(a==b)."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import rank_u_statistic

    rng = np.random.default_rng(44)
    na, nb = 400, 300
    va = np.round(rng.uniform(0, 20, na), 2)
    vb = np.round(rng.uniform(0, 20, nb), 2)
    ca = np.rint(va * 100).astype(np.int64)
    cb = np.rint(vb * 100).astype(np.int64)
    u2 = int(
        2 * (ca[:, None] > cb[None, :]).sum()
        + (ca[:, None] == cb[None, :]).sum()
    )
    types = ["purchase"] * na + ["view"] * nb + ["other"] * 50
    vals = np.concatenate([va, vb, np.full(50, 3.0)])
    t = pa.table(
        {"event_type": pa.array(types), "value": pa.array(vals)}
    )
    out = rank_u_statistic(
        ray.data.from_arrow(t).repartition(5), "purchase", "view"
    ).to_pandas()
    assert (
        int(out["n_a"][0]),
        int(out["n_b"][0]),
        int(out["u2"][0]),
    ) == (na, nb, u2)


def test_quantized_centroids_brute_force(ray_session):
    """Integer centroid numerators vs a per-vector numpy replay,
    including a zero vector and ragged-safe dims."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.similarity import quantized_centroids

    rng = np.random.default_rng(31)
    n, d = 200, 8
    emb = rng.normal(0, 1, (n, d)).astype(np.float32)
    emb[7] = 0.0  # all-zero vector -> zero codes
    lab = rng.integers(0, 4, n).astype(np.int32)
    want = {}
    for i in range(n):
        v = emb[i].astype(np.float64)
        s = np.abs(v).max() / 127.0
        q = np.floor(v / s + 0.5).astype(np.int64) if s > 0 else np.zeros(d, np.int64)
        for j in range(d):
            k = (int(lab[i]), j)
            cs, nv = want.get(k, (0, 0))
            want[k] = (cs + int(q[j]), nv + 1)
    t = pa.table(
        {
            "label": pa.array(lab),
            "embedding": pa.array(
                [row.tolist() for row in emb], pa.list_(pa.float32())
            ),
        }
    )
    out = quantized_centroids(
        ray.data.from_arrow(t).repartition(5)
    ).to_pandas()
    got = {
        (int(r.label), int(r.dim)): (int(r.code_sum), int(r.n_vecs))
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_bearing_sectors_brute_force(ray_session):
    """Octant ladder vs a python first-match replay over random integer
    segments including axis and diagonal rays."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.lines import bearing_sectors

    rng = np.random.default_rng(77)
    n = 2000
    dx = rng.integers(-50, 51, n).astype(np.int64)
    dy = rng.integers(-50, 51, n).astype(np.int64)
    # force boundary coverage: axes and both diagonals
    dx[:8] = [5, 0, -5, 0, 5, -5, 5, -5]
    dy[:8] = [0, 5, 0, -5, 5, -5, -5, 5]
    ax = rng.integers(-1000, 1000, n).astype(np.int64)
    ay = rng.integers(-1000, 1000, n).astype(np.int64)

    def py_sector(x, y):
        if x > 0 and y >= 0 and x > y:
            return 0
        if x > 0 and y > 0:
            return 1
        if x <= 0 and y > 0 and -x < y:
            return 2
        if x < 0 and y > 0:
            return 3
        if x < 0 and y <= 0 and -x > -y:
            return 4
        if x < 0 and y < 0:
            return 5
        if x >= 0 and y < 0 and x < -y:
            return 6
        return 7

    want = {}
    for i in range(n):
        if dx[i] == 0 and dy[i] == 0:
            continue
        s = py_sector(int(dx[i]), int(dy[i]))
        c, l = want.get(s, (0, 0))
        want[s] = (c + 1, l + max(abs(int(dx[i])), abs(int(dy[i]))))
    t = pa.table(
        {
            "ax_mi": pa.array(ax),
            "ay_mi": pa.array(ay),
            "bx_mi": pa.array(ax + dx),
            "by_mi": pa.array(ay + dy),
        }
    )
    out = bearing_sectors(ray.data.from_arrow(t).repartition(4)).to_pandas()
    got = {
        int(r.sector): (int(r.n_segments), int(r.cheb_len_sum))
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_out_of_order_arrivals_brute_force(ray_session):
    """Disorder audit vs a python replay over shuffled arrival order."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import out_of_order_arrivals

    rng = np.random.default_rng(52)
    n = 3000
    u = rng.integers(0, 40, n).astype(np.int64)
    ts = rng.integers(0, 100_000, n).astype(np.int64)
    eid = rng.permutation(n).astype(np.int64)
    want = {}
    for uu in np.unique(u):
        m = u == uu
        order = np.argsort(eid[m])
        t_s = ts[m][order]
        d = t_s[:-1] - t_s[1:]
        want[int(uu)] = (
            int(m.sum()),
            int((d > 0).sum()),
            int(max(d.max(), 0)) if len(d) else 0,
        )
    t = pa.table(
        {
            "user_id": pa.array(u),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "event_id": pa.array(eid),
        }
    )
    out = out_of_order_arrivals(
        ray.data.from_arrow(t).repartition(6)
    ).to_pandas()
    got = {
        int(r.user_id): (
            int(r.n_arrivals),
            int(r.n_ooo),
            int(r.max_backstep_us),
        )
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_order_item_pairs_brute_force(ray_session):
    """Basket pair mining vs an O(n^2) python replay, with duplicate
    (order, item) rows collapsing before expansion."""
    import pyarrow as pa
    import ray.data
    from itertools import combinations

    from cloudtile_ray.stages.relational import order_item_pairs

    rng = np.random.default_rng(9)
    n = 3000
    orders = rng.integers(0, 400, n).astype(np.int64)
    items = rng.integers(0, 40, n).astype(np.int64)
    baskets = {}
    for o, i in zip(orders, items):
        baskets.setdefault(int(o), set()).add(int(i))
    want = {}
    for its in baskets.values():
        for a, b in combinations(sorted(its), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    want = {k: v for k, v in want.items() if v >= 3}
    t = pa.table(
        {"l_orderkey": pa.array(orders), "l_partkey": pa.array(items)}
    )
    out = order_item_pairs(
        ray.data.from_arrow(t).repartition(6),
        "l_orderkey",
        "l_partkey",
        min_support=3,
    ).to_pandas()
    got = {
        (int(r.part_a), int(r.part_b)): int(r.n_orders)
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_histogram_drift_brute_force(ray_session):
    """TVD numerator vs a python replay, negative values exercising the
    floor-division bin rule."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import histogram_drift

    rng = np.random.default_rng(66)
    na, nb = 500, 700
    va = np.round(rng.uniform(-10, 30, na), 2)
    vb = np.round(rng.uniform(-5, 40, nb), 2)
    ca = np.rint(va * 100).astype(np.int64) // 500
    cb = np.rint(vb * 100).astype(np.int64) // 500
    bins = np.union1d(ca, cb)
    tvd = 0
    for b in bins:
        tvd += abs(int((ca == b).sum()) * nb - int((cb == b).sum()) * na)
    types = ["purchase"] * na + ["view"] * nb + [None] * 20
    vals = np.concatenate([va, vb, np.zeros(20)])
    t = pa.table(
        {"event_type": pa.array(types, pa.string()), "value": pa.array(vals)}
    )
    out = histogram_drift(
        ray.data.from_arrow(t).repartition(5), "purchase", "view"
    ).to_pandas()
    assert (
        int(out["n_a"][0]),
        int(out["n_b"][0]),
        int(out["tvd_num"][0]),
    ) == (na, nb, tvd)


def test_user_accretion_brute_force(ray_session):
    """First-appearance growth curve vs a python replay."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import user_accretion

    rng = np.random.default_rng(41)
    n = 4000
    u = rng.integers(0, 200, n).astype(np.int64)
    day = rng.integers(0, 25, n).astype(np.int64)
    ts = day * 86_400_000_000 + rng.integers(0, 86_400_000_000, n)
    first = {}
    for uu, dd in zip(u, day):
        if int(uu) not in first or dd < first[int(uu)]:
            first[int(uu)] = int(dd)
    from collections import Counter

    per_day = Counter(first.values())
    want = []
    cum = 0
    for d in sorted(per_day):
        cum += per_day[d]
        want.append((d, per_day[d], cum))
    t = pa.table(
        {"user_id": pa.array(u), "ts": pa.array(ts.astype("datetime64[us]"))}
    )
    out = user_accretion(ray.data.from_arrow(t).repartition(6)).to_pandas()
    got = [
        (int(r.day), int(r.new_users), int(r.cum_users))
        for r in out.sort_values("day").itertuples(index=False)
    ]
    assert got == want


def test_day_churn_brute_force(ray_session):
    """Next-day retention vs a python set replay."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import day_churn

    rng = np.random.default_rng(14)
    n = 5000
    u = rng.integers(0, 150, n).astype(np.int64)
    day = rng.integers(0, 20, n).astype(np.int64)
    ts = day * 86_400_000_000 + rng.integers(0, 86_400_000_000, n)
    active = {}
    for uu, dd in zip(u, day):
        active.setdefault(int(dd), set()).add(int(uu))
    want = {}
    for d, users in active.items():
        nxt = active.get(d + 1, set())
        ret = len(users & nxt)
        want[d] = (len(users), ret, len(users) - ret)
    t = pa.table(
        {"user_id": pa.array(u), "ts": pa.array(ts.astype("datetime64[us]"))}
    )
    out = day_churn(ray.data.from_arrow(t).repartition(7)).to_pandas()
    got = {
        int(r.day): (int(r.n_active), int(r.n_retained), int(r.n_churned))
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_bloom_fp_audit_brute_force(ray_session):
    """FP audit vs a python bloom replay: pass superset of truth, fp =
    pass - true, and a tiny filter actually produces false positives."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.sketches import BLOOM_MULTS, bloom_fp_audit

    rng = np.random.default_rng(19)
    n = 4000
    keys = rng.integers(0, 1 << 30, n).astype(np.int64)
    member = rng.random(n) < 0.2
    m_log2 = 8
    shift = np.uint64(64 - m_log2)
    bits = set()
    mset = set(keys[member].tolist())
    for x in mset:
        for j, m in enumerate(BLOOM_MULTS):
            bits.add((j, int((np.uint64(x) * np.uint64(m)) >> shift)))
    n_pass = 0
    for x in keys:
        if all(
            (j, int((np.uint64(x) * np.uint64(m)) >> shift)) in bits
            for j, m in enumerate(BLOOM_MULTS)
        ):
            n_pass += 1
    n_true = sum(1 for x in keys if int(x) in mset)
    t = pa.table(
        {"user_id": pa.array(keys), "is_member": pa.array(member)}
    )
    out = bloom_fp_audit(
        ray.data.from_arrow(t).repartition(5),
        "user_id",
        "is_member",
        m_log2=m_log2,
    ).to_pandas()
    assert (
        int(out["n_tested"][0]),
        int(out["n_pass"][0]),
        int(out["n_true"][0]),
        int(out["n_fp"][0]),
    ) == (n, n_pass, n_true, n_pass - n_true)
    assert int(out["n_fp"][0]) > 0  # tiny filter must show real FPs


def test_rolling_active_users_brute_force(ray_session):
    """Window-distinct vs a python set replay at several window sizes."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import rolling_active_users

    rng = np.random.default_rng(23)
    n = 4000
    u = rng.integers(0, 80, n).astype(np.int64)
    day = rng.integers(0, 40, n).astype(np.int64)
    ts = day * 86_400_000_000 + rng.integers(0, 86_400_000_000, n)
    t = pa.table(
        {"user_id": pa.array(u), "ts": pa.array(ts.astype("datetime64[us]"))}
    )
    for W in (1, 3, 7):
        active = {}
        for uu, dd in zip(u, day):
            active.setdefault(int(dd), set()).add(int(uu))
        want = {}
        for d in active:
            s = set()
            for d2 in range(d - W + 1, d + 1):
                s |= active.get(d2, set())
            want[d] = len(s)
        out = rolling_active_users(
            ray.data.from_arrow(t).repartition(6), window_days=W
        ).to_pandas()
        got = {
            int(r.day): int(r.n_active_w) for r in out.itertuples(index=False)
        }
        assert got == want, W


def test_rank_u_statistic_no_matching_types(ray_session):
    """Review fix: absent type names yield the (0, 0, 0) row, not an
    ArrowInvalid from concat of zero gathered blocks."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import rank_u_statistic

    t = pa.table(
        {"event_type": pa.array(["x", "y"]), "value": pa.array([1.0, 2.0])}
    )
    out = rank_u_statistic(
        ray.data.from_arrow(t), "purchase", "view"
    ).to_pandas()
    assert (
        int(out["n_a"][0]),
        int(out["n_b"][0]),
        int(out["u2"][0]),
    ) == (0, 0, 0)


def test_rolling_active_users_negative_days(ray_session):
    """Review fix: pre-epoch activity (negative days) must not have
    island ends clamped to day 0."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import rolling_active_users

    # user 1 active day -10; user 2 active day -2; window 3
    ts = np.array([-10, -2], dtype=np.int64) * 86_400_000_000
    t = pa.table(
        {
            "user_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
        }
    )
    out = rolling_active_users(
        ray.data.from_arrow(t), window_days=3
    ).to_pandas()
    got = {int(r.day): int(r.n_active_w) for r in out.itertuples(index=False)}
    assert got == {-10: 1, -2: 1}


def test_quantized_centroids_empty_trailing_vector(ray_session):
    """Review fix: a zero-length embedding in the batch tail must not
    crash the reduceat scale pass."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.similarity import quantized_centroids

    t = pa.table(
        {
            "label": pa.array([0, 0, 1], pa.int32()),
            "embedding": pa.array(
                [[1.0, -2.0], [0.5, 0.5], []], pa.list_(pa.float32())
            ),
        }
    )
    out = quantized_centroids(ray.data.from_arrow(t)).to_pandas()
    got = {
        (int(r.label), int(r.dim)): (int(r.code_sum), int(r.n_vecs))
        for r in out.itertuples(index=False)
    }
    # label 0: v1 scale=2/127 -> codes (64, -127); v2 scale=.5/127 -> (127, 127)
    assert got == {(0, 0): (64 + 127, 2), (0, 1): (-127 + 127, 2)}


def test_hash_negative_samples_brute_force(ray_session):
    """Negative sampling vs a python replay: bounded kmv pools per
    label, complement indexing, no same-label negatives."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.similarity import hash_negative_samples

    rng = np.random.default_rng(28)
    n = 600
    ids = rng.permutation(10_000)[:n].astype(np.int64)
    lab = rng.integers(0, 4, n).astype(np.int64)
    MULT = 0x9E3779B97F4A7C15
    POOL, K = 16, 3
    hv = {int(i): int(np.uint64(i) * np.uint64(MULT)) for i in ids}
    pools = {}
    for L in np.unique(lab):
        members = sorted(
            (int(i) for i in ids[lab == L]), key=lambda i: (hv[i], i)
        )[:POOL]
        pools[int(L)] = members
    want = set()
    for i, L in zip(ids, lab):
        comp = [
            v
            for L2 in sorted(pools)
            if L2 != int(L)
            for v in sorted(pools[L2], key=lambda x: (hv[x], x))
        ]
        base = hv[int(i)] % len(comp)
        for j in range(K):
            want.add((int(i), j, comp[(base + j) % len(comp)]))
    t = pa.table({"vec_id": pa.array(ids), "label": pa.array(lab)})
    out = hash_negative_samples(
        ray.data.from_arrow(t).repartition(5),
        "vec_id",
        "label",
        k_neg=K,
        pool_size=POOL,
    ).to_pandas()
    got = {
        (int(r.vec_id), int(r.j), int(r.neg_id))
        for r in out.itertuples(index=False)
    }
    assert got == want
    lab_of = {int(i): int(L) for i, L in zip(ids, lab)}
    assert all(lab_of[v] != lab_of[ng] for v, _, ng in got)


def test_coarrival_pairs_brute_force(ray_session):
    """Windowed ordered type-pair counts vs an O(n^2) python replay,
    including equal-timestamp eid ordering and cross-user isolation."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.events import coarrival_pairs

    rng = np.random.default_rng(35)
    n = 2500
    u = rng.integers(0, 50, n).astype(np.int64)
    ts = rng.integers(0, 5_000, n).astype(np.int64)  # dense -> window hits
    eid = rng.permutation(n).astype(np.int64)
    pool = ["a", "b", "c", None]
    types = [pool[i] for i in rng.integers(0, 4, n)]
    W = 100
    want = {}
    rows = [
        (int(uu), int(tt), int(ee), ty)
        for uu, tt, ee, ty in zip(u, ts, eid, types)
        if ty is not None
    ]
    by_user = {}
    for r in rows:
        by_user.setdefault(r[0], []).append(r)
    for evs in by_user.values():
        evs.sort(key=lambda r: (r[1], r[2]))
        for i in range(len(evs)):
            for j in range(i + 1, len(evs)):
                if evs[j][1] - evs[i][1] > W:
                    break
                if evs[j][3] != evs[i][3]:
                    k = (evs[i][3], evs[j][3])
                    want[k] = want.get(k, 0) + 1
    t = pa.table(
        {
            "user_id": pa.array(u),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "event_id": pa.array(eid),
            "event_type": pa.array(types, pa.string()),
        }
    )
    out = coarrival_pairs(
        ray.data.from_arrow(t).repartition(6), window_us=W
    ).to_pandas()
    got = {
        (r.type_first, r.type_second): int(r.n)
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_dow_profile_brute_force(ray_session):
    """Weekly profile vs a python replay: lower median of daily counts
    per (type, dow)."""
    import pyarrow as pa
    import ray.data

    from __ray_entry__ import q_dow_profile  # query-level op

    rng = np.random.default_rng(61)
    n = 4000
    day = rng.integers(0, 60, n).astype(np.int64)
    ts = day * 86_400_000_000 + rng.integers(0, 86_400_000_000, n)
    pool = ["a", "b", None]
    types = [pool[i] for i in rng.integers(0, 3, n)]
    import tempfile, os
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(np.arange(n, dtype=np.int64)),
                    "ts": pa.array(ts.astype("datetime64[us]")),
                    "user_id": pa.array(np.zeros(n, dtype=np.int64)),
                    "event_type": pa.array(types, pa.string()),
                    "value": pa.array(np.zeros(n)),
                    "props": pa.array([""] * n),
                }
            ),
            os.path.join(td, "events.parquet"),
        )
        out = q_dow_profile(td).to_pandas()
    daily = {}
    for dd, ty in zip(day, types):
        if ty is None:
            continue
        daily[(ty, int(dd))] = daily.get((ty, int(dd)), 0) + 1
    cells = {}
    for (ty, dd), c in daily.items():
        cells.setdefault((ty, (dd + 4) % 7), []).append(c)
    want = {
        k: (sorted(v)[(len(v) - 1) // 2], len(v)) for k, v in cells.items()
    }
    got = {
        (r.event_type, int(r.dow)): (int(r.median_daily), int(r.n_days))
        for r in out.itertuples(index=False)
    }
    assert got == want


def test_max_token_run_brute_force(ray_session):
    """Longest consecutive run vs a python replay, incl. tie-breaks."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.text import max_token_run_batch

    docs = {
        0: "a a a b b c",
        1: "b a a b b z",          # tie run 2: 'a' wins alphabetically
        2: "z z z z",
        3: "q",
        4: "m n m n m n",          # all runs length 1, 'm' wins
    }
    want = {}
    for d, text in docs.items():
        toks = text.split(" ")
        runs = {}
        i = 0
        while i < len(toks):
            j = i
            while j < len(toks) and toks[j] == toks[i]:
                j += 1
            runs[toks[i]] = max(runs.get(toks[i], 0), j - i)
            i = j
        best = sorted(runs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want[d] = (best[0], best[1])
    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values())),
        }
    )
    out = (
        ray.data.from_arrow(t)
        .repartition(2)
        .map_batches(max_token_run_batch, batch_format="pyarrow")
        .to_pandas()
    )
    got = {int(r.doc_id): (r.tk, int(r.run_len)) for r in out.itertuples(index=False)}
    assert got == want


def test_uncompact_inverts_compact(ray_session):
    """compact -> uncompact round trip returns exactly the input set."""
    import pyarrow as pa
    import ray.data

    from cloudtile_ray.stages.tiles import compact_tiles, uncompact_tiles

    rng = np.random.default_rng(73)
    z = 5
    xs, ys = np.meshgrid(np.arange(8, 16), np.arange(16, 24))
    cells = {(int(a), int(b)) for a, b in zip(xs.ravel(), ys.ravel())}
    cells |= {
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 32, 40), rng.integers(0, 32, 40))
    }
    arr = np.array(sorted(cells), dtype=np.int64)
    t = pa.table({"x": pa.array(arr[:, 0]), "y": pa.array(arr[:, 1])})
    cover = compact_tiles(ray.data.from_arrow(t).repartition(4), z)
    out = uncompact_tiles(cover, z).to_pandas()
    got = {(int(r.x), int(r.y)) for r in out.itertuples(index=False)}
    assert got == cells
    assert len(out) == len(cells)  # no duplicates either
