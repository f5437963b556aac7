"""Archive writer round-trip + near-dup cluster resolution tests."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


class TestArchive:
    def test_roundtrip_and_clustered(self, sf_tiny, tmp_path):
        from cloudtile_ray.pipelines.single_step import single_step
        from cloudtile_ray.stages.tiles import decode_tile
        from cloudtile_ray.state.archive import ArchiveReader, write_archive

        tiles = single_step(sf_tiny, 4, 5)
        df = tiles.to_pandas()
        path = tmp_path / "tiles.pmtiles"
        info = write_archive(tiles, path)
        assert info["n_tiles"] == len(df)
        rd = ArchiveReader(path)
        assert len(rd) == len(df)
        assert rd.is_clustered()
        # every tile readable and byte-identical
        for row in df.sample(20, random_state=0).itertuples():
            blob = rd.read_tile(row.z, row.x, row.y)
            assert blob == row.tile_bytes
            d = decode_tile(blob)
            assert (d["z"], d["x"], d["y"]) == (row.z, row.x, row.y)
        assert rd.read_tile(4, 9999, 0) is None

    def test_not_an_archive(self, tmp_path):
        from cloudtile_ray.state.archive import ArchiveReader

        p = tmp_path / "x.pmtiles"
        p.write_bytes(b"garbage-header-bytes")
        with pytest.raises(ValueError):
            ArchiveReader(p)

    def test_header_magic_and_spec_walk(self, sf_tiny, tmp_path):
        """The file leads with the spec'd 127-byte PMTiles v3 header and a
        varint root directory a reader can walk z/x/y -> bytes."""
        from cloudtile_ray.pipelines.single_step import single_step
        from cloudtile_ray.state.archive import HEADER_SIZE, ArchiveReader, write_archive

        tiles = single_step(sf_tiny, 4, 5)
        path = tmp_path / "t.pmtiles"
        write_archive(tiles, path)
        raw = path.read_bytes()
        assert raw[:7] == b"PMTiles" and raw[7] == 3
        rd = ArchiveReader(path)
        assert rd.min_zoom == 4 and rd.max_zoom == 5
        assert rd.metadata["generator"] == "cloudtile_ray"
        assert len(raw) > HEADER_SIZE

    def test_varint_directory_roundtrip_with_leaves(self):
        from cloudtile_ray.state.archive import (
            _deserialize_directory,
            _serialize_directory,
        )

        rng = np.random.default_rng(3)
        ids = np.unique(rng.integers(0, 1 << 40, 5000))
        off = 0
        entries = []
        for t in ids.tolist():
            ln = int(rng.integers(10, 2000))
            entries.append((int(t), off, ln, 1))
            off += ln
        blob = _serialize_directory(entries)
        assert _deserialize_directory(blob) == entries

    def test_high_zoom_ids_do_not_collide(self, ray_session, tmp_path):
        """Regression for the round-1 RTAR packing: z=16+ must address
        distinctly from low zooms (tile_id is cumulative-base + Hilbert)."""
        import ray.data

        from cloudtile_ray.state.archive import ArchiveReader, tile_id, write_archive

        zs = [0, 1, 15, 16, 20, 26]
        t = pa.table(
            {
                "z": pa.array(zs, pa.int64()),
                "x": pa.array([0, 1, 123, 456, 99, 7], pa.int64()),
                "y": pa.array([0, 0, 321, 654, 17, 3], pa.int64()),
                "tile_bytes": pa.array(
                    [f"blob-{z}".encode() for z in zs], pa.binary()
                ),
            }
        )
        ids = tile_id(
            t.column("z").to_numpy(zero_copy_only=False),
            t.column("x").to_numpy(zero_copy_only=False),
            t.column("y").to_numpy(zero_copy_only=False),
        )
        assert len(np.unique(ids)) == len(zs)
        path = tmp_path / "hz.pmtiles"
        write_archive(ray.data.from_arrow(t), path)
        rd = ArchiveReader(path)
        for z, x, y in zip(zs, [0, 1, 123, 456, 99, 7], [0, 0, 321, 654, 17, 3]):
            assert rd.read_tile(z, x, y) == f"blob-{z}".encode()
        with pytest.raises(ValueError):
            tile_id(np.array([27]), np.array([0]), np.array([0]))

    def test_leaf_directories_built_and_readable(self, ray_session, tmp_path):
        """A directory over the 16 KB root budget splits into leaf
        directories; lookups traverse root -> leaf -> data."""
        import ray.data

        from cloudtile_ray.state.archive import ArchiveReader, write_archive

        z = 12
        n = 6000
        xs = np.arange(n, dtype=np.int64) % 4096
        ys = np.arange(n, dtype=np.int64) // 4096 + 7
        t = pa.table(
            {
                "z": pa.array(np.full(n, z), pa.int64()),
                "x": pa.array(xs),
                "y": pa.array(ys),
                "tile_bytes": pa.array(
                    [f"b{i}".encode() for i in range(n)], pa.binary()
                ),
            }
        )
        path = tmp_path / "leafy.pmtiles"
        info = write_archive(ray.data.from_arrow(t).repartition(4), path)
        assert info["n_tiles"] == n
        rd = ArchiveReader(path)
        assert rd.leaf_len > 0  # leaves actually used
        assert rd.is_clustered()
        for i in [0, 1, 1234, 5999]:
            assert rd.read_tile(z, int(xs[i]), int(ys[i])) == f"b{i}".encode()
        assert rd.read_tile(z, 4000, 4000) is None


class TestClusters:
    def _pairs(self, edges):
        a, b = zip(*edges)
        return pa.table({"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())})

    def test_union_find_components(self):
        from cloudtile_ray.stages.dedup import resolve_clusters

        # components: {1,2,3,9}, {5,6}
        t = resolve_clusters(self._pairs([(2, 1), (3, 2), (9, 3), (5, 6)]))
        d = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in t.to_pylist()}
        assert d[1] == (1, True) and d[2] == (1, False)
        assert d[3] == (1, False) and d[9] == (1, False)
        assert d[5] == (5, True) and d[6] == (5, False)

    def test_drop_near_dups_filters(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.dedup import drop_near_dups

        docs = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(10), pa.int64()),
                      "text": pa.array([f"d{i}" for i in range(10)])})
        )
        out = drop_near_dups(docs, self._pairs([(0, 7), (7, 8)])).to_pandas()
        assert sorted(out.doc_id) == [0, 1, 2, 3, 4, 5, 6, 9]  # 7, 8 dropped

    def test_distributed_cc_matches_union_find_random(self, ray_session):
        """resolve_clusters_distributed (alternating large-star/small-star)
        must produce byte-identical labels to driver union-find on random
        graphs with chains, dup edges and reversed edges."""
        import numpy as np
        import ray.data

        from cloudtile_ray.stages.dedup import (
            _collect_small,
            resolve_clusters,
            resolve_clusters_distributed,
        )

        rng = np.random.default_rng(3)
        ids = rng.choice(1_000_000, size=1500, replace=False)
        edges, pos = [], 0
        while pos < len(ids):
            sz = int(rng.integers(1, 25))
            chunk = ids[pos : pos + sz]
            edges += [(int(chunk[i]), int(chunk[i + 1])) for i in range(len(chunk) - 1)]
            pos += sz
        extra = rng.integers(0, len(ids), size=(200, 2))
        edges += [(int(ids[i]), int(ids[j])) for i, j in extra]
        edges += [(b, a) for a, b in edges[:50]]  # reversed dups
        tbl = self._pairs(edges)
        ds = ray.data.from_arrow([tbl.slice(i, 131) for i in range(0, tbl.num_rows, 131)])
        ref = resolve_clusters(tbl).sort_by("doc_id")
        dist = _collect_small(
            resolve_clusters_distributed(ds, small_gate_pairs=0)
        ).sort_by("doc_id")
        assert dist.column("doc_id").to_pylist() == ref.column("doc_id").to_pylist()
        assert dist.column("cluster_id").to_pylist() == ref.column("cluster_id").to_pylist()
        assert dist.column("keep").to_pylist() == ref.column("keep").to_pylist()

    def test_distributed_cc_million_pairs(self, ray_session):
        """Scale check (VERDICT r2 #1 done-criterion): >= 1e6 synthetic
        pairs resolve through the distributed path and match union-find."""
        import numpy as np
        import ray.data

        from cloudtile_ray.stages.dedup import (
            _collect_small,
            resolve_clusters,
            resolve_clusters_distributed,
        )

        rng = np.random.default_rng(11)
        n_nodes = 400_000
        # ring-ish components of ~8 nodes + 600k random intra-range edges
        a = np.arange(n_nodes - 1, dtype=np.int64)
        b = a + 1
        mask = (b % 8) != 0  # break into chains of 8
        a, b = a[mask], b[mask]
        ra = rng.integers(0, n_nodes, 650_000)
        rb = (ra // 8) * 8 + rng.integers(0, 8, 650_000)  # same-chain randoms
        all_a = np.concatenate([a, ra]).astype(np.int64)
        all_b = np.concatenate([b, rb]).astype(np.int64)
        assert len(all_a) >= 1_000_000
        tbl = pa.table({"doc_a": pa.array(all_a), "doc_b": pa.array(all_b)})
        ds = ray.data.from_arrow(
            [tbl.slice(i, 100_000) for i in range(0, tbl.num_rows, 100_000)]
        )
        dist = _collect_small(
            resolve_clusters_distributed(ds, small_gate_pairs=0)
        ).sort_by("doc_id")
        ref = resolve_clusters(tbl).sort_by("doc_id")
        assert dist.num_rows == ref.num_rows
        assert (
            dist.column("cluster_id").to_numpy()
            == ref.column("cluster_id").to_numpy()
        ).all()

    def test_drop_near_dups_shuffle_is_fully_distributed(self, ray_session):
        """strategy='shuffle' routes through resolve_clusters_distributed +
        Dataset-side anti-join and must equal the broadcast result."""
        import ray.data

        from cloudtile_ray.stages.dedup import drop_near_dups

        docs = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(30), pa.int64()),
                      "text": pa.array([f"d{i}" for i in range(30)])})
        ).repartition(3)
        pairs = self._pairs([(0, 7), (7, 8), (12, 15), (20, 21), (21, 22), (22, 20)])
        bcast = sorted(drop_near_dups(docs, pairs, strategy="broadcast").to_pandas().doc_id)
        shuf = sorted(drop_near_dups(docs, pairs, strategy="shuffle").to_pandas().doc_id)
        assert bcast == shuf
        assert 7 not in shuf and 8 not in shuf and 15 not in shuf

    def test_end_to_end_minhash_dedup(self, ray_session):
        import ray.data

        from cloudtile_ray.stages.dedup import drop_near_dups, minhash_dedup_pairs

        base = "a long shared body of text that repeats across near duplicates " * 3
        texts = [base, base + " tail-1", base + " tail-2", "something else entirely " * 5]
        docs = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
        ).repartition(2)
        pairs = minhash_dedup_pairs(docs, threshold=0.6)
        kept = drop_near_dups(docs, pairs).to_pandas()
        assert sorted(kept.doc_id) == [0, 3]  # one keeper per cluster + the unique doc
