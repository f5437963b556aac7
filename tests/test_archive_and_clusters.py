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
        path = tmp_path / "tiles.rtar"
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

        p = tmp_path / "x.rtar"
        p.write_bytes(b"garbage-header-bytes")
        with pytest.raises(ValueError):
            ArchiveReader(p)


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
