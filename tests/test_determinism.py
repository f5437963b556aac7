"""Cross-parallelism determinism of the FULL headline (points + polygons):
identical sorted outputs regardless of partitioning (FIXTURES.md §4
"same input at num_cpus=8 vs 32 -> identical sorted output tables" —
evidenced here by varying the block structure inside one session, which is
what parallelism changes affect)."""

import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _full(sf_dir, nparts):
    from cloudtile_ray.pipelines.single_step import geocoded_dataset
    from cloudtile_ray.stages.index import AssignTiles
    from cloudtile_ray.stages.polygons import (
        AssignPolygonTiles, encode_poly_tiles, extract_footprints,
    )
    from cloudtile_ray.stages.tiles import encode_tiles

    geo = geocoded_dataset(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "lon", "lat", "footprint_mi"]),
        batch_format="pyarrow",
    ).repartition(nparts)
    pts = geo.map_batches(
        lambda t: t.select(["doc_id", "lon", "lat"]), batch_format="pyarrow"
    ).map_batches(AssignTiles(4, 6), batch_format="pyarrow")
    point_tiles = (
        encode_tiles(pts, n_partitions=7)
        .to_pandas()
        .sort_values(["z", "x", "y"])
        .reset_index(drop=True)
    )
    fp = geo.map_batches(extract_footprints, batch_format="pyarrow")
    poly_tiles = (
        encode_poly_tiles(
            fp.map_batches(AssignPolygonTiles(4, 6), batch_format="pyarrow"),
            n_partitions=7,
        )
        .to_pandas()
        .sort_values(["z", "x", "y"])
        .reset_index(drop=True)
    )
    return point_tiles, poly_tiles


def test_full_headline_deterministic_across_partitioning(sf_tiny):
    p1, g1 = _full(sf_tiny, 2)
    p2, g2 = _full(sf_tiny, 11)
    pd.testing.assert_frame_equal(p1, p2)  # includes tile_bytes
    pd.testing.assert_frame_equal(g1, g2)  # includes poly_bytes
