"""In-repo oracle certification for the session-3 registry additions:
each query runs against /root/testdata/sf0.001 side-by-side with its
DuckDB oracle — the same dtype-strict compare the driver's gate and
scripts/check_correctness.py apply, but INSIDE the test suite so a
regression in any of these queries fails `pytest` directly instead of
relying on the external sweep."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# the session-3 queries with no dedicated brute-force test of their own
NAMES = [
    "benford_digits",
    "lang_confusion",
    "fano_factor",
    "order_backlog",
    "multigrain_actives",
    "ivm_hourly",
    "region_share",
    "seasonal_anomalies",
    "dow_profile",
    "tile_uncompact",
    "shipping_lag",
    "grid_adjacency",
    "pyramid_audit",
    "hapax_stats",
    "revenue_concentration",
    "type_profiles",
    "tfidf_terms",
    "vocab_coverage",
    "source_checksums",
    "basket_lift",
    "media_resize_audit",
    "media_frames_audit",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(ray_session, oracle_con, name):
    import __ray_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = fn(SF_DIR)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = oracle_con.sql(sql).df()
    got, want = _canon(got), _canon(want)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=True,
        check_exact=True,
    )
