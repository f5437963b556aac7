"""Stream-shaped operators over the ordered ``events`` table, expressed per
the Ray Data batch model (no watermarks — the reference is strictly batch
too, SURVEY.md §2.3 "streaming-only: absent"): the input is treated as a
partitioned log, partitioned by ``user_id`` and sorted by (ts, event_id)
within each partition via ``groupby(user_id).map_groups``.

Ordering assumption (documented per the guide): results are functions of
the per-user event sequence ordered by (ts, event_id) — event_id breaks ts
ties deterministically, so output is reproducible at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def prep_events(batch: pa.Table) -> pa.Table:
    """Append epoch-us and integer-cents columns (exact arithmetic shared
    with the DuckDB oracles)."""
    ts = batch.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    v = batch.column("value").to_numpy(zero_copy_only=False)
    out = batch.append_column("ts_us", pa.array(ts))
    return out.append_column("value_cents", pa.array(np.rint(v * 100).astype(np.int64)))


def running_totals(ds) -> "ray.data.Dataset":
    """Per-user running sum of value_cents in (ts, event_id) order —
    the cumulative-window operator."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"])
        g["running_cents"] = g["value_cents"].cumsum()
        return g[["user_id", "event_id", "running_cents"]]

    return (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def session_windows(ds, gap_us: int = 3_600_000_000) -> "ray.data.Dataset":
    """Per-user session windows: a new session starts when the gap since
    the previous event exceeds ``gap_us``. Output one row per session with
    start/end and event count — the session-window operator."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"])
        new = (g["ts_us"].diff().fillna(gap_us + 1) > gap_us).astype(np.int64)
        g["session_seq"] = new.cumsum()
        agg = g.groupby("session_seq").agg(
            start_us=("ts_us", "min"),
            end_us=("ts_us", "max"),
            n_events=("event_id", "count"),
            sum_cents=("value_cents", "sum"),
        ).reset_index()
        agg.insert(0, "user_id", g["user_id"].iloc[0])
        return agg

    return (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def sliding_window_counts(ds, width_us: int, step_us: int) -> "ray.data.Dataset":
    """Per-event-type sliding-window counts (window start stepped by
    ``step_us``; each event lands in width/step consecutive windows) —
    implemented as a vectorized explode + groupby, no per-row Python."""

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        et = batch.column("event_type")
        k = int(width_us // step_us)
        first = (ts - width_us + step_us) // step_us  # first window containing ts
        parts = []
        for j in range(k):
            w = first + j
            keep = (w * step_us <= ts) & (ts < w * step_us + width_us)
            idx = np.nonzero(keep)[0]
            parts.append(
                pa.table(
                    {
                        "window_start_us": pa.array((w[idx] * step_us).astype(np.int64)),
                        "event_type": et.take(pa.array(idx)),
                    }
                )
            )
        return pa.concat_tables(parts)

    from ray.data.aggregate import Count

    return (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["window_start_us", "event_type"])
        .aggregate(Count(alias_name="n"))
    )
