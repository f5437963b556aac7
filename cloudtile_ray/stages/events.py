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
    the cumulative-window operator.  Arrow-native group fn (lexsort +
    cumsum; VERDICT.md r2 minor #5 — no pandas detour)."""

    def per_user(g: pa.Table) -> pa.Table:
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        return pa.table(
            {
                "user_id": g.column("user_id").take(pa.array(order)),
                "event_id": pa.array(eid[order]),
                "running_cents": pa.array(np.cumsum(val[order])),
            }
        )

    return (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def session_windows(ds, gap_us: int = 3_600_000_000) -> "ray.data.Dataset":
    """Per-user session windows: a new session starts when the gap since
    the previous event exceeds ``gap_us``. Output one row per session with
    start/end and event count — the session-window operator.  Arrow-native
    group fn (lexsort + reduceat over session boundaries)."""

    def per_user(g: pa.Table) -> pa.Table:
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts_s, val_s = ts[order], val[order]
        n = len(ts_s)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = np.diff(ts_s) > gap_us
        starts = np.nonzero(new)[0]
        bounds = np.r_[starts[1:], n]
        uid = g.column("user_id")[0].as_py()
        return pa.table(
            {
                "user_id": pa.array(np.full(len(starts), uid, dtype=np.int64)),
                "session_seq": pa.array(np.arange(1, len(starts) + 1)),
                "start_us": pa.array(ts_s[starts]),
                "end_us": pa.array(ts_s[bounds - 1]),
                "n_events": pa.array((bounds - starts).astype(np.int64)),
                "sum_cents": pa.array(np.add.reduceat(val_s, starts).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
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
