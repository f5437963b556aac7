"""Stream-shaped operators over the ordered ``events`` table, expressed per
the Ray Data batch model (no watermarks — the reference is strictly batch
too, SURVEY.md §2.3 "streaming-only: absent"): the input is treated as a
partitioned log, partitioned by ``user_id % num_buckets`` and sorted by
(user_id, ts, event_id) within each partition, with every per-user window
computed SEGMENTED over the bucket (one lexsort; per-user boundaries via
change flags; cumsum/reduceat offsets per segment).

Why buckets and not ``groupby(user_id)``: user ids are near-unique keys at
corpus scale, and Ray's group machinery (map_groups and AggregateFn alike)
runs Python per group — several hundred us per user, hours of overhead at
10^9 users (measured on 2.49.2; see
``relational.bucketed_group_aggregate``).  The bucket exchange keys on a
few hundred values and the segmented kernels do the per-user work
vectorized.

Ordering assumption (documented per the guide): results are functions of
the per-user event sequence ordered by (ts, event_id) — event_id breaks ts
ties deterministically, so output is reproducible at any parallelism.
Per-user series must fit one bucket task alongside its bucket peers — the
same bound the per-user windows need anyway; a hot user would be salted by
time range with a carry-forward row per boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _n_user_buckets(ds=None) -> int:
    from cloudtile_ray.stages.util import default_num_buckets

    return default_num_buckets(ds)


def _add_user_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    u = batch.column("user_id").to_numpy(zero_copy_only=False)
    return batch.append_column(
        "_ubkt", pa.array((u % num_buckets).astype(np.int64))
    )


def _user_segments(u_s: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(segment starts, per-row segment-start index) for a user-sorted
    array."""
    n = len(u_s)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = u_s[1:] != u_s[:-1]
    starts = np.nonzero(new)[0]
    sizes = np.diff(np.append(starts, n))
    return starts, np.repeat(starts, sizes)


def json_field_int(
    batch: pa.Table, col: str = "props", field: str = "k", out: str = "k"
) -> pa.Table:
    """Vectorized JSON scalar extraction: pull an integer field out of a
    JSON-object string column with one RE2 pass (``pc.extract_regex``) —
    no per-row ``json.loads``.  Rows missing the field (or with a
    non-integer value) yield null, matching DuckDB's
    ``CAST(json_extract_string(props, '$.field') AS BIGINT)`` on the
    scalar-object shapes the corpus carries.  The narrow contract (no
    nested objects, no escaped keys) is asserted in tests; a full JSON
    path language would switch this to a per-actor ``json.loads`` pool.
    """
    import pyarrow.compute as pc

    # the terminator class keeps "k": 2.5 from half-matching as 2
    pat = '"' + field + '"\\s*:\\s*(?P<v>-?\\d+)\\s*[,}]'
    ex = pc.extract_regex(batch.column(col), pat)
    vals = pc.cast(pc.struct_field(ex, "v"), pa.int64())
    return batch.append_column(out, vals)


def prep_events(batch: pa.Table) -> pa.Table:
    """Append epoch-us and integer-cents columns (exact arithmetic shared
    with the DuckDB oracles)."""
    ts = batch.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    v = batch.column("value").to_numpy(zero_copy_only=False)
    out = batch.append_column("ts_us", pa.array(ts))
    return out.append_column("value_cents", pa.array(np.rint(v * 100).astype(np.int64)))


def interval_union(ds) -> "ray.data.Dataset":
    """Per-user union of (possibly overlapping) time intervals — the
    gaps-and-islands operator: merge every [s_us, e_us) that overlaps or
    touches a neighbor, then emit per user (n_islands, covered_us,
    max_island_us).  All-integer semantics, exact under any parallelism.

    ONE user-bucket exchange; the bucket kernel is a single lexsort +
    one segmented exclusive cumulative-max sweep (segments offset into
    disjoint value ranges so one global ``np.maximum.accumulate``
    serves every user — overflow-guarded with a per-segment fallback),
    then reduceat/add.at island aggregates — no per-row Python, no
    per-user window assembly.  Island PARTITIONS (not ids) are
    tie-order-free, so the result is independent of sort-tie order and
    replays exactly against the classic SQL max-OVER-preceding
    formulation.  Input needs (user_id, s_us, e_us) with e_us >= s_us."""
    nb = _n_user_buckets(ds)

    def part(t: pa.Table) -> pa.Table:
        return _add_user_bucket(t.select(["user_id", "s_us", "e_us"]), nb)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_islands": pa.array([], pa.int64()),
                "covered_us": pa.array([], pa.int64()),
                "max_island_us": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        s = g.column("s_us").to_numpy(zero_copy_only=False)
        e = g.column("e_us").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(u, return_inverse=True)
        order = np.lexsort((e, s, codes))
        c_s, s_s, e_s = codes[order], s[order], e[order]
        n = len(c_s)
        seg_new = np.empty(n, dtype=bool)
        seg_new[0] = True
        seg_new[1:] = c_s[1:] != c_s[:-1]
        base = int(min(s_s.min(), e_s.min()))
        rng = int(e_s.max()) - base + 1
        if (len(uniq) + 1) * (rng + 1) < (1 << 62):
            # segments offset into disjoint ranges -> ONE global cummax
            shifted = (e_s - base) + c_s * np.int64(rng + 1)
            cm = np.maximum.accumulate(shifted)
            pmax = np.empty(n, dtype=np.int64)
            pmax[0] = 0  # unused (seg_new forces a break)
            pmax[1:] = cm[:-1] - c_s[1:] * np.int64(rng + 1) + base
            brk = seg_new | (s_s > pmax)
        else:
            # astronomically wide value domain: per-segment sweep
            brk = np.zeros(n, dtype=bool)
            starts = np.nonzero(seg_new)[0]
            bounds = np.append(starts, n)
            for a, b in zip(bounds[:-1], bounds[1:]):
                brk[a] = True
                if b - a > 1:
                    cm = np.maximum.accumulate(e_s[a:b])
                    brk[a + 1 : b] = s_s[a + 1 : b] > cm[:-1]
        isl_starts = np.nonzero(brk)[0]
        isl_s = s_s[brk]  # sorted by s -> island min(s) is its first row
        isl_e = np.maximum.reduceat(e_s, isl_starts)
        isl_user = c_s[brk]
        length = isl_e - isl_s
        n_isl = np.bincount(isl_user, minlength=len(uniq)).astype(np.int64)
        covered = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(covered, isl_user, length)
        longest = np.zeros(len(uniq), dtype=np.int64)
        np.maximum.at(longest, isl_user, length)
        return pa.table(
            {
                "user_id": pa.array(uniq.astype(np.int64)),
                "n_islands": pa.array(n_isl),
                "covered_us": pa.array(covered),
                "max_island_us": pa.array(longest),
            }
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def first_conversion_latency(ds) -> "ray.data.Dataset":
    """One ``latency_us`` row per CONVERTING user: (first purchase
    strictly after the user's first view) − (first view).

    ONE user-bucket exchange replaces the two-aggregate + two-hash-join
    composition (r4 verdict item 5): view rows shrink map-side to
    per-batch per-user minima before they ship; purchase rows ship raw
    (a purchase earlier than the user's GLOBAL first view cannot be
    pruned batch-side — the batch only knows its local view minimum);
    the per-bucket kernel then resolves both dependent aggregates
    vectorized (np.unique codes + minimum.at), no per-user Python.
    Input needs (user_id, event_type, ts_us)."""
    import pyarrow.compute as pc

    nb = _n_user_buckets(ds)

    def part(t: pa.Table) -> pa.Table:
        isv = pc.equal(t.column("event_type"), "view")
        isp = pc.equal(t.column("event_type"), "purchase")
        vt = (
            t.filter(isv)
            .select(["user_id", "ts_us"])
            .group_by(["user_id"])
            .aggregate([("ts_us", "min")])
        )
        pt = t.filter(isp)
        vu = vt.column("user_id").to_numpy(zero_copy_only=False)
        vts = vt.column("ts_us_min").to_numpy(zero_copy_only=False)
        pu = pt.column("user_id").to_numpy(zero_copy_only=False)
        pts = pt.column("ts_us").to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "user_id": pa.array(
                    np.concatenate([vu, pu]).astype(np.int64)
                ),
                "ts_us": pa.array(
                    np.concatenate([vts, pts]).astype(np.int64)
                ),
                "is_p": pa.array(
                    np.concatenate(
                        [np.zeros(len(vu), bool), np.ones(len(pu), bool)]
                    )
                ),
            }
        )
        return _add_user_bucket(out, nb)

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"latency_us": pa.array([], pa.int64())})
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        isp = g.column("is_p").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(u, return_inverse=True)
        big = np.iinfo(np.int64).max
        vmin = np.full(len(uniq), big, dtype=np.int64)
        np.minimum.at(vmin, codes[~isp], ts[~isp])
        cand = isp & (ts > vmin[codes])  # vmin == big -> never a candidate
        pmin = np.full(len(uniq), big, dtype=np.int64)
        np.minimum.at(pmin, codes[cand], ts[cand])
        ok = pmin < big  # a finite pmin implies a finite vmin
        return pa.table({"latency_us": pa.array(pmin[ok] - vmin[ok])})

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def running_totals(ds) -> "ray.data.Dataset":
    """Per-user running sum of value_cents in (ts, event_id) order —
    the cumulative-window operator.  Segmented cumsum over a user bucket
    (one lexsort; per-user base subtracted via the segment-start index;
    no pandas detour, no per-user Python)."""
    nb = _n_user_buckets(ds)

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "running_cents": pa.array([], pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, eid_s, val_s = uid[order], eid[order], val[order]
        cs = np.cumsum(val_s)
        _, seg_start = _user_segments(u_s)
        run = cs - cs[seg_start] + val_s[seg_start]
        return pa.table(
            {
                "user_id": pa.array(u_s),
                "event_id": pa.array(eid_s),
                "running_cents": pa.array(run),
            }
        )

    return (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def rows_window_sum(ds, frame: int = 3) -> "ray.data.Dataset":
    """Per-user ROWS-frame moving sum — ``sum(cents) OVER (PARTITION BY
    user_id ORDER BY ts, event_id ROWS BETWEEN frame-1 PRECEDING AND
    CURRENT ROW)``.  The bounded-frame window family (vs running_totals'
    unbounded frame): windowed sum = prefix[i+1] - prefix[lo] with the
    frame's low edge clipped at each user's segment start — two numpy
    gathers over one segmented cumsum, no per-user Python.  Integer cents
    keep the sums order-free and SQL-exact."""
    nb = _n_user_buckets(ds)
    k = int(frame)
    if k < 1:
        raise ValueError("frame must be >= 1")

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "win_cents": pa.array([], pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, eid_s, val_s = uid[order], eid[order], val[order]
        _, seg_start = _user_segments(u_s)
        prefix = np.concatenate([[0], np.cumsum(val_s)])
        i = np.arange(len(u_s))
        lo = np.maximum(i - (k - 1), seg_start)
        win = prefix[i + 1] - prefix[lo]
        return pa.table(
            {
                "user_id": pa.array(u_s),
                "event_id": pa.array(eid_s),
                "win_cents": pa.array(win),
            }
        )

    return (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def range_window_sum(ds, width_us: int = 600_000_000) -> "ray.data.Dataset":
    """Per-user time-RANGE-frame moving sum — ``sum(cents) OVER
    (PARTITION BY user_id ORDER BY ts RANGE BETWEEN width PRECEDING AND
    CURRENT ROW)``.  Unlike the ROWS frame (:func:`rows_window_sum`) the
    frame edges are VALUE-based: every row whose ts lies in
    ``[cur_ts - width, cur_ts]`` is in frame, including *later* peer rows
    with the same ts (SQL RANGE peers) — so the edges come from two
    ``searchsorted`` gathers, not index arithmetic.  Segments share one
    global searchsorted by folding (segment, ts) into a single monotone
    int64 key (segment index x time span + offset; the fold is
    overflow-checked and falls back to a per-segment loop only if a
    bucket would overflow, which needs ~3e5 users x a century in one
    bucket).  Integer cents keep sums order-free and SQL-exact.

    Scale: one user-bucket exchange; per-bucket work is one lexsort +
    two binary searches — the same cost profile as the ROWS frame."""
    nb = _n_user_buckets(ds)
    w = int(width_us)
    if w < 0:
        raise ValueError("width_us must be >= 0")

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "win_cents": pa.array([], pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, ts_s, eid_s, val_s = uid[order], ts[order], eid[order], val[order]
        starts, seg_start = _user_segments(u_s)
        # fold (segment, ts) into one monotone key so ONE searchsorted
        # serves every segment; rebase ts so the fold fits int64
        t0 = int(ts_s.min())
        span = int(ts_s.max()) - t0 + w + 1
        # per-row segment ordinal: rank of the row's segment start
        seg_ids = np.searchsorted(starts, seg_start)
        if len(starts) * span > np.iinfo(np.int64).max // 2:
            # degenerate fold range: per-segment binary searches
            lo = np.empty(len(u_s), dtype=np.int64)
            hi = np.empty(len(u_s), dtype=np.int64)
            ends = np.append(starts[1:], len(u_s))
            for s, e in zip(starts, ends):
                seg_ts = ts_s[s:e]
                lo[s:e] = s + np.searchsorted(seg_ts, seg_ts - w, side="left")
                hi[s:e] = s + np.searchsorted(seg_ts, seg_ts, side="right")
        else:
            key = seg_ids * span + (ts_s - t0)
            lo_probe = seg_ids * span + np.maximum(ts_s - t0 - w, 0)
            lo = np.searchsorted(key, lo_probe, side="left")
            hi = np.searchsorted(key, key, side="right")
        prefix = np.concatenate([[0], np.cumsum(val_s)])
        win = prefix[hi] - prefix[lo]
        return pa.table(
            {
                "user_id": pa.array(u_s),
                "event_id": pa.array(eid_s),
                "win_cents": pa.array(win),
            }
        )

    return (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def first_last_values(ds) -> "ray.data.Dataset":
    """Per-user FIRST_VALUE / LAST_VALUE of value-cents in (ts, event_id)
    order plus the event count — two gathers at the segment boundaries of
    the user-sorted bucket (the boundary-window family next to LAG and
    frame sums)."""
    nb = _n_user_buckets(ds)

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "first_cents": pa.array([], pa.int64()),
                    "last_cents": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, val_s = uid[order], val[order]
        starts, _ = _user_segments(u_s)
        ends = np.append(starts[1:], len(u_s)) - 1
        return pa.table(
            {
                "user_id": pa.array(u_s[starts]),
                "first_cents": pa.array(val_s[starts]),
                "last_cents": pa.array(val_s[ends]),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def value_deltas(ds) -> "ray.data.Dataset":
    """Per-user LAG — ``delta_cents = value_cents - lag(value_cents) OVER
    (PARTITION BY user_id ORDER BY ts, event_id)``; each user's first
    event is excluded (its LAG is NULL, matching the oracle's
    ``WHERE ... IS NOT NULL``).  Same shape as :func:`running_totals`:
    one user-bucket exchange, one lexsort, a shifted difference with the
    segment starts masked out — no per-user Python."""
    nb = _n_user_buckets(ds)

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "delta_cents": pa.array([], pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, eid_s, val_s = uid[order], eid[order], val[order]
        keep = np.empty(len(u_s), dtype=bool)
        keep[0] = False
        keep[1:] = u_s[1:] == u_s[:-1]  # segment starts have no LAG
        delta = np.empty_like(val_s)
        delta[1:] = val_s[1:] - val_s[:-1]
        return pa.table(
            {
                "user_id": pa.array(u_s[keep]),
                "event_id": pa.array(eid_s[keep]),
                "delta_cents": pa.array(delta[keep]),
            }
        )

    return (
        ds.map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["_ubkt"])), batch_format="pyarrow"
        )
    )


def cohort_retention(ds) -> "ray.data.Dataset":
    """Cohort retention matrix — for each signup cohort (a user's FIRST
    active epoch-day), how many of its users were active again k days
    later: ``(cohort_day, day_offset) -> n_users`` with ``n_users`` a
    COUNT DISTINCT of users.  The classic product-analytics triangle.

    Scale shape: one user-bucket exchange (each user's rows land wholly
    in one bucket, the :func:`running_totals` invariant), then a
    vectorized per-bucket kernel — lexsort by (user, day), change-flag
    dedup to distinct (user, day) pairs, cohort day broadcast from each
    user's segment start, ``np.unique`` counts per (cohort, offset).
    Because users are bucket-disjoint, per-bucket distinct-user counts
    are globally disjoint, so the finishing pass is an exact
    ``sum`` over a days²-sized table — the COUNT DISTINCT never shuffles
    raw events twice and never ships user ids to the driver."""
    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    nb = _n_user_buckets(ds)
    day_us = 86_400_000_000

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "cohort_day": pa.array([], pa.int64()),
                    "day_offset": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        day = g.column("ts_us").to_numpy(zero_copy_only=False) // day_us
        order = np.lexsort((day, uid))
        u_s, d_s = uid[order], day[order]
        keep = np.empty(len(u_s), dtype=bool)
        keep[0] = True
        keep[1:] = (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])
        u_u, d_u = u_s[keep], d_s[keep]
        _, seg_start = _user_segments(u_u)
        cohort = d_u[seg_start]
        offset = d_u - cohort
        pairs, counts = np.unique(
            np.stack([cohort, offset], axis=1), axis=0, return_counts=True
        )
        return pa.table(
            {
                "cohort_day": pa.array(pairs[:, 0]),
                "day_offset": pa.array(pairs[:, 1]),
                "n_users": pa.array(counts.astype(np.int64)),
            }
        )

    partials = (
        ds.map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["_ubkt"])), batch_format="pyarrow"
        )
    )
    return bucketed_group_aggregate(
        partials, ["cohort_day", "day_offset"], [("n_users", "sum", "n_users")]
    )


def resample_fill(ds, unit_us: int = 60_000_000) -> "ray.data.Dataset":
    """Dense time resample with gap fill — count and value sum per time
    bucket of ``unit_us``, with EVERY bucket between the corpus min and
    max present (empty buckets zero-filled).  The time-series export /
    anomaly-baseline shape: downstream models need the zeros.

    Scale shape: the corpus collapses to per-bucket partials through
    :func:`~cloudtile_ray.stages.relational.bucketed_group_aggregate`
    (the only corpus-wide pass); the dense fill then runs DRIVER-side on
    the gathered aggregate — sound because the bucket axis is
    CALENDAR-bounded, not data-bounded: a decade of minutes is ~5.3M
    rows regardless of how many trillions of events fall into them.
    The dense range is one ``np.arange`` + ``searchsorted`` scatter."""
    import ray.data

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    def bucketize(t: pa.Table) -> pa.Table:
        b = t.column("ts_us").to_numpy(zero_copy_only=False) // unit_us
        return pa.table(
            {
                "bucket": pa.array(b),
                "value_cents": t.column("value_cents"),
            }
        )

    agg = bucketed_group_aggregate(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        ["bucket"],
        [("bucket", "count", "n"), ("value_cents", "sum", "sum_cents")],
    )
    parts = [
        t
        for t in (ray.get(r) for r in agg.to_arrow_refs())
        if t.num_columns > 0 and t.num_rows > 0
    ]
    if not parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        )
    got = pa.concat_tables(parts).combine_chunks()
    b = got.column("bucket").to_numpy(zero_copy_only=False)
    n = got.column("n").to_numpy(zero_copy_only=False)
    s = got.column("sum_cents").to_numpy(zero_copy_only=False)
    lo, hi = int(b.min()), int(b.max())
    dense = np.arange(lo, hi + 1, dtype=np.int64)
    n_out = np.zeros(len(dense), dtype=np.int64)
    s_out = np.zeros(len(dense), dtype=np.int64)
    pos = b - lo
    n_out[pos] = n
    s_out[pos] = s
    return ray.data.from_arrow(
        pa.table(
            {
                "bucket": pa.array(dense),
                "n": pa.array(n_out),
                "sum_cents": pa.array(s_out),
            }
        )
    )


def transition_counts(ds) -> "ray.data.Dataset":
    """First-order Markov transition matrix over event types — for every
    consecutive event pair within a user's (ts, event_id)-ordered stream,
    count ``(prev_type, next_type)`` occurrences.  The behavioral-model /
    anomaly-baseline primitive.

    Scale shape: the :func:`value_deltas` pattern — one user-bucket
    exchange, one lexsort, the consecutive-pair mask from user change
    flags; event types are dictionary-encoded per bucket (Arrow C++) so
    the pair count is an ``np.unique`` over small integer code pairs,
    decoded back to strings only for the type²-sized output.  The finish
    sums type²-sized partials."""
    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    nb = _n_user_buckets(ds)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "prev_type": pa.array([], pa.string()),
                "next_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if g.num_rows < 2:
            return empty
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ty = g.column("event_type").combine_chunks().dictionary_encode()
        codes = ty.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        u_s, c_s = uid[order], codes[order]
        within = u_s[1:] == u_s[:-1]  # pair (i-1, i) stays in one user
        if not within.any():
            return empty
        prev_c, next_c = c_s[:-1][within], c_s[1:][within]
        pairs, counts = np.unique(
            np.stack([prev_c, next_c], axis=1), axis=0, return_counts=True
        )
        vocab = ty.dictionary
        return pa.table(
            {
                "prev_type": vocab.take(pa.array(pairs[:, 0])),
                "next_type": vocab.take(pa.array(pairs[:, 1])),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    partials = (
        ds.map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["_ubkt"])), batch_format="pyarrow"
        )
    )
    return bucketed_group_aggregate(
        partials, ["prev_type", "next_type"], [("n", "sum", "n")]
    )


def funnel_counts(ds, stages=("view", "click", "purchase")) -> "ray.data.Dataset":
    """Ordered conversion funnel — for each stage k, how many users
    performed stage 0, then stage 1 STRICTLY later, ..., then stage k
    strictly later still (first-occurrence chaining: each stage's anchor
    is the user's EARLIEST qualifying event, the standard product-funnel
    definition and exactly the nested ``min(ts) ... WHERE ts > prev``
    SQL).  Comparisons are on the raw microsecond timestamp only — a
    stage event sharing its microsecond with the previous anchor does
    not qualify — so the count is well-defined without a tie-break.

    Scale shape: rows not in ``stages`` are dropped and the stage name
    dictionary-encoded to int8 BEFORE the exchange (the funnel never
    ships non-funnel traffic); then the one user-bucket exchange and a
    per-bucket kernel that is a loop over STAGES (not rows or users):
    per stage one boolean mask + ``np.minimum.reduceat`` per user
    segment, threading each user's anchor forward.  Users are
    bucket-disjoint so per-bucket user counts sum exactly."""
    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    stages = list(stages)
    nb = _n_user_buckets(ds)
    imax = np.iinfo(np.int64).max

    def encode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ty = t.column("event_type")
        idx = pc.index_in(ty, value_set=pa.array(stages, pa.string()))
        keep = pc.is_valid(idx)
        t = t.append_column("stage_idx", pc.cast(idx, pa.int8())).filter(keep)
        return t.select(["user_id", "ts_us", "stage_idx"])

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "stage_idx": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        sidx = g.column("stage_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, uid))
        u_s, t_s, s_s = uid[order], ts[order], sidx[order]
        starts, seg_start = _user_segments(u_s)
        new = np.empty(len(u_s), dtype=bool)
        new[0] = True
        new[1:] = u_s[1:] != u_s[:-1]
        seg_id = np.cumsum(new) - 1
        prev = np.full(len(starts), np.int64(-1))
        n_users = np.empty(len(stages), dtype=np.int64)
        for k in range(len(stages)):
            qual = (s_s == k) & (t_s > prev[seg_id])
            vals = np.where(qual, t_s, imax)
            anchor = np.minimum.reduceat(vals, starts)
            n_users[k] = int((anchor != imax).sum())
            prev = anchor  # unreached users stay at int64 max: ts > max
            # never holds, so all later stages auto-fail for them
        return pa.table(
            {
                "stage_idx": pa.array(np.arange(len(stages), dtype=np.int64)),
                "n_users": pa.array(n_users),
            }
        )

    partials = (
        ds.map_batches(encode, batch_format="pyarrow")
        .map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["_ubkt"])), batch_format="pyarrow"
        )
    )
    summed = bucketed_group_aggregate(
        partials, ["stage_idx"], [("n_users", "sum", "n_users")]
    )

    def name_stage(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = t.column("stage_idx")
        names = pc.take(pa.array(stages, pa.string()), idx)
        return pa.table(
            {
                "stage_idx": idx,
                "stage": names,
                "n_users": t.column("n_users"),
            }
        )

    return summed.map_batches(name_stage, batch_format="pyarrow")


def session_windows(ds, gap_us: int = 3_600_000_000) -> "ray.data.Dataset":
    """Per-user session windows: a new session starts when the gap since
    the previous event exceeds ``gap_us``. Output one row per session with
    start/end and event count — the session-window operator.  Arrow-native
    group fn (lexsort + reduceat over session boundaries)."""

    nb = _n_user_buckets(ds)

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_seq": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, ts_s, val_s = uid[order], ts[order], val[order]
        n = len(ts_s)
        new = np.empty(n, dtype=bool)
        new[0] = True
        # a session breaks on a user change OR an over-gap step
        new[1:] = (u_s[1:] != u_s[:-1]) | (np.diff(ts_s) > gap_us)
        starts = np.nonzero(new)[0]
        bounds = np.r_[starts[1:], n]
        sess_user = u_s[starts]
        # session_seq restarts at 1 per user: rank of each session within
        # its user's run of sessions
        first = np.empty(len(starts), dtype=bool)
        first[0] = True
        first[1:] = sess_user[1:] != sess_user[:-1]
        ufirst = np.nonzero(first)[0]
        usizes = np.diff(np.append(ufirst, len(starts)))
        seq = np.arange(len(starts), dtype=np.int64) - np.repeat(ufirst, usizes) + 1
        return pa.table(
            {
                "user_id": pa.array(sess_user),
                "session_seq": pa.array(seq),
                "start_us": pa.array(ts_s[starts]),
                "end_us": pa.array(ts_s[bounds - 1]),
                "n_events": pa.array((bounds - starts).astype(np.int64)),
                "sum_cents": pa.array(np.add.reduceat(val_s, starts).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def asof_join(ds, left_type: str, right_type: str) -> "ray.data.Dataset":
    """Per-user as-of join: attach to each ``left_type`` event the latest
    ``right_type`` event strictly prior in (ts, event_id) order (event_id
    breaks ts ties; ids are globally unique so the order is total).

    Beyond-the-reference operator (the reference is a batch tiling CLI
    with no temporal ops — /root/reference/src/cloudtile/cli/__init__.py
    is its whole surface); built per the brief's custom-operator guidance
    as a composition of groupby + an in-group vectorized merge.

    Ray-Data-first shape: one bucket exchange on ``user_id %
    num_buckets`` (the only shuffle; near-unique keys never drive Ray's
    per-group machinery — module docstring), then a fully vectorized
    SEGMENTED merge over the bucket — lexsort both sides together by
    (user, ts, event_id) and read the running right-count at each left
    position relative to its user segment.  No per-row or per-user
    Python, no driver materialization.

    Scale note (documented partitioning assumption): per-user event
    series must fit one group task, the same bound every per-user window
    here relies on; a pathological hot user would be salted by time range
    with a carry-forward row per range boundary.

    Output: (user_id, left_id, right_id, lag_us) with right_id = -1 and
    lag_us = -1 when no prior right event exists (real lags are >= 0, so
    the sentinel never collides).
    """

    nb = _n_user_buckets(ds)
    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "left_id": pa.array([], type=pa.int64()),
            "right_id": pa.array([], type=pa.int64()),
            "lag_us": pa.array([], type=pa.int64()),
        }
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, ts_s, eid_s, et_s = uid[order], ts[order], eid[order], et[order]
        is_r = et_s == right_type
        lpos = np.nonzero(et_s == left_type)[0]
        if lpos.size == 0:
            return empty
        # rights before position p WITHIN p's user segment: inclusive
        # cumsum minus the count before the segment start (a left is
        # never a right, so the inclusive count at p already excludes p)
        cum_r = np.cumsum(is_r)
        _, seg_start = _user_segments(u_s)
        base = cum_r[seg_start] - is_r[seg_start]
        n_before = cum_r[lpos] - base[lpos]
        # the k-th right of a segment is global right number base + k
        rpos = np.nonzero(is_r)[0]
        right_id = np.full(lpos.size, -1, dtype=np.int64)
        lag = np.full(lpos.size, -1, dtype=np.int64)
        hit = n_before > 0
        match = rpos[(base[lpos][hit] + n_before[hit]) - 1]
        right_id[hit] = eid_s[match]
        lag[hit] = ts_s[lpos[hit]] - ts_s[match]
        return pa.table(
            {
                "user_id": pa.array(u_s[lpos]),
                "left_id": pa.array(eid_s[lpos]),
                "right_id": pa.array(right_id),
                "lag_us": pa.array(lag),
            }
        )

    return (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def asof_join_forward(ds, left_type: str, right_type: str) -> "ray.data.Dataset":
    """Forward as-of join — to each ``left_type`` event attach the FIRST
    ``right_type`` event strictly after it in (ts, event_id) order within
    the same user: the mirror of :func:`asof_join` (same single
    user-bucket exchange + segmented cumsum merge, read at the next right
    instead of the previous one).  Output (user_id, left_id, right_id,
    lead_us) with the -1 sentinel when no later right event exists."""
    nb = _n_user_buckets(ds)
    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "left_id": pa.array([], type=pa.int64()),
            "right_id": pa.array([], type=pa.int64()),
            "lead_us": pa.array([], type=pa.int64()),
        }
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, ts_s, eid_s, et_s = uid[order], ts[order], eid[order], et[order]
        is_r = et_s == right_type
        lpos = np.nonzero(et_s == left_type)[0]
        if lpos.size == 0:
            return empty
        # the next right after position p is global right #cum_r[p]
        # (inclusive count at p; p itself is never a right); it must fall
        # before p's user-segment end
        cum_r = np.cumsum(is_r)
        starts, seg_start = _user_segments(u_s)
        sizes = np.diff(np.append(starts, len(u_s)))
        seg_end = np.repeat(starts + sizes, sizes)
        rpos = np.nonzero(is_r)[0]
        nxt = cum_r[lpos]  # index into rpos
        right_id = np.full(lpos.size, -1, dtype=np.int64)
        lead = np.full(lpos.size, -1, dtype=np.int64)
        if rpos.size:
            cand = np.minimum(nxt, len(rpos) - 1)
            hit = (nxt < len(rpos)) & (rpos[cand] < seg_end[lpos])
            match = rpos[cand[hit]]
            right_id[hit] = eid_s[match]
            lead[hit] = ts_s[match] - ts_s[lpos[hit]]
        return pa.table(
            {
                "user_id": pa.array(u_s[lpos]),
                "left_id": pa.array(eid_s[lpos]),
                "right_id": pa.array(right_id),
                "lead_us": pa.array(lead),
            }
        )

    return (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


class IntervalIndex:
    """Broadcastable index over (possibly overlapping) [start, end] closed
    intervals: a coarse time-bucket grid maps each bucket to the interval
    ids that overlap it, so a point probe compares against only its
    bucket's candidates instead of all K intervals.

    Built once on the driver from the (small) interval side, shipped via
    ``ray.put`` and read zero-copy in every map task — the broadcast-join
    pattern; a large interval side would instead time-range-partition
    both sides on the same grid and join per partition.
    """

    def __init__(self, starts: np.ndarray, ends: np.ndarray, ids: np.ndarray):
        if np.any(ends < starts):
            raise ValueError("interval end < start")
        self.starts = starts.astype(np.int64)
        self.ends = ends.astype(np.int64)
        self.ids = ids
        # Bucket width: wide enough that the total (bucket, interval)
        # expansion stays O(K) — at least the median interval length AND
        # at least 1/(4K) of the covered range (degenerate point-intervals
        # would otherwise make the median 0 and the grid unbounded).
        k = max(1, len(self.starts))
        rng = (
            int(self.ends.max()) - int(self.starts.min()) + 1 if len(starts) else 1
        )
        med = int(np.median(self.ends - self.starts)) if len(starts) else 0
        span = max(1, med, rng // (4 * k))
        self.bucket_us = span
        b0 = self.starts // span
        b1 = self.ends // span
        counts = (b1 - b0 + 1).astype(np.int64)
        # (bucket, interval_idx) pairs, one per bucket an interval overlaps
        ivl_idx = np.repeat(np.arange(len(starts), dtype=np.int64), counts)
        offs = np.concatenate(([0], np.cumsum(counts)))
        step = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(offs[:-1], counts)
        buckets = np.repeat(b0, counts) + step
        o = np.argsort(buckets, kind="stable")
        self._bk = buckets[o]
        self._bi = ivl_idx[o]

    def probe(self, ts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized point-in-interval lookup: returns (point_row_idx,
        interval_idx) pairs for every containment.  Work is grouped by
        bucket — one slice compare per distinct bucket in the batch."""
        b = ts // self.bucket_us
        order = np.argsort(b, kind="stable")
        bs = b[order]
        uniq, first = np.unique(bs, return_index=True)
        bounds = np.r_[first[1:], len(bs)]
        out_p, out_i = [], []
        lo = np.searchsorted(self._bk, uniq, side="left")
        hi = np.searchsorted(self._bk, uniq, side="right")
        for u in range(len(uniq)):
            cand = self._bi[lo[u] : hi[u]]
            if cand.size == 0:
                continue
            pts = order[first[u] : bounds[u]]
            t = ts[pts]
            m = (self.starts[cand][None, :] <= t[:, None]) & (
                t[:, None] <= self.ends[cand][None, :]
            )
            pi, ii = np.nonzero(m)
            out_p.append(pts[pi])
            out_i.append(cand[ii])
        if not out_p:
            z = np.array([], dtype=np.int64)
            return z, z
        return np.concatenate(out_p), np.concatenate(out_i)


def interval_join(
    ds, intervals_ds, broadcast_byte_budget: int = 128 << 20
) -> "ray.data.Dataset":
    """Range join (beyond-the-reference, per the brief's custom-operator
    list): every event whose ts falls inside any interval of
    ``intervals_ds`` — columns (ivl_user, ivl_seq, start_us, end_us) —
    emits one row per containment.

    Route choice is gated on the MEASURED interval-side bytes (VERDICT r3
    missing #3 — previously the collect was unconditional):

    - within ``broadcast_byte_budget``: collect + index once into an
      :class:`IntervalIndex`, broadcast with ``ray.put``, probe vectorized
      per batch; the big side streams and nothing shuffles.
    - beyond the budget: time-bucket BOTH sides on a shared grid sized to
      the max interval length (each interval is replicated to every
      bucket it overlaps — at most 2 when the grid matches the max
      length; an event lands in exactly its own ts bucket, so no output
      dedup is needed) and probe per bucket through one exchange.
      Partitioning assumption: interval lengths are bounded (a single
      corpus-spanning interval would serialize its bucket; salt such
      intervals by splitting them on the grid first).
    """
    import ray

    small_mat = intervals_ds.materialize()
    nbytes = small_mat.size_bytes() or 0
    if nbytes > broadcast_byte_budget:
        return _interval_join_bucketed(ds, small_mat)

    small = small_mat.to_pandas()
    idx = IntervalIndex(
        small["start_us"].to_numpy(),
        small["end_us"].to_numpy(),
        np.arange(len(small), dtype=np.int64),
    )
    users = small["ivl_user"].to_numpy().astype(np.int64)
    seqs = small["ivl_seq"].to_numpy().astype(np.int64)
    ref = ray.put((idx, users, seqs))

    def probe(batch: pa.Table) -> pa.Table:
        ix, us, sq = ray.get(ref)
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        pi, ii = ix.probe(ts)
        return pa.table(
            {
                "ivl_user": pa.array(us[ii]),
                "ivl_seq": pa.array(sq[ii]),
                "event_id": batch.column("event_id").take(pa.array(pi)),
            }
        )

    return ds.map_batches(prep_events, batch_format="pyarrow").map_batches(
        probe, batch_format="pyarrow"
    )


def _interval_join_bucketed(ds, intervals_mat) -> "ray.data.Dataset":
    """Shuffle path for a corpus-scale interval side: tag + union both
    sides into one schema, exchange on a shared time-bucket key, and run
    the same vectorized containment probe per bucket.  The grid width is
    the max interval length (two dataset-side scalars to the driver), so
    each interval replicates to at most 2 buckets."""
    import pyarrow.compute as pc

    def len_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mx": pa.array([], pa.int64())})
        mx = pc.max(pc.subtract(t.column("end_us"), t.column("start_us"))).as_py()
        return pa.table({"mx": pa.array([int(mx)], pa.int64())})

    width = max(
        1, int(intervals_mat.map_batches(len_partial, batch_format="pyarrow").max("mx"))
    )
    zeros = lambda n: pa.array(np.zeros(n, dtype=np.int64))  # noqa: E731

    def tag_intervals(t: pa.Table) -> pa.Table:
        s = t.column("start_us").to_numpy(zero_copy_only=False)
        e = t.column("end_us").to_numpy(zero_copy_only=False)
        b0, b1 = s // width, e // width
        counts = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s), dtype=np.int64), counts)
        offs = np.cumsum(counts) - counts
        step = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(offs, counts)
        take = pa.array(idx)
        return pa.table(
            {
                "_tbkt": pa.array(np.repeat(b0, counts) + step),
                "kind": pa.array(np.zeros(len(idx), dtype=np.int8)),
                "ivl_user": t.column("ivl_user").take(take),
                "ivl_seq": t.column("ivl_seq").take(take),
                "start_us": t.column("start_us").take(take),
                "end_us": t.column("end_us").take(take),
                "event_id": zeros(len(idx)),
                "ts_us": zeros(len(idx)),
            }
        )

    def tag_events(t: pa.Table) -> pa.Table:
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table(
            {
                "_tbkt": pa.array(ts // width),
                "kind": pa.array(np.ones(n, dtype=np.int8)),
                "ivl_user": zeros(n),
                "ivl_seq": zeros(n),
                "start_us": zeros(n),
                "end_us": zeros(n),
                "event_id": t.column("event_id"),
                "ts_us": pa.array(ts),
            }
        )

    def probe_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ivl_user": pa.array([], pa.int64()),
                "ivl_seq": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        ivl = g.filter(pa.array(kind == 0))
        ev = g.filter(pa.array(kind == 1))
        if ivl.num_rows == 0 or ev.num_rows == 0:
            return empty
        idx = IntervalIndex(
            ivl.column("start_us").to_numpy(zero_copy_only=False),
            ivl.column("end_us").to_numpy(zero_copy_only=False),
            np.arange(ivl.num_rows, dtype=np.int64),
        )
        pi, ii = idx.probe(ev.column("ts_us").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "ivl_user": ivl.column("ivl_user").take(pa.array(ii)),
                "ivl_seq": ivl.column("ivl_seq").take(pa.array(ii)),
                "event_id": ev.column("event_id").take(pa.array(pi)),
            }
        )

    tagged_ivl = intervals_mat.map_batches(tag_intervals, batch_format="pyarrow")
    tagged_ev = (
        ds.map_batches(prep_events, batch_format="pyarrow")
        .map_batches(lambda t: t.select(["event_id", "ts_us"]), batch_format="pyarrow")
        .map_batches(tag_events, batch_format="pyarrow")
    )
    return (
        tagged_ivl.union(tagged_ev)
        .groupby("_tbkt")
        .map_groups(probe_bucket, batch_format="pyarrow")
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


def event_gaps(ds) -> "ray.data.Dataset":
    """Per-user inter-arrival gaps — ``gap_us = ts_us - lag(ts_us) OVER
    (PARTITION BY user_id ORDER BY ts_us, event_id)``; each user's first
    event is excluded.  Identical scale shape to :func:`value_deltas`
    (one user-bucket exchange, one lexsort, shifted difference with
    segment starts masked); the gap stream feeds
    :func:`cloudtile_ray.stages.quantiles.exact_quantiles` for arrival-
    process analytics without ever materializing per-user series."""
    nb = _n_user_buckets(ds)

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, eid_s, ts_s = uid[order], eid[order], ts[order]
        keep = np.empty(len(u_s), dtype=bool)
        keep[0] = False
        keep[1:] = u_s[1:] == u_s[:-1]
        gap = np.empty_like(ts_s)
        gap[1:] = ts_s[1:] - ts_s[:-1]
        return pa.table(
            {
                "user_id": pa.array(u_s[keep]),
                "event_id": pa.array(eid_s[keep]),
                "gap_us": pa.array(gap[keep]),
            }
        )

    return (
        ds.map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["_ubkt"])), batch_format="pyarrow"
        )
    )


def burst_scores(ds, window_us: int) -> "ray.data.Dataset":
    """Per-user burst detection: the maximum number of the user's events
    inside any ``[t, t + window_us]`` window anchored at one of their
    events (inclusive bounds — SQL's ``RANGE BETWEEN CURRENT ROW AND
    window_us - 1 FOLLOWING`` with tie peers included).  The
    rate-limit / abuse-screening primitive.

    Scale shape: one user-bucket exchange; inside a bucket the sliding
    count is ONE ``np.searchsorted`` over a segment-disjoint shifted
    time axis (each user's span is relocated to its own range wider
    than span + window, so a single globally-sorted array answers every
    user's window queries at once — no per-user Python, no per-user
    searchsorted calls), and the per-user max folds with ``reduceat``."""
    nb = _n_user_buckets(ds)
    w = int(window_us)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"user_id": pa.array([], pa.int64()), "burst": pa.array([], pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, uid))
        u_s, ts_s = uid[order], ts[order]
        n = len(u_s)
        starts = np.flatnonzero(np.concatenate(([True], u_s[1:] != u_s[:-1])))
        seg_of = np.cumsum(np.concatenate(([False], u_s[1:] != u_s[:-1])))
        ends = np.concatenate((starts[1:], [n]))
        base = ts_s[starts]  # per-segment min
        # relocate each segment to its own disjoint range: offsets are the
        # exclusive cumsum of PER-SEGMENT (span + window + 2) — not
        # seg_index × global-span, whose product overflows int64 around
        # ~10⁵ users × year-scale spans (code-review r4 #1); total
        # magnitude here is Σ spans + users·w, and a loud guard covers
        # the pathological remainder
        seg_span = ts_s[ends - 1] - base
        widths = seg_span + np.int64(w + 2)
        offsets = np.concatenate(([0], np.cumsum(widths[:-1], dtype=np.int64)))
        if int(offsets[-1]) + int(seg_span[-1]) + w + 2 >= 2**62:
            raise OverflowError(
                "burst_scores: relocated time axis would exceed int64 — "
                "shrink the bucket (raise num_buckets) or the window"
            )
        shifted = (ts_s - base[seg_of]) + offsets[seg_of]
        lo = np.searchsorted(shifted, shifted, side="left")
        hi = np.searchsorted(shifted, shifted + np.int64(w - 1), side="right")
        counts = hi - lo
        burst = np.maximum.reduceat(counts, starts)
        return pa.table(
            {"user_id": pa.array(u_s[starts]), "burst": pa.array(burst.astype(np.int64))}
        )

    return (
        ds.map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["_ubkt"])), batch_format="pyarrow"
        )
    )


def user_changepoints(ds) -> "ray.data.Dataset":
    """Per-user mean-shift changepoint: the split index k (1-based, in
    (ts_us, event_id) stream order) that maximizes |mean(values[:k]) -
    mean(values[k:])| over the user's event values — the binary-segmentation
    step of offline changepoint detection (Scott & Knott / CUSUM family),
    the behavioural-drift screen ("when did this user change spend rate?").

    Exactness: with S_k the prefix sum of integer cents, the objective is
    |num_k| / den_k with ``num_k = S_k*(n-k) - (S_n-S_k)*k`` and
    ``den_k = k*(n-k)`` — both int64, so the argmax is decided on
    ``(CAST(|num|) AS DOUBLE)/den DESC, k ASC`` IDENTICALLY here and in the
    SQL oracle (a correctly-rounded division of the same integers gives the
    same double on both sides; a sub-ulp double collision between distinct
    rationals resolves to the same k via the integer tie-break).

    Scale shape: ONE user-bucket exchange; inside a bucket a single lexsort
    orders every user's stream, the prefix sums are a segmented cumsum, all
    n-1 split objectives evaluate vectorized, and the per-user argmax is a
    lexsort + first-per-segment pick — no per-user Python.  Users with one
    event have no valid split and are absent from the output.

    Returns (user_id, k_split, n_events, num, den, diff)."""
    nb = _n_user_buckets(ds)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "k_split": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "num": pa.array([], pa.int64()),
                "den": pa.array([], pa.int64()),
                "diff": pa.array([], pa.float64()),
            }
        )
        if g.num_rows == 0:
            return empty
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, v_s = uid[order], val[order]
        n_rows = len(u_s)
        starts, seg_start = _user_segments(u_s)
        sizes = np.diff(np.append(starts, n_rows))
        # |S_k*(n-k)| <= n*max|cents|*n — guard the cross-product range
        # like burst_scores guards its time axis
        max_abs = int(np.abs(v_s).max()) if n_rows else 0
        if max_abs and int(sizes.max()) ** 2 * max_abs >= 2**62:
            raise OverflowError(
                "user_changepoints: |S_k*(n-k)| would exceed int64 — "
                "shrink the bucket or rescale values"
            )
        csum = np.cumsum(v_s, dtype=np.int64)
        base = np.where(seg_start > 0, csum[seg_start - 1], 0)
        s_k = csum - base  # prefix sum within the user's segment
        n_seg = np.repeat(sizes, sizes)  # per-row: the user's event count
        total = np.repeat(csum[starts + sizes - 1] - csum[starts] + v_s[starts], sizes)
        k = np.arange(n_rows, dtype=np.int64) - seg_start + 1
        valid = k < n_seg  # split k leaves a non-empty suffix
        if not valid.any():
            return empty
        uid_v = u_s[valid]
        k_v, n_v = k[valid], n_seg[valid]
        num = s_k[valid] * (n_v - k_v) - (total[valid] - s_k[valid]) * k_v
        den = k_v * (n_v - k_v)
        diff = np.abs(num).astype(np.float64) / den.astype(np.float64)
        # per-user argmax on (diff DESC, k ASC): one lexsort, then the
        # first row of each user run is the winner
        win_order = np.lexsort((k_v, -diff, uid_v))
        uw = uid_v[win_order]
        first = np.concatenate(([True], uw[1:] != uw[:-1]))
        w = win_order[first]
        return pa.table(
            {
                "user_id": pa.array(uid_v[w]),
                "k_split": pa.array(k_v[w]),
                "n_events": pa.array(n_v[w]),
                "num": pa.array(num[w]),
                "den": pa.array(den[w]),
                "diff": pa.array(diff[w]),
            }
        )

    return (
        ds.map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["_ubkt"])), batch_format="pyarrow"
        )
    )


def user_ewma(ds, max_events: int = 8192) -> "ray.data.Dataset":
    """Per-user exponentially weighted moving average (alpha = 1/2) of
    ``value_cents`` in (ts_us, event_id) stream order — the streaming
    smoother: ``y_1 = x_1``, ``y_i = (y_{i-1} + x_i) / 2``.  Returns the
    final smoothed level per user (user_id, n_events, ewma).

    Float determinism: with alpha = 1/2 the update is one addition and an
    EXACT halving per step, so the only rounding is the addition sequence
    — which a SQL oracle replays via a recursive CTE running the identical
    recurrence.  The engine evaluates it as a bounded vectorized loop over
    stream POSITION (all users in a bucket advance one step per
    iteration; per-user sequential order preserved exactly, no per-user
    Python).  ``max_events`` bounds the loop (loud error beyond — bucket
    count does not change it, the longest single user does)."""
    nb = _n_user_buckets(ds)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "ewma": pa.array([], pa.float64()),
            }
        )
        if g.num_rows == 0:
            return empty
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, v_s = uid[order], val[order].astype(np.float64)
        starts, _ = _user_segments(u_s)
        sizes = np.diff(np.append(starts, len(u_s)))
        if int(sizes.max(initial=0)) > max_events:
            raise ValueError(
                "user_ewma: a user exceeds max_events — raise the bound "
                "or pre-window the stream"
            )
        y = v_s[starts].copy()  # y_1 = x_1
        for j in range(1, int(sizes.max(initial=0))):
            live = sizes > j
            y[live] = (y[live] + v_s[starts[live] + j]) / 2.0
        return pa.table(
            {
                "user_id": pa.array(u_s[starts]),
                "n_events": pa.array(sizes.astype(np.int64)),
                "ewma": pa.array(y),
            }
        )

    return (
        ds.map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["_ubkt"])), batch_format="pyarrow"
        )
    )


def session_entry_exit(ds, gap_us: int = 3_600_000_000) -> "ray.data.Dataset":
    """Web-analytics entry/exit matrix: sessionize per user (same
    over-gap rule as :func:`session_windows`), then count sessions and
    bounces (single-event sessions) per (entry event type, exit event
    type) — the landing-page x exit-page report.

    Scale shape: the per-user bucket task PRE-AGGREGATES its sessions to
    the (entry, exit) matrix (type-pair cardinality, tiny by
    construction), so the final exchange moves partial matrices, never
    session rows.  Input needs (user_id, ts_us, event_id, event_type);
    session order is (ts_us, event_id) — replayed by the oracle's window
    ORDER BY."""
    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    nb = _n_user_buckets(ds)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "entry_type": pa.array([], pa.string()),
                "exit_type": pa.array([], pa.string()),
                "n_sessions": pa.array([], pa.int64()),
                "n_bounce": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, ts_s, et_s = uid[order], ts[order], et[order]
        n = len(ts_s)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (u_s[1:] != u_s[:-1]) | (np.diff(ts_s) > gap_us)
        starts = np.nonzero(new)[0]
        ends = np.r_[starts[1:], n] - 1
        entry, exit_ = et_s[starts], et_s[ends]
        bounce = (ends - starts) == 0
        import pandas as pd

        pair = pd.DataFrame(
            {"entry_type": entry, "exit_type": exit_, "b": bounce.astype(np.int64)}
        )
        # dropna=False: a null entry/exit type is a real group (SQL GROUP
        # BY keeps NULL keys; pandas' default silently drops them)
        agg = pair.groupby(
            ["entry_type", "exit_type"], sort=False, dropna=False
        ).agg(
            n_sessions=("b", "size"), n_bounce=("b", "sum")
        ).reset_index()
        return pa.table(
            {
                "entry_type": pa.array(agg["entry_type"], pa.string()),
                "exit_type": pa.array(agg["exit_type"], pa.string()),
                "n_sessions": pa.array(agg["n_sessions"].to_numpy(np.int64)),
                "n_bounce": pa.array(agg["n_bounce"].to_numpy(np.int64)),
            }
        )

    partials = (
        ds.map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return bucketed_group_aggregate(
        partials,
        ["entry_type", "exit_type"],
        [("n_sessions", "sum", "n_sessions"), ("n_bounce", "sum", "n_bounce")],
    )


def seasonal_naive_error(ds, season: int = 24) -> "ray.data.Dataset":
    """Forecast-quality audit per event type: on the hourly count series,
    compare the SEASONAL naive forecast (count ``season`` hours ago)
    against the lag-1 naive forecast — the MASE-style ratio that decides
    whether a series is worth a seasonal model at all.  Only hours where
    BOTH references exist score, so the two error sums cover the same
    rows.

    All error sums are int64 (|count diffs|) — exact under any
    parallelism; the ratio is the single float op (NULL when the naive
    error sum is zero).  Scale shape: the hourly rollup rides one
    (hour, type) bucket exchange down to series grain (bounded by
    hours x types, NOT corpus size); the per-type scoring is a
    map_groups over the handful of types on that tiny table.  Input
    needs (event_type, ts_us)."""
    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    def to_hours(t: pa.Table) -> pa.Table:
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "h": pa.array(ts // 3_600_000_000),
            }
        )

    hourly = bucketed_group_aggregate(
        ds.map_batches(to_hours, batch_format="pyarrow"),
        ["event_type", "h"],
        [("h", "count", "n")],
    )

    def score(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_eval": pa.array([], pa.int64()),
                "sae_seasonal": pa.array([], pa.int64()),
                "sae_naive": pa.array([], pa.int64()),
                "mase": pa.array([], pa.float64()),
            }
        )
        if g.num_rows == 0:
            return empty
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        h = g.column("h").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        # null event_type: the oracle's inner self-joins drop NULL-type
        # groups, and np.unique on a None-bearing object array raises —
        # mask them out (mirrors user_bot_features)
        keep = np.array([t is not None for t in et], dtype=bool)
        et, h, n = et[keep], h[keep], n[keep]
        rows = []
        for typ in np.unique(et):
            m = et == typ
            hh, nn = h[m], n[m]
            order = np.argsort(hh)
            hh, nn = hh[order], nn[order]
            i24 = np.searchsorted(hh, hh - season)
            i1 = np.searchsorted(hh, hh - 1)
            ok24 = (i24 < len(hh)) & (hh[np.minimum(i24, len(hh) - 1)] == hh - season)
            ok1 = (i1 < len(hh)) & (hh[np.minimum(i1, len(hh) - 1)] == hh - 1)
            ok = ok24 & ok1
            if not ok.any():
                # no evaluable hour for this type: the oracle's inner
                # joins emit no row, so neither do we
                continue
            sae_s = int(np.abs(nn[ok] - nn[i24[ok]]).sum())
            sae_n = int(np.abs(nn[ok] - nn[i1[ok]]).sum())
            rows.append(
                (
                    str(typ),
                    int(ok.sum()),
                    sae_s,
                    sae_n,
                    float(sae_s) / sae_n if sae_n else None,
                )
            )
        rows.sort()
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "n_eval": pa.array([r[1] for r in rows], pa.int64()),
                "sae_seasonal": pa.array([r[2] for r in rows], pa.int64()),
                "sae_naive": pa.array([r[3] for r in rows], pa.int64()),
                "mase": pa.array([r[4] for r in rows], pa.float64()),
            }
        )

    # the hourly table is series-grain (hours x types); group all of it
    # into one scoring task per type bucket via a constant key — the
    # table is tiny, but keep it off the driver
    return (
        hourly.map_batches(
            lambda t: t.append_column(
                "_g", pa.array(np.zeros(t.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
        .groupby("_g")
        .map_groups(score, batch_format="pyarrow")
    )


def user_bot_features(ds, burst_threshold: int = 20, mono_threshold: int = 50):
    """Bot-detection features per user — the abuse-filtering step of a
    web-corpus curation pipeline: event volume, event-type diversity,
    peak hourly burst, and the classic flag (single-type high-volume OR
    burst over threshold).  All features are exact int64 counts.

    Scale shape: ONE user-bucket exchange; inside a bucket task the
    per-user rollups are lexsort + run-length folds (np.unique over the
    packed (user, hour) / (user, type-code) keys) — no Python over rows.
    Input needs (user_id, ts_us, event_type)."""
    nb = _n_user_buckets(ds)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_types": pa.array([], pa.int64()),
                "max_hourly": pa.array([], pa.int64()),
                "is_bot": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        users, inv, n_events = np.unique(
            uid, return_inverse=True, return_counts=True
        )
        import pandas as pd

        tcodes, uniq_types = pd.factorize(et)
        ntc = np.int64(max(len(uniq_types), 1))
        n_types = np.zeros(len(users), dtype=np.int64)
        # distinct (user, type) pairs via one packed-key unique; null
        # types factorize to -1 and must not count (SQL's
        # count(DISTINCT ...) ignores NULLs — and an unmasked -1 would
        # credit the wrong user via negative indexing)
        valid = tcodes >= 0
        tkey = np.unique(
            inv.astype(np.int64)[valid] * ntc + tcodes[valid]
        )
        np.add.at(n_types, tkey // ntc, 1)
        hour = ts // 3_600_000_000
        hkey, hcnt = np.unique(
            inv.astype(np.int64) * np.int64(1 << 32)
            + (hour - hour.min()).astype(np.int64),
            return_counts=True,
        )
        max_hourly = np.zeros(len(users), dtype=np.int64)
        np.maximum.at(max_hourly, (hkey >> 32).astype(np.int64), hcnt.astype(np.int64))
        is_bot = (
            (max_hourly >= burst_threshold)
            | ((n_types == 1) & (n_events >= mono_threshold))
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(users.astype(np.int64)),
                "n_events": pa.array(n_events.astype(np.int64)),
                "n_types": pa.array(n_types),
                "max_hourly": pa.array(max_hourly),
                "is_bot": pa.array(is_bot),
            }
        )

    return (
        ds.map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def peak_concurrency(ds, chunk_us: int = 86_400_000_000) -> "ray.data.Dataset":
    """Per-type PEAK CONCURRENCY over a set of time intervals — the
    sweep-line max-overlap operator: each input row is a half-open span
    [s_us, e_us) tagged with ``event_type``; output is one row per type
    with the maximum number of simultaneously-open spans and the
    earliest microsecond at which that peak is first reached.

    Scale shape (the sweep needs a GLOBAL time order per type, which a
    single ``groupby(event_type)`` group cannot hold at corpus scale):
    boundaries (+1 at s, -1 at e) are chunked by ``t // chunk_us`` and
    exchanged on ``chunk % nb`` — each (type, chunk) summary
    ``(sum_d, max_prefix, first_t)`` is computed with one segmented
    cumsum (no per-row Python), and chunk summaries compose
    associatively: chunk i's local prefix peaks are offset by the
    cumulative net delta of all earlier chunks.  The second exchange is
    type-cardinality-sized (tiny).  Equal-timestamp ties order ends
    before starts (d ascending), i.e. half-open semantics, matching the
    SQL ``SUM(d) OVER (ORDER BY t, d)`` replay exactly; per-row tie
    order beyond (t, d) cannot change any (t, running-count) pair, so
    the result is parallelism-independent."""
    import pyarrow.compute as pc

    nb = _n_user_buckets(ds)

    def bounds(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        s = t.column("s_us").to_numpy(zero_copy_only=False)
        e = t.column("e_us").to_numpy(zero_copy_only=False)
        tt = np.concatenate([s, e])
        dd = np.concatenate(
            [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
        )
        et2 = pa.chunked_array([et, et])
        ck = tt // chunk_us
        return pa.table(
            {
                "event_type": et2.combine_chunks(),
                "t": pa.array(tt),
                "d": pa.array(dd),
                "_ck": pa.array(ck),
                "_pbkt": pa.array((ck % nb).astype(np.int64)),
            }
        )

    def chunk_summary(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "_ck": pa.array([], pa.int64()),
                "sum_d": pa.array([], pa.int64()),
                "max_prefix": pa.array([], pa.int64()),
                "first_t": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        de = g.column("event_type").combine_chunks().dictionary_encode()
        tc = de.indices.to_numpy().astype(np.int64)
        t = g.column("t").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False)
        ck = g.column("_ck").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, t, ck, tc))
        tc_s, t_s, d_s, ck_s = tc[order], t[order], d[order], ck[order]
        n = len(t_s)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (tc_s[1:] != tc_s[:-1]) | (ck_s[1:] != ck_s[:-1])
        starts = np.nonzero(new)[0]
        lens = np.diff(np.append(starts, n))
        cs = np.cumsum(d_s)
        base = np.concatenate(([0], cs[:-1]))[starts]
        within = cs - np.repeat(base, lens)
        maxp = np.maximum.reduceat(within, starts)
        cand = np.where(
            within == np.repeat(maxp, lens), np.arange(n, dtype=np.int64), n
        )
        fidx = np.minimum.reduceat(cand, starts)
        ends = np.append(starts[1:], n) - 1
        return pa.table(
            {
                "event_type": pc.take(de.dictionary, pa.array(tc_s[starts])),
                "_ck": pa.array(ck_s[starts]),
                "sum_d": pa.array(within[ends]),
                "max_prefix": pa.array(maxp),
                "first_t": pa.array(t_s[fidx]),
            }
        )

    def combine_type(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "peak": pa.array([], pa.int64()),
                "first_peak_us": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        ck = g.column("_ck").to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        sum_d = g.column("sum_d").to_numpy(zero_copy_only=False)[order]
        maxp = g.column("max_prefix").to_numpy(zero_copy_only=False)[order]
        ft = g.column("first_t").to_numpy(zero_copy_only=False)[order]
        before = np.concatenate(([0], np.cumsum(sum_d)[:-1]))
        cand = before + maxp
        peak = int(cand.max())
        i = int(np.argmax(cand == peak))
        return pa.table(
            {
                "event_type": g.column("event_type").take(pa.array([0])),
                "peak": pa.array([peak], pa.int64()),
                "first_peak_us": pa.array([int(ft[i])], pa.int64()),
            }
        )

    # chunk summaries are (types x chunks)-bounded — gather them
    # (documented bound, independent of input rows) and run the tiny
    # per-type sequential combine once, instead of paying a second
    # all-to-all for a handful of rows
    import ray
    import ray.data

    summaries = (
        ds.map_batches(bounds, batch_format="pyarrow")
        .groupby("_pbkt")
        .map_groups(chunk_summary, batch_format="pyarrow")
        .materialize()
    )
    tabs = [
        t for t in ray.get(list(summaries.to_arrow_refs())) if t.num_columns
    ]
    empty_out = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "peak": pa.array([], pa.int64()),
            "first_peak_us": pa.array([], pa.int64()),
        }
    )
    if not tabs:
        return ray.data.from_arrow(empty_out)
    tbl = pa.concat_tables(tabs).combine_chunks()
    if tbl.num_rows == 0:
        return ray.data.from_arrow(empty_out)
    de = tbl.column("event_type").combine_chunks().dictionary_encode()
    tc = de.indices.to_numpy().astype(np.int64)
    out = [
        combine_type(tbl.filter(pa.array(tc == code)))
        for code in range(len(de.dictionary))
    ]
    return ray.data.from_arrow(pa.concat_tables(out))


def hourly_ohlc(ds) -> "ray.data.Dataset":
    """Per (event_type, hour) OHLC bars over value cents — open/close =
    first/last value in deterministic (ts_us, event_id) order, high/low
    = max/min, plus the bar's row count.  The classic time-series
    resample, exact-integer end to end.

    Scale shape: fully DECOMPOSABLE — every batch folds to at most one
    partial row per (type, hour) it touches (open/close candidates
    carry their (ts_us, event_id) keys), so the exchange moves
    bar-cardinality-sized partials, never raw events; the combine is
    the same segmented kernel over partials.  The exchange keys on
    ``hour % nb``; skew is impossible because partials per (type, hour)
    are bounded by the upstream block count."""
    import pyarrow.compute as pc

    nb = _n_user_buckets(ds)

    def partial(t: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "hour": pa.array([], pa.int64()),
            "o_ts": pa.array([], pa.int64()),
            "o_eid": pa.array([], pa.int64()),
            "open_cents": pa.array([], pa.int64()),
            "c_ts": pa.array([], pa.int64()),
            "c_eid": pa.array([], pa.int64()),
            "close_cents": pa.array([], pa.int64()),
            "high_cents": pa.array([], pa.int64()),
            "low_cents": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
        if t.num_rows == 0:
            return pa.table(cols)
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        cents = np.rint(
            t.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        de = t.column("event_type").combine_chunks().dictionary_encode()
        tc = de.indices.to_numpy().astype(np.int64)
        hour = ts // 3_600_000_000
        pack = tc * np.int64(1 << 40) + hour
        order = np.lexsort((eid, ts, pack))
        p_s, ts_s, eid_s, c_s = pack[order], ts[order], eid[order], cents[order]
        n = len(p_s)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = p_s[1:] != p_s[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], n) - 1
        lens = np.diff(np.append(starts, n))
        return pa.table(
            {
                "event_type": pc.take(
                    de.dictionary, pa.array(tc[order][starts])
                ),
                "hour": pa.array(hour[order][starts]),
                "o_ts": pa.array(ts_s[starts]),
                "o_eid": pa.array(eid_s[starts]),
                "open_cents": pa.array(c_s[starts]),
                "c_ts": pa.array(ts_s[ends]),
                "c_eid": pa.array(eid_s[ends]),
                "close_cents": pa.array(c_s[ends]),
                "high_cents": pa.array(np.maximum.reduceat(c_s, starts)),
                "low_cents": pa.array(np.minimum.reduceat(c_s, starts)),
                "n": pa.array(lens.astype(np.int64)),
            }
        )

    def add_bkt(t: pa.Table) -> pa.Table:
        h = t.column("hour").to_numpy(zero_copy_only=False)
        return t.append_column("_hbkt", pa.array((h % nb).astype(np.int64)))

    def combine(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_hbkt"]).combine_chunks()
        if g.num_rows == 0:
            return g.select(
                [
                    "event_type",
                    "hour",
                    "open_cents",
                    "high_cents",
                    "low_cents",
                    "close_cents",
                    "n",
                ]
            )
        de = g.column("event_type").combine_chunks().dictionary_encode()
        tc = de.indices.to_numpy().astype(np.int64)
        hour = g.column("hour").to_numpy(zero_copy_only=False)
        pack = tc * np.int64(1 << 40) + hour
        o_ts = g.column("o_ts").to_numpy(zero_copy_only=False)
        o_eid = g.column("o_eid").to_numpy(zero_copy_only=False)
        c_ts = g.column("c_ts").to_numpy(zero_copy_only=False)
        c_eid = g.column("c_eid").to_numpy(zero_copy_only=False)
        order = np.lexsort((o_eid, o_ts, pack))
        p_s = pack[order]
        n = len(p_s)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = p_s[1:] != p_s[:-1]
        starts = np.nonzero(new)[0]
        # close: independently order by (pack, c_ts, c_eid); last per seg
        order_c = np.lexsort((c_eid, c_ts, pack))
        ends = np.append(starts[1:], n) - 1
        oc = g.column("open_cents").to_numpy(zero_copy_only=False)
        cc = g.column("close_cents").to_numpy(zero_copy_only=False)
        hi = g.column("high_cents").to_numpy(zero_copy_only=False)
        lo = g.column("low_cents").to_numpy(zero_copy_only=False)
        nn = g.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": pc.take(
                    de.dictionary, pa.array(tc[order][starts])
                ),
                "hour": pa.array(hour[order][starts]),
                "open_cents": pa.array(oc[order][starts]),
                "high_cents": pa.array(np.maximum.reduceat(hi[order], starts)),
                "low_cents": pa.array(np.minimum.reduceat(lo[order], starts)),
                "close_cents": pa.array(cc[order_c][ends]),
                "n": pa.array(np.add.reduceat(nn[order], starts)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bkt, batch_format="pyarrow")
        .groupby("_hbkt")
        .map_groups(combine, batch_format="pyarrow")
    )


SCD_OPEN_END_US = (1 << 63) - 1  # open-ended validity sentinel (not NULL:
# DuckDB fetchdf turns a nullable BIGINT into float64, which would break
# the dtype-strict hash parity the correctness gate enforces)


def scd2_intervals(ds) -> "ray.data.Dataset":
    """Slowly-changing-dimension (type-2) history build from an event
    log: per user, consecutive events with the SAME ``event_type``
    collapse into one validity interval ``[valid_from_us,
    valid_to_us)``; a new row opens whenever the state CHANGES in
    (ts_us, event_id) order.  The last interval per user is open-ended
    (``valid_to_us = SCD_OPEN_END_US``).  Null event_type rows are
    dropped (state unknown), matching the oracle's ``WHERE event_type
    IS NOT NULL``.

    ONE user-bucket exchange; the bucket kernel is a single lexsort +
    change-flag filter + one shift — no per-user Python.  Event_id
    breaks timestamp ties, so the change sequence (and therefore every
    output row) is deterministic at any parallelism."""
    import pyarrow.compute as pc

    nb = _n_user_buckets(ds)

    def part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("event_type")))
        return _add_user_bucket(t, nb)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "version": pa.array([], pa.int64()),
                "valid_from_us": pa.array([], pa.int64()),
                "valid_to_us": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = (
            g.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        de = g.column("event_type").combine_chunks().dictionary_encode()
        tc = de.indices.to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, ts_s, tc_s = u[order], ts[order], tc[order]
        n = len(u_s)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = u_s[1:] != u_s[:-1]
        change = first.copy()
        change[1:] |= tc_s[1:] != tc_s[:-1]
        cu, cts, ctc = u_s[change], ts_s[change], tc_s[change]
        cfirst = first[change]
        m = len(cu)
        starts = np.nonzero(cfirst)[0]
        lens = np.diff(np.append(starts, m))
        version = (
            np.arange(m, dtype=np.int64) - np.repeat(starts, lens) + 1
        )
        vt = np.empty(m, dtype=np.int64)
        vt[:-1] = cts[1:]
        vt[-1] = SCD_OPEN_END_US
        last = np.zeros(m, dtype=bool)
        last[np.append(starts[1:], m) - 1] = True
        vt[last] = SCD_OPEN_END_US
        return pa.table(
            {
                "user_id": pa.array(cu.astype(np.int64)),
                "event_type": pc.take(de.dictionary, pa.array(ctc)),
                "version": pa.array(version),
                "valid_from_us": pa.array(cts),
                "valid_to_us": pa.array(vt),
            }
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def debounce_events(ds, window_us: int = 86_400_000_000) -> "ray.data.Dataset":
    """Windowed event DEDUP (throttle/debounce): within each
    ``(user_id, event_type, ts // window_us)`` window only the FIRST
    event in (ts_us, event_id) order survives; output one row per
    window with the surviving event_id and the window's total event
    count.  The standard at-least-once-delivery / retry-storm cleanup
    for event logs.  Null event_type rows are dropped (matching the
    oracle's filter).

    ONE user-bucket exchange; the bucket kernel is a single lexsort +
    first-per-segment pick — the (user, type, window) key never
    becomes a Ray group (near-row-cardinality keys would put Python in
    the per-group path; see ``relational.bucketed_group_aggregate``)."""
    import pyarrow.compute as pc

    nb = _n_user_buckets(ds)

    def part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("event_type")))
        return _add_user_bucket(t, nb)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "win": pa.array([], pa.int64()),
                "keep_event_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = (
            g.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        de = g.column("event_type").combine_chunks().dictionary_encode()
        tc = de.indices.to_numpy().astype(np.int64)
        win = ts // window_us
        order = np.lexsort((eid, ts, win, tc, u))
        u_s, tc_s, w_s = u[order], tc[order], win[order]
        n = len(u_s)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (
            (u_s[1:] != u_s[:-1])
            | (tc_s[1:] != tc_s[:-1])
            | (w_s[1:] != w_s[:-1])
        )
        starts = np.nonzero(new)[0]
        lens = np.diff(np.append(starts, n))
        return pa.table(
            {
                "user_id": pa.array(u_s[starts].astype(np.int64)),
                "event_type": pc.take(de.dictionary, pa.array(tc_s[starts])),
                "win": pa.array(w_s[starts]),
                "keep_event_id": pa.array(eid[order][starts]),
                "n_events": pa.array(lens.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def rank_u_statistic(ds, type_a: str, type_b: str) -> "ray.data.Dataset":
    """EXACT Mann-Whitney rank-sum statistic between two event types
    over value cents — the nonparametric two-sample location test at
    corpus scale.  Emits ``(n_a, n_b, u2)`` with ``u2 = 2*U_a`` =
    ``2*#{(a, b): a > b} + #{a == b}`` — doubled so midrank ties stay
    INTEGER and the whole statistic hash-certifies (U itself can be
    half-integral under ties; the caller divides by 2 for U, or by
    ``2*n_a*n_b`` for the rank-biserial/AUC).

    Scale shape: never a cross join — counts per distinct cents value
    fold map-side through one bucketed exchange (value-domain-sized,
    the same documented bound as the quantile bracket scans), then the
    cumulative-count identity ``U2 = sum_v na(v) * (2*cumB<(v) +
    nb(v))`` runs once over the gathered histogram."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    def prep(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        m = pc.or_(pc.equal(et, type_a), pc.equal(et, type_b))
        t = t.filter(m)
        cents = np.rint(
            t.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        isa = pc.equal(t.column("event_type"), type_a).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "c": pa.array(cents),
                "na": pa.array(isa.astype(np.int64)),
                "nb": pa.array((~isa).astype(np.int64)),
            }
        )

    hist = bucketed_group_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["c"],
        [("na", "sum", "na"), ("nb", "sum", "nb")],
    ).materialize()
    tabs = [t for t in ray.get(list(hist.to_arrow_refs())) if t.num_columns]
    tbl = (
        pa.concat_tables(tabs).combine_chunks()
        if tabs
        else pa.table(
            {
                "c": pa.array([], pa.int64()),
                "na": pa.array([], pa.int64()),
                "nb": pa.array([], pa.int64()),
            }
        )
    )
    c = tbl.column("c").to_numpy(zero_copy_only=False)
    na = tbl.column("na").to_numpy(zero_copy_only=False)
    nb = tbl.column("nb").to_numpy(zero_copy_only=False)
    order = np.argsort(c, kind="stable")
    na_s, nb_s = na[order], nb[order]
    nb_less = np.concatenate(([0], np.cumsum(nb_s)[:-1]))
    u2 = int(np.sum(na_s * (2 * nb_less + nb_s)))
    return ray.data.from_arrow(
        pa.table(
            {
                "n_a": pa.array([int(na_s.sum())], pa.int64()),
                "n_b": pa.array([int(nb_s.sum())], pa.int64()),
                "u2": pa.array([u2], pa.int64()),
            }
        )
    )


def out_of_order_arrivals(ds) -> "ray.data.Dataset":
    """Stream-disorder audit per user: walking events in ARRIVAL order
    (event_id), count how often the event time steps backwards vs the
    previous arrival and the largest backward jump — the measurement a
    watermark/late-data policy is tuned against.  Output one row per
    user: (n_arrivals, n_ooo, max_backstep_us).

    ONE user-bucket exchange; segmented diff kernel (lexsort by
    (user, event_id), per-user boundary masks) — no per-user Python."""
    nb = _n_user_buckets(ds)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_arrivals": pa.array([], pa.int64()),
                "n_ooo": pa.array([], pa.int64()),
                "max_backstep_us": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = (
            g.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, u))
        u_s, ts_s = u[order], ts[order]
        n = len(u_s)
        same_user = np.zeros(n, dtype=bool)
        same_user[1:] = u_s[1:] == u_s[:-1]
        back = np.zeros(n, dtype=np.int64)
        back[1:] = ts_s[:-1] - ts_s[1:]
        back = np.where(same_user, back, 0)
        uniq, inv = np.unique(u_s, return_inverse=True)
        k = len(uniq)
        n_arr = np.bincount(inv, minlength=k).astype(np.int64)
        n_ooo = np.zeros(k, dtype=np.int64)
        np.add.at(n_ooo, inv, (back > 0).astype(np.int64))
        max_back = np.zeros(k, dtype=np.int64)
        np.maximum.at(max_back, inv, np.maximum(back, 0))
        return pa.table(
            {
                "user_id": pa.array(uniq.astype(np.int64)),
                "n_arrivals": pa.array(n_arr),
                "n_ooo": pa.array(n_ooo),
                "max_backstep_us": pa.array(max_back),
            }
        )

    return (
        ds.map_batches(lambda t: _add_user_bucket(t, nb), batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def histogram_drift(
    ds, type_a: str, type_b: str, bin_cents: int = 500
) -> "ray.data.Dataset":
    """EXACT distribution-drift statistic between two event types over
    binned value cents — the integer core of a total-variation /
    PSI-style drift monitor: one row ``(n_a, n_b, tvd_num)`` with
    ``tvd_num = sum over bins |na*NB - nb*NA|`` (the TVD numerator
    cross-scaled to integers; the caller divides by ``2*NA*NB`` for
    TVD itself — float normalization cannot hash-certify, the integer
    numerator can).  Bins are floor(cents / bin_cents) — floor, not
    truncation, matching the SQL ``floor(c / b)`` replay on negatives.

    Same scale shape as :func:`rank_u_statistic`: per-bin counts fold
    map-side through one bucketed exchange (bin-cardinality-sized),
    then one pass over the gathered histogram."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    def prep(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        m = pc.or_(pc.equal(et, type_a), pc.equal(et, type_b))
        t = t.filter(m)
        cents = np.rint(
            t.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        isa = pc.equal(t.column("event_type"), type_a).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "bin": pa.array(cents // bin_cents),  # numpy floor div
                "na": pa.array(isa.astype(np.int64)),
                "nb": pa.array((~isa).astype(np.int64)),
            }
        )

    hist = bucketed_group_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["bin"],
        [("na", "sum", "na"), ("nb", "sum", "nb")],
    ).materialize()
    tabs = [t for t in ray.get(list(hist.to_arrow_refs())) if t.num_columns]
    tbl = (
        pa.concat_tables(tabs).combine_chunks()
        if tabs
        else pa.table(
            {
                "bin": pa.array([], pa.int64()),
                "na": pa.array([], pa.int64()),
                "nb": pa.array([], pa.int64()),
            }
        )
    )
    na = tbl.column("na").to_numpy(zero_copy_only=False).astype(np.int64)
    nb = tbl.column("nb").to_numpy(zero_copy_only=False).astype(np.int64)
    NA, NB = int(na.sum()), int(nb.sum())
    tvd = int(np.abs(na * NB - nb * NA).sum())
    return ray.data.from_arrow(
        pa.table(
            {
                "n_a": pa.array([NA], pa.int64()),
                "n_b": pa.array([NB], pa.int64()),
                "tvd_num": pa.array([tvd], pa.int64()),
            }
        )
    )


def user_accretion(ds) -> "ray.data.Dataset":
    """Running DISTINCT-user curve — growth accounting: per day, how
    many users appear for the FIRST time and the cumulative distinct
    user count to date.  The classic "running count distinct" that a
    naive window cannot compute: first-appearance day per user is one
    decomposable min-aggregate (user-grain bucketed exchange), the
    day-grain counts + cumulative sum then run over the CALENDAR-SIZED
    result (bounded gather, same documented bound as the calendar
    scans).  Output (day, new_users, cum_users)."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    def prep(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pa.array(ts // 86_400_000_000),
            }
        )

    first_day = bucketed_group_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        [("day", "min", "first_day")],
    )

    def day_counts(t: pa.Table) -> pa.Table:
        fd = t.column("first_day").to_numpy(zero_copy_only=False)
        d, n = np.unique(fd, return_counts=True)
        return pa.table(
            {
                "day": pa.array(d.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    # day-grain partials per block; the gather is calendar x blocks
    # bounded (the documented calendar-scan bound), saving the second
    # exchange the day-grain rollup would otherwise pay
    per_day = first_day.map_batches(
        day_counts, batch_format="pyarrow"
    ).materialize()
    tabs = [t for t in ray.get(list(per_day.to_arrow_refs())) if t.num_columns]
    tbl = (
        pa.concat_tables(tabs).combine_chunks()
        if tabs
        else pa.table(
            {"day": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
    )
    d = tbl.column("day").to_numpy(zero_copy_only=False)
    n = tbl.column("n").to_numpy(zero_copy_only=False)
    d_s, inv = np.unique(d, return_inverse=True)
    n_s = np.zeros(len(d_s), dtype=np.int64)
    np.add.at(n_s, inv, n)
    return ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array(d_s.astype(np.int64)),
                "new_users": pa.array(n_s.astype(np.int64)),
                "cum_users": pa.array(np.cumsum(n_s).astype(np.int64)),
            }
        )
    )


def day_churn(ds) -> "ray.data.Dataset":
    """Day-over-day retention/churn: per active day, the distinct-user
    count, how many of them are also active the NEXT day (retained),
    and how many are not (churned).  Per-user sorted distinct-day
    lists never leave their bucket — adjacency is a segmented diff —
    and only day-grain count partials reach the final calendar-sized
    exchange.  Output (day, n_active, n_retained, n_churned)."""
    import pyarrow.compute as pc

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    nb = _n_user_buckets(ds)

    def prep(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        out = pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pa.array(ts // 86_400_000_000),
            }
        )
        return _add_user_bucket(out, nb)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "day": pa.array([], pa.int64()),
                "n_active": pa.array([], pa.int64()),
                "n_retained": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        d = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u_s, d_s = u[order], d[order]
        keep = np.empty(len(u_s), dtype=bool)
        keep[0] = True
        keep[1:] = (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])
        u_s, d_s = u_s[keep], d_s[keep]
        n = len(u_s)
        same = np.zeros(n, dtype=bool)
        same[:-1] = (u_s[1:] == u_s[:-1]) & (d_s[1:] == d_s[:-1] + 1)
        days, inv = np.unique(d_s, return_inverse=True)
        act = np.bincount(inv, minlength=len(days)).astype(np.int64)
        ret = np.zeros(len(days), dtype=np.int64)
        np.add.at(ret, inv, same.astype(np.int64))
        return pa.table(
            {
                "day": pa.array(days.astype(np.int64)),
                "n_active": pa.array(act),
                "n_retained": pa.array(ret),
            }
        )

    folded = bucketed_group_aggregate(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow"),
        ["day"],
        [("n_active", "sum", "n_active"), ("n_retained", "sum", "n_retained")],
    )

    def finish(t: pa.Table) -> pa.Table:
        act = t.column("n_active").to_numpy(zero_copy_only=False)
        ret = t.column("n_retained").to_numpy(zero_copy_only=False)
        return t.append_column("n_churned", pa.array((act - ret).astype(np.int64)))

    return folded.map_batches(finish, batch_format="pyarrow")


def rolling_active_users(ds, window_days: int = 7) -> "ray.data.Dataset":
    """EXACT rolling-window distinct users — for every observed
    activity day ``d``, how many distinct users were active in
    ``[d - window + 1, d]``.  The window-distinct a naive rolling count
    cannot do (users repeat across days).  Per user, each active day
    contributes the day-interval ``[day, day + window)``; overlapping
    intervals merge (the gaps-and-islands kernel), so the user counts
    ONCE toward every day in the union — then island boundaries become
    +1/-1 deltas, deltas fold per DAY through one bucketed exchange,
    and the running sum over the CALENDAR-SIZED delta list answers
    every observed day via one searchsorted.  No per-day distinct sets
    ever exist anywhere."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    nb = _n_user_buckets(ds)
    W = np.int64(window_days)

    def prep(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        out = pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pa.array(ts // 86_400_000_000),
            }
        )
        return _add_user_bucket(out, nb)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "day": pa.array([], pa.int64()),
                "delta": pa.array([], pa.int64()),
                "observed": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        d = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u_s, d_s = u[order], d[order]
        keep = np.empty(len(u_s), dtype=bool)
        keep[0] = True
        keep[1:] = (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])
        u_s, d_s = u_s[keep], d_s[keep]
        n = len(u_s)
        # island break: new user OR gap > window (interval [day, day+W))
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (u_s[1:] != u_s[:-1]) | (d_s[1:] >= d_s[:-1] + W)
        isl = np.cumsum(brk) - 1
        starts = d_s[brk]
        # init to int64 min, NOT zero: pre-epoch activity days are
        # negative and a zero floor would clamp their island ends
        ends = np.full(isl[-1] + 1, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(ends, isl, d_s + W)
        days = np.concatenate([starts, ends])
        deltas = np.concatenate(
            [
                np.ones(len(starts), dtype=np.int64),
                -np.ones(len(ends), dtype=np.int64),
            ]
        )
        # fold bucket-locally before the exchange
        dk, inv = np.unique(days, return_inverse=True)
        dsum = np.zeros(len(dk), dtype=np.int64)
        np.add.at(dsum, inv, deltas)
        # observed-day flags ride the same partial rows
        ok = np.unique(d_s)
        all_days = np.union1d(dk, ok)
        out_delta = np.zeros(len(all_days), dtype=np.int64)
        out_delta[np.searchsorted(all_days, dk)] = dsum
        out_obs = np.zeros(len(all_days), dtype=np.int64)
        out_obs[np.searchsorted(all_days, ok)] = 1
        return pa.table(
            {
                "day": pa.array(all_days.astype(np.int64)),
                "delta": pa.array(out_delta),
                "observed": pa.array(out_obs),
            }
        )

    folded = bucketed_group_aggregate(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow"),
        ["day"],
        [("delta", "sum", "delta"), ("observed", "sum", "observed")],
    ).materialize()
    tabs = [
        t for t in ray.get(list(folded.to_arrow_refs())) if t.num_columns
    ]
    empty = pa.table(
        {
            "day": pa.array([], pa.int64()),
            "n_active_w": pa.array([], pa.int64()),
        }
    )
    if not tabs:
        return ray.data.from_arrow(empty)
    tbl = pa.concat_tables(tabs).combine_chunks()
    day = tbl.column("day").to_numpy(zero_copy_only=False)
    delta = tbl.column("delta").to_numpy(zero_copy_only=False)
    obs = tbl.column("observed").to_numpy(zero_copy_only=False)
    order = np.argsort(day, kind="stable")
    day_s, delta_s, obs_s = day[order], delta[order], obs[order]
    running = np.cumsum(delta_s)
    m = obs_s > 0
    return ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array(day_s[m]),
                "n_active_w": pa.array(running[m]),
            }
        )
    )


def coarrival_pairs(ds, window_us: int = 60_000_000) -> "ray.data.Dataset":
    """Short-window CO-ARRIVAL mining: ordered pairs of event types
    where the second event follows the first within ``window_us`` for
    the same user — the temporal-correlation primitive behind
    "A tends to precede B" analyses.  Strict (ts, event_id) order
    breaks simultaneous ties; same-type pairs are excluded.

    Scale shape: pair expansion runs INSIDE the user-bucket exchange —
    for each event, its successors within the window are one
    ``searchsorted`` upper bound away (per-user segment bounds
    clamped), and the pairs materialize with the same repeat/arange
    run-expansion as the basket miner; per-event fan-out is bounded by
    the user's arrival rate x window (a documented skew cap for a
    pathological firehose user would salt by time).  Only
    type-pair-count partials leave the bucket."""
    import pyarrow.compute as pc

    nb = _n_user_buckets(ds)

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    def part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("event_type")))
        return _add_user_bucket(t, nb)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "type_first": pa.array([], pa.string()),
                "type_second": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = (
            g.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        de = g.column("event_type").combine_chunks().dictionary_encode()
        tc = de.indices.to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, ts_s, tc_s = u[order], ts[order], tc[order]
        n = len(u_s)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = u_s[1:] != u_s[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, n))
        # successors within the window, same user only: offset each
        # user segment's times into a disjoint value range so ONE
        # global searchsorted serves every user (the interval_union
        # trick), with the same overflow-guarded per-segment fallback
        seg_idx = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        span = np.int64(ts_s.max() - ts_s.min() + window_us + 2) if n else np.int64(1)
        base = ts_s - np.int64(ts_s.min())
        if (len(starts) + 1) * int(span) < (1 << 62):
            shifted = base + seg_idx * span
            hi = np.searchsorted(shifted, shifted + window_us, side="right")
        else:
            # astronomically wide time domain: per-segment sweep
            hi = np.empty(n, dtype=np.int64)
            bounds = np.append(starts, n)
            for a, b in zip(bounds[:-1], bounds[1:]):
                hi[a:b] = a + np.searchsorted(
                    ts_s[a:b], ts_s[a:b] + window_us, side="right"
                )
        cnt = hi - np.arange(n, dtype=np.int64) - 1
        cnt = np.maximum(cnt, 0)
        a_idx = np.repeat(np.arange(n, dtype=np.int64), cnt)
        excl = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        b_idx = a_idx + 1 + (
            np.arange(int(cnt.sum()), dtype=np.int64)
            - np.repeat(excl, cnt)
        )
        ta, tb = tc_s[a_idx], tc_s[b_idx]
        keep = ta != tb
        ta, tb = ta[keep], tb[keep]
        ntypes = np.int64(max(len(de.dictionary), 1))
        key = ta * ntypes + tb
        uk, ucnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "type_first": pc.take(de.dictionary, pa.array(uk // ntypes)),
                "type_second": pc.take(de.dictionary, pa.array(uk % ntypes)),
                "n": pa.array(ucnt.astype(np.int64)),
            }
        )

    folded = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("_ubkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return bucketed_group_aggregate(
        folded, ["type_first", "type_second"], [("n", "sum", "n")]
    )
