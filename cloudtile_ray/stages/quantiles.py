"""Exact distributed quantiles without a global sort.

``exact_quantiles`` computes value-exact order statistics of an integer
column by iterative bracket refinement (distributed selection): each round
is ONE streaming histogram pass over the column — per-batch
``np.searchsorted`` + ``bincount`` partials merged through a tiny
``groupby(bin).sum`` — after which every quantile's value bracket shrinks
by ~``bucket_count``x.  An integer domain of width W resolves in
ceil(log_B W) passes (2 passes for cent-valued data), each touching only
the 8-byte column, versus the all-to-all shuffle a full ``ds.sort`` would
cost.  The final bracket (<= ``collect_threshold`` rows) is filtered out
and resolved locally.  All active quantiles share each pass (their cut
sets are unioned), so p50/p90/p99 together still cost ~2 scans.

Rank convention: rank(q) = ceil(q*n) - 1 (0-indexed over the ascending
sort) — verified equal to DuckDB's ``quantile_disc`` on boundary probes,
so the DuckDB oracle compares value-exact.

Scale notes: the projected column is materialized once so the log(W)
passes do not re-execute upstream stages (8 bytes/row -> 8 TB per 10^12
rows, spillable across a cluster's object stores; pass
``materialize=False`` to re-scan the lazy pipeline per pass instead).
All histogram state (<= ~512 bins x #quantiles) is driver-tiny; the cut
array rides into tasks as a closure over a small numpy array.

The reference has no quantile operator (it is a tiling CLI); this is one
of the "beyond the reference" training-data-pipeline operators the build
brief requires (corpus length/score percentile cuts).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _histogram_pass(ds, column: str, cuts: np.ndarray) -> np.ndarray:
    """One streaming pass: dense global counts per bin, where bin j holds
    integer values in (cuts[j-1], cuts[j]] (bin 0 = (-inf, cuts[0]], bin
    len(cuts) = (cuts[-1], +inf)); ``searchsorted(cuts, v, 'left')`` =
    #cuts < v is exactly that bin index for integer v and integer cuts."""
    m = len(cuts) + 1
    cuts_local = cuts.copy()

    def part(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(cuts_local, v, side="left")
        cnt = np.bincount(idx, minlength=m)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64)),
                "cnt": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    out = np.zeros(m, dtype=np.int64)
    out[rows["bin"].to_numpy()] = rows["cnt"].to_numpy()
    return out


def _collect_bracket(slim, column: str, lo: int, hi: int) -> np.ndarray:
    """Filter values in [lo, hi] (a bracket already proven small) and
    return them sorted on the driver."""

    def keep(t: pa.Table, a: int = lo, z: int = hi) -> pa.Table:
        col = t.column(column)
        return t.filter(pc.and_(pc.greater_equal(col, a), pc.less_equal(col, z)))

    parts = [
        t.column(column).to_numpy(zero_copy_only=False)
        for t in slim.map_batches(keep, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    return np.sort(np.concatenate(parts or [np.array([], dtype=np.int64)]))


def _prep_column(
    ds, column: str, materialize: bool, driver_gate_bytes: int = 8 << 20
):
    """Project to the one column (+ global count/min/max) shared by every
    selection entry point.  Returns ``(slim, n, glo, ghi, vals)`` where
    ``vals`` is the SORTED gathered column when the materialized
    projection fits ``driver_gate_bytes`` (byte-gated driver path — rank
    selection over a dimension-grain table then costs zero further Ray
    executions; ranks picked from a sorted array are the identical
    values the distributed refinement resolves) and None beyond the gate
    (stats come from one dataset aggregate; refinement stays
    distributed)."""
    from ray.data.aggregate import Count, Max, Min

    slim = ds.map_batches(lambda t: t.select([column]), batch_format="pyarrow")
    if materialize:
        slim = slim.materialize()
        if (slim.size_bytes() or driver_gate_bytes + 1) <= driver_gate_bytes:
            parts = [
                t.column(column).to_numpy(zero_copy_only=False)
                for t in slim.iter_batches(batch_format="pyarrow")
            ]
            vals = np.sort(
                np.concatenate(parts or [np.array([], dtype=np.int64)])
            )
            n = len(vals)
            if n == 0:
                raise ValueError("exact selection on an empty dataset")
            return slim, n, int(vals[0]), int(vals[-1]), vals
    stats = slim.aggregate(Count(), Min(column), Max(column))
    n = int(stats["count()"])
    if n == 0:
        raise ValueError("exact selection on an empty dataset")
    return (
        slim,
        n,
        int(stats[f"min({column})"]),
        int(stats[f"max({column})"]),
        None,
    )


def exact_quantiles(
    ds,
    column: str,
    qs: dict[str, float],
    bucket_count: int = 128,
    collect_threshold: int = 65536,
    materialize: bool = True,
    driver_gate_bytes: int = 8 << 20,
) -> pa.Table:
    """Exact quantiles of integer ``column`` at the given {name: q}
    fractions; returns a one-row Arrow table with one int64 column per
    name.  See module docstring for the algorithm and rank convention."""
    slim, n, glo, ghi, vals = _prep_column(
        ds, column, materialize, driver_gate_bytes
    )
    ranks = {name: max(0, math.ceil(q * n) - 1) for name, q in qs.items()}
    if vals is not None:
        done = {name: int(vals[r]) for name, r in ranks.items()}
    else:
        done = _exact_ranks(
            slim, column, ranks, glo, ghi, bucket_count, collect_threshold
        )
    return pa.table({name: pa.array([done[name]], type=pa.int64()) for name in qs})


def exact_quantiles_cont(
    ds,
    column: str,
    qs: dict[str, float],
    bucket_count: int = 128,
    collect_threshold: int = 65536,
    materialize: bool = True,
    driver_gate_bytes: int = 8 << 20,
) -> pa.Table:
    """Interpolated (``quantile_cont`` / PERCENTILE_CONT) quantiles of
    integer ``column``: h = q*(n-1); result = v[floor(h)]*(ceil(h)-h) +
    v[ceil(h)]*(h-floor(h)) — DuckDB's exact two-product interpolation
    arithmetic on the two bracketing order statistics (NOT the
    algebraically-equal lo+frac*(hi-lo), which differs by 1 ULP), so
    the float64 output is bit-identical to the SQL oracle.  Both ranks
    for every q resolve through the SAME shared bracket-refinement
    passes as :func:`exact_quantiles` (the cut sets union), so p25/p50/
    p90 together still cost ~2 streaming scans and no global sort."""
    slim, n, glo, ghi, vals = _prep_column(
        ds, column, materialize, driver_gate_bytes
    )
    plan: dict[str, tuple[int, float]] = {}
    ranks: dict[str, int] = {}
    for name, q in qs.items():
        h = q * (n - 1)
        lo_rank = int(math.floor(h))
        frac = h - lo_rank
        plan[name] = (lo_rank, frac)
        ranks[f"{name}__lo"] = lo_rank
        if frac > 0.0:
            ranks[f"{name}__hi"] = min(lo_rank + 1, n - 1)
    if vals is not None:
        done = {name: int(vals[r]) for name, r in ranks.items()}
    else:
        done = _exact_ranks(
            slim, column, ranks, glo, ghi, bucket_count, collect_threshold
        )
    out: dict[str, float] = {}
    for name, (lo_rank, frac) in plan.items():
        vlo = float(done[f"{name}__lo"])
        if frac > 0.0:
            vhi = float(done[f"{name}__hi"])
            # DuckDB: lo*(ceil(h)-h) + hi*(h-floor(h))
            out[name] = vlo * (1.0 - frac) + vhi * frac
        else:
            out[name] = vlo
    return pa.table({name: pa.array([out[name]], type=pa.float64()) for name in qs})


def _exact_ranks(
    slim,
    column: str,
    ranks: dict[str, int],
    glo: int,
    ghi: int,
    bucket_count: int = 128,
    collect_threshold: int = 65536,
) -> dict[str, int]:
    """Resolve the value at each 0-indexed ascending rank by shared
    iterative bracket refinement (see module docstring)."""
    # per-rank state: value bracket [lo, hi] and target rank within it
    state = {name: [glo, ghi, r] for name, r in ranks.items()}
    done: dict[str, int] = {}

    for _ in range(64):
        for name, (lo, hi, r) in list(state.items()):
            if name not in done and lo == hi:
                done[name] = lo
        active = [k for k in state if k not in done]
        if not active:
            break
        # shared cut set across all active brackets -> one pass serves all.
        # lo-1 is always a cut so "values < lo" occupy whole bins and the
        # rank offset below is exact (integer domain).
        cut_list = []
        for name in active:
            lo, hi, _r = state[name]
            c = np.unique(np.linspace(lo, hi, bucket_count + 1).astype(np.int64))
            cut_list.append(np.concatenate(([lo - 1], c[:-1])))
        cuts = np.unique(np.concatenate(cut_list))
        hist = _histogram_pass(slim, column, cuts)
        cum = np.concatenate(([0], np.cumsum(hist)))
        for name in active:
            lo, hi, r = state[name]
            base_bin = int(np.searchsorted(cuts, lo, side="left"))
            r_abs = int(cum[base_bin]) + r  # cum[base_bin] == #values < lo
            b = int(np.searchsorted(cum[1:], r_abs + 1, side="left"))
            new_lo = int(cuts[b - 1]) + 1 if b >= 1 else lo
            new_hi = int(cuts[b]) if b < len(cuts) else hi
            new_lo, new_hi = max(new_lo, lo), min(new_hi, hi)
            new_r = int(r_abs - cum[b])
            if new_lo == new_hi:
                done[name] = new_lo
            elif cum[b + 1] - cum[b] <= collect_threshold:
                vals = _collect_bracket(slim, column, new_lo, new_hi)
                done[name] = int(vals[new_r])
            else:
                state[name] = [new_lo, new_hi, new_r]
    else:
        raise RuntimeError("exact rank selection failed to converge")

    return done


def grouped_quantiles(
    ds,
    group_col: str,
    column: str,
    qs: dict[str, float],
    bucket_count: int = 128,
    collect_threshold: int = 65536,
    materialize: bool = True,
    driver_gate_bytes: int = 8 << 20,
) -> pa.Table:
    """Exact per-group quantiles: one row per group, one int64 column per
    quantile name.  The bracket-refinement loop of :func:`exact_quantiles`
    run for ALL groups simultaneously — every round is still ONE streaming
    pass (per-batch: split rows by group, searchsorted against that
    group's cut set, bincount; merged through a (group, bin)-keyed
    groupby-sum whose result is G x bins rows on the driver).

    Scale envelope: built for SMALL group cardinality over HUGE groups
    (languages, sources, buckets — G <= ~10^4; driver state is G x bins).
    A per-language percentile cut over 10^12 docs is exactly this shape —
    a ``groupby(lang).map_groups`` would put one language's entire corpus
    in one task.  For the opposite regime (millions of tiny groups, e.g.
    per-domain) use ``groupby(...).map_groups`` with an in-group sort:
    there each group fits a task trivially and driver-side G x bins state
    would not.
    """
    slim, groups, n_of, lo_of, hi_of, vals_of = _grouped_prep(
        ds, group_col, column, materialize, driver_gate_bytes
    )
    state = {
        (g, name): [lo_of[g], hi_of[g], max(0, math.ceil(q * n_of[g]) - 1)]
        for g in groups
        for name, q in qs.items()
    }
    if vals_of is not None:
        done = {k: int(vals_of[k[0]][st[2]]) for k, st in state.items()}
    else:
        done = _grouped_exact_ranks(
            slim, group_col, column, state, bucket_count, collect_threshold
        )
    order = sorted(groups)
    cols = {group_col: pa.array(order)}
    for name in qs:
        cols[name] = pa.array([done[(g, name)] for g in order], type=pa.int64())
    return pa.table(cols)


def grouped_quantiles_cont(
    ds,
    group_col: str,
    column: str,
    qs: dict[str, float],
    bucket_count: int = 128,
    collect_threshold: int = 65536,
    materialize: bool = True,
    driver_gate_bytes: int = 8 << 20,
) -> pa.Table:
    """Per-group interpolated (``quantile_cont`` / PERCENTILE_CONT)
    quantiles — the grouped form of :func:`exact_quantiles_cont`: for each
    group, h = q*(n_g-1) and both bracketing order statistics resolve
    through the SAME shared multi-group bracket-refinement passes as
    :func:`grouped_quantiles`, then DuckDB's two-product
    lo*(1-frac)+hi*frac interpolation keeps the float64 output
    bit-identical to the SQL oracle.  One row per group, one float64
    column per quantile name; same small-G/huge-group scale envelope as
    the disc variant."""
    slim, groups, n_of, lo_of, hi_of, vals_of = _grouped_prep(
        ds, group_col, column, materialize, driver_gate_bytes
    )
    state: dict[tuple, list] = {}
    plan: dict[tuple, tuple[int, float]] = {}
    for g in groups:
        n = n_of[g]
        for name, q in qs.items():
            h = q * (n - 1)
            lo_rank = int(math.floor(h))
            frac = h - lo_rank
            plan[(g, name)] = (lo_rank, frac)
            state[(g, f"{name}__lo")] = [lo_of[g], hi_of[g], lo_rank]
            if frac > 0.0:
                state[(g, f"{name}__hi")] = [
                    lo_of[g],
                    hi_of[g],
                    min(lo_rank + 1, n - 1),
                ]
    if vals_of is not None:
        done = {k: int(vals_of[k[0]][st[2]]) for k, st in state.items()}
    else:
        done = _grouped_exact_ranks(
            slim, group_col, column, state, bucket_count, collect_threshold
        )
    order = sorted(groups)
    cols: dict = {group_col: pa.array(order)}
    for name in qs:
        vals = []
        for g in order:
            _lo_rank, frac = plan[(g, name)]
            vlo = float(done[(g, f"{name}__lo")])
            if frac > 0.0:
                vhi = float(done[(g, f"{name}__hi")])
                vals.append(vlo * (1.0 - frac) + vhi * frac)
            else:
                vals.append(vlo)
        cols[name] = pa.array(vals, type=pa.float64())
    return pa.table(cols)


def _grouped_prep(
    ds,
    group_col: str,
    column: str,
    materialize: bool,
    driver_gate_bytes: int = 8 << 20,
):
    """(slim, groups, n_of, lo_of, hi_of, vals_of) shared by the grouped
    selection entry points: project to the two columns and take per-group
    count/min/max in one aggregate.  When the materialized projection
    fits ``driver_gate_bytes`` (the same byte-gated driver path as
    :func:`_prep_column`), ``vals_of`` maps each group to its SORTED
    value array — rank selection then costs zero further Ray executions
    and yields the identical values the distributed refinement resolves;
    beyond the gate ``vals_of`` is None."""
    from ray.data.aggregate import Count, Max, Min

    slim = ds.map_batches(
        lambda t: t.select([group_col, column]), batch_format="pyarrow"
    )
    if materialize:
        slim = slim.materialize()
        if (slim.size_bytes() or driver_gate_bytes + 1) <= driver_gate_bytes:
            tabs = [
                pa.table(b) for b in slim.iter_batches(batch_format="pyarrow")
            ]
            if not tabs:
                raise ValueError("grouped selection on an empty dataset")
            t = pa.concat_tables(tabs)
            if t.num_rows == 0:
                raise ValueError("grouped selection on an empty dataset")
            gv = t.column(group_col).to_numpy(zero_copy_only=False)
            vv = t.column(column).to_numpy(zero_copy_only=False).astype(np.int64)
            # factorize the (possibly string) group key so lexsort runs
            # on ints; np.unique returns groups sorted
            uniq, codes = np.unique(gv, return_inverse=True)
            order = np.lexsort((vv, codes))
            codes_s, vv_s = codes[order], vv[order]
            starts = np.searchsorted(codes_s, np.arange(len(uniq)))
            bounds = np.append(starts, len(codes_s))
            vals_of = {
                uniq[i]: vv_s[bounds[i] : bounds[i + 1]]
                for i in range(len(uniq))
            }
            groups = list(uniq)
            n_of = {g: len(vals_of[g]) for g in groups}
            lo_of = {g: int(vals_of[g][0]) for g in groups}
            hi_of = {g: int(vals_of[g][-1]) for g in groups}
            return slim, groups, n_of, lo_of, hi_of, vals_of
    stats = (
        slim.groupby(group_col)
        .aggregate(Count(), Min(column), Max(column))
        .to_pandas()
    )
    if not len(stats):
        raise ValueError("grouped selection on an empty dataset")
    groups = stats[group_col].tolist()
    n_of = dict(zip(groups, stats["count()"].astype(int)))
    lo_of = dict(zip(groups, stats[f"min({column})"].astype(int)))
    hi_of = dict(zip(groups, stats[f"max({column})"].astype(int)))
    return slim, groups, n_of, lo_of, hi_of, None


def _grouped_exact_ranks(
    slim,
    group_col: str,
    column: str,
    state: dict,
    bucket_count: int = 128,
    collect_threshold: int = 65536,
) -> dict:
    """Resolve every ``state[(group, name)] = [lo, hi, rank]`` bracket to
    its exact value via the shared multi-group refinement passes (see
    :func:`grouped_quantiles`); returns {(group, name): value}."""
    import ray
    from ray.data.aggregate import Sum

    done: dict[tuple, int] = {}

    def _pass(cuts_by_group: dict) -> dict:
        """One streaming histogram pass; returns {group: dense counts}."""
        cref = ray.put(cuts_by_group)

        def part(batch: pa.Table) -> pa.Table:
            cbg = ray.get(cref)
            gcol = batch.column(group_col)
            if isinstance(gcol, pa.ChunkedArray):
                gcol = gcol.combine_chunks()
            de = gcol.dictionary_encode()
            codes = de.indices.to_numpy()
            vals = batch.column(column).to_numpy(zero_copy_only=False)
            out_g, out_b, out_c = [], [], []
            for code in np.unique(codes):
                g = de.dictionary[int(code)].as_py()
                cuts = cbg.get(g)
                if cuts is None:
                    continue
                v = vals[codes == code]
                idx = np.searchsorted(cuts, v, side="left")
                cnt = np.bincount(idx, minlength=len(cuts) + 1)
                nz = np.nonzero(cnt)[0]
                out_g.extend([g] * len(nz))
                out_b.append(nz.astype(np.int64))
                out_c.append(cnt[nz].astype(np.int64))
            if not out_g:
                return pa.table(
                    {
                        group_col: pa.array([], pa.string()),
                        "bin": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    group_col: pa.array(out_g),
                    "bin": pa.array(np.concatenate(out_b)),
                    "cnt": pa.array(np.concatenate(out_c)),
                }
            )

        rows = (
            slim.map_batches(part, batch_format="pyarrow")
            .groupby([group_col, "bin"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
        hists = {}
        for g, sub in rows.groupby(group_col):
            m = len(cuts_by_group[g]) + 1
            h = np.zeros(m, dtype=np.int64)
            h[sub["bin"].to_numpy()] = sub["cnt"].to_numpy()
            hists[g] = h
        return hists

    def _collect_group_brackets(brackets: dict) -> dict:
        """brackets: {group: (lo, hi)} all proven small; one filtered scan
        returns {group: sorted values}."""
        bref = ray.put(brackets)

        def keep(t: pa.Table) -> pa.Table:
            bk = ray.get(bref)
            gcol = t.column(group_col)
            if isinstance(gcol, pa.ChunkedArray):
                gcol = gcol.combine_chunks()
            de = gcol.dictionary_encode()
            codes = de.indices.to_numpy()
            vals = t.column(column).to_numpy(zero_copy_only=False)
            m = np.zeros(len(vals), dtype=bool)
            for code in np.unique(codes):
                g = de.dictionary[int(code)].as_py()
                if g in bk:
                    lo, hi = bk[g]
                    sel = codes == code
                    m[sel] = (vals[sel] >= lo) & (vals[sel] <= hi)
            return t.filter(pa.array(m))

        got: dict[str, list] = {g: [] for g in brackets}
        for t in slim.map_batches(keep, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            gv = t.column(group_col).to_numpy(zero_copy_only=False)
            vv = t.column(column).to_numpy(zero_copy_only=False)
            for g in np.unique(gv):
                got[g].append(vv[gv == g])
        return {
            g: np.sort(np.concatenate(parts or [np.array([], dtype=np.int64)]))
            for g, parts in got.items()
        }

    for _ in range(64):
        for key, (lo, hi, _r) in list(state.items()):
            if key not in done and lo == hi:
                done[key] = lo
        active = [k for k in state if k not in done]
        if not active:
            break
        cuts_by_group: dict = {}
        for g, name in active:
            lo, hi, _r = state[(g, name)]
            c = np.unique(np.linspace(lo, hi, bucket_count + 1).astype(np.int64))
            cs = np.concatenate(([lo - 1], c[:-1]))
            cuts_by_group.setdefault(g, []).append(cs)
        cuts_by_group = {
            g: np.unique(np.concatenate(v)) for g, v in cuts_by_group.items()
        }
        hists = _pass(cuts_by_group)
        to_collect: dict = {}
        for g, name in active:
            lo, hi, r = state[(g, name)]
            cuts = cuts_by_group[g]
            cum = np.concatenate(([0], np.cumsum(hists[g])))
            base_bin = int(np.searchsorted(cuts, lo, side="left"))
            r_abs = int(cum[base_bin]) + r
            b = int(np.searchsorted(cum[1:], r_abs + 1, side="left"))
            new_lo = int(cuts[b - 1]) + 1 if b >= 1 else lo
            new_hi = int(cuts[b]) if b < len(cuts) else hi
            new_lo, new_hi = max(new_lo, lo), min(new_hi, hi)
            new_r = int(r_abs - cum[b])
            if new_lo == new_hi:
                done[(g, name)] = new_lo
            elif cum[b + 1] - cum[b] <= collect_threshold:
                state[(g, name)] = [new_lo, new_hi, new_r]
                prev = to_collect.get(g)
                to_collect[g] = (
                    (min(prev[0], new_lo), max(prev[1], new_hi))
                    if prev
                    else (new_lo, new_hi)
                )
            else:
                state[(g, name)] = [new_lo, new_hi, new_r]
        if to_collect:
            vals_of = _collect_group_brackets(to_collect)
            for g, name in list(state.keys()):
                if (g, name) in done or g not in vals_of:
                    continue
                lo, hi, r = state[(g, name)]
                clo, chi = to_collect[g]
                if lo >= clo and hi <= chi:
                    v = vals_of[g]
                    sub = v[(v >= lo) & (v <= hi)]
                    done[(g, name)] = int(sub[r])
    else:
        raise RuntimeError("grouped rank selection failed to converge")

    return done


def _float_to_ordered_int(v: np.ndarray) -> np.ndarray:
    """Order-isomorphic float64 -> int64 key (IEEE totalOrder): positives
    keep their signed bit pattern, negatives flip the 63 value bits so
    descending magnitude becomes ascending key.  -0.0 < +0.0 and NaN
    sorts above +inf under this order — callers should drop NaN/null
    first if SQL comparison semantics are required."""
    bu = np.ascontiguousarray(v, dtype=np.float64).view(np.uint64)
    mask = np.where(
        (bu >> np.uint64(63)).astype(bool),
        np.uint64(0x7FFFFFFFFFFFFFFF),
        np.uint64(0),
    )
    return (bu ^ mask).view(np.int64)


def _ordered_int_to_float(key: int) -> float:
    """Inverse of :func:`_float_to_ordered_int` for one key."""
    k = np.int64(key)
    if k < 0:
        k = np.int64(k ^ np.int64(0x7FFFFFFFFFFFFFFF))
    return float(np.array([k], dtype=np.int64).view(np.float64)[0])


def exact_quantiles_float(
    ds,
    column: str,
    qs: dict[str, float],
    bucket_count: int = 128,
    collect_threshold: int = 65536,
    materialize: bool = True,
) -> pa.Table:
    """Exact ``quantile_disc`` selection over a FLOAT64 column — the
    integer bracket-refinement machinery applied through the
    order-isomorphic float64<->int64 bit-pattern mapping, so the selected
    order statistics come back as the exact doubles present in the data
    (bit-identical to the SQL oracle; no global sort, same ~2-scan cost
    as :func:`exact_quantiles`).  Nulls and NaNs are dropped before
    selection (SQL aggregate semantics)."""

    def to_key(t: pa.Table) -> pa.Table:
        v = t.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        return pa.table({"__fkey": pa.array(_float_to_ordered_int(v))})

    keyed = ds.map_batches(to_key, batch_format="pyarrow")
    slim, n, glo, ghi, vals = _prep_column(keyed, "__fkey", materialize)
    ranks = {name: max(0, math.ceil(q * n) - 1) for name, q in qs.items()}
    if vals is not None:
        done = {name: int(vals[r]) for name, r in ranks.items()}
    else:
        done = _exact_ranks(
            slim, "__fkey", ranks, glo, ghi, bucket_count, collect_threshold
        )
    return pa.table(
        {
            name: pa.array([_ordered_int_to_float(done[name])], pa.float64())
            for name in qs
        }
    )


def _weighted_histogram_pass(ds, column: str, weight_col: str, cuts: np.ndarray):
    """One streaming pass -> (per-bin int64 weight sums, per-bin int64 row
    counts); bin semantics identical to :func:`_histogram_pass`."""
    m = len(cuts) + 1
    cuts_local = cuts.copy()

    def part(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(cuts_local, v, side="left")
        ws = np.zeros(m, dtype=np.int64)
        np.add.at(ws, idx, w)
        cnt = np.bincount(idx, minlength=m)
        nz = np.nonzero(ws | cnt)[0]
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64)),
                "w": pa.array(ws[nz]),
                "c": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("w", alias_name="w"), Sum("c", alias_name="c"))
        .to_pandas()
    )
    ws = np.zeros(m, dtype=np.int64)
    cs = np.zeros(m, dtype=np.int64)
    ws[rows["bin"].to_numpy()] = rows["w"].to_numpy()
    cs[rows["bin"].to_numpy()] = rows["c"].to_numpy()
    return ws, cs


def exact_weighted_median(
    ds,
    column: str,
    weight_col: str,
    bucket_count: int = 128,
    collect_threshold: int = 65536,
    driver_gate_bytes: int = 8 << 20,
) -> pa.Table:
    """Exact WEIGHTED (lower) median of integer ``column`` under
    non-negative integer ``weight_col``: the smallest value v with
    ``2 * cumweight(v) >= total_weight`` — the weighted order statistic
    (cost/price medians weighted by quantity, duration-weighted medians).
    All-integer arithmetic, exact under any parallelism; returns a
    one-row table (wmedian int64).

    Scale shape mirrors :func:`exact_quantiles`: under the driver gate
    the materialized two-column projection gathers once (sort + integer
    cumsum); beyond it the same iterative bracket refinement runs with
    PER-BIN WEIGHT SUMS instead of row counts (one streaming pass per
    round, driver state is one bin array), and the final bracket —
    proven small by the row-count histogram that rides the same pass —
    is collected and resolved locally."""
    slim = ds.map_batches(
        lambda t: t.select([column, weight_col]), batch_format="pyarrow"
    ).materialize()

    if (slim.size_bytes() or driver_gate_bytes + 1) <= driver_gate_bytes:
        tabs = [pa.table(b) for b in slim.iter_batches(batch_format="pyarrow")]
        if not tabs:
            raise ValueError("weighted median of an empty dataset")
        t = pa.concat_tables(tabs)
        if t.num_rows == 0:
            raise ValueError("weighted median of an empty dataset")
        v = t.column(column).to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if (w < 0).any():
            raise ValueError("weights must be non-negative")
        order = np.argsort(v, kind="stable")
        v_s, w_s = v[order], w[order]
        cw = np.cumsum(w_s)
        total = int(cw[-1])
        pos = int(np.searchsorted(cw, (total + 1) // 2, side="left"))
        return pa.table({"wmedian": pa.array([int(v_s[pos])], pa.int64())})

    from ray.data.aggregate import Max, Min, Sum

    stats = slim.aggregate(Sum(weight_col), Min(column), Max(column))
    total = int(stats[f"sum({weight_col})"])
    lo = int(stats[f"min({column})"])
    hi = int(stats[f"max({column})"])
    target = (total + 1) // 2  # smallest v with cumw >= ceil(W/2)

    for _ in range(64):
        if lo == hi:
            return pa.table({"wmedian": pa.array([lo], pa.int64())})
        c = np.unique(np.linspace(lo, hi, bucket_count + 1).astype(np.int64))
        cuts = np.concatenate(([lo - 1], c[:-1]))
        ws, cs = _weighted_histogram_pass(slim, column, weight_col, cuts)
        cumw = np.concatenate(([0], np.cumsum(ws)))
        base_bin = int(np.searchsorted(cuts, lo, side="left"))
        t_abs = int(cumw[base_bin]) + target
        b = int(np.searchsorted(cumw[1:], t_abs, side="left"))
        new_lo = int(cuts[b - 1]) + 1 if b >= 1 else lo
        new_hi = int(cuts[b]) if b < len(cuts) else hi
        new_lo, new_hi = max(new_lo, lo), min(new_hi, hi)
        target = int(t_abs - cumw[b])
        lo, hi = new_lo, new_hi
        if lo == hi:
            return pa.table({"wmedian": pa.array([lo], pa.int64())})
        if int(cs[b]) <= collect_threshold:
            vals = []
            wts = []
            import pyarrow.compute as _pc

            def keep(t: pa.Table, a: int = lo, z: int = hi) -> pa.Table:
                col = t.column(column)
                return t.filter(
                    _pc.and_(_pc.greater_equal(col, a), _pc.less_equal(col, z))
                )

            for bt in slim.map_batches(keep, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            ):
                bt = pa.table(bt)
                vals.append(bt.column(column).to_numpy(zero_copy_only=False))
                wts.append(bt.column(weight_col).to_numpy(zero_copy_only=False))
            v = np.concatenate(vals).astype(np.int64)
            w = np.concatenate(wts).astype(np.int64)
            order = np.argsort(v, kind="stable")
            v_s, w_s = v[order], w[order]
            cw = np.cumsum(w_s)
            pos = int(np.searchsorted(cw, target, side="left"))
            return pa.table({"wmedian": pa.array([int(v_s[pos])], pa.int64())})
    raise RuntimeError("weighted median selection failed to converge")


def grouped_weighted_median(
    ds,
    group_col: str,
    column: str,
    weight_col: str,
    bucket_count: int = 128,
    collect_threshold: int = 65536,
    driver_gate_bytes: int = 8 << 20,
) -> pa.Table:
    """Exact per-group WEIGHTED (lower) median — the grouped form of
    :func:`exact_weighted_median`: for each group, the smallest value v
    with ``2 * cumweight(v) >= group_total_weight``.  One row per group,
    (group, wmedian) both exact integers.

    Scale shape: under the driver gate the three-column projection
    gathers once (one lexsort + segmented cumsum).  Beyond it, ALL
    groups refine together — every round is ONE streaming pass emitting
    per-(group, bin) weight sums and row counts (the
    :func:`grouped_quantiles` shared-pass envelope: small G over huge
    groups; driver state is G x bins), and every group whose bracket is
    proven small by the row counts collects through one shared filtered
    scan."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    slim = ds.map_batches(
        lambda t: t.select([group_col, column, weight_col]),
        batch_format="pyarrow",
    ).materialize()

    if (slim.size_bytes() or driver_gate_bytes + 1) <= driver_gate_bytes:
        tabs = [pa.table(b) for b in slim.iter_batches(batch_format="pyarrow")]
        if not tabs:
            raise ValueError("grouped weighted median of an empty dataset")
        t = pa.concat_tables(tabs)
        if t.num_rows == 0:
            raise ValueError("grouped weighted median of an empty dataset")
        gv = t.column(group_col).to_numpy(zero_copy_only=False)
        vv = t.column(column).to_numpy(zero_copy_only=False).astype(np.int64)
        wv = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, codes = np.unique(gv, return_inverse=True)
        order = np.lexsort((vv, codes))
        c_s, v_s, w_s = codes[order], vv[order], wv[order]
        starts = np.searchsorted(c_s, np.arange(len(uniq)))
        bounds = np.append(starts, len(c_s))
        meds = np.empty(len(uniq), dtype=np.int64)
        for i in range(len(uniq)):
            a, b = bounds[i], bounds[i + 1]
            cw = np.cumsum(w_s[a:b])
            meds[i] = v_s[a + np.searchsorted(cw, (int(cw[-1]) + 1) // 2)]
        return pa.table(
            {group_col: pa.array(list(uniq)), "wmedian": pa.array(meds)}
        )

    stats = (
        slim.groupby(group_col)
        .aggregate(Sum(weight_col), Min(column), Max(column))
        .to_pandas()
    )
    if not len(stats):
        raise ValueError("grouped weighted median of an empty dataset")
    state: dict = {}
    for _, r in stats.iterrows():
        g = r[group_col]
        total = int(r[f"sum({weight_col})"])
        state[g] = [
            int(r[f"min({column})"]),
            int(r[f"max({column})"]),
            (total + 1) // 2,
        ]
    done: dict = {}

    def _pass(cuts_by_group: dict) -> dict:
        cref = ray.put(cuts_by_group)

        def part(batch: pa.Table) -> pa.Table:
            cbg = ray.get(cref)
            gcol = batch.column(group_col)
            if isinstance(gcol, pa.ChunkedArray):
                gcol = gcol.combine_chunks()
            de = gcol.dictionary_encode()
            codes = de.indices.to_numpy()
            vals = batch.column(column).to_numpy(zero_copy_only=False)
            wts = batch.column(weight_col).to_numpy(zero_copy_only=False)
            out_g, out_b, out_w, out_c = [], [], [], []
            for code in np.unique(codes):
                g = de.dictionary[int(code)].as_py()
                cuts = cbg.get(g)
                if cuts is None:
                    continue
                sel = codes == code
                v = vals[sel]
                w = wts[sel]
                idx = np.searchsorted(cuts, v, side="left")
                m = len(cuts) + 1
                ws = np.zeros(m, dtype=np.int64)
                np.add.at(ws, idx, w)
                cnt = np.bincount(idx, minlength=m)
                nz = np.nonzero(ws | cnt)[0]
                out_g.extend([g] * len(nz))
                out_b.append(nz.astype(np.int64))
                out_w.append(ws[nz])
                out_c.append(cnt[nz].astype(np.int64))
            if not out_g:
                return pa.table(
                    {
                        group_col: pa.array([], pa.string()),
                        "bin": pa.array([], pa.int64()),
                        "w": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    group_col: pa.array(out_g),
                    "bin": pa.array(np.concatenate(out_b)),
                    "w": pa.array(np.concatenate(out_w)),
                    "cnt": pa.array(np.concatenate(out_c)),
                }
            )

        rows = (
            slim.map_batches(part, batch_format="pyarrow")
            .groupby([group_col, "bin"])
            .aggregate(Sum("w", alias_name="w"), Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
        hists = {}
        for g, sub in rows.groupby(group_col):
            m = len(cuts_by_group[g]) + 1
            hw = np.zeros(m, dtype=np.int64)
            hc = np.zeros(m, dtype=np.int64)
            hw[sub["bin"].to_numpy()] = sub["w"].to_numpy()
            hc[sub["bin"].to_numpy()] = sub["cnt"].to_numpy()
            hists[g] = (hw, hc)
        return hists

    def _collect(brackets: dict) -> dict:
        bref = ray.put(brackets)

        def keep(t: pa.Table) -> pa.Table:
            bk = ray.get(bref)
            gcol = t.column(group_col)
            if isinstance(gcol, pa.ChunkedArray):
                gcol = gcol.combine_chunks()
            de = gcol.dictionary_encode()
            codes = de.indices.to_numpy()
            vals = t.column(column).to_numpy(zero_copy_only=False)
            m = np.zeros(len(vals), dtype=bool)
            for code in np.unique(codes):
                g = de.dictionary[int(code)].as_py()
                if g in bk:
                    lo, hi = bk[g]
                    sel = codes == code
                    m |= sel & (vals >= lo) & (vals <= hi)
            return t.filter(pa.array(m))

        gs, vs, ws = [], [], []
        for bt in slim.map_batches(keep, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            bt = pa.table(bt)
            gs.append(bt.column(group_col).to_numpy(zero_copy_only=False))
            vs.append(bt.column(column).to_numpy(zero_copy_only=False))
            ws.append(bt.column(weight_col).to_numpy(zero_copy_only=False))
        if not gs:
            return {}
        g_all = np.concatenate(gs)
        v_all = np.concatenate(vs).astype(np.int64)
        w_all = np.concatenate(ws).astype(np.int64)
        out = {}
        for g in brackets:
            sel = g_all == g
            v = v_all[sel]
            w = w_all[sel]
            order = np.argsort(v, kind="stable")
            out[g] = (v[order], np.cumsum(w[order]))
        return out

    for _ in range(64):
        for g, (lo, hi, tgt) in list(state.items()):
            if g not in done and lo == hi:
                done[g] = lo
        active = [g for g in state if g not in done]
        if not active:
            break
        cuts_by_group = {}
        for g in active:
            lo, hi, _t = state[g]
            c = np.unique(np.linspace(lo, hi, bucket_count + 1).astype(np.int64))
            cuts_by_group[g] = np.concatenate(([lo - 1], c[:-1]))
        hists = _pass(cuts_by_group)
        to_collect = {}
        for g in active:
            lo, hi, tgt = state[g]
            cuts = cuts_by_group[g]
            hw, hc = hists[g]
            cumw = np.concatenate(([0], np.cumsum(hw)))
            base_bin = int(np.searchsorted(cuts, lo, side="left"))
            t_abs = int(cumw[base_bin]) + tgt
            b = int(np.searchsorted(cumw[1:], t_abs, side="left"))
            new_lo = int(cuts[b - 1]) + 1 if b >= 1 else lo
            new_hi = int(cuts[b]) if b < len(cuts) else hi
            new_lo, new_hi = max(new_lo, lo), min(new_hi, hi)
            new_t = int(t_abs - cumw[b])
            if new_lo == new_hi:
                done[g] = new_lo
            elif int(hc[b]) <= collect_threshold:
                state[g] = [new_lo, new_hi, new_t]
                to_collect[g] = (new_lo, new_hi)
            else:
                state[g] = [new_lo, new_hi, new_t]
        if to_collect:
            got = _collect(to_collect)
            for g, (v_s, cw) in got.items():
                if g in done:
                    continue
                _lo, _hi, tgt = state[g]
                done[g] = int(v_s[np.searchsorted(cw, tgt, side="left")])
    else:
        raise RuntimeError("grouped weighted median failed to converge")

    order = sorted(done)
    return pa.table(
        {
            group_col: pa.array(order),
            "wmedian": pa.array([done[g] for g in order], pa.int64()),
        }
    )
