"""Property-based invariants (hypothesis) for the pure-numpy geo kernels
and the new round-5 bucket kernels — randomized inputs instead of fixed
fixtures, catching edge geometries the hand-picked cases miss."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

coord = st.floats(
    min_value=-179.0, max_value=179.0, allow_nan=False, allow_infinity=False
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.tuples(coord, coord), min_size=4, max_size=40),
    st.floats(min_value=1e-6, max_value=5.0),
)
def test_simplify_ring_subset_and_valid(pts, tol):
    """Simplification returns a SUBSET of input vertices, keeps >= 3 for
    rings, and both DP and Visvalingam honor that floor."""
    from cloudtile_ray.geo.simplify import simplify_ring

    ring = np.asarray(pts, dtype=np.float64)
    for vis in (False, True):
        out = simplify_ring(ring, tol, visvalingam=vis)
        assert out.shape[0] >= 3
        # every output vertex is an input vertex (no invention)
        inp = {tuple(p) for p in ring.tolist()}
        assert all(tuple(p) in inp for p in out.tolist())


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.tuples(coord, coord), min_size=3, max_size=30),
    st.floats(min_value=-50, max_value=0),
    st.floats(min_value=-50, max_value=0),
    st.floats(min_value=1e-3, max_value=80),
    st.floats(min_value=1e-3, max_value=80),
)
def test_clip_ring_stays_in_box(pts, w, s, dw, dh):
    """Sutherland-Hodgman output vertices all lie inside (or on) the box."""
    from cloudtile_ray.stages.polygons import clip_ring_to_box

    e, n = w + dw, s + dh
    ring = np.asarray(pts, dtype=np.float64)
    out = clip_ring_to_box(ring, w, s, e, n)
    if len(out):
        eps = 1e-9 * max(abs(w), abs(s), abs(e), abs(n), 1.0)
        assert (out[:, 0] >= w - eps).all() and (out[:, 0] <= e + eps).all()
        assert (out[:, 1] >= s - eps).all() and (out[:, 1] <= n + eps).all()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(coord, min_size=1, max_size=50),
    st.lists(
        st.floats(min_value=-85.0, max_value=85.0, allow_nan=False),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=1, max_value=8),
)
def test_hexgrid_cell_center_roundtrip(lngs, lats, res):
    """A cell's center maps back to the same cell, and parents nest:
    parent(cell(p)) == parent(cell(center(cell(p))))."""
    from cloudtile_ray.geo import hexgrid

    n = min(len(lngs), len(lats))
    lng = np.asarray(lngs[:n]);  lat = np.asarray(lats[:n])
    cells = hexgrid.latlng_to_cell(lng, lat, res)
    clng, clat = hexgrid.cell_to_latlng(cells)
    again = hexgrid.latlng_to_cell(clng, clat, res)
    assert (cells == again).all()
    if res >= 1:
        par = hexgrid.cell_to_parent(cells)
        assert (hexgrid.get_resolution(par) == res - 1).all()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # user
            st.integers(min_value=0, max_value=1000),  # start
            st.integers(min_value=0, max_value=200),  # duration
        ),
        min_size=1,
        max_size=120,
    )
)
def test_interval_union_invariants(ray_session, rows):
    """Coverage <= span of involved intervals; islands <= intervals;
    max island <= coverage; exact vs python merge."""
    import ray.data

    from cloudtile_ray.stages.events import interval_union

    u = np.array([r[0] for r in rows], dtype=np.int64)
    s = np.array([r[1] for r in rows], dtype=np.int64)
    e = s + np.array([r[2] for r in rows], dtype=np.int64)
    t = pa.table({"user_id": pa.array(u), "s_us": pa.array(s), "e_us": pa.array(e)})
    out = interval_union(ray.data.from_arrow(t).repartition(3)).to_pandas()
    for r in out.itertuples(index=False):
        m = u == r.user_id
        span = int(e[m].max() - s[m].min())
        assert 0 <= r.covered_us <= span
        assert 1 <= r.n_islands <= int(m.sum())
        assert r.max_island_us <= r.covered_us
        # python replay
        iv = sorted(zip(s[m].tolist(), e[m].tolist()))
        merged = []
        for a, b in iv:
            if merged and a <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])
        assert r.n_islands == len(merged)
        assert r.covered_us == sum(b - a for a, b in merged)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 6),       # user
            st.integers(-50, 50),    # start day (incl. pre-epoch)
            st.integers(0, 30),      # extra active days spread
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 9),               # window
)
def test_rolling_actives_invariants(ray_session, rows, window):
    """Window-distinct equals the set replay for every observed day;
    monotone in window size is NOT required, but bounds are: at least
    the day's own actives, at most the total distinct users."""
    import ray.data

    from cloudtile_ray.stages.events import rolling_active_users

    u = np.array([r[0] for r in rows], dtype=np.int64)
    day = np.array([r[1] + (r[2] % 7) for r in rows], dtype=np.int64)
    ts = day * 86_400_000_000
    t = pa.table(
        {"user_id": pa.array(u), "ts": pa.array(ts.astype("datetime64[us]"))}
    )
    out = rolling_active_users(
        ray.data.from_arrow(t).repartition(3), window_days=window
    ).to_pandas()
    active = {}
    for uu, dd in zip(u, day):
        active.setdefault(int(dd), set()).add(int(uu))
    got = {int(r.day): int(r.n_active_w) for r in out.itertuples(index=False)}
    assert set(got) == set(active)
    total_users = len(set(u.tolist()))
    for d, n in got.items():
        exact = set()
        for d2 in range(d - window + 1, d + 1):
            exact |= active.get(d2, set())
        assert n == len(exact)
        assert len(active[d]) <= n <= total_users


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 31), st.integers(0, 31)),
        min_size=1,
        max_size=60,
    )
)
def test_compact_uncompact_roundtrip_property(ray_session, cells):
    """uncompact(compact(S)) == S for any occupied set at z=5, and the
    cover never contains a cell whose parent is also in the cover."""
    import ray.data

    from cloudtile_ray.stages.tiles import compact_tiles, uncompact_tiles

    cset = set(cells)
    arr = np.array(sorted(cset), dtype=np.int64)
    t = pa.table({"x": pa.array(arr[:, 0]), "y": pa.array(arr[:, 1])})
    cover_ds = compact_tiles(ray.data.from_arrow(t).repartition(2), 5)
    cover = cover_ds.to_pandas()
    back = uncompact_tiles(
        ray.data.from_arrow(
            pa.table(
                {
                    "z": pa.array(cover["z"].to_numpy()),
                    "x": pa.array(cover["x"].to_numpy()),
                    "y": pa.array(cover["y"].to_numpy()),
                }
            )
        ),
        5,
    ).to_pandas()
    got = {(int(r.x), int(r.y)) for r in back.itertuples(index=False)}
    assert got == cset
    assert len(back) == len(cset)
    cover_set = {(int(r.z), int(r.x), int(r.y)) for r in cover.itertuples(index=False)}
    for (z, x, y) in cover_set:
        assert z == 0 or (z - 1, x // 2, y // 2) not in cover_set


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["p", "q", "r"]),
            st.integers(0, 500),     # start
            st.integers(0, 60),      # duration
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(8, 64),              # chunk size (forces combine paths)
)
def test_peak_concurrency_invariants(ray_session, rows, chunk):
    """Peak equals the brute boundary walk for every type and chunking
    choice — the associative chunk combine cannot depend on chunk_us."""
    import ray.data

    from cloudtile_ray.stages.events import peak_concurrency

    et = np.array([r[0] for r in rows])
    s = np.array([r[1] for r in rows], dtype=np.int64)
    e = s + np.array([r[2] for r in rows], dtype=np.int64)
    t = pa.table(
        {"event_type": pa.array(et), "s_us": pa.array(s), "e_us": pa.array(e)}
    )
    out = peak_concurrency(
        ray.data.from_arrow(t).repartition(3), chunk_us=chunk
    ).to_pandas()
    for tt in set(et.tolist()):
        m = et == tt
        bounds = sorted(
            [(int(x), 1) for x in s[m]] + [(int(x), -1) for x in e[m]],
            key=lambda p: (p[0], p[1]),
        )
        # peak = max over ROW prefixes (can be 0 when every interval is
        # zero-length: -1 sorts before +1 at the same t, dipping below 0
        # transiently); first = min t among rows achieving the peak —
        # exactly the SQL max(c) + min(t) FILTER semantics
        c = 0
        prefixes = []
        for tvalue, d in bounds:
            c += d
            prefixes.append((tvalue, c))
        peak = max(p for _, p in prefixes)
        first = min(tvalue for tvalue, p in prefixes if p == peak)
        row = out[out.event_type == tt]
        assert int(row["peak"].iloc[0]) == peak
        assert int(row["first_peak_us"].iloc[0]) == first
