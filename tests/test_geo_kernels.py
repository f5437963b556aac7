"""Geo kernel tests: WebMercator goldens vs an independent scalar
implementation, PiP vs the naive oracle, simplification and raster
round-trip invariants (FIXTURES.md §4)."""

import math

import numpy as np
import pytest

from cloudtile_ray.geo import pip, raster, simplify, webmercator as wm


def scalar_tile(lon, lat, z):
    """Independent scalar reference (osgeo wiki formulation)."""
    lat = min(max(lat, wm.MIN_LAT), wm.MAX_LAT)
    n = 2**z
    x = int((lon + 180.0) / 360.0 * n)
    lat_rad = math.radians(lat)
    y = int((1.0 - math.log(math.tan(lat_rad) + 1 / math.cos(lat_rad)) / math.pi) / 2.0 * n)
    return min(max(x, 0), n - 1), min(max(y, 0), n - 1)


class TestWebMercator:
    def test_known_tiles(self):
        # hand-checked: null island at z=1 is tile (1, 1) quadrant SE? No:
        # (0,0) -> x = floor(0.5*2)=1, y = floor(0.5*2)=1
        x, y = wm.lonlat_to_tile(np.array([0.0]), np.array([0.0]), 1)
        assert (x[0], y[0]) == (1, 1)
        # Chicago (-87.63, 41.88) at z=10 -> x=262, y=380 (known value)
        x, y = wm.lonlat_to_tile(np.array([-87.63]), np.array([41.88]), 10)
        assert (x[0], y[0]) == (262, 380)

    @pytest.mark.parametrize("z", [0, 1, 4, 6, 12])
    def test_matches_scalar_reference(self, z):
        rng = np.random.default_rng(42)
        lon = rng.uniform(-180, 180, 500)
        lat = rng.uniform(-85.0511, 85.0511, 500)
        # include the edge rows from FIXTURES.md §1
        lon = np.r_[lon, -180.0, 180.0, 0.0, 179.999]
        lat = np.r_[lat, -85.0511, 85.0511, 0.0, 0.0]
        x, y = wm.lonlat_to_tile(lon, lat, z)
        for i in range(len(lon)):
            assert (x[i], y[i]) == scalar_tile(lon[i], lat[i], z), (lon[i], lat[i], z)

    def test_tile_key_roundtrip(self):
        z = np.array([0, 6, 29])
        x = np.array([0, 33, (1 << 29) - 1])
        y = np.array([0, 21, (1 << 29) - 1])
        zz, xx, yy = wm.unpack_tile_key(wm.tile_key(z, x, y))
        np.testing.assert_array_equal(zz, z)
        np.testing.assert_array_equal(xx, x)
        np.testing.assert_array_equal(yy, y)

    def test_pixel_projection_in_range(self):
        rng = np.random.default_rng(7)
        lon = rng.uniform(-180, 180, 200)
        lat = rng.uniform(-85, 85, 200)
        tx, ty, px, py = wm.lonlat_to_pixel(lon, lat, 8)
        assert px.min() >= 0 and px.max() < wm.DEFAULT_EXTENT
        assert py.min() >= 0 and py.max() < wm.DEFAULT_EXTENT
        x2, y2 = wm.lonlat_to_tile(lon, lat, 8)
        np.testing.assert_array_equal(tx, x2)
        np.testing.assert_array_equal(ty, y2)

    def test_tile_bounds_contains_center(self):
        for z in (2, 5):
            x = np.arange(2**z)
            y = np.arange(2**z)
            w, s, e, n = wm.tile_bounds(z, x, y)
            clon = (w + e) / 2
            clat = (s + n) / 2
            xx, yy = wm.lonlat_to_tile(clon, clat, z)
            np.testing.assert_array_equal(xx, x)
            np.testing.assert_array_equal(yy, y)


def random_convex_polygon(rng, cx, cy, r, n):
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    return np.c_[cx + r * np.cos(angles), cy + r * np.sin(angles)]


class TestPip:
    def test_matches_naive_oracle(self):
        rng = np.random.default_rng(42)
        polys = []
        for _ in range(30):
            cx, cy = rng.uniform(-50, 50, 2)
            polys.append([random_convex_polygon(rng, cx, cy, rng.uniform(2, 10), rng.integers(4, 24))])
        # one polygon with a hole
        outer = random_convex_polygon(rng, 0, 0, 40, 16)
        hole = random_convex_polygon(rng, 0, 0, 15, 8)
        polys.append([outer, hole])
        px = rng.uniform(-60, 60, 400)
        py = rng.uniform(-60, 60, 400)
        idx = pip.PipIndex(polys)
        got = set(zip(*[a.tolist() for a in idx.query(px, py)]))
        want = set(pip.naive_pip(polys, px, py))
        assert got == want
        assert len(want) > 50  # sanity: the fixture actually exercises hits

    def test_hole_excluded(self):
        square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
        hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], dtype=float)
        idx = pip.PipIndex([[square, hole]])
        pts_x = np.array([5.0, 2.0, 11.0])
        pts_y = np.array([5.0, 2.0, 5.0])
        pi, pl = idx.query(pts_x, pts_y)
        assert list(pi) == [1]  # only the (2,2) point; (5,5) is in the hole

    def test_strtree_box_query(self):
        rng = np.random.default_rng(1)
        boxes = np.empty((200, 4))
        boxes[:, 0] = rng.uniform(0, 90, 200)
        boxes[:, 1] = rng.uniform(0, 90, 200)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(0.5, 5, 200)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(0.5, 5, 200)
        tree = pip.STRtree(boxes)
        q = np.array([[10, 10, 30, 30], [80, 80, 81, 81], [-5, -5, -1, -1]])
        qi, ii = tree.query_boxes(q)
        got = set(zip(qi.tolist(), ii.tolist()))
        want = set()
        for a in range(q.shape[0]):
            for b in range(boxes.shape[0]):
                if (q[a, 0] <= boxes[b, 2] and q[a, 2] >= boxes[b, 0]
                        and q[a, 1] <= boxes[b, 3] and q[a, 3] >= boxes[b, 1]):
                    want.add((a, b))
        assert got == want

    def test_empty_inputs(self):
        idx = pip.PipIndex([[np.array([[0, 0], [1, 0], [1, 1]], dtype=float)]])
        pi, pl = idx.query(np.empty(0), np.empty(0))
        assert pi.size == 0 and pl.size == 0


class TestSimplify:
    def test_dp_collinear_dropped(self):
        pts = np.array([[0, 0], [1, 0.001], [2, 0], [3, 0.001], [4, 0]], dtype=float)
        mask = simplify.douglas_peucker_mask(pts, tolerance=0.01)
        assert mask[0] and mask[-1]
        assert mask.sum() == 2  # everything within tolerance of the chord
        mask2 = simplify.douglas_peucker_mask(pts, tolerance=1e-5)
        assert mask2.all()

    def test_dp_preserves_spike(self):
        pts = np.array([[0, 0], [1, 0], [2, 5], [3, 0], [4, 0]], dtype=float)
        mask = simplify.douglas_peucker_mask(pts, tolerance=0.5)
        assert mask[2]  # the spike survives

    def test_ring_stays_valid(self):
        ring = np.array([[0, 0], [1, 0.0001], [2, 0], [1, -0.0001]], dtype=float)
        out = simplify.simplify_ring(ring, tolerance=10.0)
        assert out.shape[0] >= 3

    def test_dp_mask_padded_matches_scalar(self):
        """dp_mask_padded must be bit-identical to douglas_peucker_mask
        row-by-row over random small rings of mixed lengths — including
        degenerate repeated-point rows (L2 == 0 chords)."""
        rng = np.random.default_rng(7)
        R, V = 500, 9
        P = np.zeros((R, V, 2))
        cnts = rng.integers(1, V + 1, size=R)
        for r in range(R):
            c = cnts[r]
            P[r, :c] = np.round(rng.uniform(-50, 4146, size=(c, 2)), 1)
            if r % 11 == 0 and c >= 3:  # duplicate endpoints -> L2 == 0
                P[r, c - 1] = P[r, 0]
            if r % 17 == 0 and c >= 4:  # interior duplicate run
                P[r, 2] = P[r, 1]
        for tol in (0.0, 3.0, 40.0, 1e6):
            got = simplify.dp_mask_padded(P, cnts, tol)
            for r in range(R):
                want = simplify.douglas_peucker_mask(P[r, : cnts[r]], tol)
                assert (got[r, : cnts[r]] == want).all(), (r, tol)
                assert not got[r, cnts[r]:].any()

    def test_visvalingam_drops_small_triangles(self):
        pts = np.array([[0, 0], [1, 0.01], [2, 0], [3, 4], [4, 0]], dtype=float)
        mask = simplify.visvalingam_mask(pts, min_area=0.5)
        assert mask[0] and mask[-1] and mask[3]
        assert not mask[1]


class TestRaster:
    def test_rasterize_square(self):
        ring = np.array([[2, 2], [8, 2], [8, 8], [2, 8]], dtype=float)
        g = raster.rasterize([ring], (0, 0, 10, 10), 10, 10)
        assert g[5, 5] == 1 and g[0, 0] == 0
        assert g.sum() == 36  # 6x6 cell centers inside

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        g = (rng.random((12, 12)) < 0.4).astype(np.uint8)
        rings = raster.vectorize(g, (0, 0, 12, 12))
        g2 = raster.rasterize(rings, (0, 0, 12, 12), 12, 12)
        np.testing.assert_array_equal(g, g2)


class TestLines:
    def test_clip_polyline_passthrough(self):
        from cloudtile_ray.stages.lines import clip_polyline_to_box

        pts = np.array([[1, 1], [5, 5], [9, 1]], dtype=float)
        parts = clip_polyline_to_box(pts, 0, 0, 10, 10)
        assert len(parts) == 1
        np.testing.assert_allclose(parts[0], pts)

    def test_clip_polyline_splits_on_reentry(self):
        """An open path that exits and re-enters the box must split into
        TWO parts (MultiLineString) with exact boundary interpolation."""
        from cloudtile_ray.stages.lines import clip_polyline_to_box

        # in -> out the east side -> back in
        pts = np.array([[2, 5], [14, 5], [2, 9]], dtype=float)
        parts = clip_polyline_to_box(pts, 0, 0, 10, 10)
        assert len(parts) == 2
        np.testing.assert_allclose(parts[0], [[2, 5], [10, 5]])
        # re-entry point: segment (14,5)->(2,9) crosses x=10 at t=1/3
        np.testing.assert_allclose(parts[1][0], [10, 5 + 4 / 3])
        np.testing.assert_allclose(parts[1][-1], [2, 9])

    def test_clip_polyline_fully_outside(self):
        from cloudtile_ray.stages.lines import clip_polyline_to_box

        pts = np.array([[20, 20], [30, 30]], dtype=float)
        assert clip_polyline_to_box(pts, 0, 0, 10, 10) == []

    def test_parts_blob_roundtrip(self):
        from cloudtile_ray.stages.lines import decode_parts_blob, encode_parts_blob

        parts = [
            np.array([[0, 0], [5, 5]], dtype=float),
            np.array([[7, 1], [8, 2], [9, 1]], dtype=float),
        ]
        blob, n_pts, n_parts = encode_parts_blob(parts)
        assert (n_pts, n_parts) == (5, 2)
        back = decode_parts_blob(blob)
        assert len(back) == 2
        np.testing.assert_allclose(back[0], parts[0])
        np.testing.assert_allclose(back[1], parts[1])

    def test_parse_coord_lists_matches_scalar(self):
        import pyarrow as pa

        from cloudtile_ray.stages.lines import parse_coord_lists

        rows = ["-100 200,0 0,300 -400", "1 2", "", "-87900 41600,100 -100"]
        lon, lat = parse_coord_lists(pa.array(rows, pa.string()))
        want = []
        for s in rows:
            if not s:
                want.append(([], []))
                continue
            pts = [p.split(" ") for p in s.split(",")]
            want.append(
                ([float(p[0]) / 1000.0 for p in pts], [float(p[1]) / 1000.0 for p in pts])
            )
        assert lon.to_pylist() == [w[0] for w in want]
        assert lat.to_pylist() == [w[1] for w in want]

    def test_assign_line_tiles_options(self):
        import pyarrow as pa

        from cloudtile_ray.stages.lines import AssignLineTiles, decode_parts_blob

        t = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "ln_lon": pa.array([[-0.3, 0.0, 0.3]], pa.list_(pa.float64())),
                "ln_lat": pa.array([[-0.15, 0.15, -0.15]], pa.list_(pa.float64())),
            }
        )
        out = AssignLineTiles(6, 6)(t)
        assert out.num_rows >= 1  # straddles the z6 meridian tile boundary
        total_pts = sum(out.column("n_pts").to_pylist())
        assert total_pts >= 2
        # drop-lines drops everything
        dropped = AssignLineTiles(6, 6, settings={"drop-lines": True})(t)
        assert dropped.num_rows == 0
        # no-line-simplification keeps every interior vertex
        full = AssignLineTiles(6, 6, settings={"no-line-simplification": True, "simplification": 1e9})(t)
        simp = AssignLineTiles(6, 6, settings={"simplification": 1e9})(t)
        assert sum(full.column("n_pts").to_pylist()) >= sum(simp.column("n_pts").to_pylist())
        # decoded geometry stays within the buffered tile box
        for blob in out.column("line_blob").to_pylist():
            for part in decode_parts_blob(blob):
                assert (part >= -5).all() and (part <= 4096 + 5).all()

    def test_assign_line_tiles_vectorized_matches_scalar(self):
        """The vectorized __call__ must be bit-identical (values, blobs,
        row order) to call_scalar across: multi-tile spans, boundary
        crossers, degenerate 0/1-vertex rows, duplicate points, lines
        longer than LONG_VERTS (scalar routing), no-clipping, and tol=0."""
        import pyarrow as pa

        from cloudtile_ray.stages.lines import AssignLineTiles

        rng = np.random.default_rng(11)
        lons, lats, ids = [], [], []
        for r in range(300):
            ids.append(r)
            if r % 23 == 0:
                lons.append([])  # empty line
                lats.append([])
                continue
            if r % 29 == 0:
                lons.append([12.5])  # single vertex
                lats.append([-7.25])
                continue
            n = int(rng.integers(2, 40))
            if r % 37 == 0:
                n = 600  # > LONG_VERTS -> scalar routing
            # walk: small steps keep most lines in 1 tile; occasional big
            # jumps span many tiles and cross buffered boundaries
            scale = 8.0 if r % 5 == 0 else 0.05
            lon0, lat0 = rng.uniform(-170, 170), rng.uniform(-80, 80)
            dl = rng.normal(0, scale, size=(n, 2)).cumsum(axis=0)
            lon = np.clip(lon0 + dl[:, 0], -179.9, 179.9)
            lat = np.clip(lat0 + dl[:, 1], -84.9, 84.9)
            if r % 13 == 0 and n >= 4:
                lon[2], lat[2] = lon[1], lat[1]  # duplicate interior point
            lons.append(np.round(lon, 4).tolist())
            lats.append(np.round(lat, 4).tolist())
        t = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "ln_lon": pa.array(lons, pa.list_(pa.float64())),
                "ln_lat": pa.array(lats, pa.list_(pa.float64())),
            }
        )
        for settings in (
            None,
            {"no-clipping": True},
            {"no-line-simplification": True},
            {"simplification": 200},
            {"buffer": 0},
        ):
            stage = AssignLineTiles(3, 6, settings=settings)
            got = stage(t).combine_chunks()
            want = stage.call_scalar(t).combine_chunks()
            assert got.schema == want.schema, settings
            assert got.num_rows == want.num_rows, settings
            for col in want.column_names:
                assert got.column(col).to_pylist() == want.column(col).to_pylist(), (
                    settings,
                    col,
                )


class TestZOrder:
    def test_spread_bits_matches_naive_interleave(self):
        from cloudtile_ray.geo.zorder import morton_key_8, spread_bits_8

        rng = np.random.default_rng(7)
        v = rng.integers(0, 256, size=512).astype(np.uint32)

        def naive_spread(x: int) -> int:
            return sum(((x >> b) & 1) << (2 * b) for b in range(8))

        got = spread_bits_8(v)
        assert got.tolist() == [naive_spread(int(x)) for x in v]

        cx = rng.integers(0, 256, size=512).astype(np.uint32)
        cy = rng.integers(0, 256, size=512).astype(np.uint32)
        keys = morton_key_8(cx, cy)
        assert keys.dtype == np.int64
        want = [naive_spread(int(a)) | (naive_spread(int(b)) << 1)
                for a, b in zip(cx, cy)]
        assert keys.tolist() == want

    def test_zcell_prefix_is_quadrant(self):
        # a shared 2k-bit key prefix <=> same cell of the 2^k x 2^k grid:
        # check via the top 2 bits = global quadrant
        from cloudtile_ray.geo.zorder import zorder_cells_mi

        lon = np.array([-180000, -1, 0, 179999], dtype=np.int64)
        lat = np.array([-90000, -1, 0, 89999], dtype=np.int64)
        k = zorder_cells_mi(lon, lat)
        assert ((k >= 0) & (k < 1 << 16)).all()
        # quadrant = (x_msb) | (y_msb << 1) = key's top two bits swapped in
        quad = ((k >> 14) & 3).tolist()
        assert quad == [0, 0, 3, 3]  # SW, SW, NE, NE

    def test_zcell_domain_edges(self):
        from cloudtile_ray.geo.zorder import zorder_cells_mi

        # corner cells: (0,0) -> key 0; (255,255) -> all-ones 16-bit key
        k = zorder_cells_mi(
            np.array([-180000, 179999], dtype=np.int64),
            np.array([-90000, 89999], dtype=np.int64),
        )
        assert k.tolist() == [0, (1 << 16) - 1]


class TestGeohash:
    def test_canonical_vector(self):
        # the textbook example: (42.605 N, -5.603 E) encodes to 'ezs42'
        from cloudtile_ray.geo.geohash import geohash_strings_mi

        got = geohash_strings_mi(
            np.array([-5603, 0, 179999, -180000], dtype=np.int64),
            np.array([42605, 0, 89999, -90000], dtype=np.int64),
        )
        assert got.tolist() == ["ezs42", "s0000", "zzzzz", "00000"]

    def test_prefix_is_containment(self):
        # points inside one precision-3 cell share the 3-char prefix
        from cloudtile_ray.geo.geohash import geohash_strings_mi

        rng = np.random.default_rng(3)
        lon0, lat0 = -87900, 41600
        lon = lon0 + rng.integers(0, 40, 64)  # well inside one ~156km cell
        lat = lat0 + rng.integers(0, 40, 64)
        g5 = geohash_strings_mi(lon, lat)
        assert len({s[:3] for s in g5}) == 1

    def test_matches_reference_bisection(self):
        # cross-check the quantize+interleave against the textbook
        # successive-bisection algorithm on random points
        from cloudtile_ray.geo.geohash import ALPHABET, geohash_strings_mi

        def ref_encode(lon, lat, precision=5):
            lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
            bits = []
            even = True
            while len(bits) < 5 * precision:
                if even:
                    mid = (lo_lon + hi_lon) / 2
                    if lon >= mid:
                        bits.append(1); lo_lon = mid
                    else:
                        bits.append(0); hi_lon = mid
                else:
                    mid = (lo_lat + hi_lat) / 2
                    if lat >= mid:
                        bits.append(1); lo_lat = mid
                    else:
                        bits.append(0); hi_lat = mid
                even = not even
            out = ""
            for i in range(precision):
                v = 0
                for b in bits[5 * i : 5 * i + 5]:
                    v = (v << 1) | b
                out += ALPHABET[v]
            return out

        rng = np.random.default_rng(17)
        lon_mi = rng.integers(-180000, 180000, 100)
        lat_mi = rng.integers(-90000, 90000, 100)
        got = geohash_strings_mi(lon_mi, lat_mi)
        for i in range(100):
            assert got[i] == ref_encode(lon_mi[i] / 1000.0, lat_mi[i] / 1000.0), i


def test_ring_centroid_terms():
    import pyarrow as pa

    from cloudtile_ray.stages.polygons import ring_centroid_terms_mi

    lon = pa.array([[8.0, 10.0, 12.0, 10.0], [0.0, 4.0, 4.0, 0.0], []],
                   pa.list_(pa.float64()))
    lat = pa.array([[5.0, 7.0, 5.0, 3.0], [0.0, 0.0, 2.0, 2.0], []],
                   pa.list_(pa.float64()))
    cxn, cyn, a2 = ring_centroid_terms_mi(lon, lat, scale=1)
    assert a2.tolist() == [-16, 16, 0]  # CW diamond, CCW square, empty
    assert (cxn[:2] / (3 * a2[:2])).tolist() == [10.0, 2.0]
    assert (cyn[:2] / (3 * a2[:2])).tolist() == [5.0, 1.0]


def test_ring1_neighbors_packed():
    import numpy as np

    from cloudtile_ray.geo import hexgrid as hx

    rng = np.random.default_rng(23)
    q = rng.integers(-1000, 1000, 50)
    r = rng.integers(-1000, 1000, 50)
    cells = hx._pack(4, q, r)
    nb = hx.ring1_neighbors_packed(cells)
    assert nb.shape == (50, 7)
    res2, q2, r2 = hx._unpack(nb.ravel().astype(np.uint64))
    assert (res2 == 4).all()
    dq = q2.reshape(50, 7) - q[:, None]
    dr = r2.reshape(50, 7) - r[:, None]
    want = [(0, 0), (1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]
    assert [tuple(p) for p in np.stack([dq[0], dr[0]], 1)] == want
    assert (np.abs(dq) <= 1).all() and (np.abs(dr) <= 1).all()
    assert (np.abs(dq + dr) <= 1).all()  # ring-1: |ds| <= 1 in cube coords
