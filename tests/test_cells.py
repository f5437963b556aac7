"""S2 + hex-grid invariant tests (FIXTURES.md §4: parent/child containment,
neighbor rings, round-trip cell -> center -> cell)."""

import numpy as np
import pytest

from cloudtile_ray.geo import hexgrid, s2


RNG = np.random.default_rng(42)
LON = np.r_[RNG.uniform(-180, 180, 300), 0.0, -180.0, 179.99, 45.0]
LAT = np.r_[RNG.uniform(-85, 85, 300), 0.0, 0.0, -85.0, 85.0]


class TestS2:
    @pytest.mark.parametrize("level", [0, 1, 5, 12, 20, 30])
    def test_roundtrip_center(self, level):
        cid = s2.lonlat_to_cell(LON, LAT, level)
        assert (s2.cell_level(cid) == level).all()
        clon, clat = s2.cell_to_lonlat(cid)
        cid2 = s2.lonlat_to_cell(clon, clat, level)
        np.testing.assert_array_equal(cid, cid2)

    def test_parent_containment(self):
        cid = s2.lonlat_to_cell(LON, LAT, 20)
        for lvl in (0, 5, 12, 19):
            p = s2.parent(cid, lvl)
            assert (s2.cell_level(p) == lvl).all()
            assert s2.contains(p, cid).all()
            # parents computed from the same points directly must agree
            np.testing.assert_array_equal(p, s2.lonlat_to_cell(LON, LAT, lvl))

    def test_children_partition(self):
        cid = s2.lonlat_to_cell(np.array([10.0]), np.array([20.0]), 8)[0]
        kids = s2.children(cid)
        assert len(set(kids.tolist())) == 4
        assert s2.contains(np.full(4, cid, dtype=np.uint64), kids).all()
        assert (s2.cell_level(kids) == 9).all()
        # each child's parent is the original
        np.testing.assert_array_equal(s2.parent(kids, 8), np.full(4, cid, dtype=np.uint64))

    def test_level0_has_six_faces(self):
        cid = s2.lonlat_to_cell(LON, LAT, 0)
        faces = np.unique(cid >> np.uint64(61))
        assert len(faces) == 6  # all cube faces hit by a global sample

    def test_nearby_points_share_coarse_cell(self):
        base = s2.lonlat_to_cell(np.array([10.0]), np.array([20.0]), 10)
        near = s2.lonlat_to_cell(np.array([10.0001]), np.array([20.0001]), 10)
        far = s2.lonlat_to_cell(np.array([11.0]), np.array([20.0]), 10)
        assert base[0] == near[0]
        assert base[0] != far[0]

    def test_st_uv_inverse(self):
        s = np.linspace(0, 1, 101)
        np.testing.assert_allclose(s2.uv_to_st(s2.st_to_uv(s)), s, atol=1e-12)


class TestHexGrid:
    @pytest.mark.parametrize("res", [0, 1, 4, 9, 15])
    def test_roundtrip_center(self, res):
        c = hexgrid.latlng_to_cell(LON, LAT, res)
        assert (hexgrid.get_resolution(c) == res).all()
        lng, lat = hexgrid.cell_to_latlng(c)
        c2 = hexgrid.latlng_to_cell(lng, lat, res)
        np.testing.assert_array_equal(c, c2)

    def test_parent_of_children_is_cell(self):
        for res in (0, 3, 7):
            c = hexgrid.latlng_to_cell(np.array([12.3]), np.array([-45.6]), res)[0]
            kids = hexgrid.cell_to_children(int(c))
            assert len(set(kids.tolist())) == 7
            parents = hexgrid.cell_to_parent(kids, res)
            assert (parents == c).all()

    def test_parent_containment_chain(self):
        c = hexgrid.latlng_to_cell(LON, LAT, 9)
        for pres in (8, 5, 2, 0):
            p = hexgrid.cell_to_parent(c, pres)
            assert (hexgrid.get_resolution(p) == pres).all()
            assert hexgrid.cells_contain(p, c).all()

    def test_children_partition_no_orphans(self):
        # every res-5 cell in a sample belongs to exactly one res-4 parent's
        # 7-child set
        c5 = np.unique(hexgrid.latlng_to_cell(LON, LAT, 5))
        p4 = hexgrid.cell_to_parent(c5, 4)
        for cell, par in zip(c5.tolist(), p4.tolist()):
            kids = set(hexgrid.cell_to_children(int(par)).tolist())
            assert cell in kids

    def test_grid_disk_sizes_and_distance(self):
        c = hexgrid.latlng_to_cell(np.array([0.0]), np.array([0.0]), 6)[0]
        for k in (0, 1, 2, 3):
            disk = hexgrid.grid_disk(int(c), k)
            assert len(disk) == 1 + 3 * k * (k + 1)  # hexagonal number
            assert len(set(disk.tolist())) == len(disk)
            for d in disk.tolist():
                assert hexgrid.grid_distance(int(c), int(d)) <= k

    def test_boundary_contains_center(self):
        from cloudtile_ray.geo.pip import naive_pip

        c = hexgrid.latlng_to_cell(np.array([33.0]), np.array([44.0]), 4)[0]
        ring = hexgrid.cell_to_boundary(int(c))
        lng, lat = hexgrid.cell_to_latlng(np.asarray([c]))
        hits = naive_pip([[ring]], lng, lat)
        assert hits == [(0, 0)]

    def test_neighbors_tile_plane(self):
        # a point near a cell's boundary must land in the cell or a ring-1
        # neighbor (no gaps in the tiling)
        c = hexgrid.latlng_to_cell(np.array([10.0]), np.array([10.0]), 6)[0]
        disk1 = set(hexgrid.grid_disk(int(c), 1).tolist())
        lng, lat = hexgrid.cell_to_latlng(np.asarray([c]))
        rng = np.random.default_rng(0)
        spacing = hexgrid.BASE_SIZE_DEG / abs(hexgrid._C) ** 6
        jitter = rng.uniform(-0.45 * spacing, 0.45 * spacing, (50, 2))
        near = hexgrid.latlng_to_cell(lng[0] + jitter[:, 0], lat[0] + jitter[:, 1], 6)
        assert set(near.tolist()) <= disk1

    def test_res_validation(self):
        with pytest.raises(ValueError):
            hexgrid.latlng_to_cell(np.array([0.0]), np.array([0.0]), 16)
        with pytest.raises(ValueError):
            s2.lonlat_to_cell(np.array([0.0]), np.array([0.0]), 31)


class TestIcosa:
    """Spherical icosahedral aperture-7 index (geo/icosa.py): exact
    hierarchy invariants, determinism, and sphere-global encoding (poles,
    dateline, face edges) — the properties a planar lattice cannot give."""

    def _random_lonlat(self, n, seed=0):
        rng = np.random.default_rng(seed)
        lon = rng.uniform(-180, 180, n)
        lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))  # area-uniform
        return lon, lat

    @pytest.mark.parametrize("res,min_rate", [(2, 0.95), (5, 0.99), (9, 0.999)])
    def test_roundtrip_center(self, res, min_rate):
        from cloudtile_ray.geo import icosa

        lon, lat = self._random_lonlat(2000, seed=res)
        cells = icosa.latlng_to_cell(lon, lat, res)
        clon, clat = icosa.cell_to_latlng(cells)
        again = icosa.latlng_to_cell(clon, clat, res)
        # near-universal cell->center->cell stability; the residue is the
        # face-edge sliver where overlapping coarse cells trade ownership
        assert (again == cells).mean() >= min_rate
        # and EXACT for every fixpoint cell (center owned by its own face)
        fixpoint = icosa.get_face(again) == icosa.get_face(cells)
        assert (again[fixpoint] == cells[fixpoint]).all()

    def test_parent_of_children_is_cell(self):
        from cloudtile_ray.geo import icosa

        lon, lat = self._random_lonlat(100, seed=1)
        for res in (1, 4, 8):
            cells = icosa.latlng_to_cell(lon, lat, res)
            for c in cells[:20]:
                kids = icosa.cell_to_children(int(c))
                assert len(kids) == 7
                assert (icosa.cell_to_parent(kids) == c).all()
                assert icosa.cells_contain(
                    np.full(7, c, dtype=np.uint64), kids
                ).all()

    def test_parent_chain_and_face_stability(self):
        from cloudtile_ray.geo import icosa

        lon, lat = self._random_lonlat(300, seed=2)
        cells = icosa.latlng_to_cell(lon, lat, 10)
        f10 = icosa.get_face(cells)
        for target in (7, 3, 0):
            up = icosa.cell_to_parent(cells, target)
            assert (icosa.get_resolution(up) == target).all()
            assert (icosa.get_face(up) == f10).all()  # hierarchy never crosses faces

    def test_grid_disk_sizes(self):
        from cloudtile_ray.geo import icosa

        c = int(icosa.latlng_to_cell(np.array([10.0]), np.array([20.0]), 6)[0])
        for k in (0, 1, 2, 3):
            assert len(icosa.grid_disk(c, k)) == 1 + 3 * k * (k + 1)

    def test_poles_dateline_and_face_edges_encode(self):
        from cloudtile_ray.geo import icosa

        lon = np.array([0.0, 179.999, -179.999, 45.0, 0.0, 0.0])
        lat = np.array([89.999, 10.0, 10.0, -89.999, 0.0, 0.0001])
        cells = icosa.latlng_to_cell(lon, lat, 8)
        # dateline neighbors land in nearby cells on the sphere (NOT the
        # planar lattice's 360-degree-apart cells): compare decoded centers
        clon, clat = icosa.cell_to_latlng(cells[1:3])
        v = np.radians(clon)
        d = np.abs(np.degrees(np.arctan2(np.sin(v[0] - v[1]), np.cos(v[0] - v[1]))))
        assert d < 1.0  # sphere-adjacent, no seam
        # all encodings are valid and decode close to the input
        dlon, dlat = icosa.cell_to_latlng(cells)
        assert np.abs(dlat - lat).max() < 2.0

    def test_determinism_and_resolution_nesting_rate(self):
        from cloudtile_ray.geo import icosa

        lon, lat = self._random_lonlat(2000, seed=3)
        a = icosa.latlng_to_cell(lon, lat, 9)
        b = icosa.latlng_to_cell(lon, lat, 9)
        assert (a == b).all()
        # encode at 9 then parent to 5 == encode at 5 for the vast
        # majority of points (aperture-7 hierarchies are not perfectly
        # aligned — same property as real H3 — but mismatches are
        # boundary-only)
        up = icosa.cell_to_parent(a, 5)
        direct = icosa.latlng_to_cell(lon, lat, 5)
        agree = (up == direct).mean()
        assert agree > 0.85

    def test_res_validation(self):
        from cloudtile_ray.geo import icosa

        with pytest.raises(ValueError):
            icosa.latlng_to_cell(np.array([0.0]), np.array([0.0]), 16)

    def test_cells_in_cap_covers_all_points(self):
        """Coverage guarantee of the cross-face cap enumeration: every
        point within the cover radius maps (latlng_to_cell) to an
        enumerated cell — across face edges, at the poles, over the
        dateline (the kNN ring-search correctness premise)."""
        from cloudtile_ray.geo import icosa

        rng = np.random.default_rng(7)
        cases = [(179.9, 0.0), (-179.9, 30.0), (0.0, 89.5), (10.0, -89.5), (0.0, 0.0)]
        cases += [
            (float(rng.uniform(-180, 180)), float(rng.uniform(-89, 89)))
            for _ in range(10)
        ]
        for lng, lat in cases:
            res = int(rng.integers(1, 5))
            radius = float(rng.uniform(0.5, 6.0))
            cells = icosa.cells_in_cap(lng, lat, radius, res)
            v = icosa._lonlat_to_xyz(np.array([lng]), np.array([lat]))[0]
            a = np.array([1.0, 0, 0]) if abs(v[0]) < 0.9 else np.array([0, 1.0, 0])
            e1 = np.cross(v, a)
            e1 /= np.linalg.norm(e1)
            e2 = np.cross(v, e1)
            n = 150
            ang = np.radians(radius) * np.sqrt(rng.uniform(0, 1, n))
            az = rng.uniform(0, 2 * np.pi, n)
            pts = (
                np.cos(ang)[:, None] * v
                + np.sin(ang)[:, None] * (np.cos(az)[:, None] * e1 + np.sin(az)[:, None] * e2)
            )
            plng, plat = icosa._xyz_to_lonlat(pts)
            pc = icosa.latlng_to_cell(plng, plat, res)
            assert np.isin(pc, cells).all(), (lng, lat, res, radius)

    def test_grid_disk_cross_superset_of_same_face(self):
        from cloudtile_ray.geo import icosa

        c = int(icosa.latlng_to_cell(np.array([12.0]), np.array([45.0]), 3)[0])
        same_face = icosa.grid_disk(c, 2)
        cross = icosa.grid_disk_cross(c, 2)
        # the cross-face disk contains at least the near part of the
        # same-face disk (cells beyond the face edge are extra)
        inter = np.isin(same_face, cross)
        assert inter.mean() > 0.9
        assert len(cross) >= len(same_face)
