"""Polygon features through the tile pipeline: footprint extraction, per-zoom
tile assignment by bbox overlap, Sutherland-Hodgman clipping to the tile
(+buffer), the per-zoom simplification ladder, and per-tile polygon
encoding.

This implements the polygon side of the tippecanoe option surface cloudtile
drives (/root/reference/src/cloudtile/tippecanoe.yaml): ``simplification``
(yaml:70, default 10 — tolerance in pixels applied below the maximum zoom),
``simplify-only-low-zooms`` / ``no-line-simplification`` (yaml:72-73),
``buffer`` / ``no-clipping`` (yaml:81-84, buffer default 5 px),
``drop-polygons`` (yaml:55), ``tiny-polygon-size`` (yaml:76),
``visvalingam`` (yaml:77), ``preserve-input-order`` analog (features
ordered by doc_id inside each tile), ``maximum-tile-features`` (yaml:107).

Tile membership is decided by BBOX OVERLAP (pre-clip), so the assignment is
exactly reproducible by the integer-arithmetic SQL oracle; clipping then
shapes the geometry (possibly to empty at bbox corners — the feature row
survives with n_pts=0, mirroring tippecanoe's no-clipping accounting).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cloudtile_ray.config import TilingSettings
from cloudtile_ray.geo import webmercator as wm
from cloudtile_ray.geo.simplify import simplify_ring

POLY_MAGIC = b"RPL1"


def extract_footprints(batch: pa.Table) -> pa.Table:
    """Rows with a footprint -> (doc_id, fp_lon: list<f64>, fp_lat: list<f64>).
    Only the footprint minority survives; the parse is the shared Arrow
    split-kernel parser (no per-row Python — VERDICT.md r2 minor #6)."""
    import pyarrow.compute as pc

    from cloudtile_ray.stages.lines import parse_coord_lists

    fp = batch.column("footprint_mi")
    if isinstance(fp, pa.ChunkedArray):
        fp = fp.combine_chunks()
    has = pc.and_(pc.is_valid(fp), pc.not_equal(pc.fill_null(fp, ""), ""))
    keep = np.nonzero(has.to_numpy(zero_copy_only=False))[0]
    sub = batch.take(pa.array(keep, type=pa.int64()))
    lon_col, lat_col = parse_coord_lists(sub.column("footprint_mi"))
    return pa.table(
        {"doc_id": sub.column("doc_id"), "fp_lon": lon_col, "fp_lat": lat_col}
    )


def _clip_axis(pts: np.ndarray, axis: int, bound: float, keep_leq: bool) -> np.ndarray:
    """One Sutherland-Hodgman half-plane clip (axis-aligned)."""
    if pts.shape[0] == 0:
        return pts
    out = []
    n = pts.shape[0]
    for i in range(n):
        cur = pts[i]
        prev = pts[i - 1]
        cur_in = cur[axis] <= bound if keep_leq else cur[axis] >= bound
        prev_in = prev[axis] <= bound if keep_leq else prev[axis] >= bound
        if cur_in:
            if not prev_in:
                t = (bound - prev[axis]) / (cur[axis] - prev[axis])
                out.append(prev + t * (cur - prev))
            out.append(cur)
        elif prev_in:
            t = (bound - prev[axis]) / (cur[axis] - prev[axis])
            out.append(prev + t * (cur - prev))
    return np.asarray(out, dtype=np.float64).reshape(-1, 2)


def clip_ring_to_box(ring: np.ndarray, w: float, s: float, e: float, n: float) -> np.ndarray:
    """Clip a ring to an axis-aligned box (Sutherland-Hodgman, 4 passes)."""
    out = _clip_axis(ring, 0, e, True)
    out = _clip_axis(out, 0, w, False)
    out = _clip_axis(out, 1, n, True)
    out = _clip_axis(out, 1, s, False)
    return out


def ring_area(pts: np.ndarray) -> float:
    if pts.shape[0] < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _pd2(P: np.ndarray, A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Squared perpendicular distance of points P to segments A->B (all
    (m,2)); degenerate segments fall back to point distance. Vectorized."""
    d = B - A
    L2 = d[:, 0] ** 2 + d[:, 1] ** 2
    cross = (P[:, 0] - A[:, 0]) * d[:, 1] - (P[:, 1] - A[:, 1]) * d[:, 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        pd2 = np.where(
            L2 == 0.0,
            (P[:, 0] - A[:, 0]) ** 2 + (P[:, 1] - A[:, 1]) ** 2,
            cross * cross / L2,
        )
    return pd2


def clip_rings_batched(
    P: np.ndarray, counts: np.ndarray, w: float, s: float, e: float, n: float
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized Sutherland-Hodgman: clip m padded rings ``P (m, V, 2)``
    with per-ring vertex ``counts`` against one axis-aligned box. Returns
    (padded output rings, output counts). Exactly the same interpolation
    arithmetic as the scalar ``_clip_axis`` (t = (bound-prev)/(cur-prev)),
    so results are bit-identical."""
    for axis, bound, keep_leq in ((0, e, True), (0, w, False), (1, n, True), (1, s, False)):
        m, V, _ = P.shape
        if m == 0 or V == 0:
            return P, counts
        j = np.arange(V)[None, :]
        valid = j < counts[:, None]
        prev_idx = (j - 1) % np.maximum(counts[:, None], 1)
        cur = P
        prev = np.take_along_axis(P, prev_idx[:, :, None].astype(np.int64), axis=1)
        cv = cur[:, :, axis]
        pv = prev[:, :, axis]
        cur_in = (cv <= bound) if keep_leq else (cv >= bound)
        prev_in = (pv <= bound) if keep_leq else (pv >= bound)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (bound - pv) / (cv - pv)
            inter = prev + t[:, :, None] * (cur - prev)
        # output slots: per input vertex, [intersection, cur] in that order
        out = np.empty((m, 2 * V, 2), dtype=np.float64)
        out[:, 0::2] = inter
        out[:, 1::2] = cur
        emit_inter = valid & (cur_in != prev_in)
        emit_cur = valid & cur_in
        emit = np.empty((m, 2 * V), dtype=bool)
        emit[:, 0::2] = emit_inter
        emit[:, 1::2] = emit_cur
        # compact: stable-sort pushes emitted slots to the front per row
        order = np.argsort(~emit, axis=1, kind="stable")
        out = np.take_along_axis(out, order[:, :, None], axis=1)
        counts = emit.sum(axis=1)
        maxc = int(counts.max()) if m else 0
        P = out[:, : max(maxc, 1)]
    return P, counts


def dp4_mask(P: np.ndarray, tol: float) -> np.ndarray:
    """Exact vectorized Douglas-Peucker keep-mask for (m, 4, 2) open
    polylines — bit-for-bit identical to ``douglas_peucker_mask`` on each
    row (same argmax-first tie-breaking, same strict > tol test), without
    the per-ring Python recursion."""
    m = P.shape[0]
    tol2 = tol * tol
    keep = np.zeros((m, 4), dtype=bool)
    keep[:, 0] = keep[:, 3] = True
    d1 = _pd2(P[:, 1], P[:, 0], P[:, 3])
    d2 = _pd2(P[:, 2], P[:, 0], P[:, 3])
    split1 = (d1 >= d2) & (d1 > tol2)  # argmax picks the first max
    split2 = (~(d1 >= d2)) & (d2 > tol2)
    keep[:, 1] |= split1
    keep[:, 2] |= split2
    # recurse: after splitting at p1, p2 is judged vs chord p1->p3; after
    # splitting at p2, p1 is judged vs chord p0->p2
    sub2 = _pd2(P[:, 2], P[:, 1], P[:, 3])
    sub1 = _pd2(P[:, 1], P[:, 0], P[:, 2])
    keep[:, 2] |= split1 & (sub2 > tol2)
    keep[:, 1] |= split2 & (sub1 > tol2)
    # ring-validity fallback (simplify_ring parity): < 3 kept -> re-add the
    # first unkept vertex, which for quads is always p1
    only_ends = ~(keep[:, 1] | keep[:, 2])
    keep[:, 1] |= only_ends
    return keep


class AssignPolygonTiles:
    """Per-zoom polygon tile assignment + clip + simplify, vectorized where
    the math allows (tile-range arithmetic is numpy over the whole batch;
    clipping loops only over the emitted (feature, tile) pairs, which are
    few — footprints are small relative to tiles)."""

    def __init__(self, min_zoom: int, max_zoom: int, settings: dict | None = None,
                 extent: int = wm.DEFAULT_EXTENT):
        if min_zoom > max_zoom:
            raise ValueError(f"min_zoom {min_zoom} > max_zoom {max_zoom}")
        self.zooms = list(range(min_zoom, max_zoom + 1))
        self.max_zoom = max_zoom
        self.extent = extent
        self.s = TilingSettings(**(settings or {}))
        # grid-low-zooms (tippecanoe.yaml:79): below max zoom, snap ring
        # vertices to a stairstep grid of extent/256 cells.  Routed through
        # the scalar path (the vectorized fast paths skip the snap).
        self._grid_low = bool(self.s.get("grid-low-zooms", False))
        if self._grid_low:
            self._disable_fast = True

    def _tolerance_px(self, z: int) -> float:
        s = self.s
        if s.get("no-line-simplification", False):
            return 0.0
        if s.get("detect-shared-borders", False):
            # deferred: with shared-border detection the simplification must
            # see ALL of a tile's features together, so it runs in the
            # per-tile merge (encode_poly_tiles), not per feature here
            return 0.0
        simp = float(s.get("simplification", 10))
        if z >= self.max_zoom:
            if s.get("simplify-only-low-zooms", False):
                return 0.0
            simp = float(s.get("simplification-at-maximum-zoom", simp))
        return simp

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.s.get("drop-polygons", False) or batch.num_rows == 0:
            return self._empty()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)

        def list_col(name: str) -> pa.ListArray:
            col = batch.column(name)
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        fl, ft = list_col("fp_lon"), list_col("fp_lat")
        lon_off = fl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lon_val = fl.values.to_numpy(zero_copy_only=False)
        lat_val = ft.values.to_numpy(zero_copy_only=False)
        n = len(ids)
        # per-feature bbox (vectorized via reduceat)
        starts = lon_off[:-1]
        wmin = np.minimum.reduceat(lon_val, starts)
        wmax = np.maximum.reduceat(lon_val, starts)
        smin = np.minimum.reduceat(lat_val, starts)
        smax = np.maximum.reduceat(lat_val, starts)
        buffer_px = float(self.s.get("buffer", 5))
        no_clip = bool(self.s.get("no-clipping", False))
        tiny = float(self.s.get("tiny-polygon-size", 1.0))
        visval = bool(self.s.get("visvalingam", False))
        nverts = np.diff(lon_off)
        out = {k: [] for k in ("tile_key", "z", "x", "y", "doc_id", "ring_blob", "n_pts", "area_px")}
        fast_tables: list[pa.Table] = []

        def emit(tk, z, tx, ty, did, blob, npts, area):
            out["tile_key"].append(tk)
            out["z"].append(z)
            out["x"].append(tx)
            out["y"].append(ty)
            out["doc_id"].append(did)
            out["ring_blob"].append(blob)
            out["n_pts"].append(npts)
            out["area_px"].append(area)

        no_dup = bool(self.s.get("no-duplication", False))
        for z in self.zooms:
            # bbox corners -> tile span (same float expressions as the oracle)
            x0, _ = wm.lonlat_to_tile(wmin, smin, z)
            x1, _ = wm.lonlat_to_tile(wmax, smin, z)
            _, y1 = wm.lonlat_to_tile(wmin, smin, z)  # south -> larger y
            _, y0 = wm.lonlat_to_tile(wmin, smax, z)  # north -> smaller y
            if no_dup:
                # tippecanoe.yaml:83: emit each feature only in the tile of
                # its bbox center (no cross-tile duplication; geometry may
                # clip at the edge)
                cx, cy = wm.lonlat_to_tile((wmin + wmax) / 2.0, (smin + smax) / 2.0, z)
                x0 = x1 = cx
                y0 = y1 = cy
            tol = self._tolerance_px(z)
            # continuous pixel projection for ALL vertices at this zoom, once
            nfac = np.float64(1 << z)
            fx = (lon_val + 180.0) / 360.0 * nfac
            lat_rad = np.radians(np.clip(lat_val, wm.MIN_LAT, wm.MAX_LAT))
            fy = (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * nfac

            # ---- vectorized fast path: 4-vertex rings whose bbox fits one
            # tile (no clip possible: both corners share the tile, so every
            # pixel lies in [0, extent)) — the dominant case by far
            # under no-duplication a single-tile span does NOT imply the
            # ring fits the tile -> those must go through the clip paths
            fast = (
                (nverts == 4) & (x0 == x1) & (y0 == y1) & (not no_dup)
                & (not visval) & (not getattr(self, "_disable_fast", False))
            )
            fi = np.nonzero(fast)[0]
            if fi.size:
                vidx = starts[fi][:, None] + np.arange(4)[None, :]
                P = np.empty((fi.size, 4, 2), dtype=np.float64)
                P[:, :, 0] = (fx[vidx] - x0[fi][:, None]) * self.extent
                P[:, :, 1] = (fy[vidx] - y0[fi][:, None]) * self.extent
                keep = dp4_mask(P, tol) if tol > 0 else np.ones((fi.size, 4), bool)
                Pr = np.round(P)
                # two shoelaces, matching the general path exactly: the
                # tiny-polygon CHECK uses the unrounded simplified ring, the
                # EMITTED area is of the final rounded ring. Unkept slots
                # padded by repeating the last kept vertex (zero-area edges).
                order = np.argsort(~keep, axis=1, kind="stable")
                kcount = keep.sum(axis=1)

                def _shoelace(src: np.ndarray) -> np.ndarray:
                    g = np.take_along_axis(src, order[:, :, None], axis=1).copy()
                    g[kcount == 3, 3] = g[kcount == 3, 2]
                    xs_ = g[:, :, 0]
                    ys_ = g[:, :, 1]
                    return 0.5 * np.abs(
                        (xs_ * np.roll(ys_, -1, axis=1) - ys_ * np.roll(xs_, -1, axis=1)).sum(axis=1)
                    )

                area_check = _shoelace(P)
                area_out = _shoelace(Pr)
                drop_tiny = (
                    np.zeros(fi.size, bool)
                    if self.s.get("no-tiny-polygon-reduction", False)
                    else area_check < tiny
                )
                n_pts_row = np.where(drop_tiny, 0, kcount).astype(np.int64)
                area_row = np.where(drop_tiny, 0.0, area_out)
                # binary ring column built directly from buffers — no
                # per-row Python
                keep_f = keep & ~drop_tiny[:, None]
                flat = Pr[keep_f].astype(np.int32)  # (K, 2) kept vertices
                byte_counts = (n_pts_row * 8).astype(np.int32)
                offsets = np.zeros(fi.size + 1, dtype=np.int32)
                np.cumsum(byte_counts, out=offsets[1:])
                blob_col = pa.Array.from_buffers(
                    pa.binary(), fi.size,
                    [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat.tobytes())],
                )
                tks = wm.tile_key(
                    np.full(fi.size, z, dtype=np.uint64),
                    x0[fi].astype(np.uint64),
                    y0[fi].astype(np.uint64),
                )
                fast_tables.append(
                    pa.table(
                        {
                            "tile_key": pa.array(tks),
                            "z": pa.array(np.full(fi.size, z, dtype=np.int64)),
                            "x": pa.array(x0[fi].astype(np.int64)),
                            "y": pa.array(y0[fi].astype(np.int64)),
                            "doc_id": pa.array(ids[fi].astype(np.int64)),
                            "ring_blob": blob_col,
                            "n_pts": pa.array(n_pts_row),
                            "area_px": pa.array(area_row),
                        }
                    )
                )
            # ---- batched path: 4-vertex rings spanning MULTIPLE tiles —
            # expand to (feature, tile) pairs and clip all of them at once
            # (vectorized Sutherland-Hodgman; tile-local coords share one
            # clip box). Simplification: n==3 rings are always fully kept
            # (DP endpoint+fallback semantics), n==4 via dp4_mask; rarer
            # n>=5 rings drop to the scalar path below.
            multi = (
                (nverts == 4) & (no_dup | ~((x0 == x1) & (y0 == y1)))
                & (not visval) & (not getattr(self, "_disable_fast", False))
                & (not no_clip)
            )
            mi = np.nonzero(multi)[0]
            if mi.size:
                nxs = (x1[mi] - x0[mi] + 1).astype(np.int64)
                nys = (y1[mi] - y0[mi] + 1).astype(np.int64)
                per = nxs * nys
                rep = np.repeat(np.arange(mi.size), per)
                jloc = np.arange(int(per.sum())) - np.repeat(np.cumsum(per) - per, per)
                dy_p = jloc % np.repeat(nys, per)
                dx_p = jloc // np.repeat(nys, per)
                tx_p = x0[mi][rep] + dx_p
                ty_p = y0[mi][rep] + dy_p
                vidx = starts[mi][rep][:, None] + np.arange(4)[None, :]
                Pm = np.empty((len(rep), 4, 2), dtype=np.float64)
                Pm[:, :, 0] = (fx[vidx] - tx_p[:, None]) * self.extent
                Pm[:, :, 1] = (fy[vidx] - ty_p[:, None]) * self.extent
                rings_c, cnts = clip_rings_batched(
                    Pm, np.full(len(rep), 4, dtype=np.int64),
                    -buffer_px, -buffer_px,
                    self.extent + buffer_px, self.extent + buffer_px,
                )
                V = rings_c.shape[1]
                keep_v = np.arange(V)[None, :] < cnts[:, None]
                # simplify: exactly-4 rings vectorized; >=5 scalar; <=3 kept
                if tol > 0:
                    is4 = cnts == 4
                    if is4.any():
                        k4 = dp4_mask(rings_c[is4, :4], tol)
                        kv = keep_v[is4]
                        kv[:, :4] &= k4
                        keep_v[is4] = kv
                    big = np.nonzero(cnts >= 5)[0]
                    if big.size:
                        from cloudtile_ray.geo.simplify import dp_mask_padded

                        kb = dp_mask_padded(rings_c[big], cnts[big], tol)
                        # ring-validity floor (simplify_ring parity): DP
                        # always keeps both endpoints, so a collapsed mask
                        # has exactly 2 kept — restore the first unkept
                        ks = kb.sum(axis=1)
                        fix = np.nonzero(ks < 3)[0]
                        if fix.size:
                            kb[fix, np.argmax(~kb[fix], axis=1)] = True
                        keep_v[big] = kb & (
                            np.arange(V)[None, :] < cnts[big][:, None]
                        )
                kc = keep_v.sum(axis=1)
                # padded shoelaces: tiny CHECK on unrounded, EMITTED area on
                # rounded (general-path parity)
                order_m = np.argsort(~keep_v, axis=1, kind="stable")
                slot = np.arange(V)[None, :]
                lastk = np.maximum(kc - 1, 0)
                padmask = slot >= kc[:, None]

                def _shoelace_m(src: np.ndarray) -> np.ndarray:
                    g = np.take_along_axis(src, order_m[:, :, None], axis=1)
                    g = np.where(padmask[:, :, None], np.take_along_axis(
                        g, np.minimum(slot, lastk[:, None])[:, :, None], axis=1
                    ), g)
                    xs_m = g[:, :, 0]
                    ys_m = g[:, :, 1]
                    return 0.5 * np.abs(
                        (xs_m * np.roll(ys_m, -1, axis=1) - ys_m * np.roll(xs_m, -1, axis=1)).sum(axis=1)
                    )

                area_chk = _shoelace_m(rings_c)
                area_m = _shoelace_m(np.round(rings_c))
                empty = kc < 3
                if not self.s.get("no-tiny-polygon-reduction", False):
                    empty |= (~empty) & (area_chk < tiny)
                n_pts_m = np.where(empty, 0, kc).astype(np.int64)
                area_m = np.where(empty, 0.0, area_m)
                keep_final = keep_v & ~empty[:, None]
                flat_m = np.round(rings_c[keep_final]).astype(np.int32)
                byte_counts = (n_pts_m * 8).astype(np.int32)
                offsets_m = np.zeros(len(rep) + 1, dtype=np.int32)
                np.cumsum(byte_counts, out=offsets_m[1:])
                blob_col_m = pa.Array.from_buffers(
                    pa.binary(), len(rep),
                    [None, pa.py_buffer(offsets_m.tobytes()), pa.py_buffer(flat_m.tobytes())],
                )
                tks_m = wm.tile_key(
                    np.full(len(rep), z, dtype=np.uint64),
                    tx_p.astype(np.uint64), ty_p.astype(np.uint64),
                )
                fast_tables.append(
                    pa.table(
                        {
                            "tile_key": pa.array(tks_m),
                            "z": pa.array(np.full(len(rep), z, dtype=np.int64)),
                            "x": pa.array(tx_p.astype(np.int64)),
                            "y": pa.array(ty_p.astype(np.int64)),
                            "doc_id": pa.array(ids[mi][rep].astype(np.int64)),
                            "ring_blob": blob_col_m,
                            "n_pts": pa.array(n_pts_m),
                            "area_px": pa.array(area_m),
                        }
                    )
                )
            handled = fast | multi
            # ---- general path: many-vertex / visvalingam / no-clip cases
            # (projection trig already hoisted into fx/fy above)
            grid = (
                max(1, self.extent >> 8)
                if self._grid_low and z < self.max_zoom
                else 0
            )
            for i in np.nonzero(~handled)[0]:
                fx_s = fx[starts[i] : lon_off[i + 1]]
                fy_s = fy[starts[i] : lon_off[i + 1]]
                for tx in range(int(x0[i]), int(x1[i]) + 1):
                    for ty in range(int(y0[i]), int(y1[i]) + 1):
                        ring_px = self._tile_ring(fx_s, fy_s, tx, ty, buffer_px, no_clip, tol, tiny, visval, grid)
                        emit(
                            int(wm.tile_key(np.uint64(z), np.uint64(tx), np.uint64(ty))),
                            z, tx, ty, int(ids[i]),
                            ring_px.astype(np.int32).tobytes(), ring_px.shape[0],
                            float(ring_area(ring_px)),
                        )
        slow_table = pa.table(
            {
                "tile_key": pa.array(np.array(out["tile_key"], dtype=np.uint64)),
                "z": pa.array(out["z"], pa.int64()),
                "x": pa.array(out["x"], pa.int64()),
                "y": pa.array(out["y"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "ring_blob": pa.array(out["ring_blob"], pa.binary()),
                "n_pts": pa.array(out["n_pts"], pa.int64()),
                "area_px": pa.array(out["area_px"], pa.float64()),
            }
        )
        if not fast_tables:
            return slow_table
        return pa.concat_tables([slow_table, *fast_tables])

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                "tile_key": pa.array([], pa.uint64()),
                "z": pa.array([], pa.int64()),
                "x": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "ring_blob": pa.array([], pa.binary()),
                "n_pts": pa.array([], pa.int64()),
                "area_px": pa.array([], pa.float64()),
            }
        )

    def _tile_ring(self, fx_s, fy_s, tx, ty, buffer_px, no_clip, tol, tiny, visval, grid=0):
        """Project an (already zoom-projected) ring into one tile's pixel
        frame, clip to the buffered tile box, simplify, drop tiny
        polygons. Same float expressions as the fast path.  ``grid`` > 0
        (grid-low-zooms) snaps output vertices to that stairstep grid,
        dropping consecutive duplicates."""
        px = (fx_s - tx) * self.extent
        py = (fy_s - ty) * self.extent
        ring_px = np.c_[px, py]
        if not no_clip:
            ring_px = clip_ring_to_box(
                ring_px, -buffer_px, -buffer_px, self.extent + buffer_px, self.extent + buffer_px
            )
        if ring_px.shape[0] >= 3 and tol > 0:
            ring_px = simplify_ring(ring_px, tolerance=tol, visvalingam=visval)
        if ring_px.shape[0] >= 3 and not self.s.get("no-tiny-polygon-reduction", False):
            if ring_area(ring_px) < tiny:
                return np.empty((0, 2))
        if ring_px.shape[0] < 3:
            return np.empty((0, 2))
        out = np.round(ring_px)
        if grid:
            out = np.round(out / grid) * grid
            keep = np.ones(len(out), dtype=bool)
            keep[1:] = (out[1:] != out[:-1]).any(axis=1)
            out = out[keep]
            if len(out) < 3:
                return np.empty((0, 2))
        return out


def shared_border_simplify(rings: list[np.ndarray], tol: float) -> list[np.ndarray]:
    """``detect-shared-borders`` (tippecanoe.yaml:78): simplify all rings of
    one tile so that borders shared between features keep coincident
    vertices on both sides — no slivers after simplification.

    Method: hash every undirected edge (integer pixel endpoints) across the
    tile's features; split each ring into maximal chains of consecutive
    edges with the same shared/unshared status; shared chains are
    canonicalized (direction-normalized vertex sequence) and
    Douglas-Peucker-simplified ONCE, with the kept-vertex mask applied to
    every feature using the chain (reversed when traversed the other way);
    unshared chains simplify independently.  Deterministic: a pure function
    of the tile's ring multiset."""
    from cloudtile_ray.geo.simplify import douglas_peucker_mask

    if tol <= 0 or not rings:
        return rings
    from collections import defaultdict

    edge_users: dict[tuple, int] = defaultdict(int)
    ring_edges: list[list[tuple]] = []
    for ring in rings:
        n = len(ring)
        edges = []
        for i in range(n):
            a = (int(ring[i][0]), int(ring[i][1]))
            b = (int(ring[(i + 1) % n][0]), int(ring[(i + 1) % n][1]))
            edges.append((a, b) if a <= b else (b, a))
        ring_edges.append(edges)
        for k in set(edges):
            edge_users[k] += 1

    chain_cache: dict[tuple, np.ndarray] = {}

    def simplify_chain(verts: np.ndarray, is_shared: bool) -> np.ndarray:
        """DP keep-mask for one open chain; shared chains resolve through
        the direction-normalized cache so every user gets the same kept
        subset."""
        if len(verts) <= 2:
            return np.ones(len(verts), dtype=bool)
        if not is_shared:
            return douglas_peucker_mask(verts.astype(np.float64), tol)
        fwd = tuple(map(tuple, verts.tolist()))
        rev = fwd[::-1]
        if rev < fwd:
            key, flipped = rev, True
        else:
            key, flipped = fwd, False
        mask = chain_cache.get(key)
        if mask is None:
            canon = np.asarray(key, dtype=np.float64)
            mask = douglas_peucker_mask(canon, tol)
            chain_cache[key] = mask
        return mask[::-1] if flipped else mask

    out: list[np.ndarray] = []
    for ring, edges in zip(rings, ring_edges):
        n = len(ring)
        if n < 3:
            out.append(ring)
            continue
        shared = np.array([edge_users[k] >= 2 for k in edges])
        # rotate so chains never wrap around index 0
        change = np.nonzero(shared != np.roll(shared, 1))[0]
        start = int(change[0]) if len(change) else 0
        kept_parts: list[np.ndarray] = []
        i = 0
        while i < n:
            flag = shared[(start + i) % n]
            j = i
            while j < n and shared[(start + j) % n] == flag:
                j += 1
            vidx = [(start + t) % n for t in range(i, j + 1)]  # j-i edges -> +1 verts
            verts = ring[np.array(vidx) % n]
            mask = simplify_chain(verts, bool(flag))
            kept = verts[mask]
            # drop the junction vertex (last) — the next chain re-adds it;
            # the final chain's last vertex is the ring start, also dropped
            kept_parts.append(kept[:-1])
            i = j
        new_ring = np.concatenate(kept_parts) if kept_parts else ring
        out.append(new_ring if len(new_ring) >= 3 else ring)
    return out


def shared_tolerance_px(settings: "TilingSettings | dict", z: int) -> float:
    """The per-zoom simplification tolerance for tile-time (deferred)
    simplification — same ladder as AssignPolygonTiles._tolerance_px, with
    max-zoom read from the settings (``maximum-zoom``; absent means every
    zoom is below max)."""
    s = settings if isinstance(settings, TilingSettings) else TilingSettings(**settings)
    if s.get("no-line-simplification", False):
        return 0.0
    simp = float(s.get("simplification", 10))
    mz = s.get("maximum-zoom")
    if mz is not None and not isinstance(mz, str) and z >= int(mz):
        if s.get("simplify-only-low-zooms", False):
            return 0.0
        simp = float(s.get("simplification-at-maximum-zoom", simp))
    return simp


def footprints_to_label_points(batch: pa.Table) -> pa.Table:
    """``convert-polygons-to-label-points`` (tippecanoe.yaml:104): replace
    each footprint with its vertex-centroid point -> rows usable by the
    point tile path (doc_id, lon, lat). Vectorized via reduceat means."""
    if batch.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "lon": pa.array([], pa.float64()),
             "lat": pa.array([], pa.float64())}
        )

    def list_col(name: str):
        col = batch.column(name)
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    fl, ft = list_col("fp_lon"), list_col("fp_lat")
    off = fl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lon_val = fl.values.to_numpy(zero_copy_only=False)
    lat_val = ft.values.to_numpy(zero_copy_only=False)
    counts = np.diff(off).astype(np.float64)
    lon_c = np.add.reduceat(lon_val, off[:-1]) / counts
    lat_c = np.add.reduceat(lat_val, off[:-1]) / counts
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lon": pa.array(lon_c),
            "lat": pa.array(lat_c),
        }
    )


def encode_poly_tiles(
    assigned: "ray.data.Dataset",
    settings: dict | None = None,
    n_partitions: int | None = None,
    sort_output: bool = False,
) -> "ray.data.Dataset":
    """Per-tile polygon encoding with the same hashed-partition merge shape
    as the point path: one row per tile (z, x, y, n_poly_features,
    poly_nbytes, poly_bytes), features ordered by doc_id (the
    preserve-input-order analog) and capped by maximum-tile-features."""
    s = TilingSettings(**(settings or {}))
    if n_partitions is None:
        try:
            import ray

            n_partitions = max(64, 2 * int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            n_partitions = 64
    add_part, merge_part = poly_exchange_fns(dict(s), n_partitions)
    parted = assigned.map_batches(add_part, batch_format="pyarrow")
    tiles = parted.groupby("part").map_groups(merge_part, batch_format="pyarrow")
    # global order is opt-in — see encode_tiles: no consumer needs it and
    # the blob-heavy sort pass costs a full extra all-to-all
    return tiles.sort(["z", "x", "y"]) if sort_output else tiles


def poly_exchange_fns(settings: dict, n_partitions: int):
    """(add_part, merge_part) pair for the polygon tile exchange —
    module-level so profiling and tests can drive the stages separately.

    ``order-by`` / ``order-descending-by`` (tippecanoe.yaml:89-90): when
    set to an attribute name, the assigned rows must carry an int64 column
    of that name (attach it with a ``map_batches`` join on doc_id before
    encoding); its values ride the packed exchange and drive the in-tile
    feature order (ties broken by doc_id — deterministic)."""
    s = TilingSettings(**(settings or {}))
    max_feat = int(s.get("maximum-tile-features", 20000))
    order_by = s.get("order-by") or s.get("order-descending-by")
    order_desc = bool(s.get("order-descending-by"))

    def _binary_parts(rb: pa.Array) -> tuple[bytes, np.ndarray]:
        rb = rb.combine_chunks() if isinstance(rb, pa.ChunkedArray) else rb
        data = rb.buffers()[2]
        data = bytes(data) if data is not None else b""
        off = np.frombuffer(rb.buffers()[1], dtype=np.int32)[
            rb.offset : rb.offset + len(rb) + 1
        ].astype(np.int64)
        return data, off

    def _gather_segments(
        data: np.ndarray, off: np.ndarray, order: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Reorder variable-length byte segments by ``order``.  Implemented
        as an Arrow binary-array ``take``: one C++ gather with a single
        output allocation, replacing a numpy per-byte index build
        (np.repeat + arange + fancy-index) that allocated 16 index bytes
        per payload byte — the merge path's dominant memory traffic, and
        pathological under host membw throttling (BASELINE.md mode #2).
        Returns (new_data: uint8, new_off: int64)."""
        m = len(order)
        n = len(off) - 1
        total = int(off[-1])
        if m == 0 or total == 0:
            lens = np.diff(off)[order]
            return (
                np.empty(0, np.uint8),
                np.concatenate([[0], np.cumsum(lens)]).astype(np.int64),
            )
        if total < (1 << 31):
            seg = pa.Array.from_buffers(
                pa.binary(),
                n,
                [None, pa.py_buffer(off.astype(np.int32)), pa.py_buffer(data)],
            )
        else:
            seg = pa.Array.from_buffers(
                pa.large_binary(),
                n,
                [None, pa.py_buffer(np.ascontiguousarray(off, dtype=np.int64)), pa.py_buffer(data)],
            )
        out = seg.take(pa.array(order, type=pa.int64()))
        ob = out.buffers()
        odt = np.int32 if out.type == pa.binary() else np.int64
        new_off = np.frombuffer(ob[1], dtype=odt)[
            out.offset : out.offset + m + 1
        ].astype(np.int64)
        base = int(new_off[0])
        new_off = new_off - base
        if ob[2] is None:
            return np.empty(0, np.uint8), new_off
        dat = np.frombuffer(ob[2], dtype=np.uint8)[base : base + int(new_off[-1])]
        return dat, new_off

    _EMPTY_PACK = pa.table(
        {
            "part": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            "payload": pa.array([], pa.binary()),
        }
    )

    def add_part(batch: pa.Table) -> pa.Table:
        # The exchange is ROW-BOUND in Ray's sort shuffle, so rows are
        # packed per (batch x partition) into ONE binary row each:
        # 11M (tile_key, doc_id, ring_blob) feature rows become
        # n_batches x n_partitions packed rows (~10^4), which removes the
        # per-row shuffle overhead that dominated the polygon path.
        # Payload layout: n | has_ord | tile_key u64[n] | doc_id i64[n] |
        # [ordval i64[n] |] ring_len i32[n] | ring bytes.
        if batch.num_rows == 0 or "tile_key" not in batch.column_names:
            return _EMPTY_PACK
        tk = batch.column("tile_key").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ordv = None
        if order_by:
            if order_by not in batch.column_names:
                raise KeyError(
                    f"order-by attribute {order_by!r} missing from assigned "
                    "rows — attach it (map_batches join on doc_id) before "
                    "encode_poly_tiles"
                )
            ordv = batch.column(order_by).to_numpy(zero_copy_only=False).astype(np.int64)
        data_b, off = _binary_parts(batch.column("ring_blob"))
        data = np.frombuffer(data_b, dtype=np.uint8)
        part = ((tk * np.uint64(2654435761)) % np.uint64(n_partitions)).astype(np.int64)
        order = np.argsort(part, kind="stable")
        part_s = part[order]
        data_s, off_s = _gather_segments(data, off, order)
        tk_s, ids_s = tk[order], ids[order]
        ordv_s = ordv[order] if ordv is not None else None
        lens_s = np.diff(off_s).astype(np.int32)
        uq, first = np.unique(part_s, return_index=True)
        bounds = np.r_[first[1:], len(part_s)]
        parts_out, nrows_out, payloads = [], [], []
        for p, st, en in zip(uq.tolist(), first.tolist(), bounds.tolist()):
            nrows = en - st
            payload = (
                np.int64(nrows).tobytes()
                + np.int64(0 if ordv_s is None else 1).tobytes()
                + tk_s[st:en].tobytes()
                + ids_s[st:en].tobytes()
                + (ordv_s[st:en].tobytes() if ordv_s is not None else b"")
                + lens_s[st:en].tobytes()
                + data_s[off_s[st] : off_s[en]].tobytes()
            )
            parts_out.append(p)
            nrows_out.append(nrows)
            payloads.append(payload)
        return pa.table(
            {
                "part": pa.array(parts_out, pa.int64()),
                "n_rows": pa.array(nrows_out, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    def _unpack_group(g: pa.Table):
        tks, idss, ordvs, offs, datas = [], [], [], [], []
        any_ord = False
        base = 0
        for payload in g.column("payload").to_pylist():
            n = int(np.frombuffer(payload, dtype=np.int64, count=1)[0])
            has_ord = int(np.frombuffer(payload, dtype=np.int64, count=1, offset=8)[0])
            pos = 16
            tks.append(np.frombuffer(payload, dtype=np.uint64, count=n, offset=pos))
            pos += 8 * n
            idss.append(np.frombuffer(payload, dtype=np.int64, count=n, offset=pos))
            pos += 8 * n
            if has_ord:
                any_ord = True
                ordvs.append(np.frombuffer(payload, dtype=np.int64, count=n, offset=pos))
                pos += 8 * n
            else:
                ordvs.append(np.zeros(n, dtype=np.int64))
            lens = np.frombuffer(payload, dtype=np.int32, count=n, offset=pos)
            pos += 4 * n
            datas.append(np.frombuffer(payload, dtype=np.uint8, offset=pos))
            offs.append(base + np.concatenate([[0], np.cumsum(lens, dtype=np.int64)]))
            base = offs[-1][-1]
        tk = np.concatenate(tks) if tks else np.empty(0, np.uint64)
        ids = np.concatenate(idss) if idss else np.empty(0, np.int64)
        ordv = np.concatenate(ordvs) if (ordvs and any_ord) else None
        data = np.concatenate(datas) if datas else np.empty(0, np.uint8)
        if offs:
            off = np.concatenate([o[:-1] for o in offs] + [[base]]).astype(np.int64)
        else:
            off = np.zeros(1, dtype=np.int64)
        return tk, ids, data, off, ordv

    def merge_part(g: pa.Table) -> pa.Table:
        tk, ids, ring_data, ring_off0, ordv = _unpack_group(g)
        # in-tile feature ordering (tippecanoe.yaml:85-94): default is the
        # preserve-input-order analog (doc_id); area-ordered and
        # Hilbert-ordered variants selectable; ``reverse`` flips within tile
        if len(tk) == 0:
            return pa.table(
                {
                    "z": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64()),
                    "n_poly_features": pa.array([], pa.int64()),
                    "poly_nbytes": pa.array([], pa.int64()),
                    "poly_bytes": pa.array([], pa.binary()),
                }
            )
        attr_ordered = order_by and ordv is not None
        need_area = (
            s.get("order-largest-first", False) or s.get("order-smallest-first", False)
        ) and not attr_ordered
        need_hilbert = s.get("hilbert", False) and not attr_ordered
        if need_area or need_hilbert:
            voff = (ring_off0 // 8).astype(np.int64)  # per-row vertex offsets
            lens = np.diff(voff)
            V = (
                np.ascontiguousarray(ring_data)
                .view(np.int32)
                .astype(np.float64)
                .reshape(-1, 2)
            )
        if need_area:
            # vectorized per-ring shoelace of the stored (rounded) rings —
            # identical to the emitted area_px by construction
            area = np.zeros(len(tk), dtype=np.float64)
            if V.shape[0]:
                nxt = np.arange(1, V.shape[0] + 1)
                ends = voff[1:][lens > 0] - 1
                nxt[ends] = voff[:-1][lens > 0]
                contrib = V[:, 0] * V[nxt % V.shape[0], 1] - V[:, 1] * V[nxt % V.shape[0], 0]
                sums = np.add.reduceat(contrib, np.minimum(voff[:-1], V.shape[0] - 1))
                sums[lens == 0] = 0.0
                area = 0.5 * np.abs(sums)
            key2 = -area if s.get("order-largest-first", False) else area
            order = np.lexsort((ids, key2, tk))
        elif need_hilbert:
            from cloudtile_ray.geo.webmercator import hilbert_xy2d

            fx0 = np.zeros(len(tk), dtype=np.int64)
            fy0 = np.zeros(len(tk), dtype=np.int64)
            nz = lens > 0
            if nz.any():
                firsts = V[np.minimum(voff[:-1][nz], max(V.shape[0] - 1, 0))]
                fx0[nz] = firsts[:, 0].astype(np.int64)
                fy0[nz] = firsts[:, 1].astype(np.int64)
            h = hilbert_xy2d(13, np.clip(fx0, 0, 8191), np.clip(fy0, 0, 8191))
            order = np.lexsort((ids, h, tk))
        elif attr_ordered:
            # order-by / order-descending-by on the named attribute values
            # carried through the exchange (ties -> doc_id)
            order = np.lexsort((ids, -ordv if order_desc else ordv, tk))
        else:
            order = np.lexsort((ids, tk))
        if s.get("reverse", False):
            # reverse within each tile while keeping tiles contiguous
            tk_o = tk[order]
            parts_idx = []
            uq, fst = np.unique(tk_o, return_index=True)
            bnd = np.r_[fst[1:], len(tk_o)]
            for a, b in zip(fst, bnd):
                parts_idx.append(order[a:b][::-1])
            order = np.concatenate(parts_idx)
        tk = tk[order]
        dids = ids[order]
        ring_all, ring_off = _gather_segments(ring_data, ring_off0, order)
        # stays a uint8 view; per-tile slices convert to bytes below — no
        # extra whole-buffer copy between the gather and the blob builds
        uniq, first = np.unique(tk, return_index=True)
        bounds = np.r_[first[1:], len(tk)]
        zs_u, xs_u, ys_u = wm.unpack_tile_key(uniq)
        # columnar tile sections: header + doc_ids[] + n_pts[] + ring bytes
        # -> three array slices per TILE, no per-feature Python
        npts = (np.diff(ring_off) // 8).astype(np.int64)
        meta = np.empty((len(tk), 2), dtype=np.int64)
        meta[:, 0] = dids
        meta[:, 1] = npts
        detect_shared = bool(s.get("detect-shared-borders", False))
        out = {k: [] for k in ("z", "x", "y", "n_poly_features", "poly_nbytes", "poly_bytes")}
        for ti, (st, en) in enumerate(zip(first, bounds)):
            en_cap = min(en, st + max_feat)
            nfeat = int(en_cap - st)
            header = POLY_MAGIC + np.array(
                [int(zs_u[ti]), int(xs_u[ti]), int(ys_u[ti]), nfeat], dtype=np.int32
            ).tobytes()
            if detect_shared:
                # deferred tile-time simplification: all of the tile's
                # features together, shared chains simplified once
                tolz = shared_tolerance_px(s, int(zs_u[ti]))
                rings = [
                    np.frombuffer(
                        np.ascontiguousarray(
                            ring_all[ring_off[j] : ring_off[j + 1]]
                        ),
                        dtype=np.int32,
                    ).reshape(-1, 2)
                    for j in range(st, en_cap)
                ]
                new_rings = shared_border_simplify(rings, tolz)
                meta_t = np.empty((nfeat, 2), dtype=np.int64)
                meta_t[:, 0] = meta[st:en_cap, 0]
                meta_t[:, 1] = [len(r) for r in new_rings]
                blob = (
                    header
                    + meta_t.tobytes()
                    + b"".join(np.ascontiguousarray(r, dtype=np.int32).tobytes() for r in new_rings)
                )
            else:
                blob = (
                    header
                    + meta[st:en_cap].tobytes()
                    + ring_all[ring_off[st] : ring_off[en_cap]].tobytes()
                )
            out["z"].append(int(zs_u[ti]))
            out["x"].append(int(xs_u[ti]))
            out["y"].append(int(ys_u[ti]))
            out["n_poly_features"].append(nfeat)
            out["poly_nbytes"].append(len(blob))
            out["poly_bytes"].append(blob)
        return pa.table(
            {
                "z": pa.array(out["z"], pa.int64()),
                "x": pa.array(out["x"], pa.int64()),
                "y": pa.array(out["y"], pa.int64()),
                "n_poly_features": pa.array(out["n_poly_features"], pa.int64()),
                "poly_nbytes": pa.array(out["poly_nbytes"], pa.int64()),
                "poly_bytes": pa.array(out["poly_bytes"], pa.binary()),
            }
        )

    return add_part, merge_part


def decode_poly_tile(blob: bytes) -> dict:
    """Inverse of the columnar tile encoding: header, then (doc_id, n_pts)
    meta block, then concatenated int32 (x, y) ring vertices."""
    assert blob[:4] == POLY_MAGIC
    z, x, y, n = np.frombuffer(blob[4:20], dtype=np.int32)
    meta = np.frombuffer(blob[20 : 20 + 16 * n], dtype=np.int64).reshape(-1, 2)
    off = 20 + 16 * n
    feats = []
    for did, npts in meta:
        ring = np.frombuffer(blob[off : off + 8 * npts], dtype=np.int32).reshape(-1, 2)
        off += 8 * int(npts)
        feats.append({"doc_id": int(did), "ring": ring})
    return {"z": int(z), "x": int(x), "y": int(y), "features": feats}


def ring_double_areas_mi2(fp_lon, fp_lat, scale: int = 1000) -> np.ndarray:
    """Vectorized per-ring shoelace DOUBLE area (|Σ cross|, integer
    milli-degree²) over Arrow ``list<f64>`` DEGREE coordinate columns
    (each coordinate is snapped to the integer milli-degree lattice by
    ``rint(x*scale)`` first — the repo-wide exact-arithmetic convention,
    so the result is an integer, not a float accumulation): one
    cross-product pass over the FLATTENED arrays with the wrap-around
    index built from the list offsets (``reduceat`` per ring) — no
    per-row Python.  Rings may be open (first vertex not repeated); the
    wrap term closes them.  The DOUBLE area is returned because it is
    always an exact integer for integer rings (the area itself is a
    half-integer for odd cross sums); exact in int64 for |coord| < 2^31
    (products stay < 2^63)."""
    if isinstance(fp_lon, pa.ChunkedArray):
        fp_lon = fp_lon.combine_chunks()
    if isinstance(fp_lat, pa.ChunkedArray):
        fp_lat = fp_lat.combine_chunks()
    offs = fp_lon.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    x = np.rint(
        fp_lon.flatten().to_numpy(zero_copy_only=False) * scale
    ).astype(np.int64)
    y = np.rint(
        fp_lat.flatten().to_numpy(zero_copy_only=False) * scale
    ).astype(np.int64)
    n_rings = len(offs) - 1
    if len(x) == 0:
        return np.zeros(n_rings, dtype=np.int64)
    starts, ends = offs[:-1], offs[1:]
    nxt = np.arange(1, len(x) + 1, dtype=np.int64)
    nonempty = ends > starts
    nxt[ends[nonempty] - 1] = starts[nonempty]  # close each ring
    cross = x * y[nxt] - x[nxt] * y
    sums = np.zeros(n_rings, dtype=np.int64)
    idx = np.minimum(starts, len(x) - 1)
    ssum = np.add.reduceat(cross, idx)
    ssum[starts == ends] = 0  # reduceat repeats the next segment for empties
    sums[: len(ssum)] = ssum
    return np.abs(sums)


def ring_centroid_terms_mi(
    fp_lon, fp_lat, scale: int = 1000
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact integer centroid terms per ring (the companion of
    :func:`ring_double_areas_mi2`, same flattened-offsets machinery):
    returns ``(cx_num, cy_num, a2)`` int64 arrays where the centroid is
    ``(cx_num/(3·a2), cy_num/(3·a2))`` in milli-degrees and ``a2`` is the
    SIGNED shoelace double area — every term is integer arithmetic
    (``(x_i + x_{i+1})·cross_i`` ≲ 7·10¹⁵ for |coord| ≤ 4·10⁵, safely
    int64), so the only float op a caller performs is the final
    division, which a SQL oracle replays as one CAST-CAST-divide.
    Degenerate rings (a2 == 0) are the caller's to handle."""
    if isinstance(fp_lon, pa.ChunkedArray):
        fp_lon = fp_lon.combine_chunks()
    if isinstance(fp_lat, pa.ChunkedArray):
        fp_lat = fp_lat.combine_chunks()
    offs = fp_lon.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    x = np.rint(
        fp_lon.flatten().to_numpy(zero_copy_only=False) * scale
    ).astype(np.int64)
    y = np.rint(
        fp_lat.flatten().to_numpy(zero_copy_only=False) * scale
    ).astype(np.int64)
    n_rings = len(offs) - 1
    zeros = np.zeros(n_rings, dtype=np.int64)
    if len(x) == 0:
        return zeros.copy(), zeros.copy(), zeros.copy()
    starts, ends = offs[:-1], offs[1:]
    nxt = np.arange(1, len(x) + 1, dtype=np.int64)
    nonempty = ends > starts
    nxt[ends[nonempty] - 1] = starts[nonempty]  # close each ring
    cross = x * y[nxt] - x[nxt] * y
    cx_t = (x + x[nxt]) * cross
    cy_t = (y + y[nxt]) * cross
    idx = np.minimum(starts, len(x) - 1)
    out = []
    for terms in (cx_t, cy_t, cross):
        s = np.add.reduceat(terms, idx)
        s[starts == ends] = 0
        col = zeros.copy()
        col[: len(s)] = s
        out.append(col)
    return out[0], out[1], out[2]
