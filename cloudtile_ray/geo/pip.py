"""Point-in-polygon kernels: packed polygons, vectorized even-odd ray
casting, and a bulk-loaded STR packed R-tree with vectorized batch queries.

The reference has no join operator at all (SURVEY.md §2.3 — whole-file
transforms only); this module supplies the PiP join core required by the
engine's north rule: the STRtree here is the per-actor / broadcast state of
the join stages in ``cloudtile_ray.stages.join``.

Conventions:
- a polygon is a list of rings; each ring is an (n, 2) float array of
  (lon, lat) vertices, closing edge implicit (last->first);
- the even-odd rule over *all* rings of a polygon handles holes with no
  special casing;
- points exactly on an edge are implementation-defined (fixtures place
  edges on half-milli-degree offsets so no test point is ever on one).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np


class PackedPolygons:
    """Column-oriented polygon set: flat vertex arrays + ring offsets.

    Built once (driver or actor ``__init__``), shipped via ``ray.put`` for
    the broadcast join strategy — numpy arrays serialize zero-copy through
    the object store.
    """

    def __init__(self, polygons: Sequence[Sequence[np.ndarray]]):
        vx: list[np.ndarray] = []
        vy: list[np.ndarray] = []
        ring_start = [0]
        ring_poly: list[int] = []
        n = 0
        for pid, rings in enumerate(polygons):
            for ring in rings:
                r = np.asarray(ring, dtype=np.float64)
                if r.ndim != 2 or r.shape[1] != 2 or r.shape[0] < 3:
                    raise ValueError(f"polygon {pid}: ring must be (n>=3, 2)")
                # drop an explicit closing vertex; the closing edge is implicit
                if r.shape[0] > 3 and r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]:
                    r = r[:-1]
                vx.append(r[:, 0])
                vy.append(r[:, 1])
                n += r.shape[0]
                ring_start.append(n)
                ring_poly.append(pid)
        self.n_polygons = len(polygons)
        self.vx = np.concatenate(vx) if vx else np.empty(0)
        self.vy = np.concatenate(vy) if vy else np.empty(0)
        self.ring_start = np.asarray(ring_start, dtype=np.int64)
        self.ring_poly = np.asarray(ring_poly, dtype=np.int64)
        # per-polygon bbox
        self.bbox = np.empty((self.n_polygons, 4), dtype=np.float64)
        self.bbox[:, 0] = np.inf
        self.bbox[:, 1] = np.inf
        self.bbox[:, 2] = -np.inf
        self.bbox[:, 3] = -np.inf
        for ri in range(len(self.ring_poly)):
            pid = self.ring_poly[ri]
            s, e = self.ring_start[ri], self.ring_start[ri + 1]
            self.bbox[pid, 0] = min(self.bbox[pid, 0], self.vx[s:e].min())
            self.bbox[pid, 1] = min(self.bbox[pid, 1], self.vy[s:e].min())
            self.bbox[pid, 2] = max(self.bbox[pid, 2], self.vx[s:e].max())
            self.bbox[pid, 3] = max(self.bbox[pid, 3], self.vy[s:e].max())

    def contains(self, pid: int, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Vectorized even-odd test of many points against one polygon."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        inside = np.zeros(px.shape[0], dtype=bool)
        for ri in np.nonzero(self.ring_poly == pid)[0]:
            s, e = self.ring_start[ri], self.ring_start[ri + 1]
            x1 = self.vx[s:e]
            y1 = self.vy[s:e]
            x2 = np.roll(x1, -1)
            y2 = np.roll(y1, -1)
            # (E, N) edge-vs-point crossing matrix, XOR-reduced; rings are
            # small (4-24 vertices) so the E axis stays tiny.
            crosses = (y1[:, None] > py[None, :]) != (y2[:, None] > py[None, :])
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (x2 - x1)[:, None] * (py[None, :] - y1[:, None]) / (
                    (y2 - y1)[:, None]
                ) + x1[:, None]
            hits = crosses & (px[None, :] < xint)
            inside ^= (hits.sum(axis=0) % 2).astype(bool)
        return inside


class STRtree:
    """Packed Sort-Tile-Recursive R-tree over bounding boxes.

    Bulk-loaded once; ``query_points`` / ``query_boxes`` are vectorized over
    whole numpy batches (frontier expansion per level — no per-point Python
    recursion), which is what makes the broadcast PiP join a pure numpy
    kernel inside ``map_batches``.
    """

    FANOUT = 16

    def __init__(self, boxes: np.ndarray):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        n = boxes.shape[0]
        self.n_items = n
        if n == 0:
            self.levels: list[np.ndarray] = []
            self.perm = np.empty(0, dtype=np.int64)
            return
        # STR ordering: slice by x-center, sort each slice by y-center
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        n_leaves = int(np.ceil(n / self.FANOUT))
        n_slices = max(1, int(np.ceil(np.sqrt(n_leaves))))
        per_slice = int(np.ceil(n / n_slices))
        order_x = np.argsort(cx, kind="stable")
        perm = np.empty(n, dtype=np.int64)
        pos = 0
        for s in range(0, n, per_slice):
            sl = order_x[s : s + per_slice]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            perm[pos : pos + len(sl)] = sl
            pos += len(sl)
        self.perm = perm
        level = boxes[perm]
        self.levels = [level]
        while level.shape[0] > 1:
            m = level.shape[0]
            n_nodes = int(np.ceil(m / self.FANOUT))
            parent = np.empty((n_nodes, 4), dtype=np.float64)
            for i in range(n_nodes):
                chunk = level[i * self.FANOUT : (i + 1) * self.FANOUT]
                parent[i, 0] = chunk[:, 0].min()
                parent[i, 1] = chunk[:, 1].min()
                parent[i, 2] = chunk[:, 2].max()
                parent[i, 3] = chunk[:, 3].max()
            self.levels.append(parent)
            level = parent
        self.levels.reverse()  # levels[0] = root level

    def _descend(self, qi: np.ndarray, ni: np.ndarray, hit_fn) -> tuple[np.ndarray, np.ndarray]:
        """Run frontier expansion from the root; ``hit_fn(level_boxes, qi, ni)``
        returns the boolean overlap mask for (query qi, node ni) pairs."""
        for li, lv in enumerate(self.levels):
            keep = hit_fn(lv, qi, ni)
            qi, ni = qi[keep], ni[keep]
            if li == len(self.levels) - 1 or qi.size == 0:
                break
            n_child = self.levels[li + 1].shape[0]
            first = ni * self.FANOUT
            cnt = np.minimum(n_child - first, self.FANOUT)
            qi = np.repeat(qi, cnt)
            offs = np.concatenate([np.arange(c) for c in cnt]) if cnt.size else np.empty(0, dtype=np.int64)
            ni = np.repeat(first, cnt) + offs
        return qi, ni

    def query_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All (point_idx, item_idx) pairs whose item bbox contains the point."""
        if self.n_items == 0 or len(px) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)

        def hit(lv, qi, ni):
            b = lv[ni]
            return (px[qi] >= b[:, 0]) & (px[qi] <= b[:, 2]) & (py[qi] >= b[:, 1]) & (py[qi] <= b[:, 3])

        n_root = self.levels[0].shape[0]
        qi = np.repeat(np.arange(len(px), dtype=np.int64), n_root)
        ni = np.tile(np.arange(n_root, dtype=np.int64), len(px))
        qi, ni = self._descend(qi, ni, hit)
        return qi, self.perm[ni]

    def query_boxes(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All (query_idx, item_idx) pairs with bbox overlap."""
        qboxes = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        if self.n_items == 0 or qboxes.shape[0] == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)

        def hit(lv, qi, ni):
            b = lv[ni]
            q = qboxes[qi]
            return (q[:, 0] <= b[:, 2]) & (q[:, 2] >= b[:, 0]) & (q[:, 1] <= b[:, 3]) & (q[:, 3] >= b[:, 1])

        n_root = self.levels[0].shape[0]
        qi = np.repeat(np.arange(qboxes.shape[0], dtype=np.int64), n_root)
        ni = np.tile(np.arange(n_root, dtype=np.int64), qboxes.shape[0])
        qi, ni = self._descend(qi, ni, hit)
        return qi, self.perm[ni]


class PipIndex:
    """Broadcastable PiP join state: packed polygons + STRtree over their
    bboxes. ``query`` returns exact (point_idx, polygon_id) match pairs."""

    def __init__(self, polygons: Sequence[Sequence[np.ndarray]]):
        self.packed = PackedPolygons(polygons)
        self.tree = STRtree(self.packed.bbox)

    def query(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        cand_pt, cand_poly = self.tree.query_points(px, py)
        if cand_pt.size == 0:
            return cand_pt, cand_poly
        out_pt: list[np.ndarray] = []
        out_poly: list[np.ndarray] = []
        # group candidate pairs by polygon: one vectorized even-odd test per
        # candidate polygon (few, thanks to the bbox prefilter)
        order = np.argsort(cand_poly, kind="stable")
        cand_pt, cand_poly = cand_pt[order], cand_poly[order]
        bounds = np.nonzero(np.diff(cand_poly))[0] + 1
        for pts, pid in zip(
            np.split(cand_pt, bounds), cand_poly[np.r_[0, bounds]]
        ):
            mask = self.packed.contains(int(pid), px[pts], py[pts])
            out_pt.append(pts[mask])
            out_poly.append(np.full(int(mask.sum()), pid, dtype=np.int64))
        if not out_pt:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_pt), np.concatenate(out_poly)


def naive_pip(
    polygons: Iterable[Sequence[np.ndarray]], px: np.ndarray, py: np.ndarray
) -> list[tuple[int, int]]:
    """O(N*P) scalar oracle used only by tests (FIXTURES.md §4)."""
    out = []
    for pid, rings in enumerate(polygons):
        for i in range(len(px)):
            inside = False
            for ring in rings:
                r = np.asarray(ring, dtype=np.float64)
                if r.shape[0] > 3 and (r[0] == r[-1]).all():
                    r = r[:-1]
                j = r.shape[0] - 1
                for k in range(r.shape[0]):
                    x1, y1 = r[j]
                    x2, y2 = r[k]
                    if (y1 > py[i]) != (y2 > py[i]):
                        xint = (x2 - x1) * (py[i] - y1) / (y2 - y1) + x1
                        if px[i] < xint:
                            inside = not inside
                    j = k
            if inside:
                out.append((i, pid))
    return out
