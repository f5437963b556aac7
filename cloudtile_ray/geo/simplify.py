"""Line/ring simplification: Douglas-Peucker (default) and Visvalingam.

The engine-native "simplification ladder": tolerance = the ``simplification``
setting (default 10, /root/reference/src/cloudtile/tippecanoe.yaml:70; golden
default dict /root/reference/tests/test_tippecanoe.py:75-85) multiplied by
the pixel size at the target zoom (``webmercator.pixel_size_degrees``), the
same semantics tippecanoe applies per zoom when cloudtile drives it
(tippecanoe.yaml:69-77, incl. the ``visvalingam`` alternative at yaml:77).
"""

from __future__ import annotations

import numpy as np


def douglas_peucker_mask(pts: np.ndarray, tolerance: float) -> np.ndarray:
    """Boolean keep-mask for an (n, 2) polyline under Douglas-Peucker.

    Iterative stack formulation; the perpendicular-distance scan inside each
    segment is vectorized numpy, so cost is O(n log n)-ish with no Python
    per-vertex recursion.
    """
    pts = np.asarray(pts, dtype=np.float64)
    n = pts.shape[0]
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    tol2 = tolerance * tolerance
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = pts[a + 1 : b]
        dx = pts[b, 0] - pts[a, 0]
        dy = pts[b, 1] - pts[a, 1]
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            d2 = (seg[:, 0] - pts[a, 0]) ** 2 + (seg[:, 1] - pts[a, 1]) ** 2
        else:
            # squared perpendicular distance to the (a, b) line
            cross = (seg[:, 0] - pts[a, 0]) * dy - (seg[:, 1] - pts[a, 1]) * dx
            d2 = cross * cross / L2
        i = int(np.argmax(d2))
        if d2[i] > tol2:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def dp_mask_padded(P: np.ndarray, cnts: np.ndarray, tolerance: float) -> np.ndarray:
    """Vectorized Douglas-Peucker over a padded ``(R, V, 2)`` batch of
    small polylines/rings with per-row vertex counts ``cnts``.

    Produces bit-identical keep masks to :func:`douglas_peucker_mask`
    applied row-by-row (same float expressions, same first-max argmax
    tie-break), with zero per-ring Python: the recursion is simulated
    breadth-first — each round processes EVERY ring's active (a, b)
    segments at once, so the loop count is bounded by the recursion depth
    (<= V), not by the number of rings.  Built for the clip outputs of the
    batched polygon/line paths, where V is small (a clipped quad has <= 8
    vertices) and R is the whole (feature, tile) pair set."""
    P = np.asarray(P, dtype=np.float64)
    R, V = P.shape[0], P.shape[1]
    keep = np.zeros((R, V), dtype=bool)
    if R == 0 or V == 0:
        return keep
    cnts = np.asarray(cnts, dtype=np.int64)
    rows = np.nonzero(cnts > 0)[0]
    keep[rows, 0] = True
    keep[rows, cnts[rows] - 1] = True
    tol2 = tolerance * tolerance
    # active segments: (ring, a, b) with at least one interior vertex
    seg_r = np.nonzero(cnts >= 3)[0]
    seg_a = np.zeros(len(seg_r), dtype=np.int64)
    seg_b = cnts[seg_r] - 1
    offs = np.arange(1, max(V - 1, 2), dtype=np.int64)
    while len(seg_r):
        idx = seg_a[:, None] + offs[None, :]
        m_valid = idx < seg_b[:, None]
        idx_c = np.minimum(idx, seg_b[:, None] - 1)
        px = P[seg_r[:, None], idx_c, 0]
        py = P[seg_r[:, None], idx_c, 1]
        ax = P[seg_r, seg_a, 0][:, None]
        ay = P[seg_r, seg_a, 1][:, None]
        bx = P[seg_r, seg_b, 0][:, None]
        by = P[seg_r, seg_b, 1][:, None]
        dx = bx - ax
        dy = by - ay
        L2 = dx * dx + dy * dy
        cross = (px - ax) * dy - (py - ay) * dx
        d2 = np.where(
            L2 == 0.0,
            (px - ax) ** 2 + (py - ay) ** 2,
            cross * cross / np.where(L2 == 0.0, 1.0, L2),
        )
        d2 = np.where(m_valid, d2, -1.0)
        i = np.argmax(d2, axis=1)
        d2max = d2[np.arange(len(seg_r)), i]
        split = d2max > tol2
        m = seg_a + 1 + i
        keep[seg_r[split], m[split]] = True
        r2 = np.concatenate([seg_r[split], seg_r[split]])
        a2 = np.concatenate([seg_a[split], m[split]])
        b2 = np.concatenate([m[split], seg_b[split]])
        good = (b2 - a2) >= 2
        seg_r, seg_a, seg_b = r2[good], a2[good], b2[good]
    return keep


def visvalingam_mask(pts: np.ndarray, min_area: float, min_keep: int = 3) -> np.ndarray:
    """Boolean keep-mask under Visvalingam-Whyatt: repeatedly drop the
    vertex whose triangle with its neighbors has the smallest effective
    area, until every remaining vertex's area >= ``min_area`` (or only
    ``min_keep`` vertices remain). Endpoints are always kept."""
    pts = np.asarray(pts, dtype=np.float64)
    n = pts.shape[0]
    keep = np.ones(n, dtype=bool)
    if n <= min_keep:
        return keep
    import heapq

    prev = np.arange(-1, n - 1)
    nxt = np.arange(1, n + 1)

    def area(i: int) -> float:
        a, b, c = pts[prev[i]], pts[i], pts[nxt[i]]
        return 0.5 * abs((b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1]))

    heap = [(area(i), i) for i in range(1, n - 1)]
    heapq.heapify(heap)
    alive = n
    stale = np.zeros(n, dtype=bool)
    while heap and alive > min_keep:
        a, i = heapq.heappop(heap)
        if not keep[i] or stale[i]:
            if keep[i]:
                stale[i] = False
                heapq.heappush(heap, (area(i), i))
            continue
        if a >= min_area:
            break
        keep[i] = False
        alive -= 1
        p, q = prev[i], nxt[i]
        nxt[p] = q
        prev[q] = p
        for j in (p, q):
            if 0 < j < n - 1 and keep[j]:
                stale[j] = True
    return keep


def simplify_ring(
    ring: np.ndarray, tolerance: float, visvalingam: bool = False
) -> np.ndarray:
    """Simplify a ring/polyline, preserving >= 3 vertices for rings so the
    polygon stays a polygon (tiny-polygon reduction is a separate knob)."""
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] <= 3:
        return ring
    if visvalingam:
        # effective-area threshold comparable to a DP tolerance band
        mask = visvalingam_mask(ring, min_area=tolerance * tolerance, min_keep=3)
    else:
        mask = douglas_peucker_mask(ring, tolerance)
        if mask.sum() < 3:  # keep ring valid
            extra = np.argsort(~mask, kind="stable")[:3]
            mask[extra] = True
    return ring[mask]
