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
