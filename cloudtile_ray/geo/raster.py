"""Raster <-> vector conversion on per-tile grids (north-rule operator).

``rasterize`` scan-converts polygon rings onto a regular grid with the
even-odd rule (cell-center sampling, matching ``pip.PackedPolygons``);
``vectorize`` traces the boundary of a binary grid back into rectilinear
rings. Round-trip invariant (tested): rasterize(vectorize(g)) == g for any
binary grid g.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def rasterize(
    rings: Sequence[np.ndarray],
    bounds: tuple[float, float, float, float],
    width: int,
    height: int,
) -> np.ndarray:
    """Even-odd rasterization of polygon ``rings`` to a (height, width)
    uint8 grid over ``bounds = (west, south, east, north)``; row 0 is the
    top (north) row, matching tile pixel orientation."""
    west, south, east, north = bounds
    xs = west + (np.arange(width) + 0.5) * (east - west) / width
    ys = north - (np.arange(height) + 0.5) * (north - south) / height
    gx, gy = np.meshgrid(xs, ys)
    px = gx.ravel()
    py = gy.ravel()
    inside = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if r.shape[0] > 3 and (r[0] == r[-1]).all():
            r = r[:-1]
        x1, y1 = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        crosses = (y1[:, None] > py[None, :]) != (y2[:, None] > py[None, :])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1)[:, None] * (py[None, :] - y1[:, None]) / (y2 - y1)[
                :, None
            ] + x1[:, None]
        hits = crosses & (px[None, :] < xint)
        inside ^= (hits.sum(axis=0) % 2).astype(bool)
    return inside.reshape(height, width).astype(np.uint8)


def vectorize(
    grid: np.ndarray, bounds: tuple[float, float, float, float]
) -> list[np.ndarray]:
    """Trace a binary grid into closed rectilinear rings in ``bounds``
    coordinates (outer rings CCW in grid space, holes arise naturally from
    the even-odd rule on re-rasterization)."""
    grid = np.asarray(grid).astype(bool)
    h, w = grid.shape
    west, south, east, north = bounds
    # collect boundary edges (between a filled cell and an unfilled/outside
    # neighbor) as directed segments in integer corner coordinates, filled
    # region kept to the left so rings close consistently
    padded = np.zeros((h + 2, w + 2), dtype=bool)
    padded[1:-1, 1:-1] = grid
    # a corner can carry two outgoing edges (diagonally-touching cells), so
    # this is a multimap; in/out degrees match, so rings always close
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(a: tuple[int, int], b: tuple[int, int]) -> None:
        edges.setdefault(a, []).append(b)

    for i in range(h):
        for j in range(w):
            if not grid[i, j]:
                continue
            # corners in (col, row) with row increasing downward
            tl, tr = (j, i), (j + 1, i)
            bl, br = (j, i + 1), (j + 1, i + 1)
            if not padded[i, j + 1]:  # north neighbor empty -> top edge, west->east
                add(tl, tr)
            if not padded[i + 2, j + 1]:  # south neighbor -> bottom edge, east->west
                add(br, bl)
            if not padded[i + 1, j]:  # west neighbor -> left edge, south->north
                add(bl, tl)
            if not padded[i + 1, j + 2]:  # east neighbor -> right edge, north->south
                add(tr, br)
    rings: list[np.ndarray] = []
    while edges:
        start = next(iter(edges))
        ring = [start]
        node = start
        while True:
            outs = edges[node]
            nxt = outs.pop()
            if not outs:
                del edges[node]
            ring.append(nxt)
            node = nxt
            if node == start:
                break
        arr = np.asarray(ring, dtype=np.float64)
        # grid corner coords -> bounds coords (row 0 = north edge)
        out = np.empty_like(arr)
        out[:, 0] = west + arr[:, 0] * (east - west) / w
        out[:, 1] = north - arr[:, 1] * (north - south) / h
        rings.append(out)
    return rings
