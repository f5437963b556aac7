"""Pure-numpy geospatial kernels (no Ray, no external geo libraries).

The sandbox has no h3 / s2sphere / shapely / pyproj (SURVEY.md §0), so every
kernel here — WebMercator tile math, S2 cell ids, hex-grid indexing,
point-in-polygon + STRtree, line simplification, rasterize/vectorize — is
implemented from scratch against the public algorithms and tested by
invariants + independently-computed goldens (FIXTURES.md §4).
"""
