"""cloudtile_ray — a from-scratch Ray-Data-native spatial-join + tiling engine.

Re-implements the data-processing semantics of mansueto-institute/cloudtile
(reference at /root/reference, cited per-module as file:line) as idiomatic
Ray Data pipelines over zero-copy Arrow batches: web pages are geocoded,
encoded to S2 / hex-grid cells, joined point-in-polygon against polygon
tables, assigned to XYZ WebMercator vector tiles with a tippecanoe-style
simplification / drop ladder, and written as partitioned Parquet tile
tables with per-partition lineage manifests.

The package never calls ``ray.init()`` — sessions are owned by the CLI,
``bench.py`` and the test fixture (driver contract).
"""

__version__ = "0.1.0"
