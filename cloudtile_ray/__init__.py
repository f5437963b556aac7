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


def _pin_arrow_threads() -> None:
    """Arrow's internal kernel thread pool defaults to all cores; inside a
    Ray worker that multiplies to workers x cores threads and the map stages
    ANTI-scale (measured: 32-cpu slower than 8-cpu). One Arrow thread per
    worker restores linear map-stage scaling; parallelism belongs to Ray's
    scheduler, not nested pools."""
    try:
        import pyarrow as pa

        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
    except Exception:
        pass


_pin_arrow_threads()
