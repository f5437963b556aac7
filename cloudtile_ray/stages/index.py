"""Cell-indexing stage: append S2 / hex-grid / XYZ-tile key columns —
stateless vectorized ``map_batches`` transforms over Arrow batches
(north-rule: "encoded to H3 cells and S2 cell IDs at configurable
zoom/resolution via vectorized map_batches over zero-copy Arrow")."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cloudtile_ray.geo import hexgrid, icosa, s2, webmercator as wm


def _lonlat(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    valid = ~(np.isnan(lon) | np.isnan(lat))
    return lon, lat, valid


class AddCellIndexes:
    """``map_batches`` callable appending ``s2_cell`` (uint64), ``hex_cell``
    (uint64, planar aperture-7 lattice) and optionally ``icosa_cell``
    (uint64, spherical icosahedral aperture-7 — ``geo/icosa.py``) at
    configured level/resolution. Null where the row has no geocoded point.
    Plain function semantics — kept as a class only to carry the
    configuration; still runs as stateless tasks."""

    def __init__(
        self,
        s2_level: int = 16,
        hex_res: int = 9,
        icosa_res: int | None = None,
    ):
        self.s2_level = s2_level
        self.hex_res = hex_res
        self.icosa_res = icosa_res

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon, lat, valid = _lonlat(batch)
        s2c = np.zeros(len(lon), dtype=np.uint64)
        hxc = np.zeros(len(lon), dtype=np.uint64)
        if valid.any():
            s2c[valid] = s2.lonlat_to_cell(lon[valid], lat[valid], self.s2_level)
            hxc[valid] = hexgrid.latlng_to_cell(lon[valid], lat[valid], self.hex_res)
        mask = pa.array(~valid)
        batch = batch.append_column(
            "s2_cell", pa.array(s2c, mask=np.asarray(mask))
        )
        batch = batch.append_column("hex_cell", pa.array(hxc, mask=np.asarray(mask)))
        if self.icosa_res is not None:
            icc = np.zeros(len(lon), dtype=np.uint64)
            if valid.any():
                icc[valid] = icosa.latlng_to_cell(
                    lon[valid], lat[valid], self.icosa_res
                )
            batch = batch.append_column(
                "icosa_cell", pa.array(icc, mask=np.asarray(mask))
            )
        return batch


class AssignTiles:
    """Per-zoom XYZ tile assignment: for each geocoded row emit one output
    row per zoom z in [min_zoom, max_zoom] with (z, x, y, tile_key) plus the
    in-tile pixel position — the flat_map analog of tippecanoe's zoom
    ladder (/root/reference/src/cloudtile/tippecanoe.yaml:25-29), done as a
    single vectorized batch explosion (numpy repeat), not per-row flat_map."""

    def __init__(self, min_zoom: int, max_zoom: int, extent: int = wm.DEFAULT_EXTENT,
                 drop_rate: float | None = None, base_zoom: int | None = None,
                 one_tile: str | None = None):
        if min_zoom > max_zoom:
            raise ValueError(f"min_zoom {min_zoom} > max_zoom {max_zoom}")
        self.zooms = list(range(min_zoom, max_zoom + 1))
        self.extent = extent
        # ``one-tile z/x/y`` (tippecanoe.yaml:29): restrict output to a
        # single named tile
        self.one_tile_key = None
        if one_tile:
            tz, tx, ty = (int(v) for v in one_tile.split("/"))
            self.one_tile_key = int(wm.tile_key(np.uint64(tz), np.uint64(tx), np.uint64(ty)))
            self.zooms = [z for z in self.zooms if z == tz] or [tz]
        # fixed-rate dropping (tippecanoe.yaml:49-56): at z < base_zoom keep
        # a deterministic hash-sample of rate^(base_zoom - z) per feature —
        # a pure function of (feature hash, z) so output is reproducible at
        # any parallelism (SURVEY.md §7.5 hard part 2)
        self.drop_rate = drop_rate
        self.base_zoom = base_zoom

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(lon) | np.isnan(lat))
        idx = np.nonzero(valid)[0]
        lon, lat = lon[idx], lat[idx]
        feat_hash = None
        if self.drop_rate is not None:
            if "doc_id" in batch.column_names:
                # multiplicative integer hash: deterministic, vectorized,
                # and reproducible in plain SQL
                d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
                feat_hash = ((d * 2654435761) % (1 << 31))[idx]
            elif "url" in batch.column_names:
                from cloudtile_ray.stages.util import stable_hash_strings

                feat_hash = (
                    stable_hash_strings(batch.column("url")).astype(np.int64) & 0x7FFFFFFF
                )[idx]
        parts = []
        for z in self.zooms:
            keep = np.arange(len(idx))
            if feat_hash is not None and self.base_zoom is not None and z < self.base_zoom:
                rate = self.drop_rate ** (self.base_zoom - z)
                keep = keep[(feat_hash[keep] % 1_000_000) < rate * 1_000_000]
            tx, ty, px, py = wm.lonlat_to_pixel(lon[keep], lat[keep], z, self.extent)
            sub = batch.take(pa.array(idx[keep]))
            sub = sub.append_column("z", pa.array(np.full(len(keep), z, dtype=np.int64)))
            sub = sub.append_column("x", pa.array(tx))
            sub = sub.append_column("y", pa.array(ty))
            sub = sub.append_column("px", pa.array(px))
            sub = sub.append_column("py", pa.array(py))
            sub = sub.append_column(
                "tile_key",
                pa.array(wm.tile_key(np.full(len(keep), z), tx, ty)),
            )
            parts.append(sub)
        if not parts:
            return batch.slice(0, 0)
        out = pa.concat_tables(parts)
        if self.one_tile_key is not None:
            import pyarrow.compute as pc

            out = out.filter(
                pc.equal(out.column("tile_key"), pa.scalar(self.one_tile_key, pa.uint64()))
            )
        return out
