"""Format-dispatched source readers (the ``Converter.load_file`` analog,
/root/reference/src/cloudtile/converter.py:90-130): a suffix registry maps
input paths to Ray Data readers that normalize into the pages schema.

The reference's ``VectorFile`` accepts {geojson, gpkg, parquet}
(/root/reference/src/cloudtile/geofile.py:136) and rejects anything else at
construction (geofile.py:138-145); we mirror that with a suffix registry
over the formats this environment can actually parse (parquet, json, csv)
plus the derived-from-documents path.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

ALLOWED_SUFFIXES = {"parquet", "json", "csv"}


def _read_parquet(path: str):
    import ray.data

    return ray.data.read_parquet(path)


def _read_json(path: str):
    import ray.data

    return ray.data.read_json(path)


def _read_csv(path: str):
    import ray.data

    return ray.data.read_csv(path)


READERS: dict[str, Callable[[str], "ray.data.Dataset"]] = {
    "parquet": _read_parquet,
    "json": _read_json,
    "csv": _read_csv,
}


def load_source(origin: str) -> "ray.data.Dataset":
    """Suffix-dispatch a source path to its reader. Missing file ->
    FileNotFoundError (FilePath existence check parity, geofile.py:268-271);
    unsupported suffix -> ValueError (geofile.py:138-145 parity)."""
    p = Path(origin)
    if not p.exists():
        raise FileNotFoundError(f"{origin} not found")
    if p.is_dir():  # a directory of parquet part files (our own sink layout)
        return _read_parquet(str(p))
    suffix = p.suffix.lstrip(".").lower()
    if suffix not in READERS:
        raise ValueError(
            f"{suffix!r} is not a supported format; expected one of "
            f"{sorted(ALLOWED_SUFFIXES)}"
        )
    return READERS[suffix](origin)
