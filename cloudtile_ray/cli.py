"""CLI mirroring the reference's grammar
(/root/reference/src/cloudtile/cli/parsers.py:10-237 and
cli/__init__.py:17-161):

    raytile convert {vector2fgb, fgb2pmtiles, single-step} ORIGIN [MINZ MAXZ]
            [--suffix S] [--config YAML] [--tc-kwargs k[=v] ...]
            [--submit] [--memory M] [--storage G]
    raytile manage {upload, download} FILENAME

Mapping to the engine: ``vector2fgb`` = ingest + normalize (source ->
feature parquet, the FlatGeobuf-intermediate analog), ``fgb2pmtiles`` =
tile build over an already-normalized parquet, ``single-step`` = the fused
pipeline. Zoom positionals accept ints or the ``"g"`` guess sentinel
(parsers.py:146-150). ``--tc-kwargs`` is the free-form k[=v] dict action
(parsers.py:210-237): value-less tokens become True, values are coerced
bool/int where they parse. ``--submit`` replaces ``--ecs`` (prints the
``ray job submit`` command per the north rule instead of launching
Fargate); ``--memory``/``--storage`` keep the reference's validation ranges
(ecs.py:58-102) and require ``--submit`` (cli/__init__.py:81-84).
``manage`` is a content-addressed local store with md5 upload-skip
(s3.py:101-149 analog).
"""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import sys
from pathlib import Path
from typing import Any, Optional

STORE_DIR = os.environ.get("RAYTILE_STORE", "/tmp/raytile_store")


def parse_zoom(value: str):
    """int or the 'g' sentinel (cli/parsers.py:146-150 parity)."""
    if value == "g":
        return "g"
    try:
        return int(value)
    except ValueError as exc:
        raise argparse.ArgumentTypeError(
            f"zoom must be an integer or 'g', got {value!r}"
        ) from exc


def coerce_value(raw: str) -> Any:
    """bool/int coercion of CLI values (cli/parsers.py:228-237 parity)."""
    low = raw.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    try:
        return int(raw)
    except ValueError:
        return raw


class ParseTcKwargs(argparse.Action):
    """Free-form ``k[=v]`` tokens -> dict (cli/parsers.py:210-237 parity):
    ``k`` alone means True."""

    def __call__(self, parser, namespace, values, option_string=None):
        out: dict[str, Any] = {}
        for token in values:
            if "=" in token:
                k, v = token.split("=", 1)
                out[k] = coerce_value(v)
            else:
                out[token] = True
        setattr(namespace, self.dest, out)


def validate_memory(value: str) -> int:
    """[32768, 122880] MiB, multiple of 8192 (ecs.py:71-74 parity)."""
    m = int(value)
    if not 32768 <= m <= 122880:
        raise argparse.ArgumentTypeError(
            f"memory must be within [32768, 122880], got {m}"
        )
    if m % 8192 != 0:
        raise argparse.ArgumentTypeError(f"memory must be a multiple of 8192, got {m}")
    return m


def validate_storage(value: str) -> int:
    """[20, 200] GiB (ecs.py:98 parity)."""
    s = int(value)
    if not 20 <= s <= 200:
        raise argparse.ArgumentTypeError(f"storage must be within [20, 200], got {s}")
    return s


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="raytile", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    convert = sub.add_parser("convert", help="run a conversion pipeline")
    csub = convert.add_subparsers(dest="subcommand", required=True)

    def add_common(sp, zooms: bool):
        sp.add_argument("origin", help="input file path")
        if zooms:
            sp.add_argument("minimum_zoom", type=parse_zoom)
            sp.add_argument("maximum_zoom", type=parse_zoom)
        sp.add_argument("--suffix", default="", help="output name suffix")
        sp.add_argument("--config", default=None, help="custom settings YAML")
        sp.add_argument(
            "--tc-kwargs", nargs="*", action=ParseTcKwargs, default={},
            help="free-form settings overrides k[=v]",
        )
        sp.add_argument("--output-dir", default="/tmp/raytile_out")
        sp.add_argument("--submit", action="store_true",
                        help="print the ray job submit command instead of running")
        sp.add_argument("--memory", type=validate_memory, default=None)
        sp.add_argument("--storage", type=validate_storage, default=None)

    add_common(csub.add_parser("vector2fgb", help="ingest + normalize"), zooms=False)
    add_common(csub.add_parser("fgb2pmtiles", help="tile an ingested table"), zooms=True)
    add_common(csub.add_parser("single-step", help="full pipeline"), zooms=True)

    manage = sub.add_parser("manage", help="store files")
    msub = manage.add_subparsers(dest="subcommand", required=True)
    up = msub.add_parser("upload")
    up.add_argument("filename")
    down = msub.add_parser("download")
    down.add_argument("filename")
    return p


def _store_key(path: Path) -> Path:
    suffix = path.suffix.lstrip(".")
    if not suffix:
        raise ValueError("file must have a suffix (s3.py:67-68 parity)")
    return Path(STORE_DIR) / suffix / path.name


def _md5(path: Path) -> str:
    h = hashlib.md5()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def manage_upload(filename: str) -> str:
    """Content-addressed upload with md5 skip (s3.py:101-149 parity)."""
    src = Path(filename)
    if not src.exists():
        raise FileNotFoundError(filename)
    dst = _store_key(src)
    dst.parent.mkdir(parents=True, exist_ok=True)
    if dst.exists() and _md5(dst) == _md5(src):
        return f"skipped (identical md5): {dst}"
    shutil.copy2(src, dst)
    return f"uploaded: {dst}"


def manage_download(filename: str) -> str:
    """Keyed {suffix}/{name} (s3.py:55-99 parity); missing -> FileNotFoundError."""
    name = Path(filename)
    src = _store_key(name)
    if not src.exists():
        raise FileNotFoundError(f"{name.name} not found in store")
    dst = Path.cwd() / name.name
    shutil.copy2(src, dst)
    return f"downloaded: {dst}"


def _submit_argv(args: argparse.Namespace) -> list[str]:
    """Re-serialize the namespace into the argv the submitted job runs
    (_get_args_for_ecs parity, cli/__init__.py:138-161: memory/storage
    dropped, tc-kwargs re-encoded, suffix re-added)."""
    argv = ["convert", args.subcommand, args.origin]
    if hasattr(args, "minimum_zoom"):
        argv += [str(args.minimum_zoom), str(args.maximum_zoom)]
    if args.tc_kwargs:
        argv.append("--tc-kwargs")
        argv += [f"{k}={v}" for k, v in args.tc_kwargs.items()]
    if args.suffix:
        argv += ["--suffix", args.suffix]
    if args.config:
        argv += ["--config", args.config]
    return argv


def run_convert(args: argparse.Namespace) -> str:
    if (args.memory is not None or args.storage is not None) and not args.submit:
        raise SystemExit("--memory/--storage can only be used with --submit")
    if args.submit:
        inner = " ".join(_submit_argv(args))
        entrypoint = f"python -m cloudtile_ray.cli {inner}"
        # per-job resource request (the container-override analog,
        # /root/reference/src/cloudtile/ecs.py:115-128)
        res = ""
        if args.memory:
            res = f" --entrypoint-memory {args.memory * 1024 * 1024}"
        cmd = f"ray job submit --no-wait{res} -- {entrypoint}"
        print(cmd)
        return cmd

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from cloudtile_ray.config import TilingSettings, get_output_name
    from cloudtile_ray.sources.readers import load_source

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = Path(args.origin).stem

    if args.subcommand == "vector2fgb":
        # ingest + normalize: source -> pages -> geocoded feature parquet
        from cloudtile_ray.sources.pages import build_pages_batch
        from cloudtile_ray.stages import geocode

        ds = load_source(args.origin)
        if "doc_id" in ds.schema().names:
            ds = ds.map_batches(build_pages_batch, batch_format="pyarrow")
        ds = ds.map_batches(geocode.geocode_batch, batch_format="pyarrow")
        ds = ds.map_batches(geocode.drop_html, batch_format="pyarrow")
        dest = out_dir / f"{stem}-features"
        ds.write_parquet(str(dest))
        return f"wrote {dest}"

    settings = TilingSettings(cfg_path=args.config, **args.tc_kwargs)
    settings.set_zooms_if_absent(args.minimum_zoom, args.maximum_zoom)
    minz, maxz = settings.zoom_range
    if minz == "g" or maxz == "g":
        from cloudtile_ray.geo.webmercator import guess_zoom_for_density

        n = load_source(args.origin).count()
        guess = guess_zoom_for_density(n, settings.get("maximum-tile-features", 20000))
        minz = 0 if minz == "g" else minz
        maxz = guess if maxz == "g" else maxz
        settings["minimum-zoom"], settings["maximum-zoom"] = minz, maxz

    name = get_output_name(stem, minz, maxz, suffix=args.suffix)
    dest = out_dir / name

    if args.subcommand == "fgb2pmtiles":
        from cloudtile_ray.stages.index import AssignTiles
        from cloudtile_ray.stages.tiles import encode_tiles

        ds = load_source(args.origin)
        exploded = ds.map_batches(
            lambda t: t.select(["doc_id", "lon", "lat"]), batch_format="pyarrow"
        ).map_batches(AssignTiles(int(minz), int(maxz)), batch_format="pyarrow")
        tiles = encode_tiles(exploded, settings=dict(settings))
    else:  # single-step
        from cloudtile_ray.pipelines.single_step import single_step

        sf_dir = str(Path(args.origin).parent)
        tiles = single_step(
            sf_dir, int(minz) if minz != "g" else 0, int(maxz) if maxz != "g" else 7,
            config=args.config, suffix=args.suffix, **args.tc_kwargs,
        )

    from cloudtile_ray.state.archive import write_archive
    from cloudtile_ray.state.manifest import write_tiles_resumable

    result = write_tiles_resumable(tiles, dest, settings=dict(settings))
    # terminal single-file artifact (PMTiles v3, geofile.py:239-250 parity)
    arch = write_archive(tiles, Path(str(dest) + ".pmtiles"))
    return (
        f"wrote {dest}: {result['total_rows']} tiles "
        f"({len(result['written'])} partitions written, "
        f"{len(result['skipped'])} skipped via manifest); "
        f"archive {dest}.pmtiles ({arch['n_tiles']} tiles, {arch['total_bytes']} bytes)"
    )


def main(argv: Optional[list[str]] = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    try:
        if args.command == "manage":
            fn = manage_upload if args.subcommand == "upload" else manage_download
            print(fn(args.filename))
        else:
            print(run_convert(args))
    except (ValueError, FileNotFoundError) as exc:
        # surface domain errors as parser errors (cli/__init__.py:133-136)
        parser.error(str(exc))
    return 0


if __name__ == "__main__":
    sys.exit(main())
