"""Tiling settings: the engine's validated config / logical-plan IR.

Reproduces the semantics of the reference's settings layer
(``/root/reference/src/cloudtile/tippecanoe.py:14-116`` and the option
universe declared in ``/root/reference/src/cloudtile/tippecanoe.yaml``):

- three-layer precedence: packaged defaults < custom YAML < kwargs
  (``tippecanoe.py:24-32,85-116``);
- ``snake_case`` keys normalized to ``kebab-case`` (``tippecanoe.py:39``);
- unknown keys rejected against the full option universe with ``KeyError``
  (``tippecanoe.py:41-42``);
- ``minimum-zoom <= maximum-zoom`` cross-validation with the ``"g"``
  ("guess") sentinel escape (``tippecanoe.py:44-57``);
- canonical argv-style serialization: ``True`` -> ``--flag``, ``False``
  omitted, scalar -> ``--key=value``, insertion-ordered
  (``tippecanoe.py:60-75``);
- output naming ``{stem}-{arg1}-{arg2}[...]`` with empty args skipped
  (``/root/reference/src/cloudtile/geofile.py:278-296``).
"""

from __future__ import annotations

from collections import UserDict
from pathlib import Path
from typing import Any, Optional, Union

Zoom = Union[int, str]  # int or the sentinel "g" ("guess")

# The full option universe, grouped by category exactly as the reference's
# packaged YAML declares it (tippecanoe.yaml categories; SURVEY.md §2.2).
# A value of ``...`` means "known option, no default"; anything else is the
# packaged default (golden dict: /root/reference/tests/test_tippecanoe.py:75-85).
_NO_DEFAULT = object()
OPTION_CATEGORIES: dict[str, dict[str, Any]] = {
    "output": {
        "force": True,
        "output": _NO_DEFAULT,
        "output-to-directory": _NO_DEFAULT,
    },
    "parallel": {"read-parallel": True},
    "zoom": {
        "minimum-zoom": _NO_DEFAULT,
        "maximum-zoom": _NO_DEFAULT,
        "extend-zooms-if-still-dropping": _NO_DEFAULT,
        "one-tile": _NO_DEFAULT,
    },
    "detail": {
        "full-detail": _NO_DEFAULT,
        "low-detail": _NO_DEFAULT,
        "minimum-detail": _NO_DEFAULT,
    },
    "attribute-projection": {
        "exclude": _NO_DEFAULT,
        "include": _NO_DEFAULT,
        "exclude-all": _NO_DEFAULT,
    },
    "attribute-mutation": {
        "attribute-type": _NO_DEFAULT,
        "accumulate-attribute": _NO_DEFAULT,
        "empty-csv-columns-are-null": _NO_DEFAULT,
        "convert-stringified-ids-to-numbers": _NO_DEFAULT,
        "use-attribute-for-id": _NO_DEFAULT,
        "single-precision": _NO_DEFAULT,
    },
    "feature-predicates": {
        "feature-filter": _NO_DEFAULT,
        "feature-filter-file": _NO_DEFAULT,
    },
    "dropping-fixed-rate": {
        "drop-rate": _NO_DEFAULT,
        "base-zoom": _NO_DEFAULT,
        "drop-denser": _NO_DEFAULT,
        "limit-base-zoom-to-maximum-zoom": _NO_DEFAULT,
        "drop-lines": _NO_DEFAULT,
        "drop-polygons": _NO_DEFAULT,
        "cluster-distance": _NO_DEFAULT,
    },
    "dropping-as-needed": {
        "coalesce-densest-as-needed": True,
        "drop-densest-as-needed": _NO_DEFAULT,
        "drop-fraction-as-needed": _NO_DEFAULT,
        "drop-smallest-as-needed": _NO_DEFAULT,
        "coalesce-smallest-as-needed": _NO_DEFAULT,
        "coalesce-fraction-as-needed": _NO_DEFAULT,
        "force-feature-limit": _NO_DEFAULT,
        "cluster-densest-as-needed": _NO_DEFAULT,
    },
    "gamma": {"gamma": _NO_DEFAULT, "increase-gamma-as-needed": _NO_DEFAULT},
    "simplification": {
        "simplification": 10,
        "no-line-simplification": _NO_DEFAULT,
        "simplify-only-low-zooms": _NO_DEFAULT,
        "simplification-at-maximum-zoom": _NO_DEFAULT,
        "no-simplification-of-shared-nodes": _NO_DEFAULT,
        "no-tiny-polygon-reduction": _NO_DEFAULT,
        "tiny-polygon-size": _NO_DEFAULT,
        "visvalingam": _NO_DEFAULT,
    },
    "shared-borders": {
        "detect-shared-borders": _NO_DEFAULT,
        "grid-low-zooms": _NO_DEFAULT,
    },
    "clipping": {
        "buffer": _NO_DEFAULT,
        "no-clipping": _NO_DEFAULT,
        "no-duplication": _NO_DEFAULT,
    },
    "ordering": {
        "preserve-input-order": _NO_DEFAULT,
        "coalesce": _NO_DEFAULT,
        "reorder": _NO_DEFAULT,
        "reverse": _NO_DEFAULT,
        "hilbert": _NO_DEFAULT,
        "order-by": _NO_DEFAULT,
        "order-descending-by": _NO_DEFAULT,
        "order-smallest-first": _NO_DEFAULT,
        "order-largest-first": _NO_DEFAULT,
    },
    "computed-attributes": {
        "calculate-feature-density": _NO_DEFAULT,
        "generate-ids": _NO_DEFAULT,
    },
    "geometry-repair": {
        "detect-longitude-wraparound": _NO_DEFAULT,
        "use-source-polygon-winding": _NO_DEFAULT,
        "reverse-source-polygon-winding": _NO_DEFAULT,
        "clip-bounding-box": _NO_DEFAULT,
        "convert-polygons-to-label-points": _NO_DEFAULT,
    },
    "tile-limits": {
        "maximum-tile-bytes": 2500000,
        "maximum-tile-features": 20000,
        "limit-tile-feature-count": _NO_DEFAULT,
        "limit-tile-feature-count-at-maximum-zoom": _NO_DEFAULT,
        "no-feature-limit": _NO_DEFAULT,
        "no-tile-size-limit": _NO_DEFAULT,
        "no-tile-compression": True,
        "no-tile-stats": _NO_DEFAULT,
        "tile-stats-attributes-limit": _NO_DEFAULT,
        "tile-stats-sample-values-limit": _NO_DEFAULT,
        "tile-stats-values-limit": _NO_DEFAULT,
    },
    "filters": {"prefilter": _NO_DEFAULT, "postfilter": _NO_DEFAULT},
}

ALL_OPTIONS: frozenset[str] = frozenset(
    k for cat in OPTION_CATEGORIES.values() for k in cat
)

DEFAULTS: dict[str, Any] = {
    k: v
    for cat in OPTION_CATEGORIES.values()
    for k, v in cat.items()
    if v is not _NO_DEFAULT
}


class TilingSettings(UserDict):
    """Validated dict of tiling parameters (tippecanoe.py:14-58 parity).

    >>> ts = TilingSettings()
    >>> ts["maximum-tile-bytes"]
    2500000
    >>> ts["minimum_zoom"] = 5   # snake_case is normalized
    >>> ts["minimum-zoom"]
    5
    """

    def __init__(self, cfg_path: Optional[Union[str, Path]] = None, **kwargs: Any):
        super().__init__()
        for k, v in self._load_defaults(cfg_path).items():
            self[k] = v
        self.override_settings(**kwargs)

    @staticmethod
    def _load_defaults(cfg_path: Optional[Union[str, Path]]) -> dict[str, Any]:
        if cfg_path is None:
            return dict(DEFAULTS)
        return read_yaml_config(cfg_path)

    def __setitem__(self, key: str, value: Any) -> None:
        key = key.replace("_", "-")
        if key not in ALL_OPTIONS:
            raise KeyError(f"{key} is not a valid tiling setting")
        # detect-shared-borders / grid-low-zooms are implemented in the
        # polygon path (stages/polygons.py: shared_border_simplify runs in
        # the per-tile merge; grid snap in AssignPolygonTiles._tile_ring)
        # cross-validate zoom pair; "g" ("guess") escapes the check
        # (tippecanoe.py:44-57 — both assignment orders covered)
        if key == "minimum-zoom" and not _is_guess(value):
            other = self.data.get("maximum-zoom")
            if other is not None and not _is_guess(other) and value > other:
                raise ValueError(
                    f"minimum-zoom ({value}) must be <= maximum-zoom ({other})"
                )
        if key == "maximum-zoom" and not _is_guess(value):
            other = self.data.get("minimum-zoom")
            if other is not None and not _is_guess(other) and other > value:
                raise ValueError(
                    f"minimum-zoom ({other}) must be <= maximum-zoom ({value})"
                )
        super().__setitem__(key, value)

    def override_settings(self, **kwargs: Any) -> None:
        """Merge kwargs over current values (tippecanoe.py:77-83)."""
        for k, v in kwargs.items():
            self[k] = v

    def set_zooms_if_absent(self, minimum_zoom: Zoom, maximum_zoom: Zoom) -> None:
        """Positional zooms apply only when not already set — an explicit
        kwarg override beats the positional (geofile.py:207-210; golden
        tests/test_geofile.py:184-210)."""
        if "minimum-zoom" not in self.data:
            self["minimum-zoom"] = minimum_zoom
        if "maximum-zoom" not in self.data:
            self["maximum-zoom"] = maximum_zoom

    def convert_to_list_args(self) -> list[str]:
        """Canonical plan serialization (tippecanoe.py:60-75): ``True`` ->
        ``--flag``, ``False`` -> omitted, scalar -> ``--key=value``,
        insertion-ordered."""
        out: list[str] = []
        for k, v in self.data.items():
            if v is True:
                out.append(f"--{k}")
            elif v is False:
                continue
            else:
                out.append(f"--{k}={v}")
        return out

    @property
    def zoom_range(self) -> tuple[Optional[Zoom], Optional[Zoom]]:
        return self.data.get("minimum-zoom"), self.data.get("maximum-zoom")


def _is_guess(value: Any) -> bool:
    return isinstance(value, str) and value == "g"


def read_yaml_config(cfg_path: Union[str, Path]) -> dict[str, Any]:
    """Load a custom YAML settings file, flattening one level of category
    dicts (tippecanoe.py:85-116): ``{cat: {k: v}}`` and flat ``{k: v}``
    both accepted. Raises ``FileNotFoundError`` for a missing file
    (tippecanoe.py:102-103) and ``ValueError`` for an empty one
    (tippecanoe.py:113-114)."""
    import yaml

    p = Path(cfg_path)
    if not p.exists():
        raise FileNotFoundError(f"config file {p} not found")
    with open(p, "r", encoding="utf-8") as fh:
        raw = yaml.safe_load(fh)
    if not raw:
        raise ValueError(f"config file {p} is empty")
    flat: dict[str, Any] = {}
    for k, v in raw.items():
        if isinstance(v, dict):
            flat.update(v)
        else:
            flat[k] = v
    return flat


def get_output_name(stem: str, *args: Any, suffix: str = "") -> str:
    """Output naming parity with ``FilePath.get_output_path``
    (geofile.py:278-296): ``{stem}-{arg1}-{arg2}...``, empty args skipped.

    >>> get_output_name("test", 5, 6)
    'test-5-6'
    >>> get_output_name("test", 5, 6, suffix="s")
    'test-5-6-s'
    >>> get_output_name("test", 7, 9, suffix="")
    'test-7-9'
    """
    parts = [stem]
    for a in (*args, suffix):
        s = str(a)
        if s:
            parts.append(s)
    return "-".join(parts)
