"""Settings parity tests — goldens mirror the reference's
(/root/reference/tests/test_tippecanoe.py, tests/test_geofile.py)."""

import pytest

from cloudtile_ray.config import TilingSettings, get_output_name, read_yaml_config


GOLDEN_DEFAULTS = {
    "read-parallel": True,
    "coalesce-densest-as-needed": True,
    "simplification": 10,
    "maximum-tile-bytes": 2500000,
    "maximum-tile-features": 20000,
    "no-tile-compression": True,
    "force": True,
}


def test_default_settings_golden():
    # golden default dict: /root/reference/tests/test_tippecanoe.py:75-85
    assert dict(TilingSettings()) == GOLDEN_DEFAULTS


def test_argv_serialization_and_false_suppression():
    # /root/reference/tests/test_tippecanoe.py:88-113
    ts = TilingSettings()
    ts["force"] = False
    ts["minimum-zoom"] = 5
    args = ts.convert_to_list_args()
    assert "--force" not in args
    assert "--read-parallel" in args
    assert "--simplification=10" in args
    assert args[-1] == "--minimum-zoom=5"  # insertion-ordered


def test_snake_case_normalization():
    ts = TilingSettings(minimum_zoom=3)
    assert ts["minimum-zoom"] == 3


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        TilingSettings()["not-a-real-option"] = 1


@pytest.mark.parametrize("first,second", [(("minimum-zoom", 9), ("maximum-zoom", 5)),
                                          (("maximum-zoom", 5), ("minimum-zoom", 9))])
def test_zoom_cross_validation_both_orders(first, second):
    # /root/reference/tests/test_tippecanoe.py:49-72
    ts = TilingSettings()
    ts[first[0]] = first[1]
    with pytest.raises(ValueError):
        ts[second[0]] = second[1]


def test_guess_sentinel_accepted():
    ts = TilingSettings()
    ts["minimum-zoom"] = 5
    ts["maximum-zoom"] = "g"  # escapes the cross-check (tippecanoe.py:45,52)
    assert ts["maximum-zoom"] == "g"


def test_override_beats_positional_zooms():
    # /root/reference/tests/test_geofile.py:184-210 — an explicit kwarg wins
    ts = TilingSettings()
    ts.override_settings(**{"minimum-zoom": 7, "maximum-zoom": 9})
    ts.set_zooms_if_absent(5, 6)
    assert ts.zoom_range == (7, 9)
    assert get_output_name("test", *ts.zoom_range) == "test-7-9"


def test_output_naming_goldens():
    # /root/reference/tests/test_geofile.py:151,157,172-182,204,210
    assert get_output_name("test", 5, 6) == "test-5-6"
    assert get_output_name("test", 5, 6, suffix="s") == "test-5-6-s"
    assert get_output_name("test", 7, 9, suffix="") == "test-7-9"
    assert get_output_name("stem") == "stem"


def test_yaml_config_layering(tmp_path):
    cfg = tmp_path / "custom.yaml"
    cfg.write_text("tile-limits:\n  maximum-tile-bytes: 99\nzoom:\n  minimum-zoom: 2\n")
    ts = TilingSettings(cfg_path=cfg, maximum_tile_features=7)
    assert ts["maximum-tile-bytes"] == 99
    assert ts["minimum-zoom"] == 2
    assert ts["maximum-tile-features"] == 7  # kwargs override config


def test_yaml_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_yaml_config(tmp_path / "missing.yaml")
    empty = tmp_path / "empty.yaml"
    empty.write_text("")
    with pytest.raises(ValueError):
        read_yaml_config(empty)
