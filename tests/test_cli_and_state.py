"""CLI grammar parity tests (mirroring /root/reference/tests/test_cli.py,
test_parsers.py, test_ecs.py cases) + manifest/resume tests."""

import json

import numpy as np
import pyarrow as pa
import pytest

from cloudtile_ray import cli
from cloudtile_ray.state.manifest import PartitionedWriter, config_hash


class TestParsers:
    @pytest.mark.parametrize(
        "tokens,want",
        [
            (["maximum-zoom=9"], {"maximum-zoom": 9}),
            (["force"], {"force": True}),
            (["force=false"], {"force": False}),
            (["name=abc", "simplification=5"], {"name": "abc", "simplification": 5}),
        ],
    )
    def test_tc_kwargs_table(self, tokens, want):
        # /root/reference/tests/test_parsers.py:146-162 parity
        p = cli.build_parser()
        args = p.parse_args(["convert", "single-step", "x.parquet", "5", "6",
                             "--tc-kwargs", *tokens])
        assert args.tc_kwargs == want

    def test_zoom_g_sentinel(self):
        p = cli.build_parser()
        args = p.parse_args(["convert", "fgb2pmtiles", "x.parquet", "5", "g"])
        assert args.maximum_zoom == "g"

    def test_zoom_invalid(self):
        p = cli.build_parser()
        with pytest.raises(SystemExit):
            p.parse_args(["convert", "fgb2pmtiles", "x.parquet", "5", "zz"])

    @pytest.mark.parametrize("value,ok", [
        ("32768", True), ("122880", True), ("40960", True),
        ("32760", False), ("122888", False), ("40000", False), ("16384", False),
    ])
    def test_memory_validation(self, value, ok):
        # /root/reference/tests/test_ecs.py:39-81 parity
        p = cli.build_parser()
        argv = ["convert", "single-step", "x.parquet", "5", "6", "--submit",
                "--memory", value]
        if ok:
            assert p.parse_args(argv).memory == int(value)
        else:
            with pytest.raises(SystemExit):
                p.parse_args(argv)

    @pytest.mark.parametrize("value,ok", [("20", True), ("200", True), ("19", False), ("201", False)])
    def test_storage_validation(self, value, ok):
        p = cli.build_parser()
        argv = ["convert", "single-step", "x.parquet", "5", "6", "--submit",
                "--storage", value]
        if ok:
            assert p.parse_args(argv).storage == int(value)
        else:
            with pytest.raises(SystemExit):
                p.parse_args(argv)

    def test_memory_requires_submit(self):
        # /root/reference/tests/test_cli.py:87-103 parity
        args = cli.build_parser().parse_args(
            ["convert", "single-step", "x.parquet", "5", "6", "--memory", "32768"]
        )
        with pytest.raises(SystemExit):
            cli.run_convert(args)

    def test_submit_argv_remarshaling(self):
        # /root/reference/tests/test_cli.py:189-275 parity: tc-kwargs
        # re-encoded, suffix re-added, memory dropped
        args = cli.build_parser().parse_args(
            ["convert", "single-step", "f.parquet", "5", "6", "--submit",
             "--memory", "32768", "--suffix", "s",
             "--tc-kwargs", "maximum-zoom=9", "force"]
        )
        argv = cli._submit_argv(args)
        assert argv[:5] == ["convert", "single-step", "f.parquet", "5", "6"]
        assert "--tc-kwargs" in argv and "maximum-zoom=9" in argv and "force=True" in argv
        assert argv[-2:] == ["--suffix", "s"]
        assert "--memory" not in argv

    def test_min_gt_max_exits(self, tmp_path):
        # /root/reference/tests/test_cli.py:169-177 parity
        f = tmp_path / "x.parquet"
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"a": [1]}), f)
        with pytest.raises(SystemExit):
            cli.main(["convert", "fgb2pmtiles", str(f), "9", "5"])

    def test_missing_file_exits(self):
        with pytest.raises(SystemExit):
            cli.main(["convert", "fgb2pmtiles", "/tmp/nope-missing.parquet", "5", "6"])

    def test_unsupported_suffix(self, tmp_path):
        f = tmp_path / "x.shapefile"
        f.write_text("x")
        from cloudtile_ray.sources.readers import load_source

        with pytest.raises(ValueError):
            load_source(str(f))


class TestManage:
    def test_upload_download_md5_skip(self, tmp_path, monkeypatch):
        # moto-free analog of /root/reference/tests/test_s3.py:88-196
        monkeypatch.setattr(cli, "STORE_DIR", str(tmp_path / "store"))
        src = tmp_path / "data.parquet"
        src.write_bytes(b"hello world")
        out1 = cli.manage_upload(str(src))
        assert out1.startswith("uploaded")
        out2 = cli.manage_upload(str(src))
        assert out2.startswith("skipped (identical md5)")  # s3.py:128-132
        src.write_bytes(b"changed bytes")
        assert cli.manage_upload(str(src)).startswith("uploaded")
        (tmp_path / "dl").mkdir()
        monkeypatch.chdir(tmp_path / "dl")
        got = cli.manage_download("data.parquet")
        assert got.startswith("downloaded")
        with pytest.raises(FileNotFoundError):
            cli.manage_download("missing.parquet")

    def test_upload_requires_suffix(self, tmp_path, monkeypatch):
        monkeypatch.setattr(cli, "STORE_DIR", str(tmp_path / "store"))
        f = tmp_path / "nosuffix"
        f.write_text("x")
        with pytest.raises(ValueError):
            cli.manage_upload(str(f))


class TestManifest:
    def _table(self, n):
        return pa.table({"v": pa.array(np.arange(n), pa.int64())})

    def test_resume_skips_verified(self, tmp_path):
        calls = []

        def compute(pid):
            calls.append(pid)
            return self._table(int(pid) + 1)

        w = PartitionedWriter(tmp_path, {"cfg": 1})
        res1 = w.run(["0", "1", "2"], compute)
        assert res1["written"] == ["0", "1", "2"] and res1["total_rows"] == 6
        # resume: nothing recomputed
        w2 = PartitionedWriter(tmp_path, {"cfg": 1})
        calls.clear()
        res2 = w2.run(["0", "1", "2"], compute)
        assert res2["skipped"] == ["0", "1", "2"] and calls == []
        assert res2["total_rows"] == 6

    def test_config_change_invalidates(self, tmp_path):
        w = PartitionedWriter(tmp_path, {"cfg": 1})
        w.run(["0"], lambda pid: self._table(3))
        w3 = PartitionedWriter(tmp_path, {"cfg": 2})
        calls = []
        w3.run(["0"], lambda pid: calls.append(pid) or self._table(3))
        assert calls == ["0"]

    def test_corruption_detected(self, tmp_path):
        w = PartitionedWriter(tmp_path, {"cfg": 1})
        w.run(["0"], lambda pid: self._table(4))
        # corrupt the partition file; manifest hash must catch it
        p = w.partition_path("0")
        p.write_bytes(p.read_bytes() + b"junk")
        w2 = PartitionedWriter(tmp_path, {"cfg": 1})
        assert not w2.is_complete("0")

    def test_manifest_contents(self, tmp_path):
        w = PartitionedWriter(tmp_path, {"a": 1})
        w.run(["7"], lambda pid: self._table(5))
        m = json.loads((tmp_path / "_manifest.json").read_text())
        e = m["7"]
        assert e["n_rows"] == 5
        assert e["config_hash"] == config_hash({"a": 1})
        assert len(e["content_hash"]) == 32

    def test_config_hash_order_insensitive(self):
        assert config_hash({"a": 1, "b": 2}) == config_hash({"b": 2, "a": 1})
