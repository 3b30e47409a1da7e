"""CLI command surface: create -> index -> search -> merge -> drop over a
temp warehouse, mirroring the reference Quick Demo (README.md:56-66)."""

import glob
import json

import pytest

from go_distributed_log_search_spark import cli, demo


@pytest.fixture(scope="module")
def wh_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("warehouse"))


def run(spark, wh_dir, *argv):
    return cli.main(["--warehouse", wh_dir, *argv], spark=spark)


def test_create(spark, wh_dir):
    assert run(spark, wh_dir, "create", demo.FIXTURE_YAML) == 0
    assert glob.glob(f"{wh_dir}/hdfs-logs.config.yaml")


def test_index(spark, wh_dir, capsys):
    assert run(spark, wh_dir, "index", "hdfs-logs", demo.FIXTURE_JSONL) == 0
    out = capsys.readouterr().out
    assert "indexed 13 docs" in out
    assert "1 corrupt quarantined" in out


def test_search_quick_demo(spark, wh_dir, capsys):
    assert run(spark, wh_dir, "search", "hdfs-logs", "INFO", "--limit", "3") == 0
    out = capsys.readouterr().out
    # parse the concatenated pretty-JSON stream
    raw = out.strip()
    objs, depth, start = [], 0, 0
    for i, ch in enumerate(raw):
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                objs.append(json.loads(raw[start : i + 1]))
    assert len(objs) == 3
    # top hit: severity +8 plus _dynamic 'zone-info-a' +3, re-expanded (P9)
    assert objs[0]["tenant_id"] == 61
    assert objs[0]["region_note"] == "zone-info-a"  # _dynamic merged to root
    assert objs[0]["score"] == 11.0
    # CLI ties break on every non-dynamic column in order: among the
    # score-8 INFO rows, tenant 71's body ("Datanode...") sorts before the
    # "src: ..." bodies
    assert [o["tenant_id"] for o in objs] == [61, 67, 71]


def test_search_default_limit_is_one(spark, wh_dir, capsys):
    assert run(spark, wh_dir, "search", "hdfs-logs", "INFO") == 0
    out = capsys.readouterr().out
    assert out.count('"tenant_id"') == 1


def test_merge(spark, wh_dir, capsys):
    assert run(spark, wh_dir, "merge", "hdfs-logs", "--target-partitions", "2") == 0
    # data survives compaction
    assert run(spark, wh_dir, "search", "hdfs-logs", "INFO", "--limit", "3") == 0
    out = capsys.readouterr().out
    assert out.count('"tenant_id"') == 3


def test_drop(spark, wh_dir):
    assert run(spark, wh_dir, "drop", "hdfs-logs") == 0
    assert not glob.glob(f"{wh_dir}/hdfs-logs*")


def test_index_unknown_name_errors(spark, wh_dir):
    with pytest.raises(SystemExit, match="does not exist"):
        run(spark, wh_dir, "index", "nope", demo.FIXTURE_JSONL)
