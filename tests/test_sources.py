"""S1/S4 sources: JSONL scan with blank-line skip + corrupt quarantine,
and the source dispatch rules (sources/mod.go:52-67)."""

import pytest
from pyspark.sql import types as T

from go_distributed_log_search_spark.sources import jsonl

SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def path(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "in.jsonl"
    p.write_text(
        '{"a": 1, "b": "x"}\n'
        "\n"                      # blank: skipped (buf_source.go:56-58)
        '{"a": 2, "b": "y"}\n'
        '{broken json\n'          # corrupt: quarantined, not fatal
        '{"a": 3}\n'              # missing field -> null, NOT corrupt
    )
    return str(p)


def test_read_jsonl_quarantines_corrupt(spark, path):
    rows = jsonl.read_jsonl(spark, path, SCHEMA, keep_corrupt=True).collect()
    assert len(rows) == 4
    corrupt = [r for r in rows if r._corrupt]
    assert len(corrupt) == 1
    # a parseable row with a missing field is NOT corrupt (PERMISSIVE null)
    assert sorted(r.a for r in rows if not r._corrupt and r.a is not None) == [1, 2, 3]


def test_read_jsonl_drop_corrupt(spark, path):
    df = jsonl.read_jsonl(spark, path, SCHEMA, keep_corrupt=False)
    assert df.count() == 3
    assert "_corrupt" not in df.columns


def test_dispatch_rejects_stream_for_files(spark, path):
    with pytest.raises(ValueError, match="--stream"):
        jsonl.connect_to_source(spark, path, SCHEMA, stream=True)


def test_dispatch_file_path(spark, path):
    assert jsonl.connect_to_source(spark, path, SCHEMA).count() == 4


def test_kafka_url_validation(spark):
    with pytest.raises(ValueError, match="kafka url"):
        jsonl.read_kafka(spark, "kafka://hostonly", SCHEMA, stream=False)


def test_kafka_option_contract():
    """S3 shape-level contract (VERDICT r02 task 7): the exact options a
    readStream/read.format('kafka') is constructed with — verifiable
    without a broker or the connector jar."""
    assert jsonl.kafka_options("kafka://broker1:9092/logs", stream=True) == {
        "kafka.bootstrap.servers": "broker1:9092",
        "subscribe": "logs",
        "startingOffsets": "latest",
    }
    # batch mode reads from earliest (kafka_source.go:306-310 parity)
    assert (
        jsonl.kafka_options("kafka://b1:9092,b2:9092/t", stream=False)["startingOffsets"]
        == "earliest"
    )
    assert jsonl.kafka_options("kafka://b1:9092,b2:9092/t", stream=False)[
        "kafka.bootstrap.servers"
    ] == "b1:9092,b2:9092"
    with pytest.raises(ValueError, match="kafka url"):
        jsonl.kafka_options("kafka:///topic-no-host", stream=True)


def test_read_stdin(spark, monkeypatch):
    import io

    monkeypatch.setattr(
        "sys.stdin", io.StringIO('{"a": 7, "b": "s"}\n\n{"a": 8, "b": "t"}\n')
    )
    rows = jsonl.read_stdin(spark, SCHEMA).collect()
    assert sorted(r.a for r in rows) == [7, 8]
