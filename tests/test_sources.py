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


# ---------------------------------------------------------------- S3 mock
# The spark-sql-kafka connector jar is absent in this sandbox AND Spark
# reserves the name "kafka" in lookupDataSource (registerPython refuses
# to shadow it), so the mock registers under "mockkafka" and the test
# monkeypatches jsonl.KAFKA_FORMAT — every other line of the REAL
# read_kafka/connect_to_source path runs end to end: URL parse, option
# wiring, load(), the value/partition/offset projection and from_json
# decode, against a broker-less Python data source (Spark 4 DataSource
# API) that validates the exact options the reference's kafka source
# derives from the URL (kafka_source.go:27-55, :306-324). VERDICT r03
# task 6.

def _register_mock_kafka(spark, monkeypatch, expect_servers, expect_topic,
                         expect_start):
    from pyspark.sql.datasource import DataSource, DataSourceReader

    monkeypatch.setattr(jsonl, "KAFKA_FORMAT", "mockkafka")

    rows = [
        (None, b'{"a": 10, "b": "k0"}', expect_topic, 0, 0),
        (None, b'{"a": 11, "b": "k1"}', expect_topic, 0, 1),
        (None, b'{"a": 12, "b": "k2"}', expect_topic, 1, 0),
    ]

    class _Reader(DataSourceReader):
        def read(self, partition):
            return iter(rows)

    class MockKafka(DataSource):
        @classmethod
        def name(cls):
            return "mockkafka"

        def schema(self):
            # the real connector's fixed output schema (column subset)
            return ("key binary, value binary, topic string, "
                    "partition int, offset bigint")

        def reader(self, schema):
            # options arrive case-insensitively lowered by Spark
            opts = {k.lower(): v for k, v in self.options.items()}
            assert opts["kafka.bootstrap.servers"] == expect_servers, opts
            assert opts["subscribe"] == expect_topic, opts
            assert opts["startingoffsets"] == expect_start, opts
            return _Reader()

    spark.dataSource.register(MockKafka)
    return rows


def test_kafka_batch_datapath_via_python_source(spark, monkeypatch):
    """connect_to_source("kafka://...") end to end against the mock:
    the projection must decode value-JSON through the user schema and
    keep (partition, offset) — the same output contract the JSONL path
    has, per sources/mod.go:52-67 dispatch parity."""
    _register_mock_kafka(spark, monkeypatch, "b1:9092,b2:9092", "logs", "earliest")
    df = jsonl.connect_to_source(
        spark, "kafka://b1:9092,b2:9092/logs", SCHEMA, stream=False
    )
    assert df.columns == ["a", "b", "partition", "offset"]
    got = sorted((r.a, r.b, r.partition, r.offset) for r in df.collect())
    assert got == [(10, "k0", 0, 0), (11, "k1", 0, 1), (12, "k2", 1, 0)]


def test_kafka_stream_plan_contract(spark, monkeypatch):
    """readStream.format("kafka") builds the full streaming plan tree
    (unstarted) with the URL-derived options: df.isStreaming, the user
    schema projected, startingOffsets=latest for streams."""
    _register_mock_kafka(spark, monkeypatch, "broker:9092", "t1", "latest")
    df = jsonl.connect_to_source(spark, "kafka://broker:9092/t1", SCHEMA, stream=True)
    assert df.isStreaming
    assert df.columns == ["a", "b", "partition", "offset"]
    plan = df._jdf.queryExecution().logical().toString()
    assert "mockkafka" in plan.lower()
