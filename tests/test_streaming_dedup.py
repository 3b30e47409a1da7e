"""Streaming dedup-within-watermark: replayed keys inside the horizon are
dropped across micro-batches; output matches the batch twin."""

import time

from pyspark.sql import functions as F

from go_distributed_log_search_spark.streaming import dedup as sdedup


def _write(spark, path, rows):
    df = spark.createDataFrame(rows, ["event_id", "payload", "ts_s"]).select(
        "event_id", "payload", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_replays_within_watermark_dropped(spark, tmp_path):
    src = str(tmp_path / "turns")
    # batch 0: three originals
    _write(spark, src, [
        (1, "a", "2024-01-01 10:00:00"),
        (2, "b", "2024-01-01 10:00:10"),
        (3, "c", "2024-01-01 10:00:20"),
    ])
    time.sleep(1.1)  # file source orders batches by mod time
    # batch 1: a crash-replay of keys 1 and 2 (same event_id, minutes
    # later but inside the 10-minute horizon) plus one new key
    _write(spark, src, [
        (1, "a", "2024-01-01 10:02:00"),
        (2, "b", "2024-01-01 10:02:10"),
        (4, "d", "2024-01-01 10:03:00"),
    ])
    sdedup.dedup_stream(
        spark, src, str(tmp_path / "ckpt"), query_name="dedup_test",
        key_cols=("event_id",), watermark="10 minutes",
    )
    out = spark.table("dedup_test").collect()
    assert sorted(r.event_id for r in out) == [1, 2, 3, 4]
    # first occurrence wins: replayed keys carry the original timestamps
    by_key = {r.event_id: r for r in out}
    assert str(by_key[1].ts) == "2024-01-01 10:00:00"
    assert str(by_key[2].ts) == "2024-01-01 10:00:10"


def test_stream_matches_batch_twin(spark, tmp_path):
    src = str(tmp_path / "turns2")
    rows = [(i % 5, f"p{i % 5}", f"2024-01-01 10:00:{i:02d}") for i in range(15)]
    _write(spark, src, rows)
    sdedup.dedup_stream(
        spark, src, str(tmp_path / "ckpt2"), query_name="dedup_twin",
        key_cols=("event_id",), watermark="10 minutes",
    )
    stream_keys = sorted(r.event_id for r in spark.table("dedup_twin").collect())
    batch_keys = sorted(
        r.event_id
        for r in sdedup.dedup_batch(
            spark.read.parquet(src), key_cols=("event_id",)
        ).collect()
    )
    assert stream_keys == batch_keys == [0, 1, 2, 3, 4]
