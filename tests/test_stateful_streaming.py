"""applyInPandasWithState sessionization: streaming result must equal the
batch sessionize oracle, and state must carry across micro-batches."""

import os

import pytest
from pyspark.sql import functions as F

from go_distributed_log_search_spark.streaming import stateful

from .conftest import SF0001


def test_stream_equals_batch_sessionize(spark, tmp_path):
    """All files in one availableNow trigger -> identical to the batch
    gap-sessionization (the oracle-backed `sessionize` query shape)."""
    # the file stream source needs a DIRECTORY; stage the single-file
    # fixture into one
    events = str(tmp_path / "events")
    spark.read.parquet(f"{SF0001}/events.parquet").coalesce(2).write.parquet(events)
    stateful.sessionize_stream(
        spark, events, str(tmp_path / "ckpt"), query_name="sess_all"
    )
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in stateful.final_sessions(spark, "sess_all").collect()
    }

    from go_distributed_log_search_spark.queries import q_sessionize

    want = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in q_sessionize(spark, SF0001).collect()
    }
    assert got == want


def test_state_carries_across_triggers(spark, tmp_path):
    """A session spanning two micro-batches must NOT be double-counted:
    the second file's first event is within the gap of the first file's
    last event, so both files together = 2 sessions, not 3."""
    rows1 = [(1, 100, "2024-01-01 00:00:00"), (1, 101, "2024-01-01 00:10:00")]
    rows2 = [(1, 102, "2024-01-01 00:20:00"),  # within 30min of 00:10 -> same session
             (1, 103, "2024-01-01 02:00:00")]  # new session
    src = tmp_path / "events"
    os.makedirs(src)
    for i, rows in enumerate((rows1, rows2)):
        df = spark.createDataFrame(rows, ["user_id", "event_id", "ts_s"]).select(
            "user_id", "event_id", F.col("ts_s").cast("timestamp").alias("ts")
        )
        df.coalesce(1).write.mode("append").parquet(str(src))
    stateful.sessionize_stream(
        spark, str(src), str(tmp_path / "ckpt2"), query_name="sess_two",
        max_files_per_trigger=1,
    )
    # >1 micro-batch actually ran (state was exercised across triggers)
    updates = spark.table("sess_two").count()
    assert updates >= 2
    final = {r.user_id: (r.n_sessions, r.n_events)
             for r in stateful.final_sessions(spark, "sess_two").collect()}
    assert final == {1: (2, 4)}
