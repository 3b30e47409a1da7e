"""Stream-stream interval join: stream == batch twin, horizon semantics,
and bounded state via watermark + interval condition."""

import time

from pyspark.sql import functions as F

from go_distributed_log_search_spark.streaming import joins


def _write(spark, path, schema, rows):
    df = spark.createDataFrame(
        [(u, i, t) for (u, i, t) in rows], ["user_id", "id", "ts_s"]
    ).select(
        F.col("user_id").cast("long"),
        F.col("id").cast("long").alias(schema),
        F.col("ts_s").cast("timestamp").alias("ts"),
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_stream_matches_batch_and_horizon(spark, tmp_path):
    clicks_p = str(tmp_path / "clicks")
    buys_p = str(tmp_path / "buys")
    # user 1: buy 21 inside the 30m horizon of click 11; buy 22 outside.
    # user 2: buy BEFORE the click — never attributed.
    # user 3: one click, two in-horizon buys — both attribute (no dedup).
    _write(spark, clicks_p, "click_id", [
        (1, 11, "2024-01-01 10:00:00"),
        (2, 12, "2024-01-01 10:00:00"),
        (3, 13, "2024-01-01 09:00:00"),
    ])
    _write(spark, buys_p, "buy_id", [
        (1, 21, "2024-01-01 10:20:00"),
        (2, 23, "2024-01-01 09:50:00"),
        (3, 24, "2024-01-01 09:10:00"),
    ])
    time.sleep(1.1)  # second micro-batch, distinct file mod-times
    _write(spark, buys_p, "buy_id", [
        (1, 22, "2024-01-01 10:45:00"),
        (3, 25, "2024-01-01 09:25:00"),
    ])

    q = joins.attribution_join_stream(
        spark, clicks_p, buys_p, str(tmp_path / "ckpt"), "attrib_test"
    )
    got = {(r.user_id, r.click_id, r.buy_id)
           for r in spark.table("attrib_test").collect()}
    assert got == {(1, 11, 21), (3, 13, 24), (3, 13, 25)}

    batch = joins.attribution_join_batch(
        spark.read.parquet(clicks_p), spark.read.parquet(buys_p)
    )
    assert got == {(r.user_id, r.click_id, r.buy_id) for r in batch.collect()}

    # the join ran as a streaming symmetric hash join with watermarked state
    ops = [p for prog in q.recentProgress
           for p in (prog.get("stateOperators") or [])]
    assert any("symmetricHashJoin" in (op.get("operatorName") or "")
               for op in ops), ops


def test_stream_join_restart_resumes_state_exactly_once(spark, tmp_path):
    """A restarted run with the same checkpoint must (a) not re-emit
    matches from the first run, and (b) match a NEW buy against a click
    whose row arrived BEFORE the restart — i.e. buffered join state is
    recovered, not rebuilt from scratch or leaked into duplicates."""
    clicks_p = str(tmp_path / "clicks")
    buys_p = str(tmp_path / "buys")
    out_p = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write(spark, clicks_p, "click_id", [(1, 11, "2024-01-01 10:00:00")])
    _write(spark, buys_p, "buy_id", [(1, 21, "2024-01-01 10:05:00")])
    joins.attribution_join_stream_to_parquet(spark, clicks_p, buys_p, ckpt, out_p)
    first = {(r.user_id, r.click_id, r.buy_id)
             for r in spark.read.parquet(out_p).collect()}
    assert first == {(1, 11, 21)}

    # restart: one new in-horizon buy for the PRE-RESTART click
    _write(spark, buys_p, "buy_id", [(1, 22, "2024-01-01 10:10:00")])
    joins.attribution_join_stream_to_parquet(spark, clicks_p, buys_p, ckpt, out_p)
    got = sorted(
        (r.user_id, r.click_id, r.buy_id)
        for r in spark.read.parquet(out_p).collect()
    )
    # (1,11,21) exactly once (no replay), (1,11,22) from recovered state
    assert got == [(1, 11, 21), (1, 11, 22)]
