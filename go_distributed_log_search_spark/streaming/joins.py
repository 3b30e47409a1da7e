"""Stream-stream interval join (click→conversion attribution).

The streaming counterpart of operators/asof.py's batch range join: two
live streams joined on a key plus an event-time interval (a conversion
attributes to a click if it lands within the attribution horizon after
it). Spark's stream-stream inner join keeps BOTH sides in join state;
the watermarks + the time-range condition are what let it EVICT state —
a click older than (watermark - horizon) can never match a future
conversion, so its state row is dropped. Without the interval condition
the state grows unboundedly; with it, state size is O(events inside one
horizon window per key) regardless of stream length — the property that
matters when the streams run for months.

Column-name discipline: both sides are aliased and re-projected so the
output schema is static (user_id, click_id, buy_id, click_ts, buy_ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CLICKS_SCHEMA = "user_id long, click_id long, ts timestamp"
BUYS_SCHEMA = "user_id long, buy_id long, ts timestamp"


def _join(clicks: DataFrame, buys: DataFrame, horizon: str) -> DataFrame:
    c, b = clicks.alias("c"), buys.alias("b")
    cond = F.expr(
        "c.user_id = b.user_id AND "
        f"b.ts >= c.ts AND b.ts <= c.ts + interval {horizon}"
    )
    return c.join(b, cond).select(
        F.col("c.user_id").alias("user_id"),
        F.col("c.click_id").alias("click_id"),
        F.col("b.buy_id").alias("buy_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("b.ts").alias("buy_ts"),
    )


def attribution_join_stream(
    spark: SparkSession,
    clicks_path: str,
    buys_path: str,
    checkpoint: str,
    query_name: str,
    watermark: str = "10 minutes",
    horizon: str = "30 minutes",
):
    """availableNow run of the streaming interval join into a memory sink.

    Both sides carry a watermark (required for state eviction on a
    stream-stream join); the inner join emits a match as soon as both
    rows have arrived — no buffering until window close, unlike outer
    stream-stream joins.
    """
    clicks = (
        spark.readStream.schema(CLICKS_SCHEMA).parquet(clicks_path)
        .withWatermark("ts", watermark)
    )
    buys = (
        spark.readStream.schema(BUYS_SCHEMA).parquet(buys_path)
        .withWatermark("ts", watermark)
    )
    q = (
        _join(clicks, buys, horizon)
        .writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q


def attribution_join_stream_to_parquet(
    spark: SparkSession,
    clicks_path: str,
    buys_path: str,
    checkpoint: str,
    out_path: str,
    watermark: str = "10 minutes",
    horizon: str = "30 minutes",
):
    """Same streaming join into a PARQUET sink — the restartable form.

    availableNow drains whatever is currently present, then stops; a
    later call with the SAME checkpoint resumes from the recovered join
    state (buffered unmatched rows included) and appends only NEW
    matches — the exactly-once-across-restarts property the memory-sink
    variant cannot show (memory sinks reset per query).
    """
    clicks = (
        spark.readStream.schema(CLICKS_SCHEMA).parquet(clicks_path)
        .withWatermark("ts", watermark)
    )
    buys = (
        spark.readStream.schema(BUYS_SCHEMA).parquet(buys_path)
        .withWatermark("ts", watermark)
    )
    q = (
        _join(clicks, buys, horizon)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q


def attribution_join_batch(
    clicks: DataFrame, buys: DataFrame, horizon: str = "30 minutes"
) -> DataFrame:
    """Batch twin: identical join condition over static inputs."""
    return _join(clicks, buys, horizon)
