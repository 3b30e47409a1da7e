"""Streaming dedup within a watermark — exactly-once repair for
at-least-once delivery.

The reference's streaming commit protocol is deliberately at-least-once:
the index file is written BEFORE the Kafka checkpoint is saved, so a crash
between the two replays the batch and duplicates documents
(src/commands/index.go:249-277 ordering; SURVEY.md §2.9 ST3). This
operator is the Spark-native repair for exactly that delivery contract:
``dropDuplicatesWithinWatermark`` keeps per-key state only until the
event-time watermark passes, emitting the first occurrence of each key
and dropping replays that arrive within the watermark horizon.

Scale shape: state is one row per distinct key currently inside the
watermark window, sharded by the key's hash shuffle — NOT one row per key
ever seen (a plain streaming ``dropDuplicates`` grows state forever at
10^12 turns; the watermark bound is what makes the operator runnable).
Replays in real log buses (Kafka re-deliveries, crash re-runs) arrive
seconds-to-minutes after the original, so a small watermark covers them;
a replay arriving AFTER the horizon is re-admitted by design — the
trade documented by Structured Streaming, accepted because unbounded
exactness requires unbounded state.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_dir: str,
    query_name: str = "deduped",
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = 1,
) -> Any:
    """First occurrence per key (within the watermark horizon), appended
    exactly once. Returns the finished query; rows in
    ``spark.table(query_name)``."""
    schema = spark.read.parquet(input_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    deduped = (
        stream.withColumn("_ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_ts", watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
        .drop("_ts")
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def dedup_batch(df: DataFrame, key_cols: Sequence[str] = ("event_id",)) -> DataFrame:
    """The batch twin: global first-per-key (no horizon — batch jobs see
    the whole input, so state bounding is the shuffle's problem, not a
    watermark's)."""
    return df.dropDuplicates(list(key_cols))
