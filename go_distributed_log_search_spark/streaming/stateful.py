"""Custom stateful streaming operator — per-user session windows via
``applyInPandasWithState``.

The reference's only stream state is Kafka offsets (SURVEY.md §2.9); this
is the training-pipeline extension for custom state: event-time
sessionization (gap-based windows, the streaming twin of the batch
``sessionize`` query) with per-group state carried across micro-batches.

Shape notes for scale:
- state per key is three scalars (last_sec, n_sessions, n_events) — the
  smallest possible session state; Spark shards it by the groupBy key the
  same way the aggregation shuffle shards rows.
- the update function is pandas-vectorized per group-batch (Arrow
  transfer); no per-row Python in the sense of the north rule (scalar
  Python UDFs) — this IS the sanctioned escape hatch for stateful
  semantics Catalyst cannot express (applyInPandasWithState).
- output mode "update": one row per (group, trigger) — downstream sinks
  upsert by user_id.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_sec long, n_sessions long, n_events long"


def _update_sessions(gap_sec: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        # event-time order within the batch; event_id tiebreak mirrors the
        # batch sessionize window ORDER BY (sec, event_id)
        rows = rows.sort_values(["sec", "event_id"])
        if state.exists:
            last_sec, n_sessions, n_events = state.get
        else:
            last_sec, n_sessions, n_events = None, 0, 0
        secs = rows["sec"].to_numpy()
        if len(secs):
            prev = secs[:-1]
            import numpy as np

            gaps_new = (secs[1:] - prev) > gap_sec
            first_new = last_sec is None or (secs[0] - last_sec) > gap_sec
            n_sessions += int(first_new) + int(np.count_nonzero(gaps_new))
            n_events += len(secs)
            last_sec = int(secs[-1])
        state.update((last_sec, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return update


def sessionize_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_dir: str,
    query_name: str = "sessions",
    gap_sec: int = 1800,
    max_files_per_trigger: int | None = None,
) -> Any:
    """Run gap-based sessionization as a stateful stream over a parquet
    file source (availableNow), emitting update rows into a memory sink.

    Returns the finished StreamingQuery; read results from
    ``spark.table(query_name)`` — the LAST update per user_id is the final
    state (one update row per group per trigger).
    """
    from pyspark.sql import functions as F

    schema = spark.read.parquet(input_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    prepared = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.floor(F.col("ts").cast("timestamp").cast("double")).cast("long").alias("sec"),
    )
    out = prepared.groupBy("user_id").applyInPandasWithState(
        _update_sessions(gap_sec),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def final_sessions(spark: SparkSession, query_name: str = "sessions") -> DataFrame:
    """Final session counts per user from the memory sink's update stream.

    n_sessions/n_events are CUMULATIVE and monotonic per user, so the
    latest update is simply the max — no ordering assumption on the sink
    table needed (ADVICE r02: monotonically_increasing_id over a memory
    sink only reflects trigger order by accident, not by contract).
    """
    from pyspark.sql import functions as F

    return (
        spark.table(query_name)
        .groupBy("user_id")
        .agg(F.max("n_sessions").alias("n_sessions"), F.max("n_events").alias("n_events"))
    )
