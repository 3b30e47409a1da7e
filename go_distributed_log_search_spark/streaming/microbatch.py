"""Micro-batch ingest loop — the reference ``index`` command's streaming
semantics (ST1-ST6) restated for Spark batch jobs over a partitioned input.

Reference semantics preserved (/root/reference/src):
- ST1 tumbling batches: commands/index.go:106-125 — each loop iteration
  commits one batch. Here a batch = a slice of input partitions.
- ST3 commit-then-checkpoint ordering: index.go:258-274 — the sink write
  and lineage row land BEFORE the checkpoint upsert, so a crash between
  them re-processes the batch (at-least-once). Our batch_id-partitioned
  sinks make the re-run idempotent (dynamic partition overwrite), which is
  strictly stronger than the reference (duplicates possible there).
- ST4 checkpoint load / resume: kafka_source.go:403-417 — partitions with
  a stored watermark are skipped via an anti-join of the partition list
  against the checkpoint table.
- ST5 abandoned batches: a partial batch whose checkpoint never committed
  is simply re-run under the same batch_id (index.go:185-190 analog).
- ST6 EOF: the loop ends when no unprocessed partitions remain.

The input is 'partitioned' by a deterministic part_id (hash of conv_id, a
stand-in for Kafka partitions / Iceberg file splits); watermark = max
turn-count seen, stored +1-style as 'next' (kafka_source.go:252-256).

In production with a live Kafka feed the same pipeline body runs under
``spark.readStream.format("kafka") ... .writeStream.foreachBatch(...)``
with trigger(processingTime="30 seconds") — see streaming/structured.py.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import aggregate, enrich, parse, route
from ..sources.catalog import Warehouse

SOURCE_ID = "transcripts"


def with_part_id(df: DataFrame, n_parts: int) -> DataFrame:
    return df.withColumn("part_id", F.pmod(F.hash("conv_id"), F.lit(n_parts)).cast("int"))


def pending_partitions(
    wh: Warehouse, all_parts: list[int], source_id: str = SOURCE_ID
) -> list[int]:
    """ST4: anti-join the partition list against stored checkpoints."""
    cp = wh.load_checkpoints(source_id)
    done = {r.part_id for r in cp.collect()}
    return [p for p in all_parts if p not in done]


def run_microbatch_ingest(
    spark: SparkSession,
    transcripts: DataFrame,
    wh: Warehouse,
    n_parts: int = 8,
    parts_per_batch: int = 4,
    source_id: str = SOURCE_ID,
    fail_after_batches: int | None = None,
) -> list[str]:
    """Drive the full parse->enrich->route->aggregate flow in micro-batches.

    ``fail_after_batches`` simulates a crash for resume tests (raises after
    N committed batches, BEFORE processing the rest).
    Returns the committed batch_ids.
    """
    tagged_input = with_part_id(transcripts, n_parts)
    todo = pending_partitions(wh, list(range(n_parts)), source_id)
    committed: list[str] = []
    batch_no = 0
    while todo:
        if fail_after_batches is not None and batch_no >= fail_after_batches:
            raise RuntimeError("simulated crash before batch %d" % batch_no)
        batch_parts = todo[:parts_per_batch]
        todo = todo[parts_per_batch:]
        # deterministic batch_id so a re-run after crash reuses the same
        # sink partition (idempotency); reference uses a fresh UUID
        # (index.go:87) because its duplicates are tolerated
        batch_id = f"{source_id}-p{min(batch_parts)}-{max(batch_parts)}"
        batch = tagged_input.filter(F.col("part_id").isin([int(p) for p in batch_parts]))

        enriched = enrich.enrich_turns(parse.parse_turns(batch), spark)
        routed = route.routed(enriched).persist()
        try:
            # 1. sink appends (S5 commit)
            counts: dict[str, int] = {}
            for sink in route.SINKS:
                sink_df = routed.filter(F.col("sink") == sink).drop("sink")
                counts[sink] = wh.append_batch(sink_df, f"sink_{sink}", batch_id)
            # aggregate table rides the same batch cycle. hot_keys=None: a
            # micro-batch is a bounded slice — partial agg absorbs its skew;
            # per-batch sample-based detection would add two jobs per batch
            # for nothing (callers with known hot keys pass them through).
            aggs = aggregate.term_counts(routed, hot_keys=None)
            wh.append_batch(aggs, "agg_terms", batch_id)
            counts["agg_terms"] = -1
            # 2. lineage rows AFTER all data commits (A2, mod.go:362-365);
            # one append for the whole batch
            wh.record_lineage_many(batch_id, counts)
        finally:
            routed.unpersist()
        # 3. checkpoint LAST (ST3 ordering, index.go:258-274)
        seen = {
            r.part_id: r.w
            for r in batch.groupBy("part_id").agg((F.max("turn_idx") + 1).alias("w")).collect()
        }
        # empty partitions checkpoint at watermark 0 — they are processed,
        # just dataless (ST4: a partition without data still advances)
        wh.save_checkpoint(
            source_id, [(p, seen.get(p, 0)) for p in batch_parts], batch_id
        )
        committed.append(batch_id)
        batch_no += 1
    return committed


def uuid_batch_id() -> str:
    """Reference-parity batch id (index.go:87) for non-resumable one-shots."""
    return str(uuid.uuid4())
