"""ST1-ST6 micro-batch semantics: cold run == crash+resume run, lineage
counts match route counts, structured-streaming path commits the same data.
"""

import pytest
from pyspark.sql import functions as F

from go_distributed_log_search_spark.operators import route
from go_distributed_log_search_spark.sources.catalog import Warehouse
from go_distributed_log_search_spark.streaming import microbatch, structured
from go_distributed_log_search_spark.transcripts import transcripts_df

from .conftest import SF0001


@pytest.fixture()
def transcripts(spark):
    return transcripts_df(spark, SF0001)


def _sink_state(wh):
    out = {}
    for sink in route.SINKS:
        df = wh.read(f"sink_{sink}")
        out[sink] = sorted(
            (r.conv_id, r.turn_idx, r.text) for r in df.select("conv_id", "turn_idx", "text").collect()
        )
    return out


def test_cold_run_commits_everything(spark, transcripts, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    batches = microbatch.run_microbatch_ingest(spark, transcripts, wh, n_parts=8, parts_per_batch=4)
    assert len(batches) == 2
    # lineage counts == direct route counts (A2 parity)
    direct = {r.sink: r.n_rows for r in route.route_counts(
        __import__("go_distributed_log_search_spark.pipeline", fromlist=["pipeline"]).parsed_enriched(spark, SF0001)
    ).collect()}
    lineage = (
        wh.lineage().filter(F.col("sink") != "agg_terms")
        .groupBy("sink").agg(F.sum("row_count").alias("n")).collect()
    )
    assert {r.sink: r.n for r in lineage} == direct
    # nothing pending after a full run (ST6)
    assert microbatch.pending_partitions(wh, list(range(8))) == []


def test_crash_resume_equals_cold_run(spark, transcripts, tmp_path):
    cold = Warehouse(spark, str(tmp_path / "cold"))
    microbatch.run_microbatch_ingest(spark, transcripts, cold, n_parts=4, parts_per_batch=1)

    crashed = Warehouse(spark, str(tmp_path / "crashed"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        microbatch.run_microbatch_ingest(
            spark, transcripts, crashed, n_parts=4, parts_per_batch=1, fail_after_batches=2
        )
    # resume: checkpoints skip the two committed batches
    pending_before = microbatch.pending_partitions(crashed, list(range(4)))
    assert len(pending_before) == 2
    microbatch.run_microbatch_ingest(spark, transcripts, crashed, n_parts=4, parts_per_batch=1)

    assert _sink_state(cold) == _sink_state(crashed)


def test_rerun_batch_is_idempotent(spark, transcripts, tmp_path):
    """ST5: re-running an already-committed batch_id replaces, not
    duplicates (dynamic partition overwrite)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    microbatch.run_microbatch_ingest(spark, transcripts, wh, n_parts=4, parts_per_batch=4)
    before = _sink_state(wh)
    # wipe checkpoints to force the loop to re-process everything
    wh.drop("checkpoints")
    microbatch.run_microbatch_ingest(spark, transcripts, wh, n_parts=4, parts_per_batch=4)
    assert _sink_state(wh) == before


def test_compact_preserves_data(spark, transcripts, tmp_path):
    """U1 merge analog: compaction rewrites files, data identical
    (merge.go:24-85; doc identity preserved unlike the reference's
    renumbering, merge.go:145)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    microbatch.run_microbatch_ingest(spark, transcripts, wh, n_parts=4, parts_per_batch=2)
    before = _sink_state(wh)
    wh.compact("sink_errors", target_partitions=2)
    assert _sink_state(wh) == before


def test_schema_evolution_additive_column(spark, tmp_path):
    """A later batch adds a column (ingest schema evolved): reads must
    union the schemas (old rows NULL for the new column), and compaction
    must NOT drop the late column when it rewrites — the additive half of
    Iceberg schema evolution on the parquet stand-in."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append_batch(
        spark.createDataFrame([("c1", 1)], "conv_id string, n int"), "t", "b0"
    )
    wh.append_batch(
        spark.createDataFrame(
            [("c2", 2, "eu")], "conv_id string, n int, region string"
        ),
        "t",
        "b1",
    )
    got = {(r.conv_id, r.n, r.region) for r in wh.read("t").collect()}
    assert got == {("c1", 1, None), ("c2", 2, "eu")}
    wh.compact("t", target_partitions=1)
    assert {(r.conv_id, r.n, r.region) for r in wh.read("t").collect()} == got


def test_time_travel_and_incremental_read(spark, transcripts, tmp_path):
    """Snapshot read reconstructs the table as of each commit; incremental
    read returns exactly the rows a commit range appended; both prune on
    the batch_id partition (no later-commit files scanned)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    committed = microbatch.run_microbatch_ingest(
        spark, transcripts, wh, n_parts=4, parts_per_batch=2
    )
    assert len(committed) == 2
    assert wh.commit_order() == committed
    b0, b1 = committed

    full = wh.read("sink_errors")
    snap0 = wh.read_as_of("sink_errors", b0)
    snap1 = wh.read_as_of("sink_errors", b1)
    assert snap0.count() == full.filter(F.col("batch_id") == b0).count()
    assert snap1.count() == full.count()

    inc = wh.read_between("sink_errors", after=b0, until=b1)
    assert inc.count() == full.filter(F.col("batch_id") == b1).count()
    assert wh.read_between("sink_errors", after=b1, until=b1).count() == 0
    assert wh.read_between("sink_errors", None, b1).count() == full.count()

    # the snapshot filter must reach the partition listing, not scan+filter
    plan = snap0._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [batch_id" in plan.replace("#", " #").replace(
        "batch_id #", "batch_id#"
    ) or "batch_id" in plan.split("PartitionFilters")[1][:120], plan

    with pytest.raises(ValueError):
        wh.read_as_of("sink_errors", "nonexistent-commit")


def test_drop(spark, transcripts, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    microbatch.run_microbatch_ingest(spark, transcripts, wh, n_parts=4, parts_per_batch=4)
    wh.drop("sink_errors")
    assert not wh.exists("sink_errors")


def test_structured_streaming_matches_batch(spark, transcripts, tmp_path):
    """The Structured Streaming path (file source, availableNow) commits
    the same per-sink row sets as the batch router."""
    inp = str(tmp_path / "input")
    transcripts.repartition(3).write.parquet(inp)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    n = structured.stream_ingest_available_now(
        spark, inp, wh, str(tmp_path / "ckpt")
    )
    assert n >= 3  # one micro-batch per file
    streamed = _sink_state(wh)
    direct = route.routed(
        __import__("go_distributed_log_search_spark.pipeline", fromlist=["pipeline"]).parsed_enriched(spark, SF0001)
    )
    for sink in route.SINKS:
        rows = sorted(
            (r.conv_id, r.turn_idx, r.text)
            for r in direct.filter(F.col("sink") == sink).select("conv_id", "turn_idx", "text").collect()
        )
        assert streamed[sink] == rows, sink
