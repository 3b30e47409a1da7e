"""Plan-hygiene regression tests.

The north rule bans per-row Python on the hot path and BASELINE.md's plan
audit pins the physical shapes that make the 100 TB plans work (broadcast
dim joins, per-partition top-k heaps, parquet filter pushdown). These
tests freeze those properties so a refactor can't silently regress them:
a query that picks up a BatchEvalPython node or loses its broadcast join
fails here long before it shows up as a 10x wall-time regression in
BENCH_r{N}.json.
"""

import contextlib
import io

import pytest

import __spark_entry__ as entry_mod

from .conftest import SF0001

# Queries whose construction runs Spark jobs eagerly (iterative
# connected-components label propagation) — plan text of the FINAL stage
# only would be audited, at the cost of executing the whole loop. The
# underlying operator's per-iteration plan is already pinned by its unit
# tests, so skip them here.
EAGER_QUERIES = {"dedup_clusters"}

QUERY_NAMES = sorted(set(entry_mod.queries()) - EAGER_QUERIES)


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_rowwise_python_anywhere(spark, name):
    """Scalar (row-at-a-time) Python UDFs are banned on every registered
    query; Python must enter plans only as Arrow-batched evaluation."""
    df = entry_mod.queries()[name](spark, SF0001)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan\n{plan}"
    )


def test_enrich_joins_are_broadcast(spark):
    """Dimension enrichment must be a BroadcastHashJoin (no shuffle of the
    fact side) — BASELINE.md plan audit row 'pipeline_agg_terms'."""
    df = entry_mod.queries()["pipeline_enrich"](spark, SF0001)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_topk_uses_partial_heaps(spark):
    """Top-k must compile to TakeOrderedAndProject (per-partition heaps +
    driver merge), never a global Sort + Limit."""
    df = entry_mod.queries()["search_substring_topk"](spark, SF0001)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_q1_filter_pushed_to_scan(spark):
    """The date predicate must reach the parquet scan (PushedFilters), and
    the scan must be pruned to the referenced columns only."""
    df = entry_mod.queries()["tpch_q1"](spark, SF0001)
    plan = _plan(df)
    assert "PushedFilters: [" in plan, plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200], plan
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_comment" not in read_schema, f"scan not column-pruned\n{plan}"

def test_ivf_assign_runs_once_and_hash_joins(spark):
    """The IVF cell-assign matmul must run exactly once over the corpus:
    Spark's inferred join-key IsNotNull used to substitute through the
    projection and evaluate the assign UDF a second time (fixed with an
    asNondeterministic fence in ivf_topk). Exactly 3 Arrow UDF nodes —
    assign, probe, scorer — and the candidate join stays a hash join."""
    df = entry_mod.queries()["ivf_ann_topk"](spark, SF0001)
    plan = _plan(df)
    tree = plan.split("\n\n")[0]
    assert tree.count("ArrowEvalPython") == 3, tree
    assert "BroadcastHashJoin" in tree, tree
    assert "NestedLoopJoin" not in tree, tree


# (Blob-pruning for the multimodal scan is pinned in test_multimodal.py,
# which writes real parquet so the scan's ReadSchema is observable.)

def test_vocab_oov_membership_is_broadcast_join(spark):
    """Vocabulary membership must be a BroadcastHashJoin on term (O(1)
    hash probe per token), never an array_contains scan over a collected
    literal (O(V) per token — wrong shape at a 50k vocabulary; VERDICT
    r03 task 5)."""
    df = entry_mod.queries()["vocab_oov"](spark, SF0001)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "array_contains" not in plan, plan


def test_cooccurrence_pairs_after_distributed_tf(spark):
    """The per-doc pair fan-out must run AFTER the TF exchange (so it is
    distributed, not confined to the scan task of a few-split input) and
    the final top-20 must be TakeOrderedAndProject, with the capped
    sorted-struct slice (the max_vocab guard) visible in the plan."""
    df = entry_mod.queries()["cooccurrence"](spark, SF0001)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    tree = plan.split("\n\n")[0]
    # generator (pair explode) must sit above at least one Exchange
    gen_pos = tree.find("Generate")
    assert gen_pos != -1, tree
    assert "Exchange" in tree[gen_pos:], f"pair explode not above an exchange\n{tree}"
    assert "slice" in plan, plan  # the top-max_vocab cap


def test_routed_sink_matches_exploded_router(spark):
    """Round-6 optimization pin: the single-sink fast path
    (route.routed_sink — predicate evaluated BEFORE the fan-out, sink tag
    attached as a literal) must stay row-identical to the exploded router
    filtered to that sink, for every registered sink, and its plan must
    not contain the tag-array Generate."""
    from pyspark.sql import functions as F

    from go_distributed_log_search_spark import pipeline
    from go_distributed_log_search_spark.operators import route

    enriched = pipeline.parsed_enriched(spark, SF0001)
    exploded = route.routed(enriched)
    for sink in route.SINKS:
        fast = route.routed_sink(enriched, sink)
        assert fast.columns == exploded.columns
        slow = exploded.filter(F.col("sink") == sink)
        key_cols = ["conv_id", "turn_idx", "sink"]
        a = sorted(map(tuple, fast.select(*key_cols).collect()))
        b = sorted(map(tuple, slow.select(*key_cols).collect()))
        assert a == b, f"sink {sink}: routed_sink != routed+filter"
        assert "Generate" not in _plan(fast), _plan(fast)
