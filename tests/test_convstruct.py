"""Semantics pins for the round-4 session-3 operators: prefix_sharing,
tool_loop_detect (operators/convstruct.py), crossdoc_dup_spans
(operators/dedup.py), embedding_dim_stats (operators/similarity.py).

Handcrafted inputs with hand-computed expectations — the DuckDB oracle
(tests/test_entry_oracle.py + the driver gate) covers corpus-scale parity;
these pin the kernels on edge shapes the corpus may not hit (run-boundary
min_run, overlapping-island merge, single-member prefixes).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from go_distributed_log_search_spark.operators import convstruct, dedup, similarity


def test_prefix_sharing_shared_opening(spark):
    # convs a,b share turns 0-1 verbatim, diverge at turn 2; conv c is
    # unique from turn 0. Depth 1: fp(a)=fp(b) -> max_share 2 of 3.
    rows = []
    for conv, t2 in (("a", "alpha"), ("b", "beta"), ("c", "gamma")):
        opening = ["sys prompt", "hi there"] if conv != "c" else ["other", "hey"]
        for i, txt in enumerate(opening + [t2]):
            rows.append((conv, i, txt))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        r["depth"]: (r["n_convs"], r["n_prefixes"], r["max_share"], r["share_frac"])
        for r in convstruct.prefix_sharing(df, max_depth=4).collect()
    }
    assert got[1] == (3, 2, 2, 0.6667)
    assert got[2] == (3, 2, 2, 0.6667)
    assert got[3] == (3, 3, 1, 0.3333)
    assert 4 not in got  # no conversation reaches depth 4


def test_tool_loop_detect_runs_and_interleaves(spark):
    # conv x: bash at tool-sequence positions 0,1,2 (turn_idx 0,2,5 — user
    # turns interleave without breaking the run), then calc, then bash
    # again (run of 1). conv y: calc twice (below min_run=3).
    rows = [
        ("x", 0, "bash"), ("x", 1, None), ("x", 2, "bash"), ("x", 5, "bash"),
        ("x", 6, "calc"), ("x", 7, "bash"),
        ("y", 0, "calc"), ("y", 1, "calc"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string")
    got = {r["tool"]: r.asDict() for r in convstruct.tool_loop_detect(df, min_run=3).collect()}
    assert set(got) == {"bash"}
    assert got["bash"]["n_loops"] == 1
    assert got["bash"]["max_run"] == 3
    assert got["bash"]["n_convs"] == 1
    assert got["bash"]["n_loop_turns"] == 3
    # min_run=2 admits conv y's calc pair
    got2 = {r["tool"]: r.asDict() for r in convstruct.tool_loop_detect(df, min_run=2).collect()}
    assert got2["calc"]["n_loops"] == 1 and got2["calc"]["n_convs"] == 1


def test_crossdoc_spans_island_merge(spark):
    # docs d1/d2 share tokens 1..10 (10 tokens => three 8-gram shingles at
    # pos 1,2,3 in d1 — overlapping, must merge to ONE island covering
    # 3 + 8 - 1 = 10 tokens). d1 has 2 extra unique tokens; d3 disjoint.
    shared = " ".join(f"tok{i}" for i in range(10))
    rows = [
        ("d1", shared + " uniq1 uniq2", "s1"),
        ("d2", shared, "s1"),
        ("d3", " ".join(f"other{i}" for i in range(12)), "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, source string")
    got = {r["source"]: r.asDict() for r in dedup.crossdoc_dup_spans(df, n=8).collect()}
    assert got["s1"]["n_docs"] == 2 and got["s1"]["n_dup_docs"] == 2
    assert got["s1"]["n_tokens"] == 22
    assert got["s1"]["dup_tokens"] == 20  # 10 covered tokens per doc
    assert got["s1"]["dup_frac"] == round(20 / 22, 4)
    assert got["s2"]["n_dup_docs"] == 0 and got["s2"]["dup_tokens"] == 0
    assert got["s2"]["dup_frac"] == 0.0


def test_crossdoc_spans_two_islands(spark):
    # shared runs at both ends, unique middle gap > shingle width =>
    # two separate islands per doc: 8 + 8 = 16 covered of 26.
    head = " ".join(f"h{i}" for i in range(8))
    tail = " ".join(f"t{i}" for i in range(8))
    rows = [
        ("a", f"{head} ax0 ax1 ax2 ax3 ax4 ax5 ax6 ax7 ax8 ax9 {tail}", "s"),
        ("b", f"{head} bx0 bx1 bx2 bx3 bx4 bx5 bx6 bx7 bx8 bx9 {tail}", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, source string")
    row = dedup.crossdoc_dup_spans(df, n=8).collect()[0]
    assert row["dup_tokens"] == 32  # 16 per doc
    assert row["n_tokens"] == 52


def test_embedding_dim_stats_values_and_plan(spark):
    # label 0: unit vectors along +x and +y -> centroid (0.5, 0.5),
    # centroid_norm = sqrt(0.5), avg_cos = dot(v, c)/|c| = 0.5/sqrt(0.5).
    rows = [
        (0, [1.0, 0.0]), (0, [0.0, 1.0]),
        (1, [3.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    out = similarity.embedding_dim_stats(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # centroids re-enter broadcast
    got = {r["label"]: r.asDict() for r in out.collect()}
    c = math.sqrt(0.5)
    assert got[0]["n_vecs"] == 2
    assert got[0]["avg_norm"] == 1.0
    assert got[0]["centroid_norm"] == round(c, 4)
    assert got[0]["anisotropy"] == round(c, 4)
    assert got[0]["avg_cos_centroid"] == round(0.5 / c, 4)
    assert got[1]["n_vecs"] == 1 and got[1]["avg_norm"] == 5.0
    assert got[1]["avg_cos_centroid"] == 1.0  # singleton: cos to itself
