#!/usr/bin/env python
"""Benchmark harness — headline queries + N->4N scaling probe.

Prints ONE JSON line:
  {"metric": "turns_parsed_routed_per_sec", "value": <throughput at
   local[$SPARK_GRAFT_CPUS]>, "unit": "rows/sec", "queries": {name: sec},
   "sf": <sf>, "scaling": {"t_local8": s, "t_local32": s,
   "throughput_local8": r/s, "throughput_local32": r/s, "efficiency": e}}

The scaling probe runs the SAME pipeline job (parse -> enrich -> route ->
salted aggregate over a x{SCALE_MULT} replicated transcripts input) at
local[8] and local[32] in separate SparkSessions — the sandbox stand-in for
N vs 4N executors (BASELINE.md). efficiency = (t8 / t32) / 4.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SCALE_MULT (default 8),
SPARK_GRAFT_SKIP_SCALING=1 to skip the probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 32x replication (3.2M turns) makes the scaling job compute-bound enough
# that per-stage fixed overhead (~1-2s) doesn't cap local[32] speedup
SCALE_MULT = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "32"))

# headline subset: one per operator family (full coverage runs in tests).
# per-plan codegen+JIT warm-up in this sandbox is ~5-60s; each query is
# warmed once and the steady-state run is what's timed.
BENCH_QUERIES = [
    "pipeline_parse",
    "pipeline_route_counts",
    "pipeline_agg_terms",
    "search_substring_topk",
    "dedup_exact",
    "knn_bruteforce",
    "tpch_q1",
    "sessionize",
]


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _pipeline_job(spark, sf_dir: str, mult: int):
    """The scaling workload: parse -> enrich -> route -> salted agg over a
    mult-replicated transcripts input. Returns (n_input_rows, run_fn)."""
    from pyspark.sql import functions as F

    from go_distributed_log_search_spark.operators import aggregate, enrich, parse, route
    from go_distributed_log_search_spark.transcripts import transcripts_df

    cpus = spark.sparkContext.defaultParallelism
    from go_distributed_log_search_spark.transcripts import transcripts_scaled_df

    # replication is materialized on disk (transcripts_scaled_df): every
    # mult and every session runs the IDENTICAL plan -> identical generated
    # classes -> the JVM-global codegen cache + JIT state carry across the
    # local[8]/local[32] probe sessions (PySpark reuses one JVM).
    del cpus
    # Parallelism comes from file splits (the caches are written as 64
    # size-balanced files and session.py sizes maxPartitionBytes so every
    # file is its own split). Round 1 used a round-robin repartition(2*cpus)
    # here instead — that was a measured disaster: RoundRobinPartitioning
    # local-sorts every row by ALL columns (spark.sql.execution.
    # sortBeforeRepartition, on by default for determinism) and shuffles the
    # full text column the scan had already split evenly.
    base = transcripts_scaled_df(spark, sf_dir, mult)

    # build the plan ONCE — each run() re-executes the same physical plan
    # and generated code (rebuilding per run churns the JVM code cache).
    # Hot keys are detected from the compact base (one tiny sample job).
    hot = aggregate.detect_hot_keys(base, "conv_id")
    enriched = enrich.enrich_turns(parse.parse_turns(base), spark)
    tagged = route.routed(enriched)
    # num_partitions pinned so the physical plan is IDENTICAL at every
    # parallelism level (a real N vs 4N cluster comparison holds
    # shuffle.partitions constant too); 64 bounds per-task agg state
    aggs = aggregate.term_counts(tagged, hot_keys=hot, num_partitions=64)

    def run():
        return aggs.count()

    n_rows_df = base.count()
    return n_rows_df, run


def _timed_session(cpus: int, mult: int) -> tuple[float, int]:
    """Steady-state pipeline time at local[cpus].

    PySpark reuses one JVM across SparkContexts, and Spark's codegen cache
    is JVM-global — so generated classes JIT-compiled in an earlier session
    stay hot here. Protocol: stabilizer runs until the time stops dropping
    (max 4), then the measurement = min of 2 runs (the sandbox shows
    occasional multi-x outliers from JIT/code-cache churn and noisy
    neighbors; min-of-n measures capacity, not luck).
    """
    from go_distributed_log_search_spark.session import get_spark

    # shuffle.partitions pinned to 64 at EVERY parallelism level: scaling
    # runs must execute the identical plan, differing only in cores
    spark = get_spark(f"bench-scale-{cpus}", cpus=cpus, shuffle_partitions=64)
    try:
        n_rows, run = _pipeline_job(spark, SF_DIR, mult)
        prev = float("inf")
        for _ in range(4):  # stabilize: stop once improvement < 15%
            t0 = time.time()
            run()
            dt = time.time() - t0
            _log(f"bench: local[{cpus}] stabilizer {dt:.1f}s")
            if dt > prev * 0.85:
                break
            prev = dt
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        return best, n_rows
    finally:
        spark.stop()


def main() -> None:
    from go_distributed_log_search_spark.oracles import build_oracles
    from go_distributed_log_search_spark.queries import SPARK_QUERIES
    from go_distributed_log_search_spark.session import get_spark
    from go_distributed_log_search_spark.transcripts import transcripts_df

    sf = float(os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "") or 0)

    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)
    # materialize the transcripts inputs outside timed regions (in
    # production they are pre-existing Iceberg tables); the scaled copy is
    # built here on the full-width session, not inside the probe
    n_turns = transcripts_df(spark, SF_DIR).count()
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        from go_distributed_log_search_spark.transcripts import transcripts_scaled_df

        transcripts_scaled_df(spark, SF_DIR, SCALE_MULT).count()

    per_query: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = SPARK_QUERIES[name]
        df = fn(spark, SF_DIR)
        df.count()  # warm-up run (codegen + JIT, excluded)
        t0 = time.time()
        df.count()
        per_query[name] = round(time.time() - t0, 3)
        _log(f"bench: {name} {per_query[name]}s")

    # headline: one pass of the full pipeline at local[CPUS], min of 2
    _, run = _pipeline_job(spark, SF_DIR, mult=1)
    run()
    t_pipeline = float("inf")
    for _ in range(2):
        t0 = time.time()
        run()
        t_pipeline = min(t_pipeline, time.time() - t0)
    _log(f"bench: pipeline {t_pipeline:.2f}s")
    throughput = n_turns / t_pipeline
    spark.stop()

    out = {
        "metric": "turns_parsed_routed_per_sec",
        "value": round(throughput, 1),
        "unit": "rows/sec",
        "queries": per_query,
        "sf": sf,
        "n_turns": n_turns,
        "pipeline_sec": round(t_pipeline, 3),
    }

    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        _log("bench: scaling probe local[8] ...")
        t8, n8 = _timed_session(8, SCALE_MULT)
        _log(f"bench: local[8] {t8:.1f}s over {n8} rows")
        t32, n32 = _timed_session(32, SCALE_MULT)
        _log(f"bench: local[32] {t32:.1f}s over {n32} rows")
        eff = (t8 / t32) / 4.0
        out["scaling"] = {
            "n_rows": n8,
            "t_local8": round(t8, 3),
            "t_local32": round(t32, 3),
            "throughput_local8": round(n8 / t8, 1),
            "throughput_local32": round(n32 / t32, 1),
            "efficiency": round(eff, 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
