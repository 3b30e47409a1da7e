#!/usr/bin/env python
"""Round-6 optimization harness — NOT the official bench (bench.py is
frozen). Per guide §1: isolates each headline query with the noop sink,
captures .explain("formatted") into plans/r06/, and times repeated runs so
plan changes can be attributed. Usage:

  python bench_extra.py plans [before|after]   # dump formatted plans
  python bench_extra.py time [reps]            # noop-sink + count timings
  python bench_extra.py pipeline [reps]        # headline pipeline timing
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

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


def _spark():
    from go_distributed_log_search_spark.session import get_spark

    return get_spark("bench-extra", cpus=CPUS, shuffle_partitions=CPUS)


def dump_plans(tag: str) -> None:
    from go_distributed_log_search_spark.queries import SPARK_QUERIES

    spark = _spark()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in BENCH_QUERIES:
        df = SPARK_QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


def time_queries(reps: int) -> None:
    from go_distributed_log_search_spark.queries import SPARK_QUERIES

    spark = _spark()
    out: dict[str, dict] = {}
    for name in BENCH_QUERIES:
        spark.sparkContext.setJobDescription(f"{name}: build+warm")
        df = SPARK_QUERIES[name](spark, SF_DIR)
        df.count()  # warm
        counts, noops = [], []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: count")
            t0 = time.time()
            df.count()
            counts.append(time.time() - t0)
            spark.sparkContext.setJobDescription(f"{name}: noop")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            noops.append(time.time() - t0)
        out[name] = {
            "count_min": round(min(counts), 3),
            "noop_min": round(min(noops), 3),
        }
        print(
            f"{name}: count_min={out[name]['count_min']} "
            f"noop_min={out[name]['noop_min']}",
            file=sys.stderr,
        )
    import json

    print(json.dumps(out))
    spark.stop()


def time_pipeline(reps: int) -> None:
    import bench

    spark = _spark()
    from go_distributed_log_search_spark.transcripts import transcripts_df

    n = transcripts_df(spark, SF_DIR).count()
    _, run = bench._pipeline_job(spark, SF_DIR, mult=1)
    run()
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        run()
        dt = time.time() - t0
        best = min(best, dt)
        print(f"pipeline run {dt:.3f}s", file=sys.stderr)
    print(f'{{"pipeline_sec": {best:.3f}, "value": {n / best:.1f}}}')
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "plans":
        dump_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif cmd == "pipeline":
        time_pipeline(int(sys.argv[2]) if len(sys.argv) > 2 else 5)
    else:
        time_queries(int(sys.argv[2]) if len(sys.argv) > 2 else 5)
