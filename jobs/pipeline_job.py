"""Standalone spark-submit driver: parse -> enrich -> route -> aggregate.

Launched as

    spark-submit --master local[N] --py-files engine.zip \
        jobs/pipeline_job.py --sf-dir /root/testdata/sf0.001 [--out DIR]

The engine package arrives via ``--py-files`` (submit.py builds the zip) —
this script deliberately does NOT add the repo to sys.path, so a passing
run proves the artifact is self-contained, exactly as it would ship to a
real cluster (north rule: "run via spark-submit --py-files"). The reference
analog is its single deployable binary running the ``index`` command
(/root/reference/src/commands/index.go:86-231).

Output: ONE JSON line on stdout —
  {"n_turns": ..., "sink_counts": {"errors": ..., ...},
   "sink_convs": {...}, "n_term_rows": ...|null, "sec": ...}
Per-sink counts are the reference's per-shard doc-count parity surface;
the driver-side JSON is what tests/test_spark_submit.py compares across
two parallelism levels and against the DuckDB oracle.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--job", choices=("counts", "terms"), default="counts",
                    help="counts: per-sink route counts; terms: also run "
                         "the salted posting-count aggregation")
    ap.add_argument("--out", default=None,
                    help="optional dir: write one parquet table per sink "
                         "(the fan-out writer path)")
    ap.add_argument("--cpus", type=int, default=None,
                    help="parallelism level; defaults to SPARK_GRAFT_CPUS")
    args = ap.parse_args(argv)

    # Imports resolved from the --py-files zip (or an installed package) —
    # NOT from a repo checkout on sys.path.
    from pyspark.sql import functions as F

    from go_distributed_log_search_spark import pipeline
    from go_distributed_log_search_spark.operators import aggregate, route
    from go_distributed_log_search_spark.session import get_spark
    from go_distributed_log_search_spark.transcripts import transcripts_df

    t0 = time.time()
    spark = get_spark("pipeline-job", cpus=args.cpus)
    enriched = pipeline.parsed_enriched(spark, args.sf_dir)
    tagged = route.routed(enriched)

    n_turns = transcripts_df(spark, args.sf_dir).count()
    counts = {
        r["sink"]: (r["n_rows"], r["n_convs"])
        for r in route.route_counts(enriched).collect()
    }

    n_term_rows = None
    if args.job == "terms":
        base = transcripts_df(spark, args.sf_dir)
        hot = aggregate.detect_hot_keys(base, "conv_id")
        n_term_rows = aggregate.term_counts(tagged, hot_keys=hot).count()

    if args.out:
        # One filtered append per sink over a persisted tagged frame — the
        # writer shape documented in route.routed's docstring (appends need
        # full rows; persist shares the parse across the three passes).
        # Sinks commit through the Warehouse (Iceberg-style batch
        # partition + lineage row-count record, sources/catalog.py) — the
        # submitted job IS the reference's `index` command end to end:
        # parse -> enrich -> route -> per-sink commit with lineage.
        from go_distributed_log_search_spark.sources.catalog import Warehouse

        wh = Warehouse(spark, args.out)
        tag_cached = route.with_sink_tags(enriched).persist()
        try:
            written = {
                sink: wh.append_batch(
                    tag_cached.filter(F.array_contains("sinks", sink)).drop("sinks"),
                    sink,
                    batch_id="submit-0",
                )
                for sink in route.SINKS
            }
            wh.record_lineage_many("submit-0", written)
        finally:
            tag_cached.unpersist()

    out = {
        "n_turns": n_turns,
        "sink_counts": {s: c[0] for s, c in sorted(counts.items())},
        "sink_convs": {s: c[1] for s, c in sorted(counts.items())},
        "n_term_rows": n_term_rows,
        "sec": round(time.time() - t0, 3),
    }
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
