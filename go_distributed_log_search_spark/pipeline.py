"""End-to-end parse -> enrich -> route -> aggregate pipeline.

The Spark-first restatement of the reference's ``index`` command
(/root/reference/src/commands/index.go:86-231): where the reference pulls
one JSON doc at a time through a compiled parser tree into a per-batch Bluge
index, this pipeline declares the whole flow as one Catalyst plan:

    scan transcripts
      -> parse (typed projections + _dynamic, zero-shuffle)
      -> enrich (broadcast dim joins, zero-shuffle)
      -> route (tag array, logical fan-out)
      -> aggregate (salted two-stage posting counts; ONE shuffle)

and lets Tungsten pipeline scan->parse->enrich->tag in a single
whole-stage-codegen span. The only wide dependency in the hot path is the
aggregation shuffle — checked by tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import aggregate, enrich, parse, route
from .transcripts import transcripts_df


def parsed_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = transcripts_df(spark, sf_dir)
    return enrich.enrich_turns(parse.parse_turns(df), spark)


def run_pipeline(spark: SparkSession, sf_dir: str, nsalt: int = aggregate.DEFAULT_NSALT) -> dict[str, DataFrame]:
    """Full flow; returns the principal DataFrames (lazy)."""
    base = transcripts_df(spark, sf_dir)
    enriched = parsed_enriched(spark, sf_dir)
    tagged = route.routed(enriched)
    # heavy-hitter detection samples the raw transcripts (pre-parse plan:
    # just the conv_id column) rather than the routed frame, so the sample
    # job doesn't drag the parse regexes along
    hot = aggregate.detect_hot_keys(base, "conv_id")
    return {
        "enriched": enriched,
        "routed": tagged,
        "route_counts": route.route_counts(enriched),
        "agg_terms": aggregate.term_counts(tagged, nsalt=nsalt, hot_keys=hot),
        "ordering": aggregate.ordering_check(base),
    }
