"""Agent-tooling data-quality operators over transcript turns.

Agent-transcript corpora carry inline tool-call markers
(``<tool:NAME arg=ARG>`` in this engine's fixture grammar, mirroring the
reference indexer's tool-field extraction, internal_search.go:1 scoring
surface) plus a structured ``tool`` column. Before such data is usable
for tool-use fine-tuning, every pipeline audits (a) which tools are
actually called and with how many distinct arguments, (b) whether every
called tool exists in the tool REGISTRY (hallucinated tool names are a
top failure mode worth filtering on), and (c) whether the inline marker
agrees with the structured column (extraction drift).

Scale shape: the marker parse is a map-side regexp on the scan; the
registry is a tiny dimension joined BROADCAST (at a real deployment it
is a catalog table, same plan); the audit aggregate groups on the tool
name — cardinality = |tools|, so the single exchange carries a handful
of partial rows per map task, never text.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOOL_MARKER_RE = r"<tool:(\w+) arg=([\w-]+)>"

DEFAULT_REGISTRY = ("bash", "browser", "calc", "python", "search")


def tool_call_audit(
    turns: DataFrame,
    registry: Sequence[str] = DEFAULT_REGISTRY,
    text_col: str = "text",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-tool call audit over inline tool markers.

    Output, one row per distinct marker tool name, tool asc:
    (tool, n_calls, n_distinct_args, n_col_mismatch, in_registry) —
    n_col_mismatch counts turns whose structured ``tool`` column
    disagrees with (or misses) the inline marker name.
    """
    spark = turns.sparkSession
    marked = turns.select(
        F.regexp_extract(F.col(text_col), TOOL_MARKER_RE, 1).alias("mtool"),
        F.regexp_extract(F.col(text_col), TOOL_MARKER_RE, 2).alias("marg"),
        F.col(tool_col).alias("ctool"),
    ).filter(F.col("mtool") != "")
    reg = spark.createDataFrame(
        [(t,) for t in sorted(registry)], "tool STRING"
    ).withColumn("in_registry", F.lit(True))
    agg = marked.groupBy(F.col("mtool").alias("tool")).agg(
        F.count(F.lit(1)).alias("n_calls"),
        F.countDistinct("marg").alias("n_distinct_args"),
        F.sum(
            (~F.col("ctool").eqNullSafe(F.col("mtool"))).cast("long")
        ).alias("n_col_mismatch"),
    )
    return (
        agg.join(F.broadcast(reg), "tool", "left")
        .withColumn("in_registry", F.coalesce("in_registry", F.lit(False)))
        .orderBy("tool")
    )
