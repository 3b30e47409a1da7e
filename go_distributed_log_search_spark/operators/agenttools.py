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

from pyspark.sql import DataFrame, Window
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


def tool_bigrams(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """Tool-to-tool transition matrix: for consecutive TOOL turns of a
    conversation (non-tool turns skipped), count each (prev_tool →
    next_tool) bigram and its outgoing transition probability.

    The tool-axis Markov chain — which tool an agent reaches for after
    which — used for workflow mining and for spotting degenerate
    tool-call habits that tool_loop_detect's same-tool runs don't cover
    (e.g. a search→browser→search ping-pong). Events-axis analog:
    transition_matrix (user-journey event bigrams).

    Scale shape: the tool filter prunes to the tool-turn minority BEFORE
    the single lead() window over (conv, idx); the aggregate and its
    row-probability window both run on the |tools|²-bounded matrix, not
    the corpus.
    """
    w = F.lead("prev_tool").over(
        Window.partitionBy(conv_col).orderBy(idx_col)
    )
    pairs = (
        turns.filter(F.col(tool_col).isNotNull())
        .select(conv_col, idx_col, F.col(tool_col).alias("prev_tool"))
        .withColumn("next_tool", w)
        .filter(F.col("next_tool").isNotNull())
    )
    cnt = pairs.groupBy("prev_tool", "next_tool").agg(
        F.count(F.lit(1)).alias("n")
    )
    out_total = F.sum("n").over(
        Window.partitionBy("prev_tool")  # |tools|²-row table, bounded
    )
    return (
        cnt.withColumn("prob", F.round(F.col("n") / out_total.cast("double"), 4))
        .orderBy("prev_tool", "next_tool")
    )
