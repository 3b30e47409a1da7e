"""Aggregate stage — posting-count summaries with explicit skew salting.

Reference analog: A1, the inverted-index build
(/root/reference/src/commands/index.go:159-179): Bluge tokenizes each field
per its analyzer and accumulates term->postings. The materialized equivalent
is ``GROUP BY sink, conv_id, term -> count`` — per-sink, per-conversation
posting counts (BASELINE.json north_star).

Skew: conv_id is Zipf-skewed (two hot convs own ~40% of turns in the test
view; worse at 10^12). A plain hash aggregate puts each hot (conv, term) key
on one task. Spark's partial aggregation (map-side combine) already collapses
duplicates per input partition, but when one conv's rows span hundreds of
partitions the FINAL aggregate for its keys still lands on single reducers.
The two-stage salted aggregate bounds any reducer's share of a hot conv to
1/NSALT:

    stage 1: groupBy(sink, conv_id, term, salt = pmod(hash(turn_idx), N)) -> count
    stage 2: groupBy(sink, conv_id, term) -> sum(count)

Stage 2's input is at most NSALT rows per (conv, term) — negligible. This is
what the >=0.8 N->4N scaling-efficiency gate measures (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize

DEFAULT_NSALT = 16


def term_counts(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("sink", "conv_id"),
    text_col: str = "text",
    tokenizer: str = "default",
    nsalt: int = DEFAULT_NSALT,
    salt_col: str = "turn_idx",
) -> DataFrame:
    """Salted two-stage (group..., term) -> cnt aggregate over tokenized text.

    Hot-path discipline: the empty-token filter runs AFTER the explode as a
    plain scalar predicate. Filtering inside the array with the
    ``filter(arr, lambda)`` higher-order function would knock the whole
    Generate out of whole-stage codegen into interpreted eval
    (ArrayFilter.eval per row) — measured 30-50x slower on this stage.
    """
    terms = df.select(
        *group_cols,
        F.col(salt_col).alias("_salt_src"),
        F.explode(tokenize(F.col(text_col), tokenizer, keep_empty=True)).alias("term"),
    ).filter(F.col("term") != "")
    salted = terms.withColumn("_salt", F.pmod(F.hash("_salt_src"), F.lit(nsalt)))
    stage1 = salted.groupBy(*group_cols, "term", "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return (
        stage1.groupBy(*group_cols, "term")
        .agg(F.sum("_partial").alias("cnt"))
    )


def doc_counts(df: DataFrame, batch_col: str, *extra_cols: str) -> DataFrame:
    """A2: docs-per-commit counts (mod.go:314-347 footer doc_count)."""
    return df.groupBy(batch_col, *extra_cols).agg(F.count(F.lit(1)).alias("doc_count"))


def ordering_check(df: DataFrame) -> DataFrame:
    """North-rule 'stable turn ordering' invariant as a DataFrame:
    per conversation, rows where row_number-by-turn_idx disagrees with
    turn_idx (must be 0) plus turn stats. Uses an explicit repartition by
    conv_id + sortWithinPartitions — the pattern every order-sensitive
    stage must follow (SURVEY.md §4.2)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    return (
        df.repartition("conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .withColumn("_rn", F.row_number().over(w) - 1)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.max("turn_idx").alias("max_turn"),
            F.sum(F.when(F.col("_rn") != F.col("turn_idx"), 1).otherwise(0)).alias(
                "order_violations"
            ),
        )
    )
