"""Search — reference-parity substring scorer + true top-k.

Reference lifecycle (/root/reference/src/commands/search.go:39-150):
scatter one goroutine per index file, evaluate the P10 predicate
(case-insensitive substring of the whole query against every string field,
search.go:222-255), additively score matching fields (A3 weights), gather
the first ``limit`` arrivals, sort by score desc, emit.

Spark restatement: partitioned scan + one filter/score column expression +
``orderBy(desc(score)).limit(k)`` (TakeOrderedAndProject — per-partition
top-k heaps, then a single driver merge; no full sort, no full shuffle).

NOTE on parity (SURVEY.md §2.6 T1): the reference's arrival-order
truncation is a race — a high-score doc arriving after `limit` results is
dropped. We implement true top-k; scores are deterministic, so whenever
total matches <= limit the outputs coincide, and tests pin that regime.
Ties are broken by (conv_id, turn_idx) for full determinism, which the
reference cannot offer at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scoring import contains_ci, score_expr
from ..plans.query_compiler import QueryCompiler

# transcript-turn string fields that participate in P10/A3
DEFAULT_SEARCH_FIELDS = ["text", "level", "role", "tool", "op", "error_signature"]


def substring_search(
    df: DataFrame,
    query: str,
    limit: int = 1,
    string_fields: list[str] | None = None,
    map_fields: list[str] | None = None,
    tiebreak: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Implemented-semantics search: P10 predicate + A3 score + top-k.

    limit semantics follow the reference: default 1 (args.go:215-216),
    limit == 0 returns nothing (search.go:45-47).
    """
    if limit == 0:
        return df.limit(0).withColumn("score", F.lit(0.0))
    fields = string_fields or [c for c in DEFAULT_SEARCH_FIELDS if c in df.columns]
    score = score_expr(query, fields, map_fields)
    scored = df.withColumn("score", score).filter(F.col("score") > 0)
    order = [F.col("score").desc()] + [F.col(c) for c in tiebreak if c in df.columns]
    return scored.orderBy(*order).limit(limit)


def field_query_search(
    df: DataFrame,
    query: str,
    default_fields: list[str] | None = None,
) -> DataFrame:
    """Advertised-syntax search (labeled extension — see plans/query_compiler):
    ``level:ERROR AND duration:[10 TO 50}`` compiled to Catalyst exprs."""
    compiler = QueryCompiler(dict(df.dtypes), default_fields or ["text"])
    return df.filter(compiler.compile(query))


def match_predicate(df_columns: list[str], query: str) -> Column:
    """Bare P10 predicate over the given string columns (search.go:222-255)."""
    cond = F.lit(False)
    for c in df_columns:
        cond = cond | contains_ci(F.col(c), query)
    return cond
