"""Enrich stage — broadcast dimension-lookup joins.

The reference has no relational joins (SURVEY.md §2.3); the north rule adds
a broadcast lookup join of each turn against role/tool dimension tables.
Both dims are tiny (4-5 rows) so the joins are forced broadcast — no shuffle
is added to the hot path, which is what keeps this stage scale-free at
10^12 turns: each executor holds the dim hash map and streams its scan
partition through, preserving upstream partitioning for the aggregate stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..transcripts import dim_roles_df, dim_tools_df


def enrich_turns(
    df: DataFrame,
    spark: SparkSession,
    roles: DataFrame | None = None,
    tools: DataFrame | None = None,
) -> DataFrame:
    """Left broadcast joins: role dim always matches; tool dim is left so
    unmatched/NULL tools survive with null attributes (FIXTURES.md §2)."""
    roles = roles if roles is not None else dim_roles_df(spark)
    tools = tools if tools is not None else dim_tools_df(spark)
    return df.join(F.broadcast(roles), on="role", how="left").join(
        F.broadcast(tools), on="tool", how="left"
    )
