"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse->enrich->route->aggregate pipeline
at sf0.001. ``queries()`` exposes one callable per implemented operator from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-dialect equivalent over the
same parquet inputs. The transcripts input (north-rule shape) is synthesised
deterministically inside both engines from events+documents — identical SQL
semantics verified in tests/test_transcripts_view.py.

Column-name discipline: every computed column is aliased identically in the
Spark DataFrame code and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_distributed_log_search_spark import pipeline
from go_distributed_log_search_spark.operators import aggregate, parse, route
from go_distributed_log_search_spark.transcripts import (
    oracle_prelude,
    transcripts_df,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-sink, per-conversation posting-count summary."""
    dfs = pipeline.run_pipeline(spark, SF0001)
    return dfs["agg_terms"]


# ---------------------------------------------------------------- queries

def _q_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse.parse_turns(transcripts_df(spark, sf_dir), dynamic=False)


def _q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return route.route_counts(pipeline.parsed_enriched(spark, sf_dir))


def _q_agg_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    tagged = route.routed(pipeline.parsed_enriched(spark, sf_dir))
    return aggregate.term_counts(tagged.filter(F.col("sink") == "errors"))


def _q_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    enriched = pipeline.parsed_enriched(spark, sf_dir)
    return (
        enriched.groupBy("role_kind", "tool_family")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.round(F.sum("score_weight"), 1).alias("weight_sum"),
        )
    )


def _q_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregate.ordering_check(transcripts_df(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pipeline_parse": _q_parse,
        "pipeline_route_counts": _q_route_counts,
        "pipeline_agg_terms": _q_agg_terms,
        "pipeline_enrich": _q_enrich,
        "turn_ordering": _q_ordering,
    }


# ---------------------------------------------------------------- oracles
# DuckDB dialect; transcripts/dim CTEs from oracle_prelude(None) — the
# driver pre-registers events/documents views at sf0.01.

_P = oracle_prelude(None)

_ORACLE: dict[str, str] = {
    "pipeline_parse": _P + """
SELECT conv_id, turn_idx, role, tool, ts, text,
  NULLIF(regexp_extract(text, 'level=([A-Z]+)', 1), '') AS level,
  NULLIF(regexp_extract(text, 'sig=([A-Za-z]+)', 1), '') AS error_signature,
  NULLIF(regexp_extract(text, '<tool:([a-z]+) ', 1), '') AS tool_call,
  NULLIF(regexp_extract(text, 'src: ([\\w/.:]+)', 1), '') AS src,
  NULLIF(regexp_extract(text, 'dest: ([\\w/.:]+)', 1), '') AS dest,
  CAST(NULLIF(regexp_extract(text, 'bytes: (\\d+)', 1), '') AS BIGINT) AS bytes,
  NULLIF(regexp_extract(text, 'op: ([\\w/.:]+)', 1), '') AS op,
  CAST(NULLIF(regexp_extract(text, 'duration: (\\d+)', 1), '') AS BIGINT) AS duration
FROM transcripts
""",
    "pipeline_route_counts": _P + """,
parsed AS (
  SELECT *, NULLIF(regexp_extract(text, 'level=([A-Z]+)', 1), '') AS level,
         NULLIF(regexp_extract(text, '<tool:([a-z]+) ', 1), '') AS tool_call
  FROM transcripts
),
routed AS (
  SELECT 'errors' AS sink, conv_id FROM parsed WHERE level = 'ERROR'
  UNION ALL
  SELECT 'tool_calls' AS sink, conv_id FROM parsed
    WHERE tool IS NOT NULL OR tool_call IS NOT NULL
  UNION ALL
  SELECT 'assistant_turns' AS sink, conv_id FROM parsed WHERE role = 'assistant'
)
SELECT sink, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM routed GROUP BY sink
""",
    "pipeline_agg_terms": _P + """,
parsed AS (
  SELECT *, NULLIF(regexp_extract(text, 'level=([A-Z]+)', 1), '') AS level,
         NULLIF(regexp_extract(text, '<tool:([a-z]+) ', 1), '') AS tool_call
  FROM transcripts
),
routed AS (
  SELECT 'errors' AS sink, conv_id, text FROM parsed WHERE level = 'ERROR'
  UNION ALL
  SELECT 'tool_calls' AS sink, conv_id, text FROM parsed
    WHERE tool IS NOT NULL OR tool_call IS NOT NULL
  UNION ALL
  SELECT 'assistant_turns' AS sink, conv_id, text FROM parsed
    WHERE role = 'assistant'
),
toks AS (
  SELECT sink, conv_id,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM routed WHERE sink = 'errors'
)
SELECT sink, conv_id, term, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks WHERE term <> '' GROUP BY sink, conv_id, term
""",
    "pipeline_enrich": _P + """,
parsed AS (
  SELECT t.*, r.role_kind, r.score_weight, tl.tool_family
  FROM transcripts t
  LEFT JOIN dim_roles r ON t.role = r.role
  LEFT JOIN dim_tools tl ON t.tool = tl.tool
)
SELECT role_kind, tool_family, CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
       ROUND(SUM(score_weight), 1) AS weight_sum
FROM parsed GROUP BY role_kind, tool_family
""",
    "turn_ordering": _P + """,
rn AS (
  SELECT conv_id, turn_idx,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS _rn
  FROM transcripts
)
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
       MAX(turn_idx) AS max_turn,
       CAST(SUM(CASE WHEN _rn <> turn_idx THEN 1 ELSE 0 END) AS BIGINT)
         AS order_violations
FROM rn GROUP BY conv_id
""",
}


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
