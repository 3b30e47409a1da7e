"""Deterministic multi-turn agent-transcript view — the north-rule input.

BASELINE.json ``input_hint`` mandates the input shape
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``. No such table exists in /root/testdata, so we synthesise it
*deterministically inside the query engines* from the driver-provided
``events`` + ``documents`` parquet: the same ANSI-SQL text evaluates
identically in Spark SQL and DuckDB (verified byte-for-byte in
tests/test_transcripts_view.py), which lets every downstream operator be
checked against a DuckDB oracle.

Properties engineered into the view (mirroring FIXTURES.md §1):
- Zipf-ish skew: 40% of users collapse into two hot conversations
  (``conv-hot-0/1``) to exercise the salted aggregation path.
- turn_idx: contiguous 0-based ROW_NUMBER per conversation ordered by the
  unique event_id — the "stable turn ordering" key.
- text: template pool mirroring the reference HDFS fixture bodies
  (/root/reference/tests/hdfs-logs-multitenants-10000.jsonl): INFO lines with
  embedded ``key: value`` pairs (src/dest/bytes/op/duration), ERROR lines
  with an error signature, WARN lines, and ``<tool:NAME arg=...>`` markers —
  all grok/regex-extractable.
- tool: non-null iff the turn is a tool turn or carries a tool marker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Shared SQL template. {events}/{documents} are table references:
# Spark side gets  parquet.`/path/events.parquet`
# DuckDB side gets read_parquet('/path/events.parquet')
# Dialect-portable subset only: ||, CASE, %, CAST AS STRING/INT,
# ROW_NUMBER() OVER, COUNT(*) OVER ().
TRANSCRIPTS_SQL = """
WITH ev AS (
  -- doc_key computed on the fact side so the join below is a clean
  -- equi-join -> Spark picks BroadcastHashJoin (documents is the small
  -- side); a both-sides expression here would force a single-partition
  -- nested-loop join. {n_docs} is inlined as a literal: a scalar subquery
  -- here triggered a multi-minute CompletableFuture stall in Spark 4.1
  -- local mode (subquery broadcast job parked without progress).
  SELECT e.event_id, e.user_id, e.ts,
         e.event_id % {n_docs} AS doc_key
  FROM {events} e
),
base AS (
  SELECT ev.event_id, ev.user_id, ev.ts, d.text AS doc_text
  FROM ev JOIN {documents} d ON ev.doc_key = d.doc_id
),
conv AS (
  SELECT *,
    CASE WHEN user_id % 5 < 2 THEN 'conv-hot-' || CAST(user_id % 2 AS STRING)
         ELSE 'conv-' || CAST(user_id AS STRING) END AS conv_id,
    CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'search' WHEN 1 THEN 'bash'
         WHEN 2 THEN 'browser' ELSE 'calc' END AS tool_pick,
    CAST(event_id % 20 AS INT) AS bucket
  FROM base
),
turns AS (
  SELECT conv_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY event_id) - 1 AS INT)
      AS turn_idx,
    event_id, user_id, ts, doc_text, tool_pick, bucket
  FROM conv
)
SELECT conv_id, turn_idx,
  CASE WHEN turn_idx = 0 THEN 'system'
       WHEN bucket IN (5, 6) OR turn_idx % 4 = 3 THEN 'tool'
       WHEN turn_idx % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
  CASE
    WHEN bucket IN (0, 1, 2) THEN 'level=ERROR sig=' ||
      CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'OutOfMemoryError'
        WHEN 1 THEN 'BlockAllocationFailed' ELSE 'AuthFailure' END
      || ' ' || doc_text
    WHEN bucket IN (3, 4) THEN 'level=WARN slow response detected ' || doc_text
    WHEN bucket IN (5, 6) THEN '<tool:' || tool_pick || ' arg=q' ||
      CAST(event_id % 100 AS STRING) || '> ' || doc_text
    ELSE 'level=INFO src: /10.10.' || CAST(user_id AS STRING) ||
      '.1:9000, dest: /10.10.0.2:9000, bytes: ' ||
      CAST((event_id * 37) % 100000 AS STRING) ||
      ', op: ' || CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'HDFS_WRITE'
        WHEN 1 THEN 'HDFS_READ' ELSE 'CREATE' END ||
      ', duration: ' || CAST(event_id % 97 AS STRING) || ' ' || doc_text
  END AS text,
  CASE WHEN bucket IN (5, 6) OR turn_idx % 4 = 3 THEN tool_pick END AS tool,
  CAST(ts AS TIMESTAMP) AS ts
FROM turns
"""

# Broadcast-enrich dimension tables (FIXTURES.md §2). score_weight mirrors
# the reference's per-field score constants (search.go:230-243: message +10,
# severity/level +8, service/op +6, category +4, user_id +3, other +2).
DIM_ROLES_SQL = """
SELECT * FROM (VALUES
  ('system',    'control', false, CAST(2.0  AS DOUBLE)),
  ('user',      'human',   false, CAST(3.0  AS DOUBLE)),
  ('assistant', 'agent',   true,  CAST(10.0 AS DOUBLE)),
  ('tool',      'agent',   true,  CAST(6.0  AS DOUBLE))
) AS t(role, role_kind, is_agent, score_weight)
"""

DIM_TOOLS_SQL = """
SELECT * FROM (VALUES
  ('search',  'retrieval', true),
  ('bash',    'execution', false),
  ('browser', 'retrieval', false),
  ('calc',    'execution', true),
  ('ffmpeg',  'media',     true)
) AS t(tool, tool_family, is_sandboxed)
"""


def spark_table_ref(sf_dir: str, name: str) -> str:
    """Spark SQL direct-parquet table reference (no temp-view pollution)."""
    return f"parquet.`{sf_dir}/{name}.parquet`"


def duckdb_table_ref(sf_dir: str, name: str) -> str:
    return f"read_parquet('{sf_dir}/{name}.parquet')"


def n_docs(sf_dir: str) -> int:
    """Documents row count from parquet footer metadata (no Spark job)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def transcripts_sql_spark(sf_dir: str) -> str:
    return TRANSCRIPTS_SQL.format(
        events=spark_table_ref(sf_dir, "events"),
        documents=spark_table_ref(sf_dir, "documents"),
        n_docs=n_docs(sf_dir),
    )


def transcripts_sql_duckdb(sf_dir: str) -> str:
    # DuckDB evaluates the scalar subquery instantly — same value as the
    # Spark-side literal, results identical.
    return TRANSCRIPTS_SQL.format(
        events=duckdb_table_ref(sf_dir, "events"),
        documents=duckdb_table_ref(sf_dir, "documents"),
        n_docs=f"(SELECT COUNT(*) FROM {duckdb_table_ref(sf_dir, 'documents')})",
    )


def oracle_prelude(sf_dir: str | None = None) -> str:
    """CTE prelude for DuckDB oracle queries: transcripts + dims.

    When sf_dir is None the driver has pre-registered the raw tables as
    views named ``events``/``documents`` — reference them directly.
    """
    if sf_dir is None:
        body = TRANSCRIPTS_SQL.format(
            events="events",
            documents="documents",
            n_docs="(SELECT COUNT(*) FROM documents)",
        )
    else:
        body = transcripts_sql_duckdb(sf_dir)
    return (
        f"WITH transcripts AS ({body}),\n"
        f"dim_roles AS ({DIM_ROLES_SQL}),\n"
        f"dim_tools AS ({DIM_TOOLS_SQL})"
    )


def transcripts_view_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw synthesis view (lazy Catalyst plan, recomputed per action)."""
    return spark.sql(transcripts_sql_spark(sf_dir))


def transcripts_df(spark: SparkSession, sf_dir: str, materialize: bool = True) -> DataFrame:
    """The transcripts input table.

    In production this IS a materialized Iceberg table; the synthesis view
    is sandbox scaffolding. We materialize it once per sf_dir to parquet
    (repo-local .cache) and scan that: downstream plans then read plain
    columns — small generated code, honest production plan shape. Keeping
    the giant synthesis CASE/concat expression inline instead caused a JIT
    compile storm (every downstream stage re-codegens it) with 10-20x
    wall-time variance.

    The cache is deterministic (seeded inputs, deterministic SQL) and
    cross-checked against DuckDB running the same SQL in
    tests/test_transcripts_view.py.
    """
    if not materialize:
        return transcripts_view_df(spark, sf_dir)
    import os

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    default_root = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".cache")
    if not os.path.isdir(os.path.dirname(default_root)):
        # zipimport (spark-submit --py-files engine.zip): __file__ points
        # inside the zip, which Hadoop's local FS rejects as a parent dir.
        # Fall back to a host-local scratch root — same role as an
        # executor's local working dir on a real cluster.
        import tempfile

        default_root = os.path.join(tempfile.gettempdir(), "spark-graft-cache")
    cache_root = os.environ.get("SPARK_GRAFT_CACHE", default_root)
    # ROUND-ROBIN layout — deliberately NOT partitioned by conv_id. The
    # conv distribution is Zipf-skewed (two hot convs own ~40% of turns);
    # key-partitioned files would concentrate a hot conv into one file and
    # any map stage scanning it gets a 5-20x straggler task (measured:
    # this was the source of wildly bimodal run times). Even file sizes ->
    # even map tasks; stages that need conv-locality or turn order impose
    # it explicitly (repartition(conv_id) + sortWithinPartitions,
    # SURVEY.md §4.2) — same discipline as size-balanced Iceberg data
    # files at 100 TB.
    #
    # File count = the host's benchmark core count (round-6 change; was a
    # fixed 64): session.py sizes maxPartitionBytes so every file is its
    # own split, so the file count IS the map-stage task count for every
    # consumer of this table. 64 files meant every sub-second sf0.1 scan
    # stage ran TWO waves of tiny tasks on 32 cores (measured: the scan
    # stage of each headline query spent ~half its wall in the second
    # wave). One file per core -> one wave. Tied to SPARK_GRAFT_CPUS (not
    # the current session's parallelism) so every session shares ONE cache
    # per sf_dir; the layout is embedded in the cache path so a layout
    # change can never silently reuse a stale cache directory.
    n_files = int(
        os.environ.get(
            "SPARK_GRAFT_CACHE_FILES", os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
    )
    path = os.path.join(cache_root, f"transcripts_{sf_name}_f{n_files}.parquet")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        (
            transcripts_view_df(spark, sf_dir)
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)


def transcripts_scaled_df(
    spark: SparkSession, sf_dir: str, mult: int
) -> DataFrame:
    """A mult-replicated transcripts table, materialized once.

    Replication happens ON DISK (distinct conv_id per replica, preserving
    the skew shape) so every consumer — any parallelism level, any run —
    scans the identical table with the identical plan and identical
    generated code. In-plan explode-replication would embed ``mult`` as a
    codegen literal: every new factor pays a fresh interpreted+JIT ramp
    (minutes at 10^6 rows in this sandbox).
    """
    if mult <= 1:
        return transcripts_df(spark, sf_dir)
    import os

    from pyspark.sql import functions as F

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    cache_root = os.environ.get(
        "SPARK_GRAFT_CACHE", os.path.join(os.path.dirname(os.path.dirname(__file__)), ".cache")
    )
    path = os.path.join(cache_root, f"transcripts_{sf_name}_x{mult}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        base = transcripts_df(spark, sf_dir)
        rep = base.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
        out = rep.withColumn(
            "conv_id", F.concat_ws("#", "conv_id", F.col("rep").cast("string"))
        ).drop("rep")
        out.repartition(64).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def dim_roles_df(spark: SparkSession) -> DataFrame:
    return spark.sql(DIM_ROLES_SQL)


def dim_tools_df(spark: SparkSession) -> DataFrame:
    return spark.sql(DIM_TOOLS_SQL)
