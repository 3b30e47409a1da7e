"""Telemetry roll-ups over the parsed turn fields.

The reference's value proposition is turning raw log lines into queryable
structure (schema projections, src/dest/bytes/op/duration extraction —
internal_parser.go field casts, SURVEY §2.2). These operators are the
standard dashboards a log-search deployment runs ON that structure:

- :func:`slo_stats` — per-operation latency percentiles from the parsed
  ``duration`` field (the p95/p99 SLO board).
- :func:`top_talkers` — per-source-IP traffic totals from the parsed
  ``src``/``bytes`` fields (the network hot-spot board).
- :func:`latency_stats` — per role-transition response latency from turn
  timestamps (the agent-responsiveness board; transcripts-axis analog of
  inter-log-line latency).
- :func:`error_cascade` — how often an error turn is followed by another
  error within k turns of the same conversation (retry-storm /
  error-propagation audit keyed by error signature).

Scale shapes: slo_stats/top_talkers are scan + one bounded-cardinality
hash aggregate (|ops| and |ips| keys; exact percentile shuffles group
values — swap `approx_percentile` at 10^12 turns, same contract as
len_percentiles). latency_stats/error_cascade are one conv_id window
shuffle each; error_cascade windows over ERROR turns only (minority).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SRC_IP_RE = r"src: /([0-9.]+):"


def slo_stats(parsed: DataFrame) -> DataFrame:
    """Per-op duration percentiles over parsed INFO lines.

    Output (op asc): (op, n_lines, p50_dur, p95_dur, p99_dur, max_dur).
    """
    d = F.col("duration").cast("double")
    return (
        parsed.filter(F.col("op").isNotNull() & F.col("duration").isNotNull())
        .groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.percentile(d, F.lit(0.5)), 4).alias("p50_dur"),
            F.round(F.percentile(d, F.lit(0.95)), 4).alias("p95_dur"),
            F.round(F.percentile(d, F.lit(0.99)), 4).alias("p99_dur"),
            F.max("duration").cast("bigint").alias("max_dur"),
        )
        .orderBy("op")
    )


def top_talkers(
    turns: DataFrame, k: int = 10, text_col: str = "text"
) -> DataFrame:
    """Top-k source IPs by total parsed bytes.

    Output: (src_ip, n_lines, total_bytes), total_bytes desc / src_ip asc,
    limit k — orderBy+limit folds to TakeOrderedAndProject, so only k rows
    leave each partition's aggregate.
    """
    from ..functions import grok

    rows = turns.select(
        F.regexp_extract(F.col(text_col), SRC_IP_RE, 1).alias("src_ip"),
        grok.kv_long_expr(F.col(text_col), "bytes").alias("bytes"),
    ).filter(F.col("src_ip") != "")
    return (
        rows.groupBy("src_ip")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("bytes").cast("bigint").alias("total_bytes"),
        )
        .orderBy(F.col("total_bytes").desc(), "src_ip")
        .limit(k)
    )


def latency_stats(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
) -> DataFrame:
    """Per role-transition turn latency (seconds between consecutive
    turns of a conversation, keyed by prev_role -> role).

    Output (prev_role, role asc): (prev_role, role, n, avg_s, p95_s,
    max_s), latencies clamped at >= 0 (out-of-order wall clocks happen in
    real telemetry; negative deltas would poison the averages).
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    t = F.col(ts_col).cast("double")
    pairs = (
        turns.select(
            F.col(conv_col),
            F.col(idx_col),
            F.col(role_col).alias("role"),
            F.lag(F.col(role_col)).over(w).alias("prev_role"),
            F.greatest(t - F.lag(t).over(w), F.lit(0.0)).alias("lat_s"),
        )
        .filter(F.col("prev_role").isNotNull())
    )
    return (
        pairs.groupBy("prev_role", "role")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("lat_s"), 4).alias("avg_s"),
            F.round(F.percentile(F.col("lat_s"), F.lit(0.95)), 4).alias("p95_s"),
            F.round(F.max("lat_s"), 4).alias("max_s"),
        )
        .orderBy("prev_role", "role")
    )


def error_cascade(
    parsed: DataFrame,
    k: int = 3,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """Error-propagation audit: for each error signature, how often is an
    ERROR turn followed by ANOTHER error turn within k turns of the same
    conversation?

    Output (error_signature asc): (error_signature, n_errors, n_cascades,
    cascade_rate) with cascade_rate = n_cascades / n_errors to 4dp.
    """
    errs = parsed.filter(F.col("level") == "ERROR").select(
        F.col(conv_col), F.col(idx_col), F.col("error_signature")
    )
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    flagged = errs.withColumn("next_idx", F.lead(idx_col).over(w)).withColumn(
        "cascades",
        (F.col("next_idx") - F.col(idx_col) <= k).cast("long"),
    )
    return (
        flagged.groupBy("error_signature")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.coalesce(F.sum("cascades"), F.lit(0)).cast("bigint").alias(
                "n_cascades"
            ),
            F.round(
                F.coalesce(F.sum("cascades"), F.lit(0))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("cascade_rate"),
        )
        .orderBy("error_signature")
    )
