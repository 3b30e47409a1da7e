"""Chat-format integrity and turn-level scrubbing over transcripts.

Training-pipeline extension (build brief): the transcripts axis of this
graft is conversational logs, so the corpus-hygiene operators every LLM
data pipeline runs on chat data live here:

- role_alternation_report: validate chat-format invariants (system turn
  first, no same-role runs, no tool turn directly answering a user turn).
  One window pass per conversation — lag(role) over (conv_id, turn_idx) —
  then a single global aggregate; the shuffle carries one row per turn
  with three boolean flags, nothing else.
- context_truncate: per-conversation context-window truncation — keep the
  NEWEST turns whose cumulative whitespace-token count fits the budget
  (the standard "drop oldest history first" rule). A reverse running sum
  over the same (conv_id, turn_idx) window; no second shuffle.
- boilerplate_turns / boilerplate_scrub: CCNet-style boilerplate removal
  at turn granularity — a turn whose normalized-text fingerprint appears
  in >= min_convs DISTINCT conversations is boilerplate (canned greetings,
  templated tool banners). The frequency table groups by the md5
  fingerprint (partial-agg'd; at 100 TB swap the group key to xxhash64 and
  join examples back for the top-k only, so no raw text rides the
  shuffle). The scrub side is the textbook broadcast semi-join: frequent
  fingerprints are vocabulary-sized, the corpus is not — the corpus never
  shuffles.

Reference parity: the reference has no chat-format layer (its unit is a
log line, main.go:1); these operators are the training-pipeline extension
the build brief mandates, expressed over the same transcripts table as
the §2 pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .textstats import fingerprint_expr, ws_token_count_expr


def role_alternation_report(turns: DataFrame) -> DataFrame:
    """Chat-format violation counts: (violation, n_turns, n_convs).

    Violations:
    - missing_system: turn 0 is not a system turn
    - same_role_run: two consecutive non-tool turns share a role
    - tool_after_user: a tool turn directly follows a user turn (tools
      answer assistants, not users)

    Always emits exactly one row per violation type (counts may be 0) so
    the report schema is stable for downstream gating.
    """
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    flags = turns.select(
        "conv_id",
        (
            (F.col("turn_idx") == 0) & (F.col("role") != "system")
        ).alias("v_missing_system"),
        (
            (F.col("role") == F.lag("role").over(w))
            & (F.col("role") != "tool")
        ).alias("v_same_role_run"),
        (
            (F.col("role") == "tool")
            & (F.lag("role").over(w) == "user")
        ).alias("v_tool_after_user"),
    )

    def _pair(flag: str):
        cond = F.col(flag)
        return (
            F.sum(cond.cast("long")).alias(f"{flag}_turns"),
            F.count_distinct(F.when(cond, F.col("conv_id"))).alias(
                f"{flag}_convs"
            ),
        )

    agg = flags.agg(
        *_pair("v_missing_system"),
        *_pair("v_same_role_run"),
        *_pair("v_tool_after_user"),
    )
    # melt the single wide row into (violation, n_turns, n_convs) rows
    stacked = agg.select(
        F.expr(
            "stack(3,"
            " 'missing_system', v_missing_system_turns, v_missing_system_convs,"
            " 'same_role_run', v_same_role_run_turns, v_same_role_run_convs,"
            " 'tool_after_user', v_tool_after_user_turns, v_tool_after_user_convs"
            ") AS (violation, n_turns, n_convs)"
        )
    )
    return stacked.orderBy("violation")


def context_truncate(turns: DataFrame, budget: int = 120) -> DataFrame:
    """Per-conversation context-window truncation summary.

    Rule: walking from the NEWEST turn backwards, keep turns while the
    running whitespace-token total stays <= budget (oldest history drops
    first — the standard chat-context eviction). Output one row per
    conversation: (conv_id, n_turns, total_tokens, kept_turns,
    kept_tokens, first_kept_idx).

    Shape: one shuffle on conv_id for the reverse running-sum window; the
    summary aggregate reuses the same partitioning (no second exchange).
    """
    w = (
        W.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    toks = turns.select(
        "conv_id",
        "turn_idx",
        ws_token_count_expr(F.col("text")).cast("long").alias("n_tok"),
    )
    marked = toks.withColumn("rev_cum", F.sum("n_tok").over(w)).withColumn(
        "keep", F.col("rev_cum") <= F.lit(budget)
    )
    return (
        marked.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum(F.col("keep").cast("long")).alias("kept_turns"),
            F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(F.lit(0))).alias(
                "kept_tokens"
            ),
            F.min(F.when(F.col("keep"), F.col("turn_idx"))).alias(
                "first_kept_idx"
            ),
        )
        .orderBy("conv_id")
    )


def _fingerprint_freq(turns: DataFrame) -> DataFrame:
    """(fp, n_turns, n_convs, example) per normalized-text fingerprint."""
    return (
        turns.select(
            fingerprint_expr(F.col("text")).alias("fp"),
            "conv_id",
            "text",
        )
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count_distinct("conv_id").alias("n_convs"),
            F.min("text").alias("example"),
        )
    )


def boilerplate_turns(
    turns: DataFrame, min_convs: int = 12, k: int = 20
) -> DataFrame:
    """Top-k boilerplate turn texts: (example, n_turns, n_convs).

    Boilerplate = fingerprint seen in >= min_convs distinct conversations.
    Deterministic order: n_convs desc, n_turns desc, example asc.
    """
    freq = _fingerprint_freq(turns).filter(F.col("n_convs") >= min_convs)
    return (
        freq.orderBy(
            F.col("n_convs").desc(), F.col("n_turns").desc(), F.col("example")
        )
        .limit(k)
        .select("example", "n_turns", "n_convs")
    )


def boilerplate_scrub(turns: DataFrame, min_convs: int = 12) -> DataFrame:
    """Per-role retention report after dropping boilerplate turns:
    (role, n_turns, n_dropped).

    The frequent-fingerprint set is broadcast (it is vocabulary-sized by
    construction — a fingerprint must recur across >= min_convs
    conversations to qualify), so the corpus side never shuffles: scan,
    broadcast-hash probe, aggregate.
    """
    frequent = (
        _fingerprint_freq(turns)
        .filter(F.col("n_convs") >= min_convs)
        .select("fp")
    )
    flagged = turns.select(
        "role", fingerprint_expr(F.col("text")).alias("fp")
    ).join(
        F.broadcast(frequent.withColumn("_boiler", F.lit(1))), "fp", "left"
    )
    return (
        flagged.groupBy("role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(F.col("_boiler").isNotNull(), 1).otherwise(0)).alias(
                "n_dropped"
            ),
        )
        .orderBy("role")
    )
