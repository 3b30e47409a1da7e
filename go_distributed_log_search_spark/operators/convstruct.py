"""Conversation-structure operators over transcript turns.

Two structural audits every agent-transcript corpus needs before training:

- :func:`prefix_sharing` — how much of the corpus shares a common
  conversation PREFIX (system prompts and canned openings are repeated
  across thousands of conversations; a model trained on raw transcripts
  over-weights them, and serving-side KV-cache prefix reuse depends on
  knowing the share). Reference analog: the indexer's per-conversation
  document grouping (/root/reference/src/commands/index.go doc routing);
  the prefix fingerprint chain is this engine's extension.
- :func:`tool_loop_detect` — maximal runs of CONSECUTIVE same-tool turns
  inside a conversation (an agent stuck re-calling the same tool is a top
  data-quality defect in tool-use corpora; such conversations are filtered
  or truncated before SFT).

Scale shapes:
- prefix_sharing caps the window at ``max_depth`` turns BEFORE the window
  shuffle, so per-conversation state is O(max_depth) regardless of
  conversation length, and the depth-level aggregate keys on
  (depth, fingerprint) — cardinality bounded by convs x max_depth, carrying
  32-hex fingerprints, never text.
- tool_loop_detect filters to tool turns first (minority of rows), then
  runs the classic gaps-and-islands double row_number inside ONE
  conv_id-partitioned window shuffle; the island aggregate keys on
  (conv, tool, island) and the output aggregate on tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sharing(
    turns: DataFrame,
    max_depth: int = 8,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Per-depth conversation-prefix reuse stats.

    The depth-d fingerprint of a conversation is
    ``md5(md5(text_1) | ... | md5(text_d))`` over its first d turns in
    turn_idx order (hashing per-turn first keeps the windowed running
    value bounded at 33 bytes/turn instead of accumulating raw text).

    Output, one row per depth 1..max_depth (depth asc):
    (depth, n_convs, n_prefixes, max_share, share_frac) where n_convs is
    conversations reaching that depth, n_prefixes the distinct prefix
    fingerprints among them, max_share the largest group sharing one
    fingerprint, share_frac = max_share / n_convs rounded to 4dp.
    """
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = (
        turns.filter(F.col(idx_col) < max_depth)
        .select(
            F.col(conv_col),
            F.col(idx_col),
            (F.col(idx_col) + 1).cast("int").alias("depth"),
            F.md5(F.col(text_col).cast("binary")).alias("_th"),
        )
        .select(
            "depth",
            F.md5(
                F.concat_ws("|", F.collect_list("_th").over(w)).cast("binary")
            ).alias("fp"),
        )
    )
    by_fp = pre.groupBy("depth", "fp").agg(F.count(F.lit(1)).alias("n"))
    return (
        by_fp.groupBy("depth")
        .agg(
            F.sum("n").cast("bigint").alias("n_convs"),
            F.count(F.lit(1)).alias("n_prefixes"),
            F.max("n").cast("bigint").alias("max_share"),
            F.round(F.max("n") / F.sum("n"), 4).alias("share_frac"),
        )
        .orderBy("depth")
    )


def tool_loop_detect(
    turns: DataFrame,
    min_run: int = 3,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """Detect same-tool loops: maximal runs of consecutive tool turns
    calling the same tool within one conversation.

    "Consecutive" means adjacent in the conversation's tool-turn sequence
    (other roles may interleave between tool turns without breaking the
    run) — gaps-and-islands on row_number(conv) - row_number(conv, tool).

    Output, one row per tool that loops anywhere (tool asc):
    (tool, n_loops, max_run, n_convs, n_loop_turns) counting runs of
    length >= min_run, the longest run, distinct affected conversations,
    and total turns inside loops.
    """
    # one explicit conv_id exchange: hash(conv_id) satisfies BOTH window
    # distributions below (ClusteredDistribution accepts a subset of its
    # clustering keys), so the (conv, tool) window adds only a local sort —
    # without this, Catalyst plans two exchanges, one per partitioning.
    tool_turns = (
        turns.filter(F.col(tool_col).isNotNull())
        .select(F.col(conv_col), F.col(idx_col), F.col(tool_col).alias("tool"))
        .repartition(conv_col)
    )
    w_conv = Window.partitionBy(conv_col).orderBy(idx_col)
    w_tool = Window.partitionBy(conv_col, "tool").orderBy(idx_col)
    islands = tool_turns.select(
        F.col(conv_col),
        "tool",
        (F.row_number().over(w_conv) - F.row_number().over(w_tool)).alias(
            "island"
        ),
    )
    runs = (
        islands.groupBy(conv_col, "tool", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .filter(F.col("run_len") >= min_run)
    )
    return (
        runs.groupBy("tool")
        .agg(
            F.count(F.lit(1)).alias("n_loops"),
            F.max("run_len").cast("bigint").alias("max_run"),
            F.countDistinct(conv_col).alias("n_convs"),
            F.sum("run_len").cast("bigint").alias("n_loop_turns"),
        )
        .orderBy("tool")
    )


def conv_depth_hist(turns: DataFrame) -> DataFrame:
    """Log2-bucketed conversation-depth histogram: how many conversations
    have 1, 2-3, 4-7, 8-15, ... turns, and how much token mass each depth
    band holds.

    The first chart on any transcript-corpus dashboard — packing
    efficiency, truncation budgets, and curriculum phases all key off the
    depth distribution. Bucket = floor(log2(n_turns)); depth_min = 2^b.

    Scale shape: per-conv aggregate (count + token sum) on conv_id, then
    a second aggregate over at most ~40 buckets — the second exchange
    carries one row per conversation, no text.
    """
    from .textstats import ws_token_count_expr

    per_conv = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(ws_token_count_expr(F.col("text"))).alias("toks"),
    )
    bucket = F.floor(F.log2("n_turns")).cast("int")
    return (
        per_conv.select(bucket.alias("bucket"), "n_turns", "toks")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("n_turns").alias("total_turns"),
            F.sum("toks").alias("total_tokens"),
        )
        .withColumn("depth_min", F.pow(F.lit(2.0), F.col("bucket")).cast("long"))
        .select("bucket", "depth_min", "n_convs", "total_turns", "total_tokens")
        .orderBy("bucket")
    )


def conv_outcomes(parsed: DataFrame) -> DataFrame:
    """How conversations END: the last turn's role and error level,
    counted across the corpus.

    The triage table for agent reliability — "what fraction of
    conversations end on an unanswered tool call or an ERROR line" is
    the first question asked of any transcript corpus, and SFT filtering
    usually drops conversations that end mid-exchange. Output:
    (last_role, last_level, n_convs, avg_turns), level NONE when the
    final turn carries no level field.

    Scale shape: a single struct-max aggregate per conversation (max on
    (turn_idx, role, level) — turn_idx is unique per conv so the max is
    the last turn; no window, no second corpus shuffle), then an
    outcome-cardinality aggregate.
    """
    last = parsed.groupBy("conv_id").agg(
        F.max(F.struct("turn_idx", "role", "level")).alias("s"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    return (
        last.select(
            F.col("s.role").alias("last_role"),
            F.coalesce(F.col("s.level"), F.lit("NONE")).alias("last_level"),
            "n_turns",
        )
        .groupBy("last_role", "last_level")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.round(F.avg("n_turns"), 2).alias("avg_turns"),
        )
        .orderBy("last_role", "last_level")
    )


def system_prompt_stats(turns: DataFrame, k: int = 20) -> DataFrame:
    """Top-k system prompts by conversation count: group conversations by
    the normalized fingerprint of their turn-0 SYSTEM text and report how
    many conversations share each prompt and how long those conversations
    run.

    The deployment-mix census (which system prompts drive the traffic)
    and the over-weighting check before SFT: a prompt shared by 10^5
    conversations contributes 10^5 near-identical openings unless
    downsampled. Complementary to boilerplate_turns (any turn repeated
    across conversations) and prefix_sharing (fingerprint CHAINS at every
    depth): this keys specifically on the opening system turn.

    Output: (example, n_convs, avg_turns), n_convs desc / example asc,
    limit k.

    Scale shape: per-conv turn counts and the system-turn fingerprint
    both aggregate on conv_id (co-partitioned equi-join, no extra
    exchange shape at scale on a conv-bucketed table); the prompt-level
    aggregate keys on the fingerprint — prompt cardinality, not corpus —
    and orderBy+limit folds to TakeOrderedAndProject.
    """
    from .textstats import fingerprint_expr

    sys_turns = turns.filter(
        (F.col("turn_idx") == 0) & (F.col("role") == "system")
    ).select(
        "conv_id",
        fingerprint_expr(F.col("text")).alias("fp"),
        F.col("text"),
    )
    n_turns = turns.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    return (
        sys_turns.join(n_turns, "conv_id")
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.round(F.avg("n_turns"), 2).alias("avg_turns"),
            F.min("text").alias("example"),
        )
        .orderBy(F.col("n_convs").desc(), F.col("example"))
        .limit(k)
        .select("example", "n_convs", "avg_turns")
    )
