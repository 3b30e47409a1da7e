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

from ..functions.tokenize import tokenize
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


def dialog_stats(turns: DataFrame) -> DataFrame:
    """Per-conversation dialogue-composition stats: (conv_id, n_turns,
    n_user, n_assistant, n_tool, max_tool_chain, assistant_tokens).

    max_tool_chain = the longest run of consecutive tool turns (agentic
    tool-call chains) via the gaps-and-islands trick: within a
    conversation, consecutive tool turns share (turn_idx - row_number)
    — one extra window over the tool subset only, then a tiny
    per-(conv, island) count. Everything shuffles on conv_id, so all
    three jobs co-partition.
    """
    base = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("long")).alias("n_assistant"),
        F.sum((F.col("role") == "tool").cast("long")).alias("n_tool"),
        F.sum(
            F.when(
                F.col("role") == "assistant",
                ws_token_count_expr(F.col("text")).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("assistant_tokens"),
    )
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    islands = (
        turns.filter(F.col("role") == "tool")
        .select(
            "conv_id",
            "turn_idx",
            (F.col("turn_idx") - F.row_number().over(w)).alias("_isl"),
        )
        .groupBy("conv_id", "_isl")
        .agg(F.count(F.lit(1)).alias("_chain"))
        .groupBy("conv_id")
        .agg(F.max("_chain").alias("max_tool_chain"))
    )
    return (
        base.join(islands, "conv_id", "left")
        .withColumn("max_tool_chain", F.coalesce("max_tool_chain", F.lit(0)))
        .orderBy("conv_id")
    )


def sft_pairs(turns: DataFrame) -> DataFrame:
    """SFT-example extraction summary: adjacent (user -> assistant) turn
    pairs are the unit every supervised-fine-tuning pipeline exports.
    Output per conversation: (conv_id, n_pairs, prompt_tokens,
    completion_tokens); conversations with no extractable pair are
    omitted (nothing to export).

    One lag() window on the same (conv_id, turn_idx) ordering as the
    rest of the chatformat suite; the aggregate reuses the partitioning.
    """
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    tok = ws_token_count_expr(F.col("text")).cast("long")
    flagged = turns.select(
        "conv_id",
        "role",
        tok.alias("_tok"),
        F.lag("role").over(w).alias("_prev_role"),
        F.lag(tok).over(w).alias("_prev_tok"),
    )
    pairs = flagged.filter(
        (F.col("role") == "assistant") & (F.col("_prev_role") == "user")
    )
    return (
        pairs.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("_prev_tok").alias("prompt_tokens"),
            F.sum("_tok").alias("completion_tokens"),
        )
        .orderBy("conv_id")
    )


def pii_redact_report(turns: DataFrame) -> DataFrame:
    """Per-role PII redaction report: (role, n_turns, n_redacted,
    chars_before, chars_after) after scrubbing emails then IPv4s
    (textstats.pii_scrub_expr — order is deterministic because the email
    pattern can consume a dotted quad).

    Pure map-side expressions + one partial-agg'd groupBy on a
    cardinality-4 key: the scan is the whole cost at 100 TB, as a
    redaction audit should be.
    """
    from .textstats import pii_scrub_expr

    red = turns.select(
        "role",
        F.length("text").alias("_before"),
        F.length(pii_scrub_expr(F.col("text"))).alias("_after"),
        (pii_scrub_expr(F.col("text")) != F.col("text")).alias("_hit"),
    )
    return (
        red.groupBy("role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("_hit").cast("long")).alias("n_redacted"),
            F.sum(F.col("_before").cast("long")).alias("chars_before"),
            F.sum(F.col("_after").cast("long")).alias("chars_after"),
        )
        .orderBy("role")
    )


def preference_pairs(turns: DataFrame) -> DataFrame:
    """Preference-pair (chosen/rejected) extraction summary: for every
    conversation with >= 2 assistant turns, pair the longest assistant
    turn (chosen) with the shortest (rejected) — the deterministic
    length-proxy pairing DPO/RLHF bootstraps use when no reward model
    has scored the corpus yet. Ties break toward the EARLIER turn for
    chosen and the LATER turn for rejected, so a conversation whose
    assistant turns all tie still yields a valid (distinct) pair.

    One hash aggregate on conv_id — chosen and rejected are struct
    min/max over (tokens, -turn_idx), so there is NO window and the
    single exchange carries two small structs per conversation, never
    text.

    Output: (conv_id, chosen_turn, rejected_turn, chosen_tokens,
    rejected_tokens, margin), conv_id asc.
    """
    tok = ws_token_count_expr(F.col("text")).cast("long")
    a = turns.filter(F.col("role") == "assistant").select(
        "conv_id",
        F.struct(tok.alias("t"), (-F.col("turn_idx")).alias("nti")).alias("s"),
    )
    agg = a.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max("s").alias("_c"),  # max tokens, then earliest turn
        F.min("s").alias("_r"),  # min tokens, then latest turn
    )
    return (
        agg.filter(F.col("_n") >= 2)
        .select(
            "conv_id",
            (-F.col("_c.nti")).cast("int").alias("chosen_turn"),
            (-F.col("_r.nti")).cast("int").alias("rejected_turn"),
            F.col("_c.t").alias("chosen_tokens"),
            F.col("_r.t").alias("rejected_tokens"),
            (F.col("_c.t") - F.col("_r.t")).alias("margin"),
        )
        .orderBy("conv_id")
    )


def loss_mask_spans(turns: DataFrame) -> DataFrame:
    """SFT loss-mask span computation: per conversation, concatenate the
    turns in turn_idx order joined by single newlines, and emit for each
    ASSISTANT turn its [start_char, end_char) offsets inside that packed
    string — exactly the spans a trainer masks loss ON (everything else
    is context). start = sum of length+1 over all earlier turns.

    One running-sum window over the same (conv_id, turn_idx) ordering as
    the rest of the chatformat suite — co-partitioned with every other
    per-conversation operator, no second shuffle, nothing but (conv_id,
    turn_idx, two ints) in the output.

    Output: (conv_id, turn_idx, start_char, end_char), ordered.
    """
    w = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    start = F.coalesce(
        F.sum(F.length("text") + F.lit(1)).over(w), F.lit(0)
    ).cast("long")
    return (
        turns.select(
            "conv_id",
            "turn_idx",
            "role",
            start.alias("start_char"),
            (start + F.length("text")).cast("long").alias("end_char"),
        )
        .filter(F.col("role") == "assistant")
        .drop("role")
        .orderBy("conv_id", "turn_idx")
    )


def contrastive_pairs(
    turns: DataFrame,
    n_buckets_hex: int = 2,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """Mine (anchor, positive, negative) triples for contrastive
    retriever training: anchor = a user turn, positive = the assistant
    turn that immediately answers it, negative = a deterministic
    assistant turn from a DIFFERENT conversation.

    Negative selection must be (a) deterministic across reruns and
    cluster sizes and (b) free of corpus-sized shuffles. Scheme: every
    assistant turn hashes to one of 16^n_buckets_hex buckets
    (md5(conv#idx) prefix); per bucket the TWO smallest-hash turns from
    distinct conversations are kept (a 256-row broadcast table), and an
    anchor takes its own bucket's first representative — or the second
    when the first shares the anchor's conversation. Per-bucket top-2 is
    one hash aggregate; the assignment is a broadcast join. No window
    touches the corpus.

    Output (conv_id asc, anchor_idx asc): (conv_id, anchor_idx,
    positive_idx, neg_conv_id, neg_idx). Anchors whose bucket offers no
    other-conversation representative (tiny corpora) are dropped.
    """
    w = W.partitionBy(conv_col).orderBy(idx_col)
    nxt_role = F.lead(role_col).over(w)
    nxt_idx = F.lead(idx_col).over(w)
    anchors = (
        turns.select(
            F.col(conv_col),
            F.col(idx_col),
            F.col(role_col),
            nxt_role.alias("_nr"),
            nxt_idx.alias("_ni"),
        )
        .filter((F.col(role_col) == "user") & (F.col("_nr") == "assistant"))
        .select(
            F.col(conv_col),
            F.col(idx_col).alias("anchor_idx"),
            F.col("_ni").alias("positive_idx"),
            F.substring(
                F.md5(
                    F.concat_ws("#", F.col(conv_col), F.col(idx_col)).cast("binary")
                ),
                1,
                n_buckets_hex,
            ).alias("bucket"),
        )
    )
    cand = turns.filter(F.col(role_col) == "assistant").select(
        F.col(conv_col).alias("neg_conv_id"),
        F.col(idx_col).alias("neg_idx"),
        F.md5(
            F.concat_ws("#", F.col(conv_col), F.col(idx_col)).cast("binary")
        ).alias("_h"),
    )
    # per (bucket, conv): best candidate, then per bucket: two best from
    # DISTINCT conversations — two bounded aggregates, output = one row
    # per bucket (<= 16^n_buckets_hex rows), broadcast below.
    per_conv = (
        cand.withColumn("bucket", F.substring("_h", 1, n_buckets_hex))
        .groupBy("bucket", "neg_conv_id")
        .agg(F.min(F.struct("_h", "neg_idx")).alias("b"))
    )
    rep_struct = F.struct(
        F.col("b._h").alias("_h"),
        F.col("neg_conv_id").alias("neg_conv_id"),
        F.col("b.neg_idx").alias("neg_idx"),
    )
    rep1 = per_conv.groupBy("bucket").agg(F.min(rep_struct).alias("r1"))
    # second representative = min over the bucket EXCLUDING rep1's conv —
    # a second bounded aggregate, never a per-bucket collect (a bucket's
    # distinct-conv count is corpus-sized at 10^12 turns).
    rep2 = (
        per_conv.join(F.broadcast(rep1), "bucket")
        .filter(F.col("neg_conv_id") != F.col("r1.neg_conv_id"))
        .groupBy("bucket")
        .agg(F.min(rep_struct).alias("r2"))
    )
    reps = rep1.join(rep2, "bucket", "left")
    joined = anchors.join(F.broadcast(reps), "bucket", "left")
    pick = F.when(
        F.col("r1.neg_conv_id") != F.col(conv_col), F.col("r1")
    ).otherwise(F.col("r2"))
    return (
        joined.select(
            F.col(conv_col),
            "anchor_idx",
            "positive_idx",
            pick["neg_conv_id"].alias("neg_conv_id"),
            pick["neg_idx"].alias("neg_idx"),
        )
        .filter(F.col("neg_conv_id").isNotNull())
        .orderBy(conv_col, "anchor_idx")
    )


def _adjacent_ua_pairs(turns: DataFrame, payload) -> DataFrame:
    """Adjacent (user → assistant) pairs carrying a per-turn payload
    expression: the ONE definition of "SFT pair adjacency" shared by
    echo_rate and response_ratio_stats.

    System/tool rows are pruned BEFORE the lead() window (their payloads
    never ride the exchange); adjacency stays exact because the lead row
    must sit at turn_idx + 1 — a pair only forms when the assistant turn
    directly follows the user turn with nothing between. Returns rows
    (conv_id, turn_idx, p, next_p) where p is the user turn's payload
    and next_p the answering assistant turn's.
    """
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    return (
        turns.filter(F.col("role").isin("user", "assistant"))
        .select("conv_id", "turn_idx", "role", payload.alias("p"))
        .withColumn("next_role", F.lead("role").over(w))
        .withColumn("next_idx", F.lead("turn_idx").over(w))
        .withColumn("next_p", F.lead("p").over(w))
        .filter(
            (F.col("role") == "user")
            & (F.col("next_role") == "assistant")
            & (F.col("next_idx") == F.col("turn_idx") + 1)
        )
    )


def echo_rate(turns: DataFrame, min_user_tokens: int = 1) -> DataFrame:
    """Per-conversation prompt-echo report: how much of each user turn's
    vocabulary the directly-following assistant turn repeats.

    The standard SFT-hygiene screen for assistants that parrot the prompt
    instead of answering it: for every adjacent (user @ t, assistant @
    t+1) pair, echo = |distinct_tokens(user) ∩ distinct_tokens(assistant)|
    / |distinct_tokens(user)| — coverage of the user's tokens in the
    reply. Output: one row per conversation with the pair count and the
    mean/max echo, ordered by conv_id.

    Scale shape: a single lead() window over (conv_id, turn_idx) — state
    bounded by conversation length, not corpus size — feeding a
    partial+final hash aggregate on conv_id. System/tool turns are
    dropped BEFORE the window exchange (adjacency is still exact: the
    lead row must sit at turn_idx + 1, so a pair only forms when the
    assistant turn directly follows the user turn with nothing between),
    which keeps their token arrays off the shuffle entirely. No
    self-join (the naive formulation joins turns to turns on
    (conv_id, turn_idx+1), which shuffles the corpus twice).

    Reference parity: extension operator (build brief §training-pipeline);
    the reference's unit is a single log line (main.go:1) with no
    adjacent-turn semantics.
    """
    toks = F.array_distinct(tokenize(F.col("text"), "default"))
    paired = _adjacent_ua_pairs(turns, toks).filter(
        F.size("p") >= min_user_tokens
    )
    echo = F.size(F.array_intersect("p", "next_p")) / F.size("p").cast(
        "double"
    )
    return (
        paired.select("conv_id", echo.alias("echo"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("echo"), 4).alias("avg_echo"),
            F.round(F.max("echo"), 4).alias("max_echo"),
        )
        .orderBy("conv_id")
    )


def ctx_overflow(turns: DataFrame, budget: int = 120) -> DataFrame:
    """Per-conversation context-growth profile: where does the running
    (oldest-first) whitespace-token total first exceed the context
    budget?

    Complements context_truncate (which RETURNS the kept newest turns):
    this is the monitoring view a pipeline dashboards before choosing a
    budget — per conversation, the total turn/token count, the first
    overflowing turn_idx (NULL when the whole conversation fits), how
    many leading turns fit, and that count as a fraction.

    Scale shape: one forward running-sum window over (conv_id, turn_idx)
    fused with the final per-conv aggregate on the same key — a single
    exchange, and on a conv_id-bucketed table no exchange at all. Only
    (conv_id, turn_idx, n_tok) rides the shuffle, never text.
    """
    w = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tok = turns.select(
        "conv_id", "turn_idx", ws_token_count_expr(F.col("text")).alias("n_tok")
    )
    marked = tok.withColumn("cum", F.sum("n_tok").over(w))
    n_turns = F.count(F.lit(1))
    in_budget = F.sum(F.when(F.col("cum") <= budget, 1).otherwise(0))
    return (
        marked.groupBy("conv_id")
        .agg(
            n_turns.alias("n_turns"),
            F.sum("n_tok").alias("total_tokens"),
            F.min(F.when(F.col("cum") > budget, F.col("turn_idx"))).alias(
                "overflow_turn_idx"
            ),
            in_budget.alias("turns_in_budget"),
            F.round(in_budget / n_turns.cast("double"), 4).alias("frac_in_budget"),
        )
        .orderBy("conv_id")
    )


def turn_selfrep(turns: DataFrame) -> DataFrame:
    """Per-conversation assistant self-repetition: token-set Jaccard
    between each assistant turn and the PREVIOUS assistant turn in the
    same conversation (interleaved user/tool turns ignored).

    The screen for agents stuck restating themselves across turns —
    complementary to echo_rate (assistant parroting the USER) and to
    repetition_stats (token repetition INSIDE one text). Output: one row
    per conversation with >= 2 assistant turns: pair count, mean/max
    Jaccard, and the count of high-repetition pairs (> 0.5).

    Scale shape: the role filter prunes to assistant turns BEFORE the
    single lag() window over (conv_id, turn_idx) — state bounded by
    conversation length — then one partial+final aggregate on conv_id.
    """
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    toks = F.array_distinct(tokenize(F.col("text"), "default"))
    paired = (
        turns.filter(F.col("role") == "assistant")
        .select("conv_id", "turn_idx", toks.alias("toks"))
        .withColumn("prev_toks", F.lag("toks").over(w))
        .filter(F.col("prev_toks").isNotNull())
    )
    union_n = F.size(F.array_union("toks", "prev_toks"))
    jac = F.size(F.array_intersect("toks", "prev_toks")) / F.greatest(
        union_n, F.lit(1)
    ).cast("double")
    return (
        paired.select("conv_id", jac.alias("jac"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jac"), 4).alias("avg_selfrep"),
            F.round(F.max("jac"), 4).alias("max_selfrep"),
            F.sum((F.col("jac") > 0.5).cast("int")).alias("n_high"),
        )
        .orderBy("conv_id")
    )


def turn_position_profile(turns: DataFrame, n_buckets: int = 5) -> DataFrame:
    """Token mass by RELATIVE position inside the conversation: bucket
    turns into n_buckets quantile bands of turn_idx / n_turns and report
    each band's turn count, mean token length, and share of total token
    mass.

    The curve that decides truncation policy: if the final band holds
    most of the token mass, drop-oldest truncation is cheap; if mass is
    front-loaded (long system prompts / pasted context), it is not.

    Scale shape: n_turns comes from an unordered count() window over the
    conv_id partition — same single exchange the position math needs; the
    banding aggregate has n_buckets keys and the share denominator is a
    window over that n_buckets-row table (bounded by the band count, the
    safe kind of unpartitioned window).
    """
    w_conv = W.partitionBy("conv_id")
    tok = turns.select(
        "conv_id",
        "turn_idx",
        ws_token_count_expr(F.col("text")).alias("n_tok"),
    ).withColumn("n_turns", F.count(F.lit(1)).over(w_conv))
    bucket = F.least(
        F.floor(F.lit(n_buckets) * F.col("turn_idx") / F.col("n_turns")),
        F.lit(n_buckets - 1),
    ).cast("int")
    per_bucket = (
        tok.select(bucket.alias("bucket"), "n_tok")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
            F.sum("n_tok").alias("_toks"),
        )
    )
    total = F.sum("_toks").over(W.partitionBy())
    return (
        per_bucket.withColumn(
            "token_share", F.round(F.col("_toks") / total.cast("double"), 4)
        )
        .select("bucket", "n_turns", "avg_tokens", "token_share")
        .orderBy("bucket")
    )


def response_ratio_stats(turns: DataFrame) -> DataFrame:
    """Assistant-to-user length ratio over adjacent (user → assistant)
    pairs — the SFT screen for answers that are degenerately short (or
    pathologically long) relative to their prompt, complementary to
    echo_rate (which measures CONTENT overlap, not length).

    ratio = assistant_ws_tokens / max(user_ws_tokens, 1). Output: ONE
    row — (n_pairs, avg_ratio, p50_ratio, p95_ratio, frac_short) with
    frac_short = share of pairs whose ratio < 0.5.

    Scale shape: the shared _adjacent_ua_pairs pairing (system/tool rows
    pruned before the lead() window, exact next_idx = turn_idx + 1
    adjacency), with the shuffle carrying only two INTS per row (the
    token counts), then a single global aggregate.
    """
    paired = _adjacent_ua_pairs(turns, ws_token_count_expr(F.col("text")))
    ratio = F.col("next_p") / F.greatest(F.col("p"), F.lit(1)).cast("double")
    return paired.select(ratio.alias("r")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("r"), 4).alias("avg_ratio"),
        F.round(F.percentile(F.col("r"), F.lit(0.5)), 4).alias("p50_ratio"),
        F.round(F.percentile(F.col("r"), F.lit(0.95)), 4).alias("p95_ratio"),
        F.round(
            F.sum((F.col("r") < 0.5).cast("int"))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("frac_short"),
    )


def ctx_amplification(turns: DataFrame) -> DataFrame:
    """Context re-send amplification: a serving stack that resends the
    full history on every turn processes Σ_i cumsum_tokens(i) tokens for
    a conversation whose transcript holds only Σ tokens — the ratio is
    the cost multiplier that prefix caching (cf. prefix_sharing) or
    truncation (cf. context_truncate) must recover. Grows linearly in
    turn count for constant-length turns, so long conversations dominate
    serving cost quadratically while holding linear token mass.

    Output (conv_id asc): (conv_id, n_turns, total_tokens,
    resend_tokens, amplification) with amplification = resend / total
    to 2dp (1.0 for single-turn conversations; NULL for token-less
    ones).

    Scale shape: the same forward running-sum window as ctx_overflow
    fused with the per-conv aggregate on the same key — one exchange,
    (conv_id, turn_idx, n_tok) only.
    """
    w = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tok = turns.select(
        "conv_id", "turn_idx", ws_token_count_expr(F.col("text")).alias("n_tok")
    )
    marked = tok.withColumn("cum", F.sum("n_tok").over(w))
    return (
        marked.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("cum").alias("resend_tokens"),
            F.round(
                F.sum("cum")
                / F.nullif(F.sum("n_tok"), F.lit(0)).cast("double"),
                2,
            ).alias("amplification"),
        )
        .orderBy("conv_id")
    )
