"""Aggregate stage — posting-count summaries with heavy-hitter skew salting.

Reference analog: A1, the inverted-index build
(/root/reference/src/commands/index.go:159-179): Bluge tokenizes each field
per its analyzer and accumulates term->postings. The materialized equivalent
is ``GROUP BY sink, conv_id, term -> count`` — per-sink, per-conversation
posting counts (BASELINE.json north_star).

Skew design (the north rule's "hash aggregates over salted keys"):

conv_id is Zipf-skewed (two hot convs own ~40% of turns in the test view;
worse at 10^12 turns). For a COUNT aggregate, Spark's partial aggregation
(map-side combine) already bounds any reducer's input to at most
#map-partitions rows per (group, term) key — so blanket salting is not just
unnecessary, it is actively harmful: salting EVERY key by N multiplies the
partial-agg hash-map cardinality by up to N (measured: the map stops
combining, BytesToBytesMap.growAndRehash dominates task CPU, and the
stage-1 shuffle approaches the un-aggregated explode size). Round 1 shipped
that blanket-salt version and it was the single largest CPU sink in the
pipeline.

What salting IS for: (a) keys hot enough that even #map-partitions partial
rows overload one reducer (requires huge clusters + extreme skew), and
(b) non-combinable aggregates (collect_list/set). We therefore salt ONLY
detected heavy-hitter keys:

    1. driver-side sample job (fraction, fixed seed) estimates key shares;
       keys above ``hot_share`` of the sample are heavy hitters. This is
       scale-free — no full count, the sample is a tiny scan, and the hot
       set is broadcast as a literal IN-list (bounded by ``max_hot``).
    2. stage 1: groupBy(group, term, salt) where salt = hash(salt_col) % N
       for hot keys, 0 otherwise -> partial counts. Cold keys aggregate
       fully here; hot keys split across <= N reducers.
    3. stage 2: groupBy(group, term) -> sum. Input is ~result-sized.

``hot_keys=None`` (plain single-shuffle agg) and an explicit key list are
also supported; tests pin all modes to identical results.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize

DEFAULT_NSALT = 16
# heavy-hitter threshold: a key owning > 1/(2 * shuffle partitions) of the
# data can straggle a reducer; below that, partial agg absorbs it.
DEFAULT_HOT_SHARE = 1.0 / 64
DEFAULT_SAMPLE_FRACTION = 0.01
MAX_HOT_KEYS = 64


def detect_hot_keys(
    df: DataFrame,
    key_col: str,
    hot_share: float = DEFAULT_HOT_SHARE,
    sample_fraction: float = DEFAULT_SAMPLE_FRACTION,
    max_hot: int = MAX_HOT_KEYS,
) -> list:
    """Sample-estimate heavy-hitter keys (driver-side, one tiny job).

    Scale-free: works off key shares within the sample, so no full count of
    the input is needed; seed fixed for determinism.
    """
    def hot_at(fraction: float) -> tuple[list, int]:
        sample = df.select(key_col).sample(fraction=fraction, seed=42)
        counts = sample.groupBy(key_col).agg(F.count(F.lit(1)).alias("c"))
        # top-(max_hot) sampled keys; the sample total comes from a scalar
        # aggregate over the (already tiny) per-key counts — NOT a window
        # over an empty partitionBy, which would funnel every distinct
        # sampled key through ONE task (VERDICT r02: at 10^9 conversations
        # that single-partition WindowExec is a serial bottleneck gating
        # the hot-path aggregate).
        rows = counts.orderBy(F.col("c").desc(), F.col(key_col)).limit(max_hot).collect()
        total_row = counts.agg(F.sum("c").alias("t")).collect()[0]
        total = total_row["t"] or 0
        hot = [r[0] for r in rows if r["c"] > total * hot_share]
        return hot, total

    hot, total = hot_at(sample_fraction)
    if total < 1000 and sample_fraction < 1.0:
        # sample too small to estimate shares (tiny inputs): use everything
        hot, _ = hot_at(1.0)
    return hot


def _terms(
    df: DataFrame, group_cols: tuple[str, ...], text_col: str, tokenizer: str,
    extra: list | None = None,
) -> DataFrame:
    """Exploded (group..., term) rows.

    Hot-path discipline: the empty-token filter runs AFTER the explode as a
    plain scalar predicate. Filtering inside the array with the
    ``filter(arr, lambda)`` higher-order function would knock the whole
    Generate out of whole-stage codegen into interpreted eval
    (ArrayFilter.eval per row) — measured 30-50x slower on this stage.
    """
    return df.select(
        *group_cols,
        *(extra or []),
        F.explode(tokenize(F.col(text_col), tokenizer, keep_empty=True)).alias("term"),
    ).filter(F.col("term") != "")


def term_counts(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("sink", "conv_id"),
    text_col: str = "text",
    tokenizer: str = "default",
    nsalt: int = DEFAULT_NSALT,
    salt_col: str = "turn_idx",
    skew_col: str = "conv_id",
    hot_keys: str | Iterable | None = "auto",
    num_partitions: int | None = None,
) -> DataFrame:
    """(group..., term) -> cnt posting counts, skew-split into a
    pre-partitioned cold branch and a salted two-stage hot branch.

    ``num_partitions`` sizes the cold-branch exchange; it bounds per-task
    aggregation-state (distinct groups per task ~ total_groups /
    num_partitions). On this sandbox hash-agg throughput falls off a cliff
    beyond ~10^5 in-flight groups per task (BytesToBytesMap growth +
    page-fault cost), so size it to data, not to cores: default
    2 x defaultParallelism, and callers benchmarking across parallelism
    levels should pin it (identical plan at N and 4N cores).

    Why not one big groupBy: (conv_id, term) is a NEAR-UNIQUE key — posting
    counts are almost input-sized, so partial aggregation combines nothing
    while its per-task hash map holds hundreds of thousands of string keys
    (measured on this sandbox: a plain groupBy over 55M exploded tokens ran
    >30x slower than the shape below purely on BytesToBytesMap growth/spill;
    the map stage's FastHashMap/BytesToBytesMap dominated task CPU).

    Shape (cold keys — everything but detected heavy hitters):
        repartition(skew_col) of the COMPACT pre-explode rows (shuffle
        payload = the text column once, not 40x exploded tokens), then
        explode + aggregate. HashPartitioning(conv_id) satisfies the
        ClusteredDistribution of (group..., term), so Catalyst fuses
        partial+final into ONE stage after the exchange — no intermediate
        shuffle of the near-input-sized aggregate. At 100 TB the same plan
        is exchange-free if the Iceberg table is bucketed by conv_id.

    Shape (hot keys — the Zipf head, north rule "salted keys"):
        hot conversations are few, so their (conv, term) domain is small
        and REPEATS heavily — exactly where partial agg + salting shine:
        stage 1 groupBy(group..., term, salt = hash(salt_col) % nsalt)
        bounds any reducer's share of a hot conv to 1/nsalt; stage 2
        re-sums. Without the split, one task would own 20%+ of all turns.

    The union of both branches scans the input twice; the scan is the cheap
    part (column-pruned compact rows) and the hot predicate is pushed to
    the scan. Results are identical across modes (pinned by tests).
    """
    if hot_keys == "auto" and skew_col in df.columns:
        hot_keys = detect_hot_keys(df, skew_col)
    elif hot_keys == "auto":
        hot_keys = None
    # nsalt <= 1 means "no salting": clear the hot set so hot rows stay in
    # the cold branch instead of being filtered out and never re-added
    # (ADVICE r02: the early cold-only return silently dropped every row
    # of the hottest keys when a caller passed nsalt=1).
    hot = list(hot_keys) if hot_keys and nsalt > 1 else []

    if skew_col not in df.columns:
        # low-cardinality grouping (no per-conversation key): plain hash
        # agg; partial aggregation does the heavy lifting.
        return _terms(df, group_cols, text_col, tokenizer).groupBy(
            *group_cols, "term"
        ).agg(F.count(F.lit(1)).alias("cnt"))

    # null-safe complement: a NULL skew key must land in the cold branch,
    # not be dropped by three-valued logic
    nparts = num_partitions or 2 * df.sparkSession.sparkContext.defaultParallelism
    cold_src = (
        df.filter(~F.coalesce(F.col(skew_col).isin(*hot), F.lit(False))) if hot else df
    )
    cold = _terms(cold_src.repartition(nparts, skew_col), group_cols, text_col, tokenizer)
    cold_agg = cold.groupBy(*group_cols, "term").agg(F.count(F.lit(1)).alias("cnt"))
    if not hot:
        return cold_agg

    hot_src = df.filter(F.col(skew_col).isin(*hot))
    hot_terms = _terms(
        hot_src, group_cols, text_col, tokenizer,
        extra=[F.pmod(F.hash(salt_col), F.lit(nsalt)).alias("_salt")],
    )
    stage1 = hot_terms.groupBy(*group_cols, "term", "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    hot_agg = stage1.groupBy(*group_cols, "term").agg(F.sum("_partial").alias("cnt"))
    merged = cold_agg.unionByName(hot_agg)
    if skew_col not in group_cols:
        # the branch split keyed on skew_col, so when it is NOT a group
        # key the cold and hot branches can each emit a row for the same
        # (group..., term) — re-aggregate the (result-sized) union
        # (ADVICE r02: unionByName alone returned duplicate group keys).
        merged = merged.groupBy(*group_cols, "term").agg(F.sum("cnt").alias("cnt"))
    return merged


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
