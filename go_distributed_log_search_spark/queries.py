"""Spark-side query registry — one callable per operator from SURVEY.md §2
plus the training-pipeline extensions. Each callable: (spark, sf_dir) ->
DataFrame, with every computed column aliased to match oracles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from . import pipeline
from .operators import (
    aggregate,
    chatformat,
    dedup,
    parse,
    route,
    sampling,
    search,
    similarity,
    textstats,
)
from .operators import packing as packing_ops
from .transcripts import transcripts_df


def _t(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_df(spark, sf_dir)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ------------------------------------------------------------- pipeline

def q_pipeline_parse(spark, sf_dir):
    return parse.parse_turns(_t(spark, sf_dir), dynamic=False)


def q_route_counts(spark, sf_dir):
    return route.route_counts(pipeline.parsed_enriched(spark, sf_dir))


def q_agg_terms(spark, sf_dir):
    # single-sink slice: predicate pushed before the fan-out explode
    # (route.routed_sink docstring; row-identical to
    # routed(...).filter(sink = 'errors'), pinned in test_plans.py)
    tagged = route.routed_sink(pipeline.parsed_enriched(spark, sf_dir), "errors")
    return aggregate.term_counts(tagged)


def q_enrich(spark, sf_dir):
    enriched = pipeline.parsed_enriched(spark, sf_dir)
    return enriched.groupBy("role_kind", "tool_family").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.round(F.sum("score_weight"), 1).alias("weight_sum"),
    )


def q_ordering(spark, sf_dir):
    return aggregate.ordering_check(_t(spark, sf_dir))


def q_pivot_roles(spark, sf_dir):
    """Cross-tab via groupBy().pivot(): turns per (tool_family, role_kind)
    as one row per tool_family with a column per role kind. Pivot values
    are passed EXPLICITLY — without them Spark runs an extra distinct job
    to discover them (and the output schema would be data-dependent, which
    a 100 TB pipeline can't tolerate). Oracle = conditional-sum columns."""
    enriched = pipeline.parsed_enriched(spark, sf_dir)
    p = (
        enriched.groupBy("tool_family")
        .pivot("role_kind", ["control", "human", "agent"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "tool_family",
        F.coalesce("control", F.lit(0)).cast("long").alias("n_control"),
        F.coalesce("human", F.lit(0)).cast("long").alias("n_human"),
        F.coalesce("agent", F.lit(0)).cast("long").alias("n_agent"),
    )


def q_unpivot_roles(spark, sf_dir):
    """Unpivot (melt) — the inverse reshape of pivot_role_counts via the
    stack() generator: the wide (tool_family, n_control, n_human,
    n_agent) cross-tab back to long (tool_family, role_kind, n), zero
    cells included (they exist as columns in the wide form, so the melt
    preserves them — a plain group-by would not). stack expands map-side;
    no shuffle beyond the pivot's own."""
    wide = q_pivot_roles(spark, sf_dir)
    return wide.select(
        "tool_family",
        F.expr(
            "stack(3, 'control', n_control, 'human', n_human, "
            "'agent', n_agent) AS (role_kind, n)"
        ),
    )


def q_dynamic_fields(spark, sf_dir):
    """P1 leftover -> _dynamic: per-conv count of unclaimed kv OCCURRENCES
    (duplicate keys counted; F.size(_dynamic) would dedup — ADVICE r01)."""
    parsed = parse.parse_turns(_t(spark, sf_dir), dynamic=True)
    n_dyn = parse.unclaimed_kv_count_expr(F.col("text"))
    counted = parsed.select("conv_id", n_dyn.alias("_n_dyn"))
    return counted.groupBy("conv_id").agg(
        F.sum("_n_dyn").alias("dynamic_kv_total"),
        F.sum(F.when(F.col("_n_dyn") > 0, 1).otherwise(0)).alias("rows_with_dynamic"),
    )


def q_lineage_counts(spark, sf_dir):
    """A2 doc_count analog: per-(day, sink) routed row counts."""
    tagged = route.routed(pipeline.parsed_enriched(spark, sf_dir))
    return (
        tagged.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day", "sink")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


# --------------------------------------------------------------- search

def q_search_substring_topk(spark, sf_dir):
    parsed = parse.parse_turns(_t(spark, sf_dir), dynamic=False)
    top = search.substring_search(parsed, "error", limit=100)
    return top.select("conv_id", "turn_idx", "score")


def q_demo_e2e(spark, sf_dir):
    """Reference README Quick Demo (README.md:56-66): create schema from
    YAML -> index the repo-local HDFS-shaped JSONL -> search "INFO" limit 3
    with nested-map +3 scoring. sf_dir-independent (committed fixture)."""
    del sf_dir
    from . import demo

    return demo.quick_demo(spark, query="INFO", limit=3)


def q_demo_search_struct(spark, sf_dir):
    """Struct-child scoring parity (search.go:225-243): "datanode" matches
    ``resource.service`` / ``attributes.class`` (+6 each via their LEAF
    names) alongside body (+10) — VERDICT r02 "What's missing" #2."""
    del sf_dir
    from . import demo

    return demo.quick_demo(spark, query="datanode", limit=10)


def q_demo_ingest_types(spark, sf_dir):
    """P2/P4/P5 wired into schema-driven ingest (field_parser.go:134-241,
    datetime.go:50-106): stringified tenant_id parsed to long, epoch
    second/millisecond and date/rfc3339 timestamps auto-scaled per the
    declared format order, client_ip canonicalized (invalid -> NULL)."""
    del sf_dir
    from . import demo

    schema = demo.create_index()
    docs = demo.index_jsonl(spark, schema, keep_corrupt=False)
    return docs.select(
        "tenant_id",
        F.col("timestamp").alias("ts"),
        "client_ip",
        "severity_text",
    )


def q_search_map_scoring(spark, sf_dir):
    """A3 nested-map scoring (search.go:245-253): +3 per matching _dynamic
    value, +10 for text, pinned against the DuckDB occurrence oracle."""
    parsed = parse.parse_turns(_t(spark, sf_dir), dynamic=True)
    hits = search.substring_search(
        parsed,
        "9000",
        limit=200,
        string_fields=["text"],
        map_fields=["_dynamic"],
        tiebreak=("conv_id", "turn_idx"),
    )
    return hits.select("conv_id", "turn_idx", "score")


def q_terms_raw(spark, sf_dir):
    """`raw` (keyword) tokenizer: whole trimmed value = one term
    (config/mod.go:53-58) — per-sink severity-level posting counts."""
    tagged = route.routed(pipeline.parsed_enriched(spark, sf_dir))
    return aggregate.term_counts(
        tagged, group_cols=("sink",), text_col="level", tokenizer="raw",
        skew_col=None, hot_keys=None,
    )


def q_terms_whitespace(spark, sf_dir):
    """`whitespace` tokenizer: split on whitespace runs, case preserved —
    per-sink posting counts over the errors sink."""
    tagged = route.routed_sink(pipeline.parsed_enriched(spark, sf_dir), "errors")
    return aggregate.term_counts(
        tagged,
        group_cols=("sink",), text_col="text", tokenizer="whitespace",
        skew_col=None, hot_keys=None,
    )


def q_search_field_query(spark, sf_dir):
    parsed = parse.parse_turns(_t(spark, sf_dir), dynamic=False)
    hits = search.field_query_search(parsed, "op:HDFS_WRITE AND duration:[10 TO 50}")
    return hits.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_hits"))


def q_search_bool_not(spark, sf_dir):
    parsed = parse.parse_turns(_t(spark, sf_dir), dynamic=False)
    hits = search.field_query_search(
        parsed, "level:ERROR AND NOT error_signature:OutOfMemoryError OR level:WARN"
    )
    return hits.groupBy("level", "error_signature").agg(F.count(F.lit(1)).alias("n"))


# ------------------------------------------------------------ textstats

def q_lang_id(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    pred = docs.select(
        "lang", textstats.lang_id_expr(F.col("text")).alias("predicted")
    )
    return pred.groupBy("lang", "predicted").agg(F.count(F.lit(1)).alias("n"))


def q_quality(spark, sf_dir):
    q = textstats.quality_features(_docs(spark, sf_dir))
    return q.groupBy("quality_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("punct_ratio"), 4).alias("avg_punct"),
        F.round(F.avg("stopword_ratio"), 4).alias("avg_stopword"),
        F.round(F.avg("avg_token_len"), 4).alias("avg_tok_len"),
    )


def q_token_stats(spark, sf_dir):
    return textstats.token_stats(_docs(spark, sf_dir), "source")


def q_token_budget(spark, sf_dir):
    """LLM token-budget estimators per source: whitespace count + BPE-ish
    (GPT-2 pre-tokenizer piece) count; ratio from integer sums."""
    docs = _docs(spark, sf_dir)
    counted = docs.select(
        "source",
        textstats.ws_token_count_expr(F.col("text")).alias("_ws"),
        textstats.bpe_token_count_expr(F.col("text")).alias("_bpe"),
    )
    return counted.groupBy("source").agg(
        F.sum("_ws").alias("ws_tokens"),
        F.sum("_bpe").alias("bpe_tokens"),
        F.round(F.sum("_bpe") / F.sum("_ws"), 4).alias("bpe_per_ws"),
    )


def q_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL++) next to the exact count per source —
    the clearly-labeled extension SURVEY §2.4 anticipates (Bluge embeds
    HLL but the reference never exposes it). Rows-only: the sketch
    estimate is engine-specific; relative error pinned in tests."""
    docs = _docs(spark, sf_dir)
    return docs.groupBy("source").agg(
        F.countDistinct("text").alias("exact_distinct"),
        F.approx_count_distinct("text", 0.02).alias("approx_distinct"),
    )


def q_fingerprint(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs.groupBy("source").agg(
        F.countDistinct(textstats.fingerprint_expr(F.col("text"))).alias("n_fingerprints"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# ---------------------------------------------------------------- dedup

def q_dedup_exact(spark, sf_dir):
    """Exact dup groups in transcript text (WARN template rows collide by
    construction: events e and e+n_docs share doc_text and WARN prefix)."""
    return dedup.exact_dedup(_t(spark, sf_dir), id_col="conv_id", text_col="text")


def q_jaccard_adjacent(spark, sf_dir):
    return dedup.jaccard_adjacent(_docs(spark, sf_dir), n=3)


def q_minhash_lsh(spark, sf_dir):
    """MinHash + banded LSH near-dup pairs, oracle-checked END TO END
    (VERDICT r02 "what's missing" #5 — was rows-only): the ``md5_60``
    hash variant makes every stage — exact-dup collapse, per-permutation
    60-bit shingle hash, banded bucket hash, candidate join, exact-Jaccard
    verify — expressible identically in DuckDB SQL. xxhash64 stays the
    default scale path (pinned against this kernel in
    test_dedup_similarity)."""
    return dedup.minhash_lsh_dedup(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        threshold=0.8, hash_impl="md5_60",
    )


def q_simhash(spark, sf_dir):
    """SimHash blocked near-dup pairs, oracle-checked END TO END: the
    md5_60 hash variant makes every stage (token hash bits, majority
    vote, 15-bit-block candidates, hamming) expressible identically in
    DuckDB SQL (VERDICT r02 task 6 — was rows-only)."""
    return (
        dedup.simhash_dedup(_docs(spark, sf_dir), max_hamming=16, hash_impl="md5_60")
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER collapse: connected components (iterative
    min-label propagation, operators/dedup.py:connected_components) over
    the simhash md5_60 pair graph; oracle = DuckDB recursive-CTE
    transitive closure. The step that turns pairwise near-dup hits into
    keep-one-per-cluster training-set decisions."""
    pairs = dedup.simhash_dedup(
        _docs(spark, sf_dir), max_hamming=16, hash_impl="md5_60"
    )
    return dedup.dedup_clusters(pairs)


# ----------------------------------------------------------- similarity

def q_knn_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.brute_force_topk(emb, queries, k=5)


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact verify kernel; LSH banding is
    the candidate generator at scale). Threshold tuned to the synthetic
    corpus (random vectors — no true dups, so the tail of the cosine
    distribution stands in)."""
    return similarity.cosine_neardup_pairs(_emb(spark, sf_dir), threshold=0.35)


def q_lsh_ann(spark, sf_dir):
    """LSH-ANN top-5 — now FULLY oracle-checked: the hyperplanes are a
    deterministic splitmix hash (no RNG state), so the oracle embeds the
    same ±1 plane matrix as literals and replays signature → bands →
    bucket join → exact re-rank in SQL."""
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.lsh_bucketed_topk(emb, queries, dim=dim, k=5)


def q_ivf_ann(spark, sf_dir):
    """IVF-Flat ANN top-5 (the build brief's 'IVF variant as the scale
    path'): deterministic seed centroids (smallest vec_ids >= 10), corpus
    tagged with its nearest cell in one scan, queries probe their 2 nearest
    cells, exact cosine re-rank inside probed cells. Fully oracle-checked —
    the seed rule is ORDER BY id LIMIT n, so DuckDB reconstructs identical
    centroids and replays assign -> probe -> join -> re-rank in SQL."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(emb, queries, n_cells=8, nprobe=2, k=5)


# ----------------------------------------------------------- multimodal

def q_media_metadata(spark, sf_dir):
    """Multimodal metadata aggregate — must never read the payload blob
    (plan pruning asserted in tests/test_multimodal.py)."""
    from .operators import multimodal

    media = multimodal.synth_media_df(spark, _docs(spark, sf_dir))
    return multimodal.metadata_only_projection(media)


def q_media_features(spark, sf_dir):
    """mapInPandas decode plumbing over the deterministic fake kernel:
    Arrow batches in, features out, blob never returns."""
    from .operators import multimodal

    media = multimodal.synth_media_df(spark, _docs(spark, sf_dir))
    feats = multimodal.extract_features(media, fake=True)
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("width").alias("max_w"),
    )


# ------------------------------------------------- relational / TPC-H-ish

def q_tpch_q1(spark, sf_dir):
    # accumulate in DECIMAL (order-independent across engines), but EMIT
    # double: the driver's value hash disagrees with itself on decimal
    # output columns even when values are repr-identical (VERDICT r02
    # adjudication), and decimal->double is a deterministic nearest-round
    # in both Spark and DuckDB.
    li = _tbl(spark, sf_dir, "lineitem")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(d2("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d2("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join_topk(spark, sf_dir):
    """Broadcast-dim join chain + true top-k (TakeOrderedAndProject)."""
    orders = _tbl(spark, sf_dir, "orders")
    cust = _tbl(spark, sf_dir, "customer")
    nation = _tbl(spark, sf_dir, "nation")
    j = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return (
        j.select(
            "o_orderkey",
            "n_name",
            F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
        )
        .orderBy(F.col("total").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def q_window_top_order(spark, sf_dir):
    orders = _tbl(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            # decimal quantize for cross-engine determinism, double out
            # (driver-hash decimal artifact, VERDICT r02)
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("best_price"),
        )
    )


def q_set_ops(spark, sf_dir):
    orders = _tbl(spark, sf_dir, "orders")
    o_open = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    o_done = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    both = o_open.intersect(o_done)
    only_open = o_open.distinct().exceptAll(o_done.distinct())
    return both.withColumn("kind", F.lit("both")).unionAll(
        only_open.withColumn("kind", F.lit("only_open"))
    )


def q_asof_join(spark, sf_dir):
    """As-of join (custom operator — Spark has no native one): each event
    matched to the customer's most recent order at or before the event;
    oracle = DuckDB's native ASOF JOIN. Aggregated per event_type for a
    bounded result."""
    from .operators.asof import as_of_join

    ev = _tbl(spark, sf_dir, "events").withColumnRenamed("user_id", "custkey")
    orders = (
        _tbl(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate"),
            F.col("o_totalprice"),
        )
    )
    joined = as_of_join(
        ev, orders, on="custkey", left_ts="ts", right_ts="o_orderdate",
        value_cols=["o_orderdate", "o_totalprice"],
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("n_unmatched"),
        # decimal sum: double addition is order-dependent across engines
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(30,2)")
        .alias("matched_total"),
    )


def q_range_join(spark, sf_dir):
    """Bucketed range join (equi-join on (key, time-bucket) + exact range
    filter — never a nested loop): each event paired with the same user's
    OTHER events within +/- 30 minutes (co-session activity). Oracle =
    DuckDB's inequality self-join (IEJoin)."""
    from .operators.asof import range_join

    ev = _tbl(spark, sf_dir, "events")
    other = ev.select(
        "user_id", F.col("ts").alias("ts2"), F.col("event_id").alias("other_id")
    )
    pairs = range_join(
        ev, other, on="user_id", left_ts="ts", right_ts="ts2",
        lower_sec=-1800, upper_sec=1800, value_cols=["other_id"],
    ).filter(F.col("other_id") != F.col("event_id"))
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("other_id").alias("n_other"),
    )


def q_bm25_topk(spark, sf_dir):
    """BM25 top-20 for a 3-term query over documents — the ranking layer
    Bluge runs inside its index, as explicit DataFrame algebra with a
    DuckDB formula-twin oracle."""
    return search.bm25_topk(
        _docs(spark, sf_dir), ["hash", "filter", "slow"], k=20
    )


def q_phrase_search(spark, sf_dir):
    """Positional phrase query ("key scan") over documents — the
    capability the reference's `pos` record option stores positions for
    (config/text.go:7-11); top-20 docs by occurrence count."""
    return search.phrase_topk(_docs(spark, sf_dir), ["key", "scan"], k=20)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination audit: doc_id % 11 == 0 plays the
    held-out eval suite; per-source contamination counts under the
    5-gram-overlap rule."""
    from .operators.dedup import decontaminate_stats

    docs = _docs(spark, sf_dir)
    ev = docs.filter(F.col("doc_id") % 11 == 0)
    corpus = docs.filter(F.col("doc_id") % 11 != 0)
    return decontaminate_stats(corpus, ev, n=5)


def q_kmeans_clusters(spark, sf_dir):
    """Distributed Lloyd k-means (k=8, 2 iterations, deterministic
    lowest-id init) over embeddings; per-cluster audit table. Oracle
    replays both iterations as SQL CTEs."""
    from .operators.cluster import kmeans

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans(emb, k=8, iters=2)


def q_vocab_oov(spark, sf_dir):
    """Top-16 vocabulary + per-source OOV audit (the 16-term boundary
    falls inside a frequency tie, pinning the (count desc, term asc)
    tie-break in both engines)."""
    from .operators.textstats import vocab_oov_stats

    return vocab_oov_stats(_docs(spark, sf_dir), vocab_size=16)


def q_corpus_build(spark, sf_dir):
    """End-to-end corpus build (scrub -> dedup -> split -> pack) as ONE
    chained oracle: per-split docs/packs/tokens. The 'a user could run
    their whole training-data build here' query."""
    from .corpus import corpus_build

    return corpus_build(_docs(spark, sf_dir), budget=512)


def q_conv_assembly(spark, sf_dir):
    """Conversation reassembly under stable turn ordering — the north
    rule's 'per-turn text equality' invariant as an oracle query: every
    conversation's turns concatenated in turn_idx order and md5-hashed.
    A single out-of-order or byte-different turn anywhere in the corpus
    flips its conversation's hash. sort_array on (turn_idx, text) structs
    keeps the whole assembly JVM-side (no window, one shuffle).

    Scale note: collect_list holds one conversation per group in memory —
    fine for real conversations (bounded turn counts), not for the Zipf
    head at 10^12 turns. There, segment to (conv_id, turn_idx // B)
    chunks, assemble chunks independently, and hash the ordered chunk-
    hash sequence — an equally strong equality invariant (any reordered
    or altered turn still flips the final hash) with bounded group state.
    """
    t = _t(spark, sf_dir)
    assembled = (
        t.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s["text"],
                ),
                "\n",
            ).alias("_full"),
        )
        .select("conv_id", "n_turns", F.md5("_full").alias("text_md5"))
    )
    return assembled


def q_incremental_dedup(spark, sf_dir):
    """Bloom-prefiltered incremental dedup: batch (doc_id % 3 != 0)
    against corpus (doc_id % 3 == 0). The bloom sketch is probabilistic
    but the OUTPUT is exact (maybes are anti-join confirmed), so the
    oracle is a plain fingerprint anti-join."""
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    return dedup.incremental_dedup(corpus, batch).select("doc_id")


def q_pack_sequences(spark, sf_dir):
    """Greedy context-window packing (budget 256 whitespace tokens) per
    source, summarized per pack; oracle = DuckDB recursive-CTE replay of
    the same next-fit rule. The custom-operator (b)-tier showcase:
    sequential-within-stream semantics via applyInPandas."""
    from .operators import packing

    packed = packing.pack_sequences(_docs(spark, sf_dir), budget=256)
    return packing.pack_summary(packed)


def q_pii_stats(spark, sf_dir):
    """Per-source PII audit (email / IPv4 occurrence + affected-doc
    counts) with RE2-safe patterns that count identically in DuckDB —
    the scrub-before-training compliance pass, scan-bound by design."""
    return textstats.pii_stats(_docs(spark, sf_dir), "source")


def q_repetition(spark, sf_dir):
    """Per-source duplicate-3-gram audit: avg dup ratio + docs flagged
    over 0.2 — the boilerplate/degenerate-text quality signal."""
    return textstats.repetition_stats(_docs(spark, sf_dir), "source")


def q_stratified_sample(spark, sf_dir):
    """Per-source quota sampling (5 docs/source) on the portable md5(id)
    order — the corpus-mixture balancing step of a training-data build,
    deterministic across engines and cluster sizes."""
    from .operators import sampling

    return sampling.stratified_sample(_docs(spark, sf_dir), "source", "doc_id", quota=5)


def q_train_split(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test assignment (hash-mod buckets,
    no RNG state): per-(source, split) counts. Pure map-side projection —
    stable under reruns, resharding, and incremental appends."""
    from .operators import sampling

    return (
        sampling.split_assign(_docs(spark, sf_dir), "doc_id")
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_len_percentiles(spark, sf_dir, exact=True):
    """Per-role text-length percentiles (p50/p95; exact = linear
    interpolation — Spark `percentile` == DuckDB `quantile_cont`).

    Exact percentile shuffles every value to its group's reducer; at
    10^12 turns pass ``exact=False`` for the sketch percentile
    (telemetry.pctl: map-side combinable, bounded state) — same call
    shape, documented trade. The registered/oracle default stays exact
    because the oracle must match bit-for-bit."""
    from .operators.telemetry import pctl

    t = _t(spark, sf_dir)
    ln = F.length("text")
    return t.groupBy("role").agg(
        F.round(pctl(ln, 0.5, exact), 4).alias("p50_len"),
        F.round(pctl(ln, 0.95, exact), 4).alias("p95_len"),
        F.count(F.lit(1)).alias("n_turns"),
    )


def q_hourly_windows(spark, sf_dir):
    """Tumbling event-time windows (the batch twin of the watermarked
    stream in streaming/windowed.py) — window() API vs DuckDB time_bucket."""
    from .streaming.windowed import windowed_counts_batch

    ev = _tbl(spark, sf_dir, "events")
    return windowed_counts_batch(ev, window="1 hour")


def q_multiline_assembly(spark, sf_dir):
    """Multiline record assembly — the Filebeat/Vector 'multiline' log
    operator: continuation lines (here: tool-marker turns) attach to the
    record opened by the last non-continuation line. Boundary detection
    is a running SUM of start flags over one per-conv window pass (record
    id = cumulative starts; a leading continuation run lands in record 0,
    a headerless record, kept). Assembly then groups on (conv, record)
    with the same JVM-side sort_array+md5 shape as conv_assembly."""
    t = _t(spark, sf_dir)
    start = (~F.col("text").startswith("<tool:")).cast("int")
    w = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    recs = t.withColumn("record_id", F.sum(start).over(w).cast("int"))
    return (
        recs.groupBy("conv_id", "record_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("turn_idx", "text"))),
                        lambda s: s["text"],
                    ),
                    "\n",
                )
            ).alias("record_md5"),
        )
    )


def q_skew_join(spark, sf_dir):
    """Skew-safe fact-to-fact-sized-dim join on the corpus's engineered
    Zipf key: per-conversation metadata (turn counts) joined back onto
    turns. conv-hot-0/1 own ~40% of all turns, so a plain hash join puts
    40% of the corpus through two reducers; skew_safe_join routes the hot
    keys through a broadcast branch (the known hot list here — detected
    via detect_hot_keys in production) and hash-joins the balanced
    remainder. Summary: turns per (role, conversation-size bucket).
    Oracle = a plain join, pinning that the split changes the plan, not
    the result."""
    from .operators import enrich

    t = _t(spark, sf_dir)
    conv_dim = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("conv_turns"))
    joined = enrich.skew_safe_join(
        t.select("conv_id", "role"),
        conv_dim,
        "conv_id",
        hot_keys=["conv-hot-0", "conv-hot-1"],
    )
    bucket = (
        F.when(F.col("conv_turns") >= 100, "large")
        .when(F.col("conv_turns") >= 10, "medium")
        .otherwise("small")
    )
    return joined.groupBy("role", bucket.alias("size_bucket")).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("conv_id").alias("n_convs"),
    )


def _doc_tf(spark, sf_dir):
    """(doc_id, tok, tf) term frequencies — one token-level explode +
    partial-agg'd groupBy. The explode is linear in corpus tokens and the
    shuffle carries DISTINCT (doc, tok) pairs only; it also redistributes
    a few-split input across the cluster, so the downstream per-doc pair
    fan-out never runs inside a single scan task (measured: the old
    map-side HOF expansion ran in the 1-split scan task AND re-evaluated
    tokenize per lambda element — 14.2 s at sf0.1; this shape is 2-3 s)."""
    from .functions.tokenize import tokenize

    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(tokenize(F.col("text"), "default")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _capped_doc_tokens(tf: DataFrame, max_vocab: int) -> DataFrame:
    """Per-doc sorted array of the top-``max_vocab`` tokens by term
    frequency (ties: token asc — deterministic, oracle-replayable as
    row_number() OVER (PARTITION BY doc ORDER BY tf DESC, tok)). The cap
    bounds the downstream pair fan-out at C(max_vocab, 2) per doc — the
    guard VERDICT r03 flagged as the one latent O(v^2) scale-killer
    (agent transcripts can be long; synthetic docs max out at 31 distinct
    tokens, so max_vocab=64 leaves small-SF results bit-identical)."""
    ranked = F.struct((-F.col("tf")).alias("ntf"), F.col("tok").alias("tok"))
    return (
        tf.groupBy("doc_id")
        .agg(F.collect_list(ranked).alias("c"))
        .select(
            "doc_id",
            F.array_sort(
                F.transform(
                    F.slice(F.array_sort("c"), 1, max_vocab), lambda s: s["tok"]
                )
            ).alias("toks"),
        )
    )


def _token_pairs(toks_df: DataFrame) -> DataFrame:
    """(a, b) unordered pair expansion (a < b) of each doc's sorted token
    array — map-side HOF over a materialized column reference (an inline
    expression would be re-evaluated per lambda element by the
    interpreted HOF path; measured 4x slower), no self-join."""
    c = F.col("toks")
    pairs = F.flatten(
        F.transform(
            c,
            lambda x, i: F.transform(
                F.slice(c, i + F.lit(2), F.size(c)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return toks_df.select(F.explode(pairs).alias("p")).select(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )


def q_pmi_collocations(spark, sf_dir, max_vocab: int = 64):
    """Top-20 collocations by document-level PMI:
    pmi(a,b) = ln(df_ab * N / (df_a * df_b)), support df_ab >= 5, pair
    side capped at the top-``max_vocab`` tokens per doc by TF (VERDICT
    r03 task 3 — the uncapped HOF expansion was O(v^2) per doc with no
    guard and the slowest query on the board). Token document
    frequencies stay UNCAPPED (true df, the classic collocation
    denominator) and reuse the same TF shuffle (ReusedExchange); both df
    joins broadcast — the token-df table is vocabulary-sized, not
    corpus-sized."""
    docs = _docs(spark, sf_dir)
    n_docs = docs.count()  # scalar, control-plane (avoids the Spark 4.1
    # local-mode scalar-subquery stall documented in transcripts.py)
    # persist: the TF aggregate feeds THREE consumers (pair side + both
    # df joins) and Catalyst does not ReuseExchange across the differing
    # alias trees — without it the plan scans + re-tokenizes the corpus
    # three times. (doc, tok, tf) distinct pairs are a small fraction of
    # corpus bytes and spill to disk; one scan is the plan you'd want at
    # 100 TB.
    tf = _doc_tf(spark, sf_dir).persist()
    tok_df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    pair_df = (
        _token_pairs(_capped_doc_tokens(tf, max_vocab))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("df_ab"))
        .filter(F.col("df_ab") >= 5)
    )
    dfa = tok_df.select(F.col("tok").alias("a"), F.col("df").alias("df_a"))
    dfb = tok_df.select(F.col("tok").alias("b"), F.col("df").alias("df_b"))
    scored = (
        pair_df.join(F.broadcast(dfa), "a")
        .join(F.broadcast(dfb), "b")
        .select(
            "a",
            "b",
            "df_ab",
            F.round(
                F.log(F.col("df_ab") * F.lit(float(n_docs)) / (F.col("df_a") * F.col("df_b"))),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "a", "b").limit(20)


def q_error_burst(spark, sf_dir):
    """Burst alerting — the log-analytics alert rule (Splunk alert /
    Grafana threshold): hours whose parsed-ERROR count is >= 2x the
    previous hour's. The ordering window has no partition key by nature
    (one global timeline), but its INPUT is the per-hour aggregate — one
    row per calendar hour regardless of data volume — so the single-task
    window is bounded by time span, not corpus size (unlike the r02
    detect_hot_keys global window over data-sized input, since fixed)."""
    parsed = parse.parse_turns(_t(spark, sf_dir), dynamic=False)
    hourly = (
        parsed.filter(F.col("level") == "ERROR")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    w = W.orderBy("hour")
    lagged = hourly.withColumn("prev_n", F.lag("n_errors").over(w))
    return lagged.filter(
        F.col("prev_n").isNotNull() & (F.col("n_errors") >= 2 * F.col("prev_n"))
    ).select(
        "hour",
        "n_errors",
        "prev_n",
        F.round(F.col("n_errors") / F.col("prev_n"), 4).alias("ratio"),
    )


def q_cooccurrence(spark, sf_dir, max_vocab: int = 64):
    """Top-20 term co-occurrence pairs across documents (collocation/PMI
    prep), pair side capped at the top-``max_vocab`` tokens per doc by
    TF (ties: token asc) — VERDICT r03 task 3's guard against the
    uncapped O(v^2) per-doc fan-out. The TF aggregate distributes the
    few-split scan, the HOF pair expansion runs over the capped sorted
    array (no self-join), the only wide op after it carries (a, b)
    partial counts, and top-20 compiles to TakeOrderedAndProject.
    Oracle: per-doc TF -> row_number top-V -> self-join with tok<tok —
    equivalent to capped sorted-array pair expansion."""
    return (
        _token_pairs(_capped_doc_tokens(_doc_tf(spark, sf_dir), max_vocab))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(20)
    )


def q_tfidf_topk(spark, sf_dir, k: int = 3):
    """Per-doc top-k terms by TF-IDF (tf * ln(N/df)) — the classic
    keyword-extraction / relevance-feature op every corpus pipeline
    ships next to BM25. Reuses the distributed _doc_tf aggregate
    (persisted: it feeds both the score join and the token-df build);
    token dfs are vocabulary-sized and broadcast; the per-doc top-k
    window pre-prunes map-side via WindowGroupLimit. Ordering ties
    resolve on the ROUNDED score then token asc, so the oracle replays
    the exact cut."""
    docs = _docs(spark, sf_dir)
    n_docs = docs.count()  # scalar, control-plane
    tf = _doc_tf(spark, sf_dir).persist()
    df_tok = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_tok), "tok").select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "tok", "tfidf", "rank")
    )


def q_lm_perplexity(spark, sf_dir):
    """Per-source bigram-LM perplexity quality audit (the KenLM-style
    corpus filter) — operators/textstats.py:lm_perplexity. Oracle:
    identical add-k bigram model replayed with lead() bigrams in SQL."""
    return textstats.lm_perplexity(_docs(spark, sf_dir))


def q_mix_rebalance(spark, sf_dir):
    """Domain-mix rebalancing: downsample sources toward a target
    mixture (40/30/20/10 over src0-3; other sources dropped) with the
    deterministic hash-threshold rule of operators/sampling.py:
    mix_rebalance — pure scan+filter, no window, replayed exactly by
    the oracle via the md5-prefix parity trick. Output = per-source
    audit (n_kept + doc_id checksum)."""
    from .operators.sampling import mix_rebalance

    kept = mix_rebalance(
        _docs(spark, sf_dir),
        targets={"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
    )


def q_funnel(spark, sf_dir):
    """Funnel analysis — the event-analytics staple: per user, a signup,
    then a view AFTER it, then a purchase AFTER that. Three chained
    per-user window mins (each stage's earliest qualifying ts references
    the previous stage's) share ONE hash exchange on user_id — no joins;
    then one per-user aggregate and a stack() to the long (stage,
    n_users) funnel. Entirely declarative: no driver-side counting."""
    ev = _tbl(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    w = W.partitionBy("user_id")
    e = ev.withColumn(
        "t_signup",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    )
    e = e.withColumn(
        "t_view",
        F.min(
            F.when(
                (F.col("event_type") == "view") & (F.col("ts") > F.col("t_signup")),
                F.col("ts"),
            )
        ).over(w),
    )
    e = e.withColumn(
        "t_buy",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = e.groupBy("user_id").agg(
        F.first("t_signup").alias("t_signup"),
        F.first("t_view").alias("t_view"),
        F.first("t_buy").alias("t_buy"),
    )
    wide = per_user.agg(
        F.count("t_signup").alias("n1"),
        F.count("t_view").alias("n2"),
        F.count("t_buy").alias("n3"),
    )
    return wide.select(
        F.expr(
            "stack(3, '1_signup', n1, '2_signup_view', n2, "
            "'3_signup_view_purchase', n3) AS (stage, n_users)"
        )
    )


def q_transition_matrix(spark, sf_dir):
    """User-journey transition matrix (Markov bigrams): per user in
    event-time order, count (event_type -> next event_type) transitions
    across the corpus, with each type's outgoing total and the
    transition probability. One user-partitioned lead() pass, then a
    transition-matrix-sized aggregate (|types|^2 rows)."""
    ev = _tbl(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.col("ts").cast("timestamp").alias("ts"), "event_id",
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_out = W.partitionBy("event_type")
    return counts.select(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
        "n",
        F.round(F.col("n") / F.sum("n").over(w_out), 6).alias("p"),
    )


def q_dense_rank_ties(spark, sf_dir):
    """Ranking-with-ties semantics: top order-price tiers per region via
    dense_rank (ties share a rank and no rank is skipped — row_number
    would split ties arbitrarily, rank would leave gaps). Prices are
    bucketed to whole thousands so real ties exist; Spark 4 pre-prunes
    the rank<=3 filter with WindowGroupLimit like the other top-k
    windows."""
    orders = _tbl(spark, sf_dir, "orders")
    customer = _tbl(spark, sf_dir, "customer")
    nation = _tbl(spark, sf_dir, "nation")
    joined = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .select(
            "n_name",
            (F.floor(F.col("o_totalprice") / 1000) * 1000).cast("long").alias("price_tier"),
        )
    )
    tiers = joined.groupBy("n_name", "price_tier").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = W.partitionBy("n_name").orderBy(F.col("n_orders").desc())
    return (
        tiers.withColumn("tier_rank", F.dense_rank().over(w))
        .filter(F.col("tier_rank") <= 3)
        .select("n_name", "price_tier", "n_orders", "tier_rank")
    )


def q_conversion_latency(spark, sf_dir, exact=True):
    """Time-to-convert distribution: per user, seconds from signup to
    the FIRST subsequent purchase; exact p50/p95 per signup-week cohort.
    Reuses the funnel's chained-min shape (one user exchange, no joins
    for the stage timestamps), then a cohort-sized percentile —
    ``exact=False`` (telemetry.pctl sketch) is the corpus-scale swap."""
    ev = _tbl(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    w = W.partitionBy("user_id")
    e = ev.withColumn(
        "t_signup",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    ).withColumn(
        "t_buy",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_signup")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = (
        e.groupBy("user_id")
        .agg(F.first("t_signup").alias("t_signup"), F.first("t_buy").alias("t_buy"))
        .filter(F.col("t_buy").isNotNull())
        .select(
            F.date_trunc("week", F.col("t_signup")).alias("cohort_week"),
            (
                F.unix_timestamp("t_buy") - F.unix_timestamp("t_signup")
            ).alias("latency_s"),
        )
    )
    from .operators.telemetry import pctl

    return per_user.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(pctl(F.col("latency_s"), 0.5, exact), 4).alias("p50_s"),
        F.round(pctl(F.col("latency_s"), 0.95, exact), 4).alias("p95_s"),
    )


def q_retention(spark, sf_dir):
    """Retention cohorts: users cohorted by signup week (Monday-start
    date_trunc in both engines), counted distinct per (cohort_week,
    weeks_since) for subsequent activity. The cohort table is user-sized
    and the join is on user_id — broadcast at this scale, bucketed at
    corpus scale; pre-signup activity (negative weeks) excluded."""
    ev = _tbl(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    joined = ev.join(F.broadcast(cohort), "user_id")
    weeks_since = F.floor(
        F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
    ).cast("int")
    return (
        joined.select("user_id", "cohort_week", weeks_since.alias("weeks_since"))
        .filter(F.col("weeks_since") >= 0)
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def q_zscore_outliers(spark, sf_dir):
    """Statistical QC: events whose value is > 2 population standard
    deviations from their event type's mean. Stats are a result-sized
    aggregate broadcast back onto the scan — one pass for stats, one
    scan for the filter; the count summary keeps the output bounded."""
    ev = _tbl(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    flagged = (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(F.col("value") - F.col("mu")) > 2 * F.col("sigma"))
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_outliers"),
        F.round(F.min("value"), 6).alias("min_out"),
        F.round(F.max("value"), 6).alias("max_out"),
    )


def q_moving_avg(spark, sf_dir):
    """7-day moving average of daily event counts per type — a RANGE
    window frame (every other window here is ROWS/growing): the frame is
    defined by the ORDER-BY VALUE distance (6 days back in epoch
    seconds), not row offsets, so days missing from the data simply
    shrink the frame instead of silently widening it the way a ROWS 7
    PRECEDING frame would. Spark's rangeBetween needs a numeric order
    key; both engines order by epoch-day seconds."""
    ev = _tbl(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    day_sec = F.unix_timestamp("day")
    w = (
        W.partitionBy("event_type")
        .orderBy(day_sec)
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "event_type",
        "day",
        "n",
        F.round(F.avg("n").over(w), 6).alias("avg_7d"),
    )


def q_geomean_udaf(spark, sf_dir):
    """Vectorized UDAF (GROUPED_AGG pandas_udf) — the §2.10 aggregate
    member: per-event-type geometric mean of |value|+1, computed as one
    Arrow batch per group. KNOWN SCALE TRADE-OFF, by design: grouped-agg
    pandas UDFs get no partial aggregation (raw rows shuffle to the
    group's reducer), so at 100 TB the equivalent Catalyst composition
    exp(avg(ln(|v|+1))) — which partial-aggregates map-side — is the hot
    path; tests pin the two equal, and the oracle replays the Catalyst
    form. The UDAF exists for aggregates with no built-in decomposition."""
    from .functions.udaf import geomean_plus1

    ev = _tbl(spark, sf_dir, "events")
    # grouped-agg pandas UDFs cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — single-column result by constraint
    return ev.groupBy("event_type").agg(
        F.round(geomean_plus1("value"), 6).alias("geomean_value"),
    )


def q_gap_fill(spark, sf_dir):
    """Forward fill (gap fill) — the telemetry staple the reference's
    append-only model never needs: error events 'drop' the metric (value
    masked to NULL) and each gap carries the last known good value
    forward per user in event-time order. One window pass with
    last(ignorenulls) over ROWS UNBOUNDED PRECEDING..CURRENT; the frame
    is running, so Spark evaluates it in one sorted sweep per key — no
    per-row rescans. Oracle: last_value(... IGNORE NULLS) with the same
    frame."""
    ev = _tbl(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    good = F.when(F.col("event_type") != "error", F.col("value"))
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.last(good, ignorenulls=True).over(w), 6).alias("filled_value"),
    )


def q_ntile_quartiles(spark, sf_dir):
    """Quartile bucketing via ntile(4) per event_type (value, then
    event_id as the deterministic tiebreak), summarized per bucket. Both
    engines implement ANSI ntile (first count%n groups take the extra
    row), so identical ordering gives identical buckets."""
    ev = _tbl(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(4).over(w).alias("quartile"))
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


def q_sliding_windows(spark, sf_dir):
    """Hopping event-time windows (1h window, 15m slide): each event lands
    in 4 overlapping windows. Completes the window family (tumbling =
    hourly_windows, session = sessionize): the 4x fan-out happens in the
    window() expression BEFORE partial aggregation, so the exchange still
    carries only (win, key) partial counts. Oracle: per-event expansion to
    its 4 slide-aligned window starts via time_bucket - k*slide."""
    from .streaming.windowed import windowed_counts_batch

    ev = _tbl(spark, sf_dir, "events")
    return windowed_counts_batch(ev, window="1 hour", slide="15 minutes")


def q_cdc_compact(spark, sf_dir):
    """Upsert-stream compaction to current state: latest event per user
    (ts, then event_id as the deterministic ordinal), with 'error' as the
    delete tombstone — MERGE INTO semantics over an events change log.
    One WindowGroupLimit-pruned shuffle on the key."""
    from .operators import cdc

    ev = _tbl(spark, sf_dir, "events")
    latest = cdc.compact_latest(
        ev.select("user_id", "event_type", "value",
                  F.col("ts").cast("timestamp").alias("ts"), "event_id"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        delete_predicate=F.col("event_type") == "error",
    )
    return latest.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.round("value", 6).alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


def q_trending_terms(spark, sf_dir):
    """Per-hour top-3 trending terms over transcript text — the classic
    log-analytics leaderboard (Splunk `timechart ... top`). Plan: explode
    lands directly on the (window, term) hash aggregate (partial-agg'd);
    the row_number filter becomes a `WindowGroupLimit` below the
    exchange in Spark 4, so map tasks pre-prune to local top-3 per hour
    and the window reducer never sees the full term distribution."""
    from pyspark.sql import Window as W

    from .functions.tokenize import tokenize

    t = _t(spark, sf_dir)
    counts = (
        t.select(
            F.window("ts", "1 hour").getField("start").alias("hour_start"),
            F.explode(tokenize(F.col("text"), "default")).alias("term"),
        )
        .groupBy("hour_start", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy("hour_start").orderBy(F.col("cnt").desc(), F.col("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("hour_start", "term", "cnt", "rank")
    )


def q_time_rollup(spark, sf_dir):
    """Hypertable-style multi-granularity rollup in ONE pass: per-type
    counts at (day, hour) and (day) granularities via GROUPING SETS —
    Catalyst expands to a single Expand + hash aggregate (no double scan).
    grain column disambiguates levels (grouping_id analog)."""
    ev = _tbl(spark, sf_dir, "events").select(
        F.col("event_type"),
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd").alias("day"),
        F.hour(F.col("ts").cast("timestamp")).alias("hour"),
        F.col("value"),
    )
    rolled = ev.groupingSets(
        [["event_type", "day", "hour"], ["event_type", "day"]],
        "event_type", "day", "hour",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulation (order-independent), double emission
        # (driver-hash decimal artifact, VERDICT r02)
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("value_sum"),
    )
    return rolled.withColumn(
        "grain", F.when(F.col("hour").isNull(), F.lit("day")).otherwise(F.lit("hour"))
    )


def q_sessionize(spark, sf_dir):
    """Event-time sessionization (gap > 30 min) — the batch analog of a
    session window; stable ordering via (ts, event_id)."""
    ev = _tbl(spark, sf_dir, "events").withColumn(
        "sec", F.col("ts").cast("timestamp").cast("long")
    )
    # order by floor-seconds (not raw micros) so the oracle, which works in
    # epoch seconds, pairs lag() rows identically
    w = W.partitionBy("user_id").orderBy("sec", "event_id")
    gap = F.col("sec") - F.lag("sec").over(w)
    marked = ev.withColumn("new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sessions = marked.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_datetime_multiformat(spark, sf_dir):
    """P4 parity: strings in 4 formats, parsed by the declared-order
    multi-format parser with epoch auto-scaling (datetime.go:50-106)."""
    from .functions.parsing import parse_datetime

    ev = _tbl(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    fmt = (F.col("event_id") % 4).cast("int")
    s = (
        F.when(fmt == 0, F.date_format(ts, "yyyy-MM-dd HH:mm:ss"))
        .when(fmt == 1, F.date_format(ts, "yyyy-MM-dd"))
        .when(fmt == 2, F.unix_seconds(ts).cast("string"))
        .otherwise(F.unix_millis(ts).cast("string"))
    )
    parsed = ev.select(
        fmt.alias("fmt"), parse_datetime(s, ("date", "rfc3339", "timestamp")).alias("parsed")
    )
    return parsed.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("parsed").isNull(), 1).otherwise(0)).alias("n_null"),
        F.min(F.unix_seconds("parsed")).alias("min_epoch"),
        F.max(F.unix_seconds("parsed")).alias("max_epoch"),
    )


def q_parse_casts(spark, sf_dir):
    """P2/P3 parity: try_cast numbers (null on failure), length-guarded
    boolean parse (field_parser.go:134-205) over event props-ish strings."""
    from .functions.parsing import parse_boolean, parse_number

    ev = _tbl(spark, sf_dir, "events")
    raw_num = F.when(F.col("event_id") % 5 == 0, F.lit("not_a_number")).otherwise(
        F.col("value").cast("string")
    )
    raw_bool = (
        F.when(F.col("event_id") % 4 == 0, F.lit(" TRUE "))
        .when(F.col("event_id") % 4 == 1, F.lit("False"))
        .when(F.col("event_id") % 4 == 2, F.lit("yes"))
        .otherwise(F.lit("truthy"))
    )
    p = ev.select(
        parse_number(raw_num, "f64").alias("num"),
        parse_number(F.lit("-3"), "u64").alias("neg_u64"),
        parse_boolean(raw_bool).alias("b"),
    )
    return p.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("num").isNull(), 1).otherwise(0)).alias("bad_nums"),
        F.round(F.sum("num").cast("double"), 2).alias("num_sum"),
        F.sum(F.when(F.col("neg_u64").isNull(), 1).otherwise(0)).alias("neg_u64_null"),
        F.sum(F.when(F.col("b") == True, 1).otherwise(0)).alias("n_true"),  # noqa: E712
        F.sum(F.when(F.col("b") == False, 1).otherwise(0)).alias("n_false"),  # noqa: E712
        F.sum(F.when(F.col("b").isNull(), 1).otherwise(0)).alias("n_null"),
    )


def q_ip_normalize(spark, sf_dir):
    """P5 (field_parser.go:217-241): parse + canonicalize IPs, invalid ->
    null, via the vectorized pandas UDF. Inputs synthesized per event so
    the oracle can state the golden output exactly."""
    from .functions.parsing import normalize_ip

    ev = _tbl(spark, sf_dir, "events")
    sel = (F.col("event_id") % 7).cast("int")
    raw = (
        F.when(sel == 0, F.lit("999.1.2.3"))  # invalid octet -> null
        .when(
            sel == 1,
            F.concat(
                F.lit("  10."), (F.col("event_id") % 256).cast("string"),
                F.lit(".0."), (F.col("event_id") % 200).cast("string"), F.lit("  "),
            ),
        )  # whitespace-padded, valid
        .when(sel == 2, F.lit("::1"))  # v6 passthrough
        .otherwise(
            F.concat(
                F.lit("192.168."), (F.col("user_id") % 256).cast("string"),
                F.lit("."), (F.col("event_id") % 250).cast("string"),
            )
        )
    )
    p = ev.select(normalize_ip(raw).alias("ip"))
    return p.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("ip").isNull(), 1).otherwise(0)).alias("n_invalid"),
        F.countDistinct("ip").alias("n_distinct"),
        F.min("ip").alias("min_ip"),
        F.max("ip").alias("max_ip"),
    )


def q_dialog_stats(spark, sf_dir):
    """Per-conversation dialogue composition (role counts, longest
    agentic tool chain via gaps-and-islands, assistant token volume) —
    operators/chatformat.py:dialog_stats. All jobs shuffle on conv_id."""
    return chatformat.dialog_stats(_t(spark, sf_dir))


def q_sft_pairs(spark, sf_dir):
    """SFT-example extraction summary: adjacent user->assistant pairs
    with prompt/completion token volumes per conversation —
    operators/chatformat.py:sft_pairs."""
    return chatformat.sft_pairs(_t(spark, sf_dir))


def q_pii_redact(spark, sf_dir):
    """Per-role PII redaction audit (emails then IPv4s scrubbed; counts
    and char deltas) — operators/chatformat.py:pii_redact_report. Pure
    scan + 4-key aggregate."""
    return chatformat.pii_redact_report(_t(spark, sf_dir))


def q_shard_assign(spark, sf_dir):
    """Deterministic training-shard assignment + balance audit (md5
    prefix % 8) — operators/sampling.py:assign_shards."""
    from .operators import sampling

    return sampling.assign_shards(_docs(spark, sf_dir), n_shards=8)


def q_temperature_mix(spark, sf_dir):
    """Temperature-scaled source mixture weights (tau=0.7, the
    multilingual upsampling rule) — operators/sampling.py:
    temperature_mix. Vocabulary-sized aggregate + broadcast total."""
    from .operators import sampling

    return sampling.temperature_mix(_docs(spark, sf_dir), tau=0.7)


def q_length_trim(spark, sf_dir):
    """Per-source learned length-outlier trim report (exact p05/p95
    token-count cutoffs; approx_percentile is the documented 10^12-row
    swap) — operators/sampling.py:length_trim."""
    from .operators import sampling

    return sampling.length_trim(_docs(spark, sf_dir))


def q_dup_cluster_stats(spark, sf_dir):
    """Exact-dup cluster-size histogram (corpus redundancy health
    metric) — operators/dedup.py:dup_cluster_stats. Run over the
    transcripts table, where canned turn texts form real clusters (the
    synthetic documents are all unique — a 1-row histogram gates
    nothing)."""
    return dedup.dup_cluster_stats(_t(spark, sf_dir), id_col="conv_id")


def q_cross_source_leakage(spark, sf_dir):
    """Cross-partition exact-dup leakage counts per partition pair
    (split integrity check) — operators/dedup.py:cross_source_leakage.
    One shuffle on fp; in-row pair expansion, no self-join. Partitioned
    by role on the transcripts table (six non-empty pairs; the synthetic
    documents are source-disjoint and would gate a 0-row result)."""
    return dedup.cross_source_leakage(_t(spark, sf_dir), source_col="role")


def q_cdc_chunks(spark, sf_dir):
    """Content-defined-chunking dedup over documents: top shared
    variable-size chunks (boundary = md5-prefix(token) % 4 == 0) —
    operators/dedup.py:cdc_chunk_dedup. Catches partially-duplicated
    passages that whole-doc dedup and fixed-n spans miss; boundaries
    re-sync after insertions (the rsync/FastCDC property)."""
    return dedup.cdc_chunk_dedup(
        _docs(spark, sf_dir), mod=4, min_tokens=2, min_docs=2, k=20
    )


def q_filter_cascade(spark, sf_dir):
    """Quality-filter cascade kill-funnel over documents: 5 ordered
    filters (min_tokens, max_chars, punct_ratio, repetition, stopwords)
    + the survivor row, each doc charged to the FIRST filter that
    rejects it — operators/textstats.py:filter_cascade. One corpus scan,
    one 6-key aggregate; the global window runs over 6 rows (bounded by
    the filter count, not data)."""
    return textstats.filter_cascade(_docs(spark, sf_dir))


def q_zipf_slope(spark, sf_dir):
    """Zipf's-law fit per source: regr_slope(ln freq, ln rank) over the
    top-100 terms — operators/textstats.py:zipf_slope. Corpus-health
    screen for templated/synthetic sources (natural text ~ -1)."""
    return textstats.zipf_slope(_docs(spark, sf_dir), group_col="source")


def q_semdedup(spark, sf_dir):
    """SemDeDup (cluster-then-cosine semantic dedup, arXiv:2303.09540)
    over embeddings: assign to 8 seed centroids, prune within-cluster
    vectors with a lower-id neighbor at cosine >= 0.35 (the synthetic
    embeddings' near-dup band, same bar as embedding_neardup) —
    operators/similarity.py:semdedup. Per-cluster (n_vecs, n_removed)."""
    return similarity.semdedup(
        _emb(spark, sf_dir), n_cells=8, threshold=0.35
    )


def q_role_alternation(spark, sf_dir):
    """Chat-format integrity report over the transcripts table: one row
    per violation type (missing system turn, same-role run, tool turn
    answering a user) with turn and conversation counts —
    operators/chatformat.py:role_alternation_report. One lag() window on
    (conv_id, turn_idx) + one global aggregate."""
    return chatformat.role_alternation_report(_t(spark, sf_dir))


def q_context_truncate(spark, sf_dir):
    """Context-window truncation summary (budget 120 whitespace tokens,
    newest turns kept first) — chatformat.context_truncate. Reverse
    running-sum window; the per-conv aggregate reuses the partitioning."""
    return chatformat.context_truncate(_t(spark, sf_dir), budget=120)


def q_boilerplate_topk(spark, sf_dir):
    """Top boilerplate turn texts: normalized fingerprints recurring in
    >= 12 distinct conversations (canned greetings / templated banners) —
    chatformat.boilerplate_turns. CCNet-style boilerplate detection at
    turn granularity."""
    return chatformat.boilerplate_turns(_t(spark, sf_dir), min_convs=12, k=20)


def q_boilerplate_scrub(spark, sf_dir):
    """Per-role retention after dropping boilerplate turns —
    chatformat.boilerplate_scrub. The frequent-fingerprint set is
    broadcast (vocabulary-sized by construction): scan, broadcast probe,
    aggregate; the corpus never shuffles."""
    return chatformat.boilerplate_scrub(_t(spark, sf_dir), min_convs=12)


def q_ngram_spans(spark, sf_dir):
    """Repeated 4-token spans across documents (the detection half of
    exact substring dedup, Lee et al. 2022) —
    operators/dedup.py:repeated_ngram_spans. Top-20 by (n_docs desc,
    n_hits desc, gram asc)."""
    return dedup.repeated_ngram_spans(
        _docs(spark, sf_dir), n=4, min_docs=2, k=20
    )


def q_chunk_docs(spark, sf_dir):
    """RAG-style overlapping chunking (size 32, stride 24 tokens) —
    operators/packing.py:chunk_documents. Zero-shuffle Catalyst HOFs with
    the token array materialized once per row."""
    return packing_ops.chunk_documents(_docs(spark, sf_dir), size=32, stride=24)


def q_quant_ann_topk(spark, sf_dir):
    """INT8-quantized dot-product top-k (queries = vec_id < 5, k=5) —
    operators/similarity.py:quantized_topk. Integer scores are exact, so
    the ranking is bit-deterministic and fully oracle-checkable; the
    quantization formula (floor(x*127/max|x| + 0.5), float64 IEEE ops) is
    replayed verbatim by the DuckDB oracle."""
    emb = _emb(spark, sf_dir)
    return similarity.quantized_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


def q_template_mining(spark, sf_dir):
    """Drain-lite log-template mining over the transcripts table: digit
    runs masked to <num>, whitespace collapsed, top-20 templates by turn
    count — operators/textstats.py:log_templates. One scan + one hash
    aggregate on the template vocabulary + TakeOrderedAndProject."""
    return textstats.log_templates(_t(spark, sf_dir), k=20)


def q_rrf_fusion(spark, sf_dir):
    """Hybrid lexical+semantic retrieval fused with Reciprocal Rank
    Fusion: BM25 top-50 for a 3-term query x cosine top-50 for query
    vector 0, rrf = sum 1/(60+rank), top-10 —
    operators/search.py:hybrid_rrf. Both branches TakeOrdered-pruned
    before any ranking window touches them."""
    return search.hybrid_rrf(
        _docs(spark, sf_dir),
        _emb(spark, sf_dir),
        ["hash", "filter", "slow"],
        query_vec_id=0,
        n=50,
        k=10,
    )


def q_dsir_weights(spark, sf_dir):
    """DSIR hashed-unigram importance weights (arXiv:2302.03169), target
    domain = source 'src0': per-source (n_docs, avg_logratio, n_positive)
    — operators/sampling.py:dsir_weights. Histograms are one 64-key
    partial agg; the log-ratio table broadcasts back; the only real
    shuffle is the per-doc weight sum."""
    from .operators import sampling

    return sampling.dsir_weights(_docs(spark, sf_dir), target_source="src0")


def q_entropy_hist(spark, sf_dir):
    """Per-source unigram token-entropy histogram (0.5-nat buckets) —
    operators/textstats.py:token_entropy_hist. The Gopher/FineWeb-style
    repetitiveness screen: low-entropy buckets flag templated/spammy
    sources."""
    return textstats.token_entropy_hist(_docs(spark, sf_dir))


def q_cluster_purity(spark, sf_dir):
    """Cluster-vs-label purity audit: the kmeans_clusters fit (k=8, 2
    Lloyd iterations, lowest-id init) assigned and scored against the
    embeddings' ground-truth label column —
    operators/cluster.py:cluster_purity. Oracle replays the same two
    iterations as SQL CTEs (shared with the kmeans_clusters oracle) and
    joins labels back."""
    from .operators.cluster import cluster_purity

    return cluster_purity(_emb(spark, sf_dir), k=8, iters=2)


def q_retrieval_eval(spark, sf_dir):
    """ANN quality eval as a distributed operator: recall@5 and NDCG@5
    of the int8-quantized ranking vs the exact float-cosine ranking for
    queries vec_id < 5 — operators/similarity.py:retrieval_eval. Oracle
    replays both rankers (the knn_bruteforce and quant_ann_topk oracle
    fragments) and the metric arithmetic."""
    emb = _emb(spark, sf_dir)
    return similarity.retrieval_eval(emb, emb.filter(F.col("vec_id") < 5), k=5)


def q_bpe_merges(spark, sf_dir):
    """Distributed BPE merge training (2 iterations) over documents: the
    tokenizer-training inner loop as DataFrame algebra —
    operators/bpe.py:bpe_merges. Pair statistics run on the word
    VOCABULARY (one corpus collapse up front), the argmax pair is a
    TakeOrdered top-1, the merge is a map-side Catalyst fold. Oracle
    replays both iterations with a run-parity greedy-merge closed form."""
    from .operators.bpe import bpe_merges

    return bpe_merges(_docs(spark, sf_dir), iters=2)


def q_bpe_fertility(spark, sf_dir):
    """Tokenizer fertility per source after 2 learned BPE merges: BPE
    tokens per word — operators/bpe.py:bpe_fertility. Both the training
    statistics AND the audit encode run on the word vocabulary; the
    corpus contributes exactly one (source, word) count aggregate."""
    from .operators.bpe import bpe_fertility

    return bpe_fertility(_docs(spark, sf_dir), iters=2)


def q_conv_template_dedup(spark, sf_dir):
    """Conversation-template dedup over the transcripts table, OPENING-
    template variant: digit-masked ordered fingerprints of the first 3
    turns' first 2 tokens, clusters with >= 2 convs, top-20 —
    operators/dedup.py:conv_template_dedup. Catches scripted replays
    (same opening tool loop, different counters/content) that exact conv
    dedup misses and that full-text template matching never fires on
    (long conversations are unique in full)."""
    return dedup.conv_template_dedup(
        _t(spark, sf_dir), k=20, max_turns=3, head_tokens=2
    )


def q_tool_call_audit(spark, sf_dir):
    """Per-tool call audit over inline <tool:NAME arg=...> markers:
    call counts, distinct args, marker-vs-column drift, registry
    membership — operators/agenttools.py:tool_call_audit. Map-side
    regexp parse, broadcast registry dim, one |tools|-cardinality agg."""
    from .operators.agenttools import tool_call_audit

    return tool_call_audit(_t(spark, sf_dir))


def q_preference_pairs(spark, sf_dir):
    """Preference-pair (chosen/rejected) extraction: longest vs shortest
    assistant turn per conversation with deterministic tie-breaks —
    operators/chatformat.py:preference_pairs. One struct-min/max hash
    aggregate on conv_id, no window, no text on the exchange."""
    return chatformat.preference_pairs(_t(spark, sf_dir))


def q_loss_mask_spans(spark, sf_dir):
    """SFT loss-mask spans: [start, end) char offsets of every assistant
    turn inside the newline-joined conversation string —
    operators/chatformat.py:loss_mask_spans. One running-sum window on
    the shared (conv_id, turn_idx) ordering."""
    return chatformat.loss_mask_spans(_t(spark, sf_dir))


def q_curriculum_order(spark, sf_dir):
    """Curriculum ordering of documents: deterministic global rank by
    token count (easy-first) + phase assignment, computed WITHOUT a
    global single-reducer window (two-phase distributed rank:
    per-difficulty row_number + tiny broadcast offset table) —
    operators/sampling.py:curriculum_order."""
    return sampling.curriculum_order(_docs(spark, sf_dir))


def q_grok_coverage(spark, sf_dir):
    """Grok-extraction coverage audit over the parsed transcripts: per
    extracted field (level, error_signature, tool_call, bytes, op,
    duration) the non-null count and corpus fraction —
    operators/parse.py:parse_coverage. One scan, one 1-row aggregate,
    stack() reshape."""
    return parse.parse_coverage(parse.parse_turns(_t(spark, sf_dir), dynamic=False))


def q_prefix_sharing(spark, sf_dir):
    """Conversation-prefix reuse stats (system-prompt/opening dedup and
    KV-cache-share audit): per depth 1..8, distinct prefix fingerprints,
    largest share — operators/convstruct.py:prefix_sharing. Depth cap
    applied BEFORE the conv window shuffle; aggregate keys carry 32-hex
    fingerprints, never text."""
    from .operators import convstruct

    return convstruct.prefix_sharing(_t(spark, sf_dir), max_depth=8)


def q_tool_loop_detect(spark, sf_dir):
    """Same-tool loop detection (agent stuck re-calling one tool):
    gaps-and-islands runs of >=3 consecutive same-tool turns per
    conversation — operators/convstruct.py:tool_loop_detect. One explicit
    conv_id exchange serves both ranking windows."""
    from .operators import convstruct

    return convstruct.tool_loop_detect(_t(spark, sf_dir), min_run=3)


def q_crossdoc_spans(spark, sf_dir):
    """Cross-document exact-substring duplication audit (suffix-array
    dedup restated as shared-shingle interval merge): per-source
    duplicated-token fraction — operators/dedup.py:crossdoc_dup_spans.
    Shingle hashes only on the wire; island merge shuffles only the
    duplicated positions."""
    return dedup.crossdoc_dup_spans(_docs(spark, sf_dir), n=8)


def q_embedding_dim_stats(spark, sf_dir):
    """Embedding-geometry audit per label: avg norm, centroid norm,
    anisotropy, mean cosine-to-centroid —
    operators/similarity.py:embedding_dim_stats. Centroids re-enter via
    broadcast; no corpus-sized shuffle."""
    return similarity.embedding_dim_stats(_emb(spark, sf_dir))


def q_slo_stats(spark, sf_dir):
    """Per-op duration SLO board (p50/p95/p99) over the parsed INFO-line
    `duration` field — operators/telemetry.py:slo_stats. Scan + one
    |ops|-cardinality aggregate; exact percentile at small SF,
    approx_percentile is the documented 10^12 swap."""
    from .operators import telemetry

    return telemetry.slo_stats(parse.parse_turns(_t(spark, sf_dir), dynamic=False))


def q_top_talkers(spark, sf_dir):
    """Top-10 source IPs by parsed bytes — operators/telemetry.py:
    top_talkers. TakeOrderedAndProject after an |ips|-keyed aggregate."""
    from .operators import telemetry

    return telemetry.top_talkers(_t(spark, sf_dir), k=10)


def q_latency_stats(spark, sf_dir):
    """Per role-transition response latency (avg/p95/max seconds between
    consecutive turns) — operators/telemetry.py:latency_stats. One conv_id
    window shuffle, |role-pairs|-keyed aggregate."""
    from .operators import telemetry

    return telemetry.latency_stats(_t(spark, sf_dir))


def q_error_cascade(spark, sf_dir):
    """Error-propagation audit per signature: errors followed by another
    error within 3 turns — operators/telemetry.py:error_cascade. Window
    over ERROR turns only (minority of rows)."""
    from .operators import telemetry

    return telemetry.error_cascade(
        parse.parse_turns(_t(spark, sf_dir), dynamic=False), k=3
    )


def q_dedup_keep_best(spark, sf_dir):
    """Exact-dup collapse over transcript turns keeping the
    highest-quality member (length desc, turn key asc) —
    operators/dedup.py:dedup_keep_best. One struct-min hash aggregate; no
    window, no second shuffle. Turn key = conv_id#lpad(turn_idx) so string
    order == (conv, idx) order."""
    turns = _t(spark, sf_dir).select(
        F.concat_ws(
            "#", F.col("conv_id"), F.lpad(F.col("turn_idx").cast("string"), 6, "0")
        ).alias("turn_key"),
        F.length("text").alias("q"),
        "text",
    )
    return dedup.dedup_keep_best(
        turns, id_col="turn_key", text_col="text", quality_col="q"
    )


def q_contrastive_pairs(spark, sf_dir):
    """Contrastive (anchor, positive, negative) triple mining: user turn
    + answering assistant turn + deterministic other-conversation
    negative via per-bucket top-2 representatives (two bounded
    aggregates, broadcast assignment — no corpus window) —
    operators/chatformat.py:contrastive_pairs."""
    return chatformat.contrastive_pairs(_t(spark, sf_dir))


def q_span_corruption(spark, sf_dir):
    """Deterministic T5-style span-corruption spec per source: hash-tiled
    3-token pieces masked below a md5 threshold, adjacent pieces merged
    into spans — operators/packing.py:span_corruption. Map-side
    predicate, doc-keyed window over masked pieces only."""
    return packing_ops.span_corruption(_docs(spark, sf_dir))


def q_dup_rate_trend(spark, sf_dir):
    """Per-day exact-duplicate rate trend (ingest drift monitor) —
    operators/dedup.py:dup_rate_trend. Two partial+final aggregates on
    (day, fp) then day."""
    return dedup.dup_rate_trend(_t(spark, sf_dir))


def q_echo_rate(spark, sf_dir):
    """Per-conversation prompt-echo (assistant parroting the user turn)
    — operators/chatformat.py:echo_rate. One lead() window + one hash
    aggregate; no self-join."""
    return chatformat.echo_rate(_t(spark, sf_dir))


def q_ctx_overflow(spark, sf_dir):
    """Per-conversation context-budget growth profile (first overflow
    turn, leading turns in budget) — operators/chatformat.py:
    ctx_overflow. Forward running-sum window fused with the per-conv
    aggregate on the same key."""
    return chatformat.ctx_overflow(_t(spark, sf_dir))


def q_gopher_rules(spark, sf_dir):
    """Marginal Gopher-style quality-rule report over documents —
    operators/textstats.py:gopher_rules. One scan, one global aggregate,
    rules exploded from a single row."""
    return textstats.gopher_rules(_docs(spark, sf_dir))


def q_weighted_sample(spark, sf_dir):
    """Deterministic Efraimidis–Spirakis weighted sample (k per source,
    weight = ws token count, u replayed from md5) — operators/
    sampling.py:weighted_sample. WindowGroupLimit prunes to k rows per
    group below the exchange."""
    return sampling.weighted_sample(_docs(spark, sf_dir))


def q_turn_selfrep(spark, sf_dir):
    """Per-conversation assistant self-repetition (Jaccard between
    consecutive assistant turns) — operators/chatformat.py:turn_selfrep.
    Role filter prunes before the lag() window."""
    return chatformat.turn_selfrep(_t(spark, sf_dir))


def q_hhi_concentration(spark, sf_dir):
    """Per-source token-mass concentration (Herfindahl index + effective
    document count) — operators/textstats.py:hhi_concentration. One
    algebraic-moment aggregate, no second pass."""
    return textstats.hhi_concentration(_docs(spark, sf_dir))


def q_term_burstiness(spark, sf_dir):
    """Church–Gale burstiness of the corpus's top-30 terms over
    conversations — operators/textstats.py:term_burstiness. Two
    aggregates + TakeOrderedAndProject; no window, no join."""
    return textstats.term_burstiness(_t(spark, sf_dir))


def q_kl_drift(spark, sf_dir):
    """Per-source unigram KL divergence from the corpus blend —
    operators/textstats.py:kl_drift. Vocabulary-sized broadcast joins;
    the corpus never re-scans."""
    return textstats.kl_drift(_docs(spark, sf_dir))


def q_tool_error_rate(spark, sf_dir):
    """Per-tool failure attribution: tool turns followed by an ERROR
    level within 2 turns — operators/telemetry.py:tool_error_rate.
    Bounded forward window frame, |tools|-cardinality aggregate."""
    from .operators import telemetry

    return telemetry.tool_error_rate(
        parse.parse_turns(_t(spark, sf_dir), dynamic=False), k=2
    )


def q_conv_gap_sessions(spark, sf_dir):
    """Idle-gap session splits within conversations (30-min gap) —
    operators/telemetry.py:conv_gap_sessions. One lag window fused with
    the conv aggregate."""
    from .operators import telemetry

    return telemetry.conv_gap_sessions(_t(spark, sf_dir))


def q_ooo_turns(spark, sf_dir):
    """Out-of-order timestamp audit per conversation —
    operators/telemetry.py:ooo_turns. Lag window + conv aggregate;
    ordered conversations filtered from the report."""
    from .operators import telemetry

    return telemetry.ooo_turns(_t(spark, sf_dir))


def q_conv_depth_hist(spark, sf_dir):
    """Log2-bucketed conversation-depth histogram with token mass —
    operators/convstruct.py:conv_depth_hist. Conv aggregate then a
    ~40-bucket aggregate."""
    from .operators import convstruct

    return convstruct.conv_depth_hist(_t(spark, sf_dir))


def q_vocab_novelty_trend(spark, sf_dir):
    """Per-day new-vocabulary rate (vocabulary-axis drift monitor,
    companion to dup_rate_trend) — operators/textstats.py:
    vocab_novelty_trend. (day, term) aggregate + vocabulary-sized
    min-day broadcast join; single corpus scan."""
    return textstats.vocab_novelty_trend(_t(spark, sf_dir))


def q_tool_bigrams(spark, sf_dir):
    """Tool→tool transition matrix with outgoing probabilities —
    operators/agenttools.py:tool_bigrams. Tool filter prunes before the
    lead() window; probability window runs on the |tools|² matrix."""
    from .operators import agenttools

    return agenttools.tool_bigrams(_t(spark, sf_dir))


def q_conv_outcomes(spark, sf_dir):
    """How conversations end (last turn's role/level) — operators/
    convstruct.py:conv_outcomes. Struct-max per conversation, no
    window."""
    from .operators import convstruct

    return convstruct.conv_outcomes(
        parse.parse_turns(_t(spark, sf_dir), dynamic=False)
    )


def q_ingest_volume_trend(spark, sf_dir):
    """Per-day ingest volume with cumulative token share — operators/
    telemetry.py:ingest_volume_trend. Calendar-bounded windows over the
    per-day aggregate."""
    from .operators import telemetry

    return telemetry.ingest_volume_trend(_t(spark, sf_dir))


def q_ttfr_stats(spark, sf_dir):
    """Time-to-first-response percentiles (first user turn → first
    assistant turn) — operators/telemetry.py:ttfr_stats. Conditional
    min-aggregates per conversation; no window."""
    from .operators import telemetry

    return telemetry.ttfr_stats(_t(spark, sf_dir))


def q_turn_position_profile(spark, sf_dir):
    """Token mass by relative turn position (5 bands) — operators/
    chatformat.py:turn_position_profile. Unordered conv window + a
    5-key aggregate."""
    return chatformat.turn_position_profile(_t(spark, sf_dir))


def q_system_prompt_stats(spark, sf_dir):
    """Top-k system prompts by conversation count with conversation
    lengths — operators/convstruct.py:system_prompt_stats. Two conv_id
    aggregates + fingerprint-cardinality rollup."""
    from .operators import convstruct

    return convstruct.system_prompt_stats(_t(spark, sf_dir))


def q_response_ratio_stats(spark, sf_dir):
    """Assistant/user length-ratio percentiles over adjacent SFT pairs —
    operators/chatformat.py:response_ratio_stats. Pruned pairing window
    carrying two ints per row."""
    return chatformat.response_ratio_stats(_t(spark, sf_dir))


def q_code_switch_stats(spark, sf_dir):
    """Per-conversation language mixing via the marker lang-id —
    operators/textstats.py:code_switch_stats. (conv, lang) aggregate +
    struct-min dominant pick; no corpus window."""
    return textstats.code_switch_stats(_t(spark, sf_dir))


def q_psi_drift(spark, sf_dir):
    """Per-day PSI of the parsed bytes field vs the corpus distribution
    — operators/telemetry.py:psi_drift. (day, bin) aggregate;
    broadcast-joined totals; single scan."""
    from .operators import telemetry

    return telemetry.psi_drift(
        parse.parse_turns(_t(spark, sf_dir), dynamic=False)
    )


def q_conv_duration_hist(spark, sf_dir):
    """Wall-clock conversation-duration histogram (log2 minute buckets)
    — operators/telemetry.py:conv_duration_hist. One conv aggregate +
    bucket rollup."""
    from .operators import telemetry

    return telemetry.conv_duration_hist(_t(spark, sf_dir))


def q_active_convs_hourly(spark, sf_dir):
    """Hourly active-conversation concurrency via interval expansion —
    operators/telemetry.py:active_convs_hourly. Fan-out bounded by
    conversation duration in hours."""
    from .operators import telemetry

    return telemetry.active_convs_hourly(_t(spark, sf_dir))


def q_tool_latency_stats(spark, sf_dir):
    """Per-tool execution-latency percentiles (call-site turn → tool
    turn) — operators/telemetry.py:tool_latency_stats. One narrow lag()
    window + |tools|-cardinality aggregate."""
    from .operators import telemetry

    return telemetry.tool_latency_stats(_t(spark, sf_dir))


def q_embedding_norm_outliers(spark, sf_dir):
    """Top-k embedding rows by |z| of their L2 norm —
    operators/similarity.py:embedding_norm_outliers. Scan-side double
    fold, one-row stats broadcast, TakeOrderedAndProject."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.embedding_norm_outliers(emb)


def q_route_overlap(spark, sf_dir):
    """Sink fan-out combination audit (unrouted + multi-sink rows) —
    operators/route.py:route_overlap. Predicates shared with the router;
    ≤2^|sinks|-row aggregate."""
    return route.route_overlap(
        parse.parse_turns(_t(spark, sf_dir), dynamic=False)
    )


def q_enrich_coverage(spark, sf_dir):
    """Dimension-join coverage audit per role (schema-drift alarm) —
    operators/enrich.py:enrich_coverage. Reuses enrich_turns' broadcast
    joins; |roles|-cardinality aggregate."""
    from .operators import enrich

    return enrich.enrich_coverage(_t(spark, sf_dir), spark)


def q_error_position_profile(spark, sf_dir):
    """Error incidence by relative conversation position —
    operators/telemetry.py:error_position_profile. Unordered conv
    window + 5-key aggregate."""
    from .operators import telemetry

    return telemetry.error_position_profile(
        parse.parse_turns(_t(spark, sf_dir), dynamic=False)
    )


def q_quality_calibration(spark, sf_dir):
    """Cross-source quality-score calibration map (per-source
    percent_rank deciles) — operators/sampling.py:quality_calibration.
    One per-source window, tie-sharing ranks, engine-identical."""
    return sampling.quality_calibration(_docs(spark, sf_dir))


def q_ctx_amplification(spark, sf_dir):
    """Context re-send cost amplification per conversation (Σ running
    prompt totals vs transcript tokens) — operators/chatformat.py:
    ctx_amplification. Forward cumsum window fused with the conv
    aggregate."""
    return chatformat.ctx_amplification(_t(spark, sf_dir))


# Registration ORDER is part of the driver contract: the driver gates
# exactly the FIRST 50 keys (a count cut, not a time budget — see
# BASELINE.md "Round-5 handoff"). Round-6 window (VERDICT r5 'Next
# round' item 1, executed verbatim): positions 1-5 = the five keys every
# previous 50-row window sacrificed (`ooo_turns`, `conv_duration_hist`,
# `ttfr_stats`, `response_ratio_stats`, `ctx_amplification`) — after
# this round EVERY registered query has had a driver CORRECTNESS row;
# positions 6-50 = the 45 oldest-vintage carryover keys (last driver
# row r02/r03), re-certifying the oldest evidence — including the 8
# bench-headline queries this optimization round touched — at current
# HEAD. Rotation is a pure dict reorder: no key added, removed, or
# changed; the full 158-key value-level sweep re-verified after it.
SPARK_QUERIES = {
    # -- round-6 gate window, 1-5: the five keys never gated by any
    # prior 50-row window (VERDICT r5 'Next round' item 1) ----------
    "ooo_turns": q_ooo_turns,
    "conv_duration_hist": q_conv_duration_hist,
    "ttfr_stats": q_ttfr_stats,
    "response_ratio_stats": q_response_ratio_stats,
    "ctx_amplification": q_ctx_amplification,
    # -- window 6-50: the 45 oldest-vintage carryover keys (last
    # driver row r02/r03), re-certified at round-6 HEAD — includes
    # the bench headline queries this round optimized.
    # (approx_distinct is excluded: rows-only by design — no oracle —
    # so a window slot would only record err=no_oracle; range_join,
    # the next-oldest key, takes the slot.) ---------------------------
    "datetime_multiformat": q_datetime_multiformat,
    "parse_casts": q_parse_casts,
    "ip_normalize": q_ip_normalize,
    "pipeline_parse": q_pipeline_parse,
    "pipeline_route_counts": q_route_counts,
    "pipeline_agg_terms": q_agg_terms,
    "pipeline_enrich": q_enrich,
    "turn_ordering": q_ordering,
    "demo_e2e": q_demo_e2e,
    "demo_search_struct": q_demo_search_struct,
    "demo_ingest_types": q_demo_ingest_types,
    "search_substring_topk": q_search_substring_topk,
    "search_field_query": q_search_field_query,
    "search_bool_not": q_search_bool_not,
    "search_map_scoring": q_search_map_scoring,
    "tpch_q1": q_tpch_q1,
    "window_top_order": q_window_top_order,
    "time_rollup": q_time_rollup,
    "sessionize": q_sessionize,
    "hourly_windows": q_hourly_windows,
    "sliding_windows": q_sliding_windows,
    "dedup_exact": q_dedup_exact,
    "knn_bruteforce": q_knn_bruteforce,
    "token_budget": q_token_budget,
    "pivot_role_counts": q_pivot_roles,
    "unpivot_roles": q_unpivot_roles,
    "dynamic_fields": q_dynamic_fields,
    "lineage_counts": q_lineage_counts,
    "terms_raw": q_terms_raw,
    "terms_whitespace": q_terms_whitespace,
    "media_metadata": q_media_metadata,
    "media_features": q_media_features,
    "lang_id": q_lang_id,
    "quality_buckets": q_quality,
    "token_stats": q_token_stats,
    "fingerprints": q_fingerprint,
    "jaccard_adjacent": q_jaccard_adjacent,
    "simhash_pairs": q_simhash,
    "embedding_neardup": q_embedding_neardup,
    "lsh_ann_topk": q_lsh_ann,
    "ivf_ann_topk": q_ivf_ann,
    "join_topk": q_join_topk,
    "set_ops": q_set_ops,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    # -- positions 51+: remaining carryover surface in prior relative
    # order (every key green in CORRECTNESS_r03-r05 or value-checked
    # by tests/test_entry_oracle.py), heaviest md5_60 oracle-parity
    # dedup paths last so a time-budgeted sweep still gates the cheap
    # rows first. -----------------------------------------------------
    "dsir_weights": q_dsir_weights,
    "entropy_hist": q_entropy_hist,
    "cluster_purity": q_cluster_purity,
    "retrieval_eval": q_retrieval_eval,
    "grok_coverage": q_grok_coverage,
    "bpe_merges": q_bpe_merges,
    "bpe_fertility": q_bpe_fertility,
    "conv_template_dedup": q_conv_template_dedup,
    "tool_call_audit": q_tool_call_audit,
    "preference_pairs": q_preference_pairs,
    "loss_mask_spans": q_loss_mask_spans,
    "curriculum_order": q_curriculum_order,
    "prefix_sharing": q_prefix_sharing,
    "tool_loop_detect": q_tool_loop_detect,
    "crossdoc_spans": q_crossdoc_spans,
    "embedding_dim_stats": q_embedding_dim_stats,
    "slo_stats": q_slo_stats,
    "top_talkers": q_top_talkers,
    "latency_stats": q_latency_stats,
    "error_cascade": q_error_cascade,
    "dedup_keep_best": q_dedup_keep_best,
    "contrastive_pairs": q_contrastive_pairs,
    "span_corruption": q_span_corruption,
    "dup_rate_trend": q_dup_rate_trend,
    "echo_rate": q_echo_rate,
    "ctx_overflow": q_ctx_overflow,
    "gopher_rules": q_gopher_rules,
    "weighted_sample": q_weighted_sample,
    "turn_selfrep": q_turn_selfrep,
    "hhi_concentration": q_hhi_concentration,
    "term_burstiness": q_term_burstiness,
    "kl_drift": q_kl_drift,
    "tool_error_rate": q_tool_error_rate,
    "conv_gap_sessions": q_conv_gap_sessions,
    "conv_depth_hist": q_conv_depth_hist,
    "vocab_novelty_trend": q_vocab_novelty_trend,
    "tool_bigrams": q_tool_bigrams,
    "conv_outcomes": q_conv_outcomes,
    "ingest_volume_trend": q_ingest_volume_trend,
    "turn_position_profile": q_turn_position_profile,
    "system_prompt_stats": q_system_prompt_stats,
    "code_switch_stats": q_code_switch_stats,
    "psi_drift": q_psi_drift,
    "active_convs_hourly": q_active_convs_hourly,
    "tool_latency_stats": q_tool_latency_stats,
    "embedding_norm_outliers": q_embedding_norm_outliers,
    "route_overlap": q_route_overlap,
    "enrich_coverage": q_enrich_coverage,
    "error_position_profile": q_error_position_profile,
    "quality_calibration": q_quality_calibration,
    "funnel": q_funnel,
    "retention": q_retention,
    "dense_rank_ties": q_dense_rank_ties,
    "transition_matrix": q_transition_matrix,
    "conversion_latency": q_conversion_latency,
    "zscore_outliers": q_zscore_outliers,
    "cooccurrence": q_cooccurrence,
    "error_burst": q_error_burst,
    "multiline_assembly": q_multiline_assembly,
    "pmi_collocations": q_pmi_collocations,
    "skew_join": q_skew_join,
    "len_percentiles": q_len_percentiles,
    "stratified_sample": q_stratified_sample,
    "train_split": q_train_split,
    "pii_stats": q_pii_stats,
    "repetition_stats": q_repetition,
    "pack_sequences": q_pack_sequences,
    "incremental_dedup": q_incremental_dedup,
    "conv_assembly": q_conv_assembly,
    "corpus_build": q_corpus_build,
    "bm25_topk": q_bm25_topk,
    "phrase_search": q_phrase_search,
    "decontaminate": q_decontaminate,
    "kmeans_clusters": q_kmeans_clusters,
    "vocab_oov": q_vocab_oov,
    "trending_terms": q_trending_terms,
    "tfidf_topk": q_tfidf_topk,
    "mix_rebalance": q_mix_rebalance,
    "lm_perplexity": q_lm_perplexity,
    "role_alternation": q_role_alternation,
    "context_truncate": q_context_truncate,
    "boilerplate_topk": q_boilerplate_topk,
    "boilerplate_scrub": q_boilerplate_scrub,
    "ngram_spans": q_ngram_spans,
    "chunk_docs": q_chunk_docs,
    "quant_ann_topk": q_quant_ann_topk,
    "dialog_stats": q_dialog_stats,
    "sft_pairs": q_sft_pairs,
    "pii_redact": q_pii_redact,
    "shard_assign": q_shard_assign,
    "temperature_mix": q_temperature_mix,
    "length_trim": q_length_trim,
    "dup_cluster_stats": q_dup_cluster_stats,
    "cross_source_leakage": q_cross_source_leakage,
    "cdc_chunks": q_cdc_chunks,
    "filter_cascade": q_filter_cascade,
    "zipf_slope": q_zipf_slope,
    "semdedup": q_semdedup,
    "template_mining": q_template_mining,
    "rrf_fusion": q_rrf_fusion,
    "approx_distinct": q_approx_distinct,
    "cdc_compact": q_cdc_compact,
    "gap_fill": q_gap_fill,
    "ntile_quartiles": q_ntile_quartiles,
    "geomean_udaf": q_geomean_udaf,
    "moving_avg": q_moving_avg,
    "minhash_lsh_dedup": q_minhash_lsh,
    "dedup_clusters": q_dedup_clusters,
}
