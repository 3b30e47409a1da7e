"""Context-window packing — greedy document packing to a token budget.

The step between cleaning and tokenization in an LLM data build: short
documents are concatenated into fixed-budget training sequences so the
context window isn't wasted on padding. The semantic is inherently
sequential WITHIN a pack stream (pack boundaries depend on the running
sum), so this is a custom operator per the build brief's (b) tier: an
Arrow-batched ``applyInPandas`` over each pack stream, vectorized inside
the group (numpy cumulative pass, no per-row Python function calls).

Scale shape: one shuffle partitions the corpus into pack streams
(``group_col``); each stream packs independently. At 10^12 docs the
stream key is (source, shard) with shard = a hash bucket of bounded size
— packing order is per-stream by id, so sharding changes WHICH docs
share a sequence (any partition of the corpus is a valid packing) but
keeps determinism within the chosen sharding. Greedy next-fit is the
standard choice (first-fit-decreasing packs ~tighter but needs a sort
and is still O(stream)); next-fit is one pass and what most production
packers (GPT-style pretraining pipelines) use.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize
from .textstats import ws_token_count_expr


def next_fit_assign(tokens, budget: int) -> list[int]:
    """Pure next-fit kernel: pack id per item, in order. A new pack opens
    when the running sum would exceed ``budget``; an item larger than the
    budget gets a pack of its own. Module-level so the invariants are
    property-testable without Spark (tests/test_packing.py)."""
    packs = []
    pack, acc, first = 0, 0, True
    for v in tokens:
        if first:
            acc, first = v, False
        elif acc + v > budget:
            pack += 1
            acc = v
        else:
            acc += v
        packs.append(pack)
    return packs


def pack_sequences(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
) -> DataFrame:
    """Assign each doc a ``pack_id`` within its group: docs are taken in
    ``id_col`` order; a doc that would push the running token sum over
    ``budget`` starts a new pack (a doc larger than the budget gets a
    pack of its own). Returns (group, id, n_tokens, pack_id).
    """
    toks = df.select(
        F.col(group_col), F.col(id_col), ws_token_count_expr(F.col(text_col)).alias("n_tokens")
    )

    schema_src = toks.schema
    out_schema = ", ".join(
        [
            f"{group_col} {schema_src[group_col].dataType.simpleString()}",
            f"{id_col} {schema_src[id_col].dataType.simpleString()}",
            "n_tokens integer",
            "pack_id integer",
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        # per-GROUP python loop over a numpy array — the group is a
        # bounded shard, not the corpus; two integer ops per element
        packs = next_fit_assign(pdf["n_tokens"].to_numpy(), budget)
        pdf["pack_id"] = pd.Series(packs, dtype="int32")
        pdf["n_tokens"] = pdf["n_tokens"].astype("int32")
        return pdf[[group_col, id_col, "n_tokens", "pack_id"]]

    return toks.groupBy(group_col).applyInPandas(_pack, out_schema)


def pack_summary(packed: DataFrame, group_col: str = "source") -> DataFrame:
    """(group, pack_id) -> docs, tokens, budget utilization snapshot."""
    return packed.groupBy(group_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """RAG-style overlapping token chunking: (doc_id, chunk_idx, start_tok,
    n_toks, chunk_text).

    Chunk c covers tokens [c*stride, c*stride + size) of the default
    tokenization; chunks are emitted while their start offset is inside
    the document, so the final chunk may be shorter than ``size`` (the
    standard sliding-window chunker for embedding/RAG ingestion).

    Shape: pure Catalyst — tokens materialized as a column once (never
    re-tokenized inside the HOF, see the interpreted-HOF trap in
    BASELINE.md), chunk starts from sequence(), slices from slice(), one
    posexplode. No shuffle at all: chunking is embarrassingly parallel
    per input split, which is exactly what you want in front of a 100 TB
    embedding pass.
    """
    toks_df = df.select(
        F.col(id_col), tokenize(F.col(text_col), "default").alias("_toks")
    ).filter(F.size("_toks") >= 1)
    starts = F.sequence(F.lit(1), F.size(F.col("_toks")), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(F.col("_toks"), s, size))
    return toks_df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "_chunk"),
    ).select(
        id_col,
        "chunk_idx",
        (F.col("chunk_idx") * stride).alias("start_tok"),
        F.size("_chunk").alias("n_toks"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    )


def span_corruption(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    chunk: int = 3,
    mask_rate: float = 0.15,
) -> DataFrame:
    """Deterministic T5-style span-corruption spec: which token spans of
    each document would be masked, summarized per group.

    Denoising pretraining needs the mask schedule to be reproducible
    across reruns and cluster sizes (the target sequence is derived from
    it), so instead of an RNG the mask is a pure hash: tokens are tiled
    into fixed ``chunk``-token pieces and piece c of doc d is masked iff
    the first 4 hex chars of md5(d#c), read base-16, fall below
    65536 * mask_rate. Adjacent masked pieces merge into one span
    (classic gaps-and-islands), matching how T5 emits one sentinel per
    contiguous masked run.

    Plan shape: chunk indices explode to (doc, chunk_idx) rows — a
    bounded ~n_tokens/chunk fan-out computed map-side; the mask predicate
    is Catalyst (md5 + conv), the span merge is one doc-keyed window over
    MASKED pieces only (~mask_rate of the fan-out), and the output is two
    partial+final aggregates. No Python, no RNG state.

    Output (group asc): (group, n_docs, n_tokens, n_masked, n_spans,
    avg_mask_frac) where avg_mask_frac is the per-doc macro average, 4dp.
    """
    threshold = int(65536 * mask_rate)
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("grp"),
        F.size(tokenize(F.col(text_col), "default")).alias("n_tok"),
    )
    chunks = base.select(
        "_id",
        "grp",
        "n_tok",
        F.explode(
            F.sequence(F.lit(0), F.ceil(F.col("n_tok") / chunk).cast("int") - 1)
        ).alias("c"),
    ).filter(F.col("n_tok") > 0)
    masked = chunks.filter(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("_id"), F.col("c")).cast("binary")),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        < threshold
    )
    w = Window.partitionBy("_id").orderBy("c")
    spans = masked.withColumn(
        "new_span",
        F.when(
            F.col("c") - F.lag("c").over(w) == 1, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "piece_len",
        F.least(F.lit(chunk), F.col("n_tok") - F.col("c") * chunk),
    )
    per_doc = spans.groupBy("_id", "grp", "n_tok").agg(
        F.sum("piece_len").alias("masked"),
        F.sum("new_span").alias("spans"),
    )
    # docs with zero masked pieces still count toward totals/averages
    stats = base.filter(F.col("n_tok") > 0).join(
        per_doc.select("_id", "masked", "spans"), "_id", "left"
    )
    return (
        stats.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.coalesce(F.sum("masked"), F.lit(0)).cast("bigint").alias("n_masked"),
            F.coalesce(F.sum("spans"), F.lit(0)).cast("bigint").alias("n_spans"),
            F.round(
                F.avg(F.coalesce(F.col("masked"), F.lit(0)) / F.col("n_tok")), 4
            ).alias("avg_mask_frac"),
        )
        .select(F.col("grp").alias(group_col), "n_docs", "n_tokens",
                "n_masked", "n_spans", "avg_mask_frac")
        .orderBy(group_col)
    )
