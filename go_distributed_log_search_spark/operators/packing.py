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

from pyspark.sql import DataFrame
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
