"""End-to-end training-corpus build — the flagship composition.

One declarative chain of the pipeline's LLM-data operators:

    scrub PII -> exact-dedup (keep min id) -> deterministic split
    -> context-window packing -> per-split summary

Every stage is an existing operator with engine-identical semantics, so
the WHOLE build is oracle-checkable as one chained DuckDB query (the
driver's `corpus_build` row). At 10^12 docs the chain is: two scans'
worth of map work, one dedup shuffle on the 16-byte fingerprint, one
packing shuffle on the split key — nothing else; every intermediate
stays columnar and unmaterialized unless the caller checkpoints it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.packing import pack_sequences
from .operators.sampling import split_assign
from .operators.textstats import fingerprint_expr, pii_scrub_expr


def corpus_build(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
) -> DataFrame:
    """documents -> per-split (n_docs, n_packs, total_tokens) summary.

    Dedup keeps the MIN id per scrubbed-text fingerprint (scrub first:
    two docs differing only in redacted PII are the same training doc).
    Packing streams are the splits themselves — at 10^12 docs use
    (split, hash-shard) exactly as pack_sequences documents.
    """
    scrubbed = docs.withColumn(text_col, pii_scrub_expr(F.col(text_col)))
    keepers = (
        scrubbed.groupBy(fingerprint_expr(F.col(text_col)).alias("_fp"))
        .agg(F.min(id_col).alias(id_col))
        .drop("_fp")
    )
    kept = scrubbed.join(keepers, on=id_col, how="left_semi")
    split = split_assign(kept, id_col)
    packed = pack_sequences(
        split, group_col="split", id_col=id_col, text_col=text_col, budget=budget
    )
    return packed.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("pack_id").alias("n_packs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
