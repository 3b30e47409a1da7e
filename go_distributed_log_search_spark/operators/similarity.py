"""Similarity search over embedding columns (array<float>).

Training-pipeline extension (build brief): approximate-nearest-neighbor
over the ``embeddings`` table.

- brute_force_topk: exact cosine top-k. Queries are broadcast (small side);
  each executor scans its partition of the corpus and emits per-partition
  candidates; the global top-k per query is a window rank over
  (query, score) — at 1000 executors this is the textbook
  broadcast-then-local-topk shape (shuffle carries only k rows per
  (query, partition), not the corpus).
- lsh_bucketed_topk: random-hyperplane LSH — sign-bit signature via
  deterministic pseudo-hyperplanes (xxhash64-derived), candidates from
  bucket equality, exact cosine re-rank inside buckets. The scale path:
  corpus scanned once to tag buckets; the join is an equi-join on
  (band, bucket).

Dot products use F.zip_with + F.aggregate (JVM higher-order functions,
no Python). Norms are precomputed once per side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Output: (query_id, neighbor_id, cos_sim, rank). Self-matches excluded.
    Deterministic tie-break on neighbor_id.
    """
    # accumulate in double (cast once) — float32 partial sums differ across
    # engines/SIMD and would make ranks nondeterministic near ties
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine_expr(F.col("qvec"), F.col("cvec")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j in {-1, +1}
    from a splitmix-style integer hash of (plane, j). No RNG state —
    reproducible on any cluster."""
    comps = []
    for j in range(dim):
        z = (plane * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        comps.append(1.0 if (z >> 63) else -1.0)
    return comps


def lsh_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Sign-bit signature as a long: bit p = sign(vec . hyperplane_p)."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, p)])
        bit = F.when(_dot(vec, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
        sig = sig + bit
    return sig


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: candidates share >= 1 LSH signature band; exact cosine re-rank.

    Recall < 1 by construction (approximate); rank determinism as above.
    """
    bits_per_band = n_planes // bands

    def banded(df: DataFrame, side: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).cast("array<double>").alias(f"{side}_vec"),
        ).withColumn("_sig", lsh_signature(F.col(f"{side}_vec"), dim, n_planes))
        out = out.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
        )
        mask = (1 << bits_per_band) - 1
        return out.withColumn(
            "bucket",
            F.expr(f"shiftrightunsigned(_sig, band * {bits_per_band})").bitwiseAND(F.lit(mask)),
        ).drop("_sig")

    qb = banded(queries, "query")
    cb = banded(corpus, "neighbor")
    cand = (
        cb.join(F.broadcast(qb), on=["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_vec", "neighbor_id", "neighbor_vec")
        .distinct()
    )
    scored = cand.withColumn(
        "cos_sim", F.round(cosine_expr(F.col("query_vec"), F.col("neighbor_vec")), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
