"""Embedding clustering — distributed Lloyd k-means for semantic
grouping of a training corpus (diversity sampling, semantic dedup
pre-binning, per-cluster quotas).

Extension beyond the reference (which has no vector operations at all);
sits beside operators/similarity.py in the embedding family.

Scale shape (the classic MLlib one, restated on DataFrames):
- centroids live as a BROADCAST numpy matrix (K x dim — KBs), never in
  the plan as literals;
- assignment is one Arrow-batched pandas_udf doing a BLAS argmin per
  batch — a pure scan of the corpus, no shuffle, no join;
- the per-iteration update aggregates only (cluster, dim-sum, count) —
  K x dim doubles — via element-wise array sums, so each Lloyd round
  moves kilobytes through the shuffle regardless of corpus size;
- iteration count is a fixed small constant (caller-chosen), so the
  driver loop materializes K x dim per round, nothing else.

Determinism: init = the K lowest-id vectors (a deterministic seeding a
SQL oracle can replay; kmeans++ would be better numerically but is
sampling-order-dependent), ties in argmin break to the LOWEST centroid
id in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _np():
    import numpy as np

    return np


def _assign_udf(spark, cent_mat):
    """pandas_udf: array<float> embedding -> nearest-centroid id (int),
    squared-L2, BLAS-batched, ties to the lowest centroid id."""
    import pandas as pd

    np = _np()
    bc = spark.sparkContext.broadcast(cent_mat)

    def _fn(s):  # no hints: __future__ annotations breaks the resolver
        c = bc.value  # (K, dim) float64
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in s])
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
        d = -2.0 * (m @ c.T) + (c * c).sum(axis=1)
        # np.argmin returns the FIRST minimal index -> lowest centroid id
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    return F.pandas_udf(_fn, "int")


def kmeans_assign(
    df: DataFrame,
    cent_mat,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One assignment pass: (id, vec, cluster_id)."""
    assign = _assign_udf(df.sparkSession, cent_mat)
    return df.select(
        F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("cluster_id")
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Run the Lloyd loop and return the fitted centroid matrix
    (K x dim numpy float64). Shared by kmeans() (audit table) and
    cluster_purity() (label agreement) so both report against the SAME
    deterministic fit.

    Per iteration exactly ONE job over the corpus (assignment fused with
    the element-wise sum aggregate); the driver only ever sees K x dim
    doubles.
    """
    np = _np()
    init_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    cent = np.asarray([np.asarray(r[1], dtype=np.float64) for r in init_rows])
    dim = cent.shape[1]

    for _ in range(iters):
        assigned = kmeans_assign(df, cent, id_col, vec_col)
        # element-wise centroid sums via posexplode + hash aggregate:
        # the explode is map-side pipelined (never shuffled) and partial
        # aggregation reduces each task's contribution to K x dim rows
        # before the exchange, so the shuffle moves kilobytes at any
        # corpus size. (collect_list-per-cluster would materialize a
        # whole cluster's vectors into one row — a scale trap.)
        sums = (
            assigned.select(
                "cluster_id", F.posexplode(F.col(vec_col)).alias("pos", "val")
            )
            .groupBy("cluster_id", "pos")
            .agg(
                F.sum(F.col("val").cast("double")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_cent = cent.copy()
        by_cluster: dict[int, list] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
        for cid, rows in by_cluster.items():
            vec = np.zeros(dim)
            n = rows[0]["n"]
            for r in rows:
                vec[r["pos"]] = r["s"]
            new_cent[cid] = vec / n
        cent = new_cent
    return cent


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means, deterministic init (K lowest-id vectors). Returns
    the final assignment's per-cluster audit table:
    (cluster_id, n_members, avg_dist) with avg_dist = mean L2 distance
    to the cluster's (post-update) centroid, rounded to 4dp.
    """
    np = _np()
    cent = kmeans_fit(df, k, iters, id_col, vec_col)

    final = kmeans_assign(df, cent, id_col, vec_col)
    # audit distances against the FINAL centroids via a broadcast udf too
    import pandas as pd

    bc = df.sparkSession.sparkContext.broadcast(cent)

    def _dist_fn(s, cl):  # no hints: see _fn
        c = bc.value
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in s])
        d = m - c[cl.to_numpy()]
        return pd.Series(np.sqrt((d * d).sum(axis=1)))

    dist = F.pandas_udf(_dist_fn, "double")
    return (
        final.withColumn("dist", dist(F.col(vec_col), F.col("cluster_id")))
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("dist"), 4).alias("avg_dist"),
        )
    )


def cluster_purity(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Cluster-vs-label agreement audit: fit k-means (same deterministic
    kmeans_fit the kmeans_clusters query uses), assign every vector, and
    report per cluster the majority ground-truth label and purity =
    n_majority / n_members — the standard external clustering-quality
    check before trusting unsupervised clusters for curriculum bucketing
    or per-cluster sampling quotas.

    Scale shape: ONE assignment scan (broadcast centroids, Arrow-batched
    argmin) feeding a (cluster, label) aggregate; cluster sizes derive
    from that same aggregate (sum over labels — no second corpus pass).
    The majority window runs over |clusters x labels| rows, not data.
    Ties on majority label break to the LOWEST label in both engines.

    Output: (cluster_id, n_members, majority_label, n_majority, purity)
    ordered by cluster_id.
    """
    from pyspark.sql import Window as _W

    cent = kmeans_fit(df, k, iters, id_col, vec_col)
    assign = _assign_udf(df.sparkSession, cent)
    assigned = df.select(
        F.col(label_col).alias("_lbl"),
        assign(F.col(vec_col)).alias("cluster_id"),
    )
    counts = assigned.groupBy("cluster_id", "_lbl").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = _W.partitionBy("cluster_id").orderBy(F.col("c").desc(), F.col("_lbl"))
    sized = counts.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_members", F.sum("c").over(_W.partitionBy("cluster_id"))
    )
    return (
        sized.filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("n_members").cast("long").alias("n_members"),
            F.col("_lbl").alias("majority_label"),
            F.col("c").cast("long").alias("n_majority"),
            F.round(F.col("c") / F.col("n_members"), 4).alias("purity"),
        )
        .orderBy("cluster_id")
    )
