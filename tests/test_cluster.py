"""Distributed Lloyd k-means (operators/cluster.py)."""

from pyspark.sql import functions as F

from go_distributed_log_search_spark.operators.cluster import kmeans, kmeans_assign


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_separated_clusters(spark):
    """Two well-separated blobs, k=2, lowest-id init (one seed lands in
    each blob) -> perfect membership after one iteration."""
    rows = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(5)] + [
        (5, [10.0, 10.0]),
    ] + [(i, [10.0 + 0.01 * i, 10.0]) for i in range(6, 10)]
    # init = vec 0 (blob A) and vec 1 (also blob A) -- second centroid
    # migrates to blob B only after the update step, so 2 iterations
    out = {
        r.cluster_id: r.n_members
        for r in kmeans(_vecs(spark, rows), k=2, iters=2).collect()
    }
    assert sorted(out.values()) == [5, 5]


def test_kmeans_assign_tie_breaks_to_lowest_cid(spark):
    import numpy as np

    cent = np.asarray([[1.0, 0.0], [-1.0, 0.0]])
    df = _vecs(spark, [(0, [0.0, 5.0])])  # exactly equidistant
    [row] = kmeans_assign(df, cent).collect()
    assert row.cluster_id == 0


def test_kmeans_singleton_clusters_stable(spark):
    """k == n: every point is its own centroid; avg_dist 0 everywhere."""
    df = _vecs(spark, [(i, [float(i), 0.0]) for i in range(3)])
    rows = kmeans(df, k=3, iters=1).collect()
    assert sorted((r.cluster_id, r.n_members, r.avg_dist) for r in rows) == [
        (0, 1, 0.0),
        (1, 1, 0.0),
        (2, 1, 0.0),
    ]
