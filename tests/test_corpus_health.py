"""Corpus-health / mixture operators: temperature mix, length trim,
dup-cluster histogram, cross-source leakage."""

import math

from go_distributed_log_search_spark.operators import dedup, sampling


def test_temperature_mix_weights(spark):
    rows = [(i, "big" if i < 80 else "small", "x") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r.source: r for r in sampling.temperature_mix(df, tau=0.7).collect()}
    tot = 80**0.7 + 20**0.7
    assert out["big"].n_docs == 80
    assert abs(out["big"].mix_weight - round(80**0.7 / tot, 6)) < 1e-9
    assert abs(out["small"].mix_weight - round(20**0.7 / tot, 6)) < 1e-9
    # tau < 1 flattens: small source gets MORE than its 0.2 share
    assert out["small"].mix_weight > 0.2
    assert abs(out["big"].mix_weight + out["small"].mix_weight - 1.0) < 1e-5


def test_temperature_mix_tau_extremes(spark):
    rows = [(i, "a" if i < 90 else "b", "x") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    prop = {r.source: r.mix_weight for r in sampling.temperature_mix(df, tau=1.0).collect()}
    assert abs(prop["a"] - 0.9) < 1e-6  # tau=1 -> proportional
    unif = {r.source: r.mix_weight for r in sampling.temperature_mix(df, tau=0.0).collect()}
    assert abs(unif["a"] - 0.5) < 1e-6  # tau=0 -> uniform


def test_length_trim_counts(spark):
    # source s: token counts 1..20 -> p05 = 1.95, p95 = 19.05
    rows = [(i, "s", "w " * i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    r = sampling.length_trim(df).collect()[0]
    assert r.n_docs == 20
    assert abs(r.lo_cut - 1.95) < 1e-9 and abs(r.hi_cut - 19.05) < 1e-9
    assert r.n_too_short == 1  # only the 1-token doc is < 1.95
    assert r.n_too_long == 1   # only the 20-token doc is > 19.05


def test_dup_cluster_stats_histogram(spark):
    texts = ["a"] * 3 + ["b"] * 3 + ["c"] * 2 + ["d", "e", "f"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = {r.cluster_size: (r.n_clusters, r.n_docs)
           for r in dedup.dup_cluster_stats(df).collect()}
    assert out == {1: (3, 3), 2: (1, 2), 3: (2, 6)}
    assert sum(v[1] for v in out.values()) == len(texts)  # conservation


def test_cross_source_leakage_pairs(spark):
    rows = [
        (0, "s1", "shared one"),
        (1, "s2", "shared one"),
        (2, "s3", "shared one"),      # "shared one" in s1,s2,s3 -> 3 pairs
        (3, "s1", "shared two"),
        (4, "s2", "shared two"),      # "shared two" in s1,s2
        (5, "s1", "only here"),
        (6, "s2", "lone text"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {(r.src_a, r.src_b): r.n_shared
           for r in dedup.cross_source_leakage(df).collect()}
    assert out == {
        ("s1", "s2"): 2,
        ("s1", "s3"): 1,
        ("s2", "s3"): 1,
    }


def test_cross_source_leakage_normalizes_text(spark):
    # same fingerprint despite case/whitespace differences
    df = spark.createDataFrame(
        [(0, "a", "Hello  World"), (1, "b", "hello world")],
        ["doc_id", "source", "text"],
    )
    out = dedup.cross_source_leakage(df).collect()
    assert len(out) == 1 and out[0].n_shared == 1


def test_cdc_chunk_boundaries_resync_after_insertion(spark):
    # the CDC property: an insertion shifts positions but downstream
    # chunks re-synchronize, so doc1 and doc2 share their tail chunks
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    shifted = "INSERTED " + base
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], ["doc_id", "text"]
    )
    out = dedup.cdc_chunk_dedup(df, mod=4, min_tokens=2, min_docs=2, k=50)
    rows = out.collect()
    # boundaries (md5-prefix % 4 == 0): alpha, beta, epsilon — so both
    # docs chunk into [alpha][beta gamma delta][epsilon..kappa] after the
    # insertion point, and the two multi-token chunks are shared
    assert [r.chunk for r in rows] == [
        "beta gamma delta",
        "epsilon zeta eta theta iota kappa",
    ]
    assert all(r.n_docs == 2 for r in rows)


def test_cdc_chunk_determinism_and_counts(spark):
    df = spark.createDataFrame(
        [(i, "hash column a slow hash column b fast") for i in range(3)],
        ["doc_id", "text"],
    )
    out1 = dedup.cdc_chunk_dedup(df, min_docs=2, k=10).collect()
    out2 = dedup.cdc_chunk_dedup(df, min_docs=2, k=10).collect()
    assert out1 == out2                      # deterministic
    # boundaries: hash, a -> chunks [hash column][a slow][hash column b fast]
    assert len(out1) == 3
    assert all(r.n_docs == 3 for r in out1)  # identical docs share all
    assert all(r.n_hits >= r.n_docs for r in out1)
