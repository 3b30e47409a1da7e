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


def test_filter_cascade_funnel_arithmetic(spark):
    from go_distributed_log_search_spark.operators import textstats

    rows = [
        (1, "tiny doc"),                                   # stage 1: < 5 tokens
        (2, "x " * 1500),                                  # stage 2: > 2000 chars
        (3, "a!!! b??? c### d$$$ e%%%"),                   # stage 3: punct > 0.3
        (4, "the the the the the the the the the the"),    # stage 4: rep < 0.3
        (5, "alpha beta gamma delta epsilon zeta"),        # stage 5: no stopword
        (6, "the quick brown fox jumps over a lazy dog"),  # pass
        (7, "it is a truth universally acknowledged today"),  # pass
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = textstats.filter_cascade(df).collect()
    assert [r.stage for r in out] == [1, 2, 3, 4, 5, 6]
    assert [r.filter_name for r in out] == [
        "min_tokens", "max_chars", "punct_ratio", "repetition",
        "stopwords", "pass",
    ]
    assert [r.n_killed for r in out] == [1, 1, 1, 1, 1, 0]
    # exact funnel: each stage's n_out feeds the next stage's n_in
    assert out[0].n_in == 7
    for prev, nxt in zip(out, out[1:]):
        assert prev.n_out == nxt.n_in
    assert out[-1].n_out == 2


def test_filter_cascade_stages_dense_when_nothing_killed(spark):
    from go_distributed_log_search_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over a lazy dog")], ["doc_id", "text"]
    )
    out = textstats.filter_cascade(df).collect()
    assert len(out) == 6  # every stage present even with zero kills
    assert all(r.n_killed == 0 for r in out)
    assert out[-1].n_out == 1


def test_zipf_slope_perfect_zipf_is_minus_one(spark):
    from go_distributed_log_search_spark.operators import textstats

    # freq = 12 / rank for ranks 1..4 -> ln f = ln 12 - ln rank, slope -1
    text = " ".join(["aa"] * 12 + ["bb"] * 6 + ["cc"] * 4 + ["dd"] * 3)
    df = spark.createDataFrame([(1, "s0", text)], ["doc_id", "source", "text"])
    out = textstats.zipf_slope(df, group_col="source").collect()
    assert len(out) == 1
    assert out[0].n_terms == 4
    assert abs(out[0].slope - (-1.0)) < 1e-9


def test_semdedup_keeps_lowest_id_per_semantic_group(spark):
    from go_distributed_log_search_spark.operators import similarity

    # 2 seed centroids (lowest ids >= 10): e0-ish and e1-ish directions.
    # 20/21 duplicate the centroids exactly; 22 is near-orthogonal.
    rows = [
        (10, [1.0, 0.0, 0.0]),
        (11, [0.0, 1.0, 0.0]),
        (20, [1.0, 0.05, 0.0]),   # cluster 0, dup of 10
        (21, [0.0, 1.0, 0.05]),   # cluster 1, dup of 11
        (22, [0.6, 0.0, 0.8]),    # cluster 0, cos 0.6 < 0.9 -> kept
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.cell: r for r in similarity.semdedup(
        df, n_cells=2, threshold=0.9, seed_min_id=10).collect()}
    assert out[0].n_vecs == 3 and out[0].n_removed == 1
    assert out[1].n_vecs == 2 and out[1].n_removed == 1
