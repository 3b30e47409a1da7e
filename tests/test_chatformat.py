"""Chat-format integrity + turn scrubbing + chunking + quantized ANN.

Unit fixtures are tiny handwritten conversations with KNOWN violations /
boilerplate so every branch is pinned independently of the synthetic
transcripts (which the oracle sweep covers end to end).
"""

import pandas as pd

from go_distributed_log_search_spark.operators import (
    chatformat,
    dedup,
    packing,
    similarity,
)

TURNS = [
    # conv A: well-formed system/user/assistant alternation
    ("a", 0, "system", "you are helpful"),
    ("a", 1, "user", "hi there"),
    ("a", 2, "assistant", "hello hello hello"),
    # conv B: no system turn, a same-role run, a tool answering a user
    ("b", 0, "user", "hi there"),
    ("b", 1, "user", "anyone?"),
    ("b", 2, "tool", "lookup result"),
    ("b", 3, "assistant", "hello hello hello"),
    # conv C: tool follows assistant (fine); double tool run (fine: tools)
    ("c", 0, "system", "you are helpful"),
    ("c", 1, "assistant", "let me check"),
    ("c", 2, "tool", "lookup result"),
    ("c", 3, "tool", "second page"),
]


def _turns_df(spark):
    return spark.createDataFrame(TURNS, ["conv_id", "turn_idx", "role", "text"])


def test_role_alternation_counts(spark):
    out = {
        r.violation: (r.n_turns, r.n_convs)
        for r in chatformat.role_alternation_report(_turns_df(spark)).collect()
    }
    assert out == {
        "missing_system": (1, 1),  # conv b turn 0
        "same_role_run": (1, 1),   # conv b user,user (tool runs exempt)
        "tool_after_user": (1, 1), # conv b turn 2
    }


def test_context_truncate_keeps_newest(spark):
    rows = [("x", i, "user", "w " * n) for i, n in enumerate([50, 40, 30, 20])]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    r = chatformat.context_truncate(df, budget=60).collect()[0]
    # from the end: 20 (ok, 20) + 30 (ok, 50) + 40 (110 > 60 stop)
    assert (r.n_turns, r.total_tokens, r.kept_turns, r.kept_tokens,
            r.first_kept_idx) == (4, 140, 2, 50, 2)


def test_boilerplate_detection_and_scrub(spark):
    # "hi there" appears in 2 convs, "hello hello hello" in 2, others < 2
    top = chatformat.boilerplate_turns(_turns_df(spark), min_convs=2, k=10)
    examples = {r.example: r.n_convs for r in top.collect()}
    assert examples == {
        "hi there": 2,
        "hello hello hello": 2,
        "lookup result": 2,
        "you are helpful": 2,
    }
    scrub = {
        r.role: (r.n_turns, r.n_dropped)
        for r in chatformat.boilerplate_scrub(_turns_df(spark), min_convs=2).collect()
    }
    # user: 3 turns, "hi there" x2 dropped; assistant: "hello..." x2 dropped,
    # "let me check" kept; tool: "lookup result" x2 dropped, "second page" kept
    assert scrub == {
        "system": (2, 2),
        "user": (3, 2),
        "assistant": (3, 2),
        "tool": (3, 2),
    }


def test_boilerplate_scrub_broadcasts_frequent_set(spark):
    plan = chatformat.boilerplate_scrub(_turns_df(spark))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repeated_ngram_spans(spark):
    docs = [
        (1, "the quick brown fox jumps"),
        (2, "a lazy dog saw the quick brown fox sleeping"),
        (3, "the quick brown fox jumps again and the quick brown fox rests"),
        (4, "completely unrelated words here"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = dedup.repeated_ngram_spans(df, n=4, min_docs=2, k=10).collect()
    by_gram = {r.gram: (r.n_docs, r.n_hits) for r in rows}
    assert by_gram["the quick brown fox"] == (3, 4)  # doc3 has it twice
    assert rows[0].gram == "the quick brown fox"  # top by n_docs
    assert all(r.n_docs >= 2 for r in rows)


def test_chunk_documents_windows(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(40))), (2, "only three tokens")],
        ["doc_id", "text"],
    )
    rows = packing.chunk_documents(df, size=32, stride=24).collect()
    d1 = sorted([r for r in rows if r.doc_id == 1], key=lambda r: r.chunk_idx)
    # 40 tokens: chunk0 = [0,32), chunk1 = [24,40) -> 16 toks
    assert [(r.chunk_idx, r.start_tok, r.n_toks) for r in d1] == [
        (0, 0, 32), (1, 24, 16)]
    assert d1[0].chunk_text.startswith("t0 t1 ") and d1[1].chunk_text.startswith("t24 ")
    d2 = [r for r in rows if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].n_toks == 3


def test_chunk_documents_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = packing.chunk_documents(df)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "Exchange" not in plan


def test_quantized_topk_matches_numpy(spark):
    import numpy as np

    rng = [
        (i, [float(((i * 7 + j * 13) % 11) - 5) / 5.0 for j in range(8)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rng, ["vec_id", "embedding"])
    out = similarity.quantized_topk(df, df.filter("vec_id < 2"), k=3)
    got = {(r.query_id, r.rank): (r.neighbor_id, r.qdot) for r in out.collect()}
    # reference: same quantization in numpy
    m = np.asarray([v for _, v in rng], dtype=np.float64)
    ma = np.abs(m).max(axis=1)
    q = np.floor(m * (127.0 / np.where(ma > 0, ma, 1.0))[:, None] + 0.5).astype(np.int64)
    for qi in (0, 1):
        scores = sorted(
            ((int(q[qi] @ q[c]), -c) for c in range(20) if c != qi),
            reverse=True,
        )
        for rank in (1, 2, 3):
            s, negc = scores[rank - 1]
            assert got[(qi, rank)] == (-negc, s)


def test_quantization_is_integer_exact(spark):
    # max|x| component maps to exactly +/-127; zero vector -> all zeros
    df = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25]), (1, [0.0, 0.0, 0.0]), (2, [1.0, 1.0, 1.0])],
        ["vec_id", "embedding"],
    )
    import numpy as np

    codes = similarity._quantize_rows([[0.5, -1.0, 0.25], [0.0, 0.0, 0.0]])
    assert codes.tolist() == [[64, -127, 32], [0, 0, 0]]
    out = similarity.quantized_topk(df, df.filter("vec_id = 0"), k=2).collect()
    assert {r.neighbor_id for r in out} == {1, 2}
    assert all(isinstance(r.qdot, int) for r in out)


def test_context_truncate_pandas_free_plan(spark):
    # pure Catalyst: no Python eval nodes in the plan
    df = _turns_df(spark)
    plan = chatformat.context_truncate(df)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "EvalPython" not in plan


def test_dialog_stats_tool_chains(spark):
    rows = [
        ("a", 0, "system", "s"),
        ("a", 1, "user", "u u"),
        ("a", 2, "tool", "t"),
        ("a", 3, "tool", "t"),
        ("a", 4, "tool", "t"),
        ("a", 5, "assistant", "x y z"),
        ("a", 6, "tool", "t"),
        ("b", 0, "system", "s"),
        ("b", 1, "user", "hi"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    out = {r.conv_id: r for r in chatformat.dialog_stats(df).collect()}
    a = out["a"]
    assert (a.n_turns, a.n_user, a.n_assistant, a.n_tool) == (7, 1, 1, 4)
    assert a.max_tool_chain == 3  # turns 2-4; the lone turn 6 is shorter
    assert a.assistant_tokens == 3
    b = out["b"]
    assert (b.n_tool, b.max_tool_chain) == (0, 0)  # no-tool conv -> 0


def test_sft_pairs_extraction(spark):
    rows = [
        ("a", 0, "system", "s"),
        ("a", 1, "user", "one two three"),      # 3 prompt toks
        ("a", 2, "assistant", "four five"),     # pair 1: 2 completion toks
        ("a", 3, "user", "six"),
        ("a", 4, "tool", "t"),                  # breaks adjacency
        ("a", 5, "assistant", "seven"),         # NOT a pair (prev=tool)
        ("c", 0, "system", "s"),                # conv with no pair: omitted
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    out = chatformat.sft_pairs(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.conv_id, r.n_pairs, r.prompt_tokens, r.completion_tokens) == (
        "a", 1, 3, 2)


def test_pii_redact_report(spark):
    rows = [
        ("a", 0, "user", "mail me at bob@example.com please"),
        ("a", 1, "assistant", "server 10.1.2.3 is down"),
        ("a", 2, "assistant", "nothing sensitive"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    out = {r.role: r for r in chatformat.pii_redact_report(df).collect()}
    assert out["user"].n_redacted == 1
    assert out["assistant"].n_redacted == 1
    assert out["assistant"].n_turns == 2
    # "bob@example.com" (15 chars) -> "<EMAIL>" (7): delta -8
    assert out["user"].chars_after == out["user"].chars_before - 8


def test_assign_shards_covers_and_balances(spark):
    from go_distributed_log_search_spark.operators import sampling

    rows = [(i, "s%d" % (i % 3), "w " * 10) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = sampling.assign_shards(df, n_shards=8).collect()
    assert sum(r.n_docs for r in out) == 400          # total conservation
    assert {r.shard for r in out} == set(range(8))    # every shard hit
    assert all(r.total_tokens == r.n_docs * 10 for r in out)
    # determinism: re-run gives identical assignment
    out2 = sampling.assign_shards(df, n_shards=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
