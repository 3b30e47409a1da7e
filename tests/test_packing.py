"""Context-window packing: next-fit boundaries, oversized docs, budget."""

from go_distributed_log_search_spark.operators import packing


def test_pack_boundaries_and_oversize(spark):
    rows = [
        ("s", 1, "a " * 100),   # 100 tokens -> pack 0 (acc 100)
        ("s", 2, "b " * 100),   # acc 200 -> pack 0
        ("s", 3, "c " * 100),   # would be 300 > 256 -> pack 1 (acc 100)
        ("s", 4, "d " * 300),   # 300 > budget alone -> pack 2
        ("s", 5, "e " * 10),    # 300+10 overflows -> pack 3
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
    packed = {r.doc_id: r.pack_id for r in packing.pack_sequences(
        df, budget=256).collect()}
    assert packed == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3}


def test_pack_summary_conserves_tokens(spark):
    rows = [("s", i, "w " * (i + 1)) for i in range(10)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
    packed = packing.pack_sequences(df, budget=8)
    total = sum(r.total_tokens for r in packing.pack_summary(packed).collect())
    assert total == sum(i + 1 for i in range(10))
