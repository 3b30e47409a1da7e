"""The transcripts view must be byte-identical across Spark and DuckDB —
this is the foundation of every oracle comparison."""

import hashlib

from go_distributed_log_search_spark.transcripts import (
    transcripts_sql_duckdb,
    transcripts_sql_spark,
)

from .conftest import SF0001


def _h(rows):
    return hashlib.md5(repr(rows).encode()).hexdigest()


def test_cross_engine_parity(spark, duck):
    ssql = transcripts_sql_spark(SF0001)
    sdf = spark.sql(
        f"SELECT conv_id, turn_idx, role, text, tool, unix_micros(ts) AS ts_us "
        f"FROM ({ssql}) ORDER BY conv_id, turn_idx"
    )
    s_rows = [tuple(r) for r in sdf.collect()]

    dsql = transcripts_sql_duckdb(SF0001)
    d_rows = duck.sql(
        f"SELECT conv_id, turn_idx, role, text, tool, "
        f"CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM ({dsql}) "
        f"ORDER BY conv_id, turn_idx"
    ).fetchall()

    assert len(s_rows) == 1000
    assert _h(s_rows) == _h(d_rows)


def test_shape_invariants(spark):
    from pyspark.sql import functions as F

    from go_distributed_log_search_spark.transcripts import transcripts_df

    df = transcripts_df(spark, SF0001)
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    assert dict(df.dtypes)["turn_idx"] == "int"
    # natural key unique; turn_idx contiguous from 0
    stats = (
        df.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("turn_idx").alias("nd"),
            F.min("turn_idx").alias("mn"),
            F.max("turn_idx").alias("mx"),
        )
        .collect()
    )
    for r in stats:
        assert r.n == r.nd and r.mn == 0 and r.mx == r.n - 1
    # skew engineered: hot convs exist and dominate
    hot = df.filter(F.col("conv_id").startswith("conv-hot")).count()
    assert hot > 0.25 * 1000
    # system only at turn 0
    assert df.filter((F.col("role") == "system") & (F.col("turn_idx") != 0)).count() == 0
