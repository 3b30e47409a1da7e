"""Bucketed-table co-located join: the 100 TB claim, demonstrated.

BASELINE.md's plan audits argue the big joins/aggregations become
exchange-free on a conv_id-bucketed table. This test makes that claim
concrete on the session catalog: both join sides written with
bucketBy(conv_id) + sortBy, then joined — the plan must contain NO
Exchange (bucket co-location replaces the shuffle), while the same join
over plain parquet does shuffle both sides.
"""

import pytest
from pyspark.sql import functions as F

from go_distributed_log_search_spark.transcripts import transcripts_df

from .conftest import SF0001


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    t = transcripts_df(spark, SF0001)
    fact = t.select("conv_id", "turn_idx", "role")
    dim = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("conv_turns"))
    for name, df in (("bkt_fact", fact), ("bkt_dim", dim)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, "conv_id")
            .sortBy("conv_id")
            .saveAsTable(name)
        )
    yield "bkt_fact", "bkt_dim"
    for name in ("bkt_fact", "bkt_dim"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    fact_name, dim_name = bucketed_tables
    fact, dim = spark.table(fact_name), spark.table(dim_name)
    # disable broadcast so the join strategy is decided by distribution,
    # not dim size — at corpus scale the conv dim is not broadcastable
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = fact.join(dim, "conv_id").groupBy("role").agg(
            F.sum("conv_turns").alias("s")
        )
        plan = _plan(j)
        # bucket co-location: the join itself needs no shuffle of either side
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part, plan
        assert j.count() > 0

        # control: the same join over non-bucketed inputs shuffles
        plain_fact = transcripts_df(spark, SF0001).select(
            "conv_id", "turn_idx", "role"
        )
        plain_dim = plain_fact.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("conv_turns")
        )
        plain = _plan(plain_fact.join(plain_dim, "conv_id"))
        assert "Exchange" in plain, plain
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    fact_name, _ = bucketed_tables
    agg = spark.table(fact_name).groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() > 0
