"""AQE runtime skew-join handling on the corpus's engineered Zipf key.

Two mechanisms exist for the 40%-hot conv keys: the manual
skew_safe_join (operators/enrich.py — plan-time hot/cold split) and
Spark's Adaptive Query Execution, which detects the oversized shuffle
partition AT RUNTIME and splits it across reducers (OptimizeSkewedJoin).
This pins the AQE path actually engaging: the final adaptive plan marks
the sort-merge join ``skew=true``.

Found while building this test (and worth knowing at 100 TB): the skew
rule only splits when BOTH join inputs are bare shuffle stages. If one
side's exchange is fused under an aggregate (dim built by groupBy in the
same query), OptimizeSkewedJoin cannot replicate that side's partitions
and silently leaves the straggler in place — precisely the case where
the manual skew_safe_join still earns its keep. Hence the dim side here
is materialized to parquet first so its join shuffle is splittable.
"""

from pyspark.sql import functions as F

from go_distributed_log_search_spark.transcripts import transcripts_df

SF001 = "/root/testdata/sf0.01"

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # scale detection to the test data's shuffle sizes (defaults are 256M)
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    # skew split applies to sort-merge/shuffled-hash joins, not broadcast
    "spark.sql.join.preferSortMergeJoin": "true",
    # 32-way shuffle: at the test fixture's 8 partitions the two hot convs
    # share reducers with enough cold keys that no partition clears the
    # factor x median bar — more partitions isolate the hot keys
    "spark.sql.shuffle.partitions": "32",
}


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        t = transcripts_df(spark, SF001).select("conv_id", "turn_idx", "role")
        dim_path = str(tmp_path / "conv_dim")
        t.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("conv_turns")
        ).write.mode("overwrite").parquet(dim_path)
        dim = spark.read.parquet(dim_path)

        j = t.join(dim, "conv_id").select(
            F.sum(F.col("conv_turns") + F.col("turn_idx")).alias("s")
        )
        # collect() on THIS Dataset finalizes ITS adaptive plan (count()
        # would run a different QueryExecution and leave this one unrun)
        assert j.collect()[0]["s"] is not None
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
