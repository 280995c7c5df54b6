"""AQE runtime re-planning: after execution, the adaptive plan should
have coalesced the 8 static shuffle partitions of a tiny aggregate down
to fewer post-shuffle partitions (the behavior that keeps small
intermediate stages from being over-parallelized at any scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources.readers import load_table


def test_aqe_coalesces_small_shuffle(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()  # execute so AQE finalizes the plan
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in executed
    assert "coalesced" in executed
    final = df.rdd.getNumPartitions()
    assert final < int(spark.conf.get("spark.sql.shuffle.partitions"))
