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


def test_runtime_bloom_filter_prunes_selective_join(spark, sf_dir):
    """Runtime Bloom-filter join pruning — the 100 TB selective-join
    lever: with broadcast off (the big-fact big-dim regime where a BHJ
    is impossible), a selective dim-side filter must inject a
    bloom_filter_agg on the build side and a might_contain probe into
    the fact scan side, so the shuffle carries only candidate rows.
    Thresholds are lowered to trigger at test scale; the PLAN mechanism
    pinned here is exactly what fires at real creation/application
    sizes. Values are cross-checked against the un-filtered join."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold",
            "1KB",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").where(F.col("p_size") == 1)
        j = li.join(part, li.l_partkey == part.p_partkey).select(
            "l_orderkey", "p_brand"
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
        with_bloom = sorted((r.l_orderkey, r.p_brand) for r in j.collect())
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") == 1)
    plain = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    assert with_bloom == sorted((r.l_orderkey, r.p_brand) for r in plain.collect())
