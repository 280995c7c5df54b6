"""Bucketed tables: co-located joins without a shuffle — the 100 TB
fact-fact join strategy (pre-shuffle once at write time, join free
forever after)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.plans import explain_str
from kmeanwithmapreduce_spark.plans.inspect import count_nodes
from kmeanwithmapreduce_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # managed tables land in ./spark-warehouse; DROP TABLE removes them
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable("o_bucketed")
    yield spark.table("li_bucketed"), spark.table("o_bucketed")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li, o = bucketed_tables
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    # disable broadcast so the join strategy itself is tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(joined)
        join_exchanges = plan.split("HashAggregate")[0]
        # the join itself requires no Exchange: bucket layout satisfies
        # the distribution requirement on both sides
        assert "SortMergeJoin" in plan
        assert count_nodes(join_exchanges, "Exchange") == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_join_correct(spark, sf_dir, bucketed_tables):
    li, o = bucketed_tables
    got = li.join(o, li.l_orderkey == o.o_orderkey).count()
    want = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert got == want
