"""JDBC connector smoke against the Derby EMBEDDED driver that ships in
Spark's own jars directory (derby-*.jar — no server, no network). Turns
the COVERAGE.md "no external DB in the container" disclosure into an
executable statement: if no driver class is resolvable the tests skip
with the probe logged; where Derby is present (every stock PySpark
install) the full write -> read -> partitioned-read path runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources.jdbc import (
    DERBY_EMBEDDED_DRIVER,
    jdbc_driver_available,
    read_jdbc,
    write_jdbc,
)


@pytest.fixture()
def derby_url(spark, tmp_path):
    if not jdbc_driver_available(spark):
        pytest.skip(
            f"no JDBC driver on the JVM classpath (probed {DERBY_EMBEDDED_DRIVER})"
        )
    return f"jdbc:derby:{tmp_path}/smokedb;create=true"


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )
    write_jdbc(df, derby_url, "smoke_t")
    back = read_jdbc(spark, derby_url, "smoke_t")
    assert sorted(c.lower() for c in back.columns) == ["k", "v"]
    assert back.count() == 100
    assert back.agg(F.sum("v")).first()[0] == float(sum(i * 2 for i in range(100)))


def test_jdbc_partitioned_read_parallelism(spark, derby_url):
    # the scale path: bounded-range predicates give one query per
    # partition instead of a single-connection full pull
    df = spark.range(1000).select(F.col("id").alias("k"))
    write_jdbc(df, derby_url, "part_t")
    part = read_jdbc(
        spark,
        derby_url,
        "part_t",
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 1000


def test_jdbc_pushdown_filter(spark, derby_url):
    df = spark.range(500).select(F.col("id").alias("k"))
    write_jdbc(df, derby_url, "push_t")
    got = read_jdbc(spark, derby_url, "push_t").where(F.col("k") < 10)
    # filter is pushed into the JDBC scan (PushedFilters in the scan node)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan" in plan
    assert got.count() == 10
