"""JDBC source/sink surface (SURVEY §2 Part B "Sources/sinks: ...
JDBC"). Thin declarative wrappers over ``spark.read/write.format
("jdbc")`` so the parallel-read contract is explicit:

- an un-partitioned JDBC read is ONE task pulling the whole table
  through one connection — fine for dimension tables, a serialization
  bottleneck at scale;
- the scale path is ``partition_column`` + bounds + ``num_partitions``:
  Spark issues one bounded-range query per partition, so the read
  parallelizes like a file scan (and predicate pushdown applies per
  connection).

The container ships no standalone database server; the test suite
exercises this surface against the Derby EMBEDDED driver bundled with
Spark's own jars (tests/test_jdbc.py), skipping with a logged probe if
no driver class is resolvable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def jdbc_driver_available(spark: SparkSession, driver: str = DERBY_EMBEDDED_DRIVER) -> bool:
    """Probe the JVM classpath for a JDBC driver class (no instantiation)."""
    try:
        spark._jvm.java.lang.Class.forName(driver)
        return True
    except Exception:
        return False


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_EMBEDDED_DRIVER,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 1))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str = DERBY_EMBEDDED_DRIVER,
    mode: str = "overwrite",
) -> None:
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode(mode)
        .save()
    )
