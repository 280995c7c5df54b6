"""Avro source/sink — probe-gated like the Kafka connector.

Avro support lives in the external ``spark-avro`` module (public Apache
Spark packaging: org.apache.spark:spark-avro_2.13), which this container
does not ship and cannot download (no network). Everything here is the
REAL call path — ``format("avro")`` and the ``from_avro``/``to_avro``
column functions — taken automatically when the jar is on the
classpath; without it, callers get one clear error instead of Spark's
FAILED_TO_FIND_DATA_SOURCE stack. tests/test_sources_sinks.py probes
and stops skipping the moment the jar resolves (the kafka.py pattern,
sources/kafka.py:70-77).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

def avro_available(spark: SparkSession) -> bool:
    """True when the ``avro`` data source actually resolves (vendored
    spark-avro jar / cluster image); False in this container. NOTE: a
    bare ``Class.forName("...AvroFileFormat")`` is NOT a valid probe —
    the class can be reachable while the data source still refuses to
    resolve (Spark special-cases the 'built-in but external module'
    error), so this asks Spark's own lookup. The shared probe
    self-checks against 'parquet' so a broken probe raises instead of
    silently reporting unavailable (sources/probe.py)."""
    from .probe import source_available

    return source_available(spark, "avro")


def _require(spark: SparkSession) -> None:
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro is not on the classpath (this container has no "
            "network to vendor it); on a cluster add the public "
            "org.apache.spark:spark-avro package"
        )


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    _require(df.sparkSession)
    df.write.mode(mode).format("avro").save(path)


def read_avro(spark: SparkSession, path: str, schema=None) -> DataFrame:
    _require(spark)
    reader = spark.read.format("avro")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
