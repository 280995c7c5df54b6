"""Data-source availability probe shared by the env-gated connectors
(kafka.py, avro.py).

Asks Spark's own resolver — ``DataSource.lookupDataSource(name,
sqlConf)`` — whether a source name resolves on this classpath. A bare
``Class.forName`` on the provider class is NOT a valid probe: Spark
special-cases the "built-in but external module" error for avro/kafka,
so the class can be reachable while ``format("avro")`` still refuses to
resolve.

lookupDataSource takes the session's **SQLConf** (it reads
spark.sql.sources.* settings), not a SparkConf. Passing a SparkConf
makes Py4J raise "method does not exist" for EVERY name — parquet
included — which silently turns the probe into a constant False and
permanently disables the connector even when the jar is present. To
make that failure mode loud instead of silent, ``source_available``
first self-checks that ``parquet`` (always built-in) resolves: if it
does not, the probe itself is broken and we raise instead of skipping.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _lookup(spark: SparkSession, name: str) -> bool:
    # SQLConf, not SparkConf: sessionState().conf() is the live session
    # SQLConf object lookupDataSource expects.
    spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
        name, spark._jsparkSession.sessionState().conf()
    )
    return True


def source_available(spark: SparkSession, name: str) -> bool:
    """True when data source ``name`` resolves in this session; False
    when Spark raises its missing-source error for it. Raises
    RuntimeError when the probe mechanism itself is broken (the
    always-present ``parquet`` source fails to resolve)."""
    try:
        return _lookup(spark, name)
    except Exception as exc:
        try:
            _lookup(spark, "parquet")
        except Exception as self_check_exc:
            raise RuntimeError(
                "data-source probe is broken: lookupDataSource('parquet') "
                f"failed ({self_check_exc!r}); refusing to report "
                f"{name!r} as unavailable"
            ) from exc
        return False
