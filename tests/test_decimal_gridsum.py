"""Boundary test for the DECIMAL(38,0) gridsum variant: a sum whose
scaled units exceed int64 (~9.2e18). The BIGINT path wraps silently
(Spark's non-ANSI sum), the DECIMAL path must match DuckDB's HUGEINT
oracle exactly. Values are chosen so each scaled element (5e18) is an
exactly-representable double (5e18 = 2^18 * 5^19, 5^19 < 2^53)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators.relational import _gridsum, _gridsum_dec

_VALS = [5.0e16, 5.0e16, 5.0e16]  # dollars; cents sum = 1.5e19 > 2^63-1


def _oracle_sum() -> float:
    con = duckdb.connect()
    rows = ", ".join(f"({v!r})" for v in _VALS)
    return con.execute(
        f"SELECT CAST(sum(CAST(round(v * 100) AS BIGINT)) AS DOUBLE) / 100.0 "
        f"FROM (VALUES {rows}) AS t(v)"
    ).fetchone()[0]


def test_decimal_gridsum_survives_bigint_overflow(spark):
    import pytest

    df = spark.createDataFrame([(v,) for v in _VALS], "v double")
    dec = df.agg(_gridsum_dec(F.col("v"), 100).alias("s")).first()["s"]
    want = _oracle_sum()
    assert dec == want == 1.5e17
    # the BIGINT path demonstrably dies at this magnitude (Spark 4 ANSI
    # sum overflow -> job failure; legacy mode would wrap silently) —
    # the reason the DECIMAL variant exists
    with pytest.raises(Exception, match="(?i)overflow"):
        df.agg(_gridsum(F.col("v"), 100).alias("s")).first()


def test_decimal_gridsum_matches_bigint_below_bound(spark):
    # below the overflow bound the two variants are bit-identical, so
    # swapping a query to the DECIMAL path never changes its oracle hash
    vals = [123.45, 0.01, 99999.99, 42.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    dec = df.agg(_gridsum_dec(F.col("v"), 100).alias("s")).first()["s"]
    big = df.agg(_gridsum(F.col("v"), 100).alias("s")).first()["s"]
    assert dec == big
