"""SQL / catalog surface: every table as a temp view plus a ``run_sql``
entry point — the reference has no SQL layer (SURVEY §2 Part B,
'Catalog/DDL'); here the full Spark SQL dialect comes along for free and
compiles to the same Catalyst plans as the DataFrame operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.readers import register_views


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the star schema as temp views and run one SQL query."""
    register_views(spark, sf_dir)
    return spark.sql(query)


# A Spark-SQL-dialect rendition of q01 (proves the SQL surface reaches
# the same plans as the DataFrame API; asserted equal in tests).
Q01_SPARK_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_base_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0
         AS sum_disc_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS sum_charge,
       floor(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) * 100.0D / count(*)) / 10000.0D
         AS avg_qty,
       floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) * 100.0D / count(*)) / 10000.0D
         AS avg_price,
       floor(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) * 100.0D / count(*)) / 10000.0D
         AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""
