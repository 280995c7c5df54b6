"""User-extension surface: registered UDFs and a UDTF (SURVEY §2 Part B
'UDF/UDAF/UDTF' — the reference's only extension point is editing the
Java distance method).

The engine's own hot paths never use these (JVM expressions throughout);
they exist so an engine USER can extend it: a vectorized pandas UDF for
numeric kernels, and a Python UDTF for set-returning transforms —
registered into the SQL catalog for spark.sql use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def cosine_sim_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized cosine similarity over two array columns."""
    x = np.asarray(a.tolist(), dtype=np.float64)
    y = np.asarray(b.tolist(), dtype=np.float64)
    num = (x * y).sum(1)
    den = np.sqrt((x * x).sum(1)) * np.sqrt((y * y).sum(1))
    return pd.Series(num / den)


@pandas_udf("double")
def gini_udaf(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF — PySpark's UDAF form (Series in,
    ONE scalar out per group; Arrow-batched, usable in groupBy().agg()
    and over windows): Gini concentration of a numeric column, a
    distribution-shape statistic Spark has no built-in for.

    Spark constraint (INVALID_PANDAS_UDF_PLACEMENT): a grouped-agg
    pandas UDF cannot share one agg/SELECT with built-in aggregates —
    compute built-ins in a separate aggregation and join on the keys."""
    x = np.sort(v.to_numpy(np.float64))
    n = x.size
    s = x.sum()
    if n == 0 or s == 0.0:
        return 0.0
    return float(((2.0 * np.arange(1, n + 1) - n - 1).dot(x)) / (n * s))


@udtf(returnType="pos: int, shingle: string")
class ShingleUDTF:
    """Set-returning word-3-gram generator (one row per shingle)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        for i in range(max(len(toks) - 2, 0)):
            yield i, " ".join(toks[i : i + 3])


def register_extensions(spark: SparkSession) -> None:
    """Make the extension functions callable from spark.sql."""
    spark.udf.register("cosine_sim", cosine_sim_udf)
    spark.udf.register("gini", gini_udaf)
    spark.udtf.register("shingles", ShingleUDTF)
