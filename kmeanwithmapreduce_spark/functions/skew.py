"""Skew-handling join utility: key salting.

AQE's skew-join splitting handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled is on in session.py); explicit
salting remains the tool when one key dominates so heavily that even
split sub-partitions bottleneck, or when the skewed side feeds an
aggregation rather than a join. The pattern: explode the small side
into N salted copies, salt the big side randomly, equi-join on
(key, salt) — the hot key's rows spread over N tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on column ``on``, spreading each
    key of ``big`` across ``n_salts`` shuffle partitions.

    ``small`` is replicated n_salts times (explode of a literal range) —
    acceptable when small is dimension-sized. Result equals
    ``big.join(small, on, how)`` exactly.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "_salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    return (
        big_salted.join(small_rep, [on, "_salt"], how)
        .drop("_salt")
    )
