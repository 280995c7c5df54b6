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


# join types for which salting preserves exact semantics: every row of
# ``big`` carries exactly one salt, so big-side multiplicity is exact;
# right/full outer would emit each UNMATCHED small row once per salt
# replica (matched rows are fine) — n_salts-fold duplication.
# Stored in normalized form (lowercase, underscores stripped) so every
# Spark-accepted alias of a safe type — 'semi', 'leftsemi', 'left_semi',
# 'anti', 'leftouter', … — passes the check (DataFrame.join itself
# normalizes the same way: see JoinType in the Spark source).
_SALT_SAFE_HOW = frozenset({"inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"})


def _normalize_how(how: str) -> str:
    return how.lower().replace("_", "")


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
    ``big.join(small, on, how)`` exactly for the big-side-preserving
    join types (inner/left/left_semi/left_anti); right/full outer are
    rejected because unmatched ``small`` rows would be emitted once per
    salt replica.
    """
    if _normalize_how(how) not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join supports {sorted(_SALT_SAFE_HOW)}; got how={how!r} "
            "(unmatched small-side rows would duplicate n_salts times)"
        )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "_salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    return (
        big_salted.join(small_rep, [on, "_salt"], how)
        .drop("_salt")
    )
