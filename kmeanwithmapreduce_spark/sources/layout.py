"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional row-group pruning.

Parquet scans skip row groups whose column min/max statistics exclude
the predicate. A table sorted by ONE column prunes well on that column
and not at all on others; interleaving the bits of several columns'
rank-buckets (the Z-order curve — public technique, used by every
lakehouse layout optimizer) makes row groups tight in EVERY interleaved
dimension at once, so a 2-D box predicate skips most of the file.

At 100 TB this is the difference between scanning the whole table and
scanning a few percent for selective multi-column filters — entirely at
write time, no index structure, nothing for readers to know about.

Mechanics (all built-in operators, one shuffle):
1. per-column quantile buckets: ``approxQuantile`` computes 2^bits - 1
   cutpoints distributedly (only the tiny cutpoint list reaches the
   driver — no global sort, no single-partition window), and each row's
   bucket is the count of cutpoints <= value, a literal-array
   ``F.filter``/``F.size`` expression (quantile buckets, not value
   ranges, so skewed distributions still flatten uniformly);
2. bit-interleave the bucket ids into one Z-key (JVM-side shift/or
   expression composition, no UDF);
3. ``repartitionByRange`` + ``sortWithinPartitions`` on the Z-key and
   write with bounded ``maxRecordsPerFile`` so each file/row-group
   covers a tight Z-range.

The pruning win is pinned by test (tests/test_layout.py): for a 2-D box
predicate, the fraction of row groups whose stats CANNOT be skipped is
several times smaller under Z-order than under a 1-D sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_BITS = 6  # 2^6 quantile buckets per dimension


def zorder_key(df: DataFrame, cols: list[str], bits: int = _DEFAULT_BITS):
    """Add a ``_zkey`` column: the Morton interleave of each NUMERIC
    column's approx-quantile bucket (0 .. 2^bits - 1).

    The key is one signed long, so the interleave can address at most
    63 bit positions; the JVM's shiftleft wraps the shift amount mod 64,
    which would silently fold high dimensions onto low bits and corrupt
    the clustering — refuse instead of corrupting."""
    if bits * len(cols) > 63:
        raise ValueError(
            f"zorder_key: bits*len(cols) = {bits}*{len(cols)} = "
            f"{bits * len(cols)} exceeds the 63 usable bits of the long "
            f"Z-key; lower bits (max {63 // len(cols)} for {len(cols)} "
            "columns) or interleave fewer columns"
        )
    probs = [i / 2**bits for i in range(1, 2**bits)]
    # ONE distributed quantile job covering every dimension
    all_cuts = df.approxQuantile(list(cols), probs, 0.001)
    out = df
    for i, (c, cuts) in enumerate(zip(cols, all_cuts)):
        lit_cuts = F.array(*[F.lit(float(v)) for v in cuts])
        bucket = F.size(
            F.filter(lit_cuts, lambda cv: cv <= F.col(c).cast("double"))
        ).cast("long")
        out = out.withColumn(f"_zb{i}", bucket)
    # interleave: bit b of bucket i lands at position b * n_cols + i
    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i in range(n):
            bit = F.shiftright(F.col(f"_zb{i}"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return out.withColumn("_zkey", key).drop(*[f"_zb{i}" for i in range(n)])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    max_records_per_file: int | None = None,
    bits: int = _DEFAULT_BITS,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``cols``: range-partition by the Z-key (contiguous curve segments
    per file), sort within each file, drop the key from the output."""
    z = zorder_key(df, cols, bits)
    out = z.repartitionByRange(n_files, "_zkey").sortWithinPartitions("_zkey")
    w = out.drop("_zkey").write.mode("overwrite")
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.parquet(path)
