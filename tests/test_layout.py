"""Z-order layout: a 2-D box predicate must be able to skip far more
row groups under Morton clustering than under a 1-D sort, and the data
itself round-trips identically."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources.layout import write_zordered, zorder_key
from kmeanwithmapreduce_spark.sources.readers import load_table

_COLS = ["l_extendedprice", "l_quantity"]


def _must_scan_fraction(path: str, box: dict[str, tuple[float, float]]) -> float:
    """Fraction of row groups whose min/max stats intersect the box in
    EVERY dimension (i.e. cannot be skipped by a stats-based reader)."""
    total = 0
    must = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            hit = True
            for c, (lo, hi) in box.items():
                st = g.column(names.index(c)).statistics
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            if hit:
                must += 1
    assert total >= 8, f"need multiple row groups to compare ({total})"
    return must / total


def test_zorder_prunes_2d_box_better_than_linear_sort(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(*_COLS, "l_orderkey")
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    # ~100 row groups: the curve needs granularity to show its shape —
    # with few fat groups every layout must-scan most of them
    write_zordered(li, zpath, _COLS, n_files=8, max_records_per_file=60)
    (
        li.repartitionByRange(8, _COLS[0])
        .sortWithinPartitions(_COLS[0])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 60)
        .parquet(lpath)
    )
    # a ~30% x ~30% box: 1-D sort can prune only on its sort column
    # (must scan ~30% of groups); Z-order prunes on BOTH, approaching
    # the ~9% product plus curve-boundary overhead (measured ~17% vs
    # ~31% linear at this granularity)
    q = li.approxQuantile(_COLS, [0.30, 0.60], 0.001)
    box = {_COLS[0]: (q[0][0], q[0][1]), _COLS[1]: (q[1][0], q[1][1])}
    z = _must_scan_fraction(zpath, box)
    lin = _must_scan_fraction(lpath, box)
    assert z < lin * 0.75, (z, lin)

    # layout never changes content: box-filtered reads agree
    pred = (
        (F.col(_COLS[0]) >= box[_COLS[0]][0])
        & (F.col(_COLS[0]) <= box[_COLS[0]][1])
        & (F.col(_COLS[1]) >= box[_COLS[1]][0])
        & (F.col(_COLS[1]) <= box[_COLS[1]][1])
    )
    a = sorted(map(tuple, spark.read.parquet(zpath).where(pred).collect()))
    b = sorted(map(tuple, spark.read.parquet(lpath).where(pred).collect()))
    assert a == b and len(a) > 0


def test_zorder_key_range_and_determinism(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(*_COLS).limit(2000)
    z1 = zorder_key(li, _COLS, bits=4)
    row = z1.agg(
        F.min("_zkey").alias("lo"), F.max("_zkey").alias("hi")
    ).collect()[0]
    assert 0 <= row.lo <= row.hi < 2 ** (4 * len(_COLS))
    z2 = zorder_key(li, _COLS, bits=4)
    assert sorted(map(tuple, z1.collect())) == sorted(map(tuple, z2.collect()))


def test_zorder_key_refuses_bit_overflow(spark, sf_dir):
    """bits*n_cols > 63 would wrap JVM shiftleft mod 64 and silently
    corrupt the sort key — must raise, never corrupt."""
    import pytest as _pytest

    e = load_table(spark, sf_dir, "events").select("user_id", "value", "event_id")
    with _pytest.raises(ValueError, match="63 usable bits"):
        zorder_key(e, ["user_id", "value", "event_id"], bits=22)
    # 9 cols * 7 bits = 63 is the boundary and must still work
    wide = e.limit(200).select(
        *[(F.col("user_id") * (i + 1)).alias(f"c{i}") for i in range(9)]
    )
    with _pytest.raises(ValueError, match="63 usable bits"):
        zorder_key(wide, [f"c{i}" for i in range(9)], bits=8)
    z = zorder_key(wide, [f"c{i}" for i in range(9)], bits=7)
    assert z.where("_zkey < 0").count() == 0
