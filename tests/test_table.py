"""Versioned table layer (sources/table.py): time-travel reads,
_SUCCESS-commit crash semantics, copy-forward rollback."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources.table import (
    read_table,
    rollback,
    table_epochs,
    write_snapshot,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def tpath(tmp_path):
    return str(tmp_path / "tbl")


def test_time_travel_reads(spark, tpath):
    v0 = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    v1 = spark.range(12).select(F.col("id"), (F.col("id") * 3).alias("v"))
    assert write_snapshot(v0, tpath) == 0
    assert write_snapshot(v1, tpath) == 1
    assert table_epochs(spark, tpath) == [0, 1]
    assert _rows(read_table(spark, tpath, as_of=0)) == _rows(v0)
    assert _rows(read_table(spark, tpath, as_of=1)) == _rows(v1)
    assert _rows(read_table(spark, tpath)) == _rows(v1)  # latest


def test_read_raises_on_missing_or_uncommitted(spark, tpath):
    with pytest.raises(FileNotFoundError):
        read_table(spark, tpath)
    write_snapshot(spark.range(3), tpath)
    with pytest.raises(ValueError):
        read_table(spark, tpath, as_of=7)


def test_crashed_write_is_redone_not_committed(spark, tpath):
    """A writer that died mid-write leaves epoch=N without _SUCCESS:
    readers must not see it, and the NEXT writer must claim the same
    epoch number and overwrite it cleanly (the replay discipline)."""
    write_snapshot(spark.range(5), tpath)  # epoch 0 committed
    # simulate the crash: full write, then remove the commit marker
    crashed = os.path.join(tpath, "epoch=1")
    spark.range(99).write.mode("overwrite").parquet(crashed)
    os.remove(os.path.join(crashed, "_SUCCESS"))
    assert table_epochs(spark, tpath) == [0]
    assert read_table(spark, tpath).count() == 5  # crashed epoch invisible
    e = write_snapshot(spark.range(7), tpath)
    assert e == 1  # same epoch reclaimed
    assert read_table(spark, tpath, as_of=1).count() == 7


def test_rollback_copy_forward_preserves_history(spark, tpath):
    v0 = spark.range(4)
    v1 = spark.range(9)
    write_snapshot(v0, tpath)
    write_snapshot(v1, tpath)
    e = rollback(spark, tpath, 0)
    assert e == 2
    assert table_epochs(spark, tpath) == [0, 1, 2]
    assert _rows(read_table(spark, tpath)) == _rows(v0)  # current is v0 again
    assert _rows(read_table(spark, tpath, as_of=1)) == _rows(v1)  # history intact


def test_rollback_of_unknown_epoch_raises(spark, tpath):
    write_snapshot(spark.range(2), tpath)
    with pytest.raises(ValueError):
        rollback(spark, tpath, 5)
