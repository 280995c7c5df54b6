"""Checkpoint/restart fault tolerance: a streaming aggregation stopped
mid-stream and restarted from its checkpoint must recover its state
store and file-source progress log — no double counting, no lost
windows. This is THE Structured Streaming recovery contract (WAL +
state store under checkpointLocation), exercised on bounded input."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)

_T0 = datetime(2024, 5, 1, 9, 0, 0)


def _rows(i0, n):
    """n events one minute apart starting at minute i0, key alternating."""
    return [
        (_T0 + timedelta(minutes=i0 + i), "ab"[i % 2], float(i0 + i))
        for i in range(n)
    ]


def _agg(stream):
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "k", "total", "n")
    )


def _start(spark, src, ckpt, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return (
        _agg(stream)
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .format("memory")
        .queryName(name)
        .start()
    )


def test_streaming_checkpoint_restart_no_double_count(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ckpt_src"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_meta"))

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # phase 1: two files, run to completion, then STOP the query
    write(_rows(0, 10))
    write(_rows(10, 10))
    q1 = _start(spark, src, ckpt, "ckpt_t1")
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()

    # phase 2: more data arrives while the query is down
    write(_rows(20, 10))
    write(_rows(5, 3))  # overlaps phase-1 windows: state must be LIVE

    # restart from the SAME checkpoint: the file log must skip the two
    # already-processed files and the state store must still hold the
    # phase-1 window sums
    q2 = _start(spark, src, ckpt, "ckpt_t2")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {
        (r.ws, r.k): (r.total, r.n)
        for r in spark.sql("SELECT * FROM ckpt_t2").collect()
    }
    want_df = (
        spark.read.schema(SCHEMA)
        .parquet(src)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "k", "total", "n")
    )
    want = {(r.ws, r.k): (r.total, r.n) for r in want_df.collect()}
    assert got == want  # exactly-once: every event counted exactly once
    # the overlap rows really did land in phase-1 windows (state was live)
    overlap_windows = {ws for (ws, _k) in want if ws < _T0 + timedelta(minutes=10)}
    assert overlap_windows
    total_n = sum(n for (_t, n) in got.values())
    assert total_n == 33


def test_restart_with_changed_query_is_rejected(spark, tmp_path_factory):
    """A checkpoint binds the query shape: restarting with an
    incompatible aggregation must fail loudly, not corrupt state."""
    src = str(tmp_path_factory.mktemp("ckpt2_src"))
    ckpt = str(tmp_path_factory.mktemp("ckpt2_meta"))
    spark.createDataFrame(_rows(0, 5), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q1 = _start(spark, src, ckpt, "ckpt_t3")
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()

    # new data so the restarted query actually executes a micro-batch —
    # state schema validation only fires when the state store is loaded
    spark.createDataFrame(_rows(5, 5), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    incompatible = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("k")  # no window: different state layout
        .agg(F.avg("v").alias("a"), F.max("v").alias("m"), F.min("v").alias("lo"))
    )
    with pytest.raises(Exception):
        q = (
            incompatible.writeStream.outputMode("complete")
            .option("checkpointLocation", ckpt)
            .format("memory")
            .queryName("ckpt_t4")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
