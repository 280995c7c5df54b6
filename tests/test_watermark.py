"""Watermark semantics: in append mode a watermarked tumbling aggregate
must drop events that arrive after the watermark has passed their
window, and emit only finalized windows."""

from __future__ import annotations

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


def _write_batch(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        path
    )


def test_late_event_dropped_in_append_mode(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("late_src"))
    from datetime import datetime

    t = datetime(2024, 1, 1, 10, 0, 0)

    def at(minute):
        return datetime(2024, 1, 1, 10, minute, 0)

    # batch 1: events in windows [10:00,10:05) and a watermark-advancing
    # event far ahead at 10:30
    _write_batch(
        spark,
        [(at(1), "a", 1.0), (at(2), "a", 1.0), (at(30), "b", 1.0)],
        src,
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "k")
        .agg(F.sum("v").alias("total"))
        .select(F.col("w.start").alias("ws"), "k", "total")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE event for the already-finalized 10:00 window
        # (watermark is now 10:30 - 5min = 10:25 > 10:05)
        _write_batch(spark, [(at(3), "a", 100.0)], src)
        q.processAllAvailable()
        # batch 3: advance watermark far enough to finalize everything
        _write_batch(spark, [(at(59), "c", 1.0)], src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        (r["ws"].minute, r["k"]): r["total"]
        for r in spark.sql("SELECT * FROM late_test").collect()
    }
    # the 10:00 window for k=a contains ONLY the two on-time events —
    # the late 100.0 was dropped
    assert rows[(0, "a")] == pytest.approx(2.0)
    assert (30, "b") in rows
