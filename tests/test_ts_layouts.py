"""Data-layout contract for the events ``ts`` column.

The upstream testdata writer has shipped ``ts`` in two physical parquet
layouts so far — TIMESTAMP(NANOS) (Spark: nanosecond long under
``nanosAsLong``) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark 4:
TIMESTAMP_NTZ, the pandas/pyarrow default). Round 3 broke on the switch
in BOTH failure modes: a loud AnalysisException (NTZ -> BIGINT cast) and
silent 1970-era timestamps in streaming (micros interpreted as nanos).

This matrix test writes a tiny events table in each layout and asserts
the batch reader AND the streaming reader recover the identical 2024-era
wall-clock values from every one — the test that would have caught both
regressions before the driver did.
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources.readers import load_table
from kmeanwithmapreduce_spark.streaming.windows import read_events_stream

# ten wall-clock instants, deliberately 2024-era with sub-second parts
_TS = [
    datetime(2024, 3, 1, 12, 0, 0, 250_000),
    datetime(2024, 3, 1, 12, 0, 59, 999_000),
    datetime(2024, 3, 1, 12, 30, 0, 0),
    datetime(2024, 3, 1, 18, 45, 12, 125_000),
    datetime(2024, 3, 2, 0, 0, 0, 1_000),
    datetime(2024, 6, 15, 6, 6, 6, 600_000),
    datetime(2024, 6, 15, 6, 6, 7, 0),
    datetime(2024, 11, 30, 23, 59, 59, 875_000),
    datetime(2024, 12, 31, 0, 0, 1, 0),
    datetime(2024, 12, 31, 23, 0, 0, 500_000),
]

_WANT = [t.strftime("%Y-%m-%d %H:%M:%S.") + f"{t.microsecond:06d}" for t in _TS]


def _arrow_events(unit: str) -> pa.Table:
    n = len(_TS)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([float(i) for i in range(n)], pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


def _write_layout(tmp_path_factory, layout: str) -> str:
    """Write {dir}/events.parquet in the requested physical layout and
    return the directory (shaped like an sf_dir)."""
    d = tmp_path_factory.mktemp(f"events_{layout}")
    path = str(d / "events.parquet")
    if layout == "micros_ntz":
        # pandas/pyarrow default: TIMESTAMP(MICROS, isAdjustedToUTC=false)
        pq.write_table(_arrow_events("us"), path)
    elif layout == "nanos":
        # parquet 2.6 TIMESTAMP(NANOS) — needs nanosAsLong on the Spark side
        pq.write_table(_arrow_events("ns"), path, version="2.6", coerce_timestamps=None)
    elif layout == "micros_utc":
        # instant semantics: TIMESTAMP(MICROS, isAdjustedToUTC=true) —
        # Spark reads session-tz TIMESTAMP directly (UTC session => same
        # wall clock); normalize_ts must pass it through untouched
        t = _arrow_events("us")
        i = t.schema.get_field_index("ts")
        t = t.set_column(
            i, "ts", t.column("ts").cast(pa.timestamp("us", tz="UTC"))
        )
        pq.write_table(t, path)
    else:  # pragma: no cover
        raise ValueError(layout)
    return str(d)


def _fmt(df):
    """Session-tz-rendered microsecond strings, ordered by event_id —
    timezone-ambiguity-free comparison."""
    return [
        r.s
        for r in df.select(
            "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")
        )
        .orderBy("event_id")
        .collect()
    ]


@pytest.mark.parametrize("layout", ["micros_ntz", "nanos", "micros_utc"])
def test_batch_reader_recovers_wall_clock(spark, tmp_path_factory, layout):
    d = _write_layout(tmp_path_factory, layout)
    df = load_table(spark, d, "events")
    # normalized to session-tz TIMESTAMP, never NTZ or raw long
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    assert _fmt(df) == _WANT


@pytest.mark.parametrize("layout", ["micros_ntz", "nanos", "micros_utc"])
def test_streaming_reader_matches_batch(spark, tmp_path_factory, layout):
    d = _write_layout(tmp_path_factory, layout)
    stream = read_events_stream(spark, d)
    assert stream.schema["ts"].dataType.simpleString() == "timestamp"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(f"ts_layout_{layout}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _fmt(spark.table(f"ts_layout_{layout}"))
    assert got == _WANT


def test_real_events_table_is_2024_era(spark, sf_dir):
    """Whatever layout the driver ships, the loaded table must be
    normalized TIMESTAMP with plausible (non-1970) years."""
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    years = df.select(F.year("ts").alias("y")).agg(
        F.min("y").alias("lo"), F.max("y").alias("hi")
    ).collect()[0]
    assert years.lo >= 2000, f"epoch-era timestamps leaked through: {years}"
