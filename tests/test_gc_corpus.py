"""Unified corpus GC (operators/gc.py): one keep policy across every
epoch-keeped layout in a corpus tree; reads and resumed ingest survive."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators.corpus_incremental import (
    ingest_corpus_wave,
    read_corpus,
)
from kmeanwithmapreduce_spark.operators.gc import gc_corpus
from kmeanwithmapreduce_spark.sources.table import (
    create_bucketed_table,
    read_bucketed_table,
    read_table,
    table_epochs,
    upsert_table,
    write_snapshot,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _doc(doc_id, text):
    return (doc_id, text, "en", "web", len(text))


def _wave(i):
    return [
        _doc(100 * i + j, " ".join(f"w{i}x{j}x{k}" for k in range(25)))
        for j in range(3)
    ]


@pytest.mark.exhaustive  # twins: test_gc_corpus_applies_to_mart_state + the per-layout gc tests in test_table.py/test_table_bucketed.py
def test_gc_corpus_one_policy_across_layouts(spark, tmp_path):
    root = str(tmp_path / "corpus")
    spark_rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731

    # 1) incremental corpus waves (3 waves -> 3 remap snapshots)
    waves_dir = os.path.join(root, "waves")
    for i in range(3):
        ingest_corpus_wave(
            spark, spark.createDataFrame(_wave(i), DOC_SCHEMA), waves_dir, i
        )
    corpus_before = spark_rows(read_corpus(spark, waves_dir))

    # 2) snapshot versioned table, 4 epochs
    snap_dir = os.path.join(root, "dim_table")
    for n in range(4):
        write_snapshot(
            spark.range(5).select("id", (F.col("id") * n).alias("v")), snap_dir
        )
    snap_latest = spark_rows(read_table(spark, snap_dir))

    # 3) bucketed upsert table, 4 epochs
    btbl_dir = os.path.join(root, "fact_table")
    create_bucketed_table(
        spark.createDataFrame([(i, f"v{i}") for i in range(20)], "k bigint, v string"),
        btbl_dir,
        "k",
        n_buckets=4,
    )
    for n in range(3):
        upsert_table(
            spark.createDataFrame([(n, f"u{n}")], "k bigint, v string"), btbl_dir
        )
    bt_latest = spark_rows(read_bucketed_table(spark, btbl_dir))
    bt_prev = spark_rows(read_bucketed_table(spark, btbl_dir, as_of=2))

    deleted = gc_corpus(spark, root, keep=2)
    assert "waves:corpus_waves" in deleted  # remap snapshot 0 pruned
    assert "dim_table:snapshot_table" in deleted
    assert "fact_table:bucketed_table" in deleted
    assert not glob.glob(os.path.join(waves_dir, "remap", "wave=0"))
    assert glob.glob(os.path.join(waves_dir, "remap", "wave=2"))

    # every read the contracts promise still serves exactly
    assert spark_rows(read_corpus(spark, waves_dir)) == corpus_before
    assert spark_rows(read_table(spark, snap_dir)) == snap_latest
    assert table_epochs(spark, snap_dir) == [2, 3]
    assert spark_rows(read_bucketed_table(spark, btbl_dir)) == bt_latest
    assert spark_rows(read_bucketed_table(spark, btbl_dir, as_of=2)) == bt_prev

    # sub-window reads are refused with the real (GC) cause
    with pytest.raises(ValueError, match="garbage-collected"):
        read_table(spark, snap_dir, as_of=0)
    with pytest.raises(ValueError, match="floor|garbage-collected"):
        read_bucketed_table(spark, btbl_dir, as_of=0)

    # incremental ingest RESUMES cleanly after GC and the corpus grows
    ingest_corpus_wave(
        spark, spark.createDataFrame(_wave(3), DOC_SCHEMA), waves_dir, 3
    )
    after = spark_rows(read_corpus(spark, waves_dir))
    assert len(after) == len(corpus_before) + 3

    # idempotent: a second GC with the same policy deletes at most the
    # newly-superseded remap snapshot from the resumed wave
    again = gc_corpus(spark, root, keep=2)
    assert set(again) <= {"waves:corpus_waves"}


def test_gc_corpus_applies_to_mart_state(spark, tmp_path):
    """The streaming mart layout is recognized and pruned through
    gc_mart_state (superseded state buckets only)."""
    import time

    from kmeanwithmapreduce_spark.streaming.marts import (
        read_streaming_sessions,
        streaming_events_mart_ingest,
    )

    src = str(tmp_path / "src")
    rows = lambda ts0: [  # noqa: E731
        (1, 10 + ts0, "view", __import__("datetime").datetime(2024, 1, 1, 10, ts0)),
    ]
    spark.createDataFrame(rows(1), "user_id long, event_id long, event_type string, ts timestamp").coalesce(1).write.mode("overwrite").parquet(src)
    first = set(glob.glob(src + "/part-*.parquet"))
    spark.createDataFrame(rows(2), "user_id long, event_id long, event_type string, ts timestamp").coalesce(1).write.mode("append").parquet(src)
    second = set(glob.glob(src + "/part-*.parquet")) - first
    now = time.time()
    os.utime(first.pop(), (now - 60, now - 60))
    os.utime(second.pop(), (now, now))

    root = str(tmp_path / "corpus")
    mart = os.path.join(root, "mart")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_events_mart_ingest(
        stream, mart, str(tmp_path / "ck"), n_state_buckets=2
    )
    q.awaitTermination(120)
    before = sorted(map(tuple, read_streaming_sessions(spark, mart).collect()))
    deleted = gc_corpus(spark, root, keep=1)
    assert "mart:mart_state" in deleted
    got = sorted(map(tuple, read_streaming_sessions(spark, mart).collect()))
    assert got == before
