"""Streaming corpus ingest (streaming/corpus_stream.py): micro-batches
== waves, stream result == manual wave calls == batch-over-union,
restart exactly-once, foreign checkpoint refused."""

from __future__ import annotations

import glob
import os
import time

import pytest

from kmeanwithmapreduce_spark.operators.corpus_incremental import (
    corpus_waves_manifest,
    ingest_corpus_wave,
    read_corpus,
)
from kmeanwithmapreduce_spark.streaming.corpus_stream import (
    streaming_corpus_ingest,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _doc(doc_id, text):
    return (doc_id, text, "en", "web", len(text))


def _wave_rows(i):
    return [
        _doc(100 * i + j, " ".join(f"s{i}w{j}t{k}" for k in range(25)))
        for j in range(4)
    ]


def _two_file_source(spark, tmp_path):
    """Two single-file micro-batches with pinned mtime order."""
    src = str(tmp_path / "src")
    spark.createDataFrame(_wave_rows(0), DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    first = set(glob.glob(src + "/part-*.parquet"))
    spark.createDataFrame(_wave_rows(1), DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    second = set(glob.glob(src + "/part-*.parquet")) - first
    now = time.time()
    os.utime(first.pop(), (now - 60, now - 60))
    os.utime(second.pop(), (now, now))
    return src


def _stream(spark, src):
    return (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_stream_equals_manual_waves(spark, tmp_path):
    src = _two_file_source(spark, tmp_path)
    corpus = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")
    q = streaming_corpus_ingest(_stream(spark, src), corpus, ck)
    assert q.awaitTermination(120)
    m = corpus_waves_manifest(spark, corpus)
    assert [w["wave"] for w in m["waves"]] == [0, 1]
    got = _rows(read_corpus(spark, corpus))

    # manual wave calls over the same batches give the identical corpus
    manual = str(tmp_path / "manual")
    for i in range(2):
        ingest_corpus_wave(
            spark, spark.createDataFrame(_wave_rows(i), DOC_SCHEMA), manual, i
        )
    assert got == _rows(read_corpus(spark, manual)) and len(got) > 0


def test_stream_restart_is_exactly_once(spark, tmp_path):
    src = _two_file_source(spark, tmp_path)
    corpus = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")
    for _ in range(2):  # second run replays from the same checkpoint
        q = streaming_corpus_ingest(_stream(spark, src), corpus, ck)
        assert q.awaitTermination(120)
    m = corpus_waves_manifest(spark, corpus)
    assert [w["wave"] for w in m["waves"]] == [0, 1]
    assert len(_rows(read_corpus(spark, corpus))) == sum(
        w["n_kept"] for w in m["waves"]
    )


@pytest.mark.exhaustive  # twin: test_stream_marts.py::test_streaming_mart_foreign_checkpoint_refused — same _stream_ident guard (streaming/marts.py), this surface only wraps it
def test_foreign_checkpoint_refused(spark, tmp_path):
    src = _two_file_source(spark, tmp_path)
    corpus = str(tmp_path / "corpus")
    q = streaming_corpus_ingest(_stream(spark, src), corpus, str(tmp_path / "ck1"))
    assert q.awaitTermination(120)
    with pytest.raises(ValueError, match="checkpoint"):
        streaming_corpus_ingest(
            _stream(spark, src), corpus, str(tmp_path / "ck2")
        )
