"""Incremental near-dup ingestion (operators/dedup.py): new batches
join against the stored MinHash band index instead of rescanning the
corpus. The exactness contract: incremental pairs == the batch d03
pairs touching a new document, and a stream of batches accumulates to
exactly the full-corpus result (associativity of the band index)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators.dedup import (
    d03_minhash_lsh_pairs,
    incremental_neardup_pairs,
    minhash_bands,
)
from kmeanwithmapreduce_spark.sources.readers import load_table


def _pairs(df):
    return sorted((r.doc_a, r.doc_b) for r in df.collect())


def _empty_index(spark):
    return spark.createDataFrame([], "doc_id bigint, band int, key string")


def test_incremental_neardup_matches_batch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 3 != 0)
    new = docs.where(F.col("doc_id") % 3 == 0)
    incr = _pairs(incremental_neardup_pairs(new, minhash_bands(old)))
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    full = _pairs(d03_minhash_lsh_pairs(spark, sf_dir))
    expected = [p for p in full if p[0] in new_ids or p[1] in new_ids]
    assert incr == expected
    assert len(incr) > 0  # the corpus has dups spanning the split


def test_incremental_ingest_stream_accumulates_to_full(spark, sf_dir):
    """Three successive ingest waves; after each, the new bands append
    to the index. The union of per-wave pair sets must equal the
    full-corpus d03 result exactly."""
    docs = load_table(spark, sf_dir, "documents")
    waves = [docs.where(F.col("doc_id") % 3 == k) for k in range(3)]
    idx = _empty_index(spark)
    seen: set = set()
    for w in waves:
        seen.update(_pairs(incremental_neardup_pairs(w, idx)))
        idx = idx.union(minhash_bands(w))
    assert sorted(seen) == _pairs(d03_minhash_lsh_pairs(spark, sf_dir))


def test_streaming_neardup_ingest_accumulates_to_full(spark, sf_dir, tmp_path):
    """The streaming composition: documents arrive as two files in two
    micro-batches (availableNow + maxFilesPerTrigger=1); per batch the
    ingest joins the persisted band index, emits that batch's pairs to
    an epoch subdir, and appends its bands. Accumulated pairs must equal
    the full batch d03 result."""
    from kmeanwithmapreduce_spark.streaming.ingest import (
        read_accumulated_pairs,
        read_band_index,
        streaming_neardup_ingest,
    )

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_neardup_ingest(
        stream,
        index_path=str(tmp_path / "index"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()

    got = _pairs(read_accumulated_pairs(spark, str(tmp_path / "pairs")))
    assert got == _pairs(d03_minhash_lsh_pairs(spark, sf_dir))
    # the persisted index now covers the whole corpus
    idx = read_band_index(spark, str(tmp_path / "index"))
    assert idx.select("doc_id").distinct().count() == docs.count()


def test_incremental_empty_index_is_intra_batch_d03(spark, sf_dir):
    """Against an empty index the incremental path reduces to plain d03
    over the batch alone."""
    docs = load_table(spark, sf_dir, "documents")
    got = _pairs(incremental_neardup_pairs(docs, _empty_index(spark)))
    assert got == _pairs(d03_minhash_lsh_pairs(spark, sf_dir))
