"""Streaming ANN ingest (streaming/ingest.py::streaming_ann_ingest):
micro-batches appended to a persisted AnnIndex must equal a one-shot
build+add bit-for-bit (codes AND search results), with exactly-once
commits through the claim+ledger protocol — replay no-ops, crash-window
recovery, fresh-checkpoint refusal, and the manual-mutation guard."""

from __future__ import annotations

import glob
import json
import os
import time

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators.ann_index import AnnIndex, build_ann_index
from kmeanwithmapreduce_spark.sources.readers import load_table
from kmeanwithmapreduce_spark.streaming.ingest import (
    ann_ingest_batch,
    read_ann_ingest_log,
    streaming_ann_ingest,
)


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _split_vectors(spark, sf_dir, src):
    """Base corpus (vec_id >= 40) for the build, plus two single-file
    micro-batches of adds with pinned mtimes (the marts harness)."""
    e = _emb(spark, sf_dir)
    base = e.where(F.col("vec_id") >= 40)
    b1 = e.where((F.col("vec_id") >= 5) & (F.col("vec_id") < 20))
    b2 = e.where((F.col("vec_id") >= 20) & (F.col("vec_id") < 40))
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    first = set(glob.glob(src + "/part-*.parquet"))
    b2.coalesce(1).write.mode("append").parquet(src)
    second = set(glob.glob(src + "/part-*.parquet")) - first
    assert len(first) == 1 and len(second) == 1
    now = time.time()
    os.utime(first.pop(), (now - 60, now - 60))
    os.utime(second.pop(), (now, now))
    return base, b1, b2, e.where(F.col("vec_id") < 5)


def _stream(spark, src):
    return (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_stream_equals_one_shot_build_and_add(spark, sf_dir, tmp_path):
    """2-micro-batch stream == build + one add_batch over the union:
    codes rows AND search results bit-equal, on both search paths."""
    src = str(tmp_path / "src")
    base, b1, b2, queries = _split_vectors(spark, sf_dir, src)

    p_stream = str(tmp_path / "idx_stream")
    p_shot = str(tmp_path / "idx_shot")
    idx_s = build_ann_index(base, p_stream, n_cells=8)
    idx_o = build_ann_index(base, p_shot, n_cells=8)

    q = streaming_ann_ingest(
        _stream(spark, src), p_stream, str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    idx_o.add_batch(b1.unionByName(b2))

    log = {
        (r.stream_epoch, r.codes_epoch)
        for r in read_ann_ingest_log(spark, p_stream).collect()
    }
    assert log == {(0, 1), (1, 2)}
    assert _rows(idx_s.codes()) == _rows(idx_o.codes())
    got = _rows(idx_s.search(queries, n_probe=2, top_k=10))
    want = _rows(idx_o.search(queries, n_probe=2, top_k=10))
    assert got == want and len(got) == 50
    got_j = _rows(idx_s.search_join(queries, n_probe=2, top_k=10))
    assert got_j == want
    # the claim never outlives a committed epoch
    assert not os.path.exists(os.path.join(p_stream, "_ingest_claim.json"))


def test_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """Re-running over the same source + checkpoint adds nothing; a new
    source file lands as exactly one new epoch."""
    src = str(tmp_path / "src")
    base, b1, b2, _q = _split_vectors(spark, sf_dir, src)
    p = str(tmp_path / "idx")
    idx = build_ann_index(base, p, n_cells=8)
    ck = str(tmp_path / "ck")

    streaming_ann_ingest(_stream(spark, src), p, ck).awaitTermination(120)
    before = _rows(idx.codes())
    streaming_ann_ingest(_stream(spark, src), p, ck).awaitTermination(120)
    assert _rows(idx.codes()) == before

    e = _emb(spark, sf_dir)
    b3 = e.where(F.col("vec_id") < 5)
    b3.coalesce(1).write.mode("append").parquet(src)
    streaming_ann_ingest(_stream(spark, src), p, ck).awaitTermination(120)
    got = {r["vec_id"] for r in idx.codes().select("vec_id").collect()}
    assert {0, 1, 2, 3, 4} <= got
    assert idx.codes().count() == len(before) + b3.count()


@pytest.mark.exhaustive  # twin: test_stream_marts.py::test_streaming_mart_foreign_checkpoint_refused — same ident-marker refusal mechanism
def test_fresh_checkpoint_is_refused(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    base, *_ = _split_vectors(spark, sf_dir, src)
    p = str(tmp_path / "idx")
    build_ann_index(base, p, n_cells=8)
    streaming_ann_ingest(
        _stream(spark, src), p, str(tmp_path / "ck1")
    ).awaitTermination(120)
    with pytest.raises(ValueError, match="checkpoint"):
        streaming_ann_ingest(_stream(spark, src), p, str(tmp_path / "ck2"))


def test_replay_of_committed_epoch_is_a_noop(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    base, b1, _b2, _q = _split_vectors(spark, sf_dir, src)
    p = str(tmp_path / "idx")
    idx = build_ann_index(base, p, n_cells=8)
    assert ann_ingest_batch(b1, 0, p) == 1
    before = _rows(idx.codes())
    assert ann_ingest_batch(b1, 0, p) is None  # replay: committed no-op
    assert _rows(idx.codes()) == before
    assert read_ann_ingest_log(spark, p).count() == 1


def test_crash_windows_recover(spark, sf_dir, tmp_path):
    """Each claim-protocol crash window replays to the same committed
    state as the crash-free run."""
    src = str(tmp_path / "src")
    base, b1, b2, _q = _split_vectors(spark, sf_dir, src)
    p = str(tmp_path / "idx")
    idx = build_ann_index(base, p, n_cells=8)
    claim_path = os.path.join(p, "_ingest_claim.json")

    # window 1: claim put, codes never written -> replay completes
    with open(claim_path, "w") as fh:
        json.dump({"stream_epoch": 0, "codes_epoch": 1}, fh)
    assert ann_ingest_batch(b1, 0, p) == 1
    assert not os.path.exists(claim_path)
    want_after_b1 = _rows(idx.codes())

    # window 2: codes committed, ledger missing -> replay writes only
    # the ledger (no re-encode, no spurious duplicate-id failure)
    with open(claim_path, "w") as fh:
        json.dump({"stream_epoch": 1, "codes_epoch": 2}, fh)
    idx._encode(b2).write.mode("overwrite").parquet(
        os.path.join(p, "codes", "epoch=2")
    )
    assert ann_ingest_batch(b2, 1, p) == 2
    assert not os.path.exists(claim_path)

    # window 3: ledger committed, claim not dropped (consumed claim) ->
    # the NEXT epoch sweeps it and proceeds
    with open(claim_path, "w") as fh:
        json.dump({"stream_epoch": 1, "codes_epoch": 2}, fh)
    e = _emb(spark, sf_dir)
    b3 = e.where(F.col("vec_id") < 5)
    assert ann_ingest_batch(b3, 2, p) == 3
    assert not os.path.exists(claim_path)

    # the final state equals the crash-free one-shot union
    p2 = str(tmp_path / "idx2")
    idx2 = build_ann_index(base, p2, n_cells=8)
    idx2.add_batch(b1.unionByName(b2).unionByName(b3))
    assert _rows(idx.codes()) == _rows(idx2.codes())
    assert len(want_after_b1) < len(_rows(idx.codes()))


def test_pending_claim_blocks_manual_mutations(spark, sf_dir, tmp_path):
    """add_batch/delete_ids/compact_codes must refuse while a stream
    epoch is mid-commit (its codes slot would collide); a CONSUMED
    claim (ledger committed) is swept instead of blocking."""
    src = str(tmp_path / "src")
    base, b1, b2, _q = _split_vectors(spark, sf_dir, src)
    p = str(tmp_path / "idx")
    idx = build_ann_index(base, p, n_cells=8)
    assert ann_ingest_batch(b1, 0, p) == 1
    claim_path = os.path.join(p, "_ingest_claim.json")
    with open(claim_path, "w") as fh:
        json.dump({"stream_epoch": 1, "codes_epoch": 2}, fh)
    with pytest.raises(ValueError, match="pending streaming ingest"):
        idx.add_batch(b2)
    with pytest.raises(ValueError, match="pending streaming ingest"):
        idx.delete_ids(b1.select("vec_id").limit(1))
    with pytest.raises(ValueError, match="pending streaming ingest"):
        idx.compact_codes()
    # consumed claim (its ledger committed) is swept, mutation proceeds
    with open(claim_path, "w") as fh:
        json.dump({"stream_epoch": 0, "codes_epoch": 1}, fh)
    assert idx.add_batch(b2) == 2
    assert not os.path.exists(claim_path)


def test_ingested_index_compacts_and_searches(spark, sf_dir, tmp_path):
    """After streaming ingest, the normal lifecycle (delete, compact)
    still holds and search results are pinned across the fold."""
    src = str(tmp_path / "src")
    base, b1, b2, queries = _split_vectors(spark, sf_dir, src)
    p = str(tmp_path / "idx")
    idx = build_ann_index(base, p, n_cells=8)
    streaming_ann_ingest(
        _stream(spark, src), p, str(tmp_path / "ck")
    ).awaitTermination(120)
    idx.delete_ids(b1.select("vec_id").limit(3))
    before = _rows(idx.search(queries, n_probe=2, top_k=10))
    idx.compact_codes()
    assert _rows(idx.search(queries, n_probe=2, top_k=10)) == before
