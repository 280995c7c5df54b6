"""Multimodal plumbing: payload attach, decode/resize/frame-sample
stubs (schema + batch-shape contracts), and the composed pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators import multimodal as mm
from kmeanwithmapreduce_spark.sources.readers import load_table


def test_payload_roundtrip(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    blobs = mm.with_binary_payload(d)
    row = blobs.select("text", "payload").first()
    assert bytes(row["payload"]).decode("utf-8") == row["text"]


def test_decode_schema_and_determinism(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    out = mm.decode_batch(mm.with_binary_payload(d))
    assert out.schema == mm.DECODED_SCHEMA
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b
    r = out.first()
    assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
    assert 0.0 <= r["mean_intensity"] <= 1.0


def test_resize_stub(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(10)
    out = mm.resize_batch(mm.with_binary_payload(d), 32, 16)
    rows = out.collect()
    assert all(len(bytes(r["payload"])) == 32 * 16 for r in rows)
    assert all(r["width"] == 32 and r["height"] == 16 for r in rows)


def test_frame_sample_stub(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(10)
    out = mm.frame_sample_batch(mm.with_binary_payload(d), every_n_bytes=100)
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 8 for r in per_doc)
    assert len(per_doc) == 10


def test_m03_pipeline(spark, sf_dir):
    out = mm.m03_cluster_decoded(spark, sf_dir)
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == load_table(
        spark, sf_dir, "documents"
    ).count()
