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


def test_decode_vectorized_matches_scalar_spec(spark, sf_dir):
    """The batch-vectorized decode must equal the scalar _fake_decode
    spec element-wise, including multi-byte utf-8 and empty payloads."""
    texts = ["héllo wörld", "日本語のテキスト", "", "a" * 300, "naïve—café"]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bytes"], r["width"], r["height"], r["channels"], r["mean_intensity"])
        for r in mm.decode_batch(mm.with_binary_payload(d)).collect()
    }
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        w, h, c, mi = mm._fake_decode(b)
        assert got[i] == (len(b), w, h, c, mi)


def test_m02_oracle_holds_for_non_ascii(spark, tmp_path):
    """ADVICE r2: the old oracle summed code points of the first 256
    CHARACTERS; the byte-based oracle must match the stub on multi-byte
    utf-8 corpora too."""
    import duckdb

    texts = ["héllo wörld", "日本語のテキスト" * 40, "", "ascii only", "naïve—café é" * 30]
    d = spark.createDataFrame(
        [(i, t, "src") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    fx = str(tmp_path / "documents.parquet")
    d.write.parquet(fx)
    got = mm.m02_decoded_features(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{fx}/*.parquet'")
    want = con.execute(mm.M02_SQL).fetchdf()
    con.close()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    for col in ("n_bytes", "width", "height", "channels", "intensity_t"):
        assert list(got[col]) == list(want[col]), col


def test_m03_pipeline(spark, sf_dir):
    out = mm.m03_cluster_decoded(spark, sf_dir)
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == load_table(
        spark, sf_dir, "documents"
    ).count()
