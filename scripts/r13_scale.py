"""Round-13 scale rehearsals — the round-12 verdict's queue items 1, 5
and 7, run SOLO (one Spark job on the box at a time; the round-12 disk
incident was three concurrent jobs' shuffle scratch).

Steps (one JSON line per measurement, with load stamps):

- ``profile`` (sf100, /tmp/sf100: 2M x 64-d): the ANN encode pass
  split. Builds a sampled index, then times component passes over the
  full corpus — scan-only, scan+coarse-assign (the Arrow kernel),
  scan+assign+PQ-codes (the _encode projection), and the full
  encode+parquet-write — so the deltas attribute the sf1000 build's
  ~1600 s to assign vs codes vs write (verdict item 5: decide whether
  fusing assign+codes into one mapInPandas pass can pay).
- ``ann`` (sf1000, /tmp/sf1000: 20M x 64-d): sampled build at auto
  cells (4472), then the FULL 20M-query self-join measured for real —
  round 12 extrapolated it "by linearity" from a 2M slice, and the
  last two rounds' real bugs were only found by running the real
  thing. Emits wall + REST-measured shuffle-write bytes.
- ``skew`` (sf1000): the 200k-hot-cell-queries batch (4 cells'
  centroids) against the 20M index — the per-cell (qs,cs) plan vs the
  legacy uniform salt, walls + identical row counts (verdict item 7:
  the caps must hold when cell population is ~4.5k vectors).
- ``waves`` (sf1000): the three 16.7M-doc ingest waves, re-run solo
  (wave 2 died on the round-12 shared-box disk incident; the
  flat-to-declining claim needs all three measured).

Usage: python scripts/r13_scale.py [profile|ann|skew|waves ...]
       (default: profile)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kmeanwithmapreduce_spark.session import get_spark  # noqa: E402

SF100 = "/tmp/sf100"
SF1000 = "/tmp/sf1000"
ANN1000 = "/tmp/r13_sf1000_ann"


def _stamp():
    return tuple(round(v, 2) for v in os.getloadavg())


def _emit(obj):
    print(json.dumps(obj), flush=True)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _shuffle_write_bytes(spark):
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.loads(r.read())
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_profile(spark):
    from kmeanwithmapreduce_spark.kmeans import core
    from kmeanwithmapreduce_spark.operators.ann_index import build_ann_index
    from kmeanwithmapreduce_spark.operators.pq import pq_encode

    e = _emb(spark, SF100)
    n = e.count()
    base = "/tmp/r13_ann_sf100"
    shutil.rmtree(base, ignore_errors=True)
    t0 = time.monotonic()
    idx = build_ann_index(e, base, n_cells="auto", train_sample="auto")
    build_wall = round(time.monotonic() - t0, 1)
    _emit({"step": "profile_build", "n_vectors": n, "wall_sec": build_wall,
           "load": _stamp()})

    feats = e.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("features")
    )

    def timed(tag, fn):
        t0 = time.monotonic()
        fn()
        _emit({"step": tag, "wall_sec": round(time.monotonic() - t0, 1),
               "load": _stamp()})

    # component passes over the full corpus (each repeated twice; the
    # second is the page-cache-warm number that isolates compute)
    for r in ("cold", "warm"):
        timed(f"profile_scan_{r}", lambda: _noop(feats))
        timed(
            f"profile_assign_{r}",
            lambda: _noop(core.assign(feats, idx.centroids)),
        )
        timed(
            f"profile_assign_codes_{r}",
            lambda: _noop(idx._encode(e)),
        )
    # codes WITHOUT assign (PQ expressions over the scan, no Arrow hop)
    for r in ("cold", "warm"):
        timed(
            f"profile_codes_only_{r}",
            lambda: _noop(
                pq_encode(
                    feats.withColumn("cluster", F.lit(0)),
                    idx.codebooks,
                    vec_col="features",
                    residual_centroids=None,
                )
            ),
        )
    # the real thing: encode + parquet write
    out = "/tmp/r13_ann_sf100_codes"
    shutil.rmtree(out, ignore_errors=True)
    timed(
        "profile_encode_write",
        lambda: idx._encode(e).write.mode("overwrite").parquet(out),
    )
    shutil.rmtree(out, ignore_errors=True)


def run_ann(spark):
    from kmeanwithmapreduce_spark.operators.ann_index import (
        AnnIndex,
        auto_n_cells,
        build_ann_index,
    )

    e = _emb(spark, SF1000)
    n = e.count()
    if os.path.exists(os.path.join(ANN1000, "_ann_meta.json")):
        idx = AnnIndex.load(spark, ANN1000)
        _emit({"step": "sf1000_ann_build", "reused": True, "load": _stamp()})
    else:
        shutil.rmtree(ANN1000, ignore_errors=True)
        t0 = time.monotonic()
        idx = build_ann_index(e, ANN1000, n_cells="auto", train_sample="auto")
        _emit({
            "step": "sf1000_ann_build", "n_vectors": n,
            "n_cells": auto_n_cells(n), "train_sample": idx.train_sample,
            "wall_sec": round(time.monotonic() - t0, 1), "load": _stamp(),
        })
    # the FULL self-join: every one of the 20M vectors is a query
    b0 = _shuffle_write_bytes(spark)
    t0 = time.monotonic()
    _noop(idx.search_join(e, n_probe=2, top_k=10))
    _emit({
        "step": "sf1000_ann_join_full", "n_queries": n,
        "wall_sec": round(time.monotonic() - t0, 1),
        "shuffle_write_gb": round(
            (_shuffle_write_bytes(spark) - b0) / 1e9, 2
        ),
        "load": _stamp(),
    })


def run_skew(spark):
    from kmeanwithmapreduce_spark.operators.ann_index import AnnIndex

    idx = AnnIndex.load(spark, ANN1000)
    hot = [idx.centroids[c] for c in (0, 1100, 2200, 3300)]
    n_q = 200_000
    queries = spark.range(n_q).select(
        F.col("id").alias("query_id"),
        F.element_at(
            F.array(*[
                F.array(*[F.lit(float(v)) for v in c]).cast("array<float>")
                for c in hot
            ]),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("embedding"),
    )
    counts = {}
    for tag, kw in (("plan", {}), ("salt1", {"salt": 1})):
        t0 = time.monotonic()
        counts[tag] = idx.search_join(
            queries, n_probe=2, top_k=10, **kw
        ).count()
        _emit({
            "step": f"sf1000_skew_{tag}", "n_queries": n_q,
            "rows": counts[tag],
            "wall_sec": round(time.monotonic() - t0, 1), "load": _stamp(),
        })
    _emit({"step": "sf1000_skew_done",
           "rows_equal": counts["plan"] == counts["salt1"], "load": _stamp()})


def run_waves(spark):
    from kmeanwithmapreduce_spark.operators.corpus_incremental import (
        ingest_corpus_wave,
    )

    docs = spark.read.parquet(f"{SF1000}/documents.parquet")
    n = docs.count()
    corpus = "/tmp/r13_sf1000_corpus"
    shutil.rmtree(corpus, ignore_errors=True)
    cut1, cut2 = n // 3, 2 * n // 3
    slices = [
        docs.where(F.col("doc_id") < cut1),
        docs.where((F.col("doc_id") >= cut1) & (F.col("doc_id") < cut2)),
        docs.where(F.col("doc_id") >= cut2),
    ]
    for i, sl in enumerate(slices):
        t0 = time.monotonic()
        stats = ingest_corpus_wave(
            spark, sl, corpus, quality_threshold=0.5, lang_rates={"en": 0.5}
        )
        _emit({
            "step": "wave", "wave": i, "n_docs_wave": n // 3,
            "wall_sec": round(time.monotonic() - t0, 1), "funnel": stats,
            "load": _stamp(),
        })
    shutil.rmtree(corpus, ignore_errors=True)


def main() -> int:
    steps = [a for a in sys.argv[1:]] or ["profile"]
    spark = get_spark(
        "r13_scale", shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    _emit({"step": "start", "steps": steps, "load": _stamp()})
    if "profile" in steps:
        run_profile(spark)
    if "ann" in steps:
        run_ann(spark)
    if "skew" in steps:
        run_skew(spark)
    if "waves" in steps:
        run_waves(spark)
    _emit({"step": "end", "load": _stamp()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
