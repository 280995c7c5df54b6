"""sf100 rehearsal (round-11 task): one decade past SCALE.md's sf10
ceiling for the three flat-cost claims that matter at retrieval/corpus
deployment scale. Uses /tmp/sf100 (gen_sf.py --scale 1000 --tables
documents,embeddings: 5M docs, 2M x 64-d embeddings).

Measurements (one JSON line each, with load stamps):

1. corpus wave ingest — three equal doc_id-range waves (1.667M docs
   each) through ingest_corpus_wave with the round-8 protocol knobs
   (quality 0.5 + lang sample): per-wave wall must stay flat-to-
   declining as the corpus grows.
2. ANN search_join with n_cells="auto" (~sqrt(2M) = 1414 cells):
   build + full 2M-query self-join (n_probe=2, top_k=10, noop sink),
   cold + warm — per-query cost should hold ~flat vs sf1/sf10.
3. v04's merge-after-rebucket shape at 5M docs: bucketed create (16)
   -> 1%-slice MERGE -> rebucket 16 -> 64 -> ANOTHER 1%-slice MERGE
   after the boundary -> current read; the post-rebucket merge must
   stay O(touched buckets), not O(corpus).

Usage: python scripts/r11_sf100_rehearsal.py [sf_dir] [step...]
       (steps: waves ann v04; default all)
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


def _stamp():
    return tuple(round(v, 2) for v in os.getloadavg())


def _emit(obj):
    print(json.dumps(obj), flush=True)


def run_waves(spark, sf_dir):
    from kmeanwithmapreduce_spark.operators.corpus_incremental import (
        ingest_corpus_wave,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    corpus = "/tmp/r11_sf100_corpus"
    shutil.rmtree(corpus, ignore_errors=True)
    cut1, cut2 = n // 3, 2 * n // 3
    slices = [
        docs.where(F.col("doc_id") < cut1),
        docs.where((F.col("doc_id") >= cut1) & (F.col("doc_id") < cut2)),
        docs.where(F.col("doc_id") >= cut2),
    ]
    walls = []
    for i, sl in enumerate(slices):
        t0 = time.monotonic()
        stats = ingest_corpus_wave(
            spark, sl, corpus, quality_threshold=0.5,
            lang_rates={"en": 0.5},
        )
        walls.append(round(time.monotonic() - t0, 1))
        _emit({
            "step": "wave", "wave": i, "n_docs_wave": n // 3,
            "wall_sec": walls[-1], "funnel": stats, "load": _stamp(),
        })
    _emit({"step": "waves_done", "walls": walls, "load": _stamp()})


def run_ann(spark, sf_dir):
    from kmeanwithmapreduce_spark.operators.ann_index import (
        auto_n_cells,
        build_ann_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = e.count()
    base = "/tmp/r11_sf100_ann"
    shutil.rmtree(base, ignore_errors=True)
    t0 = time.monotonic()
    idx = build_ann_index(e, base, n_cells="auto")
    t_build = round(time.monotonic() - t0, 1)
    _emit({
        "step": "ann_build", "n_vectors": n,
        "n_cells": auto_n_cells(n), "wall_sec": t_build, "load": _stamp(),
    })
    for tag in ("cold", "warm"):
        t0 = time.monotonic()
        idx.search_join(e, n_probe=2, top_k=10).write.format("noop").mode(
            "overwrite"
        ).save()
        _emit({
            "step": f"ann_join_{tag}", "n_queries": n,
            "wall_sec": round(time.monotonic() - t0, 1),
            "load": _stamp(),
        })


def run_v04(spark, sf_dir):
    from kmeanwithmapreduce_spark.sources.table import (
        create_bucketed_table,
        read_bucketed_table,
        rebucket_table,
        upsert_table,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n = docs.count()
    base = "/tmp/r11_sf100_tbl"
    shutil.rmtree(base, ignore_errors=True)

    def timed(tag, fn):
        t0 = time.monotonic()
        out = fn()
        _emit({
            "step": tag, "wall_sec": round(time.monotonic() - t0, 1),
            "load": _stamp(),
        })
        return out

    timed("v04_create_16", lambda: create_bucketed_table(
        docs, base, "doc_id", n_buckets=16
    ))
    slice1 = docs.where(F.col("doc_id") % 100 == 0).withColumn(
        "lang", F.lit("xx")
    )
    timed("v04_merge_pre_rebucket_1pct", lambda: upsert_table(slice1, base))
    timed("v04_rebucket_16_to_64", lambda: rebucket_table(spark, base, 64))
    slice2 = docs.where(F.col("doc_id") % 100 == 1).withColumn(
        "lang", F.lit("yy")
    )
    timed("v04_merge_post_rebucket_1pct", lambda: upsert_table(slice2, base))
    got = timed(
        "v04_read_current",
        lambda: read_bucketed_table(spark, base).count(),
    )
    _emit({"step": "v04_done", "n_docs": n, "rows_current": got,
           "load": _stamp()})


def main() -> int:
    sf_dir = "/tmp/sf100"
    steps = []
    for a in sys.argv[1:]:
        if a in ("waves", "ann", "v04"):
            steps.append(a)
        else:
            sf_dir = a
    steps = steps or ["waves", "ann", "v04"]
    spark = get_spark("r11_sf100", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    _emit({"step": "start", "sf_dir": sf_dir, "load": _stamp()})
    if "waves" in steps:
        run_waves(spark, sf_dir)
    if "ann" in steps:
        run_ann(spark, sf_dir)
    if "v04" in steps:
        run_v04(spark, sf_dir)
    _emit({"step": "end", "load": _stamp()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
