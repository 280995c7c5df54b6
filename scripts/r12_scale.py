"""Round-12 scale rehearsals — the SCALE.md rows for this round's four
measured claims, at sf100 (/tmp/sf100: 5M docs, 2M x 64-d embeddings)
and sf1000 (/tmp/sf1000: 50M docs, 20M x 64-d embeddings — the next
decade, gen_sf.py --scale 10000 --tables documents,embeddings).

Steps (one JSON line per measurement, with load stamps):

- ``build`` (sf100): coarse-quantizer training cost — exact full-corpus
  Lloyd vs train_sample="auto" (FAISS's 256/cell rule) at the same auto
  geometry (1414 cells), plus a 5-query serving-vs-join bit-parity spot
  on the sampled index. The round-11 wall was build 283 s vs 132.7 s
  for the whole 2M x 2M join — training must stop dominating.
- ``shuffle`` (sf100): the uniform 2M x 2M search_join under the
  round-12 probe shape (query vector through the cogroup instead of the
  m*k LUT): wall + MEASURED probe-side shuffle-write bytes from the
  Spark REST API (diffed across the join), vs the round-11 LUT rows
  (8326 B/probe-row declared -> ~528 B now).
- ``skew`` (sf100): 200k queries AT 4 cells' centroids — the batch the
  round-11 static salt served as one giant cogroup per hot cell — under
  (a) the data-dependent per-cell plan (default) and (b) the legacy
  uniform salt=1; walls + equal result counts.
- ``waves`` / ``ann`` / ``v04`` (sf1000): the round-11 rehearsal's three
  claims one decade up — wave ingest flat-to-declining, auto-cells
  (~4472) SAMPLED-build search_join per-query cost ~flat, v04-shape
  merges O(touched buckets).

Usage: python scripts/r12_scale.py [step...]
       steps: build shuffle skew waves ann v04   (default: the sf100
       three; sf1000 steps run only when named, against /tmp/sf1000)
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


def _stamp():
    return tuple(round(v, 2) for v in os.getloadavg())


def _emit(obj):
    print(json.dumps(obj), flush=True)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _shuffle_write_bytes(spark):
    """Total shuffle-write bytes across all completed stages, from the
    Spark UI REST API (the only place executor shuffle metrics are
    aggregated without event-log plumbing)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.loads(r.read())
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def run_build(spark):
    from kmeanwithmapreduce_spark.operators.ann_index import (
        auto_n_cells,
        build_ann_index,
    )

    e = _emb(spark, SF100)
    n = e.count()
    cells = auto_n_cells(n)
    walls = {}
    for tag, kw in (("exact", {}), ("sampled", {"train_sample": "auto"})):
        base = f"/tmp/r12_ann_{tag}"
        shutil.rmtree(base, ignore_errors=True)
        t0 = time.monotonic()
        idx = build_ann_index(e, base, n_cells="auto", **kw)
        walls[tag] = round(time.monotonic() - t0, 1)
        _emit({
            "step": f"build_{tag}", "n_vectors": n, "n_cells": cells,
            "train_sample": idx.train_sample, "wall_sec": walls[tag],
            "load": _stamp(),
        })
    # parity spot on the sampled index: serving == distributed, 5 queries
    from kmeanwithmapreduce_spark.operators.ann_index import AnnIndex

    idx = AnnIndex.load(spark, "/tmp/r12_ann_sampled")
    q = e.where(F.col("vec_id") < 5)
    sv = sorted(map(tuple, idx.search(q, n_probe=2, top_k=10).collect()))
    sj = sorted(map(tuple, idx.search_join(q, n_probe=2, top_k=10).collect()))
    _emit({
        "step": "build_parity", "bit_equal": sv == sj, "rows": len(sj),
        "speedup": round(walls["exact"] / walls["sampled"], 2),
        "load": _stamp(),
    })


def run_shuffle(spark):
    from kmeanwithmapreduce_spark.operators.ann_index import AnnIndex

    idx = AnnIndex.load(spark, "/tmp/r12_ann_sampled")
    e = _emb(spark, SF100)
    n = e.count()
    for tag in ("cold", "warm"):
        b0 = _shuffle_write_bytes(spark)
        t0 = time.monotonic()
        idx.search_join(e, n_probe=2, top_k=10).write.format("noop").mode(
            "overwrite"
        ).save()
        _emit({
            "step": f"join_{tag}", "n_queries": n,
            "wall_sec": round(time.monotonic() - t0, 1),
            "shuffle_write_mb": round(
                (_shuffle_write_bytes(spark) - b0) / 1e6, 1
            ),
            "load": _stamp(),
        })


def run_skew(spark):
    from kmeanwithmapreduce_spark.operators.ann_index import AnnIndex

    idx = AnnIndex.load(spark, "/tmp/r12_ann_sampled")
    hot = [idx.centroids[c] for c in (0, 350, 700, 1050)]
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
            "step": f"skew_{tag}", "n_queries": n_q, "rows": counts[tag],
            "wall_sec": round(time.monotonic() - t0, 1), "load": _stamp(),
        })
    _emit({"step": "skew_done", "rows_equal": counts["plan"] == counts["salt1"],
           "load": _stamp()})


def run_waves(spark):
    from kmeanwithmapreduce_spark.operators.corpus_incremental import (
        ingest_corpus_wave,
    )

    docs = spark.read.parquet(f"{SF1000}/documents.parquet")
    n = docs.count()
    corpus = "/tmp/r12_sf1000_corpus"
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


def run_ann_sf1000(spark):
    from kmeanwithmapreduce_spark.operators.ann_index import (
        auto_n_cells,
        build_ann_index,
    )

    e = _emb(spark, SF1000)
    n = e.count()
    base = "/tmp/r12_sf1000_ann"
    shutil.rmtree(base, ignore_errors=True)
    t0 = time.monotonic()
    idx = build_ann_index(e, base, n_cells="auto", train_sample="auto")
    _emit({
        "step": "sf1000_ann_build", "n_vectors": n,
        "n_cells": auto_n_cells(n), "train_sample": idx.train_sample,
        "wall_sec": round(time.monotonic() - t0, 1), "load": _stamp(),
    })
    # per-query economics at the full 20M-vector index geometry, from a
    # 2M-query slice (~sf100's batch size): candidate volume per query
    # is what the decade changes (n_probe * n / sqrt(n)); the full self-
    # join wall is 10x this row by linearity in queries
    queries = e.where(F.col("vec_id") % 10 == 0)
    n_q = queries.count()
    for tag in ("cold", "warm"):
        t0 = time.monotonic()
        idx.search_join(queries, n_probe=2, top_k=10).write.format(
            "noop"
        ).mode("overwrite").save()
        _emit({
            "step": f"sf1000_ann_join_{tag}", "n_queries": n_q,
            "wall_sec": round(time.monotonic() - t0, 1), "load": _stamp(),
        })


def run_v04_sf1000(spark):
    from kmeanwithmapreduce_spark.sources.table import (
        create_bucketed_table,
        read_bucketed_table,
        rebucket_table,
        upsert_table,
    )

    docs = spark.read.parquet(f"{SF1000}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n = docs.count()
    base = "/tmp/r12_sf1000_tbl"
    shutil.rmtree(base, ignore_errors=True)

    def timed(tag, fn):
        t0 = time.monotonic()
        out = fn()
        _emit({"step": tag, "wall_sec": round(time.monotonic() - t0, 1),
               "load": _stamp()})
        return out

    timed("sf1000_create_64", lambda: create_bucketed_table(
        docs, base, "doc_id", n_buckets=64
    ))
    slice1 = docs.where(F.col("doc_id") % 1000 == 0).withColumn(
        "lang", F.lit("xx")
    )
    timed("sf1000_merge_0.1pct", lambda: upsert_table(slice1, base))
    # the round-12 evolution shape at 50M rows: one added column rides
    # a 0.1% MERGE, reads NULL-fill everything untouched
    slice2 = docs.where(F.col("doc_id") % 1000 == 1).withColumn(
        "lang", F.lit("yy")
    ).withColumn("quality", (F.col("doc_id") % 100) / F.lit(10.0))
    timed("sf1000_merge_add_column_0.1pct", lambda: upsert_table(
        slice2, base, allow_add_columns=True
    ))
    got = timed("sf1000_read_current",
                lambda: read_bucketed_table(spark, base).count())
    _emit({"step": "sf1000_v04_done", "n_docs": n, "rows_current": got,
           "load": _stamp()})


def main() -> int:
    steps = [a for a in sys.argv[1:]] or ["build", "shuffle", "skew"]
    spark = get_spark(
        "r12_scale", shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    _emit({"step": "start", "steps": steps, "load": _stamp()})
    if "build" in steps:
        run_build(spark)
    if "shuffle" in steps:
        run_shuffle(spark)
    if "skew" in steps:
        run_skew(spark)
    if "waves" in steps:
        run_waves(spark)
    if "ann" in steps:
        run_ann_sf1000(spark)
    if "v04" in steps:
        run_v04_sf1000(spark)
    _emit({"step": "end", "load": _stamp()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
