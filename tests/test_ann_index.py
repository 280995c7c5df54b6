"""Persisted ANN index (operators/ann_index.py): save/load exactness,
incremental add == single-pass encode under frozen quantizers, and the
lifecycle contracts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators.ann_index import AnnIndex, build_ann_index
from kmeanwithmapreduce_spark.operators.pq import search_encoded
from kmeanwithmapreduce_spark.sources.readers import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("by_residual", [False, True])
def test_loaded_index_search_equals_fresh(spark, sf_dir, tmp_path, by_residual):
    """Persist -> load must reproduce searches BIT-FOR-BIT (JSON float
    round-trip of centroids/codebooks is exact)."""
    e = _emb(spark, sf_dir)
    corpus = e.where(F.col("vec_id") >= 5)
    queries = e.where(F.col("vec_id") < 5)
    p = str(tmp_path / "idx")
    idx = build_ann_index(corpus, p, n_cells=8, by_residual=by_residual)
    fresh = _rows(idx.search(queries, n_probe=2, top_k=10))
    loaded = AnnIndex.load(spark, p)
    assert loaded.centroids == idx.centroids
    assert loaded.codebooks == idx.codebooks
    got = _rows(loaded.search(queries, n_probe=2, top_k=10))
    assert got == fresh and len(fresh) > 0


def test_add_batch_equals_single_pass_encode(spark, sf_dir, tmp_path):
    """Quantizers are frozen at build: adding a batch must equal
    encoding the union in one pass under the same saved parameters —
    codes row-for-row AND search results."""
    e = _emb(spark, sf_dir)
    a = e.where((F.col("vec_id") >= 5) & (F.col("vec_id") % 3 != 0))
    b = e.where((F.col("vec_id") >= 5) & (F.col("vec_id") % 3 == 0))
    queries = e.where(F.col("vec_id") < 5)
    p = str(tmp_path / "idx")
    idx = build_ann_index(a, p, n_cells=8)
    assert idx.add_batch(b) == 1

    union = e.where(F.col("vec_id") >= 5)
    assert _rows(idx.codes()) == _rows(idx._encode(union))
    got = _rows(idx.search(queries, n_probe=2, top_k=10))
    want = _rows(
        search_encoded(
            idx._encode(union),
            idx.centroids,
            idx.codebooks,
            [
                (int(r[0]), [float(v) for v in r[1]])
                for r in queries.orderBy("vec_id").collect()
            ],
            n_probe=2,
            top_k=10,
            by_residual=False,
        )
    )
    assert got == want and len(got) > 0


def test_add_batch_refuses_duplicate_ids_and_build_refuses_overwrite(
    spark, sf_dir, tmp_path
):
    e = _emb(spark, sf_dir)
    corpus = e.where(F.col("vec_id") >= 5)
    p = str(tmp_path / "idx")
    idx = build_ann_index(corpus, p)
    with pytest.raises(ValueError, match="already in the index"):
        idx.add_batch(corpus.limit(3))
    with pytest.raises(ValueError, match="already exists"):
        build_ann_index(corpus, p)


def test_crashed_build_is_invisible_and_rebuildable(spark, sf_dir, tmp_path):
    """The meta write is the commit: codes without meta = no index."""
    e = _emb(spark, sf_dir)
    corpus = e.where(F.col("vec_id") >= 5)
    p = str(tmp_path / "idx")
    # fake a crashed build: codes epoch 0 present, no _ann_meta.json
    corpus.limit(2).select(
        "vec_id", F.lit(0).alias("cluster"), F.array(F.lit(0)).alias("codes")
    ).write.mode("overwrite").parquet(os.path.join(p, "codes", "epoch=0"))
    with pytest.raises(FileNotFoundError):
        AnnIndex.load(spark, p)
    idx = build_ann_index(corpus, p)  # redo overwrites the garbage
    assert idx.codes().count() == corpus.count()


def test_search_recall_sanity_vs_bruteforce(spark, sf_dir, tmp_path):
    """Recall@10 floor through the PERSISTED path. The synthetic
    embeddings are near-uniform (neighbor gaps are tiny — see the s05
    0.42-recall characterization), so the floor is overlap with the
    true L2 top-10, not a top-1 hit: measured 0.36 mean at m=8/probe=4
    on this corpus; 0.2 is the regression floor (and far above the
    ~0.02 of random top-10 picks from a 495-vector corpus)."""
    import numpy as np

    e = _emb(spark, sf_dir)
    corpus = e.where(F.col("vec_id") >= 5)
    queries = e.where(F.col("vec_id") < 5)
    p = str(tmp_path / "idx")
    idx = build_ann_index(corpus, p, m=8, by_residual=True)
    got = idx.search(queries, n_probe=4, top_k=10).collect()
    topk = {}
    for r in got:
        topk.setdefault(r.query_id, set()).add(r.vec_id)

    Q = {int(r[0]): np.array(r[1], dtype=float) for r in queries.collect()}
    C = {int(r[0]): np.array(r[1], dtype=float) for r in corpus.collect()}
    cids = np.array(sorted(C))
    M = np.stack([C[v] for v in cids])
    recalls = []
    for qid, qv in Q.items():
        d2 = ((M - qv) ** 2).sum(axis=1)
        true10 = set(cids[np.argsort(d2)[:10]].tolist())
        recalls.append(len(true10 & topk.get(qid, set())) / 10)
    assert float(np.mean(recalls)) >= 0.2, recalls


def test_add_batch_refuses_null_and_intra_batch_duplicates(spark, sf_dir, tmp_path):
    e = _emb(spark, sf_dir)
    corpus = e.where((F.col("vec_id") >= 5) & (F.col("vec_id") < 100))
    idx = build_ann_index(corpus, str(tmp_path / "idx"))
    fresh = e.where(F.col("vec_id") >= 100).limit(2)
    dup_batch = fresh.union(fresh)  # same vec_ids twice
    with pytest.raises(ValueError, match="duplicate vec_ids"):
        idx.add_batch(dup_batch)
    null_batch = fresh.select(
        F.lit(None).cast("long").alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="NULL vec_id"):
        idx.add_batch(null_batch)


# --------------------------------------------------------------------------
# Round 9: distributed batch search (search_join) — the table-scale
# kNN-join path. Queries never touch the driver; results must be
# bit-equal to the serving path.


@pytest.mark.parametrize("by_residual", [False, True])
def test_search_join_equals_search_bit_for_bit(
    spark, sf_dir, tmp_path, by_residual
):
    e = _emb(spark, sf_dir)
    corpus = e.where(F.col("vec_id") >= 5)
    queries = e.where(F.col("vec_id") < 5)
    p = str(tmp_path / "idx")
    idx = build_ann_index(corpus, p, n_cells=8, by_residual=by_residual)
    want = _rows(idx.search(queries, n_probe=2, top_k=10))
    got = _rows(idx.search_join(queries, n_probe=2, top_k=10))
    assert got == want and len(want) == 50
    # salt-invariance: the distribution knob must never change values
    assert _rows(idx.search_join(queries, n_probe=2, top_k=10, salt=1)) == want
    assert _rows(idx.search_join(queries, n_probe=2, top_k=10, salt=7)) == want


def test_auto_salt_scales_with_cells_not_box():
    """The default salt must collapse toward 1 once cells >= slots —
    salt multiplies the LUT fan-out and the pre-rank survivor volume
    (the round-11 sf100 disk-spill incident) — while keeping ~4x slot
    oversubscription for skew at small cell counts."""
    from kmeanwithmapreduce_spark.operators.ann_index import _auto_salt

    assert _auto_salt(32, 8) == 16
    assert _auto_salt(32, 64) == 2
    assert _auto_salt(32, 1414) == 1
    assert _auto_salt(32, 1) == 32  # never exceeds parallelism
    assert _auto_salt(1, 5) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _auto_salt(32, 0)


def test_search_join_plan_is_distributed(spark, sf_dir, tmp_path):
    """The query side must flow through the plan (Arrow mapInPandas ->
    join), not a driver collect: the probe kernel appears in the plan,
    the query scan is part of ONE DAG with the codes scan, and the join
    is not a CartesianProduct / row-python BatchEvalPython."""
    e = _emb(spark, sf_dir)
    p = str(tmp_path / "idx")
    idx = build_ann_index(e.where(F.col("vec_id") >= 5), p, n_cells=8)
    out = idx.search_join(e.where(F.col("vec_id") < 5), n_probe=2, top_k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_search_join_on_loaded_index_and_after_add(spark, sf_dir, tmp_path):
    e = _emb(spark, sf_dir)
    a = e.where((F.col("vec_id") >= 5) & (F.col("vec_id") % 3 != 0))
    b = e.where((F.col("vec_id") >= 5) & (F.col("vec_id") % 3 == 0))
    queries = e.where(F.col("vec_id") < 5)
    p = str(tmp_path / "idx")
    idx = build_ann_index(a, p, n_cells=8)
    idx.add_batch(b)
    loaded = AnnIndex.load(spark, p)
    assert _rows(loaded.search_join(queries)) == _rows(idx.search(queries))


# --------------------------------------------------------------------------
# Round 10: lifecycle tail — tombstone deletes, codes compaction with
# crash recovery, rebuild + drift.


def _build(spark, sf_dir, tmp_path, name="idx", **kw):
    e = _emb(spark, sf_dir)
    corpus = e.where(F.col("vec_id") >= 5)
    queries = e.where(F.col("vec_id") < 5)
    kw.setdefault("n_cells", 8)
    return (
        build_ann_index(corpus, str(tmp_path / name), **kw),
        corpus,
        queries,
    )


def test_delete_ids_masks_rows_and_search(spark, sf_dir, tmp_path):
    idx, corpus, queries = _build(spark, sf_dir, tmp_path)
    before = {r[0] for r in idx.codes().select("vec_id").collect()}
    victims = corpus.where(F.col("vec_id") % 7 == 0).select("vec_id")
    vic = {r[0] for r in victims.collect()}
    idx.delete_ids(victims)
    after = {r[0] for r in idx.codes().select("vec_id").collect()}
    assert after == before - vic and vic
    res = idx.search(queries, n_probe=2, top_k=10)
    assert not ({r["vec_id"] for r in res.collect()} & vic)
    # search_join follows the same codes() view
    assert _rows(idx.search_join(queries, n_probe=2, top_k=10)) == _rows(res)


def test_delete_ids_rejects_unknown_and_null(spark, sf_dir, tmp_path):
    idx, corpus, _ = _build(spark, sf_dir, tmp_path)
    ghost = spark.range(1).select(F.lit(10_000_000).alias("vec_id"))
    with pytest.raises(ValueError, match="not in the index"):
        idx.delete_ids(ghost)
    nul = spark.range(1).select(F.lit(None).cast("bigint").alias("vec_id"))
    with pytest.raises(ValueError, match="NULL"):
        idx.delete_ids(nul)
    # double delete of the same id is also loud
    one = corpus.select("vec_id").limit(1)
    idx.delete_ids(one)
    with pytest.raises(ValueError, match="not in the index"):
        idx.delete_ids(one)


def test_readd_after_delete_resurrects(spark, sf_dir, tmp_path):
    idx, corpus, _ = _build(spark, sf_dir, tmp_path)
    row = corpus.where(F.col("vec_id") == 10)
    idx.delete_ids(row.select("vec_id"))
    assert idx.codes().where(F.col("vec_id") == 10).count() == 0
    idx.add_batch(row)  # dup check must allow the re-add
    got = idx.codes().where(F.col("vec_id") == 10)
    assert got.count() == 1
    # and the resurrected encoding equals the original one (same
    # frozen quantizers)
    fresh = build_ann_index(
        corpus, str(tmp_path / "twin"), n_cells=8
    ).codes().where(F.col("vec_id") == 10)
    assert _rows(got) == _rows(fresh)


def test_compact_codes_is_invisible_to_reads(spark, sf_dir, tmp_path):
    idx, corpus, queries = _build(spark, sf_dir, tmp_path)
    a = corpus.where(F.col("vec_id") % 3 == 0)
    rest = corpus.where(F.col("vec_id") % 3 != 0)
    p2 = str(tmp_path / "grown")
    idx2 = build_ann_index(rest, p2, n_cells=8)
    idx2.add_batch(a.where(F.col("vec_id") % 2 == 0))
    idx2.add_batch(a.where(F.col("vec_id") % 2 == 1))
    idx2.delete_ids(corpus.where(F.col("vec_id") % 11 == 0).select("vec_id"))
    before_codes = _rows(idx2.codes())
    before_search = _rows(idx2.search(queries, n_probe=2, top_k=10))
    new_epoch = idx2.compact_codes()
    from kmeanwithmapreduce_spark.streaming.ingest import _committed_epochs

    assert _committed_epochs(spark, os.path.join(p2, "codes")) == [new_epoch]
    assert _committed_epochs(spark, os.path.join(p2, "tombstones")) == []
    assert _rows(idx2.codes()) == before_codes
    assert _rows(idx2.search(queries, n_probe=2, top_k=10)) == before_search
    # idempotent no-op when already folded
    assert idx2.compact_codes() == new_epoch


def test_tombstone_committed_during_staging_still_applies(
    spark, sf_dir, tmp_path
):
    """The origin rule: a tombstone recorded with asof == the newest
    PRE-compaction epoch must keep masking the surviving copies of its
    rows inside the compacted epoch (origin(N) <= asof)."""
    import json

    idx, corpus, _ = _build(spark, sf_dir, tmp_path)
    idx.add_batch(
        _emb(spark, sf_dir).where(F.col("vec_id") < 5)
    )  # epoch 1: now 0..4 live in the index too
    pre_head = 1
    new_epoch = idx.compact_codes()
    assert new_epoch == 2
    # simulate the racing delete that landed while the compactor was
    # staging: its asof is the old head epoch
    tdir = os.path.join(idx._tombstones_path(), "epoch=0")
    spark.range(1).select(
        F.lit(3).cast("bigint").alias("vec_id"),
        F.lit(pre_head).cast("int").alias("asof"),
    ).write.mode("overwrite").parquet(tdir)
    assert idx.codes().where(F.col("vec_id") == 3).count() == 0


def test_compaction_crash_windows_recover(spark, sf_dir, tmp_path):
    from kmeanwithmapreduce_spark.operators.ann_index import (
        _COMPACTION_MARKER,
    )
    from kmeanwithmapreduce_spark.sources.fsutil import read_json
    from kmeanwithmapreduce_spark.streaming.ingest import _committed_epochs

    idx, corpus, queries = _build(spark, sf_dir, tmp_path)
    idx.add_batch(_emb(spark, sf_dir).where(F.col("vec_id") < 5))
    want = _rows(idx.codes())

    # window A: staged + marker written, rename never happened
    import uuid

    token = uuid.uuid4().hex
    staged = os.path.join(idx._codes_path(), "_staged", token)
    idx.codes().write.parquet(staged)
    from kmeanwithmapreduce_spark.sources.fsutil import write_json

    write_json(
        spark,
        idx._marker_path(),
        {
            "base_epoch": 2,
            "origin": 1,
            "staged": token,
            "absorbed_codes": [0, 1],
            "absorbed_tombstones": [],
        },
    )
    # a racing second compactor must fail loudly while one is pending
    # ... but any mutation entry completes the dead compactor first:
    idx.add_batch(
        spark.range(900_000, 900_001).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.lit(0.5)] * 64).alias("embedding"),
        )
    )
    assert read_json(spark, idx._marker_path()) is None
    assert _committed_epochs(spark, idx._codes_path()) == [2, 3]
    got = _rows(idx.codes().where(F.col("vec_id") < 900_000))
    assert got == want

    # window B: torn marker (staged never survived) is dropped
    write_json(
        spark,
        idx._marker_path(),
        {
            "base_epoch": 9,
            "origin": 3,
            "staged": "gone",
            "absorbed_codes": [2, 3],
            "absorbed_tombstones": [],
        },
    )
    idx._complete_compaction()
    assert read_json(spark, idx._marker_path()) is None
    assert _rows(idx.codes().where(F.col("vec_id") < 900_000)) == want


def test_concurrent_compactor_loses_loudly(spark, sf_dir, tmp_path):
    from kmeanwithmapreduce_spark.sources.fsutil import write_json

    idx, corpus, _ = _build(spark, sf_dir, tmp_path)
    idx.add_batch(_emb(spark, sf_dir).where(F.col("vec_id") < 5))

    # a live compactor holds the marker (staged dir exists, epoch not
    # yet committed): monkey-free reenactment — patch put-if-absent to
    # simulate losing the race
    import kmeanwithmapreduce_spark.sources.table as T

    real = T._put_if_absent_json
    try:
        T._put_if_absent_json = lambda *a, **k: False
        with pytest.raises(ValueError, match="another compaction"):
            idx.compact_codes()
    finally:
        T._put_if_absent_json = real


def test_rebuild_and_drift_ratio(spark, sf_dir, tmp_path):
    idx, corpus, _ = _build(spark, sf_dir, tmp_path)
    assert idx.meta_train_error and idx.meta_train_error > 0
    # on the build corpus itself the drift ratio is ~1 by construction
    assert abs(idx.drift_ratio(corpus) - 1.0) < 1e-9
    # a shifted distribution (scaled + offset embeddings) drifts
    shifted = corpus.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(3.0) + F.lit(2.0)
        ).alias("embedding"),
    )
    assert idx.drift_ratio(shifted) > 1.5
    # rebuild on the shifted corpus restores the error level
    nu = idx.rebuild(shifted, str(tmp_path / "re"))
    assert nu.n_cells == idx.n_cells and nu.m == idx.m
    assert nu.drift_ratio(shifted) < idx.drift_ratio(shifted)
    # rebuild == plain build on the same corpus (bit-for-bit)
    twin = build_ann_index(shifted, str(tmp_path / "tw"), n_cells=8)
    assert nu.centroids == twin.centroids
    assert nu.codebooks == twin.codebooks
    assert _rows(nu.codes()) == _rows(twin.codes())


# --------------------------------------------------------------------------
# Round 10 (second block): FILTERED search — the allow-list retrieval
# shape (per-tenant corpora, license filters, eval holdouts).


def test_filtered_search_exact_and_parity(spark, sf_dir, tmp_path):
    idx, corpus, queries = _build(spark, sf_dir, tmp_path)
    keep = corpus.where(F.col("vec_id") % 2 == 1).select("vec_id")
    want = _rows(idx.search(queries, n_probe=2, top_k=10, keep=keep))
    assert len(want) == 50
    # every neighbor inside the allow-list (pre-scoring semi-join:
    # excluded vectors can never occupy ranking slots)
    assert all(r[1] % 2 == 1 for r in want)
    # distributed path bit-equal under the same filter, salt-invariant
    got = _rows(idx.search_join(queries, n_probe=2, top_k=10, keep=keep))
    assert got == want
    assert _rows(
        idx.search_join(queries, n_probe=2, top_k=10, keep=keep, salt=3)
    ) == want
    # keep=everything == no filter at all
    assert _rows(
        idx.search(queries, n_probe=2, top_k=10, keep=corpus.select("vec_id"))
    ) == _rows(idx.search(queries, n_probe=2, top_k=10))
    # independent expectation: scoring a PRE-FILTERED codes frame
    # through the shared tail must give the same rows
    from kmeanwithmapreduce_spark.operators.pq import search_encoded

    qvecs = [
        (int(r[0]), [float(v) for v in r[1]])
        for r in queries.select("vec_id", "embedding").orderBy("vec_id").collect()
    ]
    manual = _rows(
        search_encoded(
            idx.codes().where(F.col("vec_id") % 2 == 1),
            idx.centroids,
            idx.codebooks,
            qvecs,
            n_probe=2,
            top_k=10,
            by_residual=False,
        )
    )
    assert manual == want


def test_filtered_search_composes_with_deletes(spark, sf_dir, tmp_path):
    idx, corpus, queries = _build(spark, sf_dir, tmp_path)
    keep = corpus.where(F.col("vec_id") % 2 == 1).select("vec_id")
    victims = keep.limit(20)
    idx.delete_ids(victims)
    vic = {r[0] for r in victims.collect()}
    res = idx.search(queries, n_probe=2, top_k=10, keep=keep)
    ids = {r["vec_id"] for r in res.collect()}
    assert not (ids & vic)  # deletes win inside the allow-list
    assert all(v % 2 == 1 for v in ids)


def test_auto_n_cells_sizing(spark, sf_dir, tmp_path):
    from kmeanwithmapreduce_spark.operators.ann_index import auto_n_cells

    assert auto_n_cells(0) == 8 and auto_n_cells(64) == 8
    assert auto_n_cells(20_000) == 141
    assert auto_n_cells(200_000) == 447
    assert auto_n_cells(10**12) == 65536  # clamp
    e = _emb(spark, sf_dir)
    corpus = e.where(F.col("vec_id") >= 5)
    idx = build_ann_index(corpus, str(tmp_path / "auto"), n_cells="auto")
    # 495 corpus vectors -> sqrt = 22 cells, persisted like an explicit
    # count; search still returns exact 5 x top_k rows
    assert idx.n_cells == auto_n_cells(corpus.count())
    loaded = AnnIndex.load(spark, str(tmp_path / "auto"))
    assert loaded.n_cells == idx.n_cells
    queries = e.where(F.col("vec_id") < 5)
    res = _rows(idx.search(queries, n_probe=2, top_k=10))
    assert len(res) == 50
    assert _rows(idx.search_join(queries, n_probe=2, top_k=10)) == res


def test_int_vec_id_frames_are_pinned_to_bigint(spark, sf_dir, tmp_path):
    """An int-typed vec_id frame (adds OR deletes) must not persist
    INT32 parquet that the declared bigint schemas refuse on every
    later read — round-10 ADVICE regression."""
    e = _emb(spark, sf_dir)
    p = str(tmp_path / "idx")
    idx = build_ann_index(e.where(F.col("vec_id") >= 5), p, n_cells=8)
    extra = (
        e.where(F.col("vec_id") < 5)
        .select(F.col("vec_id").cast("int").alias("vec_id"), "embedding")
    )
    idx.add_batch(extra)
    # codes() must stay readable and carry the added ids
    got = {r["vec_id"] for r in idx.codes().select("vec_id").collect()}
    assert {0, 1, 2, 3, 4} <= got
    # an int-typed delete frame must also read back under _TOMB_SCHEMA
    idx.delete_ids(
        spark.createDataFrame([(0,), (1,)], "vec_id int")
    )
    left = {r["vec_id"] for r in idx.codes().select("vec_id").collect()}
    assert 0 not in left and 1 not in left and 2 in left


def test_gc_staged_sweeps_orphans_and_spares_live_marker(
    spark, sf_dir, tmp_path
):
    """A compactor dead before the marker put-if-absent leaks its
    staged snapshot; gc_staged removes it past the TTL but never the
    live marker's staged dir — round-10 ADVICE regression."""
    import json

    e = _emb(spark, sf_dir)
    p = str(tmp_path / "idx")
    idx = build_ann_index(e.where(F.col("vec_id") >= 5), p, n_cells=8)
    orphan = os.path.join(p, "codes", "_staged", "deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as fh:
        fh.write(b"x")
    # young orphan survives the default TTL
    assert idx.gc_staged() == []
    assert os.path.isdir(orphan)
    # a live marker's staged dir is recovery material even at ttl=0
    live = os.path.join(p, "codes", "_staged", "livetoken")
    os.makedirs(live)
    with open(os.path.join(p, "_compaction.json"), "w") as fh:
        json.dump(
            {
                "base_epoch": 99,
                "origin": 0,
                "staged": "livetoken",
                "absorbed_codes": [],
                "absorbed_tombstones": [],
            },
            fh,
        )
    deleted = idx.gc_staged(ttl_hours=0.0)
    assert deleted == [orphan]
    assert os.path.isdir(live) and not os.path.exists(orphan)
    os.remove(os.path.join(p, "_compaction.json"))
    import shutil

    shutil.rmtree(live)


def test_search_guards_table_sized_query_batches(spark, sf_dir, tmp_path):
    """The serving path collects queries to the driver; a batch over
    max_queries must raise toward search_join, and the guarded path
    must return the exact same rows as before the guard existed."""
    e = _emb(spark, sf_dir)
    p = str(tmp_path / "idx")
    idx = build_ann_index(e.where(F.col("vec_id") >= 5), p, n_cells=8)
    queries = e.where(F.col("vec_id") < 5)
    with pytest.raises(ValueError, match="search_join"):
        idx.search(queries, max_queries=3)
    ok = _rows(idx.search(queries, n_probe=2, top_k=10, max_queries=5))
    dflt = _rows(idx.search(queries, n_probe=2, top_k=10))
    assert ok == dflt and len(ok) == 50


def test_sampled_build_determinism_and_meta(spark, sf_dir, tmp_path):
    """train_sample builds are a pure function of the corpus: two
    sampled builds agree exactly; the resolved size persists in the
    meta and rides through load() and rebuild(); "auto" resolves to
    FAISS's 256/cell rule; a sample smaller than n_cells refuses."""
    e = _emb(spark, sf_dir)
    corpus = e.where(F.col("vec_id") >= 5)
    a = build_ann_index(
        corpus, str(tmp_path / "a"), n_cells=8, train_sample=64
    )
    b = build_ann_index(
        corpus, str(tmp_path / "b"), n_cells=8, train_sample=64
    )
    assert a.centroids == b.centroids and a.codebooks == b.codebooks
    assert a.train_sample == 64
    assert AnnIndex.load(spark, str(tmp_path / "a")).train_sample == 64
    reb = a.rebuild(corpus, str(tmp_path / "reb"))
    assert reb.train_sample == 64 and reb.centroids == a.centroids
    auto = build_ann_index(
        corpus, str(tmp_path / "auto"), n_cells=8, train_sample="auto"
    )
    assert auto.train_sample == 256 * 8
    with pytest.raises(ValueError, match="train_sample"):
        build_ann_index(
            corpus, str(tmp_path / "bad"), n_cells=8, train_sample=4
        )


def test_sampled_build_search_join_bit_equal_and_serves_all(
    spark, sf_dir, tmp_path
):
    """A sampled index must keep every downstream guarantee: the full
    corpus is encoded (sampling bounds the TRAINING set only), search
    == search_join bit-for-bit, and the exact-default build is
    untouched (train_sample=None reproduces the pre-knob index)."""
    e = _emb(spark, sf_dir)
    corpus = e.where(F.col("vec_id") >= 5)
    queries = e.where(F.col("vec_id") < 5)
    n_corpus = corpus.count()
    samp = build_ann_index(
        corpus, str(tmp_path / "s"), n_cells=8, train_sample=64
    )
    assert samp.codes().count() == n_corpus  # full corpus encoded
    sv = _rows(samp.search(queries, n_probe=2, top_k=10))
    sj = _rows(samp.search_join(queries, n_probe=2, top_k=10))
    assert sv == sj and len(sv) == 50
    # default path unchanged: None == the historical exact training
    exact = build_ann_index(corpus, str(tmp_path / "x"), n_cells=8)
    assert exact.train_sample is None
    exact2 = build_ann_index(
        corpus, str(tmp_path / "x2"), n_cells=8, train_sample=None
    )
    assert exact.centroids == exact2.centroids


def test_skewed_query_batch_plan_and_values(spark, sf_dir, tmp_path):
    """Round-12 (the round-11 verdict's skew finding): a query batch
    concentrated on a handful of hot cells used to collapse to salt=1
    — one giant cogroup per hot cell. The data-dependent plan must
    (a) split the hot cells by query hash (qs > 1, bounded group
    sizes), and (b) keep values IDENTICAL to the uniform-salt path
    and to the serving search."""
    from kmeanwithmapreduce_spark.operators.ann_index import (
        _Q_CAP,
        _plan_salts,
    )

    e = _emb(spark, sf_dir)
    corpus = e.where(F.col("vec_id") >= 5)
    idx = build_ann_index(corpus, str(tmp_path / "ix"), n_cells=8)
    # 100k queries AT four cells' centroids — the pathological batch
    hot = [idx.centroids[c] for c in (0, 2, 4, 6)]
    n_q = 100_000
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
    # the planner sees the concentration and splits by query hash
    counts = idx._probe_cell_counts(queries, "query_id", 2)
    sizes = {
        int(r["cluster"]): int(r["count"])
        for r in idx.codes().groupBy("cluster").count().collect()
    }
    plan = {c: (qs, cs) for c, qs, cs in _plan_salts(sizes, counts, 32)}
    hot_counts = sorted(counts.values(), reverse=True)[:4]
    assert hot_counts[0] >= 20_000  # the batch really is concentrated
    for c, n in counts.items():
        if n > _Q_CAP:
            qs, _cs = plan[c]
            assert qs >= -(-n // _Q_CAP) * 0.5, (c, n, plan[c])
            assert qs > 1
    # values: auto plan == uniform salt (the legacy shape) == exact
    auto = idx.search_join(queries, n_probe=2, top_k=10)
    uni = idx.search_join(queries, n_probe=2, top_k=10, salt=3)
    assert auto.count() == n_q * 10
    assert auto.exceptAll(uni).count() == 0
    assert uni.exceptAll(auto).count() == 0
    # serving-search equality on a slice (the bit-equality pin)
    small = queries.where(F.col("query_id") < 64)
    sv = _rows(idx.search(small, n_probe=2, top_k=10))
    sj = _rows(idx.search_join(small, n_probe=2, top_k=10).where(F.lit(True)))
    assert sv == sj and len(sv) == 640


def test_planner_never_full_scans_query_table(spark, sf_dir, tmp_path):
    """Round-12 verdict: ``_probe_cell_counts`` opened with an exact
    ``queries.count()`` — a full pass over the query table before any
    real work. The planner must now classify the batch with a
    limit-capped count and, above the cap, a FIXED-rate hash sample
    (rate independent of the batch size), so a full count() job on the
    query table is never issued; below _PLAN_MIN_QUERIES it must opt
    out of planning entirely (legacy uniform salt)."""
    from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF

    from kmeanwithmapreduce_spark.operators.ann_index import (
        _COUNT_SAMPLE_CAP,
        _PLAN_MIN_QUERIES,
        _PLAN_SAMPLE_RATE,
    )

    e = _emb(spark, sf_dir)
    corpus = e.where(F.col("vec_id") >= 5)
    idx = build_ann_index(corpus, str(tmp_path / "ix"), n_cells=8)

    class _NoFullCount(_ClassicDF):
        def count(self):
            raise AssertionError(
                "planner issued a full count() over the query table"
            )

    c0 = idx.centroids[0]
    n_q = _COUNT_SAMPLE_CAP + 2048
    big = spark.range(n_q).select(
        F.col("id").alias("query_id"),
        F.array(*[F.lit(float(v)) for v in c0])
        .cast("array<float>")
        .alias("embedding"),
    )
    counts = idx._probe_cell_counts(
        _NoFullCount(big._jdf, spark), "query_id", 2
    )
    # above the cap: fixed-rate estimates — multiples of the rate, and
    # the hot cell (every query sits AT centroid 0) estimates ~n_q
    assert counts is not None and len(counts) >= 1
    assert all(v % _PLAN_SAMPLE_RATE == 0 for v in counts.values())
    hot = max(counts.values())
    assert 0.5 * n_q <= hot <= 2.0 * n_q, (hot, n_q)

    # small batch: planner opts out (None), no census / assign passes
    small = big.where(F.col("query_id") < _PLAN_MIN_QUERIES)
    assert (
        idx._probe_cell_counts(
            _NoFullCount(small._jdf, spark), "query_id", 2
        )
        is None
    )
    # and the fallback path still matches the serving search bit-for-bit
    tiny = big.where(F.col("query_id") < 5)
    sv = _rows(idx.search(tiny, n_probe=2, top_k=10))
    sj = _rows(idx.search_join(tiny, n_probe=2, top_k=10))
    assert sv == sj and len(sv) == 50
