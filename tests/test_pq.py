"""Product quantization: codebook training determinism, zero-shuffle
encode, ADC search semantics (pinned against a pure-NumPy replica of
the PQ/ADC math), and recall-vs-code-budget behavior. The s04 registry
entry's golden-row oracle runs in tests/test_oracle_parity.py."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators.pq import (
    ivfpq_search,
    pq_encode,
    train_pq_codebooks,
)
from kmeanwithmapreduce_spark.sources.readers import load_table

_M, _K, _D, _DSUB = 4, 16, 64, 16


def _corpus(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, X


def _np_codes(X, books):
    m, dsub = len(books), len(books[0][0])
    B = [np.array(b) for b in books]
    return np.stack(
        [
            ((X[:, None, j * dsub : (j + 1) * dsub] - B[j][None, :, :]) ** 2)
            .sum(2)
            .argmin(1)
            for j in range(m)
        ],
        axis=1,
    )


def _np_adc_topk(q, X_ids, codes, books, k=10):
    m, dsub = len(books), len(books[0][0])
    B = [np.array(b) for b in books]
    adc = np.zeros(len(codes))
    for j in range(m):
        adc += (((q[j * dsub : (j + 1) * dsub][None, :] - B[j]) ** 2).sum(1))[
            codes[:, j]
        ]
    adc = np.floor(adc * 10000) / 10000
    order = np.lexsort((X_ids, adc))
    return [int(v) for v in X_ids[order[:k]]]


def test_codebooks_shape_and_determinism(spark, sf_dir):
    a = train_pq_codebooks(spark, sf_dir)
    b = train_pq_codebooks(spark, sf_dir)
    assert len(a) == _M and all(len(bk) == _K for bk in a)
    assert all(len(c) == _DSUB for bk in a for c in bk)
    assert a == b  # bit-identical double run


def test_encode_codes_in_range_and_layout_invariant(spark, sf_dir):
    books = train_pq_codebooks(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    a = {r.vec_id: r.codes for r in pq_encode(e, books).select("vec_id", "codes").collect()}
    assert all(0 <= c < _K for cs in a.values() for c in cs)
    b = {
        r.vec_id: r.codes
        for r in pq_encode(e.repartition(13), books)
        .select("vec_id", "codes")
        .collect()
    }
    assert a == b


def test_encode_matches_numpy_and_is_narrow(spark, sf_dir):
    books = train_pq_codebooks(spark, sf_dir)
    ids, X = _corpus(spark, sf_dir)
    want = dict(zip(ids.tolist(), _np_codes(X, books).tolist()))
    e = load_table(spark, sf_dir, "embeddings")
    out = pq_encode(e, books).select("vec_id", "codes")
    got = {r.vec_id: list(r.codes) for r in out.collect()}
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero-shuffle corpus pass


def test_ivfpq_full_probe_matches_numpy_adc_replica(spark, sf_dir):
    """With n_probe == n_cells (no candidate pruning) the Spark pipeline
    must reproduce the PQ/ADC math exactly: same codes, same fixed-order
    LUT sums, same floored grid, same (adc, vec_id) ranking."""
    books = train_pq_codebooks(spark, sf_dir)
    ids, X = _corpus(spark, sf_dir)
    qm = ids < 5
    codes = _np_codes(X[~qm], books)
    want = {
        int(qi): _np_adc_topk(q, ids[~qm], codes, books)
        for qi, q in zip(ids[qm], X[qm])
    }
    got: dict[int, list[int]] = {}
    for r in ivfpq_search(spark, sf_dir, n_cells=8, n_probe=8).collect():
        got.setdefault(int(r.query_id), []).append((r.rk, int(r.vec_id)))
    got = {q: [v for _, v in sorted(vs)] for q, vs in got.items()}
    assert got == want


def test_recall_grows_with_code_budget(spark, sf_dir):
    """PQ's defining trade-off on this corpus (isotropic vectors — the
    hardest case for coarse codes): more bits, better recall@10 against
    exact L2. Both ends are deterministic, so the ordering is a stable
    pin, not a flaky statistical test. (Evaluated in NumPy on the same
    codebooks: the Spark path is pinned equal to the replica above.)"""
    ids, X = _corpus(spark, sf_dir)
    qm = ids < 5
    exact = {}
    for qi, q in zip(ids[qm], X[qm]):
        d2 = ((X[~qm] - q) ** 2).sum(1)
        order = np.lexsort((ids[~qm], d2))
        exact[int(qi)] = set(int(v) for v in ids[~qm][order[:10]])

    def recall(m, k):
        books = train_pq_codebooks(spark, sf_dir, m=m, k_codes=k)
        codes = _np_codes(X[~qm], books)
        recs = []
        for qi, q in zip(ids[qm], X[qm]):
            top = set(_np_adc_topk(q, ids[~qm], codes, books))
            recs.append(len(top & exact[int(qi)]) / 10)
        return float(np.mean(recs))

    lo, hi = recall(4, 16), recall(8, 256)
    assert hi > lo  # 16-bit codes < 64-bit codes
    assert hi >= 0.4  # measured 0.54 at sf0.001; generous floor


def test_ivfpq_probes_bound_candidates(spark, sf_dir):
    """n_probe=1 scans ~1/n_cells of the corpus: every returned neighbor
    must come from the query's probed cell (the IVF invariant)."""
    from kmeanwithmapreduce_spark.operators.similarity import _train_ivf

    cells, _ = _train_ivf(spark, sf_dir, 8)
    cell_of = {r.vec_id: r.cluster for r in cells.select("vec_id", "cluster").collect()}
    out = ivfpq_search(spark, sf_dir, n_cells=8, n_probe=1).collect()
    probed = {}
    for r in out:
        probed.setdefault(r.query_id, set()).add(cell_of[r.vec_id])
    assert all(len(cs) == 1 for cs in probed.values())


def test_s04_entry_sits_after_driver_window():
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert "s04_ivfpq_search" in names and names.index("s04_ivfpq_search") >= 50
    assert "s04_ivfpq_search" in entry.oracle_sql()


def test_by_residual_improves_recall_at_same_bits(spark, sf_dir):
    """FAISS IVFPQ's by_residual=true at the s04 bit budget (m=4, k=16):
    quantizing residuals to the coarse centroid must beat quantizing raw
    vectors on recall@10 vs exact L2 (measured 0.42 vs 0.20 here; both
    pipelines deterministic, so this is a stable ordering pin)."""
    ids, X = _corpus(spark, sf_dir)
    qm = ids < 5
    exact = {}
    for qi, q in zip(ids[qm], X[qm]):
        d2 = ((X[~qm] - q) ** 2).sum(1)
        order = np.lexsort((ids[~qm], d2))
        exact[int(qi)] = set(int(v) for v in ids[~qm][order[:10]])

    def spark_recall(by_residual):
        got: dict[int, set[int]] = {}
        for r in ivfpq_search(
            spark, sf_dir, n_cells=8, n_probe=8, by_residual=by_residual
        ).collect():
            got.setdefault(int(r.query_id), set()).add(int(r.vec_id))
        return float(
            np.mean([len(got.get(q, set()) & exact[q]) / 10 for q in exact])
        )

    raw, res = spark_recall(False), spark_recall(True)
    assert res > raw
    assert res >= 0.3  # measured 0.42; generous floor


def test_s05_entry_sits_after_driver_window():
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert names.index("s05_ivfpq_residual_search") >= 50
    assert "s05_ivfpq_residual_search" in entry.oracle_sql()
