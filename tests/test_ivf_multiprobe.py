"""IVF multi-probe: recall grows monotonically in n_probe and probing
every cell reproduces the exact brute-force ranking."""

from __future__ import annotations

from kmeanwithmapreduce_spark.operators.similarity import (
    ivf_search_multiprobe,
    s01_knn_bruteforce,
    s03_ivf_search,
)


def _topk_sets(df):
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def _recall(got, want):
    per_q = [
        len(got.get(q, set()) & w) / len(w) for q, w in want.items()
    ]
    return sum(per_q) / len(per_q)


def test_multiprobe_recall_monotone_and_exact_at_full_probe(spark, sf_dir):
    want = _topk_sets(s01_knn_bruteforce(spark, sf_dir))
    r1 = _recall(_topk_sets(s03_ivf_search(spark, sf_dir)), want)
    r2 = _recall(
        _topk_sets(ivf_search_multiprobe(spark, sf_dir, n_probe=2)), want
    )
    r4 = _recall(
        _topk_sets(ivf_search_multiprobe(spark, sf_dir, n_probe=4)), want
    )
    assert r1 <= r2 <= r4 <= 1.0
    assert r2 > 0  # probing 2 of 8 cells finds a nontrivial share

    # probing ALL cells must equal brute force EXACTLY (values + ranks)
    full = ivf_search_multiprobe(spark, sf_dir, n_probe=8)
    brute = s01_knn_bruteforce(spark, sf_dir)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, brute.collect())
    )


def test_multiprobe_p1_equals_own_cell_probe_when_assigned_cell_is_nearest(
    spark, sf_dir
):
    """n_probe=1 probes each query's NEAREST cell — which is exactly the
    cell the quantizer assigned it to (assign == argmin distance), so it
    must reproduce s03."""
    p1 = ivf_search_multiprobe(spark, sf_dir, n_probe=1)
    s03 = s03_ivf_search(spark, sf_dir)
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, s03.collect()))
