"""End-to-end compat-mode golden test on the reference's own dataset
(/root/reference/Data/CustomerData.txt, 2000x7): our engine vs a NumPy
Lloyd's oracle executed with the reference's quirks (SURVEY §8), using
injected init centroids (the reference's sampler is unseeded — §8 Q9)."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

CUSTOMER_DATA = "/root/reference/Data/CustomerData.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CUSTOMER_DATA), reason="reference dataset not present"
)


def _load_numpy():
    return np.loadtxt(CUSTOMER_DATA, delimiter=",", dtype=np.float64)


def _numpy_compat_lloyd(x, init, thresh, max_loop):
    c = np.asarray(init, dtype=np.float64)
    rounds = 0
    converged = False
    while rounds < max_loop - 1:  # reference cap quirk (Main.java:302-305)
        rounds += 1
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(2)
        labels = np.argmin(d2, axis=1)
        new = c.copy()
        for i in range(len(c)):
            m = x[labels == i]
            if len(m):
                mean = m.mean(0)
                new[i] = np.float32(
                    np.floor(mean * 100000.0 + 0.5) / 100000.0
                ).astype(np.float64)
        moves = np.sqrt(((new - c) ** 2).sum(1))
        c = new
        if (moves <= thresh).all():
            converged = True
            break
    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(2)
    labels = np.argmin(d2, axis=1)
    sigma = np.array(
        [
            np.sqrt(((x[labels == i] - c[i]) ** 2).sum(1)).mean()
            for i in range(len(c))
        ]
    )
    dbi = 0.0
    k = len(c)
    for i in range(k):
        dbi += max(
            (sigma[i] + sigma[j]) / math.sqrt(((c[i] - c[j]) ** 2).sum())
            for j in range(k)
            if j != i
        )
    dbi /= k
    return c, labels, rounds, converged, dbi


def test_compat_on_customer_data_k5(spark):
    """The documented reference invocation shape: k=5, thresh=0.01,
    maxloop=300 (docx appendix), with fixed init centroids."""
    from kmeanwithmapreduce_spark.kmeans import core
    from kmeanwithmapreduce_spark.sources.readers import load_points_csv

    x = _load_numpy()
    init = [list(x[i * 400]) for i in range(5)]  # deterministic spread
    df = load_points_csv(spark, CUSTOMER_DATA, dim=7)
    res = core.lloyd(
        df,
        core.KMeansParams(k=5, thresh=0.01, max_loop=300, mode="compat"),
        init_centroids=init,
    )
    want_c, want_labels, want_rounds, want_conv, want_dbi = _numpy_compat_lloyd(
        x, init, 0.01, 300
    )
    assert res.converged == want_conv
    assert res.n_iter == want_rounds
    # float32 CSV parse vs float64 numpy parse: tolerance at the 5-dp grid
    assert np.allclose(np.asarray(res.centroids), want_c, atol=2e-5)

    labeled = core.label(df, res.centroids)
    got_sizes = dict(
        (r["cluster"], r["count"])
        for r in labeled.groupBy("cluster").count().collect()
    )
    want_sizes = {i: int((want_labels == i).sum()) for i in range(5)}
    assert got_sizes == want_sizes

    dbi = core.davies_bouldin_index(labeled, res.centroids)
    assert dbi == pytest.approx(want_dbi, rel=1e-4)
