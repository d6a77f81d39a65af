"""Semantic tests for feature-eng pack #109: LOF, TwoNN intrinsic
dimension, hubness skew (brute numpy replicas; cross-engine parity
is proven by the check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _NB_K,
    _NB_PANEL,
    q_hubness_skew,
    q_lof_scores,
    q_twonn_dim,
)

SF = "/root/testdata/sf0.001"


def _knn_brute():
    e = pd.read_parquet(f"{SF}/embeddings.parquet")
    e = e[e.vec_id < _NB_PANEL].sort_values("vec_id")
    ids = e.vec_id.to_numpy()
    X = np.stack(e.embedding.to_numpy()).astype("float64")
    d = np.sqrt(
        ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    )
    knn = {}
    for a, i in enumerate(ids):
        order = sorted(
            (
                (d[a, b], int(j))
                for b, j in enumerate(ids)
                if j != i
            )
        )[:_NB_K]
        knn[int(i)] = order
    return knn


def test_lof_scores_brute(spark):
    out = q_lof_scores(spark, SF).toPandas()
    knn = _knn_brute()
    kdist = {i: nb[-1][0] for i, nb in knn.items()}
    lrd = {}
    for i, nb in knn.items():
        rds = [max(kdist[j], dij) for dij, j in nb]
        lrd[i] = 1.0 / np.mean(rds)
    lof = {
        i: np.mean([lrd[j] for _, j in nb]) / lrd[i]
        for i, nb in knn.items()
    }
    expect = sorted(
        ((round(v, 6), i) for i, v in lof.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert len(out) == 10
    for row, (lv, i) in zip(out.itertuples(index=False), expect):
        assert row.vec_id == i
        assert abs(row.lof - lv) < 2e-6
        assert abs(row.lrd - round(lrd[i], 6)) < 2e-6
    # inliers sit near 1; the top outlier must exceed 1
    assert out.lof.iloc[0] > 1.0


def test_twonn_dim_brute(spark):
    out = q_twonn_dim(spark, SF).toPandas().iloc[0]
    knn = _knn_brute()
    mus = []
    for i, nb in knn.items():
        d1, d2 = nb[0][0], nb[1][0]
        if d1 > 0:
            mus.append(d2 / d1)
    n = len(mus)
    assert out.n_used == n
    assert abs(out.id_mle - round(n / np.sum(np.log(mus)), 4)) < 1e-3
    assert abs(out.mean_mu - round(np.mean(mus), 6)) < 1e-6
    # 64-dim gaussian-ish embeddings: estimator must land high
    assert out.id_mle > 5


def test_hubness_skew_brute(spark):
    out = q_hubness_skew(spark, SF).toPandas().iloc[0]
    knn = _knn_brute()
    occ = dict.fromkeys(knn, 0)
    for nb in knn.values():
        for _, j in nb:
            occ[j] += 1
    x = np.array(list(occ.values()), dtype=float)
    m1, m2, m3 = x.mean(), (x**2).mean(), (x**3).mean()
    var = m2 - m1 * m1
    sk = (m3 - 3 * m1 * m2 + 2 * m1**3) / var**1.5
    assert out.n == len(x)
    assert abs(out.mean_kocc - round(m1, 4)) < 1e-9
    assert abs(out.skewness - round(sk, 6)) < 1e-6
    assert out.max_kocc == int(x.max())
    assert out.n_antihubs == int((x == 0).sum())
    # every point contributes exactly k list slots
    assert abs(m1 - _NB_K) < 1e-12
