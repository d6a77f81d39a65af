"""Semantic tests for feature-eng pack #80: Adjusted Rand Index,
V-measure (fixed-point entropies), GPD peaks-over-threshold MOM fit
(brute python replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _GPD_DECILE,
    q_adjusted_rand,
    q_cluster_vmeasure,
    q_gpd_fit,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")[["lang", "source"]]


def _comb2(x):
    return x * (x - 1) // 2


def test_adjusted_rand_brute(spark):
    out = q_adjusted_rand(spark, SF).toPandas().iloc[0]
    d = _docs()
    n = len(d)
    cells = d.groupby(["lang", "source"]).size()
    a = d.groupby("lang").size()
    b = d.groupby("source").size()
    s_nij = int(sum(_comb2(v) for v in cells))
    s_a = int(sum(_comb2(v) for v in a))
    s_b = int(sum(_comb2(v) for v in b))
    assert (out.n, out.s_nij, out.s_a, out.s_b) == (n, s_nij, s_a, s_b)
    exp = s_a * s_b / _comb2(n)
    ari = (s_nij - exp) / ((s_a + s_b) / 2 - exp)
    assert abs(out.expected_index - round(exp, 6)) < 1e-6
    assert abs(out.ari - round(ari, 6)) < 1e-6
    # sanity vs sklearn-style bounds
    assert -0.5 <= out.ari <= 1.0


def test_adjusted_rand_perfect_agreement():
    # identical partitions => ARI == 1 by construction of the formula
    lab = np.repeat([0, 1, 2], [5, 7, 9])
    cells = pd.crosstab(lab, lab).to_numpy().ravel()
    s_nij = sum(_comb2(v) for v in cells)
    s_a = s_b = sum(_comb2(v) for v in np.bincount(lab))
    n = len(lab)
    exp = s_a * s_b / _comb2(n)
    ari = (s_nij - exp) / ((s_a + s_b) / 2 - exp)
    assert abs(ari - 1.0) < 1e-12


def test_cluster_vmeasure_brute(spark):
    out = q_cluster_vmeasure(spark, SF).toPandas().iloc[0]
    d = _docs()
    n = len(d)
    cells = d.groupby(["lang", "source"]).size()
    a = d.groupby("lang").size()
    b = d.groupby("source").size()

    def e6_sum(pairs):
        return -sum(round(1e6 * c * math.log(c / den)) for c, den in pairs)

    hc = e6_sum((v, n) for v in a)
    hk = e6_sum((v, n) for v in b)
    hck = e6_sum((v, b[s]) for (_, s), v in cells.items())
    hkc = e6_sum((v, a[l]) for (l, _), v in cells.items())
    assert (out.hc_e6, out.hk_e6, out.hck_e6, out.hkc_e6) == (
        hc,
        hk,
        hck,
        hkc,
    )
    h = 1 - hck / hc
    c = 1 - hkc / hk
    v = 2 * h * c / (h + c)
    assert abs(out.homogeneity - round(h, 6)) < 1e-9
    assert abs(out.completeness - round(c, 6)) < 1e-9
    assert abs(out.v_measure - round(v, 6)) < 1e-9
    assert 0 <= out.v_measure <= 1


def test_gpd_fit_brute(spark):
    out = q_gpd_fit(spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet")
    cents = round(e.value * 100).astype("int64").sort_values().to_numpy()
    n = len(cents)
    target = (_GPD_DECILE * n + 9) // 10
    u = int(cents[target - 1])  # min cents with cum >= ceil(0.9 n)
    y = cents[cents > u] - u
    k = len(y)
    s1, s2 = int(y.sum()), int((y**2).sum())
    m = s1 / k
    v = (s2 - s1 * m) / (k - 1)
    assert (out.n, out.u_cents, out.k) == (n, u, k)
    assert abs(out.mean_excess - round(m, 6)) < 1e-6
    assert abs(out.var_excess - round(v, 6)) < 1e-6
    assert abs(out.xi - round((1 - m * m / v) / 2, 6)) < 1e-6
    assert abs(out.sigma_cents - round(m * (1 + m * m / v) / 2, 6)) < 1e-6
    # threshold really is the exact p90: ~10% of mass above it
    assert k <= n - target + 1
