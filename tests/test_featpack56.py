"""Semantic tests for feature-eng pack #56: Zipf log-log fit R^2,
lognormal length fit (brute python replicas; cross-engine parity is
proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from crawlfe.queries import q_lognormal_fit, q_zipf_r2

SF = "/root/testdata/sf0.001"


def test_zipf_r2_brute(spark):
    out = q_zipf_r2(spark, SF).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = Counter()
    for t in d.text.str.strip().str.split():
        cnt.update(t)
    head = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    x = np.log(np.arange(1, len(head) + 1, dtype=float))
    y = np.log(np.array([c for _, c in head], dtype=float))
    n = len(x)
    sx, sy = x.sum(), y.sum()
    sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert out.n_head == n
    assert abs(out.zipf_slope - slope) < 2e-6
    assert abs(out.r2 - r2) < 2e-6
    # a frequency head always slopes down, and R^2 is bounded
    assert out.zipf_slope < 0
    assert 0.0 <= out.r2 <= 1.0


def test_lognormal_fit_brute(spark):
    out = q_lognormal_fit(spark, SF).toPandas().set_index("source")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    d = d[d.n_chars > 0]
    for src, g in d.groupby("source"):
        ln = np.log(g.n_chars.values.astype(float))
        mu = ln.mean()
        sigma = math.sqrt((ln * ln).mean() - mu * mu)
        v = np.sort(g.n_chars.values)
        n = len(v)
        emp = (v[(n + 1) // 2 - 1] + v[n // 2]) / 2.0
        r = out.loc[src]
        assert r.n == n
        assert abs(r.log_mu - mu) < 2e-6
        assert abs(r.log_sigma - sigma) < 2e-6
        assert abs(r.lognormal_median - math.exp(mu)) < 2e-4
        assert r.empirical_median == emp
        # for roughly symmetric log data the two medians agree
        # within an order of magnitude (sanity, not a fit test)
        assert 0.1 < r.lognormal_median / r.empirical_median < 10
