"""Semantic tests for feature-eng pack #126: meta-analysis pooling,
Egger test, leave-one-out sensitivity (brute pandas replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import q_egger_test, q_loo_meta, q_meta_analysis

SF = "/root/testdata/sf0.001"


def _effects():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["c"] = np.round(e.value * 100).astype("int64")
    e["week"] = (e.ts.dt.day - 1) // 7
    e["a"] = e.user_id % 2 == 0
    rows = []
    for wk, g in e.groupby("week"):
        ga, gb = g[g.a].c.astype(float), g[~g.a].c.astype(float)
        eff = ga.mean() - gb.mean()
        v = ga.var(ddof=1) / len(ga) + gb.var(ddof=1) / len(gb)
        rows.append((wk, eff, v))
    return pd.DataFrame(rows, columns=["week", "eff", "v"])


def test_meta_analysis_brute(spark):
    out = q_meta_analysis(spark, SF).toPandas().iloc[0]
    d = _effects()
    w = 1 / d.v
    sw, swe = w.sum(), (w * d.eff).sum()
    fixed = swe / sw
    q = (w * d.eff**2).sum() - swe**2 / sw
    k = len(d)
    cc = sw - (w**2).sum() / sw
    tau2 = max(0.0, (q - (k - 1)) / cc)
    i2 = max(0.0, (q - (k - 1)) / q)
    wr = 1 / (d.v + tau2)
    rand = (wr * d.eff).sum() / wr.sum()
    assert out.k == k
    assert abs(out.fixed_effect - round(fixed, 4)) < 1e-3
    assert abs(out.fixed_se - round(math.sqrt(1 / sw), 4)) < 1e-4
    assert abs(out.cochran_q - round(q, 4)) < 1e-3
    assert abs(out.i2 - round(i2, 6)) < 1e-5
    assert abs(out.tau2 - round(tau2, 4)) < 1e-2
    assert abs(out.random_effect - round(rand, 4)) < 1e-3
    # random-effects SE is never tighter than fixed
    assert out.random_se >= out.fixed_se - 1e-9


def test_egger_test_brute(spark):
    out = q_egger_test(spark, SF).toPandas().iloc[0]
    d = _effects()
    z = d.eff / np.sqrt(d.v)
    p = 1 / np.sqrt(d.v)
    k = len(d)
    spz = (p * z).mean() - p.mean() * z.mean()
    spp = (p * p).mean() - p.mean() ** 2
    szz = (z * z).mean() - z.mean() ** 2
    b = spz / spp
    a = z.mean() - b * p.mean()
    sse = k * (szz - spz**2 / spp)
    se_a = math.sqrt(
        sse / (k - 2) * (1 / k + p.mean() ** 2 / (k * spp))
    )
    assert out.k == k
    assert abs(out.egger_intercept - round(a, 6)) < 1e-4
    assert abs(out.t_intercept - round(a / se_a, 6)) < 1e-4
    assert abs(out.slope - round(b, 6)) < 1e-4


def test_loo_meta_brute(spark):
    out = q_loo_meta(spark, SF).toPandas().set_index("week")
    d = _effects()
    w = 1 / d.v
    sw, swe = w.sum(), (w * d.eff).sum()
    full = swe / sw
    for _, r in d.iterrows():
        loo = (swe - r.eff / r.v) / (sw - 1 / r.v)
        row = out.loc[r.week]
        assert abs(row.week_effect - round(r.eff, 4)) < 1e-3
        assert abs(row.loo_pooled - round(loo, 4)) < 1e-3
        assert abs(row.delta_vs_full - round(loo - full, 4)) < 2e-3
    # deltas roughly cancel across strata
    assert abs(out.delta_vs_full.mean()) < abs(full) + 1.0
