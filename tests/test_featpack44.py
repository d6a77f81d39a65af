"""Semantic tests for feature-eng pack #44: Mood's median test,
Epanechnikov KDE, Q-Q decile mapping, Jonckheere-Terpstra trend,
Page's L trend, Anderson-Darling k-sample (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_ad_ksample,
    q_epanechnikov_kde,
    q_jonckheere_trend,
    q_mood_median,
    q_page_trend,
    q_qq_deciles,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        day=lambda x: x.ts.dt.day,
    )


def test_mood_median_brute(spark):
    out = q_mood_median(spark, SF).toPandas().set_index("event_type")
    e = _events()
    v = np.sort(e.cents.values)
    n = len(v)
    med2 = int(v[(n + 1) // 2 - 1]) + int(v[n // 2])
    above = {
        et: int((2 * g.cents.values > med2).sum())
        for et, g in e.groupby("event_type")
    }
    sizes = e.groupby("event_type").size().to_dict()
    aa = sum(above.values())
    chi2 = 0.0
    for et in sizes:
        ea = sizes[et] * aa / n
        eb = sizes[et] * (n - aa) / n
        chi2 += (above[et] - ea) ** 2 / ea
        chi2 += ((sizes[et] - above[et]) - eb) ** 2 / eb
    for et in sizes:
        r = out.loc[et]
        assert r.n == sizes[et]
        assert r.n_above == above[et]
        assert r.median_value == med2 / 200.0
        assert abs(r.chi2 - chi2) < 2e-6
        assert (
            abs(r.p_chi2_df4 - math.exp(-chi2 / 2) * (1 + chi2 / 2))
            < 2e-6
        )


def test_epanechnikov_kde_brute(spark):
    out = (
        q_epanechnikov_kde(spark, SF).toPandas().set_index("grid_value")
    )
    e = _events()
    c = e.loc[e.event_type == "purchase", "cents"].values
    n = len(c)
    assert set(out.index) == {50 * i for i in range(11)}
    for g in range(0, 501, 50):
        d = c - 100 * g
        inw = np.abs(d) < 5000
        s = int(((25_000_000 - d * d) * inw).sum())
        f = 0.75 * s / (n * 1.25e9)
        r = out.loc[g]
        assert r.n_in_window == int(inw.sum())
        assert abs(r.density - f) < 2e-9
    # densities integrate to <= 1 over the grid (trapezoid sanity)
    approx = out.density.sum() * 50
    assert 0.5 < approx < 1.5


def test_qq_deciles_brute(spark):
    out = q_qq_deciles(spark, SF).toPandas().set_index("p_pct")
    e = _events()
    p = np.sort(e.loc[e.event_type == "purchase", "cents"].values)
    c = np.sort(e.loc[e.event_type == "click", "cents"].values)
    assert set(out.index) == set(range(10, 91, 10))
    for pct in range(10, 91, 10):
        vp = p[(pct * len(p) + 99) // 100 - 1]
        vc = c[(pct * len(c) + 99) // 100 - 1]
        r = out.loc[pct]
        assert r.purchase_value == vp / 100.0
        assert r.click_value == vc / 100.0
        assert abs(r.qq_gap - (vp - vc) / 100.0) < 1e-9
    # quantiles are nondecreasing in p
    assert (np.diff(out.sort_index().purchase_value.values) >= 0).all()


def test_jonckheere_brute(spark):
    out = q_jonckheere_trend(spark, SF).toPandas().iloc[0]
    e = _events()
    wk = ((e.day - 1) // 7 + 1).values
    x = e.cents.values
    weeks = np.sort(np.unique(wk))
    j2 = 0
    for a in range(len(weeks)):
        for b in range(a + 1, len(weeks)):
            xi = x[wk == weeks[a]]
            xj = x[wk == weeks[b]]
            j2 += 2 * int((xi[:, None] < xj[None, :]).sum())
            j2 += int((xi[:, None] == xj[None, :]).sum())
    nvec = np.array([(wk == w).sum() for w in weeks], dtype=np.int64)
    nn = int(nvec.sum())
    mean2 = (nn * nn - int((nvec**2).sum())) // 2
    t = np.array(list(Counter(x).values()), dtype=np.int64)
    ga = int((nvec * (nvec - 1) * (2 * nvec + 5)).sum())
    ta = int((t * (t - 1) * (2 * t + 5)).sum())
    gb = int((nvec * (nvec - 1) * (nvec - 2)).sum())
    tb = int((t * (t - 1) * (t - 2)).sum())
    gd = int((nvec * (nvec - 1)).sum())
    td = int((t * (t - 1)).sum())
    var = (
        (nn * (nn - 1) * (2 * nn + 5) - ga - ta) / 72.0
        + gb * tb / (36.0 * nn * (nn - 1) * (nn - 2))
        + gd * td / (8.0 * nn * (nn - 1))
    )
    assert out.n_total == nn
    assert out.k_weeks == len(weeks)
    assert out.j2_stat == j2
    assert out.mean2 == mean2
    assert abs(out.var_j - var) < max(2e-6, var * 1e-9)
    assert abs(out.z - (j2 - mean2) / (2 * math.sqrt(var))) < 2e-6


def test_page_trend_brute(spark):
    out = q_page_trend(spark, SF).toPandas().set_index("week")
    e = _events()
    e = e[e.day <= 28].assign(wk=lambda x: (x.day - 1) // 7 + 1)
    uw = (
        e.groupby(["user_id", "wk"])
        .cents.sum()
        .unstack()
    )
    uw = uw.dropna()  # complete blocks only
    b = len(uw)
    k = 4
    rank_sum2 = {w: 0 for w in range(1, 5)}
    for _, row in uw.iterrows():
        vals = row.values
        for j, w in enumerate(range(1, 5)):
            less = int((vals < vals[j]).sum())
            eq = int((vals == vals[j]).sum()) - 1
            rank_sum2[w] += 2 + 2 * less + eq
    l2 = sum(w * rank_sum2[w] for w in range(1, 5))
    mean_l2 = b * k * (k + 1) * (k + 1) // 2
    var_l = b * k * k * (k + 1) * (k + 1) * (k - 1) / 144.0
    z = (l2 - mean_l2) / (2 * math.sqrt(var_l))
    for w in range(1, 5):
        r = out.loc[w]
        assert r.n_blocks == b
        assert r.rank_sum2 == rank_sum2[w]
        assert abs(r.mean_rank - rank_sum2[w] / (2 * b)) < 2e-6
        assert r.l2_stat == l2
        assert r.mean_l2 == mean_l2
        assert abs(r.z - z) < 2e-6
    # doubled ranks over 4 weeks sum to b*k*(k+1) across weeks
    assert sum(rank_sum2.values()) == b * k * (k + 1)


def test_ad_ksample_brute(spark):
    out = q_ad_ksample(spark, SF).toPandas().iloc[0]
    e = _events()
    vals = np.sort(e.cents.unique())
    types = sorted(e.event_type.unique())
    nn = len(e)
    l = np.array(
        [int((e.cents == v).sum()) for v in vals], dtype=np.int64
    )
    b2 = 2 * np.cumsum(l) - l
    raw = 0.0
    for et in types:
        ec = e.loc[e.event_type == et, "cents"].values
        ni = len(ec)
        f = np.array([int((ec == v).sum()) for v in vals], dtype=np.int64)
        m2 = 2 * np.cumsum(f) - f
        denom4 = 2 * nn * b2 - b2 * b2 - nn * l
        ok = denom4 > 0
        term = (
            l[ok]
            * (nn * m2[ok] - ni * b2[ok]).astype(float) ** 2
            / (nn * denom4[ok].astype(float))
        ).sum()
        raw += term / ni
    a2 = (nn - 1) / nn * raw
    assert out.n_total == nn
    assert out.k_groups == len(types)
    assert abs(out.a2_midrank - a2) < max(2e-6, a2 * 1e-9)
    # A2 for identical distributions concentrates near k-1; sanity
    assert 0.0 < out.a2_midrank < 100.0
