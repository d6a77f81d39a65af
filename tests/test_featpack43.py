"""Semantic tests for feature-eng pack #43: Mann-Whitney U, Cliff's
delta, Brown-Forsythe variance homogeneity, Durbin-Levinson PACF,
Ljung-Box portmanteau, Chatterjee's xi (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_chatterjee_xi,
    q_cliffs_delta,
    q_levene_bf,
    q_ljung_box,
    q_mann_whitney,
    q_pacf_daily,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        day=lambda x: x.ts.dt.day,
    )


def _daily(e):
    days = np.sort(e.day.unique())
    out = {}
    for et, g in e.groupby("event_type"):
        c = g.groupby("day").size()
        out[et] = np.array([c.get(d, 0) for d in days], dtype=np.int64)
    return days, out


def test_mann_whitney_brute(spark):
    out = q_mann_whitney(spark, SF).toPandas().iloc[0]
    e = _events()
    p = e.loc[e.event_type == "purchase", "cents"].values
    c = e.loc[e.event_type == "click", "cents"].values
    comb = pd.Series(np.concatenate([p, c]))
    ranks = comb.rank(method="average").values
    n1, n2 = len(p), len(c)
    r1 = ranks[:n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2
    nn = n1 + n2
    _, t = np.unique(comb.values, return_counts=True)
    tie3 = float((t.astype(float) ** 3 - t).sum())
    var = n1 * n2 / 12.0 * ((nn + 1) - tie3 / (nn * (nn - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    assert out.n_purchase == n1 and out.n_click == n2
    assert out.u_stat == u1
    assert abs(out.auc - u1 / (n1 * n2)) < 2e-6
    assert abs(out.z - z) < 2e-6
    # AUC and U are the same statistic on two scales
    assert 0.0 <= out.auc <= 1.0


def test_cliffs_delta_brute(spark):
    out = q_cliffs_delta(spark, SF).toPandas().iloc[0]
    e = _events()
    p = e.loc[e.event_type == "purchase", "cents"].values
    c = e.loc[e.event_type == "click", "cents"].values
    gt = int((p[:, None] > c[None, :]).sum())
    lt = int((p[:, None] < c[None, :]).sum())
    eq = int((p[:, None] == c[None, :]).sum())
    delta = (gt - lt) / (len(p) * len(c))
    assert out.n_gt == gt and out.n_lt == lt and out.n_eq == eq
    assert abs(out.delta - delta) < 2e-6
    lab = (
        "negligible" if abs(delta) < 0.147
        else "small" if abs(delta) < 0.33
        else "medium" if abs(delta) < 0.474
        else "large"
    )
    assert out.magnitude == lab
    # consistency with the Mann-Whitney AUC: delta = 2*AUC - 1
    mw = q_mann_whitney(spark, SF).toPandas().iloc[0]
    assert abs(out.delta - (2 * mw.auc - 1)) < 4e-6


def test_levene_bf_brute(spark):
    out = q_levene_bf(spark, SF).toPandas().set_index("event_type")
    e = _events()
    groups = {}
    for et, g in e.groupby("event_type"):
        v = np.sort(g.cents.values)
        n = len(v)
        med2 = int(v[(n + 1) // 2 - 1]) + int(v[n // 2])
        z = np.abs(2 * g.cents.values - med2)
        groups[et] = z
        r = out.loc[et]
        assert r.n == n
        assert r.median_value == med2 / 200.0
        assert abs(r.mean_absdev - z.mean() / 200.0) < 2e-6
    k = len(groups)
    nn = sum(len(z) for z in groups.values())
    gm = sum(z.sum() for z in groups.values()) / nn
    ssb = sum(len(z) * (z.mean() - gm) ** 2 for z in groups.values())
    ssw = sum(((z - z.mean()) ** 2).sum() for z in groups.values())
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    r0 = out.iloc[0]
    assert r0.k_groups == k and r0.n_total == nn
    assert abs(r0.f_stat - f) < max(2e-6, abs(f) * 1e-9)
    assert (out.f_stat == r0.f_stat).all()


def test_pacf_daily_brute(spark):
    out = q_pacf_daily(spark, SF).toPandas().set_index("event_type")
    e = _events()
    days, daily = _daily(e)
    for et, c in daily.items():
        n = len(c)
        d = c - c.mean()
        den = (d * d).sum()
        r1 = (d[:-1] * d[1:]).sum() / den
        r2 = (d[:-2] * d[2:]).sum() / den
        pacf2 = (r2 - r1 * r1) / (1 - r1 * r1)
        r = out.loc[et]
        assert r.n_days == n
        assert abs(r.acf1 - r1) < 2e-6
        assert abs(r.acf2 - r2) < 2e-6
        assert abs(r.pacf2 - pacf2) < 2e-6


def test_ljung_box_brute(spark):
    out = q_ljung_box(spark, SF).toPandas()
    e = _events()
    days, daily = _daily(e)
    for et, c in daily.items():
        n = len(c)
        d = c - c.mean()
        den = (d * d).sum()
        q = 0.0
        sub = out[out.event_type == et].set_index("lag")
        assert set(sub.index) == {1, 2, 3, 4, 5}
        for k in range(1, 6):
            rk = (d[:-k] * d[k:]).sum() / den
            q += rk * rk / (n - k)
            row = sub.loc[k]
            assert row.n_days == n
            assert abs(row.acf - rk) < 2e-6
            assert abs(row.q_cum - n * (n + 2) * q) < 2e-6
        # Q is monotone nondecreasing in the lag
        assert (np.diff(sub.sort_index().q_cum.values) >= -1e-9).all()


def _xi(x, y, day):
    n = len(x)
    order = np.lexsort((day, x))
    yo = y[order]
    r = np.array([(y <= v).sum() for v in yo], dtype=np.int64)
    ell = np.array([(y >= v).sum() for v in yo], dtype=np.int64)
    sum_dr = int(np.abs(np.diff(r)).sum())
    denom = int(2 * (ell * (n - ell)).sum())
    return sum_dr, denom, 1.0 - n * sum_dr / denom


def test_chatterjee_xi_brute(spark):
    out = q_chatterjee_xi(spark, SF).toPandas().set_index("pair")
    e = _events()
    days, daily = _daily(e)
    y = daily["purchase"]
    for pair in ["click", "view"]:
        x = daily[pair]
        sum_dr, denom, xi = _xi(x, y, days)
        r = out.loc[pair]
        assert r.n_days == len(days)
        assert r.sum_dr == sum_dr
        assert r.denom == denom
        assert abs(r.xi - xi) < 2e-6
    # xi of a noiseless monotone function is maximal for the sample
    d = np.arange(1, 21)
    sd, dn, hi = _xi(d, d * 2, d)
    assert hi > 0.8
