"""Semantic tests for feature-eng pack #47: Nelson-Aalen hazard,
interpolated percentiles, mix/rate decomposition, binary-segmentation
changepoint, Poisson bootstrap, DAU/MAU stickiness (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_binseg_sse,
    q_dau_mau,
    q_mix_rate_decomp,
    q_nelson_aalen,
    q_percentile_interp,
    q_poisson_bootstrap,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        day=lambda x: x.ts.dt.day,
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
    )


def test_nelson_aalen_brute(spark):
    out = q_nelson_aalen(spark, SF).toPandas()
    e = _events().sort_values(["user_id", "us", "event_id"])
    rows = []
    for uid, g in e.groupby("user_id"):
        t0 = g.us.iloc[0]
        buys = g.loc[g.event_type == "purchase", "us"]
        t = (buys.min() if len(buys) else g.us.max()) - t0
        rows.append((uid % 2, t, int(len(buys) > 0)))
    dur = pd.DataFrame(rows, columns=["g", "t", "ev"])
    for arm, da in dur.groupby("g"):
        bt = (
            da.groupby("t")
            .agg(d=("ev", "sum"), x=("ev", "size"))
            .sort_index()
        )
        bt["n"] = bt.x[::-1].cumsum()[::-1]
        bt = bt[bt.d > 0]
        h = (bt.d / bt.n).cumsum()
        sub = out[out.arm == arm].set_index("t_us").sort_index()
        assert list(sub.index) == list(bt.index)
        for t in bt.index:
            assert sub.loc[t, "d"] == bt.loc[t, "d"]
            assert sub.loc[t, "n"] == bt.loc[t, "n"]
            assert abs(sub.loc[t, "hazard_cum"] - h[t]) < 2e-6
        # cumulative hazard is nondecreasing
        assert (np.diff(sub.hazard_cum.values) >= -1e-9).all()


def test_percentile_interp_brute(spark):
    out = (
        q_percentile_interp(spark, SF).toPandas().set_index("p_pct")
    )
    e = _events()
    v = np.sort(e.loc[e.event_type == "purchase", "cents"].values)
    n = len(v)
    for p in [5, 25, 50, 75, 95]:
        pos100 = p * (n - 1)
        k, frac = divmod(pos100, 100)
        hi = v[min(k + 1, n - 1)]
        exact = (int(v[k]) * (100 - frac) + int(hi) * frac) / 10000.0
        r = out.loc[p]
        assert r.n_rows == n
        assert r.value_interp == exact
        # matches numpy's linear percentile to float precision
        npv = float(np.percentile(v, p, method="linear")) / 100.0
        assert abs(r.value_interp - npv) < 1e-9
    assert (np.diff(out.sort_index().value_interp.values) >= 0).all()


def test_mix_rate_decomp_brute(spark):
    out = q_mix_rate_decomp(spark, SF).toPandas().set_index("segment")
    e = _events()
    e = e[(e.day <= 7) | ((e.day >= 22) & (e.day <= 28))].assign(
        wk=lambda x: np.where(x.day <= 7, 1, 4),
        seg=lambda x: x.user_id % 4,
        buy=lambda x: (x.event_type == "purchase").astype(int),
    )
    tot_delta = 0.0
    eff_sum = 0.0
    for seg in range(4):
        sh, rt = {}, {}
        for wk in (1, 4):
            sub = e[e.wk == wk]
            g = sub[sub.seg == seg]
            sh[wk] = len(g) / len(sub)
            rt[wk] = g.buy.sum() / len(g)
        r = out.loc[seg]
        assert abs(r.share_w1 - sh[1]) < 2e-6
        assert abs(r.share_w4 - sh[4]) < 2e-6
        assert abs(r.rate_w1 - rt[1]) < 2e-6
        assert abs(r.rate_w4 - rt[4]) < 2e-6
        assert abs(r.mix_effect - (sh[4] - sh[1]) * rt[1]) < 2e-6
        assert abs(r.rate_effect - sh[1] * (rt[4] - rt[1])) < 2e-6
        assert (
            abs(r.interaction - (sh[4] - sh[1]) * (rt[4] - rt[1]))
            < 2e-6
        )
        eff_sum += (
            r.mix_effect + r.rate_effect + r.interaction
        )
    # the three effects bridge the full overall-rate delta
    for wk, sign in ((4, 1), (1, -1)):
        sub = e[e.wk == wk]
        tot_delta += sign * sub.buy.sum() / len(sub)
    assert abs(eff_sum - tot_delta) < 1e-4


def test_binseg_sse_brute(spark):
    out = q_binseg_sse(spark, SF).toPandas().set_index("event_type")
    e = _events()
    days = np.sort(e.day.unique())
    for et, g in e.groupby("event_type"):
        cd = g.groupby("day").size()
        c = np.array([cd.get(d, 0) for d in days], dtype=np.int64)
        n = len(c)
        s, q = int(c.sum()), int((c * c).sum())
        best, best_day = -1.0, None
        for i in range(1, n):
            s1 = int(c[:i].sum())
            between = s1 * s1 / i + (s - s1) ** 2 / (n - i)
            if between > best:
                best, best_day = between, days[i - 1]
        r = out.loc[et]
        assert r.split_after_day == best_day
        assert r.n_days == n
        assert abs(r.sse_total - (q - s * s / n)) < 2e-6
        assert abs(r.sse_reduction - (best - s * s / n)) < 2e-6
        assert -1e-9 <= r.sse_reduction <= r.sse_total + 1e-9


def _pois_w(event_id: int, b: int) -> int:
    h = hashlib.md5(f"{event_id}|{b}".encode()).hexdigest()
    u = int(h[:12], 16)
    if u < 103548857136060:
        return 0
    if u < 207097714272121:
        return 1
    if u < 258872142840152:
        return 2
    return 3


def test_poisson_bootstrap_brute(spark):
    out = q_poisson_bootstrap(spark, SF).toPandas().iloc[0]
    e = _events()
    p = e[e.event_type == "purchase"]
    means = []
    for b in range(20):
        s = n = 0
        for eid, c in zip(p.event_id, p.cents):
            w = _pois_w(int(eid), b)
            s += w * int(c)
            n += w
        means.append(s / (100.0 * n))
    m = np.array(means)
    se = m.std(ddof=1) / 1  # spread of replicate means IS the SE
    assert out.n_reps == 20
    assert abs(out.boot_mean - m.mean()) < 2e-6
    assert abs(out.boot_se - se) < 2e-6
    assert abs(out.ci_lo - (m.mean() - 1.96 * se)) < 2e-6
    assert abs(out.ci_hi - (m.mean() + 1.96 * se)) < 2e-6
    # the bootstrap CI brackets the plain sample mean
    plain = p.cents.mean() / 100.0
    assert out.ci_lo < plain < out.ci_hi


def test_dau_mau_brute(spark):
    out = q_dau_mau(spark, SF).toPandas().set_index("event_type")
    e = _events()
    n_days = e.day.nunique()
    for et, g in e.groupby("event_type"):
        mau = g.user_id.nunique()
        dau_sum = g.groupby("day").user_id.nunique().sum()
        r = out.loc[et]
        assert r.n_days == n_days
        assert r.mau == mau
        assert abs(r.avg_dau - dau_sum / n_days) < 2e-6
        assert abs(r.stickiness - dau_sum / n_days / mau) < 2e-6
        assert 0.0 < r.stickiness <= 1.0
