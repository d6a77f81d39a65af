"""Semantic tests for feature-eng pack #55: growth accounting,
power-user curve, diversified top-k, band-anomaly days, rank
stability, conversion-lag histogram (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_band_anomaly_days,
    q_conversion_lag_hist,
    q_diverse_topk,
    q_growth_accounting,
    q_power_user_curve,
    q_rank_stability,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        day=lambda x: x.ts.dt.day,
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
    )


def test_growth_accounting_brute(spark):
    out = q_growth_accounting(spark, SF).toPandas().set_index("week")
    e = _events()
    e = e[e.day <= 28].assign(wk=lambda x: (x.day - 1) // 7 + 1)
    pres = {w: set(e.loc[e.wk == w, "user_id"]) for w in range(1, 5)}
    seen = set(pres[1])
    for w in range(2, 5):
        new = pres[w] - seen
        retained = pres[w] & pres[w - 1]
        resurrected = (pres[w] & seen) - pres[w - 1]
        churned = pres[w - 1] - pres[w]
        r = out.loc[w]
        assert r.n_active == len(pres[w])
        assert r.n_new == len(new)
        assert r.n_retained == len(retained)
        assert r.n_resurrected == len(resurrected)
        assert r.n_churned == len(churned)
        # the identity: actives decompose exactly
        assert (
            len(new) + len(retained) + len(resurrected)
            == len(pres[w])
        )
        qr = (len(new) + len(resurrected) - len(churned)) / len(
            pres[w]
        )
        assert abs(r.quick_ratio_delta - qr) < 2e-6
        seen |= pres[w]


def test_power_user_curve_brute(spark):
    out = q_power_user_curve(spark, SF).toPandas().set_index(
        "day_bucket"
    )
    e = _events()
    days = e.groupby("user_id").day.nunique()

    def bucket(d):
        if d == 1:
            return "01"
        if d <= 3:
            return "02-03"
        if d <= 7:
            return "04-07"
        if d <= 14:
            return "08-14"
        return "15+"

    b = days.map(bucket)
    tot = len(days)
    for lab in b.unique():
        r = out.loc[lab]
        assert r.n_users == int((b == lab).sum())
        assert r.active_days == int(days[b == lab].sum())
        assert abs(r.user_share - (b == lab).sum() / tot) < 2e-6
    assert out.n_users.sum() == tot


def test_diverse_topk_brute(spark):
    out = q_diverse_topk(spark, SF).toPandas()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    d = d.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    )
    d["src_rank"] = d.groupby("source").cumcount() + 1
    capped = d[d.src_rank <= 2].head(10).reset_index(drop=True)
    assert len(out) == 10
    out = out.sort_values("rk").reset_index(drop=True)
    for i in range(10):
        assert out.doc_id[i] == capped.doc_id.iloc[i]
        assert out.src_rank[i] == capped.src_rank.iloc[i]
    # the cap holds: no source appears more than twice
    assert out.groupby("source").size().max() <= 2


def test_band_anomaly_days_brute(spark):
    out = q_band_anomaly_days(spark, SF).toPandas()
    e = _events()
    days = np.sort(e.day.unique())
    expected = set()
    for et in e.event_type.unique():
        cd = e[e.event_type == et].groupby("day").size()
        c = np.array([cd.get(d, 0) for d in days])
        order = np.lexsort((days, c))
        n = len(c)
        p10 = c[order][(10 * n + 99) // 100 - 1]
        p90 = c[order][(90 * n + 99) // 100 - 1]
        for d, x in zip(days, c):
            if x < p10 or x > p90:
                expected.add(
                    (et, d, x, p10, p90, "high" if x > p90 else "low")
                )
    got = set(
        map(
            tuple,
            out[
                ["event_type", "day", "count", "band_lo", "band_hi",
                 "side"]
            ].itertuples(index=False),
        )
    )
    assert got == expected


def test_rank_stability_brute(spark):
    out = q_rank_stability(spark, SF).toPandas().iloc[0]
    e = _events()
    e = e[(e.day <= 7) | ((e.day >= 22) & (e.day <= 28))]
    pu = e.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "w1": g.loc[g.day <= 7, "cents"].sum(),
                "w4": g.loc[g.day >= 22, "cents"].sum(),
            }
        ),
        include_groups=False,
    )
    pu = pu[(pu.w1 > 0) & (pu.w4 > 0)]
    r1 = pu.w1.rank(method="average")
    r4 = pu.w4.rank(method="average")
    rho = float(np.corrcoef(r1, r4)[0, 1])
    assert out.n_users == len(pu)
    assert abs(out.spearman_w1_w4 - rho) < 2e-6
    assert -1.0 <= out.spearman_w1_w4 <= 1.0


def test_conversion_lag_hist_brute(spark):
    out = q_conversion_lag_hist(spark, SF).toPandas().set_index(
        "lag_bucket"
    )
    e = _events()
    pu = e.groupby("user_id").agg(
        first_us=("us", "min"),
    )
    buys = (
        e[e.event_type == "purchase"].groupby("user_id").us.min()
    )
    lag = (buys - pu.loc[buys.index, "first_us"]).values

    def bucket(x):
        if x < 3_600_000_000:
            return "a_<1h"
        if x < 86_400_000_000:
            return "b_1-24h"
        if x < 259_200_000_000:
            return "c_1-3d"
        if x < 604_800_000_000:
            return "d_3-7d"
        return "e_7d+"

    b = pd.Series([bucket(x) for x in lag])
    for lab in b.unique():
        r = out.loc[lab]
        assert r.n_users == int((b == lab).sum())
        assert abs(r.share - (b == lab).sum() / len(b)) < 2e-6
    assert out.n_users.sum() == len(b)
