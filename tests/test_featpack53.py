"""Semantic tests for feature-eng pack #53: daily CCF, partial
correlation, day-of-week strength, burst intervals, WoW retention,
paired sign test (brute python replicas; cross-engine parity is
proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_burst_intervals,
    q_ccf_daily,
    q_dow_strength,
    q_partial_corr_daily,
    q_sign_test,
    q_wow_retention,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        day=lambda x: x.ts.dt.day,
    )


def _daily(e, et):
    days = np.sort(e.day.unique())
    cd = e[e.event_type == et].groupby("day").size()
    return np.array([cd.get(d, 0) for d in days], dtype=np.int64)


def test_ccf_daily_brute(spark):
    out = q_ccf_daily(spark, SF).toPandas().set_index("lag")
    e = _events()
    x = _daily(e, "click").astype(float)
    y = _daily(e, "purchase").astype(float)
    dx, dy = x - x.mean(), y - y.mean()
    denom = math.sqrt((dx * dx).sum() * (dy * dy).sum())
    assert set(out.index) == set(range(-3, 4))
    for lag in range(-3, 4):
        # ccf(lag) pairs x_t with y_{t+lag}
        if lag >= 0:
            num = (dx[: len(dx) - lag] * dy[lag:]).sum()
        else:
            num = (dx[-lag:] * dy[: len(dy) + lag]).sum()
        assert abs(out.loc[lag, "ccf"] - num / denom) < 2e-6
    assert out.ccf.abs().max() <= 1.0 + 1e-9


def test_partial_corr_brute(spark):
    out = q_partial_corr_daily(spark, SF).toPandas().iloc[0]
    e = _events()
    x = _daily(e, "click").astype(float)
    y = _daily(e, "purchase").astype(float)
    z = _daily(e, "view").astype(float)

    def r(a, b):
        return float(np.corrcoef(a, b)[0, 1])

    rxy, rxz, ryz = r(x, y), r(x, z), r(y, z)
    pr = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz**2) * (1 - ryz**2)
    )
    assert out.n_days == len(x)
    assert abs(out.r_click_purchase - rxy) < 2e-6
    assert abs(out.r_click_view - rxz) < 2e-6
    assert abs(out.r_purchase_view - ryz) < 2e-6
    assert abs(out.partial_r - pr) < 2e-6
    assert -1.0 - 1e-9 <= out.partial_r <= 1.0 + 1e-9


def test_dow_strength_brute(spark):
    out = q_dow_strength(spark, SF).toPandas().set_index("event_type")
    e = _events()
    dow = e.groupby("day").ts.first().dt.dayofweek
    days = np.sort(e.day.unique())
    for et in e.event_type.unique():
        c = _daily(e, et).astype(float)
        dows = np.array([dow[d] for d in days])
        gm = c.mean()
        ss_tot = ((c - gm) ** 2).sum()
        ss_b = sum(
            (c[dows == w].mean() - gm) ** 2 * (dows == w).sum()
            for w in np.unique(dows)
        )
        r = out.loc[et]
        assert r.n_days == len(c)
        assert abs(r.dow_r2 - ss_b / ss_tot) < 2e-6
        assert -1e-9 <= r.dow_r2 <= 1.0 + 1e-9


def test_burst_intervals_brute(spark):
    out = q_burst_intervals(spark, SF).toPandas()
    e = _events()
    days = np.sort(e.day.unique())
    expected = []
    for et in e.event_type.unique():
        c = _daily(e, et).astype(float)
        thr = c.mean() + 2 * c.std(ddof=1)
        flag = c > thr
        start = None
        for i, f in enumerate(flag):
            if f and start is None:
                start = i
            if (not f or i == len(flag) - 1) and start is not None:
                end = i if f else i - 1
                run = c[start: end + 1]
                expected.append(
                    (et, days[start], days[end], end - start + 1,
                     int(run.max()))
                )
                start = None
    got = set(
        map(
            tuple,
            out[
                ["event_type", "burst_start", "burst_end",
                 "burst_days", "peak_count"]
            ].itertuples(index=False),
        )
    )
    assert got == set(expected)


def test_wow_retention_brute(spark):
    out = q_wow_retention(spark, SF).toPandas().set_index("week")
    e = _events()
    e = e[e.day <= 28].assign(wk=lambda x: (x.day - 1) // 7 + 1)
    pres = {
        w: set(e.loc[e.wk == w, "user_id"]) for w in range(1, 5)
    }
    for w in range(1, 4):
        kept = len(pres[w] & pres[w + 1])
        r = out.loc[w]
        assert r.n_active == len(pres[w])
        assert r.n_retained == kept
        assert abs(r.wow_retention - kept / len(pres[w])) < 2e-6
        assert 0.0 <= r.wow_retention <= 1.0


def test_sign_test_brute(spark):
    out = q_sign_test(spark, SF).toPandas().iloc[0]
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
    up = int((pu.w4 > pu.w1).sum())
    down = int((pu.w4 < pu.w1).sum())
    tied = int((pu.w4 == pu.w1).sum())
    assert out.n_users == len(pu)
    assert (out.n_up, out.n_down, out.n_tied) == (up, down, tied)
    z = (2 * up - (up + down)) / math.sqrt(up + down)
    assert abs(out.z - z) < 2e-6
    # sanity: counts partition the users
    assert up + down + tied == len(pu)
