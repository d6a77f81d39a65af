"""Semantic tests for feature-eng pack #51: diff-in-diff, SRM check,
MDE/power table, covariate balance, effect trend, retention by arm
(brute python replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_covariate_balance,
    q_diff_in_diff,
    q_effect_trend,
    q_mde_power,
    q_retention_by_arm,
    q_srm_check,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        day=lambda x: x.ts.dt.day,
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
        arm=lambda x: x.user_id % 2,
        buy=lambda x: (x.event_type == "purchase").astype(int),
    )


def test_diff_in_diff_brute(spark):
    out = q_diff_in_diff(spark, SF).toPandas().iloc[0]
    e = _events()
    e = e[(e.day <= 7) | ((e.day >= 22) & (e.day <= 28))].assign(
        wk=lambda x: np.where(x.day <= 7, 1, 4)
    )
    rate, var = {}, 0.0
    for arm in (0, 1):
        for wk in (1, 4):
            g = e[(e.arm == arm) & (e.wk == wk)]
            p = g.buy.sum() / len(g)
            rate[(arm, wk)] = p
            var += p * (1 - p) / len(g)
    did = (rate[(1, 4)] - rate[(1, 1)]) - (
        rate[(0, 4)] - rate[(0, 1)]
    )
    assert abs(out.control_w1 - rate[(0, 1)]) < 2e-6
    assert abs(out.treat_w4 - rate[(1, 4)]) < 2e-6
    assert abs(out.did_estimate - did) < 2e-6
    assert abs(out.se_did - math.sqrt(var)) < 2e-6
    assert abs(out.z - did / math.sqrt(var)) < 2e-6


def test_srm_check_brute(spark):
    out = q_srm_check(spark, SF).toPandas().set_index("day")
    e = _events()
    du = e[["day", "user_id"]].drop_duplicates()
    for day, g in du.groupby("day"):
        n1 = int((g.user_id % 2 == 1).sum())
        n0 = len(g) - n1
        r = out.loc[day]
        assert r.n0 == n0 and r.n1 == n1
        assert abs(r.z_srm - (n1 - n0) / math.sqrt(n1 + n0)) < 2e-6
    # deterministic 50/50 arms: no day should be wildly mismatched
    assert out.z_srm.abs().max() < 6


def test_mde_power_brute(spark):
    out = q_mde_power(spark, SF).toPandas().set_index("event_type")
    e = _events()
    nu = e.user_id.nunique()
    n_treat = int(
        pd.Series(e.user_id.unique()).mod(2).sum()
    )
    for et, g in e.groupby("event_type"):
        p = g.user_id.nunique() / nu
        mde = (1.96 + 0.8416) * math.sqrt(2 * p * (1 - p) / n_treat)
        r = out.loc[et]
        assert r.n_users == nu
        assert r.n_conv == g.user_id.nunique()
        assert abs(r.base_rate - p) < 2e-6
        assert abs(r.mde_abs - mde) < 2e-6
        assert abs(r.mde_rel - mde / p) < 2e-6


def test_covariate_balance_brute(spark):
    out = q_covariate_balance(spark, SF).toPandas().set_index(
        "covariate"
    )
    e = _events()
    pre = e[e.day <= 7]
    pu = pre.groupby("user_id").agg(
        w1_events=("cents", "size"),
        w1_cents=("cents", "sum"),
        w1_active_days=("day", "nunique"),
    )
    arms = pu.index % 2
    for cov in ("w1_events", "w1_cents", "w1_active_days"):
        x0 = pu.loc[arms == 0, cov].values.astype(float)
        x1 = pu.loc[arms == 1, cov].values.astype(float)
        smd = (x1.mean() - x0.mean()) / math.sqrt(
            (x0.var(ddof=1) + x1.var(ddof=1)) / 2.0
        )
        r = out.loc[cov]
        assert r.n0 == len(x0) and r.n1 == len(x1)
        assert abs(r.mean_control - x0.mean()) < 2e-6
        assert abs(r.mean_treat - x1.mean()) < 2e-6
        assert abs(r.smd - smd) < 2e-6


def test_effect_trend_brute(spark):
    out = q_effect_trend(spark, SF).toPandas().set_index("week")
    e = _events()
    e = e[e.day <= 28].assign(wk=lambda x: (x.day - 1) // 7 + 1)
    gaps = {}
    for wk, g in e.groupby("wk"):
        rc = g[g.arm == 0].buy.mean()
        rt = g[g.arm == 1].buy.mean()
        gaps[wk] = (rc, rt, rt - rc)
        r = out.loc[wk]
        assert abs(r.rate_control - rc) < 2e-6
        assert abs(r.rate_treat - rt) < 2e-6
        assert abs(r.effect_gap - (rt - rc)) < 2e-6
    xs = np.array(sorted(gaps))
    ys = np.array([gaps[w][2] for w in xs])
    k = len(xs)
    slope = (k * (xs * ys).sum() - xs.sum() * ys.sum()) / (
        k * (xs * xs).sum() - xs.sum() ** 2
    )
    assert (out.effect_slope - slope).abs().max() < 2e-6


def test_retention_by_arm_brute(spark):
    out = q_retention_by_arm(spark, SF).toPandas().iloc[0]
    e = _events()
    pu = e.groupby("user_id").agg(
        first_us=("us", "min"),
        last_us=("us", "max"),
        first_day=("day", "min"),
    )
    cohort = pu[pu.first_day <= 7]
    ret = (
        cohort.last_us - cohort.first_us >= 7 * 86400 * 1_000_000
    ).astype(int)
    arms = cohort.index % 2
    n0, n1 = int((arms == 0).sum()), int((arms == 1).sum())
    r0, r1 = int(ret[arms == 0].sum()), int(ret[arms == 1].sum())
    p0, p1 = r0 / n0, r1 / n1
    pool = (r0 + r1) / (n0 + n1)
    var = pool * (1 - pool) * (1 / n0 + 1 / n1)
    assert out.n0 == n0 and out.n1 == n1
    assert abs(out.retention_control - p0) < 2e-6
    assert abs(out.retention_treat - p1) < 2e-6
    if var == 0:
        # degenerate cohort (everyone or no one retained): the
        # query's nullif guard must yield NULL, not crash — the
        # sf0.001 tier hits exactly this
        assert pd.isna(out.z)
    else:
        assert abs(out.z - (p1 - p0) / math.sqrt(var)) < 2e-6
    assert 0.0 <= out.retention_control <= 1.0
