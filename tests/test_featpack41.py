"""Semantic tests for feature-eng pack #41: Cronbach's alpha, ICC /
design effect, exponential Q-Q probe, Weibull median-rank fit,
Good-Turing smoothing head, CUPED variance reduction (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_cronbach_alpha,
    q_cuped_adjust,
    q_good_turing,
    q_icc_design_effect,
    q_qq_exponential,
    q_weibull_fit,
)

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
    )


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_cronbach_alpha_brute(spark):
    out = q_cronbach_alpha(spark, SF).toPandas().set_index("event_type")
    e = _events()
    mat = (
        e.pivot_table(
            index="user_id",
            columns="event_type",
            values="cents",
            aggfunc="sum",
            fill_value=0,
        )
        / 100.0
    )
    k = mat.shape[1]
    var_items = mat.var(axis=0, ddof=0)
    var_total = mat.sum(axis=1).var(ddof=0)
    alpha = k / (k - 1) * (1 - var_items.sum() / var_total)
    for et in mat.columns:
        r = out.loc[et]
        assert r.k == k
        assert r.n_users == mat.shape[0]
        assert r.n_users_present == (mat[et] != 0).sum() or (
            r.n_users_present >= (mat[et] != 0).sum()
        )  # zero-sum users still count as present
        assert abs(r.var_item - _r6(var_items[et])) < 2e-6
        assert abs(r.alpha - _r6(alpha)) < 2e-6
    assert out.alpha.iloc[0] <= 1.0 + 1e-9


def test_icc_design_effect_brute(spark):
    out = (
        q_icc_design_effect(spark, SF).toPandas().set_index("event_type")
    )
    e = _events()
    for et, g in e.groupby("event_type"):
        groups = [
            grp.value.to_numpy(dtype=float)
            for _, grp in g.groupby("user_id")
        ]
        gcount = len(groups)
        n = sum(len(x) for x in groups)
        grand = sum(x.sum() for x in groups) / n
        ssb = sum(len(x) * (x.mean() - grand) ** 2 for x in groups)
        ssw = sum(((x - x.mean()) ** 2).sum() for x in groups)
        msb = ssb / (gcount - 1)
        msw = ssw / (n - gcount)
        k0 = (n - sum(len(x) ** 2 for x in groups) / n) / (gcount - 1)
        icc = (msb - msw) / (msb + (k0 - 1) * msw)
        deff = 1 + (k0 - 1) * icc
        r = out.loc[et]
        assert r.n_users == gcount and r.n_events == n
        assert abs(r.msb - _r6(msb)) < 5e-5
        assert abs(r.msw - _r6(msw)) < 5e-5
        assert abs(r.icc - _r6(icc)) < 2e-6
        assert abs(r.deff - _r6(deff)) < 2e-6
        assert -1.0 <= r.icc <= 1.0 + 1e-9


def _gaps(e):
    out = {}
    for et, g in e.groupby("event_type"):
        g = g.sort_values(["us", "event_id"])
        gap = g.us.diff().dropna().astype("int64")
        ids = g.event_id.iloc[1:]
        out[et] = pd.DataFrame({"gap_us": gap.values, "event_id": ids.values})
    return out


def test_qq_exponential_brute(spark):
    out = q_qq_exponential(spark, SF).toPandas()
    e = _events()
    for et, gp in _gaps(e).items():
        gp = gp.sort_values(["gap_us", "event_id"]).reset_index(drop=True)
        n = len(gp)
        mean_gap = gp.gap_us.mean()
        sub = out[out.event_type == et].set_index("j")
        assert len(sub) == 19
        for j in range(1, 20):
            rn = (j * n + 19) // 20
            emp = gp.gap_us.iloc[rn - 1] / 1e6
            theo = -math.log(1 - j / 20.0) * mean_gap / 1e6
            r = sub.loc[j]
            assert abs(r.p - _r6(j / 20.0)) < 1e-12
            assert abs(r.emp_q_sec - _r6(emp)) < 2e-6
            assert abs(r.theo_q_sec - _r6(theo)) < 2e-6
            assert abs(r.qq_ratio - _r6(emp / theo)) < 2e-5
        # empirical ventiles are monotone nondecreasing
        assert (sub.sort_index().emp_q_sec.diff().dropna() >= -1e-9).all()


def test_weibull_fit_brute(spark):
    out = q_weibull_fit(spark, SF).toPandas().set_index("event_type")
    e = _events()
    for et, gp in _gaps(e).items():
        nz = int((gp.gap_us == 0).sum())
        pos = gp[gp.gap_us > 0].sort_values(["gap_us", "event_id"])
        n = len(pos)
        x = np.log(pos.gap_us.to_numpy(dtype=float) / 1e6)
        i = np.arange(1, n + 1)
        fi = (i - 0.3) / (n + 0.4)
        y = np.log(-np.log(1 - fi))
        sx, sy = x.sum(), y.sum()
        sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        scale = math.exp(-intercept / slope)
        r2 = (n * sxy - sx * sy) ** 2 / (
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        r = out.loc[et]
        assert r.n_gaps == n and r.n_zero == nz
        assert abs(r.shape_k - _r6(slope)) < 5e-6
        assert abs(r.scale_sec - _r6(scale)) < max(5e-6, scale * 1e-5)
        assert abs(r.r2 - _r6(r2)) < 5e-6
        assert 0.0 <= r.r2 <= 1.0 + 1e-9
        assert r.shape_k > 0  # gaps are positive-supported


def test_good_turing_brute(spark):
    out = q_good_turing(spark, SF).toPandas()
    d = _docs()
    for src, g in d.groupby("source"):
        cnt: Counter = Counter()
        for t in g.text:
            cnt.update(w for w in t.strip().split() if w)
        spec = Counter(cnt.values())
        n_tokens = sum(cnt.values())
        n1 = spec.get(1, 0)
        sub = out[out.source == src].set_index("r")
        for r_ in range(1, 6):
            if spec.get(r_, 0) == 0:
                assert r_ not in sub.index
                continue
            row = sub.loc[r_]
            assert row.n_r == spec[r_]
            assert row.n_r_next == spec.get(r_ + 1, 0)
            r_star = (r_ + 1) * spec.get(r_ + 1, 0) / spec[r_]
            assert abs(row.r_star - _r6(r_star)) < 2e-6
            assert abs(row.p0_unseen - _r6(n1 / n_tokens)) < 2e-6
            # Good-Turing discounts natural text: r* < r+1 always
            assert row.r_star <= r_ + 1 + 1e-9


def test_cuped_adjust_brute(spark):
    out = q_cuped_adjust(spark, SF).toPandas()
    e = _events().sort_values(["us", "event_id"]).reset_index(drop=True)
    n = len(e)
    med_us = e.us.iloc[(n + 1) // 2 - 1]
    pre = e[e.us <= med_us].groupby("user_id").cents.sum() / 100.0
    post = e[e.us > med_us].groupby("user_id").cents.sum() / 100.0
    users = sorted(set(e.user_id))
    x = np.array([pre.get(u, 0.0) for u in users])
    y = np.array([post.get(u, 0.0) for u in users])
    cov = (x * y).mean() - x.mean() * y.mean()
    vx = (x * x).mean() - x.mean() ** 2
    vy = (y * y).mean() - y.mean() ** 2
    theta = cov / vx
    var_adj = vy - cov * cov / vx
    red = cov * cov / (vx * vy)
    r = out.iloc[0]
    assert len(out) == 1
    assert r.n_users == len(users)
    assert abs(r.theta - _r6(theta)) < 2e-6
    assert abs(r.var_post - _r6(vy)) < 5e-5
    assert abs(r.var_adj - _r6(var_adj)) < 5e-5
    assert abs(r.var_reduction - _r6(red)) < 2e-6
    # adjustment can only reduce variance
    assert r.var_adj <= r.var_post + 1e-9
    assert 0.0 <= r.var_reduction <= 1.0 + 1e-9
