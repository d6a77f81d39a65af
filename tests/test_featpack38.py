"""Semantic tests for feature-eng pack #38: user-mix KL divergence,
order-statistic median CI, WoE/IV screening, activity half-life,
negative-binomial MoM fit, and exponential recency score (brute
python replicas; cross-engine parity is proven by the check_entry
sweeps)."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_half_activity_day,
    q_median_ci,
    q_negbin_fit,
    q_recency_score,
    q_user_mix_kl,
    q_woe_iv,
)

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
        day=lambda x: x.ts.dt.date,
        cents=lambda x: round(x.value * 100).astype("int64"),
    )


def test_user_mix_kl_brute(spark):
    out = q_user_mix_kl(spark, SF).toPandas().set_index("user_id")
    e = _events()
    gl = Counter(e.event_type)
    n_all = len(e)
    for uid, g in e.groupby("user_id"):
        cu = Counter(g.event_type)
        nu = len(g)
        kl = sum(
            (c / nu) * math.log((c / nu) / (gl[t] / n_all))
            for t, c in cu.items()
        )
        row = out.loc[uid]
        assert row.n_events == nu
        assert row.n_types == len(cu)
        assert abs(row.kl_nats - _r6(kl)) < 2e-6
        assert row.kl_nats >= -1e-9  # KL is nonnegative
    assert len(out) == e.user_id.nunique()


def test_median_ci_brute(spark):
    out = q_median_ci(spark, SF).toPandas().set_index("event_type")
    e = _events()
    for et, g in e.groupby("event_type"):
        xs = sorted(zip(g.cents, g.event_id))
        n = len(xs)
        lo = max(1, math.floor((n - 1.96 * math.sqrt(n)) / 2.0))
        hi = n + 1 - lo
        med = (n + 1) // 2
        row = out.loc[et]
        assert row.n_events == n
        assert row.rank_lo == lo and row.rank_hi == hi
        assert abs(row.ci_lo - _r6(xs[lo - 1][0] / 100.0)) < 1e-12
        assert abs(row["median"] - _r6(xs[med - 1][0] / 100.0)) < 1e-12
        assert abs(row.ci_hi - _r6(xs[hi - 1][0] / 100.0)) < 1e-12
        assert row.ci_lo <= row["median"] <= row.ci_hi


def test_woe_iv_brute(spark):
    out = q_woe_iv(spark, SF).toPandas().set_index("bucket")
    e = _events()
    edges = [
        float(np.percentile(e.cents, q, method="linear"))
        for q in range(10, 100, 10)
    ]
    n_pos = Counter()
    n_neg = Counter()
    for c, et in zip(e.cents, e.event_type):
        b = 1 + sum(c > t for t in edges)
        if et == "purchase":
            n_pos[b] += 1
        else:
            n_neg[b] += 1
    g = sum(n_pos.values())
    b_tot = sum(n_neg.values())
    assert set(out.index) == set(n_pos) | set(n_neg)
    iv = 0.0
    for bk in out.index:
        p, q = n_pos[bk], n_neg[bk]
        woe = math.log(((p + 0.5) / g) / ((q + 0.5) / b_tot))
        term = (p / g - q / b_tot) * woe
        iv += term
        row = out.loc[bk]
        assert row.n == p + q
        assert row.n_pos == p and row.n_neg == q
        assert abs(row.woe - _r6(woe)) < 2e-6
        assert abs(row.iv_term - _r6(term)) < 2e-6
    # totals reconcile with the corpus
    assert out.n.sum() == len(e)


def test_half_activity_day_brute(spark):
    out = q_half_activity_day(spark, SF).toPandas().set_index("user_id")
    e = _events()
    for uid, g in e.groupby("user_id"):
        daily = g.groupby("day").size().sort_index()
        total = int(daily.sum())
        cum = 0
        dh = None
        for d, c in daily.items():
            cum += c
            if 2 * cum >= total:
                dh = d
                break
        d0, d1 = daily.index.min(), daily.index.max()
        row = out.loc[uid]
        assert row.n_days == len(daily)
        assert row.total_events == total
        assert row.days_to_half == (dh - d0).days
        assert row.span_days == (d1 - d0).days
        if (d1 - d0).days > 0:
            assert abs(
                row.half_frac - _r6((dh - d0).days / (d1 - d0).days)
            ) < 1e-12
            assert -1e-9 <= row.half_frac <= 1.0 + 1e-9
        else:
            assert pd.isna(row.half_frac)
    assert len(out) == e.user_id.nunique()


def test_negbin_fit_brute(spark):
    out = q_negbin_fit(spark, SF).toPandas().set_index("event_type")
    e = _events()
    for et, g in e.groupby("event_type"):
        cs = g.groupby("day").size().tolist()
        n = len(cs)
        mu = sum(cs) / n
        vv = (n * sum(c * c for c in cs) - sum(cs) ** 2) / (n * n)
        row = out.loc[et]
        assert row.n_days == n
        assert abs(row.mean_daily - _r6(mu)) < 1e-9
        assert abs(row.var_daily - _r6(vv)) < 1e-9
        if vv > mu:
            assert abs(row.nb_r - _r6(mu * mu / (vv - mu))) < 2e-6
            assert abs(row.nb_p - _r6(mu / vv)) < 2e-6
            assert 0 < row.nb_p <= 1.0 + 1e-9
        else:
            assert pd.isna(row.nb_r) and pd.isna(row.nb_p)
    assert len(out) == e.event_type.nunique()


def test_recency_score_brute(spark):
    out = q_recency_score(spark, SF).toPandas().set_index("user_id")
    e = _events()
    snap = int(e.us.max())
    day_us = 86_400_000_000
    for uid, g in e.groupby("user_id"):
        ages = [(snap - u) // day_us for u in g.us]
        score = sum(0.5 ** (a / 7.0) for a in ages)
        row = out.loc[uid]
        assert row.n_events == len(g)
        assert row.last_age_days == min(ages)
        assert abs(row.recency_score - _r6(score)) < 2e-6
        # score is bounded by n and decays with age
        assert 0 < row.recency_score <= len(g) + 1e-9
    assert len(out) == e.user_id.nunique()
