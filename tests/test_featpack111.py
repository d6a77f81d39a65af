"""Semantic tests for feature-eng pack #111: Erlang C, SLO burn
rate, capacity headroom (brute pandas replicas; cross-engine parity
is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _CAP_FACTOR,
    _EC_MU_DIV,
    _EC_SERVERS,
    _SLO_TARGET,
    q_capacity_headroom,
    q_erlang_c,
    q_slo_burn_rate,
)

SF = "/root/testdata/sf0.001"


def _hourly():
    e = pd.read_parquet(f"{SF}/events.parquet")
    h = e.ts.dt.floor("h")
    g = e.groupby(h).agg(
        n=("event_id", "size"),
        errs=("event_type", lambda s: int((s == "error").sum())),
    )
    return g.sort_index()


def test_erlang_c_brute(spark):
    out = q_erlang_c(spark, SF).toPandas().set_index("hod")
    h = _hourly().reset_index()
    h["hod"] = h.ts.dt.hour
    lam = h.groupby("hod")["n"].mean()
    mu = h.n.mean() / _EC_MU_DIV
    c = _EC_SERVERS
    for hod, lv in lam.items():
        a = lv / mu
        if a >= c:
            pw = 1.0
        else:
            s = sum(a**k / math.factorial(k) for k in range(c))
            top = a**c / math.factorial(c) * (c / (c - a))
            pw = top / (s + top)
        row = out.loc[hod]
        assert abs(row.lam - round(lv, 4)) < 1e-6
        assert abs(row.offered_a - round(a, 6)) < 1e-6
        assert abs(row.p_wait - round(pw, 6)) < 1e-6
    # wait probability is monotone in offered load
    srt = out.sort_values("offered_a")
    assert srt.p_wait.is_monotonic_increasing


def test_slo_burn_rate_brute(spark):
    out = q_slo_burn_rate(spark, SF).toPandas().iloc[0]
    g = _hourly()
    budget = 1 - _SLO_TARGET
    b1 = (g.errs / g.n / budget).to_numpy()
    b6 = (
        g.errs.rolling(6, min_periods=1).sum()
        / g.n.rolling(6, min_periods=1).sum()
        / budget
    ).to_numpy()
    b24 = (
        g.errs.rolling(24, min_periods=1).sum()
        / g.n.rolling(24, min_periods=1).sum()
        / budget
    ).to_numpy()
    assert out.n_hours == len(g)
    assert out.n_fast_alerts == int(((b1 > 14.4) & (b6 > 6)).sum())
    assert out.n_slow_alerts == int(((b6 > 6) & (b24 > 3)).sum())
    assert abs(out.max_burn_1h - round(b1.max(), 4)) < 1e-6
    assert abs(out.max_burn_6h - round(b6.max(), 4)) < 1e-6
    assert abs(out.mean_burn - round(b1.mean(), 4)) < 1e-6


def test_capacity_headroom_brute(spark):
    out = q_capacity_headroom(spark, SF).toPandas().iloc[0]
    g = _hourly()
    x = np.sort(g.n.to_numpy(dtype=float))
    pos = (len(x) - 1) * 0.95
    lo = int(np.floor(pos))
    frac = pos - lo
    p95 = (
        x[lo]
        if frac == 0
        else x[lo] * (1 - frac) + x[lo + 1] * frac
    )
    prov = g.n.mean() * _CAP_FACTOR
    assert out.n_hours == len(g)
    assert abs(out.provisioned - round(prov, 4)) < 1e-6
    assert abs(out.p95_hourly - round(p95, 4)) < 1e-6
    assert out.max_n == int(x.max())
    assert abs(out.headroom_p95 - round(prov / p95 - 1, 6)) < 1e-6
    assert abs(
        out.headroom_max - round(prov / x.max() - 1, 6)
    ) < 1e-6
