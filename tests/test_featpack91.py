"""Semantic tests for feature-eng pack #91: KM + Greenwood CI, RMST,
Atkinson index (brute python replicas; cross-engine parity is proven
by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _KM_TAU,
    q_atkinson_index,
    q_km_greenwood,
    q_km_rmst,
)

SF = "/root/testdata/sf0.001"
_Z95 = 1.959964


def _life():
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    o = o.sort_values(["o_custkey", "d", "o_orderkey"])
    firsts = o.groupby("o_custkey").nth(0)
    seconds = o.groupby("o_custkey").nth(1)
    max_d = o.d.max()
    rows = []
    sec = dict(zip(seconds.o_custkey, seconds.d)) if len(seconds) else {}
    for _, r in firsts.iterrows():
        if r.o_custkey in sec:
            rows.append(((sec[r.o_custkey] - r.d).days, 1))
        else:
            rows.append(((max_d - r.d).days, 0))
    df = pd.DataFrame(rows, columns=["t", "event"])
    g = (
        df.groupby("t")
        .agg(exits=("event", "size"), d_ev=("event", "sum"))
        .sort_index(ascending=False)
    )
    g["n_at"] = g.exits.cumsum()
    g = g.sort_index()
    g = g[(g.d_ev > 0) & (g.d_ev < g.n_at)]
    g["ln_e12"] = [
        round(1e12 * math.log(1.0 - d / n))
        for d, n in zip(g.d_ev, g.n_at)
    ]
    g["gw_e12"] = [
        round(1e12 * d / (n * (n - d))) for d, n in zip(g.d_ev, g.n_at)
    ]
    g["cumln"] = g.ln_e12.cumsum()
    g["cumgw"] = g.gw_e12.cumsum()
    return g


def test_km_greenwood_brute(spark):
    out = q_km_greenwood(spark, SF).toPandas().set_index("t").sort_index()
    g = _life()
    g = g[g.index <= _KM_TAU]
    assert len(out) == len(g)
    for t, r in g.iterrows():
        row = out.loc[t]
        assert (row.n_at, row.d_ev) == (r.n_at, r.d_ev)
        s = math.exp(r.cumln / 1e12)
        se = s * math.sqrt(r.cumgw / 1e12)
        assert abs(row.surv - round(s, 6)) < 1e-9
        assert abs(row.se - round(se, 6)) < 1e-9
        assert abs(row.lo95 - round(max(0.0, s - _Z95 * se), 6)) < 1e-9
        assert abs(row.hi95 - round(min(1.0, s + _Z95 * se), 6)) < 1e-9
    # survival is nonincreasing
    assert out.surv.is_monotonic_decreasing


def test_km_rmst_brute(spark):
    out = q_km_rmst(spark, SF).toPandas().iloc[0]
    g = _life()
    g = g[g.index <= _KM_TAU]
    prev_t, prev_cumln = 0, 0
    area = 0
    for t, r in g.iterrows():
        area += round(1e6 * (t - prev_t) * math.exp(prev_cumln / 1e12))
        prev_t, prev_cumln = t, r.cumln
    tail = round(
        1e6 * (_KM_TAU - g.index.max()) * math.exp(g.cumln.min() / 1e12)
    )
    assert out.n_steps == len(g)
    assert out.t_last == g.index.max()
    assert out.area_e6 == area
    assert out.tail_e6 == tail
    assert abs(out.rmst_days - round((area + tail) / 1e6, 6)) < 1e-9
    # RMST is bounded by the horizon
    assert 0 < out.rmst_days <= _KM_TAU


def test_atkinson_brute(spark):
    out = q_atkinson_index(spark, SF).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = (o.o_totalprice * 100).round().astype("int64")
    n = len(c)
    s = int(c.sum())
    ssq = int(sum(round(1e6 * math.sqrt(v)) for v in c))
    mean = s / n
    ede = (ssq / (n * 1e6)) ** 2
    assert (out.n, out.s, out.ssq_e6) == (n, s, ssq)
    assert abs(out.atkinson_05 - round(1 - ede / mean, 6)) < 1e-9
    # Atkinson in [0, 1); equals 0 only under perfect equality
    assert 0 < out.atkinson_05 < 1
