"""Semantic tests for feature-eng pack #119: ABC analysis, classical
decomposition, seasonal strength (brute pandas replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _ABC_A,
    _ABC_B,
    _STL_W,
    q_abc_analysis,
    q_seasonal_strength,
    q_stl_decompose,
)

SF = "/root/testdata/sf0.001"


def test_abc_analysis_brute(spark):
    out = q_abc_analysis(spark, SF).toPandas().set_index("abc")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["cents"] = np.round(o.o_totalprice * 100).astype("int64")
    rev = (
        o.groupby("o_custkey")["cents"]
        .sum()
        .reset_index()
        .sort_values(["cents", "o_custkey"], ascending=[False, True])
    )
    tot = rev.cents.sum()
    rev["cum"] = rev.cents.cumsum() / tot
    rev["abc"] = np.where(
        rev.cum <= _ABC_A, "A", np.where(rev.cum <= _ABC_B, "B", "C")
    )
    g = rev.groupby("abc").agg(
        n=("o_custkey", "size"), share=("cents", "sum")
    )
    g["share"] /= tot
    for cls in g.index:
        assert out.loc[cls].n_customers == g.loc[cls].n
        assert abs(
            out.loc[cls].revenue_share - round(g.loc[cls].share, 6)
        ) < 1e-9
    # classes partition the customers, A takes most revenue
    assert out.n_customers.sum() == len(rev)
    assert out.revenue_share.idxmax() == "A"


def _decomp_brute():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    d = (
        e.groupby(e.ts.dt.day)
        .agg(x=("cents", "sum"), dow=("ts", lambda s: s.iloc[0].weekday()))
        .sort_index()
    )
    # python weekday(): 0=Mon..6=Sun; spark dayofweek: 1=Sun..7=Sat
    d["dow_spark"] = (d.dow + 1) % 7 + 1
    half = _STL_W // 2
    trend = d.x.rolling(_STL_W, center=True).mean()
    det = d.x - trend
    sraw = det.groupby(d.dow_spark).mean()
    seas = (sraw - sraw.mean()).rename("seasonal")
    d = d.join(trend.rename("trend")).join(
        seas, on="dow_spark"
    )
    d["resid"] = d.x - d.trend - d.seasonal
    return d


def test_stl_decompose_brute(spark):
    out = q_stl_decompose(spark, SF).toPandas().set_index("day")
    d = _decomp_brute()
    assert len(out) == len(d)
    for day, r in d.iterrows():
        row = out.loc[day]
        assert row.x == r.x
        assert row.dow == r.dow_spark
        if np.isnan(r.trend):
            assert pd.isna(row.trend)
        else:
            assert abs(row.trend - round(r.trend, 4)) < 1e-6
            assert abs(row.resid - round(r.resid, 4)) < 1e-4
        assert abs(row.seasonal - round(r.seasonal, 4)) < 1e-4
    # seasonal component re-centers to ~0 across dows
    assert abs(d.seasonal.groupby(d.dow_spark).first().sum()) < 1e-6


def test_seasonal_strength_brute(spark):
    out = q_seasonal_strength(spark, SF).toPandas().iloc[0]
    d = _decomp_brute().dropna(subset=["trend"])
    vr = np.var(d.resid)
    vsr = np.var(d.seasonal + d.resid)
    vtr = np.var(d.trend + d.resid)
    fs = max(0.0, 1 - vr / vsr)
    ft = max(0.0, 1 - vr / vtr)
    assert out.n == len(d)
    assert abs(out.f_seasonal - round(fs, 6)) < 1e-5
    assert abs(out.f_trend - round(ft, 6)) < 1e-5
    assert 0 <= out.f_seasonal <= 1 and 0 <= out.f_trend <= 1
