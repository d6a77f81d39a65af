"""Semantic tests for feature-eng pack #124: price elasticity,
newsvendor stock, demand pooling (brute pandas replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _NV_CO,
    _NV_CU,
    _POOL_TOP,
    _POOL_Z,
    q_demand_pooling,
    q_newsvendor_stock,
    q_price_elasticity,
)

SF = "/root/testdata/sf0.001"


def _li():
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")[
        ["p_partkey", "p_brand"]
    ]
    return li.merge(p, left_on="l_partkey", right_on="p_partkey")


def test_price_elasticity_brute(spark):
    out = q_price_elasticity(spark, SF).toPandas().set_index(
        "p_brand"
    )
    j = _li()
    j["lx"] = np.log(j.l_extendedprice / j.l_quantity)
    j["ly"] = np.log(j.l_quantity)
    for brand, g in j.groupby("p_brand"):
        sxy = (g.lx * g.ly).mean() - g.lx.mean() * g.ly.mean()
        sxx = (g.lx * g.lx).mean() - g.lx.mean() ** 2
        syy = (g.ly * g.ly).mean() - g.ly.mean() ** 2
        row = out.loc[brand]
        assert row.n == len(g)
        assert abs(row.elasticity - round(sxy / sxx, 6)) < 1e-5
        assert abs(row.r2 - round(sxy**2 / (sxx * syy), 6)) < 1e-5
        assert 0 <= row.r2 <= 1


def test_newsvendor_stock_brute(spark):
    out = q_newsvendor_stock(spark, SF).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    d = (
        li.groupby(li.l_shipdate.dt.date)["l_quantity"]
        .apply(lambda s: int(s.astype("int64").sum()))
        .sort_index()
    )
    x = np.sort(d.to_numpy(dtype=float))
    cr = _NV_CU / (_NV_CU + _NV_CO)
    pos = (len(x) - 1) * cr
    lo = int(np.floor(pos))
    frac = pos - lo
    qstar = x[lo] if frac == 0 else x[lo] * (1 - frac) + x[lo + 1] * frac
    qmean = x.mean()

    def cost(s):
        return np.mean(
            _NV_CO * np.maximum(s - x, 0)
            + _NV_CU * np.maximum(x - s, 0)
        )

    assert out.n == len(x)
    assert abs(out.critical_ratio - round(cr, 6)) < 1e-9
    assert abs(out.q_star - round(qstar, 4)) < 1e-6
    assert abs(out.q_mean - round(qmean, 4)) < 1e-4
    assert abs(out.cost_at_qstar - round(cost(qstar), 4)) < 1e-3
    assert abs(out.cost_at_mean - round(cost(qmean), 4)) < 1e-3
    # the critical-ratile stock never costs more than the mean stock
    assert out.cost_at_qstar <= out.cost_at_mean + 1e-9


def test_demand_pooling_brute(spark):
    out = q_demand_pooling(spark, SF).toPandas().iloc[0]
    j = _li()
    j["d"] = j.l_shipdate.dt.date
    j["q"] = j.l_quantity.astype("int64")
    tops = (
        j.groupby("p_brand")["q"]
        .sum()
        .sort_values(ascending=False)
        .head(_POOL_TOP)
        .index
    )
    jj = j[j.p_brand.isin(tops)]
    byday = (
        jj.groupby(["p_brand", "d"])["q"].sum().reset_index()
    )
    sum_sd = byday.groupby("p_brand")["dq" if False else "q"].std(
        ddof=1
    ).sum()
    pooled_sd = byday.groupby("d")["q"].sum().std(ddof=1)
    assert abs(out.sum_sd - round(sum_sd, 4)) < 1e-3
    assert abs(out.pooled_sd - round(pooled_sd, 4)) < 1e-3
    assert abs(
        out.pooling_ratio - round(pooled_sd / sum_sd, 6)
    ) < 1e-5
    assert abs(
        out.safety_stock_saving
        - round(_POOL_Z * (sum_sd - pooled_sd), 4)
    ) < 1e-2
    # pooling can only help (subadditivity of sd)
    assert out.pooling_ratio <= 1.0 + 1e-9
