"""Semantic tests for feature-eng pack #122: Oaxaca-Blinder, Theil
decomposition, Lorenz dominance (brute pandas replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _LD_DECILES,
    q_lorenz_dominance,
    q_oaxaca_blinder,
    q_theil_decomp,
)

SF = "/root/testdata/sf0.001"


def _panel():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    u = e.groupby("user_id").agg(
        y=("cents", "sum"), x=("cents", "size")
    )
    u["a"] = u.index % 2 == 0
    return u


def _ols(g):
    x, y = g.x.to_numpy(float), g.y.to_numpy(float)
    b = ((x * y).mean() - x.mean() * y.mean()) / (
        (x * x).mean() - x.mean() ** 2
    )
    return x.mean(), y.mean(), b, y.mean() - b * x.mean()


def test_oaxaca_blinder_brute(spark):
    out = q_oaxaca_blinder(spark, SF).toPandas().iloc[0]
    u = _panel()
    mxa, mya, ba, ia = _ols(u[u.a])
    mxb, myb, bb, ib = _ols(u[~u.a])
    gap = mya - myb
    endow = (mxa - mxb) * bb
    coeff = mxa * (ba - bb) + (ia - ib)
    assert abs(out.gap - round(gap, 4)) < 1e-4
    assert abs(out.endowments - round(endow, 4)) < 1e-4
    assert abs(out.coefficients - round(coeff, 4)) < 1e-4
    # decomposition is exact: parts sum to the gap
    assert abs(out.check_sum - out.gap) < 1e-3


def test_theil_decomp_brute(spark):
    out = q_theil_decomp(spark, SF).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet")
    v = d.n_chars.astype(float)
    n, sv = len(d), v.sum()
    within = between = 0.0
    for _, g in d.groupby("source"):
        gv = g.n_chars.astype(float)
        svg, ng = gv.sum(), len(g)
        tg = np.sum((gv / svg) * np.log(gv / (svg / ng)))
        sg = svg / sv
        within += sg * tg
        between += sg * np.log(sg / (ng / n))
    assert abs(out.theil_within - round(within, 6)) < 1e-5
    assert abs(out.theil_between - round(between, 6)) < 1e-5
    # decomposition consistency with the direct total Theil
    total = np.sum((v / sv) * np.log(v / (sv / n)))
    assert abs(out.theil_total - total) < 1e-4


def test_lorenz_dominance_brute(spark):
    out = q_lorenz_dominance(spark, SF).toPandas().set_index("decile")
    u = _panel().reset_index()
    shares = {}
    for arm, g in u.groupby("a"):
        g = g.sort_values(["y", "user_id"])
        cum = (g.y.cumsum() / g.y.sum()).to_numpy()
        n = len(g)
        for d_ in range(1, _LD_DECILES + 1):
            k = int(np.ceil(d_ * n / _LD_DECILES))
            shares[(arm, d_)] = round(cum[k - 1], 6)
    for d_ in range(1, _LD_DECILES + 1):
        row = out.loc[d_]
        assert abs(row.share_even - shares[(True, d_)]) < 1e-6
        assert abs(row.share_odd - shares[(False, d_)]) < 1e-6
    ev = [shares[(True, d_)] for d_ in range(1, _LD_DECILES + 1)]
    od = [shares[(False, d_)] for d_ in range(1, _LD_DECILES + 1)]
    if all(a >= b for a, b in zip(ev, od)):
        verdict = "even_dominates"
    elif all(b >= a for a, b in zip(ev, od)):
        verdict = "odd_dominates"
    else:
        verdict = "curves_cross"
    assert (out.verdict == verdict).all()
    # Lorenz curves end at 1
    assert abs(out.loc[_LD_DECILES].share_even - 1.0) < 1e-9
