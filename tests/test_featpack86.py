"""Semantic tests for feature-eng pack #86: sharp RD, Wald IV,
event-study DiD coefficients (brute python replicas; cross-engine
parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _ES_POLICY_DAY,
    _ES_TREAT_MOD,
    _ES_WEEKS,
    _RD_BW,
    _RD_CUT,
    q_event_study,
    q_iv_wald,
    q_rd_estimate,
)

SF = "/root/testdata/sf0.001"


def _r6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -math.floor(
        -x * 1e6 + 0.5
    ) / 1e6


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["x"] = (e.value * 100).round().astype("int64")
    e["y"] = (e.event_type == "purchase").astype("int64")
    return e


def _icept(xc, y):
    n = len(xc)
    sx, sy = int(xc.sum()), int(y.sum())
    sxy, sxx = int((xc * y).sum()), int((xc * xc).sum())
    b = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    return (sy - b * sx) / n, n


def test_rd_estimate_brute(spark):
    out = q_rd_estimate(spark, SF).toPandas().iloc[0]
    e = _events()
    xc = e.x - _RD_CUT
    m = (xc >= -_RD_BW) & (xc <= _RD_BW)
    left = xc[m & (xc < 0)], e.y[m & (xc < 0)]
    right = xc[m & (xc >= 0)], e.y[m & (xc >= 0)]
    al, nl = _icept(*left)
    ar, nr = _icept(*right)
    assert (out.n_left, out.n_right) == (nl, nr)
    assert abs(out.icept_left - _r6(al)) < 1e-9
    assert abs(out.icept_right - _r6(ar)) < 1e-9
    assert abs(out.tau_rd - round(out.icept_right - out.icept_left, 6)) < 1e-9
    # intercepts are local purchase rates at the cutoff: probabilities
    assert -0.5 <= out.icept_left <= 1.5 and -0.5 <= out.icept_right <= 1.5


def test_iv_wald_brute(spark):
    out = q_iv_wald(spark, SF).toPandas().iloc[0]
    e = _events()
    z = e.ts.dt.dayofweek.isin([5, 6])  # pandas: Mon=0 .. Sun=6
    n1, n0 = int(z.sum()), int((~z).sum())
    dy = e.y[z].sum() / n1 - e.y[~z].sum() / n0
    dx = e.x[z].sum() / n1 - e.x[~z].sum() / n0
    assert (out.n1, out.n0) == (n1, n0)
    assert abs(out.reduced_form - _r6(dy)) < 1e-9
    assert abs(out.first_stage - _r6(dx)) < 1e-9
    assert abs(out.wald_iv - _r6(dy / dx)) < 1e-9


def test_event_study_brute(spark):
    out = (
        q_event_study(spark, SF).toPandas().set_index("rw").sort_index()
    )
    e = _events()
    e["treat"] = (e.user_id % _ES_TREAT_MOD == 0).astype(int)
    e["rw"] = np.floor((e.ts.dt.day - _ES_POLICY_DAY) / 7.0).astype(int)
    e = e[e.rw.isin(_ES_WEEKS)]
    gaps = {}
    for rw, g in e.groupby("rw"):
        t, c = g[g.treat == 1], g[g.treat == 0]
        gaps[rw] = (
            len(g),
            t.x.sum() / len(t) - c.x.sum() / len(c),
        )
    base = gaps[-1][1]
    assert set(out.index) == set(gaps)
    for rw, (n_week, gap) in gaps.items():
        row = out.loc[rw]
        assert row.n_week == n_week
        assert abs(row.gap - _r6(gap)) < 1e-9
        assert abs(row.es_coef - _r6(gap - base)) < 1e-9
    # the r = -1 coefficient is identically 0 by construction
    assert out.loc[-1].es_coef == 0.0
