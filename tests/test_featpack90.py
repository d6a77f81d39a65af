"""Semantic tests for feature-eng pack #90: QTE deciles, exponential
rate ratio, Hellinger histogram distance (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _ES_TREAT_MOD,
    _HH_BIN,
    q_exp_hazard_ratio,
    q_hellinger_hist,
    q_qte_deciles,
)

SF = "/root/testdata/sf0.001"
_Z95 = 1.959964


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["c"] = (e.value * 100).round().astype("int64")
    e["treat"] = (e.user_id % _ES_TREAT_MOD == 0).astype(int)
    return e


def test_qte_deciles_brute(spark):
    out = q_qte_deciles(spark, SF).toPandas().set_index("decile")
    e = _events()
    for d in range(1, 10):
        for arm, col in ((1, "q_treat_cents"), (0, "q_ctrl_cents")):
            g = e[e.treat == arm].sort_values(["c", "event_id"])
            n = len(g)
            k = math.ceil(d * n / 10)
            assert out.loc[d, col] == g.c.to_numpy()[k - 1]
        assert (
            out.loc[d, "qte_cents"]
            == out.loc[d, "q_treat_cents"] - out.loc[d, "q_ctrl_cents"]
        )
    # deciles are monotone within each arm
    assert out.q_treat_cents.is_monotonic_increasing
    assert out.q_ctrl_cents.is_monotonic_increasing


def test_exp_hazard_ratio_brute(spark):
    out = q_exp_hazard_ratio(spark, SF).toPandas().iloc[0]
    e = _events()
    us = e.ts.astype("int64")
    e = e.assign(us=us)

    def arm(t):
        g = e[e.treat == t]
        per = g.groupby("user_id")["us"].agg(["min", "max", "count"])
        ev = int((per["count"] - 1).sum())
        span = int((per["max"] - per["min"]).sum())
        return ev, span

    e1, x1 = arm(1)
    e0, x0 = arm(0)
    day = 86_400_000_000.0
    l1, l0 = e1 * day / x1, e0 * day / x0
    ratio = l1 / l0
    se = math.sqrt(1 / e1 + 1 / e0)
    assert (out.e1, out.e0) == (e1, e0)
    assert abs(out.rate_treat_per_day - round(l1, 6)) < 1e-9
    assert abs(out.rate_ratio - round(ratio, 6)) < 1e-9
    assert abs(out.lo95 - round(math.exp(math.log(ratio) - _Z95 * se), 6)) < 1e-6
    assert abs(out.hi95 - round(math.exp(math.log(ratio) + _Z95 * se), 6)) < 1e-6
    assert out.lo95 <= out.rate_ratio <= out.hi95


def test_hellinger_hist_brute(spark):
    out = q_hellinger_hist(spark, SF).toPandas().iloc[0]
    e = _events()
    e = e[e.event_type.isin(["purchase", "click"])]
    e["bin"] = e.c // _HH_BIN
    cells = (
        e.groupby("bin")
        .agg(
            np_=("event_type", lambda s: (s == "purchase").sum()),
            nc=("event_type", lambda s: (s == "click").sum()),
        )
        .astype(int)
    )
    tp, tc = cells.np_.sum(), cells.nc.sum()
    bc = sum(
        math.sqrt((r.np_ / tp) * (r.nc / tc)) for r in cells.itertuples()
    )
    h = math.sqrt(1 - min(bc, 1.0))
    assert (out.n_purchase, out.n_click, out.n_bins) == (
        tp,
        tc,
        len(cells),
    )
    assert abs(out.bhattacharyya - round(bc, 6)) < 1e-6
    assert abs(out.hellinger - round(h, 6)) < 1e-6
    assert 0 <= out.hellinger <= 1
