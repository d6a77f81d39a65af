"""Semantic tests for feature-eng pack #104: Peto-Peto weighted
logrank, actuarial life table, Schoenfeld PH trend (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _LT_WEEK_US,
    q_fh_logrank,
    q_life_table,
    q_schoenfeld_trend,
)

SF = "/root/testdata/sf0.001"


def _durations():
    e = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    e["us"] = e.ts.astype("int64")
    rows = []
    for uid, g in e.groupby("user_id"):
        t0 = g.us.iloc[0]
        buys = g[g.event_type == "purchase"]
        if len(buys):
            rows.append((uid % 2, buys.us.min() - t0, 1))
        else:
            rows.append((uid % 2, g.us.max() - t0, 0))
    return pd.DataFrame(rows, columns=["g", "t", "ev"])


def _risk_table(dur):
    by = (
        dur.groupby("t")
        .apply(
            lambda f: pd.Series(
                {
                    "d1": int(f[f.g == 1].ev.sum()),
                    "d": int(f.ev.sum()),
                    "x1": int((f.g == 1).sum()),
                    "x": len(f),
                }
            ),
            include_groups=False,
        )
        .sort_index()
    )
    by["n1"] = by.x1[::-1].cumsum()[::-1]
    by["n"] = by.x[::-1].cumsum()[::-1]
    return by


def test_fh_logrank_brute(spark):
    out = q_fh_logrank(spark, SF).toPandas().iloc[0]
    by = _risk_table(_durations())
    dead = by[by.d > 0]
    w = np.exp(np.cumsum(np.log(1 - dead.d / (dead.n + 1))))
    ok = dead.n > 1
    dead, w = dead[ok], w[ok]
    oe = dead.d1 - dead.d * dead.n1 / dead.n
    v = (
        dead.d
        * (dead.n1 / dead.n)
        * (1 - dead.n1 / dead.n)
        * (dead.n - dead.d)
        / (dead.n - 1)
    )
    z = np.sum(w * oe) / np.sqrt(np.sum(w * w * v))
    assert out.n_times == len(dead)
    assert abs(out.z - round(z, 6)) < 1e-6
    assert abs(out.chi2 - round(z * z, 6)) < 1e-6


def test_life_table_brute(spark):
    out = q_life_table(spark, SF).toPandas()
    dur = _durations()
    dur["week"] = dur.t // _LT_WEEK_US
    by = (
        dur.groupby("week")
        .agg(d=("ev", "sum"), c=("ev", lambda s: int((1 - s).sum())))
        .sort_index()
    )
    total = int((by.d + by.c).sum())
    entering = total - (by.d + by.c).cumsum().shift(fill_value=0)
    q = by.d / (entering - by.c / 2.0)
    surv, s, dead = [], 1.0, False
    for qk in q:
        dead = dead or qk >= 1
        s *= max(0.0, 1 - qk)
        surv.append(0.0 if dead else s)
    assert list(out.week) == list(by.index)
    assert list(out.entering) == list(entering.astype(int))
    np.testing.assert_allclose(out.q, np.round(q, 6), atol=1e-9)
    np.testing.assert_allclose(out.surv, np.round(surv, 6), atol=2e-6)
    # survival is non-increasing and ends at/below the KM-style floor
    assert (np.diff(out.surv) <= 1e-12).all()


def test_schoenfeld_trend_brute(spark):
    out = q_schoenfeld_trend(spark, SF).toPandas().iloc[0]
    by = _risk_table(_durations())
    dead = by[(by.d > 0) & (by.n > 1)]
    oe = dead.d1 - dead.d * dead.n1 / dead.n
    v = (
        dead.d
        * (dead.n1 / dead.n)
        * (1 - dead.n1 / dead.n)
        * (dead.n - dead.d)
        / (dead.n - 1)
    )
    u = (oe / np.sqrt(v))[v > 0].to_numpy()
    j = np.arange(1, len(u) + 1, dtype=float)
    r = np.corrcoef(j, u)[0, 1]
    z = r * np.sqrt((len(u) - 2) / (1 - r * r))
    assert out.m == len(u)
    assert abs(out["corr"] - round(r, 6)) < 1e-6
    assert abs(out.z - round(z, 6)) < 1e-6
