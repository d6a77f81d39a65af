"""Semantic tests for feature-eng pack #95: prequential error,
Mincer-Zarnowitz calibration, Diebold-Mariano (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _MZ_LAG,
    q_diebold_mariano,
    q_mincer_zarnowitz,
    q_prequential_error,
)

SF = "/root/testdata/sf0.001"


def _daily():
    e = pd.read_parquet(f"{SF}/events.parquet")
    c = (e.value * 100).round().astype("int64")
    return (
        pd.DataFrame({"day": e.ts.dt.day, "c": c})
        .groupby("day")["c"]
        .sum()
        .sort_index()
    )


def test_prequential_error_brute(spark):
    out = q_prequential_error(spark, SF).toPandas().set_index("day").sort_index()
    d = _daily()
    x = d.to_numpy()
    days = d.index.to_numpy()
    errs = []
    for t in range(1, len(x)):
        pred = x[:t].sum() / t
        err = round(abs(x[t] - pred), 4)
        errs.append(err)
        row = out.loc[days[t]]
        assert row.x == x[t]
        assert abs(row.pred - round(pred, 4)) < 1e-9
        assert abs(row.abs_err - err) < 1e-9
        assert abs(row.running_mae - round(np.mean(errs), 4)) < 1e-6
    assert len(out) == len(x) - 1


def test_mincer_zarnowitz_brute(spark):
    out = q_mincer_zarnowitz(spark, SF).toPandas().iloc[0]
    x = _daily().to_numpy()
    f = x[:-_MZ_LAG].astype(np.int64)
    y = x[_MZ_LAG:].astype(np.int64)
    n = len(y)
    sf, sx = int(f.sum()), int(y.sum())
    sff, sfx = int((f * f).sum()), int((f * y).sum())
    sxx = int((y * y).sum())
    cfx = float(n * sfx - sf * sx)
    cff = float(n * sff - sf * sf)
    cxx = float(n * sxx - sx * sx)
    b = cfx / cff
    a = (sx - b * sf) / n
    r2 = cfx * cfx / (cff * cxx)
    sse = cxx / n * (1 - r2)
    se_b = math.sqrt(sse / (n - 2) / (cff / n))
    assert out.n == n
    assert abs(out.intercept - round(a, 4)) < 1e-6
    assert abs(out.slope - round(b, 6)) < 1e-9
    assert abs(out.r2 - round(r2, 6)) < 1e-9
    assert abs(out.t_slope_eq_1 - round((b - 1) / se_b, 6)) < 1e-6


def test_diebold_mariano_brute(spark):
    out = q_diebold_mariano(spark, SF).toPandas().iloc[0]
    x = _daily().to_numpy()
    def _rhalf(v):
        # Spark/DuckDB round half-away-from-zero; cents/100 hits .5
        # whenever the diff ends in 50 — python round() is banker's
        return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)

    ds = []
    for t in range(_MZ_LAG, len(x)):
        e1 = _rhalf((x[t] - x[t - 1]) / 100)
        e2 = _rhalf((x[t] - x[t - _MZ_LAG]) / 100)
        ds.append(e1 * e1 - e2 * e2)
    d = np.array(ds, dtype=np.int64)
    n, s = len(d), int(d.sum())
    dbar = s / n
    dev = d - dbar
    g0 = float((dev * dev).sum())
    g1 = float((dev[1:] * dev[:-1]).sum())
    v = max(g0 + 2 * g1, g0) / n / n
    dm = dbar / math.sqrt(v)
    assert (out.n, out.s) == (n, s)
    assert abs(out.dbar - round(dbar, 4)) < 1e-6
    assert abs(out.gamma0 - round(g0 / n, 4)) < 1e-2
    assert abs(out.dm_stat - round(dm, 6)) < 1e-5
    hln = math.sqrt((n + 1 - 2 * 1 + 1 * 0 / n) / n)
    assert abs(out.hln_factor - round(hln, 6)) < 1e-9
