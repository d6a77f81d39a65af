"""Semantic tests for feature-eng pack #125: LAD/Huber IRLS trends,
regression influence (brute numpy replicas; cross-engine parity is
proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _HUBER_K,
    _INFL_TOPK,
    _IRLS_ROUNDS,
    _LAD_EPS,
    q_huber_trend,
    q_qreg_median,
    q_regression_influence,
)

SF = "/root/testdata/sf0.001"


def _xy():
    e = pd.read_parquet(f"{SF}/events.parquet")
    cents = np.round(e.value * 100).astype("int64")
    d = (
        pd.DataFrame({"day": e.ts.dt.day, "c": cents})
        .groupby("day")["c"]
        .sum()
        .sort_index()
    )
    return d.index.to_numpy(dtype=float), d.to_numpy(dtype=float)


def _wls(x, y, w):
    sw, swx, swy = w.sum(), (w * x).sum(), (w * y).sum()
    swxx, swxy = (w * x * x).sum(), (w * x * y).sum()
    b = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
    return b, (swy - b * swx) / sw


def _median(v):
    v = np.sort(v)
    m = len(v) - 1
    return (v[math.floor(m * 0.5)] + v[math.ceil(m * 0.5)]) / 2


def test_qreg_median_brute(spark):
    out = q_qreg_median(spark, SF).toPandas().iloc[0]
    x, y = _xy()
    b, a = _wls(x, y, np.ones_like(x))
    ols_b = b
    for _ in range(_IRLS_ROUNDS):
        w = 1.0 / np.maximum(np.abs(y - a - b * x), _LAD_EPS)
        b, a = _wls(x, y, w)
    assert abs(out.lad_slope - round(b, 4)) < 1e-3
    assert abs(out.lad_intercept - round(a, 4)) < 1e-1
    assert abs(out.ols_slope - round(ols_b, 4)) < 1e-3


def test_huber_trend_brute(spark):
    out = q_huber_trend(spark, SF).toPandas().iloc[0]
    x, y = _xy()
    b, a = _wls(x, y, np.ones_like(x))
    ols_b = b
    for _ in range(_IRLS_ROUNDS):
        ae = np.abs(y - a - b * x)
        s = _median(ae) / 0.6745
        w = np.minimum(1.0, _HUBER_K * s / np.maximum(ae, _LAD_EPS))
        b, a = _wls(x, y, w)
    assert abs(out.huber_slope - round(b, 4)) < 1e-3
    assert abs(out.huber_intercept - round(a, 4)) < 1e-1
    assert abs(out.ols_slope - round(ols_b, 4)) < 1e-3


def test_regression_influence_brute(spark):
    out = q_regression_influence(spark, SF).toPandas()
    x, y = _xy()
    n = len(x)
    b, a = _wls(x, y, np.ones_like(x))
    e = y - a - b * x
    sxx = ((x - x.mean()) ** 2).sum()
    h = 1 / n + (x - x.mean()) ** 2 / sxx
    s2 = (e**2).sum() / (n - 2)
    cook = e**2 * h / (2 * s2 * (1 - h) ** 2)
    order = sorted(
        zip(cook, x.astype(int)), key=lambda t: (-t[0], t[1])
    )[:_INFL_TOPK]
    assert len(out) == _INFL_TOPK
    for row, (cv, day) in zip(out.itertuples(index=False), order):
        assert row.day == day
        assert abs(row.cooks_d - round(cv, 6)) < 1e-4
    # leverage values live in (0, 1)
    assert ((out.leverage > 0) & (out.leverage < 1)).all()
