"""Semantic tests for feature-eng pack #105: Lin's CCC, Bland-Altman
limits of agreement, Deming regression (brute pandas replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _BA_Z,
    _SPLIT_DAY,
    q_bland_altman,
    q_deming_regression,
    q_lins_ccc,
)

SF = "/root/testdata/sf0.001"


def _pairs():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    e["day"] = e.ts.dt.day
    x = (
        e[e.day <= _SPLIT_DAY]
        .groupby("user_id")["cents"]
        .mean()
        .rename("x")
    )
    y = (
        e[e.day > _SPLIT_DAY]
        .groupby("user_id")["cents"]
        .mean()
        .rename("y")
    )
    p = pd.concat([x, y], axis=1).dropna()
    return p.x.to_numpy(), p.y.to_numpy()


def test_lins_ccc_brute(spark):
    out = q_lins_ccc(spark, SF).toPandas().iloc[0]
    x, y = _pairs()
    sxx = np.mean(x * x) - np.mean(x) ** 2
    syy = np.mean(y * y) - np.mean(y) ** 2
    sxy = np.mean(x * y) - np.mean(x) * np.mean(y)
    ccc = 2 * sxy / (sxx + syy + (np.mean(x) - np.mean(y)) ** 2)
    r = sxy / np.sqrt(sxx * syy)
    assert out.n == len(x)
    assert abs(out.ccc - round(ccc, 6)) < 1e-6
    assert abs(out.pearson_r - round(r, 6)) < 1e-6
    assert abs(out.c_b - round(ccc / r, 6)) < 1e-6
    # CCC never exceeds |r| (C_b <= 1)
    assert abs(out.ccc) <= abs(out.pearson_r) + 1e-9


def test_bland_altman_brute(spark):
    out = q_bland_altman(spark, SF).toPandas().iloc[0]
    x, y = _pairs()
    d = x - y
    md, sd = np.mean(d), np.std(d, ddof=1)
    lo, hi = md - _BA_Z * sd, md + _BA_Z * sd
    assert out.n == len(d)
    assert abs(out.mean_diff - round(md, 4)) < 1e-6
    assert abs(out.sd_diff - round(sd, 4)) < 1e-6
    assert abs(out.loa_lo - round(lo, 4)) < 1e-6
    assert abs(out.loa_hi - round(hi, 4)) < 1e-6
    pct = np.mean((d < lo) | (d > hi))
    assert abs(out.pct_outside - round(pct, 6)) < 1e-6
    # ~95% of points inside the limits by construction
    assert out.pct_outside < 0.15


def test_deming_regression_brute(spark):
    out = q_deming_regression(spark, SF).toPandas().iloc[0]
    x, y = _pairs()
    sxx = np.mean(x * x) - np.mean(x) ** 2
    syy = np.mean(y * y) - np.mean(y) ** 2
    sxy = np.mean(x * y) - np.mean(x) * np.mean(y)
    slope = (syy - sxx + np.sqrt((syy - sxx) ** 2 + 4 * sxy**2)) / (
        2 * sxy
    )
    icpt = np.mean(y) - slope * np.mean(x)
    assert out.n == len(x)
    assert abs(out.slope - round(slope, 6)) < 1e-6
    assert abs(out.intercept - round(icpt, 4)) < 1e-6
    assert abs(out.ols_slope - round(sxy / sxx, 6)) < 1e-6
    # Deming slope is steeper than OLS when both sides carry noise
    assert abs(out.slope) >= abs(out.ols_slope) - 1e-9
