"""Semantic tests for feature-eng pack #103: MASE/sMAPE panel,
Theil's U2, forecast encompassing (brute pandas replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _SN_LAG,
    q_forecast_encompassing,
    q_mase_smape,
    q_theil_u2,
)

SF = "/root/testdata/sf0.001"


def _daily():
    e = pd.read_parquet(f"{SF}/events.parquet")
    cents = np.round(e.value * 100).astype("int64")
    d = (
        pd.DataFrame({"day": e.ts.dt.day, "c": cents})
        .groupby("day")["c"]
        .sum()
        .sort_index()
    )
    x = d.to_numpy(dtype="int64")
    f1 = np.roll(x, 1).astype("float64")
    f7 = np.roll(x, _SN_LAG).astype("float64")
    mask = np.arange(len(x)) >= _SN_LAG
    return x[mask].astype("float64"), f1[mask], f7[mask]


def test_mase_smape_brute(spark):
    out = (
        q_mase_smape(spark, SF)
        .toPandas()
        .set_index("method")
        .sort_index()
    )
    x, f1, f7 = _daily()
    den = np.mean(np.abs(x - f1))
    for name, f in (("naive1", f1), ("snaive7", f7)):
        mae = np.mean(np.abs(x - f))
        smape = np.mean(200.0 * np.abs(x - f) / (np.abs(x) + np.abs(f)))
        row = out.loc[name]
        assert row.n == len(x)
        assert abs(row.mae - round(mae, 4)) < 1e-6
        assert abs(row.mase - round(mae / den, 6)) < 1e-6
        assert abs(row.smape - round(smape, 6)) < 1e-6
    # the shared denominator pins naive1's MASE to exactly 1
    assert abs(out.loc["naive1"].mase - 1.0) < 1e-9


def test_theil_u2_brute(spark):
    out = q_theil_u2(spark, SF).toPandas().iloc[0]
    x, f1, f7 = _daily()
    u2 = np.sqrt(
        np.sum(((f7 - x) / f1) ** 2) / np.sum(((x - f1) / f1) ** 2)
    )
    assert out.n == len(x)
    assert abs(out.u2 - round(u2, 6)) < 1e-6
    assert bool(out.beats_naive) == (u2 < 1)


def test_forecast_encompassing_brute(spark):
    out = q_forecast_encompassing(spark, SF).toPandas().iloc[0]
    x, f1, f7 = _daily()
    y = x - f1
    z = f7 - f1
    n = len(x)
    czy = n * np.sum(z * y) - np.sum(z) * np.sum(y)
    czz = n * np.sum(z * z) - np.sum(z) ** 2
    cyy = n * np.sum(y * y) - np.sum(y) ** 2
    lam = czy / czz
    a = (np.sum(y) - lam * np.sum(z)) / n
    sse = (cyy - czy * czy / czz) / n
    se = np.sqrt(sse / (n - 2) / (czz / n))
    assert out.n == n
    assert abs(out.intercept - round(a, 4)) < 1e-6
    assert abs(out["lambda"] - round(lam, 6)) < 1e-6
    assert abs(out.t_lambda - round(lam / se, 6)) < 1e-6
    # OLS cross-check: residuals orthogonal to the regressor
    resid = y - a - lam * z
    assert abs(np.sum(resid * z)) / max(abs(czy), 1.0) < 1e-8
