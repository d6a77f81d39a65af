"""Semantic tests for feature-eng pack #129: MMD, energy distance,
projected KS (brute numpy replicas; cross-engine parity is proven
by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _TS_DQ,
    _TS_KQ,
    _TS_PROJ,
    q_energy_distance,
    q_ks_proj_max,
    q_mmd_shift,
)

SF = "/root/testdata/sf0.001"


def _halves():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["day"] = e.ts.dt.day
    e["buy"] = e.event_type == "purchase"

    def feats(m):
        g = e[m].groupby("user_id")
        return np.stack(
            [
                g.size().to_numpy(),
                g.buy.sum().to_numpy(),
                g.day.nunique().to_numpy(),
            ],
            axis=1,
        ).astype("int64")

    return feats(e.day <= 15), feats(e.day > 15)


def _d2(a, b, same):
    out = []
    for i in range(len(a)):
        start = i + 1 if same else 0
        bb = b[start:] if same else b
        d = a[i] - bb
        out.extend((d * d).sum(axis=1).tolist())
    return np.array(out, dtype="int64")


def test_mmd_shift_brute(spark):
    out = q_mmd_shift(spark, SF).toPandas().iloc[0]
    x, y = _halves()
    dxx, dyy = _d2(x, x, True), _d2(y, y, True)
    dxy = _d2(x, y, False)
    pooled = np.concatenate([dxx, dyy, dxy])
    s2 = pooled.sum() / len(pooled)

    def km(d):
        k = np.round(np.exp(-d / (2 * s2)) * _TS_KQ)
        return k.sum() / len(d) / _TS_KQ

    kxx, kyy, kxy = km(dxx), km(dyy), km(dxy)
    assert abs(out.mean_kxx - round(kxx, 6)) < 1e-6
    assert abs(out.mean_kyy - round(kyy, 6)) < 1e-6
    assert abs(out.mean_kxy - round(kxy, 6)) < 1e-6
    assert abs(out.mmd2 - round(kxx + kyy - 2 * kxy, 6)) < 2e-6


def test_energy_distance_brute(spark):
    out = q_energy_distance(spark, SF).toPandas().iloc[0]
    x, y = _halves()

    def dm(d):
        q = np.round(np.sqrt(d.astype(float)) * _TS_DQ)
        return q.sum() / len(d) / _TS_DQ

    dxx, dyy = dm(_d2(x, x, True)), dm(_d2(y, y, True))
    dxy = dm(_d2(x, y, False))
    assert abs(out.mean_dxx - round(dxx, 6)) < 1e-6
    assert abs(out.mean_dyy - round(dyy, 6)) < 1e-6
    assert abs(out.mean_dxy - round(dxy, 6)) < 1e-6
    e = 2 * dxy - dxx - dyy
    assert abs(out.energy_dist - round(e, 6)) < 2e-6
    # energy distance is non-negative
    assert out.energy_dist >= -1e-9


def test_ks_proj_max_brute(spark):
    out = q_ks_proj_max(spark, SF).toPandas().set_index("proj")
    x, y = _halves()
    best = 0.0
    for i, w in enumerate(_TS_PROJ, 1):
        wv = np.array(w)
        px = np.sort(x @ wv)
        py = np.sort(y @ wv)
        grid = np.unique(np.concatenate([px, py]))
        fx = np.searchsorted(px, grid, side="right") / len(px)
        fy = np.searchsorted(py, grid, side="right") / len(py)
        ks = np.max(np.abs(fx - fy))
        best = max(best, ks)
        row = out.loc[f"p{i}"]
        assert abs(row.ks - round(ks, 6)) < 1e-9
    assert abs(out.ks_max.iloc[0] - round(best, 6)) < 1e-9
