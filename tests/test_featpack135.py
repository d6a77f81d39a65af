"""Semantic tests for feature-eng pack #135: deterministic block
bootstrap, jackknife median, half-sample stability (brute numpy
replicas of the hash-LCG resampling; cross-engine parity is proven
by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _BB_B,
    _BB_L,
    _BB_NB,
    _HS_B,
    _LCG_A,
    _LCG_C,
    _LCG_M,
    q_block_bootstrap_se,
    q_half_sample_stability,
    q_jackknife_median,
)

SF = "/root/testdata/sf0.001"


def _daily():
    e = pd.read_parquet(f"{SF}/events.parquet")
    cents = np.round(e.value * 100).astype("int64")
    return (
        pd.DataFrame({"day": e.ts.dt.day, "c": cents})
        .groupby("day")["c"]
        .sum()
        .sort_index()
        .to_numpy(dtype="int64")
    )


def test_block_bootstrap_se_brute(spark):
    out = q_block_bootstrap_se(spark, SF).toPandas().iloc[0]
    # engine ranks ORDER BY day; _daily() is day-ordered already
    d = _daily()
    n = len(d)
    span = n - _BB_L + 1
    means = []
    for b in range(_BB_B):
        vals = []
        for j in range(_BB_NB):
            pos = (
                (_LCG_A * ((97 * b + j) % _LCG_M) + _LCG_C) % _LCG_M
            ) % span
            vals.extend(d[pos : pos + _BB_L])
        means.append(sum(vals) / (_BB_NB * _BB_L))
    means = np.array(means)
    assert out.n_days == n
    assert out.n_reps == _BB_B
    assert abs(out.mean_full - round(d.mean(), 4)) < 1e-6
    assert abs(out.mean_of_means - round(means.mean(), 4)) < 1e-4
    assert abs(out.boot_se - round(means.std(ddof=1), 4)) < 1e-4


def test_jackknife_median_brute(spark):
    out = q_jackknife_median(spark, SF).toPandas().iloc[0]
    x = np.sort(_daily().astype(float))
    n = len(x)
    meds = []
    for i in range(n):
        rest = np.delete(x, i)
        m = len(rest)
        meds.append(
            (rest[(m + 1) // 2 - 1] + rest[(m + 2) // 2 - 1]) / 2
        )
    meds = np.array(meds)
    med_full = (x[(n + 1) // 2 - 1] + x[(n + 2) // 2 - 1]) / 2
    se = math.sqrt((n - 1) / n * ((meds - meds.mean()) ** 2).sum())
    assert out.n_days == n
    assert abs(out.median_full - round(med_full, 4)) < 1e-9
    assert abs(out.mean_loo - round(meds.mean(), 4)) < 1e-6
    assert abs(out.jackknife_se - round(se, 4)) < 1e-4


def test_half_sample_stability_brute(spark):
    out = q_half_sample_stability(spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    u = e.groupby("user_id")["cents"].sum()
    means, sizes = [], []
    for b in range(_HS_B):
        sel = [
            y
            for uid, y in u.items()
            if ((_LCG_A * ((uid * 131 + b) % _LCG_M) + _LCG_C)
                % _LCG_M) % 2 == 0
        ]
        if sel:
            means.append(np.mean(sel))
            sizes.append(len(sel))
    means = np.array(means)
    assert out.n_reps == len(means)
    assert abs(out.mean_full - round(u.mean(), 4)) < 1e-6
    assert abs(out.mean_of_halves - round(means.mean(), 4)) < 1e-4
    assert abs(out.half_sd - round(means.std(ddof=1), 4)) < 1e-4
    assert abs(out.mean_half_size - round(np.mean(sizes), 2)) < 1e-9
