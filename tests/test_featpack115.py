"""Semantic tests for feature-eng pack #115: Pocock boundary,
always-valid CI, decision-interval CUSUM (brute replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _AVCI_ALPHA,
    _CUSUM_H,
    _CUSUM_K,
    _POCOCK_CRIT,
    _POCOCK_LOOKS,
    q_always_valid_ci,
    q_cusum_spc,
    q_pocock_boundary,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    e["day"] = e.ts.dt.day
    return e


def _daily():
    e = _events()
    return e.groupby("day")["cents"].sum().sort_index()


def test_pocock_boundary_brute(spark):
    out = q_pocock_boundary(spark, SF).toPandas()
    e = _events()
    for row, (i, d) in zip(
        out.itertuples(index=False), enumerate(_POCOCK_LOOKS, 1)
    ):
        cut = e[e.day <= d]
        a = cut[cut.user_id % 2 == 0].cents.to_numpy(dtype=float)
        b = cut[cut.user_id % 2 == 1].cents.to_numpy(dtype=float)
        z = (a.mean() - b.mean()) / math.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        assert row.look == i and row.through_day == d
        assert row.n == len(a) + len(b)
        assert abs(row.z - round(z, 6)) < 1e-6
        assert bool(row.reject) == (abs(z) > _POCOCK_CRIT)


def test_always_valid_ci_brute(spark):
    out = q_always_valid_ci(spark, SF).toPandas()
    x = _daily().to_numpy(dtype=float)
    sig = np.std(x, ddof=1)
    cum = np.cumsum(x)
    for i, row in out.iterrows():
        t = i + 1
        mean = cum[i] / t
        rad = sig * math.sqrt(
            (t + 1) / t**2 * math.log((t + 1) / _AVCI_ALPHA**2)
        )
        assert row.t == t
        assert abs(row.running_mean - round(mean, 4)) < 1e-6
        assert abs(row.lo - round(mean - rad, 4)) < 1e-4
        assert abs(row.hi - round(mean + rad, 4)) < 1e-4
    # widths shrink over time
    assert out.width.is_monotonic_decreasing


def test_cusum_spc_brute(spark):
    out = q_cusum_spc(spark, SF).toPandas()
    x = _daily().to_numpy(dtype=float)
    mu, sig = x.mean(), np.std(x, ddof=1)
    z = (x - mu) / sig
    sp = sm = 0.0
    for i, row in out.iterrows():
        sp = max(0.0, sp + z[i] - _CUSUM_K)
        sm = max(0.0, sm - z[i] - _CUSUM_K)
        assert abs(row.s_plus - round(sp, 4)) < 1e-4
        assert abs(row.s_minus - round(sm, 4)) < 1e-4
        assert bool(row.alarm) == (sp > _CUSUM_H or sm > _CUSUM_H)
