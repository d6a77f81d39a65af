"""Semantic tests for feature-eng pack #113: periodogram,
AR(2) Yule-Walker, spectral entropy (brute numpy replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _SP_PMAX,
    _SP_PMIN,
    _TRIG,
    q_ar2_yule_walker,
    q_periodogram_peak,
    q_spectral_entropy,
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
    )


def _pg():
    d = _daily()
    x = d.to_numpy(dtype=float)
    days = d.index.to_numpy()
    mu = x.mean()
    wts = {(p, t): (cs, sn) for p, t, cs, sn in _TRIG}
    pg = {}
    for p in range(_SP_PMIN, _SP_PMAX + 1):
        sc = sum(
            (xi - mu) * wts[(p, int(t))][0] for xi, t in zip(x, days)
        )
        ss = sum(
            (xi - mu) * wts[(p, int(t))][1] for xi, t in zip(x, days)
        )
        pg[p] = 2.0 / len(x) * (sc * sc + ss * ss)
    return pg


def test_periodogram_peak_brute(spark):
    out = q_periodogram_peak(spark, SF).toPandas().set_index("p")
    pg = _pg()
    tot = sum(pg.values())
    order = sorted(pg.items(), key=lambda kv: (-kv[1], kv[0]))
    ranks = {p: i + 1 for i, (p, _) in enumerate(order)}
    assert len(out) == _SP_PMAX - _SP_PMIN + 1
    for p, v in pg.items():
        assert abs(out.loc[p].power_share - round(v / tot, 6)) < 1e-5
        assert out.loc[p].power_rank == ranks[p]
    assert abs(out.power_share.sum() - 1.0) < 1e-4


def test_ar2_yule_walker_brute(spark):
    out = q_ar2_yule_walker(spark, SF).toPandas().iloc[0]
    x = _daily().to_numpy(dtype=float)
    n, mu = len(x), x.mean()
    c0 = np.sum((x - mu) ** 2)
    c1 = np.sum((x[1:] - mu) * (x[:-1] - mu))
    c2 = np.sum((x[2:] - mu) * (x[:-2] - mu))
    r1, r2 = c1 / c0, c2 / c0
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    assert out.n == n
    assert abs(out.r1 - round(r1, 6)) < 1e-6
    assert abs(out.r2 - round(r2, 6)) < 1e-6
    assert abs(out.phi1 - round(phi1, 6)) < 1e-6
    assert abs(out.phi2 - round(phi2, 6)) < 1e-6
    disc = phi1 * phi1 + 4 * phi2
    assert bool(out.complex_roots) == (disc < 0)
    if disc < 0:
        per = 2 * math.pi / math.acos(phi1 / (2 * math.sqrt(-phi2)))
        assert abs(out.pseudo_period - round(per, 4)) < 1e-4
    else:
        assert pd.isna(out.pseudo_period)


def test_spectral_entropy_brute(spark):
    out = q_spectral_entropy(spark, SF).toPandas().iloc[0]
    pg = _pg()
    tot = sum(pg.values())
    ps = [v / tot for v in pg.values()]
    h = -sum(p * math.log(p) for p in ps)
    k = len(ps)
    assert out.k == k
    assert abs(out.h_norm - round(h / math.log(k), 6)) < 1e-5
    assert abs(out.peak_share - round(max(ps), 6)) < 1e-5
    # normalized entropy lives in (0, 1]
    assert 0 < out.h_norm <= 1.0 + 1e-9
