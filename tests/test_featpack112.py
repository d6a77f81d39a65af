"""Semantic tests for feature-eng pack #112: Qn/Sn robust scale,
biweight midvariance, D'Agostino K2 (brute numpy replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _BW_C,
    _QN_D,
    _SN_C,
    q_biweight_midvar,
    q_dagostino_k2,
    q_qn_sn_scale,
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


def _med(v):
    v = np.sort(np.asarray(v, dtype=float))
    m = len(v) - 1
    lo, hi = math.floor(m * 0.5), math.ceil(m * 0.5)
    return (v[lo] + v[hi]) / 2


def test_qn_sn_scale_brute(spark):
    out = q_qn_sn_scale(spark, SF).toPandas().iloc[0]
    x = _daily()
    n = len(x)
    gaps = sorted(
        abs(int(x[i]) - int(x[j]))
        for i in range(n)
        for j in range(i + 1, n)
    )
    h = n // 2 + 1
    k = h * (h - 1) // 2
    qn = _QN_D * gaps[k - 1]
    imeds = [
        _med([abs(int(x[i]) - int(x[j])) for j in range(n) if j != i])
        for i in range(n)
    ]
    sn = _SN_C * _med(imeds)
    assert out.n == n
    assert abs(out.qn - round(qn, 4)) < 1e-6
    assert abs(out.sn - round(sn, 4)) < 1e-6
    assert abs(out.stddev - round(np.std(x, ddof=1), 4)) < 1e-4


def test_biweight_midvar_brute(spark):
    out = q_biweight_midvar(spark, SF).toPandas().iloc[0]
    x = _daily().astype(float)
    med = _med(x)
    mad = _med(np.abs(x - med))
    u = (x - med) / (_BW_C * mad)
    keep = np.abs(u) < 1
    xk, uk = x[keep], u[keep]
    num = np.sum((xk - med) ** 2 * (1 - uk**2) ** 4)
    den = np.sum((1 - uk**2) * (1 - 5 * uk**2))
    bw = len(x) * num / den**2
    assert out.n == len(x)
    assert abs(out["median"] - round(med, 4)) < 1e-9
    assert abs(out["mad"] - round(mad, 4)) < 1e-9
    assert abs(out.bwmv - round(bw, 4)) < 1e-3
    assert abs(out.bw_scale - round(math.sqrt(bw), 4)) < 1e-4


def test_dagostino_k2_brute(spark):
    out = q_dagostino_k2(spark, SF).toPandas().iloc[0]
    x = _daily().astype(float)
    n = float(len(x))
    m1 = x.mean()
    m2 = ((x - m1) ** 2).mean()
    m3 = ((x - m1) ** 3).mean()
    m4 = ((x - m1) ** 4).mean()
    g1, g2 = m3 / m2**1.5, m4 / m2**2
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    b2 = (
        3
        * (n * n + 27 * n - 70)
        * (n + 1)
        * (n + 3)
        / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w2 = -1 + math.sqrt(2 * (b2 - 1))
    z1 = (1 / math.sqrt(math.log(math.sqrt(w2)))) * math.log(
        y / math.sqrt(2 / (w2 - 1))
        + math.sqrt((y / math.sqrt(2 / (w2 - 1))) ** 2 + 1)
    )
    xs = (g2 - 3 * (n - 1) / (n + 1)) / math.sqrt(
        24 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    )
    sb1 = (
        6
        * (n * n - 5 * n + 2)
        / ((n + 7) * (n + 9))
        * math.sqrt(6 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    )
    aa = 6 + 8 / sb1 * (2 / sb1 + math.sqrt(1 + 4 / sb1**2))
    inner = (1 - 2 / aa) / (1 + xs * math.sqrt(2 / (aa - 4)))
    z2 = ((1 - 2 / (9 * aa)) - np.sign(inner) * abs(inner) ** (1 / 3)
          ) / math.sqrt(2 / (9 * aa))
    assert out.n == int(n)
    assert abs(out.skew_g1 - round(g1, 6)) < 1e-6
    assert abs(out.kurt_g2 - round(g2, 6)) < 1e-6
    assert abs(out.z1 - round(z1, 6)) < 1e-4
    assert abs(out.z2 - round(z2, 6)) < 1e-4
    assert abs(out.k2 - round(z1 * z1 + z2 * z2, 6)) < 1e-3
