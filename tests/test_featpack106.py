"""Semantic tests for feature-eng pack #106: Fisher exact,
Breslow-Day/Tarone, Poisson dispersion (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _FE_HEAVY,
    _FE_TIE_EPS,
    q_breslow_day,
    q_fisher_exact,
    q_poisson_dispersion,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_fisher_exact_brute(spark):
    out = q_fisher_exact(spark, SF).toPandas().iloc[0]
    e = _events()
    u = (
        e.assign(p=(e.event_type == "purchase").astype(int))
        .groupby("user_id")["p"]
        .sum()
    )
    buy = (u >= _FE_HEAVY).astype(int)
    even = (u.index % 2 == 0).astype(int)
    a = int(((even == 1) & (buy == 1)).sum())
    b = int(((even == 1) & (buy == 0)).sum())
    c = int(((even == 0) & (buy == 1)).sum())
    d = int(((even == 0) & (buy == 0)).sum())
    assert (out.a, out.b, out.c, out.d) == (a, b, c, d)
    r1, r2, c1 = a + b, c + d, a + c
    kmin, kmax = max(0, c1 - r2), min(r1, c1)

    def lchoose(n, k):
        return (
            math.lgamma(n + 1)
            - math.lgamma(k + 1)
            - math.lgamma(n - k + 1)
        )

    lps = np.array(
        [
            lchoose(r1, k) + lchoose(r2, c1 - k)
            for k in range(kmin, kmax + 1)
        ]
    )
    ps = np.exp(lps - lps.max())
    ps /= ps.sum()
    pobs = ps[a - kmin]
    p2 = min(1.0, ps[ps <= pobs * (1 + _FE_TIE_EPS)].sum())
    assert abs(out.p_two_sided - round(p2, 6)) < 1e-5
    assert abs(out.odds_ratio - round(a * d / (b * c), 6)) < 1e-6


def test_breslow_day_brute(spark):
    out = q_breslow_day(spark, SF).toPandas().iloc[0]
    e = _events()
    strat = (e.ts.dt.day - 1) // 7
    g1 = e.user_id % 2 == 0
    s = e.event_type == "purchase"
    tab = pd.DataFrame(
        {
            "stratum": strat,
            "a": (g1 & s).astype(int),
            "b": (g1 & ~s).astype(int),
            "c": (~g1 & s).astype(int),
            "d": (~g1 & ~s).astype(int),
        }
    ).groupby("stratum").sum()
    tot = tab.sum(axis=1).astype(float)
    psi = (tab.a * tab.d / tot).sum() / (tab.b * tab.c / tot).sum()
    chi2 = dsum = vsum = 0.0
    for _, r in tab.iterrows():
        n1, n2, m1 = r.a + r.b, r.c + r.d, r.a + r.c
        qa, qb, qc = 1 - psi, (n2 - m1) + psi * (n1 + m1), -psi * n1 * m1
        disc = math.sqrt(qb * qb - 4 * qa * qc)
        root1 = (-qb + disc) / (2 * qa)
        lo, hi = max(0.0, m1 - n2), min(n1, m1)
        ae = (
            root1
            if lo - 1e-9 <= root1 <= hi + 1e-9
            else (-qb - disc) / (2 * qa)
        )
        v = 1 / (
            1 / ae + 1 / (n1 - ae) + 1 / (m1 - ae) + 1 / (n2 - m1 + ae)
        )
        chi2 += (r.a - ae) ** 2 / v
        dsum += r.a - ae
        vsum += v
    assert out.k == len(tab)
    assert out.df == len(tab) - 1
    assert abs(out.chi2 - round(chi2, 6)) < 1e-5
    assert abs(out.chi2_tarone - round(chi2 - dsum**2 / vsum, 6)) < 1e-5
    # Tarone's correction only ever shrinks the statistic
    assert out.chi2_tarone <= out.chi2 + 1e-9


def test_poisson_dispersion_brute(spark):
    out = q_poisson_dispersion(spark, SF).toPandas().iloc[0]
    x = _events().groupby("user_id").size().to_numpy(dtype=float)
    n, mean = len(x), x.mean()
    ssq = np.sum((x - mean) ** 2)
    d = ssq / mean
    df = n - 1
    z = ((d / df) ** (1 / 3) - (1 - 2 / (9 * df))) / math.sqrt(
        2 / (9 * df)
    )
    assert out.n == n
    assert abs(out["mean"] - round(mean, 4)) < 1e-6
    assert abs(out.var_ratio - round(ssq / df / mean, 6)) < 1e-6
    assert abs(out.chi2 - round(d, 4)) < 1e-4
    assert abs(out.z - round(z, 6)) < 1e-5
