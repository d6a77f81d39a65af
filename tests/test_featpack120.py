"""Semantic tests for feature-eng pack #120: Cornish-Fisher p95,
Chebyshev/Cantelli audit, Box-Cox selection (brute replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _BC_LAMBDAS,
    _CF_P,
    _CF_Z,
    _CHEB_KS,
    q_box_cox,
    q_chebyshev_audit,
    q_cornish_fisher_q,
)

SF = "/root/testdata/sf0.001"


def _x():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    return (
        e.groupby("user_id")["cents"].sum().to_numpy(dtype="int64")
    )


def test_cornish_fisher_q_brute(spark):
    out = q_cornish_fisher_q(spark, SF).toPandas().iloc[0]
    x = _x().astype(float)
    m1 = x.mean()
    m2 = ((x - m1) ** 2).mean()
    g1 = ((x - m1) ** 3).mean() / m2**1.5
    g2 = ((x - m1) ** 4).mean() / m2**2 - 3
    z = _CF_Z
    zcf = (
        z
        + (z * z - 1) * g1 / 6
        + (z**3 - 3 * z) * g2 / 24
        - (2 * z**3 - 5 * z) * g1 * g1 / 36
    )
    qcf = m1 + math.sqrt(m2) * zcf
    xs = np.sort(x)
    pos = (len(xs) - 1) * _CF_P
    lo = int(np.floor(pos))
    frac = pos - lo
    qex = xs[lo] if frac == 0 else xs[lo] * (1 - frac) + xs[lo + 1] * frac
    assert out.n == len(x)
    assert abs(out["skew"] - round(g1, 6)) < 1e-5
    assert abs(out.kurt_ex - round(g2, 6)) < 1e-5
    assert abs(out.q95_cf - round(qcf, 4)) < 1e-2
    assert abs(out.q95_exact - round(qex, 4)) < 1e-6
    assert abs(out.rel_error - round((qcf - qex) / qex, 6)) < 1e-5


def test_chebyshev_audit_brute(spark):
    out = q_chebyshev_audit(spark, SF).toPandas().set_index("k")
    x = _x().astype(float)
    mu, sig = x.mean(), x.std()
    for k in _CHEB_KS:
        row = out.loc[k]
        two = np.mean(np.abs(x - mu) >= k * sig)
        up = np.mean(x - mu >= k * sig)
        assert row.n == len(x)
        assert abs(row.two_sided_mass - round(two, 6)) < 1e-9
        assert abs(row.upper_mass - round(up, 6)) < 1e-9
        assert abs(row.chebyshev - round(1 / k**2, 6)) < 1e-9
        assert abs(row.cantelli - round(1 / (1 + k**2), 6)) < 1e-9
        # the distribution-free bounds must actually hold
        assert two <= 1 / k**2 + 1e-12
        assert up <= 1 / (1 + k**2) + 1e-12


def test_box_cox_brute(spark):
    out = q_box_cox(spark, SF).toPandas().set_index("lam")
    x = _x().astype(float)
    n = len(x)
    slx = np.sum(np.log(x))
    lls = {}
    for lam in _BC_LAMBDAS:
        y = np.log(x) if lam == 0 else (x**lam - 1) / lam
        lls[lam] = -n / 2 * math.log(np.var(y)) + (lam - 1) * slx
    best = max(lls, key=lambda k: (lls[k], -k))
    for lam in _BC_LAMBDAS:
        row = out.loc[lam]
        assert row.n == n
        assert abs(row.loglik - round(lls[lam], 4)) < 1e-2
        assert bool(row.is_best) == (lam == best)
    assert out.is_best.sum() == 1
