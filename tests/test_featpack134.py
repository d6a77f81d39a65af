"""Semantic tests for feature-eng pack #134: weighted kappa,
Goodman-Kruskal gamma, Somers' D (brute pandas replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _ORD_K,
    q_ordinal_gamma,
    q_somers_d,
    q_weighted_kappa,
)

SF = "/root/testdata/sf0.001"


def _joint():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    e["day"] = e.ts.dt.day
    u = e.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "s1": int(g[g.day <= 15].cents.sum()),
                "s2": int(g[g.day > 15].cents.sum()),
            }
        ),
        include_groups=False,
    )
    n = len(u)

    def quint(s):
        order = u.sort_values([s]).index.tolist()
        # tie-break by user_id matches the engine's (value, user_id)
        order = sorted(u.index, key=lambda i: (u.loc[i, s], i))
        r = {}
        for pos, uid in enumerate(order, 1):
            r[uid] = math.ceil(pos * _ORD_K / n)
        return r

    r1, r2 = quint("s1"), quint("s2")
    return Counter((r1[i], r2[i]) for i in u.index), n


def _cd(joint):
    cc = dd = tx = ty = 0
    items = list(joint.items())
    for (i1, j1), c1 in items:
        for (i2, j2), c2 in items:
            if (i1 < i2 and j1 < j2) or (i1 > i2 and j1 > j2):
                cc += c1 * c2
            elif (i1 < i2 and j1 > j2) or (i1 > i2 and j1 < j2):
                dd += c1 * c2
            elif i1 == i2 and j1 != j2:
                tx += c1 * c2
            elif i1 != i2 and j1 == j2:
                ty += c1 * c2
    return cc // 2, dd // 2, tx // 2, ty // 2


def test_weighted_kappa_brute(spark):
    out = q_weighted_kappa(spark, SF).toPandas().iloc[0]
    joint, n = _joint()
    m1, m2 = Counter(), Counter()
    for (a, b), c in joint.items():
        m1[a] += c
        m2[b] += c
    wo = sum(
        ((a - b) / (_ORD_K - 1)) ** 2 * c / n
        for (a, b), c in joint.items()
    )
    we = sum(
        ((a - b) / (_ORD_K - 1)) ** 2 * m1[a] * m2[b] / n**2
        for a in m1
        for b in m2
    )
    assert out.n == n
    assert abs(out.w_observed - round(wo, 6)) < 1e-6
    assert abs(out.w_expected - round(we, 6)) < 1e-6
    assert abs(out.kappa_w - round(1 - wo / we, 6)) < 1e-5
    assert -1.0 - 1e-9 <= out.kappa_w <= 1.0 + 1e-9


def test_ordinal_gamma_brute(spark):
    out = q_ordinal_gamma(spark, SF).toPandas().iloc[0]
    joint, _ = _joint()
    cc, dd, _, _ = _cd(joint)
    assert (out.cc, out.dd) == (cc, dd)
    assert abs(out.gamma - round((cc - dd) / (cc + dd), 6)) < 1e-9


def test_somers_d_brute(spark):
    out = q_somers_d(spark, SF).toPandas().iloc[0]
    joint, _ = _joint()
    cc, dd, tx, ty = _cd(joint)
    assert abs(
        out.d_r2_given_r1 - round((cc - dd) / (cc + dd + ty), 6)
    ) < 1e-9
    assert abs(
        out.d_r1_given_r2 - round((cc - dd) / (cc + dd + tx), 6)
    ) < 1e-9
    taub = (cc - dd) / math.sqrt((cc + dd + tx) * (cc + dd + ty))
    assert abs(out.tau_b - round(taub, 6)) < 1e-9
    # tau_b lies between the two Somers' D values
    lo = min(out.d_r2_given_r1, out.d_r1_given_r2)
    hi = max(out.d_r2_given_r1, out.d_r1_given_r2)
    assert lo - 1e-9 <= out.tau_b <= hi + 1e-9
