"""Semantic tests for feature-eng pack #101: extremal index, GPD
return level, tail dependence (brute python replicas; cross-engine
parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _EI_GAP_US,
    _RL_M,
    q_extremal_index,
    q_gpd_return_level,
    q_tail_dependence,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["us"] = e.ts.astype("int64")
    e["cents"] = (e.value * 100).round().astype("int64")
    return e


def _u90(cents):
    s = np.sort(cents.to_numpy())
    n = len(s)
    return int(s[(9 * n + 9) // 10 - 1]), n


def test_extremal_index_brute(spark):
    out = q_extremal_index(spark, SF).toPandas().iloc[0]
    e = _events()
    u, n = _u90(e.cents)
    exc = e[e.cents > u].sort_values(["us", "event_id"])
    gaps = exc.us.diff()
    clusters = int((gaps.isna() | (gaps > _EI_GAP_US)).sum())
    assert (out.u_cents, out.n, out.n_exc) == (u, n, len(exc))
    assert out.n_clusters == clusters
    assert abs(out.theta - round(clusters / len(exc), 6)) < 1e-9
    assert 0 < out.theta <= 1


def test_gpd_return_level_brute(spark):
    out = q_gpd_return_level(spark, SF).toPandas().iloc[0]
    e = _events()
    u, n = _u90(e.cents)
    y = e.cents[e.cents > u] - u
    k = len(y)
    s1, s2 = int(y.sum()), int((y.astype(object) ** 2).sum())
    m = s1 / k
    v = (s2 - s1 * m) / (k - 1)
    ratio = m * m / v
    xi = (1 - ratio) / 2
    sigma = m * (1 + ratio) / 2
    zeta = k / n
    rl = u + sigma / xi * ((_RL_M * zeta) ** xi - 1)
    assert (out.u_cents, out.k) == (u, k)
    assert abs(out.xi - round(xi, 6)) < 1e-9
    assert abs(out.sigma_cents - round(sigma, 4)) < 1e-6
    assert abs(out.rl_1000_cents - round(rl, 4)) < 1e-2
    # the 1000-observation return level sits above the threshold
    assert out.rl_1000_cents > u


def test_tail_dependence_brute(spark):
    out = q_tail_dependence(spark, SF).toPandas().iloc[0]
    e = _events()
    ud = (
        e.assign(d=e.ts.dt.day)
        .groupby(["user_id", "d"])
        .agg(x=("cents", "sum"), y=("cents", "size"))
        .reset_index()
    )
    n = len(ud)

    def q_at(col, dec):
        s = ud.sort_values([col, "user_id", "d"]).reset_index(drop=True)
        return int(s[col].iloc[math.ceil(dec * n / 10) - 1])

    qx90, qy90 = q_at("x", 9), q_at("y", 9)
    qx10, qy10 = q_at("x", 1), q_at("y", 1)
    njU = int(((ud.x > qx90) & (ud.y > qy90)).sum())
    nyU = int((ud.y > qy90).sum())
    njL = int(((ud.x <= qx10) & (ud.y <= qy10)).sum())
    nyL = int((ud.y <= qy10).sum())
    assert (out.n, out.qx90, out.qy90) == (n, qx90, qy90)
    assert (out.n_joint_u, out.n_y_u) == (njU, nyU)
    assert abs(out.lambda_upper - round(njU / nyU, 6)) < 1e-9
    if nyL:
        assert abs(out.lambda_lower - round(njL / nyL, 6)) < 1e-9
    assert 0 <= out.lambda_upper <= 1
