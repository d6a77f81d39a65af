"""Semantic tests for feature-eng pack #132: segmented ITS, Pettitt
changepoint, Chow test (brute numpy replicas; cross-engine parity
is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _BRK_T0,
    q_chow_test,
    q_its_segmented,
    q_pettitt_test,
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
    return d.index.to_numpy(dtype=float), d.to_numpy(dtype=float)


def _ols(t, y):
    b = ((t * y).mean() - t.mean() * y.mean()) / (
        (t * t).mean() - t.mean() ** 2
    )
    a = y.mean() - b * t.mean()
    rss = len(t) * (
        ((y * y).mean() - y.mean() ** 2)
        - ((t * y).mean() - t.mean() * y.mean()) ** 2
        / ((t * t).mean() - t.mean() ** 2)
    )
    return a, b, rss


def test_its_segmented_brute(spark):
    out = q_its_segmented(spark, SF).toPandas().iloc[0]
    t, y = _daily()
    pre, post = t < _BRK_T0, t >= _BRK_T0
    a0, b0, _ = _ols(t[pre], y[pre])
    a1, b1, _ = _ols(t[post], y[post])
    jump = a1 + b1 * _BRK_T0 - (a0 + b0 * _BRK_T0)
    assert abs(out.pre_slope - round(b0, 4)) < 1e-3
    assert abs(out.post_slope - round(b1, 4)) < 1e-3
    assert abs(out.level_jump_at_t0 - round(jump, 4)) < 1e-2
    assert abs(out.slope_change - round(b1 - b0, 4)) < 1e-3


def test_pettitt_test_brute(spark):
    out = q_pettitt_test(spark, SF).toPandas().iloc[0]
    t, y = _daily()
    n = len(y)
    days = t.astype(int)
    best = None
    for tcut in days:
        u = 0
        for i in range(n):
            for j in range(n):
                if days[i] <= tcut < days[j]:
                    u += np.sign(y[i] - y[j])
        if best is None or (abs(u), -tcut) > (abs(best[1]), -best[0]):
            if best is None or abs(u) > abs(best[1]) or (
                abs(u) == abs(best[1]) and tcut < best[0]
            ):
                best = (tcut, u)
    tcut, u = best
    p = 2 * math.exp(-6 * u * u / (n**3 + n**2))
    assert out.change_day == tcut
    assert abs(out.k_stat - round(abs(u), 1)) < 1e-9
    assert abs(out.p_approx - round(p, 6)) < 1e-6


def test_chow_test_brute(spark):
    out = q_chow_test(spark, SF).toPandas().iloc[0]
    t, y = _daily()
    pre, post = t < _BRK_T0, t >= _BRK_T0
    _, _, rss1 = _ols(t[pre], y[pre])
    _, _, rss2 = _ols(t[post], y[post])
    _, _, rssp = _ols(t, y)
    n = len(t)
    f = ((rssp - rss1 - rss2) / 2) / ((rss1 + rss2) / (n - 4))
    assert out.n == n
    assert abs(out.chow_f - round(f, 6)) < 1e-3
    # split RSS never exceeds pooled
    assert out.rss_split_per_n <= out.rss_pooled_per_n + 1e-9
