"""Semantic tests for feature-eng pack #42: 1-D Wasserstein drift,
Haar wavelet energy pyramid, log-rank survival comparison, Friedman
blocked rank test, Jarque-Bera normality, delta-method ratio CI
(brute python replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_friedman_test,
    q_haar_energy,
    q_jarque_bera,
    q_logrank_test,
    q_ratio_delta_ci,
    q_wasserstein_1d,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
    )


def test_wasserstein_1d_brute(spark):
    out = q_wasserstein_1d(spark, SF).toPandas().set_index("day")
    e = _events()
    e = e[e.event_type.isin(["purchase", "click"])].assign(
        day=e.ts.dt.day
    )
    for day, g in e.groupby("day"):
        p = np.sort(g.loc[g.event_type == "purchase", "cents"].values)
        c = np.sort(g.loc[g.event_type == "click", "cents"].values)
        if len(p) == 0 or len(c) == 0:
            assert day not in out.index
            continue
        # independent formulation: W1 between empirical dists =
        # integral |F_p - F_c| over the merged support, in value units
        grid = np.unique(np.concatenate([p, c]))
        fp = np.searchsorted(p, grid, side="right") / len(p)
        fc = np.searchsorted(c, grid, side="right") / len(c)
        w1 = float(np.sum(np.abs(fp - fc)[:-1] * np.diff(grid)) / 100.0)
        r = out.loc[day]
        assert r.n_purchase == len(p)
        assert r.n_click == len(c)
        assert abs(r.w1_value - w1) < 2e-6
    # drift metric sanity: identical dists give 0
    x = np.array([1.0, 2.0, 3.0])
    g = np.unique(x)
    f = np.searchsorted(x, g, side="right") / 3
    assert np.sum(np.abs(f - f)[:-1] * np.diff(g)) == 0.0


def test_haar_energy_brute_and_parseval(spark):
    out = q_haar_energy(spark, SF).toPandas()
    e = _events()
    lo, hi = e.us.min(), e.us.max()
    for et, g in e.groupby("event_type"):
        b = np.minimum((g.us.values - lo) * 32 // (hi - lo + 1), 31)
        s = np.bincount(b, minlength=32).astype(object)  # exact ints
        energies = {}
        lvl = s
        for level in range(1, 6):
            d = lvl[0::2] - lvl[1::2]
            energies[level] = float(sum(int(x) * int(x) for x in d)) / (
                2**level
            )
            lvl = lvl[0::2] + lvl[1::2]
        tot = sum(energies.values())
        sub = out[out.event_type == et].set_index("level")
        assert set(sub.index) == {1, 2, 3, 4, 5}
        for level in range(1, 6):
            assert abs(sub.loc[level, "energy"] - energies[level]) < 2e-6
            assert (
                abs(sub.loc[level, "energy_share"] - energies[level] / tot)
                < 2e-6
            )
        # Parseval: detail energies + mean energy == sum of squares
        n_tot = int(s.sum())
        parseval = tot + n_tot * n_tot / 32.0
        assert abs(parseval - float(sum(int(x) * int(x) for x in s))) < 1e-6


def test_logrank_brute(spark):
    out = q_logrank_test(spark, SF).toPandas().iloc[0]
    e = _events().sort_values(["user_id", "us", "event_id"])
    rows = []
    for uid, g in e.groupby("user_id"):
        t0 = g.us.iloc[0]
        buys = g.loc[g.event_type == "purchase", "us"]
        if len(buys):
            t, ev = buys.min() - t0, 1
        else:
            t, ev = g.us.max() - t0, 0
        rows.append((uid % 2, t, ev))
    dur = pd.DataFrame(rows, columns=["g", "t", "ev"])
    bt = (
        dur.groupby("t")
        .apply(
            lambda x: pd.Series(
                {
                    "d1": int(x.loc[x.g == 1, "ev"].sum()),
                    "d": int(x.ev.sum()),
                    "x1": int((x.g == 1).sum()),
                    "x": len(x),
                }
            ),
            include_groups=False,
        )
        .sort_index()
    )
    # at-risk = everyone with T >= t (descending suffix sums)
    bt["n1"] = bt.x1[::-1].cumsum()[::-1]
    bt["n"] = bt.x[::-1].cumsum()[::-1]
    bt = bt[(bt.d > 0) & (bt.n > 1)]
    obs1 = bt.d1.sum()
    exp1 = (bt.d * bt.n1 / bt.n).sum()
    var1 = (
        bt.d * bt.n1 / bt.n * (1 - bt.n1 / bt.n) * (bt.n - bt.d)
        / (bt.n - 1)
    ).sum()
    assert out.n_times == len(bt)
    assert out.obs1 == obs1
    assert abs(out.exp1 - exp1) < 2e-6
    assert abs(out.var1 - var1) < 2e-6
    assert abs(out.z - (obs1 - exp1) / math.sqrt(var1)) < 2e-6
    assert abs(out.chi2 - (obs1 - exp1) ** 2 / var1) < 2e-6
    # A/A split on a deterministic arm: |z| should not be extreme
    assert abs(out.z) < 10


def test_friedman_brute(spark):
    out = q_friedman_test(spark, SF).toPandas().set_index("event_type")
    e = _events()
    ut = (
        e.groupby(["user_id", "event_type"])
        .agg(s=("cents", "sum"), n=("cents", "size"))
        .reset_index()
    )
    k = e.event_type.nunique()
    counts = ut.groupby("user_id").size()
    complete = counts[counts == k].index
    utc = ut[ut.user_id.isin(complete)]
    rank_sum2 = {}
    for uid, g in utc.groupby("user_id"):
        means = list(zip(g.event_type, g.s, g.n))
        for et, s, n in means:
            less = sum(1 for _, s2, n2 in means if s2 * n < s * n2)
            eq = sum(
                1
                for et2, s2, n2 in means
                if s2 * n == s * n2 and et2 != et
            )
            rank_sum2[et] = rank_sum2.get(et, 0) + 2 + 2 * less + eq
    nb = len(complete)
    sr2 = sum(v * v for v in rank_sum2.values())
    q_stat = 3.0 / (nb * k * (k + 1)) * sr2 - 3.0 * nb * (k + 1)
    for et in rank_sum2:
        r = out.loc[et]
        assert r.n_blocks == nb
        assert r.rank_sum2 == rank_sum2[et]
        assert abs(r.mean_rank - rank_sum2[et] / (2 * nb)) < 2e-6
        assert abs(r.q_stat - q_stat) < 2e-6
        assert (
            abs(r.p_chi2_df4 - math.exp(-q_stat / 2) * (1 + q_stat / 2))
            < 2e-6
        )
    # doubled average ranks over k items sum to k*(k+1) per block
    assert sum(rank_sum2.values()) == nb * k * (k + 1)


def test_jarque_bera_brute_exact(spark):
    out = q_jarque_bera(spark, SF).toPandas().set_index("event_type")
    e = _events()
    for et, g in e.groupby("event_type"):
        n = len(g)
        mu = float(g.cents.sum()) / (100.0 * n)
        dq = np.floor((g.value.values - mu) * 1e4 + 0.5).astype(object)
        dq = [int(x) for x in dq]
        c2 = sum(x * x for x in dq)
        c3 = sum(x * x * x for x in dq)
        c4 = sum(x * x * x * x for x in dq)
        m2 = float(c2) / n / 1e8
        skew = math.floor(
            (float(c3) / n / 1e12) / (m2 * math.sqrt(m2)) * 1e6 + 0.5
        ) / 1e6
        exk = math.floor(
            ((float(c4) / n / 1e16) / (m2 * m2) - 3.0) * 1e6 + 0.5
        ) / 1e6
        jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
        r = out.loc[et]
        assert r.n == n
        # engine-exact contract: bit-identical, not just allclose
        assert r.skewness == skew
        assert r.excess_kurtosis == exk
        assert r.jb_stat == math.floor(jb * 1e6 + 0.5) / 1e6
        assert r.p_chi2_df2 == math.floor(
            math.exp(-jb / 2.0) * 1e6 + 0.5
        ) / 1e6


def test_ratio_delta_ci_brute(spark):
    out = q_ratio_delta_ci(spark, SF).toPandas().iloc[0]
    e = _events()
    pu = e.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "y": g.loc[g.event_type == "purchase", "cents"].sum()
                / 100.0,
                "m": float(len(g)),
            }
        ),
        include_groups=False,
    )
    nu = len(pu)
    r = pu.y.sum() / pu.m.sum()
    my, mm = pu.y.mean(), pu.m.mean()
    vy = (pu.y**2).mean() - my * my
    vm = (pu.m**2).mean() - mm * mm
    cym = (pu.y * pu.m).mean() - my * mm
    se = math.sqrt((vy - 2 * r * cym + r * r * vm) / (nu * mm * mm))
    assert out.n_users == nu
    assert abs(out.ratio - r) < 2e-6
    assert abs(out.se_delta - se) < 2e-6
    assert abs(out.ci_lo - (r - 1.96 * se)) < 2e-6
    assert abs(out.ci_hi - (r + 1.96 * se)) < 2e-6
    # the delta-method CI must bracket the point estimate
    assert out.ci_lo < out.ratio < out.ci_hi
