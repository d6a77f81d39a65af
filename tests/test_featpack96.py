"""Semantic tests for feature-eng pack #96: exact Shapley features,
decile migration, Little's law audit (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _DM_W1,
    _DM_W4,
    _SH_CENTS,
    SESSION_GAP_S,
    q_decile_migration,
    q_littles_law,
    q_shapley_features,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["c"] = (e.value * 100).round().astype("int64")
    return e


def test_shapley_features_brute(spark):
    out = q_shapley_features(spark, SF).toPandas().set_index("feature")
    e = _events()
    fa = e.ts.dt.dayofweek.isin([5, 6])
    fb = e.c >= _SH_CENTS
    fc = e.ts.dt.hour >= 12
    y = (e.event_type == "purchase").astype(int)

    def v(*masks):
        m = np.ones(len(e), dtype=bool)
        for mm in masks:
            m &= mm.to_numpy()
        return y[m].mean()

    v0 = v()
    va, vb, vc = v(fa), v(fb), v(fc)
    vab, vac, vbc = v(fa, fb), v(fa, fc), v(fb, fc)
    vabc = v(fa, fb, fc)
    phi_a = (va - v0) / 3 + (vab - vb) / 6 + (vac - vc) / 6 + (
        vabc - vbc
    ) / 3
    phi_b = (vb - v0) / 3 + (vab - va) / 6 + (vbc - vc) / 6 + (
        vabc - vac
    ) / 3
    phi_c = (vc - v0) / 3 + (vac - va) / 6 + (vbc - vb) / 6 + (
        vabc - vab
    ) / 3
    assert abs(out.loc["weekend"].phi - round(phi_a, 6)) < 1e-6
    assert abs(out.loc["high_value"].phi - round(phi_b, 6)) < 1e-6
    assert abs(out.loc["afternoon"].phi - round(phi_c, 6)) < 1e-6
    # Shapley efficiency: contributions sum to v(N) - v(empty)
    assert abs((phi_a + phi_b + phi_c) - (vabc - v0)) < 1e-12
    assert abs(out.phi.sum() - (out.v_full.iloc[0] - out.v_empty.iloc[0])) < 1e-5


def test_decile_migration_brute(spark):
    out = q_decile_migration(spark, SF).toPandas()
    e = _events()
    e["d"] = e.ts.dt.day

    def deciles(lo, hi):
        per = (
            e[e.d.between(lo, hi)]
            .groupby("user_id")["c"]
            .sum()
            .reset_index()
            .sort_values(["c", "user_id"])
            .reset_index(drop=True)
        )
        n = len(per)
        per["dec"] = [math.ceil(10 * (i + 1) / n) for i in range(n)]
        return dict(zip(per.user_id, per.dec))

    d1 = deciles(*_DM_W1)
    d4 = deciles(*_DM_W4)
    from collections import Counter

    exp = Counter(
        (d1[u], d4[u]) for u in d1 if u in d4
    )
    got = {(r.d1, r.d4): r.n for r in out.itertuples()}
    assert got == dict(exp)
    for r in out.itertuples():
        assert r.stayed == int(r.d1 == r.d4)


def test_littles_law_brute(spark):
    out = q_littles_law(spark, SF).toPandas().iloc[0]
    e = _events()
    us = e.ts.astype("int64")
    HOUR = 3_600_000_000
    sessions = []
    for _, g in pd.DataFrame({"u": e.user_id, "us": us}).groupby("u"):
        ts = sorted(g.us)
        start = prev = ts[0]
        for t in ts[1:]:
            if t - prev > SESSION_GAP_S * 1_000_000:
                sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))
    n = len(sessions)
    dur = sum(t - s for s, t in sessions)
    lo, hi = int(us.min()), int(us.max())
    horizon = hi - lo
    hits = sum(
        max(0, t // HOUR - math.ceil(s / HOUR) + 1) for s, t in sessions
    )
    kmin, kmax = math.ceil(lo / HOUR), hi // HOUR
    assert out.n_sessions == n
    assert out.dur_us == dur
    assert out.horizon_us == horizon
    l_exact = dur / horizon
    l_samp = hits / (kmax - kmin + 1)
    assert abs(out.l_exact - round(l_exact, 6)) < 1e-9
    assert abs(out.l_sampled - round(l_samp, 6)) < 1e-9
    # Little's law identity: L = lambda * W exactly
    lam = n / (horizon / HOUR)
    w_s = dur / n / 1e6
    assert abs(l_exact - lam * w_s * 1e6 / HOUR) < 1e-12
