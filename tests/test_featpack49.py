"""Semantic tests for feature-eng pack #49: sketch-accuracy audit,
session-gap sweep, multi-touch attribution, Tukey-Kramer post-hoc,
trim-level sweep, funnel step significance (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_attribution_multi,
    q_funnel_significance,
    q_session_gap_sweep,
    q_sketch_error_eval,
    q_trim_sweep,
    q_tukey_kramer,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
    )


def test_sketch_error_eval_bounds(spark):
    out = q_sketch_error_eval(spark, SF).toPandas().set_index(
        "event_type"
    )
    e = _events()
    for et, g in e.groupby("event_type"):
        r = out.loc[et]
        # exact sides must match a pandas recomputation exactly
        assert r.exact_users == g.user_id.nunique()
        assert r.n == len(g)
        med = float(np.median(g.cents.values)) / 100.0
        assert abs(r.exact_p50 - med) < 1e-9
        # observed sketch errors sit inside their advertised bounds
        # (HLL++ rsd=0.05 -> 3 sigma; GK accuracy=100 -> 1% of rank)
        assert r.hll_rel_err <= 0.15
        assert r.gk_rel_err <= 0.10
        assert r.approx_users > 0 and r.approx_p50 > 0


def test_session_gap_sweep_brute(spark):
    out = q_session_gap_sweep(spark, SF).toPandas().set_index("gap_s")
    e = _events().sort_values(["user_id", "us", "event_id"])
    gaps = e.groupby("user_id").us.diff()
    n_users = e.user_id.nunique()
    for gap_s in (900, 1800, 3600):
        starts = int(
            (gaps.isna() | (gaps > gap_s * 1_000_000)).sum()
        )
        r = out.loc[gap_s]
        assert r.n_sessions == starts
        assert r.n_users == n_users
        assert abs(r.sessions_per_user - starts / n_users) < 2e-6
        assert abs(r.mean_session_events - len(e) / starts) < 2e-6
    # a bigger gap can only merge sessions
    s = out.sort_index().n_sessions.values
    assert s[0] >= s[1] >= s[2]


def test_attribution_multi_brute(spark):
    out = q_attribution_multi(spark, SF).toPandas().set_index(
        "event_type"
    )
    e = _events()
    buys = e[e.event_type == "purchase"]
    touches = e[e.event_type != "purchase"]
    fir = defaultdict(float)
    las = defaultdict(float)
    lin = defaultdict(float)
    ush = defaultdict(float)
    cnt = defaultdict(int)
    bt = touches.sort_values(["us", "event_id"])
    for _, b in buys.iterrows():
        p = bt[
            (bt.user_id == b.user_id)
            & (bt.us < b.us)
            & (bt.us >= b.us - 7 * 86400 * 1_000_000)
        ]
        n = len(p)
        if n == 0:
            continue
        types = p.event_type.tolist()
        fir[types[0]] += 1.0
        las[types[-1]] += 1.0
        for t in types:
            lin[t] += 1.0 / n
            cnt[t] += 1
        if n == 1:
            ush[types[0]] += 1.0
        elif n == 2:
            ush[types[0]] += 0.5
            ush[types[1]] += 0.5
        else:
            ush[types[0]] += 0.4
            ush[types[-1]] += 0.4
            for t in types[1:-1]:
                ush[t] += 0.2 / (n - 2)
    for et in cnt:
        r = out.loc[et]
        assert r.n_touches == cnt[et]
        assert abs(r.first_touch - fir[et]) < 2e-6
        assert abs(r.last_touch - las[et]) < 2e-6
        assert abs(r.linear - lin[et]) < 1e-4
        assert abs(r.u_shaped - ush[et]) < 1e-4
    # every credit model hands out the same total budget
    total = sum(fir.values())
    assert abs(sum(lin.values()) - total) < 1e-6
    assert abs(sum(ush.values()) - total) < 1e-6


def test_tukey_kramer_brute(spark):
    out = q_tukey_kramer(spark, SF).toPandas().set_index(
        ["type_a", "type_b"]
    )
    e = _events()
    groups = {
        et: g.cents.values / 100.0 for et, g in e.groupby("event_type")
    }
    k = len(groups)
    nn = sum(len(v) for v in groups.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in groups.values())
    mse = ssw / (nn - k)
    types = sorted(groups)
    assert len(out) == k * (k - 1) // 2
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            va, vb = groups[a], groups[b]
            md = abs(va.mean() - vb.mean())
            q = md / math.sqrt(
                mse / 2.0 * (1.0 / len(va) + 1.0 / len(vb))
            )
            r = out.loc[(a, b)]
            assert r.n_a == len(va) and r.n_b == len(vb)
            assert r.df_within == nn - k
            assert abs(r.mean_diff - md) < 2e-6
            assert abs(r.q_stat - q) < 2e-5


def test_trim_sweep_brute(spark):
    out = q_trim_sweep(spark, SF).toPandas().set_index("alpha_pct")
    e = _events()
    v = np.sort(e.loc[e.event_type == "purchase", "cents"].values)
    n = len(v)
    for a in (1, 5, 10, 25):
        k = n * a // 100
        kept = v[k: n - k]
        r = out.loc[a]
        assert r.n == n and r.k_cut == k
        assert r.n_kept == len(kept)
        assert abs(r.trimmed_mean - kept.mean() / 100.0) < 2e-6
    # heavier trims move the mean monotonically toward the median
    med = np.median(v) / 100.0
    d = (out.sort_index().trimmed_mean - med).abs().values
    assert d[-1] <= d[0] + 1e-6


def test_funnel_significance_brute(spark):
    out = q_funnel_significance(spark, SF).toPandas().set_index("step")
    e = _events()
    steps = ["view", "click", "signup", "purchase"]
    pres = e[e.event_type.isin(steps)].groupby("user_id").event_type
    reach = pres.nunique()
    r = [int((reach >= s).sum()) for s in (1, 2, 3, 4)]
    assert list(out.sort_index().n_users.values) == r
    for s in (2, 3, 4):
        conv = r[s - 1] / r[s - 2]
        assert abs(out.loc[s, "conv_from_prev"] - conv) < 2e-6
    for s in (3, 4):
        p1 = r[s - 2] / r[s - 3]
        p2 = r[s - 1] / r[s - 2]
        pool = (r[s - 2] + r[s - 1]) / (r[s - 3] + r[s - 2])
        var = pool * (1 - pool) * (1 / r[s - 3] + 1 / r[s - 2])
        z = out.loc[s, "z_vs_prev_step"]
        if var == 0:
            assert pd.isna(z)
        else:
            assert abs(z - (p1 - p2) / math.sqrt(var)) < 2e-6
