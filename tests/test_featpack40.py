"""Semantic tests for feature-eng pack #40: Kruskal-Wallis H,
trimmed/winsorized/midhinge robust location, Theil inequality
decomposition, decile lift/gains, Brier decomposition, and order-3
permutation entropy (brute python replicas; cross-engine parity is
proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_brier_decomp,
    q_decile_lift,
    q_kruskal_wallis,
    q_perm_entropy,
    q_theil_index,
    q_trimmed_stats,
)

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
    )


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_kruskal_wallis_brute(spark):
    out = q_kruskal_wallis(spark, SF).toPandas().set_index("event_type")
    e = _events()
    # scipy-free replica: average ranks over the pooled sample
    pooled = e[["event_type", "cents"]].copy()
    pooled["rank"] = pooled.cents.rank(method="average")
    n_tot = len(pooled)
    s = 0.0
    for et, g in pooled.groupby("event_type"):
        n_i = len(g)
        r_i = float(g["rank"].sum())
        s += r_i * r_i / n_i
        row = out.loc[et]
        assert row.n == n_i
        # doubled rank sum is exactly 2 * rank sum
        assert row.rank_sum2 == int(round(2 * r_i))
        assert abs(row.mean_rank - _r6(r_i / n_i)) < 2e-6
    h = 12.0 / (n_tot * (n_tot + 1)) * s - 3.0 * (n_tot + 1)
    tie3 = sum(
        t**3 - t for t in Counter(pooled.cents).values()
    )
    h_adj = h / (1.0 - tie3 / (n_tot**3 - n_tot))
    p = math.exp(-h_adj / 2.0) * (1.0 + h_adj / 2.0)
    assert (out.h_adj - _r6(h_adj)).abs().max() < 2e-6
    assert (out.p_chi2_df4 - _r6(p)).abs().max() < 2e-6
    # ranks over all rows must cover 1..N: sum of rank sums = N(N+1)/2
    assert out.rank_sum2.sum() == n_tot * (n_tot + 1)


def test_trimmed_stats_brute(spark):
    out = q_trimmed_stats(spark, SF).toPandas().set_index("event_type")
    e = _events().sort_values(["cents", "event_id"])
    for et, g in e.groupby("event_type"):
        v = g.sort_values(["cents", "event_id"]).cents.to_numpy()
        n = len(v)
        k = n // 10
        mid = v[k : n - k]
        trimmed = mid.sum() / (100.0 * (n - 2 * k))
        lo, hi = v[k], v[n - k - 1]
        winsor = (mid.sum() + k * lo + k * hi) / (100.0 * n)
        q1 = v[(n + 3) // 4 - 1]
        q3 = v[(3 * n + 1) // 4 - 1]
        midhinge = (q1 + q3) / 200.0
        r = out.loc[et]
        assert r.n == n
        assert abs(r.trimmed_mean - _r6(trimmed)) < 2e-6
        assert abs(r.winsor_mean - _r6(winsor)) < 2e-6
        assert abs(r.midhinge - _r6(midhinge)) < 2e-6
        # winsorizing clamps tails toward the middle: both robust
        # means live inside the raw min/max
        assert v[0] / 100.0 - 1e-9 <= r.trimmed_mean <= v[-1] / 100.0


def test_theil_index_brute(spark):
    out = q_theil_index(spark, SF).toPandas().set_index("source")
    d = _docs()
    d = d[d.n_chars > 0]
    ts, tn = d.n_chars.sum(), len(d)
    mu = ts / tn
    shares = []
    for src, g in d.groupby("source"):
        x = g.n_chars.to_numpy(dtype=float)
        mu_i = x.mean()
        t_i = float(np.mean(x / mu_i * np.log(x / mu_i)))
        share = x.sum() / ts
        between = share * math.log(mu_i / mu)
        r = out.loc[src]
        assert r.n_docs == len(g)
        assert abs(r.mean_chars - _r6(mu_i)) < 2e-6
        assert abs(r.theil_within - _r6(t_i)) < 2e-6
        assert abs(r.value_share - _r6(share)) < 2e-6
        assert abs(r.between_term - _r6(between)) < 2e-6
        assert r.theil_within >= -1e-9  # Theil T is non-negative
        shares.append(share)
    assert abs(sum(shares) - 1.0) < 1e-9


def test_decile_lift_brute(spark):
    out = q_decile_lift(spark, SF).toPandas().set_index("decile")
    e = _events()
    pc = e[e.event_type.isin(["purchase", "click"])].copy()
    pc["pos"] = (pc.event_type == "purchase").astype(int)
    pc = pc.sort_values(["cents", "event_id"], ascending=[False, True])
    n = len(pc)
    pc["decile"] = [(i * 10) // n + 1 for i in range(n)]
    tp = pc.pos.sum()
    cum = 0
    for dec, g in pc.groupby("decile"):
        r = out.loc[dec]
        assert r.n == len(g)
        assert r.n_pos == g.pos.sum()
        assert abs(r.pos_rate - _r6(g.pos.sum() / len(g))) < 1e-12
        cum += g.pos.sum()
        assert abs(r.cum_capture - _r6(cum / tp)) < 1e-12
        lift = (g.pos.sum() / len(g)) / (tp / n)
        assert abs(r.lift - _r6(lift)) < 2e-6
    assert len(out) == 10
    # capture is monotone and ends at 1
    cc = out.sort_index().cum_capture
    assert (cc.diff().dropna() >= -1e-12).all()
    assert abs(cc.iloc[-1] - 1.0) < 1e-9


def test_brier_decomp_brute(spark):
    out = q_brier_decomp(spark, SF).toPandas().set_index("bin")
    e = _events()
    pc = e[e.event_type.isin(["purchase", "click"])].copy()
    pc["p"] = 1.0 / (1.0 + np.exp(-(pc.value - 35.0) / 20.0))
    pc["o"] = (pc.event_type == "purchase").astype(int)
    pc["bin"] = np.minimum(np.floor(pc.p * 10), 9).astype(int)
    n = len(pc)
    obar = pc.o.mean()
    brier = float(np.mean((pc.p - pc.o) ** 2))
    rel = res = 0.0
    for b, g in pc.groupby("bin"):
        r = out.loc[b]
        assert r.n == len(g)
        assert abs(r.mean_pred - _r6(g.p.mean())) < 2e-6
        assert abs(r.obs_rate - _r6(g.o.mean())) < 2e-6
        rel += len(g) * (g.p.mean() - g.o.mean()) ** 2
        res += len(g) * (g.o.mean() - obar) ** 2
    rel, res = rel / n, res / n
    unc = obar * (1 - obar)
    assert (out.brier - _r6(brier)).abs().max() < 2e-6
    assert (out.reliability - _r6(rel)).abs().max() < 2e-6
    assert (out.resolution - _r6(res)).abs().max() < 2e-6
    assert (out.uncertainty - _r6(unc)).abs().max() < 2e-6
    # Murphy identity holds to binning error: REL - RES + UNC ~ brier
    assert abs((rel - res + unc) - brier) < 0.05


def test_perm_entropy_brute(spark):
    out = q_perm_entropy(spark, SF).toPandas().set_index("pattern")
    e = _events().sort_values(["user_id", "us", "event_id"])
    pats: Counter = Counter()
    for _, g in e.groupby("user_id"):
        v = g.cents.to_list()
        for i in range(len(v) - 2):
            a, b, c = v[i], v[i + 1], v[i + 2]
            ra = int(a > b) + int(a > c)
            rb = int(b >= a) + int(b > c)
            rc = int(c >= a) + int(c >= b)
            pats[f"{ra}{rb}{rc}"] += 1
    tt = sum(pats.values())
    ent = -sum(
        (k / tt) * math.log(k / tt) for k in pats.values()
    ) / math.log(6.0)
    assert set(out.index) == set(pats)
    for pat, cnt in pats.items():
        r = out.loc[pat]
        assert r.n_triples == cnt
        assert abs(r.share - _r6(cnt / tt)) < 1e-12
    assert (out.perm_entropy_norm - _r6(ent)).abs().max() < 2e-6
    # every pattern id is a permutation of {0,1,2}
    for pat in out.index:
        assert sorted(pat) == ["0", "1", "2"]
    assert 0.0 <= out.perm_entropy_norm.iloc[0] <= 1.0 + 1e-9
