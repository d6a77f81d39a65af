"""Semantic tests for feature-eng pack #35: rank-biased overlap,
weighted Jaccard, Goh-Barabasi burstiness, Lorenz curve, first-K
cold-start profile, and dwell-time share (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from crawlfe.queries import (
    _FIRSTK,
    _RBO_K,
    _RBO_P,
    q_burstiness_gb,
    q_dwell_share,
    q_first_k_profile,
    q_lorenz_curve,
    q_rbo_overlap,
    q_weighted_jaccard,
)

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
        cents=lambda x: round(x.value * 100).astype("int64"),
    )


def _token_tables():
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    st = Counter()
    tot = Counter()
    for src, txt in zip(docs.source, docs.text):
        for t in txt.strip().split():
            st[(src, t)] += 1
            tot[t] += 1
    n_s = Counter()
    for (src, _), c in st.items():
        n_s[src] += c
    return st, tot, n_s, sum(tot.values())


def test_rbo_overlap_brute(spark):
    out = q_rbo_overlap(spark, SF).toPandas().set_index("source")
    st, tot, n_s, _ = _token_tables()
    cor = sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[:_RBO_K]
    cor_rank = {t: i + 1 for i, (t, _) in enumerate(cor)}
    for src in n_s:
        mine = sorted(
            ((t, c) for (s, t), c in st.items() if s == src),
            key=lambda kv: (-kv[1], kv[0]),
        )[:_RBO_K]
        src_rank = {t: i + 1 for i, (t, _) in enumerate(mine)}
        matches = [
            max(r, cor_rank[t])
            for t, r in src_rank.items()
            if t in cor_rank
        ]
        sum_ppb = sum(
            int(round(1e9 * _RBO_P ** (d - 1) / d))
            for m in matches
            for d in range(m, _RBO_K + 1)
        )
        rbo = (1.0 - _RBO_P) * sum_ppb / 1e9
        row = out.loc[src]
        assert row.k == _RBO_K
        assert row.overlap_k == len(matches)
        assert abs(row.rbo - _r6(rbo)) < 1e-12
        assert -1e-9 <= row.rbo <= 1.0 + 1e-9
        # direct-definition cross-check: (1-p) sum p^(d-1) X_d / d
        xd = [
            sum(1 for m in matches if m <= d)
            for d in range(1, _RBO_K + 1)
        ]
        direct = (1.0 - _RBO_P) * sum(
            _RBO_P ** (d - 1) * x / d for d, x in zip(range(1, 21), xd)
        )
        assert abs(row.rbo - direct) < 1e-5
    assert len(out) == len(n_s)


def test_weighted_jaccard_brute(spark):
    out = q_weighted_jaccard(spark, SF).toPandas().set_index("source")
    st, tot, n_s, n_all = _token_tables()
    for src in n_s:
        ns, nr = n_s[src], n_all - n_s[src]
        min_sum = max_sum = 0
        cr_seen = 0
        for (s, t), cs in st.items():
            if s != src:
                continue
            cr = tot[t] - cs
            cr_seen += cr
            ps, qs = cs * nr, cr * ns
            min_sum += min(ps, qs)
            max_sum += max(ps, qs)
        max_sum += (nr - cr_seen) * ns
        row = out.loc[src]
        assert row.n_s == ns
        assert abs(
            row.weighted_jaccard - _r6(min_sum / max_sum)
        ) < 1e-12
        assert 0.0 <= row.weighted_jaccard <= 1.0
    assert len(out) == len(n_s)


def test_burstiness_gb_brute(spark):
    out = q_burstiness_gb(spark, SF).toPandas().set_index("user_id")
    e = _events().sort_values(["user_id", "us", "event_id"])
    seen = 0
    for uid, g in e.groupby("user_id"):
        us = g.us.tolist()
        gaps = [(b - a) // 1_000_000 for a, b in zip(us, us[1:])]
        n = len(gaps)
        if n < 2:
            assert uid not in out.index
            continue
        s, s2 = sum(gaps), sum(x * x for x in gaps)
        varn = n * s2 - s * s
        if s <= 0 or varn < 0:
            assert uid not in out.index
            continue
        seen += 1
        mu = s / n
        sd = math.sqrt(varn / (n * (n - 1)))
        row = out.loc[uid]
        assert row.n_gaps == n
        assert abs(row.mean_gap_s - _r6(mu)) < 1e-12
        assert abs(row.burstiness - _r6((sd - mu) / (sd + mu))) < 1e-12
        assert -1.0 - 1e-9 <= row.burstiness <= 1.0 + 1e-9
    assert len(out) == seen


def test_lorenz_curve_brute(spark):
    out = (
        q_lorenz_curve(spark, SF)
        .toPandas()
        .set_index("decile")
        .sort_index()
    )
    e = _events()
    per = sorted(
        e.groupby("user_id").size().items(), key=lambda kv: (kv[1], kv[0])
    )
    n_users = len(per)
    n_events = sum(c for _, c in per)
    dec = Counter()
    dec_ev = Counter()
    for i, (_, c) in enumerate(per):
        d = (i * 10) // n_users + 1
        dec[d] += 1
        dec_ev[d] += c
    assert set(out.index) == set(dec)
    cum = 0
    for d in sorted(dec):
        cum += dec_ev[d]
        row = out.loc[d]
        assert row.n_users_d == dec[d]
        assert row.events_d == dec_ev[d]
        assert abs(row.share - _r6(dec_ev[d] / n_events)) < 1e-12
        assert abs(row.cum_share - _r6(cum / n_events)) < 1e-12
    # the curve ends at 1 and is convex in the per-user mean: users are
    # assigned to deciles sorted ascending by count, so mean events per
    # user is non-decreasing across deciles (total share need not be —
    # deciles can hold different user counts when 10 ∤ n_users)
    assert abs(out.cum_share.iloc[-1] - 1.0) < 2e-6
    per_user_mean = out.events_d / out.n_users_d
    assert per_user_mean.idxmax() == out.index.max()
    assert (per_user_mean.diff().dropna() >= -1e-9).all()


def test_first_k_profile_brute(spark):
    out = q_first_k_profile(spark, SF).toPandas().set_index("user_id")
    e = _events().sort_values(["user_id", "us", "event_id"])
    for uid, g in e.groupby("user_id"):
        h = g.head(_FIRSTK)
        row = out.loc[uid]
        assert row.n_events == len(h)
        assert row.n_types == h.event_type.nunique()
        assert row.n_clicks == int((h.event_type == "click").sum())
        assert row.total_cents == int(h.cents.sum())
        assert row.span_s == (
            int(h.us.max()) - int(h.us.min())
        ) // 1_000_000
    assert len(out) == e.user_id.nunique()


def test_dwell_share_brute(spark):
    out = q_dwell_share(spark, SF).toPandas().set_index("event_type")
    e = _events().sort_values(["user_id", "us", "event_id"])
    dwell = Counter()
    n_iv = Counter()
    for uid, g in e.groupby("user_id"):
        us = g.us.tolist()
        types = g.event_type.tolist()
        for i in range(len(us) - 1):
            w = (us[i + 1] - us[i]) // 1000
            dwell[types[i]] += w
            n_iv[types[i]] += 1
    total = sum(dwell.values())
    assert set(out.index) == set(dwell)
    for et in dwell:
        row = out.loc[et]
        assert row.n_intervals == n_iv[et]
        assert row.dwell_ms == dwell[et]
        assert abs(row.dwell_share - _r6(dwell[et] / total)) < 1e-12
    assert abs(out.dwell_share.sum() - 1.0) < 5e-6
