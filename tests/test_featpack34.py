"""Semantic tests for feature-eng pack #34: cross-series correlation
matrix, semi-additive month-end balances, time-to-convert,
abandonment rate, seasonal-naive MAE, and exact gap percentiles
(brute python replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from crawlfe.queries import (
    SESSION_GAP_S,
    q_abandonment,
    q_gap_percentiles,
    q_seasonal_naive_mae,
    q_semi_additive,
    q_time_to_convert,
    q_type_corr_matrix,
)

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
        d=lambda x: (
            x.ts.dt.normalize()
            .astype("datetime64[us]")
            .astype("int64")
            // DAY_US
        ),
        cents=lambda x: round(x.value * 100).astype("int64"),
    )


def _sessions_events():
    """[(user_id, [(us, event_id, event_type), ...] per session)]"""
    e = _events().sort_values(["user_id", "us", "event_id"])
    out = []
    for uid, g in e.groupby("user_id"):
        rows = list(zip(g.us, g.event_id, g.event_type))
        cur = [rows[0]]
        for r in rows[1:]:
            if r[0] - cur[-1][0] > SESSION_GAP_S * 1_000_000:
                out.append((uid, cur))
                cur = []
            cur.append(r)
        out.append((uid, cur))
    return out


def test_type_corr_matrix_brute(spark):
    out = q_type_corr_matrix(spark, SF).toPandas()
    e = _events()
    daily = {
        et: g.groupby("d").size().to_dict()
        for et, g in e.groupby("event_type")
    }
    types = sorted(daily)
    got = {
        (r.type_a, r.type_b): (r.n_days, r.corr)
        for r in out.itertuples()
    }
    expected = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            common = sorted(set(daily[ta]) & set(daily[tb]))
            xs = [daily[ta][d] for d in common]
            ys = [daily[tb][d] for d in common]
            n = len(common)
            sx, sy = sum(xs), sum(ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            sxx = sum(x * x for x in xs)
            syy = sum(y * y for y in ys)
            denx, deny = n * sxx - sx * sx, n * syy - sy * sy
            if n < 2 or denx <= 0 or deny <= 0:
                assert (ta, tb) not in got
                continue
            expected += 1
            nd, corr = got[(ta, tb)]
            assert nd == n
            want = (n * sxy - sx * sy) / math.sqrt(
                float(denx) * float(deny)
            )
            assert abs(corr - _r6(want)) < 1e-12
            assert -1.0 - 1e-9 <= corr <= 1.0 + 1e-9
    assert len(out) == expected


def test_semi_additive_brute(spark):
    out = q_semi_additive(spark, SF).toPandas().set_index("ym")
    e = _events().assign(
        ym=lambda x: x.ts.dt.year * 100 + x.ts.dt.month
    )
    bal = {}
    for (uid, ym), g in e.groupby(["user_id", "ym"]):
        g = g.sort_values(["us", "event_id"])
        bal[(uid, ym)] = int(g.cents.iloc[-1])
    per_ym = defaultdict(list)
    for (uid, ym), b in bal.items():
        per_ym[ym].append(b)
    assert set(out.index) == set(per_ym)
    for ym, bs in per_ym.items():
        row = out.loc[ym]
        assert row.n_users == len(bs)
        assert row.total_balance == sum(bs)
        assert row.max_balance == max(bs)


def test_time_to_convert_brute(spark):
    out = (
        q_time_to_convert(spark, SF).toPandas().set_index("user_id")
    )
    gaps_per_user = defaultdict(list)
    for uid, rows in _sessions_events():
        clicks = [us for us, _, et in rows if et == "click"]
        if not clicks:
            continue
        c0 = min(clicks)
        purchases = [
            us for us, _, et in rows if et == "purchase" and us >= c0
        ]
        if purchases:
            gaps_per_user[uid].append((min(purchases) - c0) // 1_000_000)
    assert set(out.index) == set(gaps_per_user)
    for uid, gaps in gaps_per_user.items():
        row = out.loc[uid]
        assert row.n_conversions == len(gaps)
        med = sorted(gaps)[(len(gaps) + 1) // 2 - 1]
        assert row.median_gap_s == med


def test_abandonment_brute(spark):
    out = q_abandonment(spark, SF).toPandas().set_index("user_id")
    stats = defaultdict(lambda: [0, 0])
    for uid, rows in _sessions_events():
        clicks = [us for us, _, et in rows if et == "click"]
        if not clicks:
            continue
        c0 = min(clicks)
        converted = any(
            et == "purchase" and us >= c0 for us, _, et in rows
        )
        stats[uid][0] += 1
        stats[uid][1] += int(converted)
    assert set(out.index) == set(stats)
    for uid, (n_click, n_conv) in stats.items():
        row = out.loc[uid]
        assert (row.click_sessions, row.converted_sessions) == (
            n_click,
            n_conv,
        )
        assert abs(
            row.abandonment_rate - _r6((n_click - n_conv) / n_click)
        ) < 1e-12


def test_seasonal_naive_mae_brute(spark):
    out = (
        q_seasonal_naive_mae(spark, SF).toPandas().set_index("event_type")
    )
    e = _events()
    for et, g in e.groupby("event_type"):
        daily = g.groupby("d").size().to_dict()
        pairs = [
            (daily[d + 7], daily[d]) for d in daily if d + 7 in daily
        ]
        if not pairs:
            assert et not in out.index
            continue
        n = len(pairs)
        abs_err = sum(abs(a - f) for a, f in pairs)
        actual_sum = sum(a for a, _ in pairs)
        row = out.loc[et]
        assert row.n_pairs == n
        assert abs(row.mae - _r6(abs_err / n)) < 1e-12
        assert abs(row.rel_mae - _r6(abs_err / actual_sum)) < 1e-12


def test_gap_percentiles_brute(spark):
    out = q_gap_percentiles(spark, SF).toPandas().set_index("user_id")
    e = _events().sort_values(["user_id", "us", "event_id"])
    seen = 0
    for uid, g in e.groupby("user_id"):
        us = g.us.tolist()
        gaps = sorted(
            (b - a) // 1_000_000 for a, b in zip(us, us[1:])
        )
        if not gaps:
            assert uid not in out.index
            continue
        seen += 1
        n = len(gaps)
        row = out.loc[uid]
        assert row.n_gaps == n
        assert row.p50_gap_s == gaps[(n + 1) // 2 - 1]
        assert row.p90_gap_s == gaps[(9 * n + 9) // 10 - 1]
        assert row.p50_gap_s <= row.p90_gap_s
    assert len(out) == seen
