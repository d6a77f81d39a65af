"""Semantic tests for feature-eng pack #33: time-weighted average,
OHLC bars, percent_rank/cume_dist windows, linear-interpolation gap
fill, activity streaks, and session paths (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from crawlfe.queries import (
    _PATH_LEN,
    SESSION_GAP_S,
    q_interp_linear,
    q_ohlc_bars,
    q_session_paths,
    q_streak_lengths,
    q_time_weighted_avg,
    q_win_percentile_dist,
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


def test_time_weighted_avg_brute(spark):
    out = (
        q_time_weighted_avg(spark, SF).toPandas().set_index("user_id")
    )
    seen = 0
    for uid, g in _events().groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        us = g.us.tolist()
        cents = g.cents.tolist()
        num = den = 0
        n = 0
        for i in range(len(us) - 1):
            w_ms = (us[i + 1] - us[i]) // 1000
            num += cents[i] * w_ms
            den += w_ms
            n += 1
        if den <= 0:
            assert uid not in out.index
            continue
        seen += 1
        row = out.loc[uid]
        assert row.n_intervals == n
        assert abs(row.twa_cents - _r6(num / den)) < 1e-12
    assert len(out) == seen


def test_ohlc_bars_brute(spark):
    out = q_ohlc_bars(spark, SF).toPandas().set_index(
        ["user_id", "d"]
    )
    e = _events()
    n_bars = 0
    for (uid, d), g in e.groupby(["user_id", "d"]):
        g = g.sort_values(["us", "event_id"])
        row = out.loc[(uid, d)]
        assert row.open == g.cents.iloc[0]
        assert row.close == g.cents.iloc[-1]
        assert row.high == g.cents.max()
        assert row.low == g.cents.min()
        assert row.n_events == len(g)
        assert row.low <= row.open <= row.high
        assert row.low <= row.close <= row.high
        n_bars += 1
    assert len(out) == n_bars


def test_win_percentile_dist_brute(spark):
    out = (
        q_win_percentile_dist(spark, SF)
        .toPandas()
        .set_index("event_id")
    )
    e = _events()
    for et, g in e.groupby("event_type"):
        cs = sorted(g.cents.tolist())
        n = len(cs)
        below = Counter()
        upto = Counter()
        for c in cs:
            upto[c] += 1
        run = 0
        for c in sorted(set(cs)):
            below[c] = run
            run += upto[c]
        for r in g.itertuples():
            row = out.loc[r.event_id]
            pr = below[r.cents] / (n - 1) if n > 1 else 0.0
            cd = (below[r.cents] + upto[r.cents]) / n
            assert abs(row.pct_rank - _r6(pr)) < 1e-12
            assert abs(row.cume - _r6(cd)) < 1e-12
    assert len(out) == len(e)


def test_interp_linear_brute(spark):
    out = (
        q_interp_linear(spark, SF)
        .toPandas()
        .set_index(["user_id", "d"])
    )
    e = _events()
    n_rows = 0
    for uid, g in e.groupby("user_id"):
        daily = g.groupby("d").cents.sum().sort_index()
        ds = daily.index.tolist()
        d0, d1 = ds[0], ds[-1]
        obs = dict(daily)
        for d in range(d0, d1 + 1):
            row = out.loc[(uid, d)]
            n_rows += 1
            if d in obs:
                assert row.is_observed
                assert abs(row.value_cents - obs[d]) < 1e-9
            else:
                assert not row.is_observed
                pd_ = max(x for x in ds if x < d)
                nd_ = min(x for x in ds if x > d)
                want = obs[pd_] + (obs[nd_] - obs[pd_]) * (d - pd_) / (
                    nd_ - pd_
                )
                assert abs(row.value_cents - _r6(want)) < 1e-12
                # interpolated value is between its brackets
                lo, hi = sorted((obs[pd_], obs[nd_]))
                assert lo - 1e-9 <= row.value_cents <= hi + 1e-9
    assert len(out) == n_rows


def test_streak_lengths_brute(spark):
    out = q_streak_lengths(spark, SF).toPandas().set_index("user_id")
    e = _events()
    for uid, g in e.groupby("user_id"):
        ds = sorted(set(g.d))
        streaks = []
        start = prev = ds[0]
        for d in ds[1:]:
            if d != prev + 1:
                streaks.append((start, prev))
                start = d
            prev = d
        streaks.append((start, prev))
        lens = [b - a + 1 for a, b in streaks]
        row = out.loc[uid]
        assert row.n_streaks == len(streaks)
        assert row.longest == max(lens)
        assert row.last_streak == lens[-1]
        assert row.active_days == len(ds)
    assert len(out) == e.user_id.nunique()


def test_session_paths_brute(spark):
    out = q_session_paths(spark, SF).toPandas().set_index("path")
    e = _events().sort_values(["user_id", "us", "event_id"])
    paths = Counter()
    for uid, g in e.groupby("user_id"):
        types = g.event_type.tolist()
        us = g.us.tolist()
        cur = [types[0]]
        for i in range(1, len(types)):
            if us[i] - us[i - 1] > SESSION_GAP_S * 1_000_000:
                paths[">".join(cur[:_PATH_LEN])] += 1
                cur = []
            cur.append(types[i])
        paths[">".join(cur[:_PATH_LEN])] += 1
    n_total = sum(paths.values())
    assert set(out.index) == set(paths)
    for p, cnt in paths.items():
        row = out.loc[p]
        assert row.n_sessions == cnt
        assert abs(row.share - _r6(cnt / n_total)) < 1e-12
    assert abs(out.share.sum() - 1.0) < 5e-6 * len(paths)
