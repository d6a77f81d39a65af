"""Semantic tests for feature-eng pack #100: state-carrying as-of
features — decayed spend, sliding 7-day count, k-th recency (brute
pandas replicas over the raw event stream; cross-engine parity is
proven by the check_entry sweeps).  The brute replicas recompute the
features from FIRST PRINCIPLES (scan the full prior history per
probe), so they also prove the prefix-state factorization is exact
and leakage-free."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _KTH,
    _TAU_H,
    q_asof_count_window,
    q_asof_decay_feature,
    q_asof_kth_recent,
)

SF = "/root/testdata/sf0.001"
HOUR = 3_600_000_000


def _rhalf(v):
    return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)


def _frames():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["us"] = e.ts.astype("int64")
    e["cents"] = (e.value * 100).round().astype("int64")
    clicks = e[e.event_type == "click"]
    purch = e[e.event_type == "purchase"].sort_values(["us", "event_id"])
    return e, clicks, purch


def test_asof_decay_feature_brute(spark):
    out = (
        q_asof_decay_feature(spark, SF)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    e, clicks, purch = _frames()
    lo = e.us.min()
    # the engine's statistic: exp(-t/tau) * cumsum of e6-rounded terms
    assert len(out) == len(clicks)
    for _, c in clicks.iterrows():
        prior = purch[
            (purch.user_id == c.user_id) & (purch.us <= c.us)
        ]
        cum = sum(
            _rhalf(
                1e6
                * math.exp(((p.us - lo) / HOUR) / _TAU_H)
                * p.cents
                / 100.0
            )
            for _, p in prior.iterrows()
        )
        feat = (
            math.exp(-((c.us - lo) / HOUR) / _TAU_H) * cum / 1e6
        )
        got = out.loc[c.event_id]
        assert got.click_ts_us == c.us
        assert abs(got.decayed_spend - round(feat, 4)) < 1e-3
        # leakage-free and nonnegative by construction
        assert got.decayed_spend >= 0
        # decayed sum never exceeds the raw prior spend (dollars)
        assert got.decayed_spend <= prior.cents.sum() / 100 + 1e-6


def test_asof_count_window_brute(spark):
    out = (
        q_asof_count_window(spark, SF)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    e, clicks, purch = _frames()
    W7 = 7 * 86_400_000_000
    assert len(out) == len(clicks)
    for _, c in clicks.iterrows():
        n = int(
            (
                (purch.user_id == c.user_id)
                & (purch.us <= c.us)
                & (purch.us > c.us - W7)
            ).sum()
        )
        assert out.loc[c.event_id].n_purch_7d == n


def test_asof_kth_recent_brute(spark):
    out = (
        q_asof_kth_recent(spark, SF)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    e, clicks, purch = _frames()
    assert len(out) == len(clicks)
    for _, c in clicks.iterrows():
        prior = purch[
            (purch.user_id == c.user_id) & (purch.us <= c.us)
        ].sort_values(["us", "event_id"])
        got = out.loc[c.event_id]
        assert got.n_prior == len(prior)
        if len(prior) >= _KTH:
            kth_us = prior.us.iloc[len(prior) - _KTH]
            assert got.gap3_us == c.us - kth_us
            assert got.gap3_us >= 0  # leakage-free
        else:
            assert pd.isna(got.gap3_us)
