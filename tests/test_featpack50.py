"""Semantic tests for feature-eng pack #50: JSONL source,
partitioned-sink pruned roundtrip, daily activity Gini, top-k
revenue share (brute python replicas; cross-engine parity is proven
by the check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_daily_gini,
    q_partitioned_roundtrip,
    q_scan_jsonl,
    q_value_share_topk,
)

SF = "/root/testdata/sf0.001"

WEIGHTS = {"view": 1, "click": 2, "signup": 3, "purchase": 5, "error": 0}


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        day=lambda x: x.ts.dt.day,
    )


def test_scan_jsonl_brute(spark):
    out = q_scan_jsonl(spark, SF).toPandas().set_index("event_type")
    e = _events()
    sizes = e.groupby("event_type").size()
    assert set(out.index) == set(WEIGHTS)
    for et, w in WEIGHTS.items():
        r = out.loc[et]
        assert r.weight == w
        assert r.n == sizes[et]
        assert r.weighted_n == w * sizes[et]


def test_partitioned_roundtrip_brute(spark):
    out = (
        q_partitioned_roundtrip(spark, SF).toPandas().set_index("day")
    )
    e = _events()
    p = e[e.event_type == "purchase"]
    g = p.groupby("day").agg(n=("cents", "size"), cents=("cents", "sum"))
    assert set(out.index) == set(g.index)
    for day, row in g.iterrows():
        r = out.loc[day]
        assert r.event_type == "purchase"
        assert r.n == row.n and r.cents == row.cents
        assert abs(r.mean_value - row.cents / (100.0 * row.n)) < 1e-9


def test_daily_gini_brute(spark):
    out = q_daily_gini(spark, SF).toPandas().set_index("event_type")
    e = _events()
    days = np.sort(e.day.unique())
    n = len(days)
    for et, g in e.groupby("event_type"):
        cd = g.groupby("day").size()
        c = np.sort(np.array([cd.get(d, 0) for d in days]))
        s = c.sum()
        gini = (2 * (np.arange(1, n + 1) * c).sum() - (n + 1) * s) / (
            n * s
        )
        r = out.loc[et]
        assert r.n_days == n and r.n_events == s
        assert abs(r.gini - gini) < 2e-6
        assert 0.0 <= r.gini < 1.0
    # gini of a constant series is exactly 0 (identity check)
    cc = np.full(30, 7)
    g0 = (2 * (np.arange(1, 31) * cc).sum() - 31 * cc.sum()) / (
        30 * cc.sum()
    )
    assert g0 == 0.0


def test_value_share_topk_brute(spark):
    out = q_value_share_topk(spark, SF).toPandas().set_index("k")
    e = _events()
    v = np.sort(
        e.loc[e.event_type == "purchase", "cents"].values
    )[::-1]
    tot = int(v.sum())
    for k in (10, 100, 1000):
        top = int(v[:k].sum())
        r = out.loc[k]
        assert r.n_purchases == len(v)
        assert r.total_value == tot / 100.0
        assert r.topk_value == top / 100.0
        assert abs(r.topk_share - top / tot) < 2e-6
    # shares are monotone in k and bounded by 1
    sh = out.sort_index().topk_share.values
    assert (np.diff(sh) >= -1e-9).all() and sh[-1] <= 1.0 + 1e-9
