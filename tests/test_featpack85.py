"""Semantic tests for feature-eng pack #85: bucketed interval-overlap
join, Hanley-McNeil AUC CI, Observation API metrics (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _OVL_TOPK,
    _Z95,
    q_auc_ci,
    q_interval_overlap,
    q_observe_metrics,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_interval_overlap_brute(spark):
    out = q_interval_overlap(spark, SF).toPandas()
    e = _events()
    us = e.ts.astype("int64")  # datetime64[us] -> already microseconds
    iv = (
        pd.DataFrame({"u": e.user_id, "d": e.ts.dt.date, "us": us})
        .groupby(["u", "d"])["us"]
        .agg(["min", "max"])
        .reset_index()
    )
    # brute force: all interval pairs across users (the bucketing is
    # an optimization, not a semantics change)
    agg = {}
    rows = list(iv.itertuples(index=False))
    for a, b in itertools.combinations(rows, 2):
        if a.u == b.u:
            continue
        ua, ub = (a, b) if a.u < b.u else (b, a)
        ov = min(ua.max, ub.max) - max(ua.min, ub.min)
        if ov > 0:
            k = (ua.u, ub.u)
            n, s = agg.get(k, (0, 0))
            agg[k] = (n + 1, s + ov)
    top = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))[:_OVL_TOPK]
    assert len(out) == min(_OVL_TOPK, len(agg))
    for row, (k, (n, s)) in zip(out.itertuples(index=False), top):
        assert (row.ua, row.ub) == k
        assert row.n_pairs == n
        assert row.overlap_us == s


def test_auc_ci_brute(spark):
    out = q_auc_ci(spark, SF).toPandas().iloc[0]
    e = _events()
    pos = e[e.event_type == "purchase"].value.to_numpy()
    neg = e[e.event_type == "click"].value.to_numpy()
    n1, n0 = len(pos), len(neg)
    # exact tie-credited Mann-Whitney numerator (x2)
    u2 = 0
    for p in pos:
        u2 += 2 * int((neg < p).sum()) + int((neg == p).sum())
    a = u2 / (2 * n1 * n0)
    q1 = a / (2 - a)
    q2 = 2 * a * a / (1 + a)
    se = math.sqrt(
        (a * (1 - a) + (n1 - 1) * (q1 - a * a) + (n0 - 1) * (q2 - a * a))
        / (n1 * n0)
    )
    assert (out.n1, out.n0, out.u2) == (n1, n0, u2)
    assert abs(out.auc - round(a, 6)) < 1e-6
    assert abs(out.se - round(se, 6)) < 1e-6
    assert abs(out.lo95 - round(a - _Z95 * se, 6)) < 1e-6
    assert abs(out.hi95 - round(a + _Z95 * se, 6)) < 1e-6
    assert out.lo95 <= out.auc <= out.hi95


def test_observe_metrics_brute(spark):
    out = q_observe_metrics(spark, SF).toPandas().iloc[0]
    e = _events()
    us = e.ts.astype("int64")  # datetime64[us] -> already microseconds
    assert out.n_rows == len(e)
    assert out.sum_cents == int((e.value * 100).round().astype("int64").sum())
    assert out.min_us == int(us.min())
    assert out.max_us == int(us.max())
