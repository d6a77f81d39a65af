"""Semantic tests for feature-eng pack #87: co-bucketed no-shuffle
join (with plan pin), planted near-dup detector eval, Page-Hinkley
drift detector (brute python replicas; cross-engine parity is proven
by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _ND_MOD,
    _ND_OFF,
    _PH_LAMBDA_E4,
    q_bucketed_join,
    q_neardup_eval,
    q_page_hinkley,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_values_and_plan(spark):
    out = (
        q_bucketed_join(spark, SF).toPandas().set_index("source").sort_index()
    )
    d = pd.read_parquet(f"{SF}/documents.parquet")
    d["q_e4"] = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 10000
        for i in d.doc_id
    ]
    for src, g in d.groupby("source"):
        row = out.loc[src]
        assert row.n == len(g)
        assert row.sum_chars == g.n_chars.sum()
        assert row.sum_q_e4 == g.q_e4.sum()
        assert abs(row.avg_q - round(g.q_e4.sum() / (len(g) * 1e4), 6)) < 1e-9
    # THE POINT of bucketing: the join of the two co-bucketed tables
    # runs with no Exchange on either side (layout paid the shuffle).
    # hint("merge") emulates the at-scale planner choice — at the test
    # tier the scores table is small enough to auto-broadcast instead
    j = spark.table("crawlfe_bkt_docs").hint("merge").join(
        spark.table("crawlfe_bkt_scores"), "doc_id"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # and the scans are bucket-aware
    assert "Bucketed: true" in plan, plan


def test_neardup_eval_brute(spark):
    out = q_neardup_eval(spark, SF).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet")
    n_truth = int((d.doc_id % _ND_MOD).isin([0, 1]).sum())
    assert out.n_truth == n_truth
    # exact copies differ by zero bits -> hamming 0: every %5==0 pair
    # MUST be found (recall floor), so recall is strictly positive and
    # at least the exact-copy share
    n_exact = int((d.doc_id % _ND_MOD == 0).sum())
    assert out.n_hit >= n_exact
    assert out.recall >= n_exact / n_truth - 1e-9
    assert 0 < out.precision <= 1
    p, r = out.precision, out.recall
    assert abs(out.f1 - round(2 * p * r / (p + r), 6)) < 1e-4


def test_page_hinkley_brute(spark):
    out = q_page_hinkley(spark, SF).toPandas().set_index("day").sort_index()
    e = pd.read_parquet(f"{SF}/events.parquet")
    cents = (e.value * 100).round().astype("int64")
    daily = (
        pd.DataFrame({"day": e.ts.dt.day, "c": cents})
        .groupby("day")["c"]
        .agg(["sum", "count"])
        .sort_index()
    )
    def _rhalf(v):
        # Spark/DuckDB round(double) is half-AWAY-FROM-ZERO; a term
        # at sf0.001 lands exactly on -.5, so the direction matters
        return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)

    x = np.array(
        [
            _rhalf(1e4 * s / c)
            for s, c in zip(daily["sum"], daily["count"])
        ],
        dtype=np.int64,
    )
    cum = np.cumsum(x)
    t = np.arange(1, len(x) + 1)
    term = np.array(
        [_rhalf(xi - ci / ti) for xi, ci, ti in zip(x, cum, t)],
        dtype=np.int64,
    )
    ph = np.cumsum(term)
    ph_min = np.minimum.accumulate(ph)
    alarm = (ph - ph_min > _PH_LAMBDA_E4).astype(int)
    assert len(out) == len(daily)
    assert (out.ph_e4.to_numpy() == ph).all()
    assert (out.alarm.to_numpy() == alarm).all()
    for i, day in enumerate(daily.index):
        assert abs(out.loc[day].x_cents - round(x[i] / 1e4, 4)) < 1e-9
    # the first day's term is identically 0 (x_1 == mean of first 1)
    assert ph[0] == 0
