"""Semantic tests for feature-eng pack #66: crawl-ops & planner
statistics (brute pandas replicas)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _SALT_CAP,
    _SALT_TARGET,
    _SLA_HOURS,
    q_freshness_sla,
    q_join_cardinality_est,
    q_recrawl_priority,
    q_salt_plan,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_recrawl_priority_brute(spark):
    out = q_recrawl_priority(spark, SF).toPandas().set_index("user_id")
    ev = _events()
    wm = ev["ts"].max()
    for uid, g in ev.groupby("user_id"):
        n = len(g)
        nv = g["value"].nunique()
        cr = nv / n
        stale_h = (wm - g["ts"].max()).total_seconds() / 3600.0
        row = out.loc[uid]
        assert row["n_fetches"] == n and row["n_values"] == nv
        assert abs(row["change_rate"] - round(cr, 6)) < 1e-9
        assert abs(row["staleness_h"] - round(stale_h, 4)) < 1e-6
        assert (
            abs(row["priority"] - round(cr * math.log1p(stale_h), 4)) < 1e-6
        )
    # freshest entity has priority 0 (staleness 0)
    freshest = ev.groupby("user_id")["ts"].max().idxmax()
    assert out.loc[freshest, "priority"] == 0.0


def test_salt_plan_brute(spark):
    out = q_salt_plan(spark, SF).toPandas().set_index("user_id")
    ev = _events()
    n = ev.groupby("user_id").size()
    expect = np.minimum(np.ceil(n / _SALT_TARGET).astype(int), _SALT_CAP)
    hot = expect[expect > 1]
    assert set(out.index) == set(hot.index)
    for uid in hot.index:
        assert out.loc[uid, "salt_k"] == hot[uid]
        assert out.loc[uid, "n_rows"] == n[uid]
    assert (out["salt_k"] <= _SALT_CAP).all()
    assert len(out) <= n.size


def test_join_cardinality_est_brute(spark):
    out = q_join_cardinality_est(spark, SF).toPandas().iloc[0]
    ev = _events()
    c = ev[ev.event_type == "click"].groupby("user_id").size()
    b = ev[ev.event_type == "purchase"].groupby("user_id").size()
    both = c.index.intersection(b.index)
    assert out["n_matched_keys"] == len(both)
    assert out["left_rows_matched"] == c[both].sum()
    assert out["right_rows_matched"] == b[both].sum()
    est = int((c[both] * b[both]).sum())
    assert out["est_join_rows"] == est
    # the statistic equals the TRUE join cardinality for an equi join
    true_rows = len(
        ev[ev.event_type == "click"].merge(
            ev[ev.event_type == "purchase"], on="user_id"
        )
    )
    assert est == true_rows


def test_freshness_sla_brute(spark):
    out = q_freshness_sla(spark, SF).toPandas().set_index("event_type")
    ev = _events()
    wm = ev["ts"].max()
    for et, g in ev.groupby("event_type"):
        last = g.groupby("user_id")["ts"].max()
        stale = (
            (wm - last).dt.total_seconds() > _SLA_HOURS * 3600
        ).sum()
        row = out.loc[et]
        assert row["n_entities"] == len(last)
        assert row["n_stale"] == stale
        assert abs(row["stale_share"] - round(stale / len(last), 4)) < 1e-9
