"""Semantic tests for feature-eng pack #52: share-of-parent rollup,
session-size histogram, cohort LTV (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_cohort_ltv,
    q_session_size_hist,
    q_share_of_parent,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        day=lambda x: x.ts.dt.day,
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
    )


def test_share_of_parent_brute(spark):
    out = q_share_of_parent(spark, SF).toPandas().set_index(
        ["source", "lang"]
    )
    d = pd.read_parquet(f"{SF}/documents.parquet")
    cell = d.groupby(["source", "lang"]).size()
    src = d.groupby("source").size()
    total = len(d)
    assert len(out) == len(cell)
    for (s, lg), n in cell.items():
        r = out.loc[(s, lg)]
        assert r.n == n
        assert r.n_source == src[s]
        assert r.n_total == total
        assert abs(r.share_of_source - n / src[s]) < 2e-6
        assert abs(r.source_share_of_total - src[s] / total) < 2e-6
    # shares within each source sum to 1
    sums = out.groupby(level=0).share_of_source.sum()
    assert ((sums - 1.0).abs() < 1e-4).all()


def test_session_size_hist_brute(spark):
    out = q_session_size_hist(spark, SF).toPandas().set_index(
        "size_bucket"
    )
    e = _events().sort_values(["user_id", "us", "event_id"])
    gaps = e.groupby("user_id").us.diff()
    start = gaps.isna() | (gaps > 1800 * 1_000_000)
    sid = start.cumsum()
    sizes = sid.groupby(sid).size()

    def bucket(sz):
        if sz == 1:
            return "1"
        if sz == 2:
            return "2"
        if sz <= 5:
            return "3-5"
        if sz <= 10:
            return "6-10"
        return "11+"

    bh = sizes.map(bucket)
    tot = len(sizes)
    for b in bh.unique():
        r = out.loc[b]
        assert r.n_sessions == int((bh == b).sum())
        assert r.n_events == int(sizes[bh == b].sum())
        assert abs(r.session_share - (bh == b).sum() / tot) < 2e-6
    # the histogram partitions all events
    assert out.n_events.sum() == len(e)
    assert out.n_sessions.sum() == tot


def test_cohort_ltv_brute(spark):
    out = q_cohort_ltv(spark, SF).toPandas().set_index("quartile")
    e = _events()
    buys = e[e.event_type == "purchase"]
    w1 = (
        buys[buys.day <= 7]
        .groupby("user_id")
        .cents.sum()
        .rename("w1")
        .reset_index()
        .sort_values(["w1", "user_id"])
        .reset_index(drop=True)
    )
    n = len(w1)
    rn = np.arange(1, n + 1)
    q = np.where(
        rn * 4 <= n, 1, np.where(rn * 2 <= n, 2, np.where(rn * 4 <= 3 * n, 3, 4))
    )
    w1["quartile"] = q
    month = buys.groupby("user_id").cents.sum().rename("m")
    j = w1.merge(month, on="user_id")
    for qt, g in j.groupby("quartile"):
        r = out.loc[qt]
        assert r.n_users == len(g)
        assert abs(r.mean_w1_spend - g.w1.sum() / (100.0 * len(g))) < 2e-6
        assert (
            abs(r.mean_month_spend - g.m.sum() / (100.0 * len(g))) < 2e-6
        )
        assert abs(r.month_over_w1 - g.m.sum() / g.w1.sum()) < 2e-6
    # month spend can never be below week-1 spend (superset period)
    assert (out.month_over_w1 >= 1.0 - 1e-9).all()
