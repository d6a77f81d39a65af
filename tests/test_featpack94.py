"""Semantic tests for feature-eng pack #94: applyInArrow grouped
kernel, DataFrame.transpose, EXCEPT/INTERSECT ALL multiset semantics
(brute python replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from crawlfe.queries import (
    _SO_BUCKET,
    q_df_transpose,
    q_grouped_arrow,
    q_set_ops_all,
)

SF = "/root/testdata/sf0.001"


def test_grouped_arrow_brute(spark):
    out = (
        q_grouped_arrow(spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["c"] = (e.value * 100).round().astype("int64")
    for et, g in e.groupby("event_type"):
        row = out.loc[et]
        assert row.n == len(g)
        assert row.sum_cents == g.c.sum()
        assert row.min_cents == g.c.min()
        assert row.max_cents == g.c.max()
        assert abs(row.mean_cents - round(g.c.sum() / len(g), 4)) < 1e-9


def test_df_transpose_brute(spark):
    out = q_df_transpose(spark, SF).toPandas().set_index("metric")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    per = d.groupby("source").agg(
        n_docs=("doc_id", "size"), n_chars=("n_chars", "sum")
    )
    assert set(out.index) == {"n_docs", "kchars"}
    for src, r in per.iterrows():
        assert out.loc["n_docs", src] == r.n_docs
        assert out.loc["kchars", src] == r.n_chars // 1000
    # transpose produced one column per source plus the metric key
    assert len(out.columns) == d.source.nunique()


def test_set_ops_all_brute(spark):
    out = q_set_ops_all(spark, SF).toPandas()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    d["b"] = d.n_chars // _SO_BUCKET
    lo = Counter(
        (l, b) for l, b in zip(d.lang[d.doc_id % 2 == 0], d.b[d.doc_id % 2 == 0])
    )
    hi = Counter(
        (l, b) for l, b in zip(d.lang[d.doc_id % 2 == 1], d.b[d.doc_id % 2 == 1])
    )
    ex = lo - hi  # multiset difference
    ia = lo & hi  # multiset intersection
    got_ex = {
        (r.lang, r.b): r.n for r in out[out.op == "except_all"].itertuples()
    }
    got_ia = {
        (r.lang, r.b): r.n
        for r in out[out.op == "intersect_all"].itertuples()
    }
    assert got_ex == {k: v for k, v in ex.items() if v > 0}
    assert got_ia == {k: v for k, v in ia.items() if v > 0}
    # multiset identity: |lo| = |lo - hi| + |lo n hi|
    assert sum(lo.values()) == sum(ex.values()) + sum(ia.values())
