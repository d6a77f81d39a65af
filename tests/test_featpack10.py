"""Semantic + plan tests for feature-eng pack #10: the remaining TPC-H
shapes on this column subset (Q7/Q8/Q15/Q17/Q21), fixed-point PageRank,
rolling median, MAD outliers, last-touch attribution, and
domain-conditional boilerplate detection. Cross-engine parity is proven
by the check_entry sweeps; these pin semantics (brute pandas/numpy
replicas) and plan shapes."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_attribution,
    q_boilerplate_para,
    q_mad_outliers,
    q_pagerank,
    q_rolling_median,
    q_tpch_q7,
    q_tpch_q15,
    q_tpch_q17,
    q_tpch_q21,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pagerank_matches_integer_recurrence(spark):
    """The Spark loop must reproduce the exact int64 fixed-point
    recurrence (floor div throughout) — bit-identical, not allclose."""
    out = q_pagerank(spark, SF).toPandas().set_index("doc_id")["rank_e12"]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(docs)
    src = np.arange(n, dtype=np.int64)
    dst = np.concatenate([(src * 7 + 3) % n, (src * 13 + 5) % n])
    srcs = np.concatenate([src, src])
    base = np.int64(15_000_000_000_000 // (100 * n))
    r = np.full(n, 10**12 // n, dtype=np.int64)
    for _ in range(3):
        contrib = np.zeros(n, dtype=np.int64)
        np.add.at(contrib, dst, r[srcs] // 2)
        r = base + (85 * contrib) // 100
    assert len(out) == n
    assert (out.sort_index().to_numpy() == r).all()
    # total mass conserved up to floor-division truncation
    assert 10**12 * 0.99 < r.sum() <= 10**12


def test_tpch_q15_top_supplier_brute(spark):
    out = q_tpch_q15(spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    m = (li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1996-04-01")
    cents = (
        (li.loc[m, "l_extendedprice"] * (1 - li.loc[m, "l_discount"]) * 100)
        .round()
        .astype("int64")
    )
    rev = cents.groupby(li.loc[m, "l_suppkey"]).sum()
    best = rev[rev == rev.max()]
    assert set(out["s_suppkey"]) == set(best.index)
    assert (out["total_revenue"] == round(rev.max() / 100.0, 2)).all()


def test_tpch_q17_small_quantity_brute(spark):
    out = q_tpch_q17(spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")
    eco = set(p.loc[p["p_type"] == "ECONOMY", "p_partkey"])
    j = li[li["l_partkey"].isin(eco)].copy()
    j["qty"] = j["l_quantity"].astype("int64")
    g = j.groupby("l_partkey")["qty"]
    j["sum_qty"] = g.transform("sum")
    j["cnt"] = g.transform("count")
    small = j[j["qty"] * j["cnt"] * 5 < j["sum_qty"]]
    assert len(out) == 1
    assert out["avg_yearly"].iloc[0] == round(
        small["l_extendedprice"].sum() / 7.0, 4
    )


def test_tpch_q21_waiting_suppliers_brute(spark):
    out = q_tpch_q21(spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    j = li.merge(
        o[o["o_orderstatus"] == "F"][["o_orderkey", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    j["late"] = (
        j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=60)
    ).astype(int)
    ps = (
        j.groupby(["l_orderkey", "l_suppkey"])["late"].max().reset_index()
    )
    g = ps.groupby("l_orderkey")
    ps["n_supp"] = g["l_suppkey"].transform("count")
    ps["n_late"] = g["late"].transform("sum")
    wait = ps[(ps["late"] == 1) & (ps["n_supp"] > 1) & (ps["n_late"] == 1)]
    brute = (
        wait.groupby("l_suppkey")
        .size()
        .sort_values(ascending=False)
        .reset_index(name="numwait")
        .sort_values(
            ["numwait", "l_suppkey"], ascending=[False, True]
        )
        .head(20)
    )
    got = out[["s_suppkey", "numwait"]].reset_index(drop=True)
    want = brute.rename(columns={"l_suppkey": "s_suppkey"}).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_rolling_median_brute(spark):
    out = (
        q_rolling_median(spark, SF)
        .toPandas()
        .sort_values(["user_id", "ts_us", "event_id"], ignore_index=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"], ignore_index=True)
    med = (
        ev.groupby("user_id")["value"]
        .rolling(window=5, min_periods=1)
        .median()
        .round(4)
        .reset_index(drop=True)
    )
    assert (out["roll_med"] == med).all()


def test_mad_outliers_brute(spark):
    out = q_mad_outliers(spark, SF).toPandas().set_index("lang")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for lang, grp in docs.groupby("lang"):
        x = grp["n_chars"].astype(float).to_numpy()
        med = np.median(x)
        ad = np.abs(x - med)
        mad = np.median(ad)
        assert out.loc[lang, "n_docs"] == len(x)
        assert out.loc[lang, "n_outliers"] == int((ad > 3.0 * mad).sum())
        assert out.loc[lang, "med_chars"] == round(med, 1)
        assert out.loc[lang, "mad_chars"] == round(mad, 1)


def test_attribution_last_touch_brute(spark):
    out = q_attribution(spark, SF).toPandas().set_index("channel")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    pur = ev[ev["event_type"] == "purchase"].copy()
    clk = ev[ev["event_type"] == "click"].copy()
    clk["channel"] = (
        clk["props"].str.extract(r'"k": (\d+)')[0].astype(int) % 5
    )
    clk = (
        clk.groupby(["user_id", "ts"])["channel"].max().reset_index()
    )
    m = pd.merge_asof(
        pur.sort_values("ts"),
        clk.sort_values("ts").rename(columns={"ts": "click_ts"}),
        left_on="ts",
        right_on="click_ts",
        by="user_id",
        tolerance=pd.Timedelta(days=7),
    )
    m["channel"] = m["channel"].fillna(-1).astype(int)
    brute = m.groupby("channel").agg(
        n_purchases=("value", "size"), revenue=("value", "sum")
    )
    assert set(out.index) == set(brute.index)
    for ch in brute.index:
        assert out.loc[ch, "n_purchases"] == brute.loc[ch, "n_purchases"]
        assert out.loc[ch, "revenue"] == round(brute.loc[ch, "revenue"], 4)
    # purchases are partitioned across channels exactly once
    assert out["n_purchases"].sum() == len(pur)


def test_boilerplate_para_brute(spark):
    out = q_boilerplate_para(spark, SF).toPandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    # replicate the 10-word chunking + domain-conditional threshold
    rows = []
    for _, d in docs.iterrows():
        w = d["text"].strip().split()
        for i in range(0, (len(w) + 9) // 10):
            rows.append(
                (d["doc_id"], d["source"], " ".join(w[i * 10:i * 10 + 10]))
            )
    ch = pd.DataFrame(rows, columns=["doc_id", "source", "chunk"])
    nd = ch.groupby(["source", "chunk"])["doc_id"].nunique()
    n_docs = docs.groupby("source")["doc_id"].nunique()
    for doc_id, grp in ch.groupby("doc_id"):
        src = grp["source"].iloc[0]
        flags = [
            int(
                nd[(src, c)] >= 2
                and nd[(src, c)] * 10 >= n_docs[src] * 3
            )
            for c in grp["chunk"]
        ]
        assert out.loc[doc_id, "n_chunks"] == len(flags)
        assert out.loc[doc_id, "n_boiler"] == sum(flags)
        assert out.loc[doc_id, "boiler_ratio"] == round(
            sum(flags) / len(flags), 4
        )


def test_pack10_plan_shapes(spark):
    # Q7: nation dims must broadcast, fact joins shuffle
    p7 = plan_of(q_tpch_q7(spark, SF))
    assert "BroadcastHashJoin" in p7
    assert "CartesianProduct" not in p7
    # Q17: the correlated-avg rewrite must scan lineitem ONCE (window,
    # not self-join)
    p17 = plan_of(q_tpch_q17(spark, SF))
    assert p17.count("lineitem.parquet") == 1
    assert "Window" in p17
    # rolling median runs as a JVM window aggregate — no Python eval
    pm = plan_of(q_rolling_median(spark, SF))
    assert "Window" in pm
    assert "ArrowEvalPython" not in pm and "BatchEvalPython" not in pm
    # pagerank: per-iteration shuffled hash aggregation, never cartesian
    pr = plan_of(q_pagerank(spark, SF))
    assert "CartesianProduct" not in pr
