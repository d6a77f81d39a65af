"""Semantic + plan tests for feature-eng pack #11: the last TPC-H
shapes on this column subset (Q2/Q9/Q11/Q12/Q20 — all 22 classic
shapes now present in the registry) and the per-domain document cap.
Cross-engine parity is proven by the check_entry sweeps; these pin
semantics (brute pandas replicas) and plan shapes."""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd


def _half_up(x: float) -> int:
    """Spark/DuckDB round() for doubles: decimal-string HALF_UP (repr
    is the shortest round-trip form, same as Java's Double.toString) —
    pandas' .round() is half-even and disagrees on exact .5 ties."""
    return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))

from crawlfe.queries import (
    q_domain_cap,
    q_tpch_q2,
    q_tpch_q11,
    q_tpch_q12,
    q_tpch_q20,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _li_part(p_type: str):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")
    keys = set(p.loc[p["p_type"] == p_type, "p_partkey"])
    return li[li["l_partkey"].isin(keys)].copy()


def test_tpch_q2_min_cost_supplier_brute(spark):
    out = q_tpch_q2(spark, SF).toPandas()
    j = _li_part("LARGE")
    j["uc"] = (
        (100 * j["l_extendedprice"] / j["l_quantity"])
        .map(_half_up)
        .astype("int64")
    )
    cost = (
        j.groupby(["l_partkey", "l_suppkey"])["uc"].min().reset_index()
    )
    cost["min_uc"] = cost.groupby("l_partkey")["uc"].transform("min")
    best = cost[cost["uc"] == cost["min_uc"]]
    want = {
        (r.l_partkey, r.l_suppkey): round(r.uc / 100.0, 2)
        for r in best.itertuples()
    }
    got = {
        (r.p_partkey, r.s_suppkey): r.supplycost for r in out.itertuples()
    }
    assert got == want


def test_tpch_q11_threshold_brute(spark):
    out = q_tpch_q11(spark, SF).toPandas().set_index("l_partkey")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    keep = set(s.loc[s["s_nationkey"].isin([0, 1, 2]), "s_suppkey"])
    j = li[li["l_suppkey"].isin(keep)].copy()
    j["cents"] = (
        (j["l_extendedprice"] * 100).map(_half_up).astype("int64")
    )
    val = j.groupby("l_partkey")["cents"].sum()
    total = val.sum()
    want = val[val * 2000 > total]
    assert set(out.index) == set(want.index)
    for pk, cents in want.items():
        assert out.loc[pk, "part_value"] == round(cents / 100.0, 2)


def test_tpch_q12_late_by_priority_brute(spark):
    out = q_tpch_q12(spark, SF).toPandas().set_index("ship_year")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    j = li.merge(
        o[["o_orderkey", "o_orderdate", "o_orderpriority"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    j = j[
        (j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=90))
        & j["l_shipdate"].dt.year.isin([1996, 1997])
    ]
    j["hi"] = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    g = j.groupby(j["l_shipdate"].dt.year)["hi"]
    for yr, cnt in g.count().items():
        assert out.loc[yr, "high_line_count"] == g.sum()[yr]
        assert out.loc[yr, "low_line_count"] == cnt - g.sum()[yr]
    assert set(out.index) == set(g.count().index)


def test_tpch_q20_dominant_supplier_brute(spark):
    out = q_tpch_q20(spark, SF).toPandas()
    j = _li_part("ECONOMY")
    j["qty"] = j["l_quantity"].astype("int64")
    ps = j.groupby(["l_partkey", "l_suppkey"])["qty"].sum().reset_index()
    ps["total"] = ps.groupby("l_partkey")["qty"].transform("sum")
    want = set(ps.loc[ps["qty"] * 2 > ps["total"], "l_suppkey"])
    assert set(out["s_suppkey"]) == want
    assert len(out) == len(want)  # distinct


def test_domain_cap_deterministic_and_capped(spark):
    out = q_domain_cap(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    # cap respected per source
    per_src = out.groupby("source").size()
    assert (per_src <= 10).all()
    # every source with >=10 docs is fully used
    avail = docs.groupby("source").size()
    for src, n in avail.items():
        assert per_src.get(src, 0) == min(n, 10)
    # the kept set is exactly the md5-order prefix (engine-independent)
    docs = docs.copy()
    docs["h"] = docs["doc_id"].map(
        lambda d: hashlib.md5(str(d).encode()).hexdigest()
    )
    docs = docs.sort_values(["source", "h", "doc_id"])
    docs["rn"] = docs.groupby("source").cumcount() + 1
    want = set(docs.loc[docs["rn"] <= 10, "doc_id"])
    assert set(out["doc_id"]) == want
    # stable across reruns
    out2 = q_domain_cap(spark, SF).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id", ignore_index=True),
        out2.sort_values("doc_id", ignore_index=True),
    )


def test_pack11_plan_shapes(spark):
    # Q2/Q20: decorrelated to agg + window — lineitem scanned ONCE
    for q in (q_tpch_q2, q_tpch_q20):
        p = plan_of(q(spark, SF))
        assert p.count("lineitem.parquet") == 1, q.__name__
        assert "CartesianProduct" not in p
    # Q11: the per-part agg feeds BOTH the threshold total and the
    # output — it must be materialized once (ExistingRDD from the lazy
    # localCheckpoint), never two aggregation passes over lineitem
    p11 = plan_of(q_tpch_q11(spark, SF))
    assert p11.count("lineitem.parquet") == 0
    assert "ExistingRDD" in p11
    assert "BroadcastExchange" in p11
