"""Semantic tests for feature-eng pack #29: Kaplan-Meier
time-to-repeat hazard table, brand basket pairs, per-source prefix
templates, supplier revenue HHI, weekend lift, and value-weighted
discount depth (brute python replicas; cross-engine parity is proven
by the check_entry sweeps)."""

from __future__ import annotations

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal
from itertools import combinations

import pandas as pd

from crawlfe.queries import (
    q_basket_pairs,
    q_discount_depth,
    q_km_hazard,
    q_prefix_template,
    q_supplier_hhi,
    q_weekend_lift,
)

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    """round(x, 6) with HALF_UP ties — Spark's and DuckDB's rule;
    Python's built-in round is half-even and disagrees on exact
    ties like 1/128 = 0.0078125."""
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


def _lineitem():
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def _part():
    return pd.read_parquet(f"{SF}/part.parquet")


def test_km_hazard_brute(spark):
    out = (
        q_km_hazard(spark, SF)
        .toPandas()
        .set_index("duration_days")
        .sort_index()
    )
    o = _orders().assign(d=lambda x: x.o_orderdate.dt.date)
    max_d = o.d.max()
    durs = []
    for _, g in o.groupby("o_custkey"):
        g = g.sort_values(["d", "o_orderkey"])
        first = g.d.iloc[0]
        if len(g) >= 2:
            durs.append(((g.d.iloc[1] - first).days, 1))
        else:
            durs.append(((max_d - first).days, 0))
    per = Counter(d for d, _ in durs)
    ev = Counter(d for d, e in durs if e == 1)
    assert set(out.index) == set(per)
    for d in per:
        row = out.loc[d]
        n_risk = sum(c for dd, c in per.items() if dd >= d)
        assert row.n_risk == n_risk
        assert row.n_event == ev.get(d, 0)
        assert row.n_censor == per[d] - ev.get(d, 0)
        assert abs(row.hazard - _r6(ev.get(d, 0) / n_risk)) < 1e-12
    # life-table invariants: risk set is non-increasing in duration and
    # totals the customer count at the minimum duration
    assert (out.n_risk.diff().dropna() <= 0).all()
    assert out.n_risk.iloc[0] == o.o_custkey.nunique()
    assert out.n_event.sum() + out.n_censor.sum() == o.o_custkey.nunique()


def test_basket_pairs_brute(spark):
    out = q_basket_pairs(spark, SF).toPandas()
    li = _lineitem().merge(
        _part()[["p_partkey", "p_brand"]],
        left_on="l_partkey",
        right_on="p_partkey",
    )
    baskets = li.groupby("l_orderkey").p_brand.apply(
        lambda s: sorted(set(s))
    )
    pairs = Counter()
    for basket in baskets:
        for a, b in combinations(basket, 2):
            pairs[(a, b)] += 1
    got = {
        (r.brand_a, r.brand_b): r.pair_cnt for r in out.itertuples()
    }
    assert got == dict(pairs)
    n_orders = len(baskets)
    for r in out.itertuples():
        assert r.brand_a < r.brand_b
        assert abs(r.support - _r6(r.pair_cnt / n_orders)) < 1e-12


def test_prefix_template_brute(spark):
    out = q_prefix_template(spark, SF).toPandas().set_index("source")
    d = pd.read_parquet(f"{SF}/documents.parquet").assign(
        prefix=lambda x: x.text.str[:16]
    )
    for src, g in d.groupby("source"):
        per = Counter(g.prefix)
        # mode with lexicographic tie-break on the prefix
        modal = min(per.items(), key=lambda kv: (-kv[1], kv[0]))
        row = out.loc[src]
        assert row.modal_prefix == modal[0]
        assert row.modal_cnt == modal[1]
        assert row.n_docs == len(g)
        assert row.n_prefixes == len(per)
        assert abs(
            row.template_share - _r6(modal[1] / len(g))
        ) < 1e-12
    assert len(out) == d.source.nunique()


def test_supplier_hhi_brute(spark):
    out = q_supplier_hhi(spark, SF).toPandas().set_index("s_nationkey")
    li = _lineitem().assign(
        net=lambda x: round(x.l_extendedprice * 100).astype("int64")
        * (100 - round(x.l_discount * 100).astype("int64"))
    )
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    rev = (
        li.groupby("l_suppkey").net.sum().rename("r").reset_index()
    ).merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    for nat, g in rev.groupby("s_nationkey"):
        tot = int(g.r.sum())
        ss = sum(
            int(round(float(int(r)) * 1e6 / float(tot))) ** 2
            for r in g.r
        )
        row = out.loc[nat]
        assert row.n_suppliers == len(g)
        assert abs(row.hhi - _r6(ss / 1e12)) < 1e-12
        # HHI bounds: 1/n (uniform) <= hhi <= 1 (monopoly)
        assert 1.0 / len(g) - 1e-6 <= row.hhi <= 1.0 + 1e-6


def test_weekend_lift_brute(spark):
    out = q_weekend_lift(spark, SF).toPandas().set_index("event_type")
    e = pd.read_parquet(f"{SF}/events.parquet").assign(
        wknd=lambda x: x.ts.dt.dayofweek >= 5
    )
    for et, g in e.groupby("event_type"):
        wknd, wkdy = int(g.wknd.sum()), int((~g.wknd).sum())
        if wkdy == 0:
            assert et not in out.index
            continue
        row = out.loc[et]
        assert (row.wknd_cnt, row.wkdy_cnt) == (wknd, wkdy)
        assert abs(
            row.weekend_lift - _r6(5 * wknd / (2 * wkdy))
        ) < 1e-12


def test_discount_depth_brute(spark):
    out = q_discount_depth(spark, SF).toPandas().set_index("p_brand")
    li = _lineitem().merge(
        _part()[["p_partkey", "p_brand"]],
        left_on="l_partkey",
        right_on="p_partkey",
    )
    li = li.assign(
        cents=lambda x: round(x.l_extendedprice * 100).astype("int64"),
        disc=lambda x: round(x.l_discount * 100).astype("int64"),
    )
    for brand, g in li.groupby("p_brand"):
        row = out.loc[brand]
        wnum = int((g.cents * g.disc).sum())
        wden = int(g.cents.sum())
        assert row.n_lines == len(g)
        assert abs(
            row.wavg_discount - _r6(wnum / (100 * wden))
        ) < 1e-12
        assert abs(
            row.avg_discount
            - _r6(int(g.disc.sum()) / (100 * len(g)))
        ) < 1e-12
    assert len(out) == li.p_brand.nunique()
