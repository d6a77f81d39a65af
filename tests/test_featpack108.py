"""Semantic tests for feature-eng pack #108: Bradley-Terry MM,
rank-biased precision, Borda/Condorcet consensus (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _BT_ROUNDS,
    _RBP_K,
    _RBP_P,
    _RBP_WTS,
    q_borda_consensus,
    q_bradley_terry,
    q_rbp_eval,
)

SF = "/root/testdata/sf0.001"


def _daily():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    e["day"] = e.ts.dt.day
    return (
        e.groupby(["day", "event_type"])["cents"].sum().reset_index()
    )


def test_bradley_terry_brute(spark):
    out = q_bradley_terry(spark, SF).toPandas()
    d = _daily().pivot(
        index="day", columns="event_type", values="cents"
    )
    items = sorted(d.columns)
    w = {(i, j): 0 for i in items for j in items if i != j}
    n = dict(w)
    for _, row in d.iterrows():
        for i in items:
            for j in items:
                if i == j:
                    continue
                if row[i] > row[j]:
                    w[(i, j)] += 1
                if row[i] != row[j]:
                    n[(i, j)] += 1
    wins = {i: sum(w[(i, j)] for j in items if j != i) for i in items}
    s = {i: 1.0 for i in items}
    for _ in range(_BT_ROUNDS):
        den = {
            i: sum(
                n[(i, j)] / (s[i] + s[j]) for j in items if j != i
            )
            for i in items
        }
        raw = {i: wins[i] / den[i] for i in items}
        tot = sum(raw.values())
        s = {i: raw[i] / tot for i in items}
    expect = sorted(
        ((round(v, 6), k) for k, v in s.items()),
        key=lambda t: (-t[0], t[1]),
    )
    assert len(out) == len(items)
    for row, (sv, it) in zip(out.itertuples(index=False), expect):
        assert row.item == it
        assert abs(row.strength - sv) < 2e-6
    # MM fixed point: strengths sum to 1 after normalization
    assert abs(out.strength.sum() - 1.0) < 1e-4


def test_rbp_eval_brute(spark):
    out = (
        q_rbp_eval(spark, SF).toPandas().set_index("user_id").rbp
    )
    e = pd.read_parquet(f"{SF}/events.parquet")
    for uid, g in e.groupby("user_id"):
        g = g.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).head(_RBP_K)
        s = sum(
            _RBP_WTS[k]
            for k, et in enumerate(g.event_type)
            if et == "purchase"
        )
        expect = round((1 - _RBP_P) * s / 1e12, 6)
        assert abs(out[uid] - expect) < 1e-9
    # RBP bounded by the geometric tail mass
    assert (out <= 1.0).all() and (out >= 0.0).all()


def test_borda_consensus_brute(spark):
    out = q_borda_consensus(spark, SF).toPandas()
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    e["week"] = (e.ts.dt.day - 1) // 7
    wk = (
        e.groupby(["week", "event_type"])["cents"].sum().reset_index()
    )
    items = sorted(wk.event_type.unique())
    k = len(items)
    borda = dict.fromkeys(items, 0)
    for _, g in wk.groupby("week"):
        g = g.sort_values(
            ["cents", "event_type"], ascending=[False, True]
        ).reset_index(drop=True)
        # rank() semantics: ties share the smaller rank
        ranks = (
            g.cents.rank(method="min", ascending=False).astype(int)
        )
        for it, r in zip(g.event_type, ranks):
            borda[it] += k - r
    piv = wk.pivot(index="week", columns="event_type", values="cents")
    cond = {}
    for i in items:
        cond[i] = all(
            (piv[i] > piv[j]).sum() > (piv[i] < piv[j]).sum()
            for j in items
            if j != i
        )
    expect = sorted(
        ((borda[i], i) for i in items), key=lambda t: (-t[0], t[1])
    )
    for row, (bv, it) in zip(out.itertuples(index=False), expect):
        assert (row.item, row.borda) == (it, bv)
        assert bool(row.is_condorcet) == cond[it]
    # at most one Condorcet winner
    assert out.is_condorcet.sum() <= 1
