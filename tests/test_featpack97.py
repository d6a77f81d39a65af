"""Semantic tests for feature-eng pack #97: one-step Cox, sorted
neighborhood blocking, KS classifier statistic (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _ND_MOD,
    _ND_OFF,
    _SNM_KEY,
    _SNM_W,
    q_cox_one_step,
    q_ks_classifier,
    q_sorted_neighborhood,
)

SF = "/root/testdata/sf0.001"


def _rhalf(v):
    return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)


def test_cox_one_step_brute(spark):
    out = q_cox_one_step(spark, SF).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    o = o.sort_values(["o_custkey", "d", "o_orderkey"])
    firsts = o.groupby("o_custkey").nth(0)
    seconds = o.groupby("o_custkey").nth(1)
    sec = dict(zip(seconds.o_custkey, seconds.d))
    max_d = o.d.max()
    rows = []
    for _, r in firsts.iterrows():
        if r.o_custkey in sec:
            rows.append(((sec[r.o_custkey] - r.d).days, 1, r.o_custkey % 2))
        else:
            rows.append(((max_d - r.d).days, 0, r.o_custkey % 2))
    df = pd.DataFrame(rows, columns=["t", "ev", "x"])
    g = (
        df.groupby("t")
        .agg(
            n_t=("ev", "size"),
            x_t=("x", "sum"),
            d_t=("ev", "sum"),
            dx_t=("ev", lambda s: 0),
        )
    )
    g["dx_t"] = df.groupby("t").apply(
        lambda s: int((s.ev * s.x).sum()), include_groups=False
    )
    g = g.sort_index(ascending=False)
    g["s0"] = g.n_t.cumsum()
    g["s1"] = g.x_t.cumsum()
    g = g.sort_index()
    g = g[g.d_t > 0]
    u = i = 0
    for _, r in g.iterrows():
        p = r.s1 / r.s0
        u += _rhalf(1e9 * (r.dx_t - r.d_t * p))
        i += _rhalf(1e9 * r.d_t * p * (1 - p))
    assert out.n_times == len(g)
    assert out.n_events == g.d_t.sum()
    assert out.u_e9 == u
    assert out.i_e9 == i
    beta = u / i
    assert abs(out.beta_one_step - round(beta, 6)) < 1e-6
    assert abs(out.hazard_ratio - round(math.exp(beta), 6)) < 1e-5


def test_sorted_neighborhood_brute(spark):
    out = q_sorted_neighborhood(spark, SF).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet")
    recs = [(i, t[:_SNM_KEY]) for i, t in zip(d.doc_id, d.text)]
    recs += [
        (i + _ND_OFF, t[:_SNM_KEY])
        for i, t in zip(d.doc_id, d.text)
        if i % _ND_MOD == 0
    ]
    recs += [
        (i + _ND_OFF, (t + " zz7")[:_SNM_KEY])
        for i, t in zip(d.doc_id, d.text)
        if i % _ND_MOD == 1
    ]
    recs.sort(key=lambda r: (r[1], r[0]))
    cands = set()
    for i in range(len(recs)):
        for k in range(1, _SNM_W + 1):
            if i + k < len(recs):
                a, b = recs[i][0], recs[i + k][0]
                cands.add((min(a, b), max(a, b)))
    truth = {
        (i, i + _ND_OFF) for i in d.doc_id if i % _ND_MOD in (0, 1)
    }
    hits = cands & truth
    assert out.n_truth == len(truth)
    assert out.n_cand == len(cands)
    assert out.n_hit == len(hits)
    # identical 20-char prefixes sort adjacent: every exact copy is
    # within the window unless >w same-prefix records intervene —
    # recall should be high on this corpus
    assert out.recall > 0.5


def test_ks_classifier_brute(spark):
    out = q_ks_classifier(spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet")
    e = e[e.event_type.isin(["purchase", "click"])]
    c = (e.value * 100).round().astype("int64")
    pos = sorted(c[e.event_type == "purchase"])
    neg = sorted(c[e.event_type == "click"])
    P, N = len(pos), len(neg)
    vals = sorted(set(c))
    best = (-1, None)
    import bisect

    for v in vals:
        cp = bisect.bisect_right(pos, v)
        cn = bisect.bisect_right(neg, v)
        num = abs(cp * N - cn * P)
        if num > best[0]:
            best = (num, v)
    assert (out.n_pos, out.n_neg) == (P, N)
    assert out.at_cents == best[1]
    assert abs(out.ks - round(best[0] / (P * N), 6)) < 1e-9
    assert 0 <= out.ks <= 1
