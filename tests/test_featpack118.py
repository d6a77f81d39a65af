"""Semantic tests for feature-eng pack #118: Markov stationary
distribution, entropy rate, reversibility audit (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from crawlfe.queries import (
    _MC_ROUNDS,
    q_entropy_rate,
    q_mc_reversibility,
    q_mc_stationary,
)

SF = "/root/testdata/sf0.001"


def _chain():
    e = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    trans = Counter()
    for _, g in e.groupby("user_id"):
        ets = list(g.event_type)
        trans.update(zip(ets[:-1], ets[1:]))
    rows = defaultdict(int)
    for (i, _), c in trans.items():
        rows[i] += c
    p = {(i, j): c / rows[i] for (i, j), c in trans.items()}
    states = sorted(rows)
    pi = dict.fromkeys(states, 1.0 / len(states))
    for _ in range(_MC_ROUNDS):
        nxt = dict.fromkeys(states, 0.0)
        for (i, j), pij in p.items():
            nxt[j] += pi[i] * pij
        tot = sum(nxt.values())
        pi = {k: v / tot for k, v in nxt.items()}
    return p, pi, states


def test_mc_stationary_brute(spark):
    out = q_mc_stationary(spark, SF).toPandas().set_index("state")
    p, pi, states = _chain()
    e = pd.read_parquet(f"{SF}/events.parquet")
    emp = e.event_type.value_counts(normalize=True)
    assert list(out.index) == states
    for s in states:
        assert abs(out.loc[s].pi - round(pi[s], 6)) < 2e-6
        assert abs(out.loc[s].empirical - round(emp[s], 6)) < 1e-6
    # power iteration has converged: pi ~ empirical for a long chain
    assert abs(out.pi.sum() - 1.0) < 1e-4


def test_entropy_rate_brute(spark):
    out = q_entropy_rate(spark, SF).toPandas().iloc[0]
    p, pi, states = _chain()
    rowh = defaultdict(float)
    for (i, _), pij in p.items():
        rowh[i] += -pij * math.log2(pij)
    h_rate = sum(pi[i] * rowh[i] for i in states)
    h_iid = sum(-v * math.log2(v) for v in pi.values())
    assert abs(out.h_rate_bits - round(h_rate, 6)) < 1e-5
    assert abs(out.h_iid_bits - round(h_iid, 6)) < 1e-5
    assert abs(out.memory_bits - round(h_iid - h_rate, 6)) < 1e-5
    # conditioning can only reduce entropy
    assert out.h_rate_bits <= out.h_iid_bits + 1e-9


def test_mc_reversibility_brute(spark):
    out = q_mc_reversibility(spark, SF).toPandas().iloc[0]
    p, pi, states = _chain()
    viol = {}
    for a in states:
        for b in states:
            if a < b:
                f = pi[a] * p.get((a, b), 0.0)
                fr = pi[b] * p.get((b, a), 0.0)
                viol[(a, b)] = abs(f - fr)
    tv = sum(viol.values()) / 2
    worst = sorted(
        viol.items(), key=lambda kv: (-kv[1], kv[0])
    )[0]
    assert abs(out.tv_irreversibility - round(tv, 6)) < 1e-5
    assert (out.worst_i, out.worst_j) == worst[0]
    assert abs(out.worst_gap - round(worst[1], 6)) < 1e-5
