"""Semantic tests for feature-eng pack #117: eigenvector/Katz
centrality, rich-club coefficient (brute python replicas on the
shared 2-out-regular doc graph; cross-engine parity is proven by
the check_entry sweeps)."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from crawlfe.queries import (
    _CENT_TOPK,
    _EV_ROUNDS,
    _KATZ_ALPHA,
    _KATZ_TERMS,
    _RC_KS,
    q_eigenvector_centrality,
    q_katz_centrality,
    q_rich_club,
)

SF = "/root/testdata/sf0.001"


def _edges():
    d = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(d)
    es = []
    for i in d.doc_id:
        es.append((int(i), int((i * 7 + 3) % n)))
        es.append((int(i), int((i * 13 + 5) % n)))
    return es


def test_eigenvector_centrality_brute(spark):
    out = q_eigenvector_centrality(spark, SF).toPandas()
    es = _edges()
    nodes = sorted({u for e in es for u in e})
    x = dict.fromkeys(nodes, 1.0)
    for _ in range(_EV_ROUNDS):
        nxt = dict.fromkeys(nodes, 0.0)
        for s, t in es:
            nxt[t] += x[s]
        tot = sum(nxt.values())
        x = {k: v / tot for k, v in nxt.items()}
    expect = sorted(
        ((round(v, 6), k) for k, v in x.items()),
        key=lambda t: (-t[0], t[1]),
    )[:_CENT_TOPK]
    assert len(out) == _CENT_TOPK
    for row, (sv, node) in zip(out.itertuples(index=False), expect):
        assert row.doc_id == node
        assert abs(row.score - sv) < 2e-6


def test_katz_centrality_brute(spark):
    out = q_katz_centrality(spark, SF).toPandas()
    es = _edges()
    nodes = sorted({u for e in es for u in e})
    b = dict.fromkeys(nodes, 1.0)
    acc = dict.fromkeys(nodes, 1.0)
    for _ in range(_KATZ_TERMS):
        nxt = dict.fromkeys(nodes, 0.0)
        for s, t in es:
            nxt[t] += _KATZ_ALPHA * b[s]
        b = nxt
        for k in nodes:
            acc[k] += b[k]
    expect = sorted(
        ((round(v, 6), k) for k, v in acc.items()),
        key=lambda t: (-t[0], t[1]),
    )[:_CENT_TOPK]
    for row, (kv, node) in zip(out.itertuples(index=False), expect):
        assert row.doc_id == node
        assert abs(row.katz - kv) < 2e-6
    # Katz with k=0 term: every score >= 1
    assert (out.katz >= 1.0).all()


def test_rich_club_brute(spark):
    out = q_rich_club(spark, SF).toPandas().set_index("k")
    es = _edges()
    und = {(min(u, v), max(u, v)) for u, v in es if u != v}
    deg = defaultdict(int)
    for u, v in und:
        deg[u] += 1
        deg[v] += 1
    for k in _RC_KS:
        rich = {n for n, dv in deg.items() if dv > k}
        ek = sum(1 for u, v in und if u in rich and v in rich)
        nk = len(rich)
        phi = 2.0 * ek / (nk * (nk - 1)) if nk > 1 else 0.0
        row = out.loc[k]
        assert row.n_nodes == nk
        assert row.n_edges == ek
        assert abs(row.phi - round(phi, 6)) < 1e-9
