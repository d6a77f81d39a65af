"""Semantic tests for feature-eng pack #61: k-core peel (brute
networkx-free peel replica) and matryoshka truncation eval (brute
numpy cosine)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _KCORE_K,
    _KCORE_ROUNDS,
    _MAT_DIMS,
    q_kcore_peel,
    q_matryoshka_eval,
)

SF = "/root/testdata/sf0.001"


def _brute_edges():
    d = pd.read_parquet(f"{SF}/documents.parquet")
    ids = d["doc_id"].to_numpy()
    cnt = len(ids)
    edges = set()
    for m, a in ((7, 3), (13, 5)):
        for i in ids:
            j = (i * m + a) % cnt
            if i != j:
                edges.add((min(i, j), max(i, j)))
    return edges


def _brute_peel(edges):
    for _ in range(_KCORE_ROUNDS):
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, c in deg.items() if c >= _KCORE_K}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return deg


def test_kcore_peel_brute(spark):
    out = q_kcore_peel(spark, SF).toPandas().set_index("node")
    want = _brute_peel(_brute_edges())
    assert len(out) == len(want)
    for node, deg in want.items():
        assert out.loc[node, "deg"] == deg


def test_kcore_peel_monotone(spark):
    """Peeling can only shrink the graph, and every surviving node of
    an intermediate peel has degree >= k at the time it survived —
    the final output's degrees may dip below k (last round recounts
    after removals) but never hit zero."""
    out = q_kcore_peel(spark, SF).toPandas()
    assert (out["deg"] >= 1).all()


def test_matryoshka_eval_brute(spark):
    out = q_matryoshka_eval(spark, SF).toPandas().set_index("vec_id")
    e = pd.read_parquet(f"{SF}/embeddings.parquet").set_index("vec_id")

    def cos(a, b):
        return float(
            np.dot(a, b) / (np.sqrt(np.dot(a, a)) * np.sqrt(np.dot(b, b)))
        )

    n_checked = 0
    for vid in list(e.index)[:50]:
        if vid + 1 not in e.index:
            continue
        va = e.loc[vid, "embedding"].astype("float64")
        vb = e.loc[vid + 1, "embedding"].astype("float64")
        row = out.loc[vid]
        assert abs(row["cos_full"] - cos(va, vb)) < 1e-4
        assert abs(
            row["cos_trunc"] - cos(va[:_MAT_DIMS], vb[:_MAT_DIMS])
        ) < 1e-4
        n_checked += 1
    assert n_checked > 10
    # truncation changes similarity for at least some pairs — the gap
    # column is live, not identically zero
    assert out["abs_gap"].max() > 0
