"""Semantic tests for feature-eng pack #13: doc-graph degree/2-hop
stats, oriented triangle counting, weak-supervision voting, and
calibration binning (brute python replicas; cross-engine parity is
proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
from itertools import combinations

import pandas as pd

from crawlfe.queries import (
    q_calibration_bins,
    q_graph_degrees,
    q_graph_triangles,
    q_weak_labels,
)

SF = "/root/testdata/sf0.001"


def _edges(n: int) -> list[tuple[int, int]]:
    out = []
    for d in range(n):
        out.append((d, (d * 7 + 3) % n))
        out.append((d, (d * 13 + 5) % n))
    return out


def test_graph_degrees_brute(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(docs)
    edges = _edges(n)
    out = q_graph_degrees(spark, SF).toPandas().set_index("doc_id")
    assert len(out) == n
    fwd: dict[int, list[int]] = {}
    ind: dict[int, int] = {}
    for s, d in edges:
        fwd.setdefault(s, []).append(d)
        ind[d] = ind.get(d, 0) + 1
    for v in range(n):
        assert out.loc[v, "out_deg"] == len(fwd.get(v, []))
        assert out.loc[v, "in_deg"] == ind.get(v, 0)
        reach2 = {h for m in fwd.get(v, []) for h in fwd.get(m, [])}
        assert out.loc[v, "reach2"] == len(reach2)


def test_graph_triangles_brute(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(docs)
    und = {tuple(sorted(e)) for e in _edges(n) if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    for a, b in und:
        tri += sum(
            1
            for c in adj[a] & adj[b]
            if c > b  # a < b < c: count each triangle once
        )
    out = q_graph_triangles(spark, SF).toPandas()
    assert out["n_triangles"].iloc[0] == tri


def test_weak_labels_brute(spark):
    out = (
        q_weak_labels(spark, SF)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    d = (
        pd.read_parquet(f"{SF}/documents.parquet")
        .sort_values("doc_id", ignore_index=True)
    )
    lf1 = (d["n_chars"] > 300).astype(int)
    lf2 = d["lang"].isin(["en", "de"]).astype(int)
    lf3 = (
        d["text"].str.strip().str.split().map(len) > 50
    ).astype(int)
    assert (out["lf_len"] == lf1).all()
    assert (out["lf_lang"] == lf2).all()
    assert (out["lf_tok"] == lf3).all()
    assert (out["vote"] == ((lf1 + lf2 + lf3) >= 2).astype(int)).all()
    assert (
        out["unanimous"] == ((lf1 == lf2) & (lf2 == lf3)).astype(int)
    ).all()
    # label functions genuinely disagree somewhere on this corpus
    assert out["unanimous"].min() == 0


def test_calibration_bins_brute(spark):
    out = q_calibration_bins(spark, SF).toPandas().set_index("bin")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    h16 = d["doc_id"].map(
        lambda x: int(hashlib.md5(str(x).encode()).hexdigest()[:4], 16)
    )
    score = h16 / 65536.0
    label = (d["n_chars"] > 300).astype(int)
    bins = (h16 * 10) // 65536
    g = pd.DataFrame({"bin": bins, "score": score, "label": label}).groupby(
        "bin"
    )
    assert set(out.index) == set(g.groups)
    for b, grp in g:
        assert out.loc[b, "n"] == len(grp)
        assert abs(out.loc[b, "mean_score"] - grp["score"].mean()) < 1e-5
        assert abs(out.loc[b, "pos_rate"] - grp["label"].mean()) < 1e-5
    # scores spread over all 10 bins at this corpus size
    assert len(out) == 10
