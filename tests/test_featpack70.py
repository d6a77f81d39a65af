"""Semantic tests for feature-eng pack #70: bounded redirect-chain
resolution, directed Newman modularity of the lang partition, and
code-like-text routing (brute python replicas; cross-engine parity is
proven by the check_entry sweeps)."""

from __future__ import annotations

import re

import pandas as pd

from crawlfe.queries import (
    _REDIR_HOPS,
    q_code_detect,
    q_modularity_q,
    q_redirect_chains,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_redirect_chains_brute(spark):
    out = (
        q_redirect_chains(spark, SF)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    d = _docs()
    n = len(d)
    redir = {i: (i // 5 * 3 + 1) % n for i in d.doc_id if i % 5 == 0}
    for doc in d.doc_id:
        cur, hops = doc, 0
        while hops < _REDIR_HOPS and cur in redir:
            cur = redir[cur]
            hops += 1
        r = out.loc[doc]
        assert r.final_id == cur, doc
        assert r.n_hops == hops, doc
        assert bool(r.resolved) == (cur % 5 != 0), doc
    # every non-redirect doc is its own terminal with 0 hops
    assert (out.loc[[i for i in d.doc_id if i % 5 != 0], "n_hops"] == 0).all()
    # at least one chain takes >1 hop on this fixture
    assert out.n_hops.max() >= 2


def test_modularity_q_brute(spark):
    out = q_modularity_q(spark, SF).toPandas().set_index("lang")
    d = _docs()
    n = len(d)
    lang = dict(zip(d.doc_id, d.lang))
    edges = [(i, (i * 7 + 3) % n) for i in d.doc_id] + [
        (i, (i * 13 + 5) % n) for i in d.doc_id
    ]
    m = float(len(edges))
    for lg in d.lang.unique():
        within = sum(
            1 for s, t in edges if lang[s] == lg and lang[t] == lg
        )
        dout = sum(1 for s, _ in edges if lang[s] == lg)
        din = sum(1 for _, t in edges if lang[t] == lg)
        r = out.loc[lg]
        assert r.n_within == within
        assert r.dout == dout
        assert r.din == din
        q = within / m - (dout * din) / (m * m)
        assert abs(r.q_contrib - round(q, 6)) < 1e-9
    # modularity contributions of a 2-regular graph are bounded
    assert out.q_contrib.abs().max() < 1.0


def test_code_detect_brute(spark):
    out = q_code_detect(spark, SF).toPandas().set_index("source")
    d = _docs()
    sym_re = re.compile(r"[;{}()=<>\[\]]")
    kw_re = re.compile(r"\b(def|class|function|return|import|const|var)\b")
    g = d.assign(
        sym=d.text.map(lambda t: len(sym_re.findall(t))),
        kw=d.text.map(lambda t: len(kw_re.findall(t))),
    )
    g["code_like"] = (g.sym * 1000 >= g.n_chars * 40) | (g.kw >= 3)
    for src, gg in g.groupby("source"):
        r = out.loc[src]
        assert r.n_docs == len(gg)
        assert r.n_code_like == int(gg.code_like.sum())
        assert abs(r.code_share - round(gg.code_like.mean(), 4)) < 1e-9
        assert r.sym_per_kchar == int(
            gg.sym.sum() * 1000 // gg.n_chars.sum()
        )
        assert r.kw_total == gg.kw.sum()
