"""Semantic tests for feature-eng pack #27: top-bigram share, source
bigram concentration, two-point Heaps slope, longest token run,
intra-doc half Jaccard, and Yule's K (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from crawlfe.queries import (
    _BC_K,
    q_bigram_concentration,
    q_heaps_two_point,
    q_intra_doc_sim,
    q_longest_token_run,
    q_top_bigram_frac,
    q_yule_k,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _toks(text: str) -> list[str]:
    return text.strip().split()


def _bigrams(toks: list[str]) -> list[str]:
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def test_top_bigram_frac_brute(spark):
    out = q_top_bigram_frac(spark, SF).toPandas().set_index("doc_id")
    docs = _docs()
    n_expected = 0
    for _, r in docs.iterrows():
        toks = _toks(r.text)
        if len(toks) < 2:
            assert r.doc_id not in out.index
            continue
        n_expected += 1
        bi = Counter(_bigrams(toks))
        top, cnt = min(bi.items(), key=lambda kv: (-kv[1], kv[0]))
        row = out.loc[r.doc_id]
        assert (row.top_bigram, row.top_cnt, row.n_bigrams) == (
            top,
            cnt,
            len(toks) - 1,
        )
        assert abs(
            row.top_frac - round(cnt / (len(toks) - 1), 6)
        ) < 1e-12
    assert len(out) == n_expected


def test_bigram_concentration_brute(spark):
    out = (
        q_bigram_concentration(spark, SF).toPandas().set_index("source")
    )
    docs = _docs()
    for src, g in docs.groupby("source"):
        bi: Counter = Counter()
        for txt in g.text:
            bi.update(_bigrams(_toks(txt)))
        head = sum(
            c
            for _, c in sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[
                :_BC_K
            ]
        )
        total = sum(bi.values())
        row = out.loc[src]
        assert (row.n_total, row.head_mass) == (total, head)
        assert abs(row.concentration - round(head / total, 6)) < 1e-12
        assert 0.0 < row.concentration <= 1.0


def test_heaps_two_point_brute(spark):
    out = q_heaps_two_point(spark, SF).toPandas().set_index("source")
    docs = _docs().sort_values("doc_id")
    for src, g in docs.groupby("source"):
        half_docs = g.iloc[: len(g) // 2]
        n1 = sum(len(_toks(t)) for t in half_docs.text)
        n2 = sum(len(_toks(t)) for t in g.text)
        v1 = len({t for txt in half_docs.text for t in _toks(txt)})
        v2 = len({t for txt in g.text for t in _toks(txt)})
        if n1 == 0 or n2 <= n1:
            assert src not in out.index
            continue
        row = out.loc[src]
        assert (row.n1_toks, row.n2_toks, row.v1_types, row.v2_types) == (
            n1,
            n2,
            v1,
            v2,
        )
        beta = math.log(v2 / v1) / math.log(n2 / n1)
        assert abs(row.heaps_beta - round(beta, 6)) < 1e-12
        # vocabulary can't grow faster than tokens
        assert -1e-9 <= row.heaps_beta <= 1.0 + 1e-9


def test_longest_token_run_brute(spark):
    out = q_longest_token_run(spark, SF).toPandas().set_index("doc_id")
    docs = _docs()
    for _, r in docs.iterrows():
        toks = _toks(r.text)
        runs = []  # (len, token, start)
        i = 0
        while i < len(toks):
            j = i
            while j < len(toks) and toks[j] == toks[i]:
                j += 1
            runs.append((j - i, toks[i], i))
            i = j
        ln, tok, start = min(
            runs, key=lambda t: (-t[0], t[1], t[2])
        )
        row = out.loc[r.doc_id]
        assert (row.run_token, row.run_len, row.run_start) == (
            tok,
            ln,
            start,
        )
    assert len(out) == len(docs)


def test_intra_doc_sim_brute(spark):
    out = q_intra_doc_sim(spark, SF).toPandas().set_index("doc_id")
    docs = _docs()
    n_expected = 0
    for _, r in docs.iterrows():
        toks = _toks(r.text)
        if len(toks) < 2:
            assert r.doc_id not in out.index
            continue
        n_expected += 1
        mid = (len(toks) + 1) // 2  # pos*2 < n puts ceil(n/2) in half A
        a = set(toks[:mid])
        b = set(toks[mid:])
        inter = len(a & b)
        row = out.loc[r.doc_id]
        assert (row.n_a, row.n_b, row.n_inter) == (
            len(a),
            len(b),
            inter,
        )
        jac = inter / (len(a) + len(b) - inter)
        assert abs(row.half_jaccard - round(jac, 6)) < 1e-12
    assert len(out) == n_expected


def test_yule_k_brute(spark):
    out = q_yule_k(spark, SF).toPandas().set_index("source")
    docs = _docs()
    for src, g in docs.groupby("source"):
        tf = Counter(t for txt in g.text for t in _toks(txt))
        m1 = sum(tf.values())
        m2 = sum(c * c for c in tf.values())
        row = out.loc[src]
        assert (row.n_types, row.m1, row.m2) == (len(tf), m1, m2)
        k = 10000.0 * (m2 - m1) / (m1 * m1)
        assert abs(row.yule_k - round(k, 6)) < 1e-12
        assert row.yule_k >= 0.0
