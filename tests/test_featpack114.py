"""Semantic tests for feature-eng pack #114: Kneser-Ney bigram
perplexity, distinct-n, self-BLEU-lite (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from crawlfe.queries import (
    _KN_D,
    _KN_TOPN,
    q_distinct_n,
    q_kneser_ney_bigram,
    q_self_bleu_lite,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _bigrams(text):
    ws = text.strip().split()
    return list(zip(ws[:-1], ws[1:]))


def test_kneser_ney_bigram_brute(spark):
    out = q_kneser_ney_bigram(spark, SF).toPandas()
    d = _docs()
    c12 = Counter()
    for t in d.text:
        c12.update(_bigrams(t))
    c1 = Counter()
    n1p = Counter()
    nend = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1p[w1] += 1
        nend[w2] += 1
    btypes = len(c12)
    vocab = set()
    for t in d.text:
        vocab.update(t.strip().split())
    v = len(vocab)
    ppl = {}
    for did, t in zip(d.doc_id, d.text):
        bgs = _bigrams(t)
        if not bgs:
            continue
        h = 0.0
        for w1, w2 in bgs:
            pc = (nend[w2] + 0.5) / (btypes + 0.5 * v)
            p = (
                max(c12[(w1, w2)] - _KN_D, 0.0) / c1[w1]
                + _KN_D * n1p[w1] / c1[w1] * pc
            )
            h += -math.log2(p)
        ppl[did] = (len(bgs), round(2 ** (h / len(bgs)), 4))
    expect = sorted(
        ((v2, k) for k, (_, v2) in ppl.items()),
        key=lambda t: (-t[0], t[1]),
    )[:_KN_TOPN]
    assert len(out) == _KN_TOPN
    for row, (pv, did) in zip(out.itertuples(index=False), expect):
        assert row.doc_id == did
        assert row.n_bigrams == ppl[did][0]
        assert abs(row.ppl - pv) < 2e-3


def test_distinct_n_brute(spark):
    out = q_distinct_n(spark, SF).toPandas().set_index("source")
    d = _docs()
    for src, g in d.groupby("source"):
        toks, bgs = [], []
        for t in g.text:
            ws = t.strip().split()
            toks.extend(ws)
            bgs.extend(zip(ws[:-1], ws[1:]))
        row = out.loc[src]
        assert row.n_tokens == len(toks)
        assert row.types1 == len(set(toks))
        assert abs(
            row.distinct1 - round(len(set(toks)) / len(toks), 6)
        ) < 1e-9
        assert row.n_bigrams == len(bgs)
        assert row.types2 == len(set(bgs))
        assert abs(
            row.distinct2 - round(len(set(bgs)) / len(bgs), 6)
        ) < 1e-9


def test_self_bleu_lite_brute(spark):
    out = q_self_bleu_lite(spark, SF).toPandas().set_index("source")
    d = _docs().sort_values("doc_id")
    bset = {
        did: set(_bigrams(t)) for did, t in zip(d.doc_id, d.text)
    }
    for src, g in d.groupby("source"):
        ids = list(g.doc_id)
        ovs = []
        for a, b in zip(ids[:-1], ids[1:]):
            ovs.append(len(bset[a] & bset[b]) / len(bset[a]))
        row = out.loc[src]
        assert row.n_pairs == len(ovs)
        assert abs(
            row.mean_overlap - round(sum(ovs) / len(ovs), 6)
        ) < 1e-6
        assert abs(row.max_overlap - round(max(ovs), 6)) < 1e-6
