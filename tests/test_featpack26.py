"""Semantic tests for feature-eng pack #26: empirical-Bayes shrunk
quality, source vocabulary Jaccard, source TF-centroid cosine, token
burstiness (Fano factor), per-doc token novelty, and top-K overlap
(brute python replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from crawlfe.queries import (
    _BQ_CAP,
    _BQ_K,
    _BURST_MIN,
    _TOPK_V,
    q_bayes_shrunk_quality,
    q_source_centroid_sim,
    q_source_vocab_jaccard,
    q_token_burstiness,
    q_token_novelty,
    q_topk_overlap,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _toks(text: str) -> list[str]:
    return text.strip().split()


def test_bayes_shrunk_quality_brute(spark):
    out = (
        q_bayes_shrunk_quality(spark, SF).toPandas().set_index("source")
    )
    docs = _docs()
    q = docs.n_chars.clip(upper=_BQ_CAP)
    prior = q.sum() / len(docs)
    for src, g in docs.groupby("source"):
        gq = g.n_chars.clip(upper=_BQ_CAP)
        n, s = len(g), int(gq.sum())
        row = out.loc[src]
        assert row.n == n
        assert abs(row.raw_mean - round(s / n, 6)) < 1e-12
        shrunk = (s + _BQ_K * prior) / (n + _BQ_K)
        assert abs(row.shrunk_mean - round(shrunk, 6)) < 1e-12
        # shrinkage moves the small-n mean strictly toward the prior
        lo, hi = sorted((s / n, prior))
        assert lo - 1e-9 <= row.shrunk_mean <= hi + 1e-9


def _source_vocab() -> dict[str, set[str]]:
    vocab: dict[str, set[str]] = {}
    for src, g in _docs().groupby("source"):
        vocab[str(src)] = {t for txt in g.text for t in _toks(txt)}
    return vocab


def test_source_vocab_jaccard_brute(spark):
    out = (
        q_source_vocab_jaccard(spark, SF)
        .toPandas()
        .set_index(["src_a", "src_b"])
    )
    vocab = _source_vocab()
    srcs = sorted(vocab)
    n_pairs = 0
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                assert (a, b) not in out.index
                continue
            n_pairs += 1
            row = out.loc[(a, b)]
            assert (row.n_a, row.n_b, row.n_inter) == (
                len(vocab[a]),
                len(vocab[b]),
                inter,
            )
            jac = inter / (len(vocab[a]) + len(vocab[b]) - inter)
            assert abs(row.jaccard - round(jac, 6)) < 1e-12
            assert 0.0 < row.jaccard <= 1.0
    assert len(out) == n_pairs


def test_source_centroid_sim_brute(spark):
    out = (
        q_source_centroid_sim(spark, SF)
        .toPandas()
        .set_index(["src_a", "src_b"])
    )
    tf: dict[str, Counter] = {}
    for src, g in _docs().groupby("source"):
        tf[str(src)] = Counter(t for txt in g.text for t in _toks(txt))
    srcs = sorted(tf)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            dot = sum(c * tf[b][t] for t, c in tf[a].items() if t in tf[b])
            if dot == 0:
                assert (a, b) not in out.index
                continue
            row = out.loc[(a, b)]
            assert row["dot"] == dot  # .dot is a Series method
            na = math.sqrt(sum(c * c for c in tf[a].values()))
            nb = math.sqrt(sum(c * c for c in tf[b].values()))
            assert abs(row.cosine - round(dot / (na * nb), 6)) < 1e-12
            assert 0.0 < row.cosine <= 1.0 + 1e-9


def test_token_burstiness_brute(spark):
    out = q_token_burstiness(spark, SF).toPandas().set_index("token")
    docs = _docs()
    per_doc: dict[str, Counter] = {}
    for _, r in docs.iterrows():
        for t, c in Counter(_toks(r.text)).items():
            per_doc.setdefault(t, Counter())[r.doc_id] = c
    n_docs = len(docs)
    n_checked = 0
    for tok, dc in per_doc.items():
        s = sum(dc.values())
        if s < _BURST_MIN:
            assert tok not in out.index
            continue
        n_checked += 1
        q = sum(c * c for c in dc.values())
        row = out.loc[tok]
        assert (row.n_present, row.s) == (len(dc), s)
        fano = (n_docs * q - s * s) / (n_docs * s)
        assert abs(row.fano - round(fano, 6)) < 1e-12
        # Fano of a clumped count distribution: q >= s^2/n_docs always
        assert row.fano >= -1e-9
    assert len(out) == n_checked > 0


def test_token_novelty_brute(spark):
    out = q_token_novelty(spark, SF).toPandas().set_index("doc_id")
    docs = _docs()
    first: dict[str, object] = {}
    types: dict[object, set[str]] = {}
    for _, r in docs.iterrows():
        ts = set(_toks(r.text))
        types[r.doc_id] = ts
        for t in ts:
            if t not in first or r.doc_id < first[t]:
                first[t] = r.doc_id
    total_new = 0
    for did, ts in types.items():
        n_new = sum(1 for t in ts if first[t] == did)
        total_new += n_new
        row = out.loc[did]
        assert (row.n_types, row.n_new) == (len(ts), n_new)
        assert abs(row.novelty - round(n_new / len(ts), 6)) < 1e-12
    # every token is new in exactly one doc
    assert total_new == len(first)


def test_topk_overlap_brute(spark):
    out = q_topk_overlap(spark, SF).toPandas().set_index("source")
    docs = _docs()
    per_src: dict[str, Counter] = {}
    glob: Counter = Counter()
    for src, g in docs.groupby("source"):
        c = Counter(t for txt in g.text for t in _toks(txt))
        per_src[str(src)] = c
        glob.update(c)

    def topk(c: Counter) -> set[str]:
        return {
            t
            for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[
                :_TOPK_V
            ]
        }

    g_top = topk(glob)
    for src, c in per_src.items():
        shared = len(topk(c) & g_top)
        row = out.loc[src]
        assert row.n_shared == shared
        assert abs(row.overlap_at_k - round(shared / _TOPK_V, 6)) < 1e-12
        assert 0.0 <= row.overlap_at_k <= 1.0
    assert len(out) == len(per_src)
