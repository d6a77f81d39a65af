"""Semantic tests for feature-eng pack #48: bigram LM perplexity,
trigram coverage, rare-token share, doc->source KL, embedding dim
stats, label margin (brute python replicas; cross-engine parity is
proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_bigram_lm_ppl,
    q_doc_source_kl,
    q_embedding_dim_stats,
    q_label_margin,
    q_rare_token_share,
    q_trigram_coverage,
)

SF = "/root/testdata/sf0.001"


def _docs():
    d = pd.read_parquet(f"{SF}/documents.parquet")
    return d.assign(toks=d.text.str.strip().str.split())


def _emb():
    return pd.read_parquet(f"{SF}/embeddings.parquet")


def test_bigram_lm_ppl_brute(spark):
    out = q_bigram_lm_ppl(spark, SF).toPandas()
    d = _docs()
    c12, c1 = Counter(), Counter()
    vocab = set()
    doc_bg = {}
    for _, r in d.iterrows():
        t = r.toks
        vocab.update(t)
        bgs = list(zip(t, t[1:]))
        doc_bg[r.doc_id] = bgs
        for b in bgs:
            c12[b] += 1
            c1[b[0]] += 1
    v = len(vocab)
    rows = []
    for did, bgs in doc_bg.items():
        if not bgs:
            continue
        h = sum(
            -math.log2((c12[b] + 1.0) / (c1[b[0]] + v)) for b in bgs
        ) / len(bgs)
        rows.append((did, len(bgs), h))
    rows.sort(key=lambda r: (-r[2], r[0]))
    assert len(out) == 20
    for rk, (did, nb, h) in enumerate(rows[:20], 1):
        r = out[out.rk == rk].iloc[0]
        assert r.doc_id == did
        assert r.n_bigrams == nb
        assert abs(r.cross_entropy_bits - h) < 2e-6
        assert abs(r.perplexity - 2**h) < max(2e-6, 2**h * 1e-9)


def test_trigram_coverage_brute(spark):
    out = q_trigram_coverage(spark, SF).toPandas().set_index("source")
    d = _docs()
    cnt = Counter()
    per_src = defaultdict(list)
    for _, r in d.iterrows():
        t = r.toks
        tris = list(zip(t, t[1:], t[2:]))
        per_src[r.source].extend(tris)
        cnt.update(tris)
    for src, tris in per_src.items():
        cov = sum(1 for t in tris if cnt[t] >= 2)
        r = out.loc[src]
        assert r.n_trigrams == len(tris)
        assert r.n_covered == cov
        assert abs(r.coverage - cov / len(tris)) < 2e-6


def test_rare_token_share_brute(spark):
    out = q_rare_token_share(spark, SF).toPandas()
    d = _docs()
    freq = Counter()
    for t in d.toks:
        freq.update(t)
    rows = []
    for _, r in d.iterrows():
        nr = sum(1 for w in r.toks if freq[w] <= 5)
        nrd = len({w for w in r.toks if freq[w] <= 5})
        rows.append((r.doc_id, len(r.toks), nr, nrd))
    rows.sort(key=lambda r: (-(r[2] / r[1]), r[0]))
    assert len(out) == 20
    for rk, (did, nt, nr, nrd) in enumerate(rows[:20], 1):
        r = out[out.rk == rk].iloc[0]
        assert (r.doc_id, r.n_tokens, r.n_rare, r.n_rare_distinct) == (
            did, nt, nr, nrd,
        )
        assert abs(r.rare_share - nr / nt) < 2e-6


def test_doc_source_kl_brute(spark):
    out = q_doc_source_kl(spark, SF).toPandas()
    d = _docs()
    vocab = set()
    src_cnt = defaultdict(Counter)
    for _, r in d.iterrows():
        vocab.update(r.toks)
        src_cnt[r.source].update(r.toks)
    v = len(vocab)
    rows = []
    for _, r in d.iterrows():
        cd = Counter(r.toks)
        nd = len(r.toks)
        ns = sum(src_cnt[r.source].values())
        kl = sum(
            c / nd * math.log2(
                (c / nd) / ((src_cnt[r.source][w] + 1.0) / (ns + v))
            )
            for w, c in cd.items()
        )
        rows.append((r.doc_id, r.source, nd, kl))
    rows.sort(key=lambda r: (-r[3], r[0]))
    assert len(out) == 20
    for rk, (did, src, nd, kl) in enumerate(rows[:20], 1):
        r = out[out.rk == rk].iloc[0]
        assert (r.doc_id, r.source, r.n_tokens) == (did, src, nd)
        assert abs(r.kl_bits - kl) < 2e-6


def test_embedding_dim_stats_brute(spark):
    out = q_embedding_dim_stats(spark, SF).toPandas().set_index("dim")
    em = _emb()
    mat = np.stack(em.embedding.values).astype(np.float64)
    q = np.floor(mat * 1e6 + 0.5).astype(np.int64)  # round-half-up
    # numpy round differs on .5; replicate engine round via Decimal-ish
    q = np.array(
        [[round(x * 1e6) for x in row] for row in mat], dtype=np.int64
    )
    assert set(out.index) == set(range(64))
    for dim in range(64):
        col = q[:, dim]
        n = len(col)
        s, qq = int(col.sum()), int((col.astype(object) ** 2).sum())
        r = out.loc[dim]
        assert r.n == n
        assert abs(r.mean_val - s / n / 1e6) < 2e-6
        std = math.sqrt((qq - s * s / n) / (n - 1)) / 1e6
        assert abs(r.std_val - std) < 2e-6
        assert r.min_val == col.min() / 1e6
        assert r.max_val == col.max() / 1e6


def test_label_margin_brute(spark):
    out = q_label_margin(spark, SF).toPandas().set_index("label")
    em = _emb()
    mat = np.stack(em.embedding.values).astype(np.float64)
    q = np.array(
        [[round(x * 1e6) for x in row] for row in mat], dtype=np.int64
    )
    labels = em.label.values
    cents = {
        lb: q[labels == lb].sum(axis=0) for lb in np.unique(labels)
    }
    own_m, oth_m, marg = defaultdict(list), defaultdict(list), {}
    for i in range(len(q)):
        vn = math.sqrt(float((q[i].astype(object) ** 2).sum()))
        coss = {}
        for lb, c in cents.items():
            dot = float((q[i].astype(object) * c.astype(object)).sum())
            cn = math.sqrt(float((c.astype(object) ** 2).sum()))
            coss[lb] = dot / (vn * cn)
        lb = labels[i]
        own_m[lb].append(coss[lb])
        oth_m[lb].append(max(v for k, v in coss.items() if k != lb))
    for lb in cents:
        r = out.loc[lb]
        assert r.n_members == len(own_m[lb])
        assert abs(r.mean_own_cos - np.mean(own_m[lb])) < 2e-6
        assert abs(r.mean_other_cos - np.mean(oth_m[lb])) < 2e-6
        assert (
            abs(
                r.mean_margin
                - np.mean(np.array(own_m[lb]) - np.array(oth_m[lb]))
            )
            < 2e-6
        )
        # cosines are bounded, so the margin is too (the synthetic
        # labels are weakly separable — sign is data-dependent)
        assert -2.0 <= r.mean_margin <= 2.0
