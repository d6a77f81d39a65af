"""Semantic tests for feature-eng pack #16: chi-squared term
selection, per-label embedding outliers, token-budget corpus mixing,
Cohen's kappa, and 2-round label propagation (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _CHI2_TOPK,
    _MIX_BUDGET,
    _OUTLIER_K,
    q_chi2_terms,
    q_cohens_kappa,
    q_embedding_outliers,
    q_label_prop,
    q_token_budget_mix,
)

SF = "/root/testdata/sf0.001"


def test_chi2_terms_brute(spark):
    out = q_chi2_terms(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n_all = len(docs)
    pres = [
        (r.source, t)
        for r in docs.itertuples()
        for t in set(r.text.strip().split())
    ]
    a_cnt = Counter(pres)
    tot_t = Counter(t for _, t in pres)
    n_s = docs.groupby("source").size().to_dict()
    scored = defaultdict(list)
    for (src, tok), a in a_cnt.items():
        tt, ns = tot_t[tok], n_s[src]
        if a * n_all <= tt * ns:  # only over-represented terms
            continue
        b, c = tt - a, ns - a
        d = n_all - ns - b
        chi2 = round(
            n_all * float(a * d - b * c) ** 2
            / float(tt * (n_all - tt) * ns * (n_all - ns)),
            4,
        )
        scored[src].append((chi2, tok, a))
    for src, rows in scored.items():
        rows.sort(key=lambda x: (-x[0], x[1]))
        want = rows[:_CHI2_TOPK]
        got = out[out["source"] == src].sort_values("rk")
        assert len(got) == len(want)
        for rk, ((chi2, tok, a), g) in enumerate(
            zip(want, got.itertuples()), start=1
        ):
            assert g.rk == rk and g.tok == tok and g.a == a
            assert g.chi2 == chi2
    assert len(out) > 0


def test_embedding_outliers_brute(spark):
    out = q_embedding_outliers(spark, SF).toPandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    for label, grp in emb.groupby("label"):
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in grp["embedding"]]
        )
        cen = mat.mean(axis=0)
        cos = mat @ cen / (
            np.linalg.norm(mat, axis=1) * np.linalg.norm(cen)
        )
        rows = sorted(
            zip(np.round(cos, 4), grp["vec_id"]),
            key=lambda x: (x[0], x[1]),
        )[:_OUTLIER_K]
        got = out[out["label"] == label].sort_values("rk")
        assert list(got["vec_id"]) == [v for _, v in rows]
        assert list(got["cos_cen"]) == [c for c, _ in rows]
    # centroid members score high; outliers strictly lowest per label
    assert (out["cos_cen"] <= 1.0).all()


def test_token_budget_mix_brute(spark):
    out = q_token_budget_mix(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for src, grp in docs.groupby("source"):
        cum = 0
        want = []
        for r in grp.sort_values("doc_id").itertuples():
            n = len(r.text.strip().split())
            cum += n
            if cum > _MIX_BUDGET:
                break
            want.append((r.doc_id, n, cum))
        got = out[out["source"] == src].sort_values("doc_id")
        assert [
            (r.doc_id, r.n_toks, r.cum_toks) for r in got.itertuples()
        ] == want
    # every source contributes at least one doc (budget is not vacuous)
    assert set(out["source"]) == set(docs["source"])


def test_cohens_kappa_brute(spark):
    out = q_cohens_kappa(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    la = docs["n_chars"] >= 300
    lb = docs["text"].str.contains("spark", regex=False)
    n = len(docs)
    n11 = int((la & lb).sum())
    n10 = int((la & ~lb).sum())
    n01 = int((~la & lb).sum())
    n00 = int((~la & ~lb).sum())
    po = (n11 + n00) / n
    pa, pb = (n11 + n10) / n, (n11 + n01) / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    row = out.iloc[0]
    assert (row["n"], row["n11"], row["n00"]) == (n, n11, n00)
    assert row["po"] == round(po, 6)
    assert row["kappa"] == round((po - pe) / (1 - pe), 6)
    # both rules must actually split the corpus or kappa is vacuous
    assert 0 < n11 + n10 < n and 0 < n11 + n01 < n


def _brute_label_prop(docs: pd.DataFrame) -> dict[int, tuple[str, int]]:
    n = len(docs)
    src = docs.set_index("doc_id")["source"].to_dict()
    edges = [(i, (i * 7 + 3) % n) for i in src] + [
        (i, (i * 13 + 5) % n) for i in src
    ]
    labeled = {i: (src[i], 0) for i in src if i % 10 == 0}
    for rnd in (1, 2):
        votes: dict[int, Counter] = defaultdict(Counter)
        for s, d in edges:
            if s in labeled and d not in labeled:
                votes[d][labeled[s][0]] += 1
        new = {
            node: (min(c, key=lambda lab: (-c[lab], lab)), rnd)
            for node, c in votes.items()
        }
        labeled.update(new)
    return labeled


def test_label_prop_brute(spark):
    out = q_label_prop(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = _brute_label_prop(docs)
    got = {
        r.doc_id: (r.label, r.rnd) for r in out.itertuples()
    }
    assert got == want
    # propagation actually labels non-seed nodes in both rounds
    assert (out["rnd"] == 1).any() and (out["rnd"] == 2).any()
