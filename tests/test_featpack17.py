"""Semantic tests for feature-eng pack #17: curriculum ordering
(quartile buckets + round-robin interleave key) and the vocabulary
coverage curve (brute python replicas; cross-engine parity is proven
by the check_entry sweeps)."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from crawlfe.queries import (
    _COV_V,
    _CURR_B,
    q_curriculum_order,
    q_vocab_coverage,
)

SF = "/root/testdata/sf0.001"


def _quantile_cont(vals: list[int], p: float) -> float:
    s = sorted(vals)
    h = (len(s) - 1) * p
    lo = int(h)
    frac = h - lo
    if lo + 1 < len(s):
        return s[lo] + frac * (s[lo + 1] - s[lo])
    return float(s[lo])


def test_curriculum_order_brute(spark):
    out = q_curriculum_order(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    nc = docs["n_chars"].tolist()
    c1, c2, c3 = (_quantile_cont(nc, p) for p in (0.25, 0.5, 0.75))

    def bucket(n):
        return 1 if n <= c1 else 2 if n <= c2 else 3 if n <= c3 else 4

    docs = docs.assign(bucket=docs["n_chars"].map(bucket))
    got = out.set_index("doc_id")
    assert len(out) == len(docs)
    for b, grp in docs.groupby("bucket"):
        ordered = grp.sort_values(["n_chars", "doc_id"])
        for rk, r in enumerate(ordered.itertuples(), start=1):
            g = got.loc[r.doc_id]
            assert g["bucket"] == b and g["within_rank"] == rk
            assert g["interleave_key"] == rk * _CURR_B + b - 1
    # interleave keys are globally unique and round-robin the buckets:
    # sorting by the key visits each bucket once per within-rank level
    assert out["interleave_key"].is_unique
    head = out.sort_values("interleave_key").head(_CURR_B)
    assert sorted(head["bucket"]) == list(range(1, _CURR_B + 1))


def test_vocab_coverage_brute(spark):
    out = q_vocab_coverage(spark, SF).toPandas().sort_values("vocab_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = Counter(
        t for text in docs["text"] for t in text.strip().split()
    )
    total = sum(cnt.values())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_COV_V]
    assert len(out) == len(top)
    cum = 0
    for vid, ((tok, n), r) in enumerate(
        zip(top, out.itertuples()), start=1
    ):
        cum += n
        assert r.vocab_id == vid and r.token == tok and r.n == n
        assert r.cum_share == round(cum / total, 6)
    # the curve is monotone and ends at the truncated-vocab coverage
    assert (out["cum_share"].diff().dropna() >= 0).all()
    assert out["cum_share"].iloc[-1] <= 1.0
