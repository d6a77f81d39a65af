"""Semantic tests for feature-eng pack #130: dup cluster profile,
n-gram coverage curve, readability panel (brute pandas replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pandas as pd

from crawlfe.queries import (
    _COV_KS,
    q_dup_cluster_profile,
    q_ngram_coverage_curve,
    q_readability_panel,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_dup_cluster_profile_brute(spark):
    out = q_dup_cluster_profile(spark, SF).toPandas().set_index("k")
    d = _docs()
    cl = Counter(
        hashlib.md5(t.encode()).hexdigest() for t in d.text
    )
    sizes = Counter(cl.values())
    total_docs, total_clusters = len(d), len(cl)
    for k, ncl in sizes.items():
        row = out.loc[k]
        assert row.n_clusters == ncl
        assert row.n_docs == k * ncl
        assert abs(
            row.doc_share - round(k * ncl / total_docs, 6)
        ) < 1e-9
        assert abs(
            row.dup_factor - round(total_docs / total_clusters, 6)
        ) < 1e-9
    assert out.n_docs.sum() == total_docs


def test_ngram_coverage_curve_brute(spark):
    out = q_ngram_coverage_curve(spark, SF).toPandas().set_index("k")
    d = _docs()
    cnt = Counter()
    for t in d.text:
        ws = t.strip().split()
        cnt.update(zip(ws[:-1], ws[1:]))
    ordered = sorted(
        cnt.items(), key=lambda kv: (-kv[1], kv[0])
    )
    tot = sum(cnt.values())
    for k in _COV_KS:
        cov = (
            sum(c for _, c in ordered[:k]) / tot
            if k <= len(ordered)
            else 1.0
        )
        row = out.loc[k]
        assert row.types == len(cnt)
        assert abs(row.coverage - round(cov, 6)) < 1e-9
    assert out.coverage.is_monotonic_increasing


def test_readability_panel_brute(spark):
    out = q_readability_panel(spark, SF).toPandas().set_index(
        "source"
    )
    d = _docs()
    for src, g in d.groupby("source"):
        w = sum(len(t.strip().split()) for t in g.text)
        s = sum(
            max(1, len(re.split(r"[.!?]+", t)) - 1) for t in g.text
        )
        l = sum(len(re.sub(r"[^A-Za-z0-9]", "", t)) for t in g.text)
        lw = sum(
            sum(1 for tok in t.strip().split() if len(tok) > 6)
            for t in g.text
        )
        ari = 4.71 * (l / w) + 0.5 * (w / s) - 21.43
        cl = 0.0588 * (100 * l / w) - 0.296 * (100 * s / w) - 15.8
        lix = w / s + 100.0 * lw / w
        row = out.loc[src]
        assert row.n_docs == len(g)
        assert abs(row.ari - round(ari, 4)) < 1e-6
        assert abs(row.coleman_liau - round(cl, 4)) < 1e-6
        assert abs(row.lix - round(lix, 4)) < 1e-6
