"""Semantic tests for feature-eng pack #65: privacy audits, stratified
folds, ORC round trip (brute pandas replicas)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _DP_EPS,
    _KANON_BUCKET,
    _KANON_K,
    _KFOLD,
    q_dp_counts,
    q_k_anonymity,
    q_scan_orc,
    q_stratified_kfold,
)

SF = "/root/testdata/sf0.001"


def test_k_anonymity_brute(spark):
    out = q_k_anonymity(spark, SF).toPandas()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    d["len_bucket"] = d["n_chars"] // _KANON_BUCKET
    brute = (
        d.groupby(["lang", "source", "len_bucket"]).size().reset_index(name="n")
    )
    m = out.merge(brute, on=["lang", "source", "len_bucket"], how="outer")
    assert len(m) == len(out) == len(brute)
    assert (m["n_x"] == m["n_y"]).all()
    assert (out["violates_k"] == (out["n"] < _KANON_K).astype(int)).all()
    # the audit is live: the fixture has both safe and violating groups
    assert 0 < out["violates_k"].sum() < len(out)


def test_dp_counts_brute(spark):
    out = q_dp_counts(spark, SF).toPandas().set_index("lang")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    n = d.groupby("lang").size()
    for lang in n.index:
        h16 = int(hashlib.md5(lang.encode()).hexdigest()[:4], 16)
        u = (h16 + 0.5) / 65536.0
        noise = (
            -(1.0 / _DP_EPS)
            * math.copysign(1.0, u - 0.5)
            * math.log(1.0 - 2.0 * abs(u - 0.5))
        )
        row = out.loc[lang]
        assert row["n"] == n[lang]
        assert abs(row["noise"] - round(noise, 4)) < 1e-9
        assert abs(row["dp_n"] - round(n[lang] + noise, 4)) < 1e-9
    # noise is bounded and nonzero somewhere (Laplace b=1: |noise| is
    # almost surely < 12 for 16-bit u granularity)
    assert out["noise"].abs().max() < 12
    assert (out["noise"] != 0).any()


def test_stratified_kfold_balance(spark):
    out = q_stratified_kfold(spark, SF).toPandas()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    n = d.groupby("lang").size()
    for lang, g in out.groupby("lang"):
        assert g["n"].sum() == n[lang]
        assert set(g["fold"]) == set(range(min(_KFOLD, n[lang])))
        # balanced to within one row per stratum
        assert g["n"].max() - g["n"].min() <= 1


def test_scan_orc_roundtrip(spark):
    out = q_scan_orc(spark, SF).toPandas().set_index("source")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    g = d.groupby("source")
    assert (out["n_docs"].sort_index() == g.size().sort_index()).all()
    assert (
        out["total_chars"].sort_index() == g["n_chars"].sum().sort_index()
    ).all()
    assert (out["min_doc"].sort_index() == g["doc_id"].min().sort_index()).all()
    assert (
        out["n_langs"].sort_index() == g["lang"].nunique().sort_index()
    ).all()
