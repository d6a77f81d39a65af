"""Semantic tests for feature-eng pack #67: survey-sampling estimators
(brute pandas/numpy replicas)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _HT_RATE,
    _IPF_ROUNDS,
    _NEYMAN_BUDGET,
    q_ht_estimator,
    q_neyman_allocation,
    q_raking_ipf,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _u(x) -> float:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:4], 16) / 65536.0


def test_ht_estimator_brute(spark):
    out = q_ht_estimator(spark, SF).toPandas().set_index("source")
    d = _docs()
    for src, g in d.groupby("source"):
        total = g["n_chars"].sum()
        n = len(g)
        pi = np.minimum(1.0, _HT_RATE * n * g["n_chars"] / total)
        inc = g["doc_id"].map(_u).to_numpy() < pi.to_numpy()
        ht = (g["n_chars"][inc] / pi[inc]).sum()
        row = out.loc[src]
        assert row["n_rows"] == n
        assert row["n_sampled"] == int(inc.sum())
        assert row["true_total"] == total
        assert abs(row["ht_total"] - round(ht, 2)) < 1e-6
    # HT is unbiased in expectation; with only 25 rows per stratum the
    # per-source variance is large, so assert the POOLED estimate is in
    # the right ballpark rather than each stratum
    ratio = out["ht_total"].sum() / out["true_total"].sum()
    assert 0.5 < ratio < 1.5


def test_raking_ipf_brute(spark):
    out = q_raking_ipf(spark, SF).toPandas()
    d = _docs()
    tab = d.groupby(["lang", "source"]).size().astype(float)
    m = tab.copy()
    total = tab.sum()
    langs = tab.index.get_level_values(0).unique()
    srcs = tab.index.get_level_values(1).unique()
    for _ in range(_IPF_ROUNDS):
        lm = m.groupby(level=0).sum()
        m = m * (total / len(langs)) / m.index.get_level_values(0).map(lm)
        sm = m.groupby(level=1).sum()
        m = m * (total / len(srcs)) / m.index.get_level_values(1).map(sm)
    got = out.set_index(["lang", "source"])
    for (lang, src), v in m.items():
        row = got.loc[(lang, src)]
        assert row["n"] == tab[(lang, src)]
        assert abs(row["raked_n"] - round(v, 4)) < 1e-6
        assert abs(row["weight"] - round(v / tab[(lang, src)], 6)) < 1e-6
    # after the final source step, source marginals are exactly uniform
    sm = got["raked_n"].groupby(level=1).sum()
    assert np.allclose(sm, total / len(srcs), rtol=1e-3)


def test_neyman_allocation_brute(spark):
    out = q_neyman_allocation(spark, SF).toPandas().set_index("lang")
    d = _docs()
    g = d.groupby("lang")["n_chars"]
    npop = g.size()
    std = g.apply(lambda x: np.sqrt((x**2).mean() - x.mean() ** 2))
    ns = npop * std
    raw = _NEYMAN_BUDGET * ns / ns.sum()
    fl = np.floor(raw).astype(int)
    left = _NEYMAN_BUDGET - fl.sum()
    order = sorted(raw.index, key=lambda k: (-(raw[k] - fl[k]), k))
    alloc = fl.copy()
    for k in order[:left]:
        alloc[k] += 1
    for lang in npop.index:
        row = out.loc[lang]
        assert row["n_pop"] == npop[lang]
        assert abs(row["alloc_raw"] - round(raw[lang], 4)) < 1e-6
        assert row["alloc"] == alloc[lang]
    # largest-remainder invariant: allocations sum exactly to budget
    assert out["alloc"].sum() == _NEYMAN_BUDGET
