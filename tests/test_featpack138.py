"""Semantic tests for feature-eng pack #138: Simpson family,
Shannon evenness, Renyi/Hill spectrum (brute pandas replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_renyi_spectrum,
    q_shannon_evenness,
    q_simpson_diversity,
)

SF = "/root/testdata/sf0.001"


def _p():
    d = pd.read_parquet(f"{SF}/documents.parquet")
    c = d.source.value_counts().to_numpy(dtype=float)
    return c, c / c.sum()


def test_simpson_diversity_brute(spark):
    out = q_simpson_diversity(spark, SF).toPandas().iloc[0]
    c, p = _p()
    n = c.sum()
    d = (p * p).sum()
    dub = (c * (c - 1)).sum() / (n * (n - 1))
    assert out.n_docs == n
    assert out.k == len(c)
    assert abs(out.simpson_d - round(d, 6)) < 1e-9
    assert abs(out.inv_simpson - round(1 / d, 4)) < 1e-4
    assert abs(out.simpson_unbiased - round(dub, 6)) < 1e-9
    assert abs(out.berger_parker - round(p.max(), 6)) < 1e-9
    # 1 <= 1/D <= k
    assert 1 - 1e-9 <= out.inv_simpson <= out.k + 1e-9


def test_shannon_evenness_brute(spark):
    out = q_shannon_evenness(spark, SF).toPandas().iloc[0]
    _, p = _p()
    h = float(-(p * np.log(p)).sum())
    assert out.k == len(p)
    assert abs(out.shannon_nats - round(h, 6)) < 1e-6
    assert abs(out.shannon_bits - round(h / math.log(2), 6)) < 1e-6
    assert abs(out.pielou_j - round(h / math.log(len(p)), 6)) < 1e-6
    assert 0 <= out.pielou_j <= 1 + 1e-9


def test_renyi_spectrum_brute(spark):
    out = q_renyi_spectrum(spark, SF).toPandas().set_index("alpha")
    _, p = _p()
    h1 = float(-(p * np.log(p)).sum())
    hills = {
        "0": len(p),
        "1": math.exp(h1),
        "2": 1 / float((p * p).sum()),
        "inf": 1 / float(p.max()),
    }
    for a, v in hills.items():
        assert abs(out.loc[a].hill_number - round(v, 4)) < 1e-4
    # Hill numbers are non-increasing in alpha
    assert (
        out.loc["0"].hill_number
        >= out.loc["1"].hill_number
        >= out.loc["2"].hill_number
        >= out.loc["inf"].hill_number
    )
