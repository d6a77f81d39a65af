"""Semantic tests for feature-eng pack #81: distinct / entropy
l-diversity and t-closeness (brute python replicas; cross-engine
parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _LDIV_L,
    _TCLOSE_M,
    _TCLOSE_W,
    q_entropy_l_diversity,
    q_l_diversity,
    q_t_closeness,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")[
        ["lang", "source", "n_chars"]
    ]


def test_l_diversity_brute(spark):
    out = (
        q_l_diversity(spark, SF)
        .toPandas()
        .set_index(["lang", "len_bucket"])
        .sort_index()
    )
    d = _docs()
    d["len_bucket"] = d.n_chars // 200
    g = d.groupby(["lang", "len_bucket"])
    exp_n = g.size()
    exp_l = g.source.nunique()
    assert len(out) == len(exp_n)
    for key in exp_n.index:
        row = out.loc[key]
        assert row.n == exp_n[key]
        assert row.l_distinct == exp_l[key]
        assert row.violates_l == int(exp_l[key] < _LDIV_L)


def test_entropy_l_diversity_brute(spark):
    out = (
        q_entropy_l_diversity(spark, SF)
        .toPandas()
        .set_index(["lang", "len_bucket"])
        .sort_index()
    )
    d = _docs()
    d["len_bucket"] = d.n_chars // 200
    for key, grp in d.groupby(["lang", "len_bucket"]):
        n = len(grp)
        cs = grp.groupby("source").size()
        h_num = -sum(round(1e6 * c * math.log(c / n)) for c in cs)
        row = out.loc[key]
        assert row.n == n
        assert row.h_e6_num == h_num
        el = math.exp(h_num / (1e6 * n))
        assert abs(row.entropy_l - round(el, 6)) < 1e-9
        assert row.violates_l == int(el < _LDIV_L)
    # a one-source group has H=0 => entropy_l=1 => must violate L=3
    ones = out[out.h_e6_num == 0]
    assert (ones.violates_l == 1).all()


def test_t_closeness_brute(spark):
    out = (
        q_t_closeness(spark, SF)
        .toPandas()
        .set_index(["lang", "source"])
        .sort_index()
    )
    d = _docs()
    d["sev"] = np.minimum(_TCLOSE_M - 1, d.n_chars // _TCLOSE_W)
    n_tot = len(d)
    gcum = np.array(
        [(d.sev <= i).sum() for i in range(_TCLOSE_M)], dtype=np.int64
    )
    for key, grp in d.groupby(["lang", "source"]):
        n_g = len(grp)
        cum = np.array(
            [(grp.sev <= i).sum() for i in range(_TCLOSE_M)], dtype=np.int64
        )
        num = int(
            np.abs(
                cum[: _TCLOSE_M - 1] * n_tot - gcum[: _TCLOSE_M - 1] * n_g
            ).sum()
        )
        emd = num / ((_TCLOSE_M - 1) * n_g * n_tot)
        row = out.loc[key]
        assert row.n_g == n_g
        assert row.num_sum == num
        assert abs(row.emd - round(emd, 6)) < 1e-9
        assert 0 <= row.emd <= 1
    # EMD of the whole corpus against itself is 0 by the exact-integer
    # construction: check one aggregate identity — sum_g n_g*emd_num
    # telescopes to the total absolute deviation mass, always >= 0
    assert (out.num_sum >= 0).all()
