"""Semantic tests for feature-eng pack #137: compression profile,
bucket skew plan, min/max pruning (brute pandas replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _BK_N,
    _CHUNK,
    _CR_COLS,
    _PRUNE_HI_D,
    _PRUNE_LO_D,
    q_bucket_skew_plan,
    q_compression_ratio_est,
    q_minmax_prune_benefit,
)

SF = "/root/testdata/sf0.001"


def _li():
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def test_compression_ratio_est_brute(spark):
    out = q_compression_ratio_est(spark, SF).toPandas().set_index(
        "col"
    )
    li = _li().sort_values(["l_orderkey", "l_linenumber"])
    for c in _CR_COLS:
        v = li[c].astype(str).to_numpy()
        runs = 1 + int((v[1:] != v[:-1]).sum())
        ndv = len(set(v))
        row = out.loc[c]
        assert row.n == len(v)
        assert row.ndv == ndv
        assert row.dict_bits == math.ceil(math.log2(ndv))
        assert row.runs == runs
        assert abs(row.rle_factor - round(len(v) / runs, 2)) < 1e-9
    # low-cardinality flags compress far better than keys
    assert (
        out.loc["l_returnflag"].rle_factor
        > out.loc["l_partkey"].rle_factor
    )


def test_bucket_skew_plan_brute(spark):
    out = q_bucket_skew_plan(spark, SF).toPandas().iloc[0]
    li = _li()
    c = li.groupby(li.l_orderkey % _BK_N).size()
    assert out.n_buckets == len(c)
    assert out.min_fill == c.min()
    assert out.max_fill == c.max()
    assert abs(out.avg_fill - round(c.mean(), 2)) < 1e-9
    assert abs(out.skew_ratio - round(c.max() / c.mean(), 6)) < 1e-6
    assert abs(out.cv - round(c.std(ddof=1) / c.mean(), 6)) < 1e-6


def test_minmax_prune_benefit_brute(spark):
    out = q_minmax_prune_benefit(spark, SF).toPandas().set_index(
        "ordering"
    )
    li = _li()
    li["sd"] = (
        li.l_shipdate.dt.normalize()
        - pd.Timestamp("1992-01-01")
    ).dt.days
    d0 = li.sd.min()
    lo, hi = d0 + _PRUNE_LO_D, d0 + _PRUNE_HI_D

    def prune(sorted_df):
        sd = sorted_df.sd.to_numpy()
        nch = math.ceil(len(sd) / _CHUNK)
        pruned = 0
        for k in range(nch):
            seg = sd[k * _CHUNK : (k + 1) * _CHUNK]
            if seg.max() < lo or seg.min() > hi:
                pruned += 1
        return nch, pruned

    n1, p1 = prune(
        li.sort_values(["sd", "l_orderkey", "l_linenumber"])
    )
    n2, p2 = prune(li.sort_values(["l_orderkey", "l_linenumber"]))
    r1 = out.loc["shipdate_sorted"]
    r2 = out.loc["orderkey_sorted"]
    assert (r1.n_chunks, r1.n_pruned) == (n1, p1)
    assert (r2.n_chunks, r2.n_pruned) == (n2, p2)
    assert abs(r1.prune_rate - round(p1 / n1, 6)) < 1e-9
    assert abs(r2.prune_rate - round(p2 / n2, 6)) < 1e-9
    # sorting by the filter column can only help pruning
    assert r1.prune_rate >= r2.prune_rate
