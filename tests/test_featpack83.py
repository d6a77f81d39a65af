"""Semantic tests for feature-eng pack #83: exact frequency moments,
AMS F2 sketch, Count-Sketch point estimates (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _AMS_G,
    _AMS_R,
    _CS_D,
    _CS_TOPK,
    _CS_W,
    q_ams_f2,
    q_countsketch_freq,
    q_freq_moments,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _h(s, nhex):
    return int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)


def _sign(prefix, j, v):
    return (_h(f"{prefix}{j}:{v}", 1) % 2) * 2 - 1


def test_freq_moments_brute(spark):
    out = (
        q_freq_moments(spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    e = _events()
    for et, grp in e.groupby("event_type"):
        fv = grp.groupby("user_id").size().to_numpy(dtype=np.int64)
        row = out.loc[et]
        assert row.f0 == len(fv)
        assert row.f1 == fv.sum()
        assert row.f2 == (fv**2).sum()
        assert row.f3 == (fv**3).sum()
        assert row.f_inf == fv.max()
        gs = (fv**2).sum() / fv.sum() ** 2
        assert abs(row.gini_simpson - round(gs, 6)) < 1e-9


def test_ams_f2_brute(spark):
    out = q_ams_f2(spark, SF).toPandas().iloc[0]
    f = _events().groupby("user_id").size()
    f2 = int((f**2).sum())
    ys = []
    for j in range(1, _AMS_R + 1):
        z = sum(int(c) * _sign("a", j, v) for v, c in f.items())
        ys.append(z * z)
    mean = sum(ys) / _AMS_R
    gsums = sorted(
        (
            sum(ys[g * 4 : g * 4 + 4]),
            g,
        )
        for g in range(_AMS_G)
    )
    mom = (gsums[1][0] + gsums[2][0]) / (2.0 * (_AMS_R // _AMS_G))
    assert out.v_distinct == len(f)
    assert out.f2_exact == f2
    assert abs(out.mean_est - round(mean, 4)) < 1e-9
    assert abs(out.mom_est - round(mom, 4)) < 1e-9
    assert abs(out.rel_err_mean - round(abs(mean - f2) / f2, 6)) < 1e-9
    assert abs(out.rel_err_mom - round(abs(mom - f2) / f2, 6)) < 1e-9


def test_countsketch_brute(spark):
    out = q_countsketch_freq(spark, SF).toPandas()
    f = _events().groupby("user_id").size().astype(np.int64)
    # build the sketch
    tab = {}
    for v, c in f.items():
        for j in range(1, _CS_D + 1):
            b = _h(f"h{j}:{v}", 8) % _CS_W
            s = _sign("g", j, v)
            tab[(j, b)] = tab.get((j, b), 0) + int(c) * s
    # point estimates with the exact rn=3 median (ties by j)
    top = sorted(f.items(), key=lambda kv: (-kv[1], kv[0]))[:_CS_TOPK]
    exp = {}
    for v, c in top:
        ests = sorted(
            (tab[(j, _h(f"h{j}:{v}", 8) % _CS_W)] * _sign("g", j, v), j)
            for j in range(1, _CS_D + 1)
        )
        exp[v] = ests[(_CS_D + 1) // 2 - 1][0]
    assert len(out) == _CS_TOPK
    for _, row in out.iterrows():
        assert row.f_exact == f[row.user_id]
        assert row.cs_est == exp[row.user_id]
        assert row.err == row.cs_est - row.f_exact
    # unbiasedness sanity: the signed median should land near the
    # truth for heavy keys (w=64 buckets vs ~15 users at sf0.001)
    assert (out.err.abs() <= out.f_exact.max()).all()
