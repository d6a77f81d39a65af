"""Semantic tests for feature-eng pack #133: rank-1 factorization
(brute numpy replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _SVD_ROUNDS,
    _SVD_TOPK,
    q_svd_rank1,
    q_svd_recon_error,
    q_user_factor_topk,
)

SF = "/root/testdata/sf0.001"


def _factor():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    piv = (
        e.groupby(["user_id", "event_type"])["cents"]
        .sum()
        .unstack(fill_value=0)
        .astype(float)
    )
    M = piv.to_numpy()
    users, items = list(piv.index), list(piv.columns)
    u = np.full(len(users), 1.0 / len(users))
    v = None
    growth = None
    for _ in range(_SVD_ROUNDS):
        vr = M.T @ u
        v = vr / np.abs(vr).sum()
        ur = M @ v
        growth = np.abs(ur).sum()
        u = ur / growth
    return M, users, items, u, v, growth


def test_svd_rank1_brute(spark):
    out = q_svd_rank1(spark, SF).toPandas()
    _, _, items, _, v, growth = _factor()
    expect = sorted(
        zip(np.round(v, 6), items), key=lambda t: (-t[0], t[1])
    )
    assert len(out) == len(items)
    for row, (vv, it) in zip(out.itertuples(index=False), expect):
        assert row.item == it
        assert abs(row.v_score - vv) < 2e-6
        assert abs(row.l1_growth - round(growth, 4)) < 1e-1
    # L1-normalized loadings
    assert abs(out.v_score.abs().sum() - 1.0) < 1e-4


def test_user_factor_topk_brute(spark):
    out = q_user_factor_topk(spark, SF).toPandas()
    _, users, _, u, _, _ = _factor()
    expect = sorted(
        zip(np.round(u, 6), users), key=lambda t: (-t[0], t[1])
    )[:_SVD_TOPK]
    assert len(out) == min(_SVD_TOPK, len(users))
    for row, (uv, uid) in zip(out.itertuples(index=False), expect):
        assert row.user_id == uid
        assert abs(row.u_score - uv) < 2e-6


def test_svd_recon_error_brute(spark):
    out = q_svd_recon_error(spark, SF).toPandas().iloc[0]
    M, _, _, u, v, _ = _factor()
    umv = u @ M @ v
    uu, vv = u @ u, v @ v
    sigma = umv / (uu * vv)
    fro2 = (M * M).sum()
    resid2 = max(0.0, fro2 - 2 * sigma * umv + sigma**2 * uu * vv)
    assert abs(out.sigma - round(sigma, 4)) < 1e-1
    assert abs(out.fro_m - round(np.sqrt(fro2), 4)) < 1e-2
    assert abs(out.fro_resid - round(np.sqrt(resid2), 4)) < 1e-1
    assert abs(
        out.rel_error - round(np.sqrt(resid2 / fro2), 6)
    ) < 1e-5
    # the top factor should explain most of the mass
    assert out.rel_error < 0.9
