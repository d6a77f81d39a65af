"""Semantic tests for feature-eng pack #69: Huber mean, KMV
intersection, hash-randomization test (brute replicas)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _HUBER_C,
    _HUBER_ROUNDS,
    _KMV_DOM,
    _KMV_K,
    _PERM_B,
    q_huber_mean,
    q_kmv_intersect,
    q_perm_test_mean,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_huber_mean_brute(spark):
    out = q_huber_mean(spark, SF).toPandas().set_index("event_type")
    ev = _events()
    for et, g in ev.groupby("event_type"):
        x = g["value"].to_numpy()
        m = round(x.mean(), 6)
        k = round(_HUBER_C * x.std(), 6)
        n_down = 0
        for _ in range(_HUBER_ROUNDS):
            d = np.abs(x - m)
            w = np.where(d <= k, 1.0, k / d)
            n_down = int((d > k).sum())
            m = round((w * x).sum() / w.sum(), 6)
        row = out.loc[et]
        assert row["n"] == len(x)
        assert abs(row["huber_mean"] - round(m, 4)) < 1e-6
        assert row["n_down"] == n_down
    # robustness: huber mean differs from raw mean where outliers exist
    assert (out["huber_mean"] != out["mean"]).any()


def _h60(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def test_kmv_intersect_brute(spark):
    out = q_kmv_intersect(spark, SF).toPandas().iloc[0]
    ev = _events()
    a = set(ev[ev.event_type == "click"]["user_id"])
    b = set(ev[ev.event_type == "purchase"]["user_id"])
    sa = set(sorted(_h60(x) for x in a)[:_KMV_K])
    sb = set(sorted(_h60(x) for x in b)[:_KMV_K])
    su = sorted(sa | sb)[:_KMV_K]
    k_eff = len(su)
    kth = max(su)
    k_int = sum(1 for h in su if h in sa and h in sb)
    union_est = k_eff if k_eff < _KMV_K else (_KMV_K - 1) * _KMV_DOM / kth
    est = round(k_int / k_eff * union_est, 4)
    assert out["k_int"] == k_int
    assert out["k_eff"] == k_eff
    assert out["kth_h"] == kth
    assert out["n_exact"] == len(a & b)
    assert abs(out["kmv_est"] - est) < 1e-6


def test_perm_test_mean_brute(spark):
    out = q_perm_test_mean(spark, SF).toPandas().iloc[0]
    ev = _events()
    ev = ev[ev.event_type.isin(["purchase", "click"])]
    obs = round(
        ev[ev.event_type == "purchase"]["value"].mean()
        - ev[ev.event_type == "click"]["value"].mean(),
        6,
    )
    n_extreme = 0
    for b in range(_PERM_B):
        g = ev["event_id"].map(
            lambda x, b=b: int(
                hashlib.md5(f"{x}_{b}".encode()).hexdigest()[:4], 16
            )
            % 2
        )
        d = round(
            ev["value"][g == 1].mean() - ev["value"][g == 0].mean(), 6
        )
        if abs(d) >= abs(obs):
            n_extreme += 1
    assert abs(out["obs_diff"] - obs) < 1e-6
    assert out["n_extreme"] == n_extreme
    assert (
        abs(out["p_value"] - round((1 + n_extreme) / (_PERM_B + 1), 4))
        < 1e-9
    )
    assert 0 < out["p_value"] <= 1
