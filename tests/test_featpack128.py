"""Semantic tests for feature-eng pack #128: mRMR selection, VIF
audit, split-half stability (brute pandas replicas; cross-engine
parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _FE_HEAVY,
    _FEATS,
    _MRMR_K,
    q_feature_stability,
    q_mrmr_lite,
    q_vif3_audit,
)

SF = "/root/testdata/sf0.001"


def _panel(day_lo=None, day_hi=None):
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["day"] = e.ts.dt.day
    if day_lo is not None:
        e = e[e.day > day_lo]
    if day_hi is not None:
        e = e[e.day <= day_hi]
    e["cents"] = np.round(e.value * 100).astype("int64")
    e["buy"] = e.event_type == "purchase"
    rows = []
    for uid, g in e.groupby("user_id"):
        days = sorted(g.day.unique())
        gaps = [b - a for a, b in zip(days[:-1], days[1:])]
        rows.append(
            (
                uid,
                len(g),
                int(g.cents.sum()),
                int(g.buy.sum()),
                len(days),
                max(gaps) if gaps else 0,
            )
        )
    return pd.DataFrame(
        rows, columns=["user_id"] + list(_FEATS)
    ).set_index("user_id")


def _absr(x, y):
    x, y = np.asarray(x, float), np.asarray(y, float)
    c = (x * y).mean() - x.mean() * y.mean()
    return abs(
        c
        / np.sqrt(
            ((x * x).mean() - x.mean() ** 2)
            * ((y * y).mean() - y.mean() ** 2)
        )
    )


def test_mrmr_lite_brute(spark):
    out = q_mrmr_lite(spark, SF).toPandas()
    p = _panel()
    label = (p.n_purchases >= _FE_HEAVY).astype(float)
    rel = {f: _absr(p[f], label) for f in _FEATS}
    ff = {
        (a, b): _absr(p[a], p[b])
        for a in _FEATS
        for b in _FEATS
        if a != b
    }
    sel = []
    for step in range(_MRMR_K):
        cands = [f for f in _FEATS if f not in sel]
        if not sel:
            scores = {f: rel[f] for f in cands}
        else:
            scores = {
                f: rel[f]
                - np.mean([ff[(f, s)] for s in sel])
                for f in cands
            }
        best = sorted(
            scores.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        sel.append(best[0])
        row = out.iloc[step]
        assert row.step == step + 1
        assert row.f == best[0]
        assert abs(row.score - round(best[1], 6)) < 1e-5


def test_vif3_audit_brute(spark):
    out = q_vif3_audit(spark, SF).toPandas().set_index("feature")
    p = _panel()
    trio = ("n_events", "total_cents", "n_purchases")
    r = {
        (a, b): _absr(p[a], p[b])
        for a in trio
        for b in trio
        if a != b
    }
    for tgt in trio:
        c1, c2 = [f for f in trio if f != tgt]
        ra, rb, rc = r[(tgt, c1)], r[(tgt, c2)], r[(c1, c2)]
        r2 = (ra * ra + rb * rb - 2 * ra * rb * rc) / (1 - rc * rc)
        row = out.loc[tgt]
        assert abs(row.r2_on_others - round(r2, 6)) < 1e-5
        assert abs(row.vif - round(1 / (1 - r2), 4)) < 1e-3
        assert row.vif >= 1.0


def test_feature_stability_brute(spark):
    out = q_feature_stability(spark, SF).toPandas().set_index(
        "feature"
    )
    pa = _panel(day_hi=15)
    pb = _panel(day_lo=15)
    common = pa.index.intersection(pb.index)
    pa, pb = pa.loc[common], pb.loc[common]
    for f in _FEATS:
        x, y = pa[f].to_numpy(float), pb[f].to_numpy(float)
        c = (x * y).mean() - x.mean() * y.mean()
        r = c / np.sqrt(
            ((x * x).mean() - x.mean() ** 2)
            * ((y * y).mean() - y.mean() ** 2)
        )
        row = out.loc[f]
        assert row.n == len(common)
        assert abs(row.split_half_r - round(r, 6)) < 1e-5
