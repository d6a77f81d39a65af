"""Semantic tests for feature-eng pack #72: count/frequency encoding,
top-k-plus-other one-hot expansion, histogram-classifier macro-F1
(brute python replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _CE_ALPHA,
    _OH_TOPK,
    q_count_encode,
    q_macro_f1,
    q_one_hot_topk,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_count_encode_brute(spark):
    out = q_count_encode(spark, SF).toPandas()
    e = _events()
    for feat, series in [
        ("event_type", e.event_type),
        # pandas dayofweek: Monday=0; Spark dayofweek: Sunday=1
        ("dow", ((e.ts.dt.dayofweek + 1) % 7 + 1).astype(str)),
    ]:
        sub = out[out.feature == feat].set_index("level")
        cnt = series.value_counts()
        K, N = len(cnt), len(series)
        assert len(sub) == K
        for lvl, c in cnt.items():
            r = sub.loc[str(lvl)]
            assert r.cnt == c
            assert abs(
                r.freq_smooth
                - round((c + _CE_ALPHA) / (N + _CE_ALPHA * K), 6)
            ) < 1e-9
            assert abs(r.log1p_cnt - round(math.log1p(c), 6)) < 1e-9


def test_one_hot_topk_brute(spark):
    out = q_one_hot_topk(spark, SF).toPandas()
    e = _events()
    cnt = (
        e.event_type.value_counts()
        .rename_axis("evt")
        .reset_index(name="n")
        .sort_values(["n", "evt"], ascending=[False, True])
    )
    top = set(cnt.evt.head(_OH_TOPK))
    feat = e.event_type.map(
        lambda t: f"evt_{t}" if t in top else "evt_other"
    )
    expect = (
        pd.DataFrame({"user_id": e.user_id, "feature": feat})
        .groupby(["user_id", "feature"])
        .size()
    )
    got = out.set_index(["user_id", "feature"])["value"]
    assert len(got) == len(expect)
    for k, v in expect.items():
        assert got[k] == v
    # every level outside the top-k is folded
    assert set(out.feature) <= {f"evt_{t}" for t in top} | {"evt_other"}


def test_macro_f1_brute(spark):
    out = q_macro_f1(spark, SF).toPandas().set_index("cls")
    e = _events().assign(
        day=lambda x: x.ts.dt.day,
        bin=lambda x: np.minimum(
            9, round(x.value * 100).astype("int64") // 2000
        ),
    )
    train, test = e[e.day <= 15], e[e.day > 15]
    gp = (
        train.event_type.value_counts()
        .rename_axis("evt")
        .reset_index(name="n")
        .sort_values(["n", "evt"], ascending=[False, True])
        .evt.iloc[0]
    )
    pred_by_bin = {}
    for b, g in train.groupby("bin"):
        c = (
            g.event_type.value_counts()
            .rename_axis("evt")
            .reset_index(name="n")
            .sort_values(["n", "evt"], ascending=[False, True])
        )
        pred_by_bin[b] = c.evt.iloc[0]
    pred = test.bin.map(lambda b: pred_by_bin.get(b, gp))
    true = test.event_type
    classes = sorted(set(true) | set(pred))
    f1s, precs, recs = [], [], []
    for c in classes:
        tp = int(((true == c) & (pred == c)).sum())
        fp = int(((true != c) & (pred == c)).sum())
        fn = int(((true == c) & (pred != c)).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        row = out.loc[c]
        assert row.tp == tp and row.fp == fp and row.fn == fn
        assert abs(row.precision - round(p, 6)) < 1e-9
        assert abs(row.recall - round(r, 6)) < 1e-9
        assert abs(row.f1 - round(f1, 6)) < 1e-9
        f1s.append(f1)
        precs.append(p)
        recs.append(r)
    m = out.loc["__MACRO__"]
    assert abs(m.f1 - round(sum(f1s) / len(f1s), 6)) < 1e-6
    assert abs(m.precision - round(sum(precs) / len(precs), 6)) < 1e-6
    assert abs(m.recall - round(sum(recs) / len(recs), 6)) < 1e-6
