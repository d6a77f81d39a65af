"""Semantic tests for feature-eng pack #62: hard-negative mining
(brute numpy replica)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import _HN_K, _HN_PROBES, q_hard_negatives

SF = "/root/testdata/sf0.001"


def test_hard_negatives_brute(spark):
    out = q_hard_negatives(spark, SF).toPandas()
    e = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = np.stack(e["embedding"].to_numpy()).astype("float64")
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    ids = e["vec_id"].to_numpy()
    labels = e["label"].to_numpy()
    sims = V @ V.T
    for q in range(_HN_PROBES):
        qi = np.where(ids == q)[0][0]
        mask_other = ids != q
        neg_mask = mask_other & (labels != labels[qi])
        pos_mask = mask_other & (labels == labels[qi])
        order = sorted(
            np.where(neg_mask)[0],
            key=lambda i: (-round(sims[qi, i], 12), ids[i]),
        )[:_HN_K]
        best_pos = sims[qi, pos_mask].max()
        got = out[out["q_id"] == q].sort_values("rn")
        assert got["vec_id"].tolist() == [int(ids[i]) for i in order]
        for rn, i in enumerate(order, start=1):
            row = got[got["rn"] == rn].iloc[0]
            assert abs(row["neg_cosine"] - round(sims[qi, i], 6)) < 1e-4
            assert abs(
                row["margin"] - round(best_pos - sims[qi, i], 6)
            ) < 1e-4


def test_hard_negatives_labels_differ(spark):
    out = q_hard_negatives(spark, SF).toPandas()
    e = pd.read_parquet(f"{SF}/embeddings.parquet").set_index("vec_id")
    for _, row in out.iterrows():
        assert row["neg_label"] != e.loc[row["q_id"], "label"]
    # every probe produced exactly K negatives
    assert (out.groupby("q_id").size() == _HN_K).all()
    assert out["q_id"].nunique() == _HN_PROBES
