"""Semantic tests for feature-eng pack #63: modern data-curation ops
(brute numpy/pandas replicas)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _CONF_ALPHA,
    _KCENTER_K,
    _RRF_C,
    _RRF_TOPK,
    _SEM_K,
    _SEM_TAU,
    q_conformal_qhat,
    q_kcenter_coreset,
    q_rrf_fusion,
    q_semdedup,
)

SF = "/root/testdata/sf0.001"


def _emb():
    e = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    ids = e["vec_id"].to_numpy()
    V = np.stack(e["embedding"].to_numpy()).astype("float64")
    return ids, V


def _brute_assign(ids, V):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cents = Vn[np.isin(ids, ids[ids < _SEM_K])]
    cent_ids = ids[ids < _SEM_K]
    cos = np.round(Vn @ cents.T, 6)
    # argmax with lowest-cent_id tie-break: stable lexsort on (-cos, id)
    best = np.empty(len(ids), dtype=np.int64)
    for i in range(len(ids)):
        order = sorted(range(len(cent_ids)), key=lambda j: (-cos[i, j], cent_ids[j]))
        best[i] = cent_ids[order[0]]
    return best, Vn


def test_semdedup_brute(spark):
    out = (
        q_semdedup(spark, SF).toPandas().sort_values("cluster").reset_index(drop=True)
    )
    ids, V = _emb()
    cluster, Vn = _brute_assign(ids, V)
    rows = []
    for c in sorted(set(cluster)):
        m = cluster == c
        cids, cV = ids[m], Vn[m]
        dropped = 0
        for i in range(len(cids)):
            lower = cids < cids[i]
            if lower.any():
                mx = np.round(cV[lower] @ cV[i], 6).max()
                dropped += int(mx >= _SEM_TAU)
        rows.append((c, int(m.sum()), dropped))
    brute = pd.DataFrame(rows, columns=["cluster", "n_vecs", "n_dropped"])
    assert out["cluster"].tolist() == brute["cluster"].tolist()
    assert out["n_vecs"].tolist() == brute["n_vecs"].tolist()
    assert out["n_dropped"].tolist() == brute["n_dropped"].tolist()
    # live but minority drop rate at this tier
    assert 0 < out["n_dropped"].sum() < out["n_vecs"].sum() / 2
    for _, r in out.iterrows():
        assert abs(r["drop_rate"] - round(r["n_dropped"] / r["n_vecs"], 4)) < 1e-9


def test_rrf_fusion_brute(spark):
    out = q_rrf_fusion(spark, SF).toPandas()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    d["h"] = d["doc_id"].map(
        lambda x: hashlib.md5(str(x).encode()).hexdigest()
    )
    for src, g in d.groupby("source"):
        g = g.copy()
        g["r1"] = (
            g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            .reset_index()
            .index.to_series()
            .set_axis(
                g.sort_values(
                    ["n_chars", "doc_id"], ascending=[False, True]
                ).index
            )
            + 1
        )
        g["r2"] = (
            g.sort_values(["h", "doc_id"]).reset_index().index.to_series()
            .set_axis(g.sort_values(["h", "doc_id"]).index)
            + 1
        )
        g["rrf"] = (1.0 / (_RRF_C + g["r1"]) + 1.0 / (_RRF_C + g["r2"])).round(6)
        top = g.sort_values(["rrf", "doc_id"], ascending=[False, True]).head(
            _RRF_TOPK
        )
        got = out[out["source"] == src].sort_values("fused_rank")
        assert got["doc_id"].tolist() == top["doc_id"].tolist()
        assert got["r1"].tolist() == top["r1"].tolist()
        assert got["r2"].tolist() == top["r2"].tolist()
        assert np.allclose(got["rrf"].to_numpy(), top["rrf"].to_numpy())


def test_conformal_qhat_brute(spark):
    out = q_conformal_qhat(spark, SF).toPandas().set_index("lang")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    d["s"] = d["doc_id"].map(
        lambda x: abs(
            int(hashlib.md5(str(x).encode()).hexdigest()[:4], 16) / 65536.0
            - 0.5
        )
    )
    for lang, g in d.groupby("lang"):
        g = g.sort_values(["s", "doc_id"])
        n = len(g)
        k = min(math.ceil((1.0 - _CONF_ALPHA) * (n + 1)), n)
        qhat = g["s"].iloc[k - 1]
        cov = (g["s"] <= qhat).sum() / n
        row = out.loc[lang]
        assert row["n"] == n and row["k"] == k
        assert abs(row["qhat"] - round(qhat, 6)) < 1e-9
        assert abs(row["coverage"] - round(cov, 4)) < 1e-9
        # conformal guarantee: achieved coverage >= target
        assert row["coverage"] >= 1.0 - _CONF_ALPHA - 1e-9


def test_kcenter_brute(spark):
    out = q_kcenter_coreset(spark, SF).toPandas().sort_values("round")
    ids, V = _emb()
    picked = [int(ids.min())]
    radii = [0.0]
    idx = {int(i): j for j, i in enumerate(ids)}
    md = None
    for _ in range(_KCENTER_K - 1):
        md = None
        for c in picked:
            d = np.round(((V - V[idx[c]]) ** 2).sum(axis=1), 6)
            md = d if md is None else np.minimum(md, d)
        order = sorted(range(len(ids)), key=lambda j: (-md[j], ids[j]))
        j = order[0]
        picked.append(int(ids[j]))
        radii.append(float(md[j]))
    assert out["center_id"].tolist() == picked
    assert np.allclose(out["radius"].to_numpy(), radii)
    # greedy k-center radius sequence is non-increasing after round 2
    r = out["radius"].to_numpy()[1:]
    assert (np.diff(r) <= 1e-12).all()
    assert len(set(picked)) == _KCENTER_K
