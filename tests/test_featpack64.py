"""Semantic tests for feature-eng pack #64: product quantization, ADC
search, temperature mixture (brute numpy replicas)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _ADC_PROBES,
    _ADC_TOPK,
    _MIX_ALPHA,
    _PQ_K,
    _PQ_M,
    _PQ_SUB,
    q_adc_topk,
    q_mixture_temperature,
    q_pq_encode,
)

SF = "/root/testdata/sf0.001"


def _emb():
    e = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    ids = e["vec_id"].to_numpy()
    V = np.stack(e["embedding"].to_numpy()).astype("float64")
    return ids, V


def _brute_codes(ids, V):
    """(n, M) codes + (n, M) rounded per-subspace errors."""
    cents = V[np.isin(ids, ids[ids < _PQ_K])]
    codes = np.zeros((len(ids), _PQ_M), dtype=np.int64)
    errs = np.zeros((len(ids), _PQ_M))
    for m in range(_PQ_M):
        s = slice(m * _PQ_SUB, (m + 1) * _PQ_SUB)
        d = np.round(
            ((V[:, None, s] - cents[None, :, s]) ** 2).sum(axis=2), 6
        )
        # argmin with lowest-centroid-id tie-break = plain argmin on the
        # rounded matrix (np.argmin returns the first min, ids ascend)
        codes[:, m] = d.argmin(axis=1)
        errs[:, m] = d.min(axis=1)
    return codes, errs


def test_pq_encode_brute(spark):
    out = q_pq_encode(spark, SF).toPandas().sort_values("vec_id")
    ids, V = _emb()
    codes, errs = _brute_codes(ids, V)
    got = out[[f"code{m}" for m in range(_PQ_M)]].to_numpy()
    assert (got == codes).all()
    micro = np.round(errs * 1e6).astype(np.int64).sum(axis=1)
    # HALF_UP like both engines (np.round is banker's and micro/64 can
    # land exactly on a .5 sixth-decimal boundary)
    mse = np.floor(micro / (_PQ_M * _PQ_SUB) + 0.5) / 1e6
    assert np.allclose(out["recon_mse"].to_numpy(), mse)
    # codes use the full codebook (not collapsed onto one centroid)
    assert len(np.unique(got)) > 1


def test_adc_topk_brute(spark):
    out = q_adc_topk(spark, SF).toPandas()
    ids, V = _emb()
    codes, _ = _brute_codes(ids, V)
    cents = V[np.isin(ids, ids[ids < _PQ_K])]
    for q in range(_ADC_PROBES):
        qi = np.where(ids == q)[0][0]
        lut = np.zeros((_PQ_M, _PQ_K), dtype=np.int64)
        for m in range(_PQ_M):
            s = slice(m * _PQ_SUB, (m + 1) * _PQ_SUB)
            lut[m] = np.round(
                np.round(((V[qi, s] - cents[:, s]) ** 2).sum(axis=1), 6)
                * 1e6
            )
        adc_micro = lut[np.arange(_PQ_M)[None, :], codes].sum(axis=1)
        mask = ids != q
        order = sorted(
            np.where(mask)[0], key=lambda j: (adc_micro[j], ids[j])
        )[:_ADC_TOPK]
        got = out[out["q_id"] == q].sort_values("rn")
        assert got["vec_id"].tolist() == [int(ids[j]) for j in order]
        assert np.allclose(
            got["adc"].to_numpy(),
            np.round(adc_micro[order] / 1e6, 6),
        )


def test_adc_approximates_exact(spark):
    """ADC is an approximation of true distance: its top-1 should be
    much closer than a random vector on average (sanity, not parity)."""
    out = q_adc_topk(spark, SF).toPandas()
    ids, V = _emb()
    idx = {int(i): j for j, i in enumerate(ids)}
    true_top1, rand_d = [], []
    for q in range(_ADC_PROBES):
        got = out[(out["q_id"] == q) & (out["rn"] == 1)].iloc[0]
        d = ((V[idx[q]] - V[idx[int(got["vec_id"])]]) ** 2).sum()
        true_top1.append(d)
        rand_d.append(
            np.median(((V - V[idx[q]]) ** 2).sum(axis=1)[ids != q])
        )
    assert np.mean(true_top1) < np.mean(rand_d)


def test_mixture_temperature_brute(spark):
    out = q_mixture_temperature(spark, SF).toPandas().set_index("source")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    n = d.groupby("source").size()
    p = n / n.sum()
    w = p**_MIX_ALPHA / (p**_MIX_ALPHA).sum()
    for src in n.index:
        row = out.loc[src]
        assert row["n_docs"] == n[src]
        assert abs(row["p"] - round(p[src], 6)) < 1e-9
        assert abs(row["w"] - round(w[src], 6)) < 1e-9
    # temperature flattens: every source's weight sits between its
    # natural share and the uniform share
    u = 1.0 / len(n)
    for src in n.index:
        lo, hi = sorted((p[src], u))
        assert lo - 1e-9 <= out.loc[src, "w"] <= hi + 1e-9
    assert abs(out["w"].sum() - 1.0) < 1e-6
