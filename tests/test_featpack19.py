"""Semantic tests for feature-eng pack #19: deterministic k-means++
seeding, inverse-propensity domain weights, and sequence-length
buckets (brute python replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _KMPP_K,
    _KMPP_L,
    _KMPP_ROUNDS,
    q_domain_weights,
    q_kmeanspp_seeds,
    q_length_buckets,
)

SF = "/root/testdata/sf0.001"


def test_kmeanspp_seeds_brute(spark):
    """k-means|| (deterministic farthest-L oversampling, r4): each of
    the _KMPP_ROUNDS rounds picks the _KMPP_L vectors with the largest
    rounded min-sq-L2 to ALL centers chosen in earlier rounds (ties ->
    smallest vec_id), jointly — no distance update within a round."""
    out = (
        q_kmeanspp_seeds(spark, SF).toPandas().sort_values("seed_rank")
    )
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples()
    }
    chosen = [(0, 0.0)]
    for _ in range(_KMPP_ROUNDS):
        ids = {c for c, _ in chosen}
        cand = []
        for vid, v in vecs.items():
            if vid in ids:
                continue
            d = round(
                min(float(((v - vecs[c]) ** 2).sum()) for c in ids), 4
            )
            cand.append((vid, d))
        cand.sort(key=lambda t: (-t[1], t[0]))
        chosen.extend(cand[:_KMPP_L])
    assert len(chosen) == _KMPP_K == 1 + _KMPP_ROUNDS * _KMPP_L
    got = [
        (r.seed_rank, r.vec_id, r.sel_dist) for r in out.itertuples()
    ]
    want = [
        (rank, vid, d) for rank, (vid, d) in enumerate(chosen, start=1)
    ]
    assert got == want
    # farthest-first property WITHIN each round: distances never
    # increase across a round's L picks
    for r0 in range(_KMPP_ROUNDS):
        lo = 1 + r0 * _KMPP_L
        dists = [d for _, _, d in got[lo : lo + _KMPP_L]]
        assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_domain_weights_brute(spark):
    out = q_domain_weights(spark, SF).toPandas().set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per = docs.groupby("source").size()
    n_all, n_src = len(docs), len(per)
    for src, n in per.items():
        raw = n_all / (n_src * n)
        row = out.loc[src]
        assert row["n_docs"] == n
        assert row["raw_weight"] == round(raw, 6)
        assert row["weight"] == round(min(max(raw, 0.2), 5.0), 6)
    # reweighted corpus is uniform across sources (up to clipping)
    assert abs((out["raw_weight"] * out["n_docs"]).sum() - n_all) < 1e-6


def _quantile_cont(vals, p):
    s = sorted(vals)
    h = (len(s) - 1) * p
    lo = int(h)
    return s[lo] + (h - lo) * (s[min(lo + 1, len(s) - 1)] - s[lo])


def test_length_buckets_brute(spark):
    out = q_length_buckets(spark, SF).toPandas().set_index("bucket")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = docs["text"].map(lambda t: len(t.strip().split()))
    c1, c2, c3 = (_quantile_cont(toks, p) for p in (0.25, 0.5, 0.75))
    bucket = toks.map(
        lambda n: 1 if n <= c1 else 2 if n <= c2 else 3 if n <= c3 else 4
    )
    for b, grp in toks.groupby(bucket):
        row = out.loc[b]
        assert row["n_docs"] == len(grp)
        assert row["min_toks"] == grp.min()
        assert row["max_toks"] == grp.max()
        assert row["avg_toks"] == round(grp.sum() / len(grp), 4)
        assert row["padding_waste"] == round(
            1 - grp.sum() / (len(grp) * grp.max()), 6
        )
    # bucketing by quartile keeps per-bucket padding waste below the
    # single-bucket (pad-everything-to-global-max) waste
    global_waste = 1 - toks.sum() / (len(toks) * toks.max())
    assert (out["padding_waste"] < global_waste).all()
