"""Semantic tests for feature-eng pack #23: inverted-index sparse
top-k, signed-random-projection signatures, manual HLL registers,
Spearman rank correlation, integer CUSUM changepoint, and KS
best-threshold (brute python replicas; cross-engine parity is proven
by the check_entry sweeps)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _HLL_M,
    _HLL_W,
    _SPARSE_MIN,
    _SPARSE_POST_CAP,
    _SPARSE_Q,
    _SPARSE_TOPK,
    _SRP_BITS,
    _SRP_Q,
    q_best_threshold,
    q_cusum_changepoint,
    q_hll_distinct,
    q_sparse_topk,
    q_spearman_corr,
    q_srp_signature,
)

SF = "/root/testdata/sf0.001"


def _emb():
    e = pd.read_parquet(f"{SF}/embeddings.parquet")
    return list(zip(e.vec_id, e.embedding))


def test_sparse_topk_brute(spark):
    out = q_sparse_topk(spark, SF).toPandas()
    # posting lists: (dim, vec_id) -> q, thresholded then impact-capped
    posts = {}
    for vid, emb in _emb():
        for d, v in enumerate(emb):
            q = int(np.rint(np.float64(v) * _SPARSE_Q))
            if abs(q) >= _SPARSE_MIN:
                posts.setdefault(d, []).append((vid, q))
    pairs = {}
    for d, lst in posts.items():
        lst = sorted(lst, key=lambda t: (-abs(t[1]), t[0]))[:_SPARSE_POST_CAP]
        for a_vid, a_q in lst:
            for b_vid, b_q in lst:
                if a_vid != b_vid:
                    dot, n = pairs.get((a_vid, b_vid), (0, 0))
                    pairs[(a_vid, b_vid)] = (dot + a_q * b_q, n + 1)
    want = {}
    by_vec = {}
    for (a, b), (dot, n) in pairs.items():
        if dot > 0:
            by_vec.setdefault(a, []).append((b, dot, n))
    for a, lst in by_vec.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        for rk, (b, dot, n) in enumerate(lst[:_SPARSE_TOPK], 1):
            want[(a, b)] = (dot, n, rk)
    got = {
        (r.vec_id, r.nbr_id): (r.dot_q, r.n_dims, r.rk)
        for r in out.itertuples()
    }
    assert got == want
    # every vector with any positive-dot neighbor appears
    assert set(out.vec_id) == set(by_vec)


def _srp_sign(d: int, j: int) -> int:
    h = hashlib.md5(f"{d}:{j}".encode()).hexdigest()
    return (int(h[:4], 16) % 2) * 2 - 1


def test_srp_signature_brute(spark):
    out = q_srp_signature(spark, SF).toPandas()
    sigs = {}
    for vid, emb in _emb():
        sig = 0
        for j in range(_SRP_BITS):
            s = sum(
                _srp_sign(d, j) * int(np.rint(np.float64(v) * _SRP_Q))
                for d, v in enumerate(emb)
            )
            if s > 0:
                sig |= 1 << j
        sigs[vid] = sig
    occ = {}
    for sig in sigs.values():
        occ[sig] = occ.get(sig, 0) + 1
    assert len(out) == len(sigs)
    for r in out.itertuples():
        assert sigs[r.vec_id] == r.sig
        assert r.n_bits == bin(r.sig).count("1")
        assert r.bucket_n == occ[r.sig]
    # sanity: signatures are spread, not constant
    assert len(occ) > 1


def test_hll_distinct_brute(spark):
    out = q_hll_distinct(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    for et, g in ev.groupby("event_type"):
        regs = {}
        for uid in g.user_id:
            h = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)
            bucket, rest = h % _HLL_M, h >> 4
            rank = (
                _HLL_W + 1
                if rest == 0
                else ((rest & -rest).bit_length() - 1) + 1
            )
            regs[bucket] = max(regs.get(bucket, 0), rank)
        den = sum(2 ** (57 - r) for r in regs.values()) + (
            _HLL_M - len(regs)
        ) * 2**57
        est = round(0.673 * 256.0 * float(2**57) / float(den), 4)
        row = out[out.event_type == et].iloc[0]
        assert row.n_events == len(g)
        assert row.exact_distinct == g.user_id.nunique()
        assert row.hll_est == est
        # the estimate should be within a loose band of the truth
        assert 0.3 * row.exact_distinct < est < 3.0 * row.exact_distinct


def test_spearman_brute(spark):
    out = q_spearman_corr(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    for et, g in ev.groupby("event_type"):
        rv = {
            eid: i + 1
            for i, eid in enumerate(
                g.sort_values(["value", "event_id"]).event_id
            )
        }
        rt = {
            eid: i + 1
            for i, eid in enumerate(
                g.sort_values(["ts", "event_id"]).event_id
            )
        }
        n = len(g)
        sum_d2 = sum((rv[e] - rt[e]) ** 2 for e in g.event_id)
        rho = round(1.0 - (6.0 * sum_d2) / float(n * (n * n - 1)), 6)
        row = out[out.event_type == et].iloc[0]
        assert (row.n, row.sum_d2) == (n, sum_d2)
        assert row.rho == rho
        assert -1.0 <= row.rho <= 1.0


def test_cusum_brute(spark):
    out = q_cusum_changepoint(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert len(out) == ev.user_id.nunique()
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cents = [int(np.rint(v * 100)) for v in g.value]
        n, total = len(cents), sum(cents)
        best = None  # (adev desc, i asc)
        cum = 0
        for i, (c, eid) in enumerate(zip(cents, g.event_id), 1):
            cum += c
            adev = abs(n * cum - i * total)
            if best is None or adev > best[0]:
                best = (adev, i, eid)
        row = out[out.user_id == uid].iloc[0]
        assert (row.n, row.cp_i, row.cp_event_id, row.max_abs_dev) == (
            n,
            best[1],
            best[2],
            best[0],
        )


def test_best_threshold_brute(spark):
    out = q_best_threshold(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.event_type.isin(["purchase", "click"])].copy()
    ev["day"] = ev.ts.dt.day
    for day, g in ev.groupby("day"):
        n_pos = int((g.event_type == "purchase").sum())
        n_neg = int((g.event_type == "click").sum())
        if n_pos == 0 or n_neg == 0:
            assert day not in set(out.day)
            continue
        hist = {}
        for v, et in zip(g.value, g.event_type):
            p, ng = hist.get(v, (0, 0))
            hist[v] = (p + (et == "purchase"), ng + (et == "click"))
        cum_p = cum_n = 0
        best = None  # (ks_num desc, v asc)
        for v in sorted(hist):
            cum_p += hist[v][0]
            cum_n += hist[v][1]
            ks_num = abs(cum_p * n_neg - cum_n * n_pos)
            if best is None or ks_num > best[0]:
                best = (ks_num, v)
        row = out[out.day == day].iloc[0]
        assert (row.n_pos, row.n_neg) == (n_pos, n_neg)
        assert row.thr_v == best[1]
        assert row.ks == round(best[0] / float(n_pos * n_neg), 6)
        assert 0.0 <= row.ks <= 1.0
