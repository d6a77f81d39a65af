"""Semantic tests for feature-eng pack #93: MinHash accuracy, 1-bit
MinHash MAE, containment estimate (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib

import pandas as pd

from crawlfe.queries import (
    _MH_K,
    q_bbit_minhash,
    q_containment_est,
    q_minhash_accuracy,
)

SF = "/root/testdata/sf0.001"


def _tok_sets():
    d = pd.read_parquet(f"{SF}/documents.parquet")
    return {
        i: set(t.strip().split())
        for i, t in zip(d.doc_id, d.text)
    }


def _minima(tokens):
    out = {}
    for k in range(1, _MH_K + 1):
        out[k] = min(
            int(hashlib.md5(f"mh{k}:{t}".encode()).hexdigest()[:8], 16)
            for t in tokens
        )
    return out


def test_minhash_accuracy_brute(spark):
    out = (
        q_minhash_accuracy(spark, SF).toPandas().set_index("doc_a").sort_index()
    )
    sets = _tok_sets()
    ids = sorted(sets)
    mins = {i: _minima(sets[i]) for i in ids}
    n_pairs = 0
    for a in ids:
        if a + 1 not in sets:
            continue
        n_pairs += 1
        A, B = sets[a], sets[a + 1]
        inter = len(A & B)
        je = inter / len(A | B)
        agree = sum(
            mins[a][k] == mins[a + 1][k] for k in range(1, _MH_K + 1)
        )
        row = out.loc[a]
        assert (row.n_a, row.n_b, row.inter, row.agree) == (
            len(A),
            len(B),
            inter,
            agree,
        )
        assert abs(row.j_exact - round(je, 6)) < 1e-9
        assert abs(row.j_est - round(agree / _MH_K, 6)) < 1e-9
    assert len(out) == n_pairs


def test_bbit_minhash_brute(spark):
    out = q_bbit_minhash(spark, SF).toPandas().iloc[0]
    sets = _tok_sets()
    ids = sorted(sets)
    mins = {i: _minima(sets[i]) for i in ids}
    ef = eb = n = 0
    for a in ids:
        if a + 1 not in sets:
            continue
        A, B = sets[a], sets[a + 1]
        je = len(A & B) / len(A | B)
        agf = sum(
            mins[a][k] == mins[a + 1][k] for k in range(1, _MH_K + 1)
        )
        agb = sum(
            mins[a][k] % 2 == mins[a + 1][k] % 2
            for k in range(1, _MH_K + 1)
        )
        ef += round(abs(je - agf / _MH_K), 9)
        eb += round(abs(je - max(0.0, 2 * agb / _MH_K - 1)), 9)
        n += 1
    assert out.n_pairs == n
    assert abs(out.mae_32hash - round(ef / n, 6)) < 1e-6
    assert abs(out.mae_1bit - round(eb / n, 6)) < 1e-6
    # 1 bit of 32 hashes cannot beat the full minima on average
    assert out.mae_1bit >= out.mae_32hash - 1e-9


def test_containment_est_brute(spark):
    out = (
        q_containment_est(spark, SF).toPandas().set_index("doc_a").sort_index()
    )
    sets = _tok_sets()
    ids = sorted(sets)
    mins = {i: _minima(sets[i]) for i in ids}
    for a in ids:
        if a + 1 not in sets:
            continue
        A, B = sets[a], sets[a + 1]
        ce = len(A & B) / len(A)
        agree = sum(
            mins[a][k] == mins[a + 1][k] for k in range(1, _MH_K + 1)
        )
        jest = agree / _MH_K
        cest = jest * (len(A) + len(B)) / (len(A) * (1 + jest))
        row = out.loc[a]
        assert abs(row.c_exact - round(ce, 6)) < 1e-9
        assert abs(row.c_est - round(cest, 6)) < 1e-9
        assert 0 <= row.c_exact <= 1
