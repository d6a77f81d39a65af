"""Semantic tests for feature-eng pack #25: Kendall tau-b, two-
proportion z-test, NDCG@10, Hodges-Lehmann estimator, McNemar paired
test, and Chao1 richness (brute python replicas; cross-engine parity
is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _HL_K,
    _KT_K,
    _NDCG_CUM,
    _NDCG_DISC,
    _NDCG_K,
    q_chao1_richness,
    q_hodges_lehmann,
    q_kendall_tau,
    q_mcnemar_test,
    q_ndcg_at_k,
    q_two_prop_z,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_kendall_tau_brute(spark):
    out = q_kendall_tau(spark, SF).toPandas().set_index("source")
    docs = _docs().sort_values("doc_id")
    for src, g in docs.groupby("source"):
        y = g.n_chars.to_numpy()[:_KT_K]
        n = len(y)
        conc = disc = ties = 0
        for i in range(n):
            for j in range(i + 1, n):
                if y[j] > y[i]:
                    conc += 1
                elif y[j] < y[i]:
                    disc += 1
                else:
                    ties += 1
        if conc + disc == 0:
            assert src not in out.index
            continue
        row = out.loc[src]
        assert (row.concordant, row.discordant, row.ties) == (
            conc,
            disc,
            ties,
        )
        tau = (conc - disc) / math.sqrt(
            (conc + disc + ties) * (conc + disc)
        )
        assert abs(row.tau_b - round(tau, 6)) < 1e-12
        # tau-b is bounded
        assert -1.0 <= row.tau_b <= 1.0


def test_two_prop_z_brute(spark):
    out = q_two_prop_z(spark, SF).toPandas().set_index("event_type")
    ev = _events()
    hi = ev.value >= 50.0
    X, N = int(hi.sum()), len(ev)
    for et, g in ev.groupby("event_type"):
        x1, n1 = int((g.value >= 50.0).sum()), len(g)
        x2, n2 = X - x1, N - n1
        p1, p2, pp = x1 / n1, x2 / n2, X / N
        z = (p1 - p2) / math.sqrt(
            pp * (1 - pp) * (1 / n1 + 1 / n2)
        )
        row = out.loc[et]
        assert (row.x1, row.n1, row.x2, row.n2) == (x1, n1, x2, n2)
        assert abs(row.z_score - round(z, 6)) < 1e-12


def test_ndcg_discount_literals():
    # the module-level integer literals ARE 1e6/log2(r+1) rounded once
    for r, d in enumerate(_NDCG_DISC, 1):
        assert d == round(1_000_000 / math.log2(r + 1))
    assert _NDCG_DISC[0] == 1_000_000  # rank 1: log2(2) = 1
    assert list(_NDCG_CUM) == list(np.cumsum(_NDCG_DISC))


def test_ndcg_at_k_brute(spark):
    out = q_ndcg_at_k(spark, SF).toPandas().set_index("user_id")
    ev = _events()
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(
            ["value", "event_id"], ascending=[False, True]
        )
        rel = (g.event_type == "purchase").astype(int).to_numpy()
        n_rel = int(rel.sum())
        if n_rel == 0:
            assert uid not in out.index
            continue
        dcg = int(
            sum(
                rel[i] * _NDCG_DISC[i]
                for i in range(min(_NDCG_K, len(rel)))
            )
        )
        idcg = _NDCG_CUM[min(n_rel, _NDCG_K) - 1]
        row = out.loc[uid]
        assert (row.n_rel, row.dcg_s) == (n_rel, dcg)
        assert abs(row.ndcg10 - round(dcg / idcg, 6)) < 1e-12
        assert 0.0 <= row.ndcg10 <= 1.0


def test_hodges_lehmann_brute(spark):
    out = (
        q_hodges_lehmann(spark, SF).toPandas().set_index("event_type")
    )
    ev = _events()
    for et, g in ev.groupby("event_type"):
        c = np.rint(
            g.sort_values("event_id").value.to_numpy()[:_HL_K] * 100
        ).astype(np.int64)
        sums = sorted(
            c[i] + c[j]
            for i in range(len(c))
            for j in range(i, len(c))
        )
        m = len(sums)
        s_med = sums[(m + 1) // 2 - 1]  # lower median, 1-indexed pick
        row = out.loc[et]
        assert row.m_pairs == m == len(c) * (len(c) + 1) // 2
        assert abs(row.hl_est - round(s_med / 200.0, 6)) < 1e-12


def test_mcnemar_brute(spark):
    out = q_mcnemar_test(spark, SF).toPandas().set_index("event_type")
    ev = _events()
    ev = ev.assign(day=ev.ts.dt.day)
    for et, g in ev.groupby("event_type"):
        per = g.groupby("user_id").day.agg(
            h1=lambda d: int((d <= 15).any()),
            h2=lambda d: int((d >= 16).any()),
        )
        a = int((per.h1 * per.h2).sum())
        b = int((per.h1 * (1 - per.h2)).sum())
        cc = int(((1 - per.h1) * per.h2).sum())
        if b + cc == 0:
            assert et not in out.index
            continue
        row = out.loc[et]
        assert (row.n_both, row.n_h1_only, row.n_h2_only) == (a, b, cc)
        assert abs(
            row.mcnemar_chi2 - round((b - cc) ** 2 / (b + cc), 6)
        ) < 1e-12


def test_chao1_brute(spark):
    out = (
        q_chao1_richness(spark, SF).toPandas().set_index("source")
    )
    docs = _docs()
    for src, g in docs.groupby("source"):
        counts: dict[str, int] = {}
        for t in g.text:
            for tok in t.strip().split():
                counts[tok] = counts.get(tok, 0) + 1
        s_obs = len(counts)
        f1 = sum(1 for v in counts.values() if v == 1)
        f2 = sum(1 for v in counts.values() if v == 2)
        chao1 = s_obs + f1 * (f1 - 1) / (2 * (f2 + 1))
        row = out.loc[src]
        assert (row.s_obs, row.f1, row.f2) == (s_obs, f1, f2)
        assert abs(row.chao1 - round(chao1, 6)) < 1e-12
        assert row.chao1 >= row.s_obs
