"""Semantic tests for feature-eng pack #88: Benjamini-Yekutieli FDR,
Storey pi0, Fellegi-Sunter weights (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from crawlfe.queries import (
    _FS_PREFIX,
    _ND_MOD,
    _STOREY_LAMBDA_PPB,
    q_benjamini_yekutieli,
    q_fs_weights,
    q_storey_pi0,
)

SF = "/root/testdata/sf0.001"


def _ptests():
    d = pd.read_parquet(f"{SF}/documents.parquet")
    per = (
        d.assign(is_long=(d.n_chars >= 300).astype(int))
        .groupby("source")
        .agg(n_docs=("doc_id", "size"), n_long=("is_long", "sum"))
        .reset_index()
    )
    n_all, long_all, m = per.n_docs.sum(), per.n_long.sum(), len(per)
    p0 = (long_all + 1.0) / (n_all + 2)
    z = (per.n_long / per.n_docs - p0) / (
        (p0 * (1 - p0) / per.n_docs) ** 0.5
    )
    per["p_ppb"] = [
        int(round(1e9 * 2.0 / (1.0 + math.exp(1.702 * abs(zz))))) for zz in z
    ]
    return per, m


def test_benjamini_yekutieli_brute(spark):
    out = (
        q_benjamini_yekutieli(spark, SF)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    per, m = _ptests()
    hm_e6 = round(1e6 * sum(1.0 / i for i in range(1, m + 1)))
    ranked = per.sort_values(["p_ppb", "source"]).reset_index(drop=True)
    ranked["p_rank"] = range(1, m + 1)
    ks = [
        r.p_rank
        for r in ranked.itertuples()
        if r.p_ppb * m * hm_e6 <= 10_000_000_000_000 * r.p_rank
    ]
    k_max = max(ks) if ks else 0
    for r in ranked.itertuples():
        row = out.loc[r.source]
        assert row.p_ppb == r.p_ppb
        assert row.p_rank == r.p_rank
        assert row.hm_e6 == hm_e6
        assert row.reject_by == int(r.p_rank <= k_max)
    # BY is strictly more conservative than BH: a BY rejection implies
    # the BH rule would also reject at the same rank
    for r in ranked.itertuples():
        if out.loc[r.source].reject_by:
            assert r.p_ppb * m <= 100_000_000 * k_max


def test_storey_pi0_brute(spark):
    out = q_storey_pi0(spark, SF).toPandas().iloc[0]
    per, m = _ptests()
    n_above = int((per.p_ppb > _STOREY_LAMBDA_PPB).sum())
    pi0 = min(1.0, n_above / (0.5 * m))
    assert (out.m, out.n_above) == (m, n_above)
    assert abs(out.pi0 - round(pi0, 6)) < 1e-9
    assert abs(out.est_signals - round(m * (1 - pi0), 4)) < 1e-9
    assert 0 <= out.pi0 <= 1


def test_fs_weights_brute(spark):
    out = q_fs_weights(spark, SF).toPandas().set_index("field")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    d = d[(d.doc_id % _ND_MOD).isin([0, 1])].sort_values("doc_id")
    d["copy_text"] = [
        t if i % _ND_MOD == 0 else t + " zz7"
        for i, t in zip(d.doc_id, d.text)
    ]
    d["next_copy"] = d.copy_text.shift(-1)
    f = d[d.next_copy.notna()]
    n = len(f)

    def rates(a, b):
        h = sum(
            hashlib.sha256(x.encode()).hexdigest()
            == hashlib.sha256(y.encode()).hexdigest()
            for x, y in zip(a, b)
        )
        ln = sum(len(x) == len(y) for x, y in zip(a, b))
        pf = sum(
            x[:_FS_PREFIX] == y[:_FS_PREFIX] for x, y in zip(a, b)
        )
        return {"hash": h, "len": ln, "prefix": pf}

    m_ag = rates(f.text, f.copy_text)
    u_ag = rates(f.text, f.next_copy)
    for k in ("hash", "len", "prefix"):
        row = out.loc[k]
        assert row.n == n
        assert row.agree_m == m_ag[k]
        assert row.agree_u == u_ag[k]
        mp, up = (m_ag[k] + 1) / (n + 2), (u_ag[k] + 1) / (n + 2)
        assert abs(row.weight - round(math.log(mp / up), 6)) < 1e-6
    # exact copies mean the hash field agrees on >= the %5==0 share of
    # match pairs, and (almost) never on the shifted non-match pairs —
    # so the hash weight dominates the others
    assert out.loc["hash"].weight >= out.loc["len"].weight - 1e-9
    assert out.loc["hash"].weight > 0
