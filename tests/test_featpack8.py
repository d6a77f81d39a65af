"""Semantic property tests for feature-eng pack #8: blocked fuzzy
join (brute levenshtein parity), unpivot (wide reconstruction), BPE
pair counting (brute parity), skew report (brute parity + ordering),
and grouped EWMA (pandas ewm parity — the rows-only key's correctness
oracle). Cross-engine value parity for the oracle-backed keys is
separately proven by the check_entry sweeps."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _EWMA_ALPHA,
    q_bpe_pair_counts,
    q_ewma,
    q_fuzzy_join,
    q_skew_report,
    q_unpivot,
)

SF = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_join_brute_parity(spark):
    out = q_fuzzy_join(spark, SF).toPandas().set_index("doc_id")
    docs = _docs()
    vocab = set()
    for t in docs["text"]:
        vocab.update(t.strip().split())
    n_checked = 0
    for r in docs.itertuples():
        ft = r.text.strip().split()[0]
        if len(ft) < 4:
            assert r.doc_id not in out.index
            continue
        q = ft[:-1]
        cands = sorted(
            (( _lev(q, t), t) for t in vocab
             if t[0] == q[0] and _lev(q, t) <= 1),
        )
        if not cands:
            assert r.doc_id not in out.index
            continue
        got = out.loc[r.doc_id]
        assert got["q"] == q
        assert (got["dist"], got["matched"]) == cands[0]
        n_checked += 1
    assert n_checked > 100  # the probe set is non-vacuous


def test_fuzzy_join_matches_are_close(spark):
    out = q_fuzzy_join(spark, SF).toPandas()
    assert (out["dist"] <= 1).all()
    assert (out["q"].str[0] == out["matched"].str[0]).all()


def test_unpivot_reconstructs_wide(spark):
    out = q_unpivot(spark, SF).toPandas()
    ev = _events()
    types = ev["event_type"].nunique()
    assert len(out) == 3 * types
    wide = out.pivot(index="event_type", columns="metric", values="value")
    g = ev.groupby("event_type")
    for et, grp in g:
        assert wide.loc[et, "n_events"] == len(grp)
        assert wide.loc[et, "n_users"] == grp["user_id"].nunique()
        exact = grp["value"].map(lambda v: round(v, 6)).sum()
        assert abs(wide.loc[et, "sum_value"] - exact) < 1e-6


def test_bpe_pair_counts_brute_parity(spark):
    out = q_bpe_pair_counts(spark, SF).toPandas()
    uni = Counter()
    for t in _docs()["text"]:
        uni.update(t.strip().split())
    exp = Counter()
    for w, c in uni.items():
        if len(w) >= 2:
            for i in range(len(w) - 1):
                exp[(w[i], w[i + 1])] += c
    got = {(r.l, r.r): r.n for r in out.itertuples()}
    assert got == dict(exp)


def test_skew_report_brute_parity(spark):
    out = q_skew_report(spark, SF).toPandas()
    ev = _events()
    cnt = ev.groupby("user_id").size()
    exp = sorted(
        ((c, u) for u, c in cnt.items()), key=lambda x: (-x[0], x[1])
    )[:20]
    assert len(out) == min(20, len(cnt))
    out = out.sort_values("rn")
    for (c, u), r in zip(exp, out.itertuples()):
        assert (r.user_id, r.cnt) == (u, c)
        assert abs(r.share - round(c / len(ev), 6)) < 1e-12
    # ranks are 1..k and shares are descending
    assert list(out["rn"]) == list(range(1, len(out) + 1))
    assert (out["cnt"].diff().dropna() <= 0).all()


def test_ewma_pandas_parity(spark):
    out = q_ewma(spark, SF).toPandas()
    ev = _events()
    assert len(out) == len(ev)
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    pdf = pd.DataFrame(
        {
            "user_id": ev["user_id"],
            "ts_us": us,
            "event_id": ev["event_id"],
            "value": ev["value"],
        }
    ).sort_values(["user_id", "ts_us", "event_id"], ignore_index=True)
    pdf["ewma"] = (
        pdf.groupby("user_id")["value"]
        .transform(lambda s: s.ewm(alpha=_EWMA_ALPHA, adjust=False).mean())
        .round(4)
    )
    got = out.sort_values(
        ["user_id", "ts_us", "event_id"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got, pdf, check_exact=False, atol=1e-9)


def test_ewma_first_value_is_identity(spark):
    """adjust=False EWMA seeds with the first observation."""
    out = q_ewma(spark, SF).toPandas()
    first = out.sort_values(["ts_us", "event_id"]).groupby("user_id").head(1)
    assert np.allclose(first["ewma"], first["value"].round(4))
