"""Semantic tests for feature-eng pack #18: per-source dataset card,
two-sample KS drift statistic, and Benford first-digit audit (brute
python replicas; cross-engine parity is proven by the check_entry
sweeps)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

from crawlfe.queries import (
    q_benford_audit,
    q_dataset_card,
    q_ks_drift,
)

SF = "/root/testdata/sf0.001"


def test_dataset_card_brute(spark):
    out = q_dataset_card(spark, SF).toPandas().set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for src, grp in docs.groupby("source"):
        n_docs = len(grp)
        toks = grp["text"].map(lambda t: len(t.strip().split()))
        shas = grp["text"].map(
            lambda t: hashlib.sha256(t.encode()).hexdigest()
        )
        occ = Counter(shas)
        n_dup = sum(c for c in occ.values() if c > 1)
        row = out.loc[src]
        assert row["n_docs"] == n_docs
        assert row["total_tokens"] == toks.sum()
        assert row["avg_doc_tokens"] == round(toks.sum() / n_docs, 4)
        assert row["n_langs"] == grp["lang"].nunique()
        assert row["n_dup_docs"] == n_dup
        assert row["dup_rate"] == round(n_dup / n_docs, 6)
        # exact median with continuous interpolation
        s = sorted(grp["n_chars"])
        h = (len(s) - 1) * 0.5
        lo = int(h)
        med = s[lo] + (h - lo) * (s[min(lo + 1, len(s) - 1)] - s[lo])
        assert row["p50_chars"] == round(med, 4)


def _brute_ks(grp: pd.DataFrame) -> tuple[int, int, float]:
    g1 = grp[grp["ts"].dt.day <= 15]["value"]
    g2 = grp[grp["ts"].dt.day > 15]["value"]
    n1, n2 = len(g1), len(g2)
    c1 = Counter(g1)
    c2 = Counter(g2)
    cum1 = cum2 = 0
    best = 0
    for v in sorted(set(c1) | set(c2)):
        cum1 += c1.get(v, 0)
        cum2 += c2.get(v, 0)
        best = max(best, abs(cum1 * n2 - cum2 * n1))
    return n1, n2, round(best / (n1 * n2), 6)


def test_ks_drift_brute(spark):
    out = q_ks_drift(spark, SF).toPandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    for et, grp in ev.groupby("event_type"):
        n1, n2, ks = _brute_ks(grp)
        row = out.loc[et]
        assert (row["n1"], row["n2"]) == (n1, n2)
        assert row["ks_stat"] == ks
    # the synthetic month has both halves populated for every type
    assert (out["n1"] > 0).all() and (out["n2"] > 0).all()
    assert (out["ks_stat"] >= 0).all() and (out["ks_stat"] <= 1).all()


def test_benford_audit_brute(spark):
    out = q_benford_audit(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    cents = (ev["value"] * 100).round().astype("int64")
    ev = ev.assign(cents=cents)[cents > 0]
    ev = ev.assign(digit=ev["cents"].astype(str).str[0].astype(int))
    want = ev.groupby(["event_type", "digit"]).size()
    tot = ev.groupby("event_type").size()
    assert len(out) == len(want)
    for r in out.itertuples():
        assert r.n == want.loc[(r.event_type, r.digit)]
        assert r.obs_share == round(r.n / tot.loc[r.event_type], 6)
        assert r.exp_share == round(math.log10(1 + 1 / r.digit), 6)
        assert 1 <= r.digit <= 9
