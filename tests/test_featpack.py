"""Semantic property tests for the round-3 feature-engineering pack:
leave-one-out target encoding (leakage exclusion), group z-score
normalization (mean 0 / var 1), repetition quality signals (planted
duplicates), benchmark contamination (planted overlap), and
hashing-trick buckets (mass conservation). The cross-engine value
parity of each query is separately proven by the check_entry sweeps
(BENCH/sweeps_r03.jsonl); these tests pin the SEMANTICS."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawlfe.queries import (
    q_contamination,
    q_feature_hashing,
    q_quality_repetition,
    q_target_encode_loo,
    q_tpch_q6,
    q_zscore_norm,
)

SF = "/root/testdata/sf0.001"


def test_target_encode_loo_excludes_self(spark):
    """loo_mean must equal the group mean computed WITHOUT the row
    itself — the leakage guard. Verified by brute force in pandas on
    the 4-dec-rounded values the query contractually encodes."""
    out = q_target_encode_loo(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")[["event_id", "event_type", "value"]]
    ev["x"] = ev["value"].round(4)
    g = ev.groupby("event_type")["x"].agg(["sum", "count"])
    ev = ev.merge(g, on="event_type")
    expected = np.round((ev["sum"] - ev["x"]) * 10000.0 / (ev["count"] - 1)) / 10000.0
    ev["expected"] = expected
    m = out.merge(ev[["event_id", "expected"]], on="event_id")
    assert len(m) == len(out) == len(ev)
    assert np.allclose(m["loo_mean"], m["expected"], atol=1e-9)
    # the encoder must NOT equal the naive (leaky) group mean anywhere
    leaky = ev["sum"] / ev["count"]
    assert not np.allclose(m["loo_mean"], leaky.loc[m.index], atol=1e-6)


def test_zscore_norm_is_standard(spark):
    """Per group: mean(z) ~ 0 and population var(z) ~ 1 (up to the
    4-dec rounding the query applies)."""
    out = q_zscore_norm(spark, SF).toPandas()
    for _, grp in out.groupby("event_type"):
        assert abs(grp["z"].mean()) < 1e-3
        assert abs(np.var(grp["z"]) - 1.0) < 1e-3


def test_quality_repetition_planted(spark):
    """A fully-repeated document scores dup fractions near 1; an
    all-distinct document scores exactly 0."""
    df = spark.createDataFrame(
        [
            (1, "a a a a a a a a"),
            (2, "one two three four five six"),
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_qr")

    # reuse the query body by monkey-locating: build directly
    from crawlfe import queries as Q

    with Q._patched_tables(lambda s, d, n: df):
        out = {r["doc_id"]: r.asDict() for r in q_quality_repetition(spark, SF).collect()}
    assert out[1]["dup_token_frac"] == pytest.approx(7 / 8, abs=1e-4)
    assert out[1]["dup_bigram_frac"] == pytest.approx(6 / 7, abs=1e-4)
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[3]["n_tokens"] == 1
    assert out[3]["dup_bigram_frac"] is None  # no bigrams -> NULL


def test_contamination_planted_overlap(spark):
    """Docs sharing a 3-gram with the eval doc (id 0, since 0 % 97 == 0)
    are flagged; disjoint docs are not; eval docs never flag themselves."""
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),  # eval (0 % 97 == 0)
            (1, "lead-in the quick brown fox trailer"),  # shares 2 shingles
            (2, "completely different token soup here"),  # disjoint
            (97, "the quick brown fox jumps"),  # eval too (97 % 97 == 0)
        ],
        "doc_id long, text string",
    )
    from crawlfe import queries as Q

    with Q._patched_tables(lambda s, d, n: df):
        out = {r["doc_id"]: r["n_shared_shingles"] for r in q_contamination(spark, SF).collect()}
    assert out == {1: 2}  # 'the quick brown', 'quick brown fox'


def test_feature_hashing_mass_conservation(spark):
    """Bucket counts per doc must sum to the doc's token count, and
    bucket ids stay within the 256-value hex-byte domain."""
    out = q_feature_hashing(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    tok_counts = docs.set_index("doc_id")["text"].str.strip().str.split().map(len)
    per_doc = out.groupby("doc_id")["n"].sum()
    assert per_doc.sort_index().equals(tok_counts.sort_index().astype(per_doc.dtype))
    assert out["bucket"].str.fullmatch("[0-9a-f]{2}").all()


def test_tpch_q6_matches_pandas(spark):
    out = q_tpch_q6(spark, SF).collect()[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    m = li[
        (li["l_shipdate"] >= "1995-01-01")
        & (li["l_shipdate"] < "1996-01-01")
        & (li["l_discount"] >= 0.05)
        & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    ]
    assert out["n_rows"] == len(m)
    assert out["revenue"] == pytest.approx(
        (m["l_extendedprice"] * m["l_discount"]).sum(), rel=1e-9
    )


def test_dedup_keep_best_picks_max_quality(spark):
    """Every emitted block winner must be the longest doc in its block
    (min doc_id on ties), n_docs must equal the true block size, and
    single-doc blocks must not appear. Brute-forced in pandas."""
    from crawlfe.queries import q_dedup_keep_best

    out = q_dedup_keep_best(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["block"] = docs["text"].str[:3]
    sizes = docs.groupby("block").size()
    assert (out["n_docs"] > 1).all()
    assert (out["n_dropped"] == out["n_docs"] - 1).all()
    multi = set(sizes[sizes > 1].index)
    assert set(out["block"]) == multi and len(out) == len(multi) > 0
    for _, r in out.iterrows():
        blk = docs[docs["block"] == r["block"]]
        assert r["n_docs"] == len(blk)
        best = blk.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).iloc[0]
        assert r["best_doc_id"] == best["doc_id"]
        assert r["best_n_chars"] == best["n_chars"]


def test_stratified_sample_deterministic_and_quota(spark):
    """Non-en strata pass through untouched; en is cut to the <= '3f'
    hash-bucket quarter; two runs give byte-identical row sets (the
    reproducibility property rand()-sampling lacks)."""
    from crawlfe.queries import q_stratified_sample

    a = q_stratified_sample(spark, SF).toPandas().sort_values("doc_id")
    b = q_stratified_sample(spark, SF).toPandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    non_en = docs[docs["lang"] != "en"]
    assert len(a[a["lang"] != "en"]) == len(non_en)
    en = a[a["lang"] == "en"]
    assert (en["bucket"] <= "3f").all()
    n_en_total = (docs["lang"] == "en").sum()
    assert 0 < len(en) < n_en_total
