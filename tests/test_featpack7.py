"""Semantic property tests for feature-eng pack #7: BM25 ranked
retrieval (brute parity), full outer join (both null patterns +
reconciliation totals), OOV rate (brute parity + bounds), mixture
rebalancing (proportions + determinism), winsorization (clamp bounds +
interior mass), per-source token entropy (bounds + brute parity), and
cross-corpus dedup (planted duplicate dropped, originals kept).
Cross-engine value parity is separately proven by the check_entry
sweeps; these pin the SEMANTICS."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    q_bm25_topk,
    q_dedup_crosscorpus,
    q_join_full,
    q_lang_balance_sample,
    q_oov_rate,
    q_token_entropy,
    q_winsorize,
)

SF = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_bm25_brute_parity(spark):
    out = q_bm25_topk(spark, SF).toPandas()
    docs = _docs()
    toks = {r.doc_id: r.text.strip().split() for r in docs.itertuples()}
    dl = {d: len(t) for d, t in toks.items()}
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    tf = Counter()
    for d, t in toks.items():
        for w in t:
            if w in _BM25_TERMS:
                tf[(d, w)] += 1
    df = Counter(w for (_, w) in tf)
    scored: dict[str, list] = {t: [] for t in _BM25_TERMS}
    for (d, w), n in tf.items():
        idf = math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
        s = idf * (n * (_BM25_K1 + 1.0)) / (
            n + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl[d] / avgdl)
        )
        scored[w].append((round(s, 4), d, n))
    for term, grp in out.groupby("term"):
        exp = sorted(scored[term], key=lambda x: (-x[0], x[1]))[:5]
        got = grp.sort_values("rn")
        assert len(got) == len(exp)
        for (es, ed, en), (_, g) in zip(exp, got.iterrows()):
            assert g["doc_id"] == ed and g["n"] == en
            assert abs(g["bm25"] - es) < 1e-9
    assert set(out["term"]) == set(_BM25_TERMS)


def test_join_full_both_null_patterns(spark):
    out = q_join_full(spark, SF).toPandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    orders = orders[orders["o_orderpriority"] == "1-URGENT"]
    even = cust[cust["c_custkey"] % 2 == 0]
    order_keys = set(orders["o_custkey"])
    # one row per surviving custkey, none lost
    assert out["custkey"].is_unique
    assert set(out["custkey"]) == set(even["c_custkey"]) | {
        k for k in order_keys if k % 2 == 1
    }
    # left-null side: odd-key order groups have no segment
    odd = out[out["custkey"] % 2 == 1]
    assert len(odd) > 0 and odd["segment"].isna().all()
    assert (odd["n_orders"] > 0).all()
    # right-null side: even customers without orders keep 0 / NaN
    no_orders = out[~out["custkey"].isin(order_keys)]
    assert len(no_orders) > 0
    assert (no_orders["n_orders"] == 0).all()
    assert no_orders["sum_price"].isna().all()
    # reconciliation: order counts sum to the full orders table
    assert out["n_orders"].sum() == len(orders)


def test_oov_rate_brute_parity_and_bounds(spark):
    out = q_oov_rate(spark, SF).toPandas()
    docs = _docs()
    assert len(out) == len(docs)
    assert out["oov_rate"].between(0.0, 1.0).all()
    uni = Counter()
    for t in docs["text"]:
        uni.update(t.strip().split())
    vocab = set(
        w for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
    )
    got = out.set_index("doc_id")
    for r in docs.sample(50, random_state=0).itertuples():
        toks = r.text.strip().split()
        n_oov = sum(1 for w in toks if w not in vocab)
        g = got.loc[r.doc_id]
        assert g["n_tokens"] == len(toks) and g["n_oov"] == n_oov
        assert abs(g["oov_rate"] - round(n_oov / len(toks), 4)) < 1e-9


def test_lang_balance_proportions_and_determinism(spark):
    out = q_lang_balance_sample(spark, SF).toPandas()
    docs = _docs()
    nl = docs.groupby("lang").size()
    n_min = nl.min()
    kept = out.groupby("lang").size()
    # rarest language passes through untouched
    rare = nl[nl == n_min].index
    for lang in rare:
        assert kept.get(lang, 0) == n_min
    # every language lands within binomial noise of the n_min target
    for lang, n in nl.items():
        k = kept.get(lang, 0)
        assert k <= n
        sd = math.sqrt(n_min)
        assert abs(k - n_min) <= 4 * sd + 1, (lang, k, n_min)
    # determinism: a second run returns the identical sample
    out2 = q_lang_balance_sample(spark, SF).toPandas()
    a = out.sort_values("doc_id", ignore_index=True)
    b = out2.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_winsorize_clamps_to_cutoffs(spark):
    out = q_winsorize(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert len(out) == len(ev)
    assert (out["winsorized"] >= out["lo"] - 1e-9).all()
    assert (out["winsorized"] <= out["hi"] + 1e-9).all()
    # interior values are untouched; tails actually clamp
    interior = out[(out["value"] > out["lo"]) & (out["value"] < out["hi"])]
    assert (interior["winsorized"] == interior["value"]).all()
    clamped = out[out["winsorized"] != out["value"]]
    assert len(clamped) > 0
    # ~10% of mass clamps (p05/p95 both sides), loose binomial band
    frac = len(clamped) / len(out)
    assert 0.04 <= frac <= 0.16, frac


def test_token_entropy_bounds_and_brute_parity(spark):
    out = q_token_entropy(spark, SF).toPandas()
    docs = _docs()
    assert set(out["source"]) == set(docs["source"])
    for r in out.itertuples():
        assert 0.0 <= r.entropy <= math.log(r.n_distinct) + 1e-6
    # brute parity on one source with the same fixed-point recipe
    src = out["source"].iloc[0]
    uni = Counter()
    for t in docs.loc[docs["source"] == src, "text"]:
        uni.update(t.strip().split())
    n = sum(uni.values())
    h_e4 = sum(
        int(np.round(-(c / n) * math.log(c / n) * 10000))
        for c in uni.values()
    )
    g = out.set_index("source").loc[src]
    assert g["n_tokens"] == n and g["n_distinct"] == len(uni)
    assert abs(g["entropy"] - round(h_e4 / 10000.0, 4)) < 1e-9


def test_dedup_crosscorpus_drops_planted_dups(spark):
    out = q_dedup_crosscorpus(spark, SF).toPandas()
    docs = _docs()
    src_num = docs["source"].str[3:].astype(int)
    fresh = docs[src_num < 10]
    ref = docs[src_num >= 10]
    boiler = lambda df: set(df.loc[df["doc_id"] % 5 == 0, "doc_id"] % 17)
    ref_families = boiler(ref)
    # fresh boilerplate whose family exists in ref must be dropped
    fresh_boiler = fresh[fresh["doc_id"] % 5 == 0]
    dropped = fresh_boiler[(fresh_boiler["doc_id"] % 17).isin(ref_families)]
    assert len(dropped) > 0
    assert not set(dropped["doc_id"]) & set(out["doc_id"])
    # every non-boilerplate fresh doc is unique content -> kept
    fresh_clean = fresh[fresh["doc_id"] % 5 != 0]
    assert set(fresh_clean["doc_id"]) <= set(out["doc_id"])
    # nothing from the reference corpus leaks into the output
    assert (out["doc_id"].isin(set(fresh["doc_id"]))).all()
