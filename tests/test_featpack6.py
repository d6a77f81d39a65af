"""Semantic property tests for feature-eng pack #6: retention cohorts
(brute-force parity), ordered session funnel (monotone step times +
planted out-of-order session), fixed-width histogram (mass + brute
parity), bigram PMI (brute parity), CDC upsert apply (last-op-wins,
delete drops the key), overlapping doc chunking (lossless text
reconstruction), and per-group quantile normalization (bounds +
monotonicity). Cross-engine value parity is separately proven by the
check_entry sweeps; these pin the SEMANTICS."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_cdc_upsert,
    q_doc_chunk,
    q_histogram,
    q_pmi_bigrams,
    q_quantile_norm,
    q_retention_cohorts,
    q_session_funnel,
)

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


def test_retention_cohorts_brute_parity(spark):
    out = q_retention_cohorts(spark, SF).toPandas()
    ev = _events()
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    day = us // 86_400_000_000
    df = pd.DataFrame({"user_id": ev["user_id"], "day": day})
    df["cohort_day"] = df.groupby("user_id")["day"].transform("min")
    df["offset_days"] = df["day"] - df["cohort_day"]
    exp = (
        df.groupby(["cohort_day", "offset_days"])["user_id"]
        .nunique()
        .reset_index(name="n_users")
    )
    m = out.merge(exp, on=["cohort_day", "offset_days"], suffixes=("", "_e"))
    assert len(m) == len(out) == len(exp)
    assert (m["n_users"] == m["n_users_e"]).all()
    # every user appears at offset 0 of their own cohort
    assert (out.loc[out["offset_days"] == 0, "n_users"].sum()
            == ev["user_id"].nunique())


def test_session_funnel_step_times_monotone(spark):
    out = q_session_funnel(spark, SF).toPandas()
    assert len(out) > 0
    v, c, p = out["first_view_us"], out["first_click_us"], out["first_purchase_us"]
    # funnel breaks propagate: no click time without a view time, etc.
    assert c[v.isna()].isna().all()
    assert p[c.isna()].isna().all()
    # ordered steps: each step at-or-after the previous step's first hit
    both_vc = v.notna() & c.notna()
    assert (c[both_vc] >= v[both_vc]).all()
    both_cp = c.notna() & p.notna()
    assert (p[both_cp] >= c[both_cp]).all()
    # n_events accounts for every event exactly once
    assert out["n_events"].sum() == len(_events())


def test_session_funnel_rejects_out_of_order_purchase(spark, tmp_path):
    """A purchase BEFORE the session's first view must not convert."""
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:05:00", "2024-01-01 00:10:00"]
    ).astype("datetime64[us]")  # Spark cannot read TIMESTAMP(NANOS) parquet
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": ts,
            "user_id": [7, 7, 7],
            "event_type": ["purchase", "view", "click"],
            "value": [1.0, 2.0, 3.0],
            "props": ["{}", "{}", "{}"],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    out = q_session_funnel(spark, str(d)).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert not math.isnan(row["first_view_us"])
    assert not math.isnan(row["first_click_us"])
    assert math.isnan(row["first_purchase_us"])  # purchase preceded view


def test_histogram_mass_and_brute_parity(spark):
    out = q_histogram(spark, SF).toPandas()
    ev = _events()
    assert out["n"].sum() == len(ev)
    assert out["bucket"].between(0, 19).all()
    exp = (
        pd.DataFrame(
            {
                "event_type": ev["event_type"],
                "bucket": np.minimum(np.floor(ev["value"] / 25.0), 19).astype(
                    "int64"
                ),
            }
        )
        .groupby(["event_type", "bucket"])
        .size()
        .reset_index(name="n_e")
    )
    m = out.merge(exp, on=["event_type", "bucket"])
    assert len(m) == len(out) == len(exp)
    assert (m["n"] == m["n_e"]).all()


def test_pmi_bigrams_brute_parity(spark):
    out = q_pmi_bigrams(spark, SF).toPandas()
    assert len(out) > 0
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in docs["text"]:
        toks = t.strip().split()
        uni.update(toks)
        bi.update(zip(toks[:-1], toks[1:]))
    n_tok = sum(uni.values())
    n_bi = sum(bi.values())
    for _, r in out.sample(min(len(out), 200), random_state=0).iterrows():
        n = bi[(r["w1"], r["w2"])]
        assert n == r["n"] and n >= 5
        pmi = math.log(
            (float(n) * n_tok * n_tok)
            / (float(n_bi) * uni[r["w1"]] * uni[r["w2"]])
        )
        assert abs(round(pmi, 4) - r["pmi"]) < 1e-9
    # completeness: every bigram with count >= 5 is present
    assert len(out) == sum(1 for v in bi.values() if v >= 5)


def test_cdc_upsert_last_op_wins(spark):
    out = q_cdc_upsert(spark, SF).toPandas().set_index("user_id")
    ev = _events()
    ch = ev[ev["event_type"].isin(["purchase", "error"])].sort_values(
        ["ts", "event_id"]
    )
    last = ch.groupby("user_id").tail(1)
    for _, r in last.iterrows():
        if r["event_type"] == "purchase":
            assert r["user_id"] in out.index
            got = out.loc[r["user_id"]]
            assert got["ts_us"] == r["ts"].value // 1_000
            assert abs(got["value"] - round(r["value"], 4)) < 1e-9
        else:  # delete: key must be absent from the applied snapshot
            assert r["user_id"] not in out.index
    assert len(out) == (last["event_type"] == "purchase").sum()


def test_doc_chunk_lossless_reconstruction(spark):
    out = q_doc_chunk(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet").set_index("doc_id")
    assert (out["chunk_len"] == out["chunk"].str.len()).all()
    assert (out["chunk_len"] <= 64).all()
    for doc_id, grp in out.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        assert list(grp["chunk_idx"]) == list(range(len(grp)))
        # stride-48 prefixes + final chunk reassemble the original text
        rebuilt = "".join(c[:48] for c in grp["chunk"].iloc[:-1])
        rebuilt += grp["chunk"].iloc[-1]
        assert rebuilt == docs.loc[doc_id, "text"]


def test_quantile_norm_bounds_and_monotone(spark):
    out = q_quantile_norm(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert len(out) == len(docs)
    for _, grp in out.groupby("source"):
        if len(grp) > 1:
            assert grp["qnorm"].min() == 0.0
            assert grp["qnorm"].max() == 1.0
            g = grp.sort_values(["n_chars", "doc_id"])
            assert g["qnorm"].is_monotonic_increasing
