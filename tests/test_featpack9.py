"""Semantic + plan tests for feature-eng pack #9: weighted sampling
(rate proportionality + determinism), ordered string aggregation
(layout independence), regex entity extraction (brute parity), and
cadence gap detection (brute parity). Cross-engine parity is proven by
the check_entry sweeps; these pin the semantics and plan shapes."""

from __future__ import annotations

import re

import pandas as pd

from crawlfe.queries import (
    q_agg_string_ordered,
    q_extract_entities,
    q_gap_detection,
    q_weighted_sample,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_weighted_sample_rate_tracks_weight(spark):
    out = q_weighted_sample(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    mx = docs["n_chars"].max()
    # longest doc always kept; keep-rate grows with weight: the top
    # weight-quartile must keep a strictly higher fraction than the
    # bottom quartile (binomial noise cannot flip a 4x rate gap)
    kept = set(out["doc_id"])
    q1 = docs[docs["n_chars"] <= docs["n_chars"].quantile(0.25)]
    q4 = docs[docs["n_chars"] >= docs["n_chars"].quantile(0.75)]
    r1 = sum(1 for d in q1["doc_id"] if d in kept) / len(q1)
    r4 = sum(1 for d in q4["doc_id"] if d in kept) / len(q4)
    assert r4 > r1, (r1, r4)
    assert docs.loc[docs["n_chars"] == mx, "doc_id"].isin(kept).all()
    # deterministic: identical output on a second run
    out2 = q_weighted_sample(spark, SF).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id", ignore_index=True),
        out2.sort_values("doc_id", ignore_index=True),
    )


def test_agg_string_ordered_layout_independent(spark):
    out = q_agg_string_ordered(spark, SF).toPandas().set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for src, grp in docs.groupby("source"):
        langs = sorted(set(grp["lang"]))
        assert out.loc[src, "langs"] == "|".join(langs)
        assert out.loc[src, "n_langs"] == len(langs)
    # repartitioned input must give the identical joined strings
    d = spark.read.parquet(f"{SF}/documents.parquet").repartition(17)
    import crawlfe.queries as Q
    with Q._patched_tables(lambda s, sf, n: d):
        again = q_agg_string_ordered(spark, SF).toPandas().set_index("source")
    assert (
        out.sort_index()["langs"].tolist()
        == again.sort_index()["langs"].tolist()
    )


def test_extract_entities_brute_parity(spark):
    out = q_extract_entities(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    rx = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    n_inject = (docs["doc_id"] % 4 == 0).sum()
    assert len(out) == 2 * n_inject  # two emails per dirty doc, none else
    got = out.groupby("doc_id")
    for r in docs.itertuples():
        if r.doc_id % 4 == 0:
            t = (
                f"from u{r.doc_id}@a.example.org {r.text} "
                f"cc admin{r.doc_id % 7}@b.example.net"
            )
            exp = rx.findall(t)
            g = got.get_group(r.doc_id).sort_values("pos")
            assert list(g["email"]) == exp
            assert list(g["pos"]) == list(range(len(exp)))
        else:
            assert r.doc_id not in got.groups


def test_gap_detection_brute_parity(spark):
    out = q_gap_detection(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    pdf = pd.DataFrame(
        {"user_id": ev["user_id"], "event_id": ev["event_id"], "us": us}
    ).sort_values(["user_id", "us", "event_id"])
    pdf["gap_s"] = (pdf["us"] - pdf.groupby("user_id")["us"].shift()) // 10**6
    g = pdf.dropna()
    med = g.groupby("user_id")["gap_s"].median()
    exp = g[g["gap_s"] > 4 * g["user_id"].map(med)]
    assert len(out) == len(exp) > 0
    m = out.merge(exp, on=["user_id", "event_id"], suffixes=("", "_e"))
    assert len(m) == len(out)
    assert (m["gap_s"] == m["gap_s_e"]).all()


def test_pack9_plan_shapes(spark):
    # weighted sample: narrow filter + broadcast 1-row max, no SMJ
    p = plan_of(q_weighted_sample(spark, SF))
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p, p
    # extract entities: zero exchanges (pure projection + generate)
    p = plan_of(q_extract_entities(spark, SF))
    assert "Exchange" not in p, p
    # gap detection: window + agg share the user_id partitioning
    p = plan_of(q_gap_detection(spark, SF))
    assert p.count("Exchange hashpartitioning") <= 2, p


def test_dedup_windowed_brute_parity(spark):
    from crawlfe.queries import q_dedup_windowed

    out = q_dedup_windowed(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    pdf = pd.DataFrame(
        {
            "user_id": ev["user_id"],
            "event_id": ev["event_id"],
            "ts_us": us,
            "et": ev["event_type"],
        }
    ).sort_values(["user_id", "et", "ts_us"])
    keep = []
    for (_, _), grp in pdf.groupby(["user_id", "et"]):
        ts = grp["ts_us"].to_numpy()
        for r in grp.itertuples():
            prior = ts[(ts >= r.ts_us - 86_400_000_000) & (ts < r.ts_us)]
            if prior.size == 0:
                keep.append(r.event_id)
    assert set(out["event_id"]) == set(keep)
    assert 0 < len(out) < len(ev)  # drops some, keeps some


def test_approx_distinct_error_bound(spark):
    from crawlfe.queries import q_agg_approx_distinct

    out = q_agg_approx_distinct(spark, SF).toPandas()
    assert len(out) > 0
    # rsd=0.02 -> generous 5-sigma band; exact column is the oracle
    rel = (out["approx_users"] - out["exact_users"]).abs() / out["exact_users"]
    assert (rel <= 0.10).all(), out.to_string()
