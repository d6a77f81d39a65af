"""Semantic tests for feature-eng pack #12: calendar features,
dormant-customer coverage audit, deterministic negative sampling, and
grouped median imputation (brute pandas replicas; cross-engine parity
is proven by the check_entry sweeps)."""

from __future__ import annotations

import pandas as pd

from crawlfe.queries import (
    q_calendar_features,
    q_dormant_audit,
    q_impute_median,
    q_negative_sample,
)

SF = "/root/testdata/sf0.001"


def test_calendar_features_brute(spark):
    out = (
        q_calendar_features(spark, SF)
        .toPandas()
        .sort_values("event_id", ignore_index=True)
    )
    ev = (
        pd.read_parquet(f"{SF}/events.parquet")
        .sort_values("event_id", ignore_index=True)
    )
    ts = ev["ts"]
    assert (out["iso_dow"] == ts.dt.dayofweek + 1).all()
    assert (out["hh"] == ts.dt.hour).all()
    assert (out["mm"] == ts.dt.month).all()
    assert (out["is_weekend"] == (ts.dt.dayofweek >= 5).astype(int)).all()
    assert (
        out["epoch_day"]
        == (ts.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    ).all()


def test_dormant_audit_brute(spark):
    out = q_dormant_audit(spark, SF).toPandas().set_index("c_nationkey")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    actors = set(ev["user_id"])
    c = c.assign(dormant=~c["c_custkey"].isin(actors))
    g = c.groupby("c_nationkey")
    for nk, grp in g:
        nd = int(grp["dormant"].sum())
        if nd == 0:
            assert nk not in out.index
            continue
        assert out.loc[nk, "n_dormant"] == nd
        assert out.loc[nk, "n_customers"] == len(grp)
        assert out.loc[nk, "dormant_rate"] == round(nd / len(grp), 6)
    # the audit is non-vacuous on this corpus
    assert out["n_dormant"].sum() > 0


def test_negative_sample_formula_and_determinism(spark):
    out = q_negative_sample(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(docs)
    # formula, self-exclusion, fan-out <= 4 per anchor
    assert ((31 * out["doc_id"] + 17 * out["i"] + 7) % n == out["neg_id"]).all()
    assert (out["neg_id"] != out["doc_id"]).all()
    assert out.groupby("doc_id").size().max() <= 4
    out2 = q_negative_sample(spark, SF).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["doc_id", "i"], ignore_index=True),
        out2.sort_values(["doc_id", "i"], ignore_index=True),
    )


def test_impute_median_brute(spark):
    out = (
        q_impute_median(spark, SF)
        .toPandas()
        .sort_values("event_id", ignore_index=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["v"] = ev["value"].where(ev["event_id"] % 10 != 0)
    med = ev.groupby("user_id")["v"].median()
    ev = ev.sort_values("event_id", ignore_index=True)
    want = ev["v"].fillna(ev["user_id"].map(med)).round(4)
    assert (out["was_missing"] == ev["v"].isna().astype(int)).all()
    assert (out["imputed"] == want).all()
    assert out["was_missing"].sum() > 0
