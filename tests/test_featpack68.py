"""Semantic tests for feature-eng pack #68: Spark 4 SQL surface
(listagg, collations, try_*) + shingle containment."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_agg_listagg,
    q_collated_dedup,
    q_shingle_containment,
    q_try_arithmetic,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_agg_listagg_brute(spark):
    out = q_agg_listagg(spark, SF).toPandas().set_index("lang")
    d = _docs()
    for lang, g in d.groupby("lang"):
        expect = ",".join(sorted(g["source"].unique()))
        assert out.loc[lang, "sources"] == expect
        assert out.loc[lang, "n_docs"] == len(g)


def test_collated_dedup_brute(spark):
    out = q_collated_dedup(spark, SF).toPandas().set_index("lang")
    d = _docs()
    import hashlib

    par = d["doc_id"].map(
        lambda x: int(hashlib.md5(str(x).encode()).hexdigest()[:4], 16) % 2
    )
    d["k"] = np.where(par == 0, d["source"].str.upper(), d["source"])
    for lang, g in d.groupby("lang"):
        cs = g["k"].nunique()
        ci = g["k"].str.lower().nunique()
        row = out.loc[lang]
        assert row["n_keys_cs"] == cs
        assert row["n_keys_ci"] == ci
        assert row["n_collisions"] == cs - ci
    # the crafted mixed-case corpus actually produces collisions
    assert out["n_collisions"].sum() > 0


def test_try_arithmetic_brute(spark):
    out = q_try_arithmetic(spark, SF).toPandas().set_index("bucket")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    per = (
        ev.assign(
            p=(ev.event_type == "purchase").astype(int),
            c=(ev.event_type == "click").astype(int),
        )
        .groupby("user_id")[["p", "c"]]
        .sum()
        .reset_index()
    )
    per["bucket"] = per["user_id"] % 10
    per["rate"] = np.where(per["c"] == 0, np.nan, per["p"] / per["c"])
    per["overflow"] = (per["user_id"] % 2 == 0).astype(int)
    for b, g in per.groupby("bucket"):
        row = out.loc[b]
        assert row["n_users"] == len(g)
        assert row["n_no_clicks"] == g["rate"].isna().sum()
        assert row["n_overflow"] == g["overflow"].sum()
        if g["rate"].notna().any():
            assert abs(row["avg_rate"] - round(g["rate"].mean(), 4)) < 1e-6


def test_shingle_containment_brute(spark):
    out = q_shingle_containment(spark, SF).toPandas()
    d = _docs().sort_values("doc_id")

    def shingles(text):
        t = text.strip().split()
        upper = max(len(t) - 3, 0)
        return {" ".join(t[i : i + 3]) for i in range(upper + 1)}

    sh = {r.doc_id: shingles(r.text) for r in d.itertuples()}
    got = out.set_index(["doc_a", "doc_b"])
    for a in sorted(sh):
        b = a + 1
        if b not in sh:
            continue
        inter = len(sh[a] & sh[b])
        row = got.loc[(a, b)]
        assert abs(row["c_ab"] - round(inter / len(sh[a]), 6)) < 1e-9
        assert abs(row["c_ba"] - round(inter / len(sh[b]), 6)) < 1e-9
        assert row["c_max"] == max(row["c_ab"], row["c_ba"])
    # containment dominates Jaccard: c_max >= J for every pair
    jac = got.apply(
        lambda r: min(r["c_ab"], r["c_ba"]), axis=1
    )  # min containment >= jaccard too, but max certainly
    assert (got["c_max"] >= jac - 1e-12).all()
