"""Semantic tests for feature-eng pack #71: Mantel-Haenszel pooled
odds ratio, Cochran-Armitage trend chi², delete-one-group jackknife
ratio variance (brute python replicas; cross-engine parity is proven
by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_cochran_armitage,
    q_jackknife_ratio,
    q_mantel_haenszel,
)

SF = "/root/testdata/sf0.001"


def test_mantel_haenszel_brute(spark):
    out = q_mantel_haenszel(spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet")
    e = e[e.event_type.isin(["purchase", "click"])].assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        day=lambda x: x.ts.dt.day,
    )
    num = den = A = B = C = D = 0.0
    strata = 0
    for _, g in e.groupby("day"):
        exp = g.event_type == "purchase"
        hit = g.cents >= 5000
        a = int((exp & hit).sum())
        b = int((exp & ~hit).sum())
        c = int((~exp & hit).sum())
        d = int((~exp & ~hit).sum())
        n = a + b + c + d
        strata += 1
        num += a * d / n
        den += b * c / n
        A += a
        B += b
        C += c
        D += d
    assert out.n_strata == strata
    assert out.a_total == A and out.d_total == D
    assert abs(out.or_mh - round(num / den, 6)) < 1e-9
    assert abs(out.or_crude - round(A * D / (B * C), 6)) < 1e-9
    # on a fixture without engineered confounding the two agree loosely
    assert 0.2 < out.or_mh / out.or_crude < 5.0


def test_cochran_armitage_brute(spark):
    out = q_cochran_armitage(spark, SF).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet")
    s = np.minimum(3, d.n_chars // 500)
    hit = (d.lang == "en").astype(int)
    g = pd.DataFrame({"s": s, "hit": hit}).groupby("s").agg(
        n_i=("hit", "size"), r_i=("hit", "sum")
    )
    N, R = g.n_i.sum(), g.r_i.sum()
    p = R / N
    T = (g.index * g.r_i).sum()
    E = p * (g.index * g.n_i).sum()
    V = (
        p
        * (1 - p)
        * ((g.index**2 * g.n_i).sum() - (g.index * g.n_i).sum() ** 2 / N)
    )
    assert out.n_groups == len(g)
    assert out.n_total == N and out.n_event == R
    assert abs(out.chi2_ca - round((T - E) ** 2 / V, 6)) < 1e-6


def test_jackknife_ratio_brute(spark):
    out = q_jackknife_ratio(spark, SF).toPandas().set_index("source")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    per = d.groupby("source").agg(
        n=("doc_id", "size"), t=("n_chars", "sum")
    )
    N, T, G = per.n.sum(), per.t.sum(), len(per)
    thetas = {}
    for src, r in per.iterrows():
        th = (T - r.t) / (N - r.n)
        thetas[src] = th
        row = out.loc[src]
        assert row.n_docs == r.n and row.chars_total == r.t
        assert abs(row.theta_loo - round(th, 6)) < 1e-9
        assert pd.isna(row.jk_se)
    tv = np.array(list(thetas.values()))
    se = math.sqrt((G - 1) / G * ((tv - tv.mean()) ** 2).sum())
    tot = out.loc["__TOTAL__"]
    assert tot.n_docs == N and tot.chars_total == T
    assert abs(tot.theta_loo - round(T / N, 6)) < 1e-9
    assert abs(tot.jk_se - round(se, 6)) < 1e-6
