"""Semantic tests for feature-eng pack #89: Kendall's W with ties,
Yuen's trimmed t, beta-binomial MOM (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _KW_NOISE,
    _KW_RATERS,
    _YUEN_TRIM_PCT,
    q_beta_binomial_mom,
    q_kendall_w,
    q_yuen_test,
)

SF = "/root/testdata/sf0.001"


def test_kendall_w_brute(spark):
    out = q_kendall_w(spark, SF).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "n_chars"]]
    n = len(d)
    r2 = {i: 0 for i in d.doc_id}
    t_sum = 0
    for r in range(1, _KW_RATERS + 1):
        score = {
            i: c
            + int(
                hashlib.md5(f"kw{r}:{i}".encode()).hexdigest()[:4], 16
            )
            % _KW_NOISE
            - (_KW_NOISE - 1) // 2
            for i, c in zip(d.doc_id, d.n_chars)
        }
        sc = pd.Series(score)
        rank_min = sc.rank(method="min").astype(int)
        tie_n = sc.map(sc.value_counts())
        ar2 = 2 * rank_min + tie_n - 1
        for i in d.doc_id:
            r2[i] += int(ar2[i])
        t_sum += int((tie_n * tie_n - 1).sum())
    devs = np.array(
        [v - _KW_RATERS * (n + 1) for v in r2.values()], dtype=np.int64
    )
    s4 = int((devs**2).sum())
    den = _KW_RATERS**2 * (n**3 - n) - _KW_RATERS * t_sum
    w = 3 * s4 / den
    assert (out.n, out.m, out.s4, out.t_sum) == (n, _KW_RATERS, s4, t_sum)
    assert abs(out.kendall_w - round(w, 6)) < 1e-9
    assert 0 <= out.kendall_w <= 1
    # noise is small relative to n_chars spread: raters mostly agree
    assert out.kendall_w > 0.9


def test_yuen_test_brute(spark):
    out = q_yuen_test(spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet")
    e = e[e.event_type.isin(["purchase", "click"])]
    e["c"] = (e.value * 100).round().astype("int64")

    def stats(g):
        g = g.sort_values(["c", "event_id"]).reset_index(drop=True)
        n = len(g)
        k = n // _YUEN_TRIM_PCT
        c = g.c.to_numpy()
        lo, hi = c[k], c[n - k - 1]
        ts = int(c[k : n - k].sum())
        wvals = np.clip(c, lo, hi)
        ws, ws2 = int(wvals.sum()), int((wvals.astype(object) ** 2).sum())
        h = n - 2 * k
        tmean = ts / h
        s2w = (ws2 - ws * ws / n) / (n - 1)
        d = s2w * (n - 1) / (h * (h - 1))
        return n, round(tmean, 6), d, h

    n1, tm1, d1, h1 = stats(e[e.event_type == "purchase"])
    n2, tm2, d2, h2 = stats(e[e.event_type == "click"])
    t = (tm1 - tm2) / math.sqrt(d1 + d2)
    df = (d1 + d2) ** 2 / (d1 * d1 / (h1 - 1) + d2 * d2 / (h2 - 1))
    assert (out.n1, out.n2) == (n1, n2)
    assert abs(out.tm1 - tm1) < 1e-9 and abs(out.tm2 - tm2) < 1e-9
    assert abs(out.yuen_t - round(t, 6)) < 1e-6
    assert abs(out.df - round(df, 4)) < 1e-3


def test_beta_binomial_mom_brute(spark):
    out = q_beta_binomial_mom(spark, SF).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet")
    per = (
        d.assign(is_long=(d.n_chars >= 300).astype(int))
        .groupby("source")["is_long"]
        .agg(["sum", "count"])
    )
    p_e6 = np.array(
        [
            math.floor(1e6 * s / c + 0.5)
            for s, c in zip(per["sum"], per["count"])
        ],
        dtype=np.int64,
    )
    k = len(p_e6)
    sp, sp2 = int(p_e6.sum()), int((p_e6**2).sum())
    m1 = sp / (k * 1e6)
    v = (k * sp2 - sp * sp) / (k * k) / (k - 1) / 1e12
    core = m1 * (1 - m1) / v - 1
    assert (out.k, out.sp, out.sp2) == (k, sp, sp2)
    assert abs(out.mean_rate - round(m1, 6)) < 1e-9
    assert abs(out.alpha - round(m1 * core, 4)) < 1e-6
    assert abs(out.beta - round((1 - m1) * core, 4)) < 1e-6
    assert abs(
        out.rho_icc - round(1 / (m1 * core + (1 - m1) * core + 1), 6)
    ) < 1e-9
    # a valid beta fit for an overdispersed-but-moderate family
    assert out.alpha > 0 and out.beta > 0
    assert 0 < out.rho_icc < 1
