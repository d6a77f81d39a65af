"""Semantic tests for feature-eng pack #102: Burrows' delta,
Mahalanobis outliers, Grubbs' test (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _BD_TOPK,
    _GRUBBS_CRIT,
    _MAH_TOPK,
    q_burrows_delta,
    q_grubbs_test,
    q_mahalanobis_outliers,
)

SF = "/root/testdata/sf0.001"


def test_burrows_delta_brute(spark):
    out = q_burrows_delta(spark, SF).toPandas()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    toks = []
    for src, t in zip(d.source, d.text):
        for w in t.strip().split():
            toks.append((src, w))
    cnt = Counter(w for _, w in toks)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_BD_TOPK]
    panel = [w for w, _ in top]
    tot = Counter(s for s, _ in toks)
    st = Counter(toks)
    sources = sorted(tot)
    rates = {
        (s, w): st.get((s, w), 0) / tot[s] for s in sources for w in panel
    }
    z = {}
    for w in panel:
        vals = [rates[(s, w)] for s in sources]
        mu = np.mean(vals)
        sd = np.std(vals, ddof=1)
        for s in sources:
            z[(s, w)] = (rates[(s, w)] - mu) / sd
    deltas = {}
    for i, s1 in enumerate(sources):
        for s2 in sources[i + 1 :]:
            deltas[(s1, s2)] = np.mean(
                [abs(z[(s1, w)] - z[(s2, w)]) for w in panel]
            )
    expect = sorted(deltas.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(out) == 10
    for row, (pair, dv) in zip(out.itertuples(index=False), expect):
        assert (row.s1, row.s2) == pair
        assert abs(row.delta - round(dv, 6)) < 1e-6


def test_mahalanobis_outliers_brute(spark):
    out = q_mahalanobis_outliers(spark, SF).toPandas()
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["c"] = (e.value * 100).round().astype("int64")
    per = e.groupby("user_id").agg(x=("c", "sum"), y=("c", "size"))
    n = len(per)
    mx, my = per.x.mean(), per.y.mean()
    s11 = ((per.x - mx) ** 2).sum() / (n - 1)
    s22 = ((per.y - my) ** 2).sum() / (n - 1)
    s12 = ((per.x - mx) * (per.y - my)).sum() / (n - 1)
    det = s11 * s22 - s12 * s12
    d2 = (
        s22 * (per.x - mx) ** 2
        - 2 * s12 * (per.x - mx) * (per.y - my)
        + s11 * (per.y - my) ** 2
    ) / det
    expect = sorted(
        ((u, v) for u, v in d2.items()), key=lambda t: (-t[1], t[0])
    )[:_MAH_TOPK]
    assert len(out) == min(_MAH_TOPK, n)
    for row, (u, v) in zip(out.itertuples(index=False), expect):
        assert row.user_id == u
        assert abs(row.d2 - round(v, 6)) < 1e-4
    # 2-D Mahalanobis d^2 averages to ~2 across the population
    assert (d2.mean() - 2) < 1.0


def test_grubbs_test_brute(spark):
    out = q_grubbs_test(spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet")
    c = (e.value * 100).round().astype("int64")
    daily = (
        pd.DataFrame({"day": e.ts.dt.day, "c": c})
        .groupby("day")["c"]
        .agg(["sum", "count"])
    )
    x = np.array(
        [
            math.floor(1e4 * s / k + 0.5)
            for s, k in zip(daily["sum"], daily["count"])
        ],
        dtype=np.int64,
    )
    n = len(x)
    mean = x.sum() / n
    sd = math.sqrt(((x.astype(np.float64) - mean) ** 2).sum() / (n - 1))
    g = np.abs(x - mean) / sd
    i = int(np.lexsort((daily.index.to_numpy(), -g))[0])
    assert out.suspect_day == daily.index[i]
    assert out.n == n
    assert abs(out.grubbs_g - round(g[i], 6)) < 1e-6
    assert out.outlier == int(g[i] > _GRUBBS_CRIT)
