"""Semantic tests for feature-eng pack #22: recursive-CTE BFS,
LATERAL top-k, JVM simhash near-dup pairs, exact-moment grouped OLS,
Gini concentration, and per-day average precision (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _BFS_DEPTH,
    _SIMHASH_BITS,
    _SIMHASH_HAM,
    q_gini_skew,
    q_grouped_ols,
    q_lateral_topk,
    q_pr_auc,
    q_simhash_pairs,
    q_sql_recursive,
)

SF = "/root/testdata/sf0.001"


def test_sql_recursive_brute(spark):
    out = q_sql_recursive(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(docs)
    edges = {}
    for d in docs.doc_id:
        edges[d] = [(d * 7 + 3) % n, (d * 13 + 5) % n]
    # BFS from the seeds, bounded depth
    dist = {d: 0 for d in docs.doc_id if d % 97 == 0}
    frontier = list(dist)
    for depth in range(1, _BFS_DEPTH + 1):
        nxt = []
        for u in frontier:
            for v in edges[u]:
                if v not in dist:
                    dist[v] = depth
                    nxt.append(v)
        frontier = nxt
    got = dict(zip(out.node, out.hops))
    assert got == dist


def test_lateral_topk_brute(spark):
    out = q_lateral_topk(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for src, g in docs.groupby("source"):
        want = g.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).head(3)
        got = out[out.source == src].sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        )
        assert list(got.doc_id) == list(want.doc_id)
        assert list(got.n_chars) == list(want.n_chars)
    assert set(out.source) == set(docs.source)


def _simhash64(text: str) -> int:
    """64-bit simhash mirroring q_simhash_pairs' two 32-bit halves:
    bits 0-31 vote with h_lo = md5 hex chars 9-16, bits 32-63 with
    h_hi = chars 1-8; full fp = fp_hi << 32 | fp_lo."""
    votes = [0] * _SIMHASH_BITS
    toks: dict[tuple[int, int], int] = {}
    for tok in text.strip().split():
        hx = hashlib.md5(tok.encode()).hexdigest()
        key = (int(hx[:8], 16), int(hx[8:16], 16))
        toks[key] = toks.get(key, 0) + 1
    for (h_hi, h_lo), w in toks.items():
        for b in range(_SIMHASH_BITS):
            bit = (h_lo >> b) & 1 if b < 32 else (h_hi >> (b - 32)) & 1
            votes[b] += w * (2 * bit - 1)
    return sum(1 << b for b in range(_SIMHASH_BITS) if votes[b] > 0)


def test_simhash_pairs_brute(spark):
    out = q_simhash_pairs(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    fp = {r.doc_id: _simhash64(r.text) for r in docs.itertuples()}
    want = set()
    ids = sorted(fp)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            # candidate iff some 16-bit band agrees
            if any(
                (fp[a] >> (16 * k)) & 65535 == (fp[b] >> (16 * k)) & 65535
                for k in range(4)
            ):
                ham = bin(fp[a] ^ fp[b]).count("1")
                if ham <= _SIMHASH_HAM:
                    want.add((a, b, ham))
    got = set(zip(out.doc_a, out.doc_b, out.hamming))
    assert got == want
    assert len(want) > 0  # non-vacuous: fixture has exact dups


def test_simhash_pairs_exact_dups_hamming_zero(spark):
    """Exact duplicate texts must surface as hamming-0 pairs."""
    out = q_simhash_pairs(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    by_text = docs.groupby("text").doc_id.apply(list)
    dup_pairs = {
        (min(a, b), max(a, b))
        for ids in by_text
        if len(ids) > 1
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    }
    zero = set(
        zip(out[out.hamming == 0].doc_a, out[out.hamming == 0].doc_b)
    )
    assert dup_pairs <= zero


def test_grouped_ols_brute(spark):
    out = q_grouped_ols(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.assign(
        x=ev.ts.dt.day.astype("int64"),
        y=(ev.value * 10000).round().astype("int64"),
    )
    for et, g in ev.groupby("event_type"):
        n = len(g)
        sx, sy = int(g.x.sum()), int(g.y.sum())
        sxx = int((g.x * g.x).sum())
        sxy = int((g.x * g.y).sum())
        syy = int((g.y * g.y).sum())
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = num / (den * 10000.0)
        intercept = (sy * den - num * sx) / (n * den * 10000.0)
        r2 = (num * num) / (den * (n * syy - sy * sy))
        row = out[out.event_type == et].iloc[0]
        assert int(row.n) == n
        assert abs(row.slope - round(slope, 6)) <= 1e-9
        assert abs(row.intercept - round(intercept, 6)) <= 1e-9
        assert abs(row.r2 - round(r2, 6)) <= 1e-9
        # sanity: a least-squares fit's R^2 lies in [0, 1]
        assert -1e-9 <= row.r2 <= 1 + 1e-9


def test_gini_skew_brute(spark):
    out = q_gini_skew(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    for et, g in ev.groupby("event_type"):
        c = (
            g.groupby("user_id")
            .size()
            .rename("c")
            .reset_index()
            .sort_values(["c", "user_id"])
            .reset_index(drop=True)
        )
        n, s = len(c), int(c.c.sum())
        t = int(((c.index.to_numpy() + 1) * c.c.to_numpy()).sum())
        gini = (2 * t - (n + 1) * s) / (n * s)
        row = out[out.event_type == et].iloc[0]
        assert int(row.n_users) == n
        assert int(row.total_events) == s
        assert abs(row.gini - round(gini, 6)) <= 1e-9
        assert 0 <= row.gini < 1


def test_pr_auc_brute(spark):
    out = q_pr_auc(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.event_type.isin(["purchase", "click"])]
    for day, g in ev.groupby(ev.ts.dt.day):
        hist = (
            g.assign(p=(g.event_type == "purchase").astype(int))
            .groupby("value")
            .agg(pos_at=("p", "sum"), n=("p", "size"))
            .sort_index(ascending=False)
        )
        cum_pos = hist.pos_at.cumsum()
        cum_n = hist.n.cumsum()
        terms = np.floor(
            (hist.pos_at * cum_pos).astype(float)
            * 1e9
            / cum_n.astype(float)
            + 0.5
        ).astype("int64")
        n_pos = int(hist.pos_at.sum())
        ap = terms.sum() / (1e9 * n_pos)
        row = out[out.day == day].iloc[0]
        assert int(row.n_pos) == n_pos
        assert abs(row.avg_precision - round(ap, 6)) <= 1e-9
        # AP is a mean of precisions: bounded by (0, 1]
        assert 0 < row.avg_precision <= 1


def test_pr_auc_perfect_and_random_bounds(spark):
    """Degenerate sanity: AP of a perfect ranker is 1; AP of a
    constant score equals the positive prevalence."""
    import pyspark.sql.functions as F

    rows = [(1, float(i >= 50), "purchase" if i >= 50 else "click") for i in range(100)]
    df = spark.createDataFrame(rows, "day int, v double, event_type string")
    # perfect: positives all score 1.0 > negatives 0.0
    hist = (
        df.groupBy("day", "v")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("pos_at"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("neg_at"),
        )
        .toPandas()
        .sort_values("v", ascending=False)
    )
    cum_pos = hist.pos_at.cumsum()
    cum_n = (hist.pos_at + hist.neg_at).cumsum()
    terms = np.floor(
        (hist.pos_at * cum_pos).astype(float) * 1e9 / cum_n.astype(float)
        + 0.5
    )
    ap = terms.sum() / (1e9 * hist.pos_at.sum())
    assert abs(ap - 1.0) < 1e-9


def test_gini_uniform_is_zero(spark):
    """A perfectly uniform count distribution has Gini exactly
    (rank-formula) 0 for any group size."""
    c = np.ones(7, dtype=np.int64)
    i = np.arange(1, 8)
    n, s, t = 7, int(c.sum()), int((i * c).sum())
    assert 2 * t - (n + 1) * s == 0
