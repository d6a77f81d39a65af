"""Semantic tests for feature-eng pack #74: DSIR hashed importance
weights, pass@k estimator, Expected Reciprocal Rank (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _DSIR_BUCKETS,
    _PASSK_K,
    q_dsir_weights,
    q_err_ranking,
    q_pass_at_k,
)

SF = "/root/testdata/sf0.001"


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % _DSIR_BUCKETS


def test_dsir_weights_brute(spark):
    out = q_dsir_weights(spark, SF).toPandas().set_index("doc_id")
    d = pd.read_parquet(f"{SF}/documents.parquet")
    raw, tgt = {}, {}
    doc_toks = {}
    for _, row in d.iterrows():
        toks = [t for t in row.text.split() if t]
        doc_toks[row.doc_id] = toks
        for t in toks:
            b = _bucket(t)
            raw[b] = raw.get(b, 0) + 1
            if row.lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    tr, tt = sum(raw.values()), sum(tgt.values())
    lr_e4 = {
        b: round(
            math.log(
                ((tgt.get(b, 0) + 1) / (tt + _DSIR_BUCKETS))
                / ((raw[b] + 1) / (tr + _DSIR_BUCKETS))
            )
            * 10000
        )
        for b in raw
    }
    for doc_id, toks in doc_toks.items():
        s = sum(lr_e4[_bucket(t)] for t in toks)
        r = out.loc[doc_id]
        assert r.n_tokens == len(toks)
        assert abs(r.logw - round(s / 10000.0, 4)) < 1e-9
        assert bool(r.keep) == (s > 0)
    # en docs skew positive, non-en negative (the selection signal)
    en_ids = set(d.loc[d.lang == "en", "doc_id"])
    en_mean = out.loc[out.index.isin(en_ids), "logw"].mean()
    rest_mean = out.loc[~out.index.isin(en_ids), "logw"].mean()
    assert en_mean > rest_mean


def test_pass_at_k_brute(spark):
    out = q_pass_at_k(spark, SF).toPandas().set_index("user_id")
    e = pd.read_parquet(f"{SF}/events.parquet")
    g = e.groupby("user_id").agg(
        n=("event_id", "size"),
        c=("event_type", lambda s: int((s == "purchase").sum())),
    )
    g = g[g.n >= _PASSK_K]
    assert len(out) == len(g)
    for uid, row in g.iterrows():
        n, c = int(row.n), int(row.c)
        f = n - c
        num = max(f, 0) * max(f - 1, 0) * max(f - 2, 0)
        den = n * (n - 1) * (n - 2)
        expect = round(1.0 - num / den, 6)
        r = out.loc[uid]
        assert (r.n, r.c) == (n, c)
        assert abs(r.pass_at_k - expect) < 1e-9
    # estimator bounds
    assert ((out.pass_at_k >= 0) & (out.pass_at_k <= 1)).all()
    # c == 0 tasks score strictly below 1; c >= n-2 tasks score exactly 1
    zero = g[g.c == 0].index
    if len(zero):
        assert (out.loc[zero, "pass_at_k"] < 1).all()
    full = g[g.c >= g.n - 2].index
    if len(full):
        assert (out.loc[full, "pass_at_k"] == 1.0).all()


def test_err_ranking_brute(spark):
    out = q_err_ranking(spark, SF).toPandas().set_index("day")
    e = pd.read_parquet(f"{SF}/events.parquet").assign(
        day=lambda x: x.ts.dt.day,
        cents=lambda x: round(x.value * 100).astype("int64"),
    )
    for day, g in e.groupby("day"):
        top = g.sort_values(
            ["cents", "event_id"], ascending=[False, True]
        ).head(10)
        err, carry = 0.0, 1.0
        for r, (_, row) in enumerate(top.iterrows(), start=1):
            grade = min(4, row.cents // 2500)
            rel = (2.0**grade - 1) / 16.0
            err += rel / r * carry
            carry *= 1 - rel
        res = out.loc[day]
        assert res.n_ranked == len(top)
        assert abs(res.err - round(err, 6)) < 1e-6
    assert ((out.err >= 0) & (out.err < 1)).all()
