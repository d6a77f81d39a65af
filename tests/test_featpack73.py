"""Semantic tests for feature-eng pack #73: RAKE keyword scoring,
mSPRT always-valid e-values, Holm step-down adjustment (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _MSPRT_TAU2,
    _RAKE_STOPWORDS,
    q_holm_bonferroni,
    q_msprt_evalue,
    q_rake_keywords,
)

SF = "/root/testdata/sf0.001"


def _phi(x):
    return 0.5 * (1 + math.erf(x / math.sqrt(2)))


def test_rake_keywords_brute(spark):
    out = q_rake_keywords(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    freq, deg = {}, {}
    for t in docs.text:
        phrase = []
        for w in t.split() + [_RAKE_STOPWORDS[0]]:
            if w in _RAKE_STOPWORDS:
                for u in phrase:
                    freq[u] = freq.get(u, 0) + 1
                    deg[u] = deg.get(u, 0) + len(phrase)
                phrase = []
            else:
                phrase.append(w)
    scored = sorted(
        ((deg[w] / freq[w], w) for w in freq),
        key=lambda p: (-p[0], p[1]),
    )[:20]
    assert len(out) == 20
    for i, (s, w) in enumerate(scored):
        r = out.iloc[i]
        assert r.token == w, (i, r.token, w)
        assert r.freq == freq[w] and r.deg == deg[w]
        assert abs(r.rake - round(s, 6)) < 1e-9
    # degree >= freq always (each occurrence contributes phrase_len>=1)
    assert (out.deg >= out.freq).all()


def test_msprt_evalue_brute(spark):
    out = q_msprt_evalue(spark, SF).toPandas().set_index("day")
    e = pd.read_parquet(f"{SF}/events.parquet").assign(
        day=lambda x: x.ts.dt.day,
        arm_a=lambda x: x.user_id % 2 == 0,
        hit=lambda x: (x.event_type == "purchase").astype(int),
    )
    days = sorted(e.day.unique())
    na = xa = nb = xb = 0
    for d in days:
        g = e[e.day == d]
        na += int(g.arm_a.sum())
        xa += int(g.loc[g.arm_a, "hit"].sum())
        nb += int((~g.arm_a).sum())
        xb += int(g.loc[~g.arm_a, "hit"].sum())
        p = (xa + xb) / (na + nb)
        v = p * (1 - p) * (1 / na + 1 / nb)
        y = xa / na - xb / nb
        if v > 0:
            lam = math.sqrt(v / (v + _MSPRT_TAU2)) * math.exp(
                y * y * _MSPRT_TAU2 / (2 * v * (v + _MSPRT_TAU2))
            )
        else:
            lam = 1.0
        r = out.loc[d]
        assert (r.na, r.xa, r.nb, r.xb) == (na, xa, nb, xb)
        assert abs(r.e_value - round(lam, 6)) < 1e-6
        assert bool(r.reject_anytime) == (lam > 20.0)
    # e-values stay bounded on a null fixture (no real arm effect)
    assert out.e_value.max() < 20.0


def test_holm_bonferroni_brute(spark):
    out = q_holm_bonferroni(spark, SF).toPandas().set_index("event_type")
    e = pd.read_parquet(f"{SF}/events.parquet").assign(
        weekend=lambda x: x.ts.dt.dayofweek.isin([5, 6]),
        hit=lambda x: round(x.value * 100).astype("int64") >= 5000,
    )
    raws = {}
    for et, g in e.groupby("event_type"):
        n1 = int(g.weekend.sum())
        x1 = int(g.loc[g.weekend, "hit"].sum())
        n2 = int((~g.weekend).sum())
        x2 = int(g.loc[~g.weekend, "hit"].sum())
        p = (x1 + x2) / (n1 + n2)
        z = (x1 / n1 - x2 / n2) / math.sqrt(
            p * (1 - p) * (1 / n1 + 1 / n2)
        )
        p_raw = 2 * (1 - _phi(abs(z)))
        raws[et] = (z, p_raw)
        r = out.loc[et]
        assert (r.n1, r.x1, r.n2, r.x2) == (n1, x1, n2, x2)
        assert abs(r.z - round(z, 6)) < 1e-6
        # A&S 26.2.17 carries |err| < 7.5e-8 vs exact erf
        assert abs(r.p_raw - p_raw) < 1e-6
    m = len(raws)
    ordered = sorted(raws.items(), key=lambda kv: (kv[1][1], kv[0]))
    run = 0.0
    for i, (et, (z, p_raw)) in enumerate(ordered, start=1):
        run = max(run, (m - i + 1) * p_raw)
        adj = min(1.0, run)
        r = out.loc[et]
        assert abs(r.p_holm - adj) < 1e-5
        assert bool(r.reject) == (r.p_holm < 0.05)
    # step-down monotonicity: p_holm is non-decreasing in p_raw order
    hp = [out.loc[et].p_holm for et, _ in ordered]
    assert all(a <= b + 1e-12 for a, b in zip(hp, hp[1:]))
