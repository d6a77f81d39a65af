"""Semantic tests for feature-eng pack #36: BH-FDR step-up,
Rayleigh daily periodicity, Markov transition surprise, Flesch
readability proxies, hapax legomena profile, and Gini mean
difference (brute python replicas; cross-engine parity is proven by
the check_entry sweeps)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from crawlfe.queries import (
    _BH_LONG,
    q_bh_fdr,
    q_gini_mean_diff,
    q_hapax_ratio,
    q_markov_surprise,
    q_rayleigh_daily,
    q_readability,
)

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _rint(x: float) -> int:
    return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
        hour=lambda x: x.ts.dt.hour,
        cents=lambda x: round(x.value * 100).astype("int64"),
    )


def test_bh_fdr_brute(spark):
    out = q_bh_fdr(spark, SF).toPandas().set_index("source")
    d = _docs()
    per = d.assign(is_long=(d.n_chars >= _BH_LONG).astype(int)).groupby(
        "source"
    )
    n_docs = per.size()
    n_long = per.is_long.sum()
    n_all, long_all, m = int(n_docs.sum()), int(n_long.sum()), len(n_docs)
    p0 = (long_all + 1.0) / (n_all + 2)
    rows = []
    for src in n_docs.index:
        nd, nl = int(n_docs[src]), int(n_long[src])
        z = (nl / nd - p0) / math.sqrt(p0 * (1 - p0) / nd)
        p_ppb = _rint(1e9 * 2.0 / (1.0 + math.exp(1.702 * abs(z))))
        rows.append((src, nd, nl, z, p_ppb))
    rows.sort(key=lambda r: (r[4], r[0]))
    k_max = 0
    for i, r in enumerate(rows, 1):
        if r[4] * m <= 100_000_000 * i:
            k_max = i
    assert len(out) == m
    for i, (src, nd, nl, z, p_ppb) in enumerate(rows, 1):
        row = out.loc[src]
        assert row.n_docs == nd and row.n_long == nl
        assert abs(row.z - _r6(z)) < 1e-12
        assert row.p_ppb == p_ppb
        assert row.p_rank == i
        assert bool(row.reject) == (i <= k_max)
    # the rejection set is a prefix of the p-ordered list
    rej = out.sort_values("p_rank").reject.tolist()
    assert rej == sorted(rej, reverse=True)


def test_rayleigh_daily_brute(spark):
    out = q_rayleigh_daily(spark, SF).toPandas().set_index("user_id")
    e = _events()
    for uid, g in e.groupby("user_id"):
        sc = sum(math.cos(math.pi * h / 12.0) for h in g.hour)
        ss = sum(math.sin(math.pi * h / 12.0) for h in g.hour)
        n = len(g)
        row = out.loc[uid]
        assert row.n_events == n
        assert abs(row.resultant - _r6(math.hypot(sc, ss) / n)) < 2e-6
        assert abs(row.rayleigh_z - _r6((sc * sc + ss * ss) / n)) < 2e-6
        assert -1e-9 <= row.resultant <= 1.0 + 1e-9
    assert len(out) == e.user_id.nunique()


def test_markov_surprise_brute(spark):
    out = q_markov_surprise(spark, SF).toPandas().set_index("user_id")
    e = _events().sort_values(["user_id", "us", "event_id"])
    v = e.event_type.nunique()
    steps = defaultdict(list)
    pair = Counter()
    prevc = Counter()
    for uid, g in e.groupby("user_id"):
        t = g.event_type.tolist()
        for a, b in zip(t, t[1:]):
            steps[uid].append((a, b))
            pair[(a, b)] += 1
            prevc[a] += 1
    for uid, ss in steps.items():
        bits = [
            -math.log2((pair[s] + 1.0) / (prevc[s[0]] + v)) for s in ss
        ]
        row = out.loc[uid]
        assert row.n_steps == len(ss)
        assert abs(row.surprise_bits - _r6(sum(bits) / len(bits))) < 2e-6
        assert row.surprise_bits > 0
    assert len(out) == len(steps)


def _runs(pat: str, s: str) -> int:
    return len(re.findall(pat, s))


def test_readability_brute(spark):
    out = q_readability(spark, SF).toPandas().set_index("source")
    d = _docs()
    agg = defaultdict(lambda: [0, 0, 0, 0, 0.0])
    for src, txt in zip(d.source, d.text):
        if not txt.strip():
            continue
        words = len(txt.strip().split())
        sents = max(1, _runs(r"[.!?]+", txt))
        syll = max(_runs(r"[aeiouy]+", txt.lower()), words)
        fre = 206.835 - 1.015 * (words / sents) - 84.6 * (syll / words)
        a = agg[src]
        a[0] += 1
        a[1] += words
        a[2] += sents
        a[3] += syll
        a[4] += fre
    assert set(out.index) == set(agg)
    for src, (n, w, s, y, fsum) in agg.items():
        row = out.loc[src]
        assert row.n_docs == n
        assert row.sum_words == w
        assert row.sum_sents == s
        assert row.sum_syll == y
        assert abs(row.words_per_sent - _r6(w / s)) < 1e-12
        assert abs(row.syll_per_word - _r6(y / w)) < 1e-12
        assert abs(row.flesch - _r6(fsum / n)) < 2e-6
        # the >=1-syllable-per-word floor keeps spw >= 1
        assert row.syll_per_word >= 1.0


def test_hapax_ratio_brute(spark):
    out = q_hapax_ratio(spark, SF).toPandas().set_index("source")
    d = _docs()
    st = Counter()
    for src, txt in zip(d.source, d.text):
        for t in txt.strip().split():
            st[(src, t)] += 1
    per = defaultdict(lambda: [0, 0, 0, 0])
    for (src, _), c in st.items():
        a = per[src]
        a[0] += c
        a[1] += 1
        a[2] += c == 1
        a[3] += c == 2
    assert set(out.index) == set(per)
    for src, (n, v, h1, h2) in per.items():
        row = out.loc[src]
        assert row.n_tokens == n
        assert row.vocab == v
        assert row.hapax == h1
        assert row.dis_legomena == h2
        assert abs(row.hapax_ratio - _r6(h1 / v)) < 1e-12
        assert abs(row.hapax_token_share - _r6(h1 / n)) < 1e-12


def test_gini_mean_diff_brute(spark):
    out = q_gini_mean_diff(spark, SF).toPandas().set_index("event_type")
    e = _events()
    for et, g in e.groupby("event_type"):
        xs = sorted(zip(g.cents, g.event_id))
        n = len(xs)
        s = sum((2 * i - n - 1) * c for i, (c, _) in enumerate(xs, 1))
        row = out.loc[et]
        assert row.n_events == n
        assert row.s_weighted == s
        gmd = 2.0 * s / (n * (n - 1)) / 100.0
        gini = s / ((n - 1) * sum(c for c, _ in xs))
        assert abs(row.gmd - _r6(gmd)) < 1e-12
        assert abs(row.gini - _r6(gini)) < 1e-12
        # GMD is a dispersion: nonneg, and E|X-Y| <= 2*E|X - median|
        assert row.gmd >= 0
    assert len(out) == e.event_type.nunique()
