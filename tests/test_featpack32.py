"""Semantic tests for feature-eng pack #32: Jensen-Shannon drift,
Gumbel block maxima, weighted log-odds terms, Pareto front, SAX
words, and transition entropy (brute python replicas; cross-engine
parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from crawlfe.queries import (
    _LOGODDS_ALPHA,
    _LOGODDS_TOPK,
    _SAX_BP,
    _SAX_DAYS,
    q_block_maxima,
    q_jsd_drift,
    q_log_odds_terms,
    q_pareto_front,
    q_sax_words,
    q_transition_entropy,
)

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _token_tables():
    docs = _docs()
    st = Counter()
    tot = Counter()
    for src, txt in zip(docs.source, docs.text):
        for t in txt.strip().split():
            st[(src, t)] += 1
            tot[t] += 1
    n_s = Counter()
    for (src, _), c in st.items():
        n_s[src] += c
    return st, tot, n_s, sum(tot.values())


def test_jsd_drift_brute(spark):
    out = q_jsd_drift(spark, SF).toPandas().set_index("source")
    st, tot, n_s, n_all = _token_tables()
    for src in n_s:
        ns, nr = n_s[src], n_all - n_s[src]
        sum_ppb, cr_seen = 0, 0
        for (s2, t), cs in st.items():
            if s2 != src:
                continue
            cr = tot[t] - cs
            cr_seen += cr
            p = cs / ns
            q = cr / nr
            m = (p + q) / 2
            term = p * math.log(p / m)
            if cr > 0:
                term += q * math.log(q / m)
            sum_ppb += int(round(1e9 * term))
        jsd = (
            sum_ppb / 1e9 + math.log(2) * (nr - cr_seen) / nr
        ) / 2.0
        row = out.loc[src]
        assert row.n_s == ns
        assert abs(row.jsd - _r6(jsd)) < 1e-12
        assert -1e-9 <= row.jsd <= math.log(2) + 1e-9
    assert len(out) == len(n_s)


def test_block_maxima_brute(spark):
    out = q_block_maxima(spark, SF).toPandas().set_index("event_type")
    e = _events().assign(
        d=lambda x: (
            x.ts.dt.normalize()
            .astype("datetime64[us]")
            .astype("int64")
            // DAY_US
        ),
    )
    for et, g in e.groupby("event_type"):
        per = g.groupby("d").size()
        blocks = Counter()
        for d, c in per.items():
            blocks[d // 30] = max(blocks.get(d // 30, 0), int(c))
        ms = list(blocks.values())
        n = len(ms)
        s, s2 = sum(ms), sum(m * m for m in ms)
        varn = n * s2 - s * s
        if n < 3 or varn <= 0:
            assert et not in out.index
            continue
        var = varn / (n * (n - 1))
        scale = math.sqrt(6.0 * var) / math.pi
        loc = s / n - 0.5772156649015329 * scale
        row = out.loc[et]
        assert (row.n_blocks, row.max_daily) == (n, max(ms))
        assert abs(row.gumbel_loc - _r6(loc)) < 1e-12
        assert abs(row.gumbel_scale - _r6(scale)) < 1e-12


def test_log_odds_terms_brute(spark):
    out = q_log_odds_terms(spark, SF).toPandas()
    st, tot, n_s, n_all = _token_tables()
    v = len(tot)
    a = _LOGODDS_ALPHA
    for src in n_s:
        zs = []
        for (s2, t), ys in st.items():
            if s2 != src:
                continue
            yr = tot[t] - ys
            ds = n_s[src] + v * a - (ys + a)
            dr = (n_all - n_s[src]) + v * a - (yr + a)
            delta = math.log((ys + a) / ds) - math.log((yr + a) / dr)
            z = delta / math.sqrt(1.0 / (ys + a) + 1.0 / (yr + a))
            zs.append((t, ys, z))
        zs.sort(key=lambda r: (-r[2], r[0]))
        want = zs[:_LOGODDS_TOPK]
        got = out[out.source == src].sort_values("rk")
        assert len(got) == len(want)
        for (t, ys, z), r in zip(want, got.itertuples()):
            assert r.token == t
            assert r.y_s == ys
            assert abs(r.z_logodds - _r6(z)) < 1e-12
    assert set(out.rk) == set(range(1, _LOGODDS_TOPK + 1))


def test_pareto_front_brute(spark):
    out = q_pareto_front(spark, SF).toPandas()
    docs = _docs().assign(
        vocab=lambda t: t.text.map(lambda s: len(set(s.strip().split())))
    )
    for src, g in docs.groupby("source"):
        pts = list(zip(g.doc_id, g.n_chars.astype(int), g.vocab))
        sky = set()
        for did, nc, vo in pts:
            best_longer = max(
                (v2 for _, n2, v2 in pts if n2 > nc), default=None
            )
            if best_longer is None or vo > best_longer:
                sky.add(did)
        got = set(out[out.source == src].doc_id)
        assert got == sky
        # every surviving doc is weakly undominated
        for did, nc, vo in pts:
            if did in sky:
                assert not any(
                    n2 > nc and v2 > vo for _, n2, v2 in pts
                )
    assert len(out) == out.doc_id.nunique()


def test_sax_words_brute(spark):
    out = q_sax_words(spark, SF).toPandas().set_index("user_id")
    e = _events().assign(d=lambda x: x.ts.dt.normalize())
    seen = 0
    for uid, g in e.groupby("user_id"):
        per = g.groupby("d").size().sort_index()
        cs = per.tolist()[:_SAX_DAYS]
        n = len(cs)
        s, s2 = sum(cs), sum(c * c for c in cs)
        varn = n * s2 - s * s
        if n < 4 or varn <= 0:
            assert uid not in out.index
            continue
        seen += 1
        mu = s / n
        sd = math.sqrt(varn / (n * (n - 1)))
        word = ""
        for c in cs:
            z = (c - mu) / sd
            word += (
                "a"
                if z < -_SAX_BP
                else ("b" if z < 0.0 else ("c" if z < _SAX_BP else "d"))
            )
        row = out.loc[uid]
        assert row.n_days == n
        assert row.sax_word == word
    assert len(out) == seen


def test_transition_entropy_brute(spark):
    out = (
        q_transition_entropy(spark, SF).toPandas().set_index("user_id")
    )
    e = _events().sort_values(["ts", "event_id"])
    seen = 0
    for uid, g in e.groupby("user_id"):
        types = g.event_type.tolist()
        if len(types) < 2:
            assert uid not in out.index
            continue
        seen += 1
        bg = Counter(zip(types, types[1:]))
        np_ = Counter()
        for (p, _), c in bg.items():
            np_[p] += c
        t_total = sum(bg.values())
        sum_ppm = sum(
            int(round(1e6 * c * math.log(np_[p] / c)))
            for (p, _), c in bg.items()
        )
        h = sum_ppm / (1e6 * t_total)
        row = out.loc[uid]
        assert row.n_trans == t_total
        assert abs(row.h_cond - _r6(h)) < 1e-12
        assert row.h_cond >= -1e-9
    assert len(out) == seen
