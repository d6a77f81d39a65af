"""Semantic tests for feature-eng pack #39: Wilson LCB ranking,
2x2 odds ratio with Woolf CI, exact value mode, Bowley/Moors robust
shape, term position profile, and longest same-type run (brute
python replicas; cross-engine parity is proven by the check_entry
sweeps)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _BH_LONG,
    _TPP_K,
    q_bowley_moors,
    q_longest_event_run,
    q_odds_ratio,
    q_term_position_profile,
    q_value_mode,
    q_wilson_lcb,
)

SF = "/root/testdata/sf0.001"
Z = 1.96


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64"),
        cents=lambda x: round(x.value * 100).astype("int64"),
    )


def _long_table():
    d = _docs()
    per = d.assign(is_long=(d.n_chars >= _BH_LONG).astype(int)).groupby(
        "source"
    )
    return per.size(), per.is_long.sum()


def test_wilson_lcb_brute(spark):
    out = q_wilson_lcb(spark, SF).toPandas().set_index("source")
    n_docs, n_long = _long_table()
    rows = []
    for src in n_docs.index:
        n, k = int(n_docs[src]), int(n_long[src])
        p = k / n
        lcb = (
            p
            + Z * Z / (2 * n)
            - Z * math.sqrt(p * (1 - p) / n + Z * Z / (4 * n * n))
        ) / (1 + Z * Z / n)
        rows.append((src, n, k, p, lcb))
        r = out.loc[src]
        assert r.n_docs == n and r.n_long == k
        assert abs(r.p_hat - _r6(p)) < 1e-12
        assert abs(r.wilson_lcb - _r6(lcb)) < 2e-6
        # the LCB is a LOWER bound on the rate
        assert r.wilson_lcb <= r.p_hat + 1e-9
    rows.sort(key=lambda t: (-t[4], t[0]))
    for i, t in enumerate(rows, 1):
        assert out.loc[t[0]].lcb_rank == i


def test_odds_ratio_brute(spark):
    out = q_odds_ratio(spark, SF).toPandas().set_index("source")
    n_docs, n_long = _long_table()
    ta, tn = int(n_long.sum()), int(n_docs.sum())
    tb = tn - ta
    for src in n_docs.index:
        a = int(n_long[src])
        b = int(n_docs[src]) - a
        c, d = ta - a, tb - b
        lor = math.log(
            ((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5))
        )
        se = math.sqrt(
            1 / (a + 0.5) + 1 / (b + 0.5) + 1 / (c + 0.5) + 1 / (d + 0.5)
        )
        r = out.loc[src]
        assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
        assert abs(r.odds_ratio - _r6(math.exp(lor))) < 2e-6
        assert abs(r.or_ci_lo - _r6(math.exp(lor - Z * se))) < 2e-6
        assert abs(r.or_ci_hi - _r6(math.exp(lor + Z * se))) < 2e-6
        assert r.or_ci_lo <= r.odds_ratio <= r.or_ci_hi


def test_value_mode_brute(spark):
    out = q_value_mode(spark, SF).toPandas().set_index("event_type")
    e = _events()
    for et, g in e.groupby("event_type"):
        cnt = Counter(g.cents)
        mode_c, mode_n = sorted(
            cnt.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        r = out.loc[et]
        assert r.n_events == len(g)
        assert r.n_distinct == len(cnt)
        assert abs(r.mode_value - _r6(mode_c / 100.0)) < 1e-12
        assert r.mode_count == mode_n
        assert abs(r.mode_share - _r6(mode_n / len(g))) < 1e-12
    assert len(out) == e.event_type.nunique()


def test_bowley_moors_brute(spark):
    out = q_bowley_moors(spark, SF).toPandas().set_index("event_type")
    e = _events()
    for et, g in e.groupby("event_type"):
        es = [
            float(np.percentile(g.cents, q * 12.5, method="linear"))
            for q in range(1, 8)
        ]
        e1, e2, e3, e4, e5, e6, e7 = es
        r = out.loc[et]
        assert r.n_events == len(g)
        assert abs(r.q1 - _r6(e2 / 100.0)) < 2e-6
        assert abs(r["median"] - _r6(e4 / 100.0)) < 2e-6
        assert abs(r.q3 - _r6(e6 / 100.0)) < 2e-6
        if e6 - e2 > 0:
            bow = (e6 + e2 - 2.0 * e4) / (e6 - e2)
            moo = ((e7 - e5) + (e3 - e1)) / (e6 - e2)
            assert abs(r.bowley_skew - _r6(bow)) < 2e-6
            assert abs(r.moors_kurt - _r6(moo)) < 2e-6
            assert -1.0 - 1e-9 <= r.bowley_skew <= 1.0 + 1e-9
            assert r.moors_kurt >= -1e-9
        else:
            assert pd.isna(r.bowley_skew) and pd.isna(r.moors_kurt)


def test_term_position_profile_brute(spark):
    out = (
        q_term_position_profile(spark, SF)
        .toPandas()
        .set_index("token")
    )
    d = _docs()
    total = Counter()
    occ = defaultdict(list)
    in_docs = defaultdict(set)
    for did, txt in zip(d.doc_id, d.text):
        toks = txt.strip().split()
        n = len(toks)
        for i, t in enumerate(toks, 1):
            total[t] += 1
            occ[t].append(i / n)
            in_docs[t].add(did)
    top = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:_TPP_K]
    assert set(out.index) == {t for t, _ in top}
    for t, c in top:
        r = out.loc[t]
        assert r.total_count == c
        assert r.n_docs == len(in_docs[t])
        assert abs(
            r.mean_rel_pos - _r6(sum(occ[t]) / len(occ[t]))
        ) < 2e-6
        assert 0 < r.mean_rel_pos <= 1.0 + 1e-9


def test_longest_event_run_brute(spark):
    out = (
        q_longest_event_run(spark, SF).toPandas().set_index("user_id")
    )
    e = _events().sort_values(["user_id", "us", "event_id"])
    for uid, g in e.groupby("user_id"):
        ts = g.event_type.tolist()
        runs = []
        for t in ts:
            if runs and runs[-1][0] == t:
                runs[-1][1] += 1
            else:
                runs.append([t, 1])
        best_t, best_len = max(
            ((t, ln) for i, (t, ln) in enumerate(runs)),
            key=lambda x: x[1],
        )
        # deterministic tie-break: FIRST run of max length
        for t, ln in runs:
            if ln == max(r[1] for r in runs):
                best_t, best_len = t, ln
                break
        r = out.loc[uid]
        assert r.n_events == len(ts)
        assert r.n_runs == len(runs)
        assert r.max_run_len == best_len
        assert r.max_run_type == best_t
    assert len(out) == e.user_id.nunique()
