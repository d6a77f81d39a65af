"""Semantic tests for feature-eng pack #24: count-min sketch,
total-variation drift, weighted median, interval union, Welch t, and
event-type co-occurrence lift (brute python replicas; cross-engine
parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _CMS_D,
    _CMS_PROBES,
    _CMS_W,
    q_cooccur_lift,
    q_count_min,
    q_interval_union,
    q_tvd_drift,
    q_weighted_median,
    q_welch_t,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_count_min_brute(spark):
    out = q_count_min(spark, SF).toPandas()
    ev = _events()
    regs = {}
    for uid in ev.user_id:
        for r in range(_CMS_D):
            h = int(
                hashlib.md5(f"{r}:{uid}".encode()).hexdigest()[:15], 16
            )
            key = (r, h % _CMS_W)
            regs[key] = regs.get(key, 0) + 1
    exact = ev.groupby("user_id").size()
    probes = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[
        :_CMS_PROBES
    ]
    assert len(out) == min(_CMS_PROBES, ev.user_id.nunique())
    for uid, n in probes:
        est = min(
            regs[
                (
                    r,
                    int(
                        hashlib.md5(f"{r}:{uid}".encode()).hexdigest()[
                            :15
                        ],
                        16,
                    )
                    % _CMS_W,
                )
            ]
            for r in range(_CMS_D)
        )
        row = out[out.user_id == uid].iloc[0]
        assert (row.exact_n, row.cms_est) == (n, est)
        # CMS never under-estimates
        assert row.cms_est >= row.exact_n


def test_tvd_drift_brute(spark):
    out = q_tvd_drift(spark, SF).toPandas()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    toks = {}
    for src, text in zip(d.source, d.text):
        for t in re.split(r"\s+", text.strip()):
            if t:
                toks.setdefault(src, {})[t] = (
                    toks.setdefault(src, {}).get(t, 0) + 1
                )
    allc = {}
    for c in toks.values():
        for t, n in c.items():
            allc[t] = allc.get(t, 0) + n
    n_all = sum(allc.values())
    assert set(out.source) == set(toks)
    for src, cs in toks.items():
        n_s = sum(cs.values())
        n_r = n_all - n_s
        l1 = sum(
            abs(cs.get(t, 0) * n_r - (allc[t] - cs.get(t, 0)) * n_s)
            for t in allc
        )
        row = out[out.source == src].iloc[0]
        assert (row.n_s, row.l1_num) == (n_s, l1)
        assert row.tvd == round(l1 / (2.0 * n_s * n_r), 6)
        assert 0.0 <= row.tvd <= 1.0


def test_weighted_median_brute(spark):
    out = q_weighted_median(spark, SF).toPandas()
    ev = _events()
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["value", "event_id"])
        ws = [(uid % 7) + 1 for uid in g.user_id]
        tot = sum(ws)
        cum = 0
        med = None
        for v, w in zip(g.value, ws):
            cum += w
            if 2 * cum >= tot:
                med = v
                break
        row = out[out.event_type == et].iloc[0]
        assert (row.median_v, row.tot_w, row.n) == (med, tot, len(g))
        # weighted median sits inside the value range
        assert g.value.min() <= row.median_v <= g.value.max()


def test_interval_union_brute(spark):
    out = q_interval_union(spark, SF).toPandas()
    ev = _events()
    assert len(out) == ev.user_id.nunique()
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ivs = []
        for ts, v in zip(g.ts, g.value):
            s = ts.value // 1000  # pandas ns -> us
            ivs.append((s, s + int(np.rint(v * 100)) * 10000))
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1] = (
                    islands[-1][0],
                    max(islands[-1][1], e),
                )
            else:
                islands.append((s, e))
        row = out[out.user_id == uid].iloc[0]
        assert row.n_islands == len(islands)
        assert row.union_us == sum(e - s for s, e in islands)
        # union of merged intervals can't exceed the covering span
        assert row.union_us <= islands[-1][1] - islands[0][0]


def test_welch_t_brute(spark):
    out = q_welch_t(spark, SF).toPandas()
    ev = _events()
    ev = ev[ev.event_type.isin(["purchase", "click"])].copy()
    ev["day"] = ev.ts.dt.day
    ev["c"] = [int(np.rint(v * 100)) for v in ev.value]
    for day, g in ev.groupby("day"):
        p = g[g.event_type == "purchase"].c
        c = g[g.event_type == "click"].c
        if len(p) < 2 or len(c) < 2:
            assert day not in set(out.day)
            continue
        n1, s1, q1 = len(p), int(p.sum()), int((p * p).sum())
        n2, s2, q2 = len(c), int(c.sum()), int((c * c).sum())
        m1, m2 = s1 / n1, s2 / n2
        v1 = (q1 - s1 * m1) / (n1 - 1.0)
        v2 = (q2 - s2 * m2) / (n2 - 1.0)
        t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
        row = out[out.day == day].iloc[0]
        assert (row.n1, row.n2) == (n1, n2)
        assert abs(row.welch_t - t) < 1e-5


def test_cooccur_lift_brute(spark):
    out = q_cooccur_lift(spark, SF).toPandas()
    ev = _events()
    ut = ev[["user_id", "event_type"]].drop_duplicates()
    n_users = ut.user_id.nunique()
    per = ut.groupby("event_type").size()
    types = sorted(per.index)
    by_user = ut.groupby("user_id").event_type.apply(set)
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            n_co = sum(1 for s in by_user if a in s and b in s)
            rows = out[(out.etype_a == a) & (out.etype_b == b)]
            if n_co == 0:
                assert len(rows) == 0
                continue
            row = rows.iloc[0]
            assert (row.n_co, row.n_a, row.n_b) == (
                n_co,
                per[a],
                per[b],
            )
            assert row.lift == round(
                (n_co * n_users) / float(per[a] * per[b]), 6
            )
