"""Semantic tests for feature-eng pack #46: clustering coefficient,
link prediction scores, degree assortativity, reciprocity,
fixed-point HITS, bipartite projection (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from crawlfe.queries import (
    q_bipartite_proj,
    q_clustering_coeff,
    q_degree_assortativity,
    q_hits_scores,
    q_link_pred_scores,
    q_reciprocity,
)

SF = "/root/testdata/sf0.001"


def _doc_ids():
    return sorted(
        pd.read_parquet(f"{SF}/documents.parquet").doc_id.tolist()
    )


def _directed():
    ids = _doc_ids()
    n = len(ids)
    e = set()
    for d in ids:
        for a, b in ((7, 3), (13, 5)):
            dst = (d * a + b) % n
            if dst != d:
                e.add((d, dst))
    return ids, e


def _und():
    ids, e = _directed()
    und = {(min(u, v), max(u, v)) for u, v in e}
    nbr = defaultdict(set)
    for u, v in und:
        nbr[u].add(v)
        nbr[v].add(u)
    return ids, und, nbr


def test_clustering_coeff_brute(spark):
    out = q_clustering_coeff(spark, SF).toPandas().set_index("doc_id")
    ids, und, nbr = _und()
    assert set(out.index) == set(nbr.keys())
    for node, ns in nbr.items():
        deg = len(ns)
        ns_sorted = sorted(ns)
        tri = sum(
            1
            for i, a in enumerate(ns_sorted)
            for c in ns_sorted[i + 1:]
            if (a, c) in und
        )
        r = out.loc[node]
        assert r.deg == deg
        assert r.tri == tri
        if deg >= 2:
            assert abs(r.coeff - 2 * tri / (deg * (deg - 1))) < 2e-6
        else:
            assert pd.isna(r.coeff)


def test_link_pred_brute(spark):
    out = q_link_pred_scores(spark, SF).toPandas()
    ids, und, nbr = _und()
    cand = {}
    for mid, ns in nbr.items():
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for w in ns_sorted[i + 1:]:
                if (u, w) not in und:
                    cand.setdefault((u, w), []).append(mid)
    rows = []
    for (u, w), mids in cand.items():
        cn = len(mids)
        aa = round(sum(1.0 / math.log(len(nbr[m])) for m in mids), 6)
        jac = cn / (len(nbr[u]) + len(nbr[w]) - cn)
        rows.append((u, w, cn, jac, aa))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    assert len(out) == min(50, len(rows))
    for rk, (u, w, cn, jac, aa) in enumerate(rows[:50], 1):
        r = out[out.rk == rk].iloc[0]
        assert (r.u, r.w, r.cn) == (u, w, cn)
        assert abs(r.jaccard - jac) < 2e-6
        assert abs(r.adamic_adar - aa) < 2e-6


def test_assortativity_brute(spark):
    out = q_degree_assortativity(spark, SF).toPandas().iloc[0]
    ids, und, nbr = _und()
    xs, ys = [], []
    for u, v in und:
        for a, b in ((u, v), (v, u)):
            xs.append(len(nbr[a]))
            ys.append(len(nbr[b]))
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    r = (m * sxy - sx * sy) / math.sqrt(
        (m * sxx - sx * sx) * (m * syy - sy * sy)
    )
    assert out.n_incidences == m
    assert abs(out.assortativity - r) < 2e-6
    assert -1.0 <= out.assortativity <= 1.0


def test_reciprocity_brute(spark):
    out = q_reciprocity(spark, SF).toPandas().iloc[0]
    ids, e = _directed()
    recip = sum(1 for u, v in e if (v, u) in e)
    assert out.n_edges == len(e)
    assert out.n_reciprocated == recip
    assert abs(out.reciprocity - recip / len(e)) < 2e-6


def test_hits_fixed_point_brute(spark):
    out = q_hits_scores(spark, SF).toPandas()
    ids, e = _directed()
    scale = 1_000_000_000_000
    hub = {d: scale for d in ids}
    auth = {}
    for _ in range(3):
        a_raw = defaultdict(int)
        for u, v in e:
            a_raw[v] += hub[u]
        mx = max(a_raw.values())
        auth = {d: a_raw.get(d, 0) * scale // mx for d in ids}
        h_raw = defaultdict(int)
        for u, v in e:
            h_raw[u] += auth[v]
        mx = max(h_raw.values())
        hub = {d: h_raw.get(d, 0) * scale // mx for d in ids}
    ranked = sorted(ids, key=lambda d: (-auth[d], d))[:20]
    assert len(out) == 20
    for rk, d in enumerate(ranked, 1):
        r = out[out.rk == rk].iloc[0]
        assert r.doc_id == d
        assert r.authority_fp == auth[d]
        assert r.hub_fp == hub[d]


def test_bipartite_proj_brute(spark):
    out = q_bipartite_proj(spark, SF).toPandas().set_index(
        ["type_a", "type_b"]
    )
    e = pd.read_parquet(f"{SF}/events.parquet")
    users = {
        et: set(g.user_id.unique()) for et, g in e.groupby("event_type")
    }
    types = sorted(users)
    n_pairs = 0
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            w = len(users[a] & users[b])
            if w == 0:
                assert (a, b) not in out.index
                continue
            n_pairs += 1
            r = out.loc[(a, b)]
            assert r.n_a == len(users[a]) and r.n_b == len(users[b])
            assert r.shared_users == w
            assert (
                abs(r.overlap_coef - w / min(len(users[a]), len(users[b])))
                < 2e-6
            )
            assert (
                abs(r.cosine - w / math.sqrt(len(users[a]) * len(users[b])))
                < 2e-6
            )
    assert len(out) == n_pairs
