"""Semantic tests for feature-eng pack #45: Cochran's Q, Dunn
post-hoc, Ansari-Bradley scale test, two-sample KS, two-sample
Cramér-von Mises, Cohen's d / Hedges' g (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_ansari_bradley,
    q_cochran_q,
    q_cohens_d,
    q_cvm_two_sample,
    q_dunn_posthoc,
    q_ks_two_sample,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
    )


def _pc(e):
    p = e.loc[e.event_type == "purchase", "cents"].values
    c = e.loc[e.event_type == "click", "cents"].values
    return p, c


def test_cochran_q_brute(spark):
    out = q_cochran_q(spark, SF).toPandas().set_index("event_type")
    e = _events()
    x = (
        e.groupby(["user_id", "event_type"])
        .size()
        .ge(2)
        .astype(int)
        .unstack(fill_value=0)
    )
    k = x.shape[1]
    cj = x.sum(axis=0)
    ri = x.sum(axis=1)
    nsum = int(cj.sum())
    num = k * k * int((cj**2).sum()) - nsum * nsum * k
    den = k * (k * int(ri.sum()) - int((ri**2).sum()))
    q = (k - 1) * num / den if den else None
    for et in cj.index:
        r = out.loc[et]
        assert r.c_j == cj[et]
        assert r.n_blocks == len(ri)
        assert r.k_treatments == k
        if q is None:
            # degenerate board (every block all-0 or all-1): the
            # query must emit NULL, not crash — the sf0.001 tier
            # exercises exactly this edge
            assert pd.isna(r.q_stat)
        else:
            assert abs(r.q_stat - q) < 2e-6
            assert (
                abs(r.p_chi2_df4 - math.exp(-q / 2) * (1 + q / 2))
                < 2e-6
            )


def test_dunn_posthoc_brute(spark):
    out = q_dunn_posthoc(spark, SF).toPandas()
    e = _events()
    ranks = e.cents.rank(method="average")
    nn = len(e)
    _, t = np.unique(e.cents.values, return_counts=True)
    tie3 = float((t.astype(float) ** 3 - t).sum())
    base_var = nn * (nn + 1) / 12.0 - tie3 / (12.0 * (nn - 1))
    mr = ranks.groupby(e.event_type).mean()
    sz = e.groupby("event_type").size()
    types = sorted(sz.index)
    assert len(out) == len(types) * (len(types) - 1) // 2
    out = out.set_index(["type_a", "type_b"])
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            z = (mr[a] - mr[b]) / math.sqrt(
                base_var * (1.0 / sz[a] + 1.0 / sz[b])
            )
            r = out.loc[(a, b)]
            assert r.n_a == sz[a] and r.n_b == sz[b]
            assert abs(r.mean_rank_a - mr[a]) < 2e-6
            assert abs(r.mean_rank_b - mr[b]) < 2e-6
            assert abs(r.z - z) < 2e-6


def test_ansari_bradley_brute(spark):
    out = q_ansari_bradley(spark, SF).toPandas().iloc[0]
    e = _events()
    p, c = _pc(e)
    comb = pd.Series(np.concatenate([p, c]))
    nn = len(comb)
    r = comb.rank(method="average").values
    s = np.minimum(r, nn + 1 - r)
    t_stat = s[: len(p)].sum()
    mean_t = len(p) * s.mean()
    var_t = (
        len(p)
        * len(c)
        * (nn * (s**2).sum() - s.sum() ** 2)
        / (nn**2 * (nn - 1))
    )
    z = (t_stat - mean_t) / math.sqrt(var_t)
    assert out.n_purchase == len(p) and out.n_click == len(c)
    assert out.ab_stat2 == 2 * t_stat
    assert abs(out.mean2 - 2 * mean_t) < 2e-5
    assert abs(out.z - z) < 2e-6


def test_ks_two_sample_brute(spark):
    out = q_ks_two_sample(spark, SF).toPandas().iloc[0]
    e = _events()
    p, c = _pc(e)
    grid = np.unique(np.concatenate([p, c]))
    f1 = np.searchsorted(np.sort(p), grid, side="right")
    f2 = np.searchsorted(np.sort(c), grid, side="right")
    dnum = int(np.abs(f1 * len(c) - f2 * len(p)).max())
    d = dnum / (len(p) * len(c))
    lam = math.sqrt(len(p) * len(c) / (len(p) + len(c))) * d
    pval = 2 * (
        math.exp(-2 * lam * lam)
        - math.exp(-8 * lam * lam)
        + math.exp(-18 * lam * lam)
    )
    assert out.d_numer == dnum
    assert abs(out.d_stat - d) < 2e-6
    assert abs(out.lambda_stat - lam) < 2e-6
    assert abs(out.p_asymp - pval) < 2e-6
    # D of a sample against itself is 0; against disjoint supports 1
    assert 0.0 <= out.d_stat <= 1.0


def test_cvm_two_sample_brute(spark):
    out = q_cvm_two_sample(spark, SF).toPandas().iloc[0]
    e = _events()
    p, c = _pc(e)
    grid, l = np.unique(np.concatenate([p, c]), return_counts=True)
    f1 = np.searchsorted(np.sort(p), grid, side="right")
    f2 = np.searchsorted(np.sort(c), grid, side="right")
    n1, n2 = len(p), len(c)
    nn = n1 + n2
    tnum = int(
        (l.astype(object) * (f1 * n2 - f2 * n1).astype(object) ** 2).sum()
    )
    t = tnum / (nn**2 * n1 * n2)
    assert out.n_purchase == n1 and out.n_click == n2
    assert abs(out.t_stat - t) < 2e-6
    assert out.t_stat >= 0


def test_cohens_d_brute(spark):
    out = q_cohens_d(spark, SF).toPandas().iloc[0]
    e = _events()
    p, c = _pc(e)
    v1 = p / 100.0
    v2 = c / 100.0
    m1, m2 = v1.mean(), v2.mean()
    s1 = v1.var(ddof=1)
    s2 = v2.var(ddof=1)
    n1, n2 = len(v1), len(v2)
    sp = math.sqrt(((n1 - 1) * s1 + (n2 - 1) * s2) / (n1 + n2 - 2))
    d = (m1 - m2) / sp
    j = 1 - 3.0 / (4 * (n1 + n2 - 2) - 1)
    assert out.n_purchase == n1 and out.n_click == n2
    assert abs(out.mean_diff - (m1 - m2)) < 2e-6
    assert abs(out.pooled_sd - sp) < 2e-6
    assert abs(out.cohens_d - d) < 2e-6
    assert abs(out.hedges_g - j * d) < 2e-6
    # |g| < |d| always (shrinkage toward zero)
    assert abs(out.hedges_g) < abs(out.cohens_d) + 1e-12
