"""Semantic tests for feature-eng pack #98: German tank, capture-
recapture, linear counting (brute python replicas; cross-engine
parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from crawlfe.queries import (
    _CR_W1,
    _CR_W2,
    _GT_MOD,
    _LC_M,
    q_capture_recapture,
    q_german_tank,
    q_linear_counting,
)

SF = "/root/testdata/sf0.001"


def _h8(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_german_tank_brute(spark):
    out = q_german_tank(spark, SF).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet")
    serials = (d.doc_id + 1).to_numpy()
    n_true = serials.max()
    samp = [s for s in serials if _h8(f"gt{s}") % _GT_MOD == 0]
    k, m, s = len(samp), max(samp), sum(samp)
    mvu = m + m / k - 1
    mom = 2 * s / k - 1
    assert (out.n_true, out.k, out.m) == (n_true, k, m)
    assert abs(out.est_mvu - round(mvu, 4)) < 1e-9
    assert abs(out.est_moment - round(mom, 4)) < 1e-9
    # the MVU estimator should land within ~2 gaps of the truth
    assert abs(mvu - n_true) / n_true < 0.25


def test_capture_recapture_brute(spark):
    out = q_capture_recapture(spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet")
    day = e.ts.dt.day
    per = pd.DataFrame(
        {
            "u": e.user_id,
            "c1": day.between(*_CR_W1).astype(int),
            "c2": day.between(*_CR_W2).astype(int),
        }
    ).groupby("u").max()
    n_total = len(per)
    n1, n2 = int(per.c1.sum()), int(per.c2.sum())
    m = int((per.c1 * per.c2).sum())
    lp = n1 * n2 / m
    chap = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert (out.n_total, out.n1, out.n2, out.m) == (n_total, n1, n2, m)
    assert abs(out.est_lp - round(lp, 4)) < 1e-9
    assert abs(out.est_chapman - round(chap, 4)) < 1e-9


def test_linear_counting_brute(spark):
    out = q_linear_counting(spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet")
    users = e.user_id.unique()
    occ = len({_h8(f"lc{u}") % _LC_M for u in users})
    est = -_LC_M * math.log((_LC_M - occ) / _LC_M)
    assert (out.n_exact, out.occupied) == (len(users), occ)
    assert abs(out.est_lc - round(est, 4)) < 1e-9
    # in the n << m regime linear counting is near-exact
    assert abs(est - len(users)) / len(users) < 0.05
