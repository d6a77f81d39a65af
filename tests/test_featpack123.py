"""Semantic tests for feature-eng pack #123: exact Bayesian A/B
probability, expected loss, Dirichlet shares.  The brute replica
computes h with math.lgamma directly — an independent derivation
that cross-validates the engine's lgamma-free recurrence."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _FE_HEAVY,
    q_bayes_ab_prob,
    q_bayes_expected_loss,
    q_dirichlet_shares,
)

SF = "/root/testdata/sf0.001"


def _params():
    e = pd.read_parquet(f"{SF}/events.parquet")
    u = (
        e.assign(p=(e.event_type == "purchase").astype(int))
        .groupby("user_id")["p"]
        .sum()
    )
    conv = u >= _FE_HEAVY
    even = u.index % 2 == 0
    aa = 1 + int((even & conv).sum())
    ba = 1 + int((even & ~conv).sum())
    ab = 1 + int((~even & conv).sum())
    bb = 1 + int((~even & ~conv).sum())
    return aa, ba, ab, bb


def _lbeta(x, y):
    return math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y)


def _h(aa, ba, ab, bb):
    total = 0.0
    for i in range(ab):
        total += math.exp(
            _lbeta(aa + i, ba + bb)
            - math.log(bb + i)
            - _lbeta(1 + i, bb)
            - _lbeta(aa, ba)
        )
    return total


def test_bayes_ab_prob_brute(spark):
    out = q_bayes_ab_prob(spark, SF).toPandas().iloc[0]
    aa, ba, ab, bb = _params()
    h = _h(aa, ba, ab, bb)
    assert (out.conv_a, out.fail_a) == (aa - 1, ba - 1)
    assert (out.conv_b, out.fail_b) == (ab - 1, bb - 1)
    assert abs(out.post_mean_a - round(aa / (aa + ba), 6)) < 1e-9
    assert abs(out.post_mean_b - round(ab / (ab + bb), 6)) < 1e-9
    assert abs(out.p_b_beats_a - round(h, 6)) < 1e-5
    assert 0.0 <= out.p_b_beats_a <= 1.0


def test_bayes_expected_loss_brute(spark):
    out = q_bayes_expected_loss(spark, SF).toPandas().iloc[0]
    aa, ba, ab, bb = _params()
    ma, mb = aa / (aa + ba), ab / (ab + bb)
    hb1 = _h(aa, ba, ab + 1, bb)
    ha1 = _h(aa + 1, ba, ab, bb)
    loss_a = mb * hb1 - ma * ha1
    loss_b = ma * (1 - ha1) - mb * (1 - hb1)
    assert abs(out.exp_loss_choose_a - round(loss_a, 6)) < 1e-5
    assert abs(out.exp_loss_choose_b - round(loss_b, 6)) < 1e-5
    assert out.lower_risk_arm == ("A" if loss_a <= loss_b else "B")
    # identity: loss_a - loss_b = E[pB] - E[pA]
    assert abs((loss_a - loss_b) - (mb - ma)) < 1e-12
    # both losses are non-negative
    assert loss_a >= -1e-12 and loss_b >= -1e-12


def test_dirichlet_shares_brute(spark):
    out = q_dirichlet_shares(spark, SF).toPandas().set_index(
        "event_type"
    )
    e = pd.read_parquet(f"{SF}/events.parquet")
    c = e.event_type.value_counts()
    nn, k = len(e), len(c)
    for et, n in c.items():
        a, a0 = n + 1, nn + k
        mean = a / a0
        sd = math.sqrt(mean * (1 - mean) / (a0 + 1))
        row = out.loc[et]
        assert row.n == n
        assert abs(row.post_mean - round(mean, 6)) < 1e-9
        assert abs(row.post_sd - round(sd, 6)) < 1e-9
        assert abs(row.post_map - round(n / nn, 6)) < 1e-9
    assert abs(out.post_mean.sum() - 1.0) < 1e-5
