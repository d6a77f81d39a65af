"""Semantic tests for feature-eng pack #99: TOST equivalence,
O'Brien-Fleming looks, winner's-curse haircut (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import pandas as pd

from crawlfe.queries import (
    _OBF_FINAL,
    _OBF_INTERIM,
    _TOST_DELTA,
    q_obrien_fleming,
    q_tost_equivalence,
    q_winners_curse,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _two_arm(e):
    g0 = e[e.user_id % 2 == 0]
    g1 = e[e.user_id % 2 == 1]
    return (
        len(g0),
        int((g0.event_type == "purchase").sum()),
        len(g1),
        int((g1.event_type == "purchase").sum()),
    )


def test_tost_equivalence_brute(spark):
    out = q_tost_equivalence(spark, SF).toPandas().iloc[0]
    n0, y0, n1, y1 = _two_arm(_events())
    p0, p1 = y0 / n0, y1 / n1
    se = math.sqrt(p0 * (1 - p0) / n0 + p1 * (1 - p1) / n1)
    diff = p1 - p0
    z_lo = (diff + _TOST_DELTA) / se
    z_hi = (_TOST_DELTA - diff) / se
    assert (out.n0, out.n1) == (n0, n1)
    assert abs(out["diff"] - round(diff, 6)) < 1e-9  # .diff is a method
    assert abs(out.z_lower - round(z_lo, 6)) < 1e-6
    assert abs(out.z_upper - round(z_hi, 6)) < 1e-6
    assert out.equivalent == int(z_lo > 1.644854 and z_hi > 1.644854)


def test_obrien_fleming_brute(spark):
    out = q_obrien_fleming(spark, SF).toPandas().set_index("look")
    e = _events()
    for look, sub, bound in (
        ("interim_d15", e[e.ts.dt.day.between(1, 15)], _OBF_INTERIM),
        ("final_d30", e, _OBF_FINAL),
    ):
        n0, y0, n1, y1 = _two_arm(sub)
        p0, p1 = y0 / n0, y1 / n1
        se = math.sqrt(p0 * (1 - p0) / n0 + p1 * (1 - p1) / n1)
        z = (p1 - p0) / se
        row = out.loc[look]
        assert (row.n0, row.n1) == (n0, n1)
        assert abs(row.z - round(z, 6)) < 1e-6
        assert row.boundary == bound
        assert row.cross == int(abs(z) > bound)
    # OBF interim boundary is strictly harder than the final one
    assert _OBF_INTERIM > _OBF_FINAL


def test_winners_curse_brute(spark):
    out = q_winners_curse(spark, SF).toPandas().iloc[0]
    e = _events()
    arms = []
    for a in range(3):
        g = e[e.user_id % 3 == a]
        arms.append((a, len(g), (g.event_type == "purchase").mean()))
    arms.sort(key=lambda t: (-t[2], t[0]))
    (wa, nw, pw), (_, n2, p2) = arms[0], arms[1]
    se = math.sqrt(pw * (1 - pw) / nw + p2 * (1 - p2) / n2)
    z = (pw - p2) / se
    pdf = math.exp(-z * z / 2) / 2.5066282746310002
    cdf = 1 / (1 + math.exp(-1.702 * z))
    haircut = se * pdf / cdf
    assert (out.win_arm, out.n_win) == (wa, nw)
    assert abs(out.p_naive - round(pw, 6)) < 1e-9
    assert abs(out.z_gap - round(z, 6)) < 1e-6
    assert abs(out.bias_est - round(haircut, 6)) < 1e-6
    assert abs(out.p_adjusted - round(pw - haircut, 6)) < 1e-6
    # the haircut shrinks the winner toward (never past) the field
    assert out.p_adjusted <= out.p_naive
    assert out.bias_est >= 0
