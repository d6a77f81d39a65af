"""Semantic tests for feature-eng pack #107: 1-NN matching ATT,
Rosenbaum bounds, placebo DiD (brute pandas replicas; cross-engine
parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _GAMMAS,
    _PLACEBO_SPLIT,
    _TREAT_MOD,
    q_nn_matching_att,
    q_placebo_did,
    q_rosenbaum_bounds,
)

SF = "/root/testdata/sf0.001"


def _panel():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    e["day"] = e.ts.dt.day
    pre = e[e.day <= 15].groupby("user_id")["cents"].mean()
    post = e[e.day > 15].groupby("user_id")["cents"].mean()
    p = pd.DataFrame({"pre": pre, "post": post}).dropna()
    p["treated"] = (p.index % _TREAT_MOD) == 0
    return p.reset_index()


def _match_brute():
    p = _panel()
    u = p.assign(flag=p.treated.astype(int)).sort_values(
        ["pre", "flag", "user_id"]
    )
    rows = []
    vals = u.to_dict("records")
    for i, r in enumerate(vals):
        if r["flag"] != 1:
            continue
        prev = next_ = None
        for j in range(i - 1, -1, -1):
            if vals[j]["flag"] == 0:
                prev = vals[j]
                break
        for j in range(i + 1, len(vals)):
            if vals[j]["flag"] == 0:
                next_ = vals[j]
                break
        if prev is None and next_ is None:
            continue
        if prev is not None and (
            next_ is None
            or r["pre"] - prev["pre"] <= next_["pre"] - r["pre"]
        ):
            m = prev
        else:
            m = next_
        rows.append(
            (r["user_id"], r["post"], m["post"], r["pre"], m["pre"])
        )
    return pd.DataFrame(
        rows, columns=["user_id", "y_t", "y_c", "s_t", "s_c"]
    )


def test_nn_matching_att_brute(spark):
    out = q_nn_matching_att(spark, SF).toPandas().iloc[0]
    m = _match_brute()
    assert out.n_treated == len(m)
    assert abs(out.att - round((m.y_t - m.y_c).mean(), 4)) < 1e-6
    assert (
        abs(out.mean_score_gap - round((m.s_t - m.s_c).abs().mean(), 4))
        < 1e-6
    )


def test_rosenbaum_bounds_brute(spark):
    out = q_rosenbaum_bounds(spark, SF).toPandas()
    m = _match_brute()
    nt = m[m.y_t != m.y_c]
    n, tp = len(nt), int((nt.y_t > nt.y_c).sum())
    assert list(out.gamma) == list(_GAMMAS)
    for _, r in out.iterrows():
        p = r.gamma / (1 + r.gamma)
        z = (tp - 0.5 - n * p) / math.sqrt(n * p * (1 - p))
        assert r.n == n and r.t_plus == tp
        assert abs(r.p_plus - round(p, 6)) < 1e-9
        assert abs(r.z_bound - round(z, 6)) < 1e-6
    # the bound only weakens (z falls) as Gamma grows
    assert out.z_bound.is_monotonic_decreasing


def test_placebo_did_brute(spark):
    out = (
        q_placebo_did(spark, SF).toPandas().set_index("which").did
    )
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    e["day"] = e.ts.dt.day
    e["treated"] = (e.user_id % _TREAT_MOD) == 0

    def did(df, post):
        g = df.groupby("treated").apply(
            lambda f: f[post(f)].cents.mean()
            - f[~post(f)].cents.mean(),
            include_groups=False,
        )
        return g[True] - g[False]

    actual = did(e, lambda f: f.day > 15)
    plc = did(
        e[e.day <= 15], lambda f: f.day > _PLACEBO_SPLIT
    )
    assert abs(out["actual"] - round(actual, 4)) < 1e-6
    assert abs(out["placebo"] - round(plc, 4)) < 1e-6
