"""Semantic tests for feature-eng pack #79: IPS/SNIPS off-policy
value, doubly-robust estimator, candidate-policy sweep (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _OP_ACTIONS,
    _OP_BIN_CENTS,
    _OP_MAX_BIN,
    _OP_TRAIN_DAY_MAX,
    q_dr_offpolicy,
    q_ips_offpolicy,
    q_policy_sweep,
)

SF = "/root/testdata/sf0.001"


def _rounds():
    e = pd.read_parquet(f"{SF}/events.parquet")
    cents = round(e.value * 100).astype("int64")
    a = e.event_id.map(
        lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        % _OP_ACTIONS
    )
    return pd.DataFrame(
        {
            "day": e.ts.dt.day,
            "x": np.minimum(_OP_MAX_BIN, cents // _OP_BIN_CENTS),
            "a": a,
            "r": (((cents // 100) + 13 * a) % 10 < 3 + a).astype(int),
        }
    )


def test_ips_offpolicy_brute(spark):
    out = q_ips_offpolicy(spark, SF).toPandas().set_index("x").sort_index()
    r = _rounds()
    r["match"] = (r.a == r.x % _OP_ACTIONS).astype(int)
    g = r.groupby("x").agg(
        n=("a", "size"),
        n_match=("match", "sum"),
        r_match=("r", lambda s: int((s * r.loc[s.index, "match"]).sum())),
    )
    cn = cm = cr = 0
    for x, row in g.sort_index().iterrows():
        cn += row.n
        cm += row.n_match
        cr += row.r_match
        o = out.loc[x]
        assert (o.n, o.n_match, o.r_match) == (row.n, row.n_match, row.r_match)
        # 1.01e-6 tolerance: exact .5 rounding ties (e.g. 171/384)
        # round HALF_UP in both engines but banker's in python
        assert abs(o.ips_x - _OP_ACTIONS * row.r_match / row.n) < 1.01e-6
        assert abs(o.ips_run - _OP_ACTIONS * cr / cn) < 1.01e-6
        assert abs(o.snips_run - cr / cm) < 1.01e-6
    # global IPS is unbiased for the true policy value; with uniform
    # logging the matched share should be near 1/3
    assert abs(out.n_match.sum() / out.n.sum() - 1 / 3) < 0.15


def test_dr_offpolicy_brute(spark):
    out = (
        q_dr_offpolicy(spark, SF)
        .toPandas()
        .set_index(["x", "a"])
        .sort_index()
    )
    r = _rounds()
    tr = r[r.day <= _OP_TRAIN_DAY_MAX]
    te = r[r.day > _OP_TRAIN_DAY_MAX]
    qhat = {
        (x, a): (g.r.sum() + 1) / (len(g) + 2)
        for (x, a), g in tr.groupby(["x", "a"])
    }
    cells = te.groupby(["x", "a"]).agg(n=("r", "size"), s=("r", "sum"))
    cum_term = 0.0
    cum_n = 0
    for (x, a), row in cells.sort_index().iterrows():
        ql = qhat.get((x, a), 0.5)
        pa = x % _OP_ACTIONS
        qt = qhat.get((x, pa), 0.5)
        match = int(a == pa)
        cum_term += row.n * qt + _OP_ACTIONS * match * (row.s - row.n * ql)
        cum_n += row.n
        o = out.loc[(x, a)]
        assert (o.n, o.s) == (row.n, row.s)
        assert abs(o.qhat_logged - round(ql, 6)) < 1e-9
        assert abs(o.qhat_target - round(qt, 6)) < 1e-9
        assert abs(o.dr_run - round(cum_term / cum_n, 6)) < 1e-6
    # DR value is a probability-scale quantity for 0/1 rewards
    assert -0.5 <= out.dr_run.iloc[-1] <= 1.5


def test_policy_sweep_brute(spark):
    out = q_policy_sweep(spark, SF).toPandas().set_index("k").sort_index()
    r = _rounds()
    n = len(r)
    rows = {}
    for k in range(_OP_ACTIONS):
        match = (r.a == (r.x + k) % _OP_ACTIONS).astype(int)
        nm = int(match.sum())
        rm = int((match * r.r).sum())
        rows[k] = (nm, rm, round(_OP_ACTIONS * rm / n, 6), round(rm / nm, 6))
    for k, (nm, rm, ips, snips) in rows.items():
        o = out.loc[k]
        assert (o.n_match, o.r_match) == (nm, rm)
        assert abs(o.ips - ips) < 1.01e-6
        assert abs(o.snips - snips) < 1.01e-6
    order = sorted(rows, key=lambda k: (-rows[k][3], k))
    for rank, k in enumerate(order, 1):
        assert out.loc[k, "rank"] == rank
    # the three candidates partition the logged actions exactly
    assert out.n_match.sum() == n
