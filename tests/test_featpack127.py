"""Semantic tests for feature-eng pack #127: selectivity audit,
histogram estimation error, sample NDV (brute pandas replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _HIST_B,
    _HIST_RANGES,
    _NDV_MOD,
    q_histogram_est_error,
    q_ndv_sample_est,
    q_selectivity_audit,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_selectivity_audit_brute(spark):
    out = q_selectivity_audit(spark, SF).toPandas().set_index("pair")
    e = _events()
    p1 = e.event_type == "purchase"
    p2 = e.value > e.value.mean()
    p3 = e.ts.dt.day <= 15
    cases = {
        "type&value": (p1, p2),
        "type&day": (p1, p3),
        "value&day": (p2, p3),
    }
    for pair, (a, b) in cases.items():
        row = out.loc[pair]
        assert row.n == len(e)
        assert abs(row.est_indep - round(a.mean() * b.mean(), 6)) < 1e-9
        assert abs(row.actual - round((a & b).mean(), 6)) < 1e-9
        assert abs(
            row.corr_ratio
            - round((a & b).mean() / (a.mean() * b.mean()), 6)
        ) < 1e-5


def test_histogram_est_error_brute(spark):
    out = q_histogram_est_error(spark, SF).toPandas().set_index(
        "range_id"
    )
    e = _events()
    c = np.sort(np.round(e.value * 100).astype("int64").to_numpy())
    n = len(c)
    # equi-depth histogram
    b_of = np.ceil(np.arange(1, n + 1) * _HIST_B / n).astype(int)
    hist = []
    lo = float(c.min() - 1)
    for b in range(1, _HIST_B + 1):
        seg = c[b_of == b]
        hi = float(seg.max())
        hist.append((lo, hi, len(seg)))
        lo = hi
    m = n - 1
    for i, (a, bq) in enumerate(_HIST_RANGES):
        cand = [c[int(math.floor(m * a))], c[int(math.floor(m * bq))]]
        qa, qb = float(min(cand)), float(max(cand))
        est = sum(
            cnt
            * max(0.0, min(hi, qb) - max(lo, qa))
            / (hi - lo)
            / n
            for lo, hi, cnt in hist
        )
        actual = np.mean((c > qa) & (c <= qb))
        row = out.loc[f"r{i + 1}"]
        assert row.lo_cents == qa and row.hi_cents == qb
        assert abs(row.est_sel - round(est, 6)) < 1e-5
        assert abs(row.actual_sel - round(actual, 6)) < 1e-9
        assert abs(row.abs_err - round(est - actual, 6)) < 1e-5
        # equi-depth estimate is within a couple of bucket widths
        assert abs(row.abs_err) < 2.0 / _HIST_B


def test_ndv_sample_est_brute(spark):
    out = q_ndv_sample_est(spark, SF).toPandas().iloc[0]
    e = _events()
    true_ndv = e.user_id.nunique()
    samp = e[e.user_id % _NDV_MOD == 0]
    per = samp.groupby("user_id").size()
    d = len(per)
    f1 = int((per == 1).sum())
    f2 = int((per == 2).sum())
    assert out.true_ndv == true_ndv
    assert (out.d, out.f1, out.f2) == (d, f1, f2)
    assert abs(out.est_scaleup - round(d * _NDV_MOD, 2)) < 1e-9
    assert abs(
        out.est_gee - round(d + (math.sqrt(_NDV_MOD) - 1) * f1, 2)
    ) < 1e-9
    assert abs(
        out.est_chao2 - round(d + f1 * f1 / (2 * max(f2, 1)), 2)
    ) < 1e-9
