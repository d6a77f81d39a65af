"""Semantic tests for feature-eng pack #131: Sobel mediation,
partial-correlation skeleton, Granger-lite (brute numpy replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _PC_Z,
    q_granger_lite,
    q_mediation_sobel,
    q_partial_corr_skeleton,
)

SF = "/root/testdata/sf0.001"


def _users():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    g = e.groupby("user_id").agg(
        m=("cents", "size"),
        y=("cents", "sum"),
        p=("event_type", lambda s: int((s == "purchase").sum())),
    )
    g["x"] = (g.index % 2 == 0).astype(float)
    return g.astype(float)


def test_mediation_sobel_brute(spark):
    out = q_mediation_sobel(spark, SF).toPandas().iloc[0]
    u = _users()
    n = len(u)
    x, m, y = u.x.to_numpy(), u.m.to_numpy(), u.y.to_numpy()

    def cm(a, b):
        return (a * b).mean() - a.mean() * b.mean()

    sxx, sxm, sxy = cm(x, x), cm(x, m), cm(x, y)
    smm, smy, syy = cm(m, m), cm(m, y), cm(y, y)
    a = sxm / sxx
    se_a = math.sqrt(
        (n * (smm - sxm**2 / sxx)) / (n - 2) / (n * sxx)
    )
    det = sxx * smm - sxm**2
    c_x = (smm * sxy - sxm * smy) / det
    b = (sxx * smy - sxm * sxy) / det
    rss = n * (syy - c_x * sxy - b * smy)
    se_b = math.sqrt(rss / (n - 3) * sxx / (n * det))
    ab = a * b
    sobel = ab / math.sqrt(b * b * se_a**2 + a * a * se_b**2)
    assert out.n == n
    assert abs(out.path_a - round(a, 6)) < 1e-4
    assert abs(out.path_b - round(b, 6)) < 1e-4
    assert abs(out.direct_c - round(c_x, 6)) < 1e-3
    assert abs(out.indirect_ab - round(ab, 6)) < 1e-3
    assert abs(out.sobel_z - round(sobel, 6)) < 1e-4
    # effect decomposition: total = direct + indirect
    total = sxy / sxx
    assert abs((c_x + ab) - total) < 1e-6


def test_partial_corr_skeleton_brute(spark):
    out = q_partial_corr_skeleton(spark, SF).toPandas().set_index(
        "pair"
    )
    u = _users()
    n = len(u)
    cols = {"m": u.m, "y": u.y, "p": u.p}

    def r(a, b):
        xa, xb = cols[a].to_numpy(), cols[b].to_numpy()
        c = (xa * xb).mean() - xa.mean() * xb.mean()
        return c / math.sqrt(
            ((xa * xa).mean() - xa.mean() ** 2)
            * ((xb * xb).mean() - xb.mean() ** 2)
        )

    names = {"m": "n_events", "y": "total_cents", "p": "n_purchases"}
    for a, b, c in (("m", "y", "p"), ("m", "p", "y"), ("y", "p", "m")):
        rab, rac, rbc = r(a, b), r(a, c), r(b, c)
        part = (rab - rac * rbc) / math.sqrt(
            (1 - rac**2) * (1 - rbc**2)
        )
        z = 0.5 * math.log((1 + part) / (1 - part)) * math.sqrt(n - 4)
        row = out.loc[f"{names[a]}~{names[b]}"]
        assert row.given == names[c]
        assert abs(row.marginal_r - round(rab, 6)) < 1e-5
        assert abs(row.partial_r - round(part, 6)) < 1e-5
        assert abs(row.fisher_z - round(z, 6)) < 1e-3
        assert bool(row.edge_kept) == (abs(z) > _PC_Z)


def test_granger_lite_brute(spark):
    out = q_granger_lite(spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["cents"] = np.round(e.value * 100).astype("int64")
    d = e.groupby(e.ts.dt.day).agg(
        y=("cents", "sum"),
        p=("event_type", lambda s: int((s == "purchase").sum())),
    ).sort_index().astype(float)
    y = d.y.to_numpy()[1:]
    y1 = d.y.to_numpy()[:-1]
    p1 = d.p.to_numpy()[:-1]
    n = len(y)

    def cm(a, b):
        return (a * b).mean() - a.mean() * b.mean()

    c11, c12, c22 = cm(y1, y1), cm(y1, p1), cm(p1, p1)
    cy1, cy2, cyy = cm(y, y1), cm(y, p1), cm(y, y)
    rss_r = n * (cyy - cy1**2 / c11)
    det = c11 * c22 - c12**2
    b1 = (c22 * cy1 - c12 * cy2) / det
    b2 = (c11 * cy2 - c12 * cy1) / det
    rss_u = n * (cyy - b1 * cy1 - b2 * cy2)
    fstat = (rss_r - rss_u) / (rss_u / (n - 3))
    assert out.n == n
    assert abs(out.beta_lag_purchases - round(b2, 6)) < 1e-2
    assert abs(out.f_stat - round(fstat, 6)) < 1e-3
    # adding a regressor can only lower the RSS
    assert (
        out.rss_unrestricted_per_n <= out.rss_restricted_per_n + 1e-6
    )
