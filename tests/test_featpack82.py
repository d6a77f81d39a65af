"""Semantic tests for feature-eng pack #82: Durbin-Watson,
Breusch-Pagan LM, one-way fixed-effects within estimator (brute
python/numpy replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _BP_CRIT95,
    _HOUR_US,
    q_breusch_pagan,
    q_durbin_watson,
    q_fe_within,
)

SF = "/root/testdata/sf0.001"


def _hourly():
    e = pd.read_parquet(f"{SF}/events.parquet")
    hr = (e.ts.astype("int64") // 1000) // (_HOUR_US // 1000)
    cents = (e.value * 100).round().astype("int64")
    h = (
        pd.DataFrame({"hr": hr, "cents": cents})
        .groupby("hr")["cents"]
        .sum()
        .sort_index()
    )
    t = (h.index - h.index.min()).to_numpy(dtype=np.int64)
    return t, h.to_numpy(dtype=np.int64)


def _resid(t, y):
    n = len(t)
    st, stt = int(t.sum()), int((t * t).sum())
    sy, sty = int(y.sum()), int((t * y).sum())
    b = float(n * sty - st * sy) / float(n * stt - st * st)
    a = (sy - b * st) / float(n)
    return y - a - b * t


def test_durbin_watson_brute(spark):
    out = q_durbin_watson(spark, SF).toPandas().iloc[0]
    t, y = _hourly()
    e = _resid(t, y)
    ec = np.round(e).astype(np.int64)
    num = int((np.diff(ec) ** 2).sum())
    den = int((ec**2).sum())
    assert out.n_hours == len(t)
    assert out.num == num
    assert out.den == den
    dw = num / den
    assert abs(out.dw - round(dw, 6)) < 1e-9
    assert abs(out.rho1 - round(1 - dw / 2, 6)) < 1e-9
    assert 0 <= out.dw <= 4


def test_breusch_pagan_brute(spark):
    out = q_breusch_pagan(spark, SF).toPandas().iloc[0]
    t, y = _hourly()
    e = _resid(t, y)
    ek = np.round(e / 1000).astype(np.int64)
    u = ek * ek
    n = len(t)
    st, stt = int(t.sum()), int((t * t).sum())
    su, stu, suu = int(u.sum()), int((t * u).sum()), int((u * u).sum())
    ctu = float(n * stu - st * su)
    ctt = float(n * stt - st * st)
    cuu = float(n * suu - su * su)
    r2 = ctu * ctu / (ctt * cuu)
    bp = n * r2
    assert (out.n_hours, out.su, out.stu) == (n, su, stu)
    assert abs(out.r2_aux - round(r2, 6)) < 1e-9
    assert abs(out.bp_lm - round(bp, 6)) < 1e-9
    assert out.heteroskedastic == int(bp > _BP_CRIT95)
    assert 0 <= out.r2_aux <= 1


def test_fe_within_brute(spark):
    out = q_fe_within(spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet")
    x = e.ts.dt.hour.astype("int64")
    y = (e.value * 100).round().astype("int64")
    df = pd.DataFrame({"u": e.user_id, "x": x, "y": y})
    w_num = w_den = 0.0
    bs = []
    psx = psy = psxy = psxx = 0
    for _, g in df.groupby("u"):
        nu = len(g)
        sx, sy = int(g.x.sum()), int(g.y.sum())
        sxy = int((g.x * g.y).sum())
        sxx = int((g.x * g.x).sum())
        w_num += float(nu * sxy - sx * sy) / nu
        w_den += float(nu * sxx - sx * sx) / nu
        bs.append((sx / nu, sy / nu))
        psx += sx
        psy += sy
        psxy += sxy
        psxx += sxx
    n, nu_users = len(df), df.u.nunique()
    within = w_num / w_den
    pooled = float(n * psxy - psx * psy) / float(n * psxx - psx * psx)
    bx = np.array([p[0] for p in bs])
    by = np.array([p[1] for p in bs])
    between = (
        nu_users * float((bx * by).sum()) - bx.sum() * by.sum()
    ) / (nu_users * float((bx * bx).sum()) - bx.sum() * bx.sum())
    assert (out.n, out.n_users) == (n, nu_users)
    assert abs(out.within_slope - round(within, 6)) < 1e-5
    assert abs(out.pooled_slope - round(pooled, 6)) < 1e-9
    assert abs(out.between_slope - round(between, 6)) < 1e-5
    # the within estimator must differ from pooled when user levels
    # correlate with x — here they are close but not required equal;
    # just sanity-bound the magnitudes (cents per hour-of-day)
    for v in (out.within_slope, out.pooled_slope, out.between_slope):
        assert abs(v) < 1e4
