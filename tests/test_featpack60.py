"""Semantic tests for feature-eng pack #60: hashed cross features,
rank-based inverse-normal transform (Acklam probit), and isotonic
calibration by PAV (brute pandas/scipy-free replicas)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from crawlfe.queries import (
    q_feature_cross,
    q_isotonic_calibration,
    q_rank_int,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _band(v: float) -> str:
    return "low" if v < 10 else ("mid" if v < 100 else "high")


def test_feature_cross_brute(spark):
    out = (
        q_feature_cross(spark, SF)
        .toPandas()
        .set_index(["event_type", "band", "dow"])
    )
    ev = _events()
    ev["band"] = ev["value"].map(_band)
    ev["dow"] = (
        (ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
        + 3
    ) % 7
    ev["pos"] = (ev["event_type"] == "purchase").astype(int)
    g = ev.groupby(["event_type", "band", "dow"]).agg(
        n=("pos", "size"), n_pos=("pos", "sum")
    )
    kept = g[g["n"] >= 5]
    assert len(out) == len(kept)
    for (et, band, dow), row in kept.iterrows():
        o = out.loc[(et, band, dow)]
        assert o["n"] == row["n"]
        want_id = int(
            hashlib.md5(f"{et}|{band}|{dow}".encode()).hexdigest()[:8],
            16,
        )
        assert o["feat_id"] == want_id
        assert abs(o["pos_rate"] - round(row["n_pos"] / row["n"], 6)) < 1e-9


def _acklam_probit(p: float) -> float:
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    if p < 0.02425:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
                * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0)
    if p > 0.97575:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
                 * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
            * r + a[5]) * q / (
        (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4])
         * r + 1.0))


def test_rank_int_brute(spark):
    out = q_rank_int(spark, SF).toPandas().set_index("event_id")
    ev = _events()
    buys = ev[ev.event_type == "purchase"].copy()
    buys["cents"] = buys["value"].mul(100).round().astype("int64")
    buys = buys.sort_values(
        ["cents", "event_id"], ignore_index=True
    )
    n = len(buys)
    assert len(out) == n
    for i, row in buys.iterrows():
        p = (i + 1 - 0.375) / (n + 0.25)
        z = _acklam_probit(p)
        got = out.loc[row["event_id"]]
        assert got["cents"] == row["cents"]
        assert abs(got["p_blom"] - round(p, 6)) < 1e-9
        assert abs(got["z_int"] - round(z, 4)) < 1e-3


def test_rank_int_is_normalish(spark):
    """The transform's whole point: the output is standard-normal
    marginal — mean ~0, symmetric tails — no matter the input skew."""
    out = q_rank_int(spark, SF).toPandas()
    assert abs(out["z_int"].mean()) < 0.05
    assert abs(out["z_int"].max() + out["z_int"].min()) < 0.05


def _brute_pav(grp: pd.DataFrame) -> list[float]:
    grp = grp.sort_values("cents", ignore_index=True)
    pools = [
        [int(w), int(y), 1]
        for w, y in zip(grp["n"], grp["n_pos"])
    ]
    out = []
    merged = []
    for pw, py, cnt in pools:
        merged.append([pw, py, cnt])
        while (
            len(merged) > 1
            and merged[-1][1] * merged[-2][0]
            < merged[-2][1] * merged[-1][0]
        ):
            w2, y2, c2 = merged.pop()
            merged[-1][0] += w2
            merged[-1][1] += y2
            merged[-1][2] += c2
    for pw, py, cnt in merged:
        out.extend([py / pw] * cnt)
    return out


def test_isotonic_calibration_brute(spark):
    out = q_isotonic_calibration(spark, SF).toPandas()
    ev = _events()
    sub = ev[ev.event_type.isin(["purchase", "click"])].copy()
    sub["day"] = sub["ts"].dt.day
    sub["cents"] = sub["value"].mul(100).round().astype("int64")
    sub["pos"] = (sub["event_type"] == "purchase").astype(int)
    base = (
        sub.groupby(["day", "cents"])
        .agg(n=("pos", "size"), n_pos=("pos", "sum"))
        .reset_index()
    )
    for day, grp in base.groupby("day"):
        want = [round(r, 6) for r in _brute_pav(grp)]
        got = (
            out[out["day"] == day]
            .sort_values("cents", ignore_index=True)["rate_cal"]
            .tolist()
        )
        assert got == want
        # monotone non-decreasing in the score — the isotonic contract
        assert all(b >= a - 1e-12 for a, b in zip(got, got[1:]))
