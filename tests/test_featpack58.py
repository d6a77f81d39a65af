"""Semantic tests for feature-eng pack #58: KMV distinct sketches
(exact error accounting + mergeability), fold-periodogram top periods,
and dow-adjusted anomaly days (brute pandas replicas; cross-engine
parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from crawlfe.queries import (
    _FOLD_PMAX,
    _KMV_DOM,
    _KMV_K,
    q_fold_period_strength,
    q_kmv_distinct,
    q_kmv_union_merge,
    q_seasonal_anomaly_days,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _h60(s: str) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def _kmv_estimate(hashes: set[int]) -> float:
    if len(hashes) < _KMV_K:
        return float(len(hashes))
    kth = sorted(hashes)[_KMV_K - 1]
    return (_KMV_K - 1) * _KMV_DOM / kth


def test_kmv_distinct_brute(spark):
    out = q_kmv_distinct(spark, SF).toPandas().set_index("event_type")
    ev = _events()
    for et, grp in ev.groupby("event_type"):
        users = set(grp["user_id"])
        hashes = {_h60(u) for u in users}
        row = out.loc[et]
        assert row["n_exact"] == len(users)
        est = _kmv_estimate(hashes)
        assert abs(row["kmv_est"] - round(est, 4)) < 1e-9
        if len(hashes) >= _KMV_K:
            assert row["kth_h"] == sorted(hashes)[_KMV_K - 1]
            # a k=32 KMV is a coarse sketch: just sanity-bound the error
            assert abs(row["rel_err"]) < 1.0


def test_kmv_union_merge_is_union_stable(spark):
    out = q_kmv_union_merge(spark, SF).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    ev = _events()
    a = set(ev.loc[ev.event_type == "click", "user_id"])
    b = set(ev.loc[ev.event_type == "purchase", "user_id"])
    ha = {_h60(u) for u in a}
    hb = {_h60(u) for u in b}
    assert row["exact_union"] == len(a | b)
    assert abs(row["est_click"] - round(_kmv_estimate(ha), 4)) < 1e-9
    assert abs(row["est_purchase"] - round(_kmv_estimate(hb), 4)) < 1e-9
    # min-wise stability: merging the two K-smallest sets gives the
    # SAME estimate as sketching the raw union directly
    merged = set(sorted(ha)[:_KMV_K]) | set(sorted(hb)[:_KMV_K])
    direct = {_h60(u) for u in (a | b)}
    assert _kmv_estimate(merged) == _kmv_estimate(direct)
    assert abs(row["est_union"] - round(_kmv_estimate(direct), 4)) < 1e-9


def test_fold_period_strength_brute(spark):
    out = q_fold_period_strength(spark, SF).toPandas().set_index("p")
    ev = _events()
    d = (ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    daily = d.value_counts().sort_index()
    c = daily.to_numpy(dtype=float)
    days = daily.index.to_numpy()
    n = len(c)
    ss = float((c * c).sum())
    s = float(c.sum())
    denom = ss - s * s / n
    for p in range(2, _FOLD_PMAX + 1):
        g = days % p
        a = sum(
            c[g == gi].sum() ** 2 / (g == gi).sum()
            for gi in sorted(set(g))
        )
        r2 = (a - s * s / n) / denom
        assert 0 <= out.loc[p, "r2"] <= 1
        assert abs(out.loc[p, "r2"] - round(r2, 6)) < 1e-6
        assert out.loc[p, "n_days"] == n


def test_fold_period_multiples_dominate(spark):
    """A genuinely weekly series spikes at p=7: sanity-check the
    detector's ordering makes sense on the fixture (no hard claim on
    which period wins — just that r2 is a valid variance share)."""
    out = q_fold_period_strength(spark, SF).toPandas()
    assert (out["r2"] >= 0).all() and (out["r2"] <= 1).all()
    assert (out["n_folds"] == out["p"]).all()


def test_seasonal_anomaly_days_brute(spark):
    out = q_seasonal_anomaly_days(spark, SF).toPandas().set_index("d")
    ev = _events()
    d = (ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    daily = d.value_counts().sort_index()
    dow = (daily.index + 3) % 7
    prof = daily.groupby(dow).mean()
    resid = daily - dow.map(prof.to_dict()).to_numpy()
    sigma = math.sqrt((resid**2).mean() - resid.mean() ** 2)
    for day, cnt in daily.items():
        row = out.loc[day]
        assert row["c"] == cnt
        assert row["dow"] == (day + 3) % 7
        z = (cnt - prof[(day + 3) % 7]) / sigma
        assert abs(row["z"] - round(z, 4)) < 1e-3
        assert row["is_anomaly"] == (abs(z) >= 2)


def test_kmv_scale_shapes(spark):
    """Plan pins: the grouped sketch builds through WindowGroupLimit
    (map-side partial top-K per group) and the global sketch through
    TakeOrderedAndProject — never a single-partition global window."""
    p1 = (
        q_kmv_distinct(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in p1, p1
    p2 = (
        q_kmv_union_merge(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in p2, p2
    assert "Window" not in p2.replace("WindowGroupLimit", ""), p2
