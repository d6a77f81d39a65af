"""Semantic tests for feature-eng pack #57: point-in-time pipeline
diagnostics (brute pandas replicas; cross-engine parity is proven by
the check_entry sweeps)."""

from __future__ import annotations

import pandas as pd

from crawlfe.queries import (
    q_asof_staleness,
    q_crawl_coverage,
    q_leakage_audit,
    q_snapshot_churn,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_asof_staleness_brute(spark):
    out = q_asof_staleness(spark, SF).toPandas().set_index("user_id")
    ev = _events()
    clicks = ev[ev.event_type == "click"]
    buys = ev[ev.event_type == "purchase"]
    for uid, grp in clicks.groupby("user_id"):
        ub = buys[buys.user_id == uid].sort_values("ts")
        stales = []
        n_matched = 0
        for t in grp["ts"]:
            prior = ub[ub.ts <= t]
            if len(prior):
                n_matched += 1
                stales.append(
                    int(
                        (t - prior["ts"].iloc[-1]).value // 1000
                    ) // 1_000_000
                )
        row = out.loc[uid]
        assert row["n_probes"] == len(grp)
        assert row["n_matched"] == n_matched
        if stales:
            assert row["min_stale_s"] == min(stales)
            assert row["max_stale_s"] == max(stales)
            assert row["sum_stale_s"] == sum(stales)
        else:
            assert pd.isna(row["min_stale_s"])


def test_leakage_audit_zero_leaks(spark):
    out = q_leakage_audit(spark, SF).toPandas()
    # the audit column: the merge-scan can NEVER match a future row
    assert (out["n_leaks"] == 0).all()
    # ...but the denominator is live: a leaky join COULD have seen
    # future purchases for at least one user in the fixture
    assert out["n_future_1h"].sum() > 0
    ev = _events()
    clicks = ev[ev.event_type == "click"]
    buys = ev[ev.event_type == "purchase"]
    m = clicks.merge(buys[["user_id", "ts"]], on="user_id",
                     suffixes=("", "_b"))
    fut = m[
        (m.ts_b > m.ts)
        & ((m.ts_b - m.ts) <= pd.Timedelta(hours=1))
    ].groupby("user_id").size()
    got = out.set_index("user_id")["n_future_1h"]
    for uid, n in fut.items():
        assert got[uid] == n


def test_crawl_coverage_brute(spark):
    out = q_crawl_coverage(spark, SF).toPandas().set_index("user_id")
    ev = _events()
    ev["d"] = ev["ts"].dt.normalize()
    for uid, grp in ev.groupby("user_id"):
        days = sorted(grp["d"].unique())
        span = (days[-1] - days[0]).days + 1
        gaps = [
            (b - a).days for a, b in zip(days, days[1:])
        ] or [1]
        row = out.loc[uid]
        assert row["n_active_days"] == len(days)
        assert row["span_days"] == span
        assert row["coverage_ppm"] == len(days) * 1_000_000 // span
        assert row["longest_gap_days"] == max(gaps)


def test_snapshot_churn_brute(spark):
    out = q_snapshot_churn(spark, SF).toPandas().set_index("user_id")
    ev = _events()
    views = ev[ev.event_type == "view"].sort_values(["ts", "event_id"])
    for uid, grp in views.groupby("user_id"):
        c = (grp["value"] * 100).round().astype("int64").to_numpy()
        if len(c) < 2:
            assert uid not in out.index
            continue
        diffs = c[1:] - c[:-1]
        row = out.loc[uid]
        assert row["n_pairs"] == len(diffs)
        assert row["n_changed"] == int((diffs != 0).sum())
        assert row["churn_rate"] == round(
            float((diffs != 0).sum()) / len(diffs), 6
        )
        assert row["mean_abs_delta_cents"] == round(
            float(abs(diffs).sum()) / len(diffs), 4
        )
