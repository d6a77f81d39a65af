"""Semantic tests for feature-eng pack #30: lag-1 autocorrelation,
Cramér's V, activity drawdown, session max-concurrency (via the new
windows.global_prefix_sum), Theil-Sen slope, and day-of-week seasonal
profile (brute python replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from crawlfe.queries import (
    SESSION_GAP_S,
    q_activity_drawdown,
    q_autocorr_lag1,
    q_cramers_v,
    q_dow_seasonal,
    q_max_concurrency,
    q_theil_sen,
)

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _r6(x: float) -> float:
    """round(x, 6) with HALF_UP ties — Spark's and DuckDB's rule."""
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _daily_counts():
    e = _events().assign(d=lambda x: x.ts.dt.normalize())
    return {
        uid: g.groupby("d").size().sort_index()
        for uid, g in e.groupby("user_id")
    }


def test_autocorr_lag1_brute(spark):
    out = q_autocorr_lag1(spark, SF).toPandas().set_index("user_id")
    seen = 0
    for uid, per in _daily_counts().items():
        days = {int(d.timestamp() // 86400): int(c) for d, c in per.items()}
        pairs = [
            (c, days[d + 1]) for d, c in days.items() if d + 1 in days
        ]
        n = len(pairs)
        if n < 2:
            assert uid not in out.index
            continue
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        denx, deny = n * sxx - sx * sx, n * syy - sy * sy
        if denx <= 0 or deny <= 0:
            assert uid not in out.index
            continue
        seen += 1
        row = out.loc[uid]
        assert row.n == n
        r = (n * sxy - sx * sy) / math.sqrt(float(denx) * float(deny))
        assert abs(row.acf1 - _r6(r)) < 1e-12
        assert -1.0 - 1e-9 <= row.acf1 <= 1.0 + 1e-9
    assert len(out) == seen


def test_cramers_v_brute(spark):
    out = q_cramers_v(spark, SF).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet")
    cell = Counter(zip(d.lang, d.source))
    r = Counter(d.lang)
    c = Counter(d.source)
    n = len(d)
    chi2_ppm = -1_000_000 * n
    for (lg, src), o in cell.items():
        chi2_ppm += int(
            round(
                1e6
                * (float(n) * float(o) * float(o))
                / (float(r[lg]) * float(c[src]))
            )
        )
    chi2 = chi2_ppm / 1e6
    assert (row.n_docs, row.n_langs, row.n_sources) == (
        n,
        len(r),
        len(c),
    )
    assert abs(row.chi2 - _r6(chi2)) < 1e-12
    v = math.sqrt(chi2 / (n * min(len(r) - 1, len(c) - 1)))
    assert abs(row.cramers_v - _r6(v)) < 1e-12
    assert 0.0 <= row.cramers_v <= 1.0
    # sanity vs the textbook per-cell float chi2 (incl. zero cells,
    # whose (0 - e)^2/e mass the identity formula carries implicitly)
    chi2_txt = sum(
        (cell.get((lg, src), 0) - r[lg] * c[src] / n) ** 2
        / (r[lg] * c[src] / n)
        for lg in r
        for src in c
    )
    assert abs(chi2 - chi2_txt) < 1e-3 * max(1.0, chi2_txt)


def test_activity_drawdown_brute(spark):
    out = (
        q_activity_drawdown(spark, SF).toPandas().set_index("user_id")
    )
    daily = _daily_counts()
    for uid, per in daily.items():
        counts = per.tolist()
        runmax, mdd = 0, 0
        for cnt in counts:
            runmax = max(runmax, cnt)
            mdd = max(mdd, runmax - cnt)
        row = out.loc[uid]
        assert row.n_days == len(counts)
        assert row.peak_cnt == max(counts)
        assert row.max_drawdown == mdd
        assert abs(
            row.drawdown_ratio - _r6(mdd / max(counts))
        ) < 1e-12
    assert len(out) == len(daily)


def _sessions(gap_s: int):
    """(start_us, end_us, user_id, session_id) per gap-session."""
    e = _events().sort_values(["user_id", "ts", "event_id"])
    out = []
    for uid, g in e.groupby("user_id"):
        us = g.ts.astype("datetime64[us]").astype("int64").tolist()
        start, last, sid = us[0], us[0], 0
        for t in us[1:]:
            if t - last > gap_s * 1_000_000:
                out.append((start, last, uid, sid))
                sid += 1
                start = t
            last = t
        out.append((start, last, uid, sid))
    return out


def test_max_concurrency_brute(spark):
    out = (
        q_max_concurrency(spark, SF)
        .toPandas()
        .set_index("epoch_day")
        .sort_index()
    )
    bounds = _sessions(SESSION_GAP_S)
    bd = [(s, 1, u, sid) for s, e, u, sid in bounds] + [
        (e, -1, u, sid) for s, e, u, sid in bounds
    ]
    # total order: ts, starts before ends, then user/session
    bd.sort(key=lambda t: (t[0], -t[1], t[2], t[3]))
    conc, per_day_max, per_day_n = 0, {}, Counter()
    for us, delta, _, _ in bd:
        conc += delta
        day = us // DAY_US
        per_day_n[day] += 1
        per_day_max[day] = max(per_day_max.get(day, -(10**9)), conc)
    assert set(out.index) == set(per_day_max)
    for day in per_day_max:
        row = out.loc[day]
        assert row.max_concurrent == per_day_max[day]
        assert row.n_boundaries == per_day_n[day]
    # concurrency must return to zero after the last boundary
    assert conc == 0


def test_max_concurrency_plan_no_global_window(spark):
    """The global running concurrency must come from the range-
    partitioned prefix-sum, not a single-partition whole-table
    window (the offsets window over O(partitions) rows is fine)."""
    plan = (
        q_max_concurrency(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()


def test_global_prefix_sum_matches_single_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawlfe.windows import global_prefix_sum

    df = (
        spark.range(0, 5000)
        .withColumn("k", (F.col("id") * 37) % 7)
        .withColumn("v", (F.col("id") % 11) - 5)
    )
    order = [F.col("k").desc(), F.col("id").asc()]
    got = global_prefix_sum(df, order, "v", "rs")
    want = df.withColumn(
        "rs2",
        F.sum("v").over(
            Window.orderBy(*order).rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    j = got.join(want, "id")
    assert j.count() == 5000
    assert j.where(F.col("rs") != F.col("rs2")).count() == 0


def test_theil_sen_brute(spark):
    out = q_theil_sen(spark, SF).toPandas().set_index("o_custkey")
    o = pd.read_parquet(f"{SF}/orders.parquet").assign(
        x=lambda t: (
            t.o_orderdate.dt.normalize()
            .astype("datetime64[us]")
            .astype("int64")
            // DAY_US
        ),
        y=lambda t: round(t.o_totalprice * 100).astype("int64"),
    )
    seen = 0
    for ck, g in o.groupby("o_custkey"):
        pts = list(zip(g.x.astype(int), g.y.astype(int)))
        slopes = sorted(
            (b[1] - a[1]) / (b[0] - a[0])
            for a in pts
            for b in pts
            if a[0] < b[0]
        )
        if not slopes:
            assert ck not in out.index
            continue
        seen += 1
        k = (len(slopes) + 1) // 2
        row = out.loc[ck]
        assert row.n_orders == len(g)
        assert row.n_slopes == len(slopes)
        assert abs(row.ts_slope - _r6(slopes[k - 1])) < 1e-12
    assert len(out) == seen


def test_dow_seasonal_brute(spark):
    out = q_dow_seasonal(spark, SF).toPandas()
    e = _events().assign(dow=lambda x: x.ts.dt.dayofweek)
    got = {
        (r.event_type, r.dow): (r.cnt, r.share, r.dow_index)
        for r in out.itertuples()
    }
    for et, g in e.groupby("event_type"):
        total = len(g)
        per = Counter(g.dow)
        for dow, cnt in per.items():
            cnt_g, share, idx = got[(et, dow)]
            assert cnt_g == cnt
            assert abs(share - _r6(cnt / total)) < 1e-12
            assert abs(idx - _r6(7 * cnt / total)) < 1e-12
        # shares sum to 1 across the type's observed weekdays
        s = sum(v[1] for k, v in got.items() if k[0] == et)
        assert abs(s - 1.0) < 5e-6
    assert len(out) == sum(
        len(Counter(g.dow)) for _, g in e.groupby("event_type")
    )
