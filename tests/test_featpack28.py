"""Semantic tests for feature-eng pack #28: peak hourly rate, exact
chi-square hour-of-day uniformity, RFM scores, Zipf two-point slope,
order-gap CV, and per-brand repeat rate (brute python replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from crawlfe.queries import (
    _RFM_Q,
    _ZIPF_K,
    q_hourly_uniformity,
    q_order_gap_cv,
    q_peak_rate,
    q_repeat_rate,
    q_rfm_scores,
    q_zipf_two_point,
)

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


def test_peak_rate_brute(spark):
    out = q_peak_rate(spark, SF).toPandas().set_index("user_id")
    ev = _events().assign(bucket=lambda d: d.ts.dt.floor("h"))
    for uid, g in ev.groupby("user_id"):
        per = g.groupby("bucket").size().sort_index()
        peak_cnt = int(per.max())
        peak_bucket = per[per == peak_cnt].index.min()
        row = out.loc[uid]
        assert row.peak_bucket == peak_bucket
        assert (row.peak_cnt, row.n_events, row.n_buckets) == (
            peak_cnt,
            len(g),
            len(per),
        )
        assert abs(
            row.peak_share - round(peak_cnt / len(g), 6)
        ) < 1e-12
    assert len(out) == ev.user_id.nunique()


def test_hourly_uniformity_brute(spark):
    out = (
        q_hourly_uniformity(spark, SF).toPandas().set_index("event_type")
    )
    ev = _events().assign(h=lambda d: d.ts.dt.hour)
    for et, g in ev.groupby("event_type"):
        o = g.groupby("h").size()
        n = len(g)
        ss = int(sum((24 * int(c) - n) ** 2 for c in o))
        ss += (24 - len(o)) * n * n
        row = out.loc[et]
        assert (row.n, row.h_obs) == (n, len(o))
        assert abs(row.chi2_stat - round(ss / (24 * n), 6)) < 1e-12
        # identical to the textbook chi2 against E = n/24
        e = n / 24
        chi2 = sum(
            (int(o.get(h, 0)) - e) ** 2 / e for h in range(24)
        )
        assert abs(row.chi2_stat - chi2) < 1e-5


def _ntile(keys: list, q: int) -> dict:
    """SQL-standard ntile: first (n mod q) buckets get one extra."""
    n = len(keys)
    base, extra = divmod(n, q)
    score, idx = {}, 0
    for b in range(1, q + 1):
        size = base + (1 if b <= extra else 0)
        for k in keys[idx : idx + size]:
            score[k] = b
        idx += size
    return score


def test_rfm_scores_brute(spark):
    out = q_rfm_scores(spark, SF).toPandas().set_index("o_custkey")
    od = _orders()
    per = od.groupby("o_custkey").agg(
        last_d=("o_orderdate", "max"),
        f_cnt=("o_orderkey", "size"),
    )
    per["m_cents"] = od.assign(
        c=lambda d: (d.o_totalprice * 100).round().astype("int64")
    ).groupby("o_custkey").c.sum()
    max_d = per.last_d.max()
    per["r_days"] = (max_d - per.last_d).dt.days
    r_rank = sorted(per.index, key=lambda k: (per.r_days[k], k))
    f_rank = sorted(per.index, key=lambda k: (-per.f_cnt[k], k))
    m_rank = sorted(per.index, key=lambda k: (-per.m_cents[k], k))
    rs, fs, ms = (
        _ntile(r_rank, _RFM_Q),
        _ntile(f_rank, _RFM_Q),
        _ntile(m_rank, _RFM_Q),
    )
    for ck, p in per.iterrows():
        row = out.loc[ck]
        assert (row.r_days, row.f_cnt, row.m_cents) == (
            p.r_days,
            p.f_cnt,
            p.m_cents,
        )
        assert (row.r_score, row.f_score, row.m_score) == (
            rs[ck],
            fs[ck],
            ms[ck],
        )
        assert row.rfm == f"{rs[ck]}-{fs[ck]}-{ms[ck]}"
    assert len(out) == len(per)


def test_global_row_number_matches_single_window(spark):
    """The scalable exact rank (range repartition + prefix offsets)
    behind rfm_scores must equal the naive single-partition
    row_number on a total order, including with heavy ties."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawlfe.windows import global_row_number

    df = spark.range(0, 5000).withColumn("k", (F.col("id") * 37) % 7)
    order = [F.col("k").desc(), F.col("id").asc()]
    got = global_row_number(df, order, "rk")
    want = df.withColumn(
        "rk2", F.row_number().over(Window.orderBy(*order))
    )
    j = got.join(want, "id")
    assert j.count() == 5000
    assert j.where(F.col("rk") != F.col("rk2")).count() == 0


def test_rfm_plan_has_no_global_customer_window(spark):
    """The rfm plan must range-partition for ranking, not funnel all
    customers through one WindowExec (the offsets windows run over
    O(shuffle partitions) rows and are fine)."""
    plan = q_rfm_scores(
        spark, SF
    )._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "ntile" not in plan.lower()


def test_zipf_two_point_brute(spark):
    out = q_zipf_two_point(spark, SF).toPandas().set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for src, g in docs.groupby("source"):
        tf = Counter(t for txt in g.text for t in txt.strip().split())
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
        if len(ranked) < _ZIPF_K:
            assert src not in out.index
            continue
        f1, fk = ranked[0][1], ranked[_ZIPF_K - 1][1]
        row = out.loc[src]
        assert (row.f1, row.fk) == (f1, fk)
        slope = math.log(f1 / fk) / math.log(_ZIPF_K)
        assert abs(row.zipf_slope - round(slope, 6)) < 1e-12
        assert row.zipf_slope >= 0.0


def test_order_gap_cv_brute(spark):
    out = q_order_gap_cv(spark, SF).toPandas().set_index("o_custkey")
    od = _orders().assign(d=lambda x: x.o_orderdate.dt.normalize())
    n_expected = 0
    for ck, g in od.groupby("o_custkey"):
        g = g.sort_values(["d", "o_orderkey"])
        gaps = g.d.diff().dt.days.dropna().astype(int).tolist()
        s, s2 = sum(gaps), sum(x * x for x in gaps)
        if len(gaps) < 2 or s == 0:
            assert ck not in out.index
            continue
        n_expected += 1
        row = out.loc[ck]
        assert (row.n_gaps, row.s, row.s2) == (len(gaps), s, s2)
        cv = math.sqrt(len(gaps) * s2 - s * s) / s
        assert abs(row.gap_cv - round(cv, 6)) < 1e-12
    assert len(out) == n_expected


def test_repeat_rate_brute(spark):
    out = q_repeat_rate(spark, SF).toPandas().set_index("p_brand")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = _orders()[["o_orderkey", "o_custkey"]]
    pt = pd.read_parquet(f"{SF}/part.parquet")[["p_partkey", "p_brand"]]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey").merge(
        pt, left_on="l_partkey", right_on="p_partkey"
    )
    per = j.groupby(["p_brand", "o_custkey"]).o_orderkey.nunique()
    for brand, g in per.groupby(level=0):
        n_cust = len(g)
        n_repeat = int((g >= 2).sum())
        row = out.loc[brand]
        assert (row.n_cust, row.n_repeat) == (n_cust, n_repeat)
        assert abs(
            row.repeat_rate - round(n_repeat / n_cust, 6)
        ) < 1e-12
    assert len(out) == per.index.get_level_values(0).nunique()
