"""Semantic tests for feature-eng pack #31: Mann-Kendall trend,
L-moments, Wald-Wolfowitz runs test, Hill tail index, day-of-week
ANOVA, and the Fano factor (brute python replicas; cross-engine
parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from crawlfe.queries import (
    _HILL_K,
    q_dow_anova,
    q_fano_factor,
    q_hill_tail,
    q_l_moments,
    q_mann_kendall,
    q_runs_test,
)

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _orders():
    o = pd.read_parquet(f"{SF}/orders.parquet")
    return o.assign(
        x=lambda t: (
            t.o_orderdate.dt.normalize()
            .astype("datetime64[us]")
            .astype("int64")
            // DAY_US
        ),
        y=lambda t: round(t.o_totalprice * 100).astype("int64"),
    )


def test_mann_kendall_brute(spark):
    out = q_mann_kendall(spark, SF).toPandas().set_index("o_custkey")
    seen = 0
    for ck, g in _orders().groupby("o_custkey"):
        g = g.sort_values(["x", "o_orderkey"])
        ys = g.y.tolist()
        n = len(ys)
        s = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(ys)
        tie_corr = sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        var18 = n * (n - 1) * (2 * n + 5) - tie_corr
        if n < 3 or var18 <= 0:
            assert ck not in out.index
            continue
        seen += 1
        row = out.loc[ck]
        assert (row.n, row.s_stat, row.var18) == (n, s, var18)
        zed = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
        z = zed / math.sqrt(var18 / 18.0)
        assert abs(row.mk_z - _r6(z)) < 1e-12
    assert len(out) == seen


def test_l_moments_brute(spark):
    out = q_l_moments(spark, SF).toPandas().set_index("o_custkey")
    seen = 0
    for ck, g in _orders().groupby("o_custkey"):
        ys = sorted(g.y.tolist())
        n = len(ys)
        b0 = sum(ys)
        b1 = sum(i * y for i, y in enumerate(ys))
        b2 = sum(i * (i - 1) * y for i, y in enumerate(ys))
        n2 = 2 * b1 - (n - 1) * b0
        n3 = 6 * b2 - 6 * (n - 2) * b1 + (n - 1) * (n - 2) * b0
        if n < 3 or n2 <= 0:
            assert ck not in out.index
            continue
        seen += 1
        row = out.loc[ck]
        assert row.n == n
        assert abs(row.l1_cents - _r6(b0 / n)) < 1e-12
        assert abs(row.l2_cents - _r6(n2 / (n * (n - 1)))) < 1e-12
        assert abs(row.t3 - _r6(n3 / ((n - 2) * n2))) < 1e-12
        # L-skewness is bounded: |t3| < 1
        assert -1.0 < row.t3 < 1.0
        # sanity: l1 equals the plain mean, l2 equals the exact
        # mean absolute pairwise difference / 2 (Gini mean diff / 2)
        gmd = sum(
            abs(a - b) for i, a in enumerate(ys) for b in ys[i + 1 :]
        ) / (n * (n - 1) / 2)
        assert abs(row.l2_cents - _r6(gmd / 2)) < 2e-6
    assert len(out) == seen


def test_runs_test_brute(spark):
    out = q_runs_test(spark, SF).toPandas().set_index("user_id")
    e = pd.read_parquet(f"{SF}/events.parquet").assign(
        d=lambda x: x.ts.dt.normalize()
    )
    seen = 0
    for uid, g in e.groupby("user_id"):
        per = g.groupby("d").size().sort_index()
        counts = per.tolist()
        # lower median with (count, day) rank order
        nn = len(counts)
        med = sorted(counts)[(nn + 1) // 2 - 1]
        signs = [c > med for c in counts if c != med]
        n1 = sum(signs)
        n2 = len(signs) - n1
        if n1 == 0 or n2 == 0 or n1 + n2 < 3:
            assert uid not in out.index
            continue
        runs = 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b
        )
        seen += 1
        row = out.loc[uid]
        assert (row.n1, row.n2, row.n_runs) == (n1, n2, runs)
        nt = n1 + n2
        e_r = 1.0 + 2.0 * n1 * n2 / nt
        var_r = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - nt)
            / (nt * nt * (nt - 1.0))
        )
        assert abs(row.runs_z - _r6((runs - e_r) / math.sqrt(var_r))) < 1e-12
    assert len(out) == seen


def test_hill_tail_brute(spark):
    out = q_hill_tail(spark, SF).toPandas().set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    seen = 0
    for src, g in docs.groupby("source"):
        xs = (
            g.assign(key=lambda t: list(zip(-t.n_chars, t.doc_id)))
            .sort_values("key")
            .n_chars.tolist()
        )
        if len(xs) < _HILL_K + 1:
            assert src not in out.index
            continue
        thresh = xs[_HILL_K]
        if thresh <= 0:
            assert src not in out.index
            continue
        sum_ppm = sum(
            int(round(1e6 * math.log(float(x) / float(thresh))))
            for x in xs[:_HILL_K]
        )
        if sum_ppm <= 0:
            assert src not in out.index
            continue
        seen += 1
        row = out.loc[src]
        assert (row.k, row.x_thresh) == (_HILL_K, thresh)
        hill = sum_ppm / (_HILL_K * 1e6)
        assert abs(row.hill - _r6(hill)) < 1e-12
        assert abs(row.tail_alpha - _r6(1.0 / hill)) < 1e-12
    assert len(out) == seen


def test_dow_anova_brute(spark):
    out = q_dow_anova(spark, SF).toPandas().set_index("event_type")
    e = pd.read_parquet(f"{SF}/events.parquet").assign(
        d=lambda x: (
            x.ts.dt.normalize()
            .astype("datetime64[us]")
            .astype("int64")
            // DAY_US
        ),
    )
    for et, g in e.groupby("event_type"):
        per = g.groupby("d").size()
        obs = [(int(d) + 3) % 7 for d in per.index]
        cs = per.tolist()
        n = len(cs)
        s = sum(cs)
        s2 = sum(c * c for c in cs)
        grp = {}
        for dow, c in zip(obs, cs):
            sg, ng = grp.get(dow, (0, 0))
            grp[dow] = (sg + c, ng + 1)
        sum_g_ppm = sum(
            int(round(1e6 * (float(sg) * float(sg)) / float(ng)))
            for sg, ng in grp.values()
        )
        grand_ppm = int(round(1e6 * (float(s) * float(s)) / float(n)))
        ssb = sum_g_ppm - grand_ppm
        sst = 1_000_000 * s2 - grand_ppm
        k = len(grp)
        if k < 2 or sst <= ssb or n <= k:
            assert et not in out.index
            continue
        row = out.loc[et]
        assert (row.n_days, row.k_dows) == (n, k)
        assert abs(row.eta2 - _r6(ssb / sst)) < 1e-12
        f = (ssb / (k - 1)) / ((sst - ssb) / (n - k))
        assert abs(row.f_stat - _r6(f)) < 1e-12
        assert 0.0 <= row.eta2 <= 1.0
        # cross-check eta2 against the float sum-of-squares identity
        mean = s / n
        sst_f = sum((c - mean) ** 2 for c in cs)
        gm = {dw: sg / ng for dw, (sg, ng) in grp.items()}
        ssb_f = sum(
            ng * (gm[dw] - mean) ** 2 for dw, (sg, ng) in grp.items()
        )
        assert abs(row.eta2 - ssb_f / sst_f) < 1e-4


def test_fano_factor_brute(spark):
    out = q_fano_factor(spark, SF).toPandas().set_index("event_type")
    e = pd.read_parquet(f"{SF}/events.parquet").assign(
        d=lambda x: x.ts.dt.normalize()
    )
    for et, g in e.groupby("event_type"):
        cs = g.groupby("d").size().tolist()
        n = len(cs)
        if n < 2:
            assert et not in out.index
            continue
        s = sum(cs)
        s2 = sum(c * c for c in cs)
        row = out.loc[et]
        assert (row.n_days, row.s) == (n, s)
        assert abs(row.mean_daily - _r6(s / n)) < 1e-12
        fano = (n * s2 - s * s) / ((n - 1) * s)
        assert abs(row.fano - _r6(fano)) < 1e-12
        # cross-check against pandas sample var / mean
        ser = pd.Series(cs, dtype="float64")
        assert abs(row.fano - ser.var(ddof=1) / ser.mean()) < 1e-5
    assert len(out) == e.event_type.nunique()
