"""Semantic tests for feature-eng pack #20: per-day ROC AUC, PSI
drift, Kish effective sample size, and deterministic equal-frequency
binning (brute python replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_equal_freq_bins,
    q_ess_weights,
    q_psi_drift,
    q_roc_auc,
)

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


def test_roc_auc_matches_rank_statistic(spark):
    """The integer-numerator AUC equals the Mann-Whitney average-rank
    formula (ties get half credit) computed by brute force."""
    out = q_roc_auc(spark, SF).toPandas().set_index("day")
    ev = _events()
    ev = ev[ev.event_type.isin(["purchase", "click"])]
    ev["day"] = ev.ts.dt.day
    checked = 0
    for day, g in ev.groupby("day"):
        pos = g[g.event_type == "purchase"].value.to_numpy()
        neg = g[g.event_type == "click"].value.to_numpy()
        if len(pos) == 0 or len(neg) == 0:
            assert day not in out.index or out.loc[day].isna().auc
            continue
        ranks = pd.Series(np.concatenate([pos, neg])).rank(
            method="average"
        )
        r_pos = float(ranks.iloc[: len(pos)].sum())
        auc = (r_pos - len(pos) * (len(pos) + 1) / 2) / (
            len(pos) * len(neg)
        )
        row = out.loc[day]
        assert int(row.n_pos) == len(pos) and int(row.n_neg) == len(neg)
        assert abs(row.auc - round(auc, 6)) <= 1e-6
        checked += 1
    assert checked >= 5
    # AUC is a probability
    assert ((out.auc >= 0) & (out.auc <= 1)).all()


def test_psi_drift_brute(spark):
    out = q_psi_drift(spark, SF).toPandas()
    ev = _events()
    ev["bucket"] = np.minimum(np.floor(ev.value / 25.0), 19).astype(int)
    ev["half"] = np.where(ev.ts.dt.day <= 15, "e", "a")
    for et, g in ev.groupby("event_type"):
        ce = g[g.half == "e"].groupby("bucket").size()
        ca = g[g.half == "a"].groupby("bucket").size()
        te, ta = ce.sum(), ca.sum()
        sub = out[out.event_type == et].set_index("bucket")
        total = 0.0
        for b, row in sub.iterrows():
            ne, na = int(ce.get(b, 0)), int(ca.get(b, 0))
            assert (row.n_exp, row.n_act) == (ne, na)
            if ne > 0 and na > 0:
                t = (na / ta - ne / te) * math.log((na * te) / (ne * ta))
                assert abs(row.psi_term - round(t, 6)) <= 1e-6
                total += t
            else:
                assert pd.isna(row.psi_term)
        assert (abs(sub.psi_total - round(total, 6)) <= 2e-6).all()


def test_ess_weights_brute(spark):
    out = q_ess_weights(spark, SF).toPandas().set_index("event_type")
    ev = _events()
    for et, g in ev.groupby("event_type"):
        w = g.value.to_numpy(dtype=np.float64)
        ess = w.sum() ** 2 / (w * w).sum()
        row = out.loc[et]
        assert int(row.n) == len(w)
        assert abs(row.ess - round(ess, 4)) <= 1e-3
        assert abs(row.ess_ratio - round(ess / len(w), 6)) <= 1e-5
        # Kish ESS is at most n, positive
        assert 0 < row.ess <= len(w) + 1e-9


def test_equal_freq_bins_deterministic_and_balanced(spark):
    out = q_equal_freq_bins(spark, SF).toPandas()
    ev = _events()
    for et, g in ev.groupby("event_type"):
        counts = g.value.value_counts().sort_index()
        cum = counts.cumsum()
        tot = int(counts.sum())
        bins = ((10 * cum + tot - 1) // tot).astype(int)
        sub = out[out.event_type == et].set_index("bin").sort_index()
        want = (
            pd.DataFrame({"v": counts.index, "c": counts.values,
                          "bin": bins.values})
            .groupby("bin")
            .agg(n=("c", "sum"), lo=("v", "min"), hi=("v", "max"))
        )
        assert list(sub.index) == list(want.index)
        assert (sub.n.astype(int) == want.n).all()
        assert np.allclose(sub.lo, want.lo.round(4))
        assert np.allclose(sub.hi, want.hi.round(4))
        # bins partition the group; roughly equal frequency (each
        # decile within 3x of ideal on this tied, small fixture)
        assert int(sub.n.sum()) == tot
        assert sub.n.max() <= 3 * max(tot // 10, 1)
        # bin ranges are ordered and non-overlapping
        his = sub.hi.to_numpy()
        los = sub.lo.to_numpy()
        assert all(his[i] < los[i + 1] for i in range(len(sub) - 1))
