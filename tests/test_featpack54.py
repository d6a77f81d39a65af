"""Semantic tests for feature-eng pack #54: MCC at the median
threshold, temporal ECE, cost-optimal threshold, fairness gaps,
precision@k, gains AUC (brute python replicas; cross-engine parity
is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_cost_threshold,
    q_ece_score,
    q_fairness_gaps,
    q_gains_auc,
    q_mcc_score,
    q_prec_at_k,
)

SF = "/root/testdata/sf0.001"


def _pc():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e = e[e.event_type.isin(["purchase", "click"])]
    return e.assign(
        cents=lambda x: round(x.value * 100).astype("int64"),
        day=lambda x: x.ts.dt.day,
        pos=lambda x: (x.event_type == "purchase").astype(int),
    )


def _med2(cents):
    v = np.sort(cents)
    n = len(v)
    return int(v[(n + 1) // 2 - 1]) + int(v[n // 2])


def test_mcc_brute(spark):
    out = q_mcc_score(spark, SF).toPandas().iloc[0]
    e = _pc()
    med2 = _med2(e.cents.values)
    pred = (2 * e.cents > med2).astype(int)
    tp = int(((pred == 1) & (e.pos == 1)).sum())
    fp = int(((pred == 1) & (e.pos == 0)).sum())
    tn = int(((pred == 0) & (e.pos == 0)).sum())
    fn = int(((pred == 0) & (e.pos == 1)).sum())
    mcc = (tp * tn - fp * fn) / (
        math.sqrt(tp + fp) * math.sqrt(tp + fn)
        * math.sqrt(tn + fp) * math.sqrt(tn + fn)
    )
    tpr, tnr = tp / (tp + fn), tn / (tn + fp)
    assert (out.tp, out.fp, out.tn, out.fn) == (tp, fp, tn, fn)
    assert abs(out.mcc - mcc) < 2e-6
    assert abs(out.balanced_acc - (tpr + tnr) / 2) < 2e-6
    assert abs(out.youden_j - (tpr + tnr - 1)) < 2e-6
    assert -1.0 <= out.mcc <= 1.0


def test_ece_brute(spark):
    out = q_ece_score(spark, SF).toPandas().set_index("bin")
    e = _pc()
    w1 = e[e.day <= 7]
    v = np.sort(w1.cents.values)
    n = len(v)
    edges = [int(v[(d * n + 9) // 10 - 1]) for d in range(1, 10)]

    def to_bin(c):
        return 1 + sum(1 for x in edges if c > x)

    test = e[e.day >= 15]
    tr = w1.assign(bin=w1.cents.map(to_bin))
    te = test.assign(bin=test.cents.map(to_bin))
    trg = tr.groupby("bin").agg(n_train=("pos", "size"),
                                p=("pos", "sum"))
    teg = te.groupby("bin").agg(n_test=("pos", "size"),
                                p=("pos", "sum"))
    j = trg.join(teg, lsuffix="_tr", rsuffix="_te", how="inner")
    nt = j.n_test.sum()
    ece = (
        j.n_test / nt
        * (j.p_tr / j.n_train - j.p_te / j.n_test).abs()
    ).sum()
    for b, row in j.iterrows():
        r = out.loc[b]
        assert r.n_train == row.n_train and r.n_test == row.n_test
        assert abs(r.pred_rate - row.p_tr / row.n_train) < 2e-6
        assert abs(r.obs_rate - row.p_te / row.n_test) < 2e-6
        assert abs(r.ece - ece) < 2e-6
    assert 0.0 <= out.ece.iloc[0] <= 1.0


def test_cost_threshold_brute(spark):
    out = q_cost_threshold(spark, SF).toPandas().iloc[0]
    e = _pc()
    thresholds = np.sort(e.cents.unique())
    best = None
    for t in thresholds:
        fn = int(((e.cents <= t) & (e.pos == 1)).sum())
        fp = int(((e.cents > t) & (e.pos == 0)).sum())
        cost = 5 * fn + fp
        if best is None or cost < best[0]:
            best = (cost, t, fn, fp)
    cost, t, fn, fp = best
    assert out.min_cost == cost
    assert out.threshold_value == t / 100.0
    assert out.fn == fn and out.fp == fp
    # the swept optimum can never beat the degenerate policies
    assert cost <= out.cost_flag_none and cost <= out.cost_flag_all


def test_fairness_gaps_brute(spark):
    out = q_fairness_gaps(spark, SF).toPandas().set_index("cohort")
    e = _pc()
    med2 = _med2(e.cents.values)
    e = e.assign(pred=(2 * e.cents > med2).astype(int),
                 cohort=e.user_id % 4)
    tprs, fprs = {}, {}
    for c, g in e.groupby("cohort"):
        tp = int(((g.pred == 1) & (g.pos == 1)).sum())
        fp = int(((g.pred == 1) & (g.pos == 0)).sum())
        npos, nneg = int(g.pos.sum()), int((1 - g.pos).sum())
        tprs[c], fprs[c] = tp / npos, fp / nneg
        r = out.loc[c]
        assert r.npos == npos and r.nneg == nneg
        assert abs(r.tpr - tprs[c]) < 2e-6
        assert abs(r.fpr - fprs[c]) < 2e-6
    tg = max(tprs.values()) - min(tprs.values())
    fg = max(fprs.values()) - min(fprs.values())
    assert abs(out.tpr_gap.iloc[0] - tg) < 2e-6
    assert abs(out.fpr_gap.iloc[0] - fg) < 2e-6


def test_prec_at_k_brute(spark):
    out = q_prec_at_k(spark, SF).toPandas().set_index("k")
    e = _pc().sort_values(
        ["cents", "event_id"], ascending=[False, True]
    )
    tot = int(e.pos.sum())
    for k in (100, 500, 1000):
        top = e.head(k)
        hits = int(top.pos.sum())
        r = out.loc[k]
        assert r.n_flagged == min(k, len(e))
        assert r.n_hits == hits
        assert abs(r.precision_at_k - hits / min(k, len(e))) < 2e-6
        assert abs(r.recall_at_k - hits / tot) < 2e-6
    # recall is monotone in k
    rec = out.sort_index().recall_at_k.values
    assert (np.diff(rec) >= -1e-9).all()


def test_gains_auc_brute(spark):
    out = q_gains_auc(spark, SF).toPandas().iloc[0]
    e = _pc().sort_values(
        ["cents", "event_id"], ascending=[False, True]
    )
    cum = e.pos.cumsum().values
    n, tot = len(e), int(e.pos.sum())
    auc = cum.sum() / (n * tot)
    assert out.n == n and out.tot_pos == tot
    assert abs(out.gains_auc - auc) < 2e-6
    # a ranking with any signal beats random's 0.5 here
    assert 0.4 <= out.gains_auc <= 1.0
