"""Semantic tests for feature-eng pack #77: Gini decision stump,
fixed-point multinomial Naive Bayes, Aalen-Johansen competing-risks
CIF (brute python replicas; cross-engine parity is proven by the
check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _NB_TRAIN_DAY_MAX,
    q_competing_risks_cif,
    q_decision_stump,
    q_naive_bayes,
)

SF = "/root/testdata/sf0.001"


def _events():
    e = pd.read_parquet(f"{SF}/events.parquet")
    return e.assign(
        cents=round(e.value * 100).astype("int64"),
        day=e.ts.dt.day,
    )


def test_decision_stump_brute(spark):
    out = q_decision_stump(spark, SF).toPandas().iloc[0]
    e = _events().assign(
        bin=lambda x: np.minimum(19, x.cents // 1000),
        pos=lambda x: (x.event_type == "purchase").astype(int),
    )
    g = e.groupby("bin").agg(n=("pos", "size"), p=("pos", "sum"))
    nn, pp = g.n.sum(), g.p.sum()
    best = None
    nl = pl = 0
    for b in sorted(g.index):
        nl += g.loc[b, "n"]
        pl += g.loc[b, "p"]
        nr, pr = nn - nl, pp - pl
        if nr == 0:
            continue
        gini_l = 1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
        gini_r = 1 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
        gini = nl / nn * gini_l + nr / nn * gini_r
        if best is None or gini < best[0] - 1e-15:
            best = (gini, b, nl, pl, nr, pr)
    gini, b, nl, pl, nr, pr = best
    assert out.split_bin == b
    assert (out.n_left, out.pos_left) == (nl, pl)
    assert (out.n_right, out.pos_right) == (nr, pr)
    assert abs(out.gini - round(gini, 6)) < 1e-9
    acc = (max(pl, nl - pl) + max(pr, nr - pr)) / nn
    assert abs(out.stump_acc - round(acc, 6)) < 1e-9
    # a stump can never beat perfect purity nor lose to the prior
    assert out.stump_acc >= max(pp, nn - pp) / nn - 1e-12


def test_naive_bayes_brute(spark):
    out = q_naive_bayes(spark, SF).toPandas().set_index("event_type")
    e = _events().assign(
        dow=lambda x: (x.ts.dt.dayofweek + 1) % 7 + 1,
        bin=lambda x: np.minimum(4, x.cents // 2500),
    )
    train = e[e.day <= _NB_TRAIN_DAY_MAX]
    test = e[e.day > _NB_TRAIN_DAY_MAX]
    classes = sorted(train.event_type.unique())
    nc = train.event_type.value_counts()
    nt, kc = len(train), len(classes)
    dow_lv = sorted(train.dow.unique())
    bin_lv = sorted(train.bin.unique())

    def lp_e4(x):
        return round(math.log(x) * 10000)

    lp_prior = {c: lp_e4((nc[c] + 1) / (nt + kc)) for c in classes}
    lp_dow = {
        (c, v): lp_e4(
            (
                len(train[(train.event_type == c) & (train.dow == v)])
                + 1
            )
            / (nc[c] + 7)
        )
        for c in classes
        for v in dow_lv
    }
    lp_bin = {
        (c, v): lp_e4(
            (
                len(train[(train.event_type == c) & (train.bin == v)])
                + 1
            )
            / (nc[c] + 5)
        )
        for c in classes
        for v in bin_lv
    }
    hits = {}
    ntest = {}
    for _, r in test.iterrows():
        scores = {
            c: lp_prior[c]
            + lp_dow[(c, r.dow)]
            + lp_bin[(c, r.bin)]
            for c in classes
        }
        # deterministic tie rule: score desc, class asc
        best = max(scores.values())
        pred = sorted([c for c in classes if scores[c] == best])[0]
        ntest[r.event_type] = ntest.get(r.event_type, 0) + 1
        if pred == r.event_type:
            hits[r.event_type] = hits.get(r.event_type, 0) + 1
    for c in ntest:
        row = out.loc[c]
        assert row.n_test == ntest[c]
        assert row.hits == hits.get(c, 0)
        assert abs(
            row.accuracy - round(hits.get(c, 0) / ntest[c], 6)
        ) < 1e-9


def test_competing_risks_cif_brute(spark):
    out = q_competing_risks_cif(spark, SF).toPandas().set_index("hours")
    e = pd.read_parquet(f"{SF}/events.parquet").assign(
        us=lambda x: x.ts.astype("datetime64[us]").astype("int64")
    )
    subjects = []
    for uid, g in e.groupby("user_id"):
        t0 = g.us.min()
        ev = g[
            g.event_type.isin(["purchase", "error"]) & (g.us > t0)
        ].sort_values(["us", "event_id"])
        if len(ev):
            t_end, risk = ev.iloc[0].us, ev.iloc[0].event_type
        else:
            t_end, risk = g.us.max(), "censored"
        if t_end > t0:
            subjects.append(((t_end - t0) // 3_600_000_000, risk))
    df = pd.DataFrame(subjects, columns=["hours", "risk"])
    n_risk = len(df)
    s = 1.0
    cif_p = cif_e = 0.0
    for h in sorted(df.hours.unique()):
        g = df[df.hours == h]
        dp = int((g.risk == "purchase").sum())
        de = int((g.risk == "error").sum())
        if dp + de > 0:
            cif_p += s * dp / n_risk
            cif_e += s * de / n_risk
            r = out.loc[h]
            assert r.n_risk == n_risk
            assert (r.d_purchase, r.d_error) == (dp, de)
            assert abs(r.cif_purchase - round(cif_p, 6)) < 1e-6
            assert abs(r.cif_error - round(cif_e, 6)) < 1e-6
        if dp + de < n_risk:
            s *= 1 - (dp + de) / n_risk
        n_risk -= len(g)
    # CIFs are monotone and their sum stays <= 1
    assert (out.cif_purchase.diff().dropna() >= -1e-12).all()
    assert (out.cif_purchase + out.cif_error <= 1 + 1e-9).all()
