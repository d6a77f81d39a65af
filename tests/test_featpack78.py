"""Semantic tests for feature-eng pack #78: Spiegelhalter calibration
Z, fixed-bin Hosmer-Lemeshow chi2, Qini uplift deciles (brute python
replicas; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _MA_BIN_CENTS,
    _MA_MAX_BIN,
    _MA_TRAIN_DAY_MAX,
    _QINI_TILES,
    q_hosmer_lemeshow,
    q_qini_uplift,
    q_spiegelhalter_z,
)

SF = "/root/testdata/sf0.001"


def _binned():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e = e[e.event_type.isin(["purchase", "click"])].assign(
        cents=round(e.value * 100).astype("int64"),
        day=e.ts.dt.day,
        pos=(e.event_type == "purchase").astype(int),
    )
    e["bin"] = np.minimum(_MA_MAX_BIN, e.cents // _MA_BIN_CENTS)
    tr = e[e.day <= _MA_TRAIN_DAY_MAX].groupby("bin").agg(
        n_train=("pos", "size"), p_train=("pos", "sum")
    )
    te = e[e.day > _MA_TRAIN_DAY_MAX].groupby("bin").agg(
        n_test=("pos", "size"), obs_pos=("pos", "sum")
    )
    j = tr.join(te, how="inner")
    j["p"] = (j.p_train + 1) / (j.n_train + 2)
    return j.sort_index()


def test_spiegelhalter_z_brute(spark):
    out = (
        q_spiegelhalter_z(spark, SF)
        .toPandas()
        .set_index("bin")
        .sort_index()
    )
    j = _binned()
    cum_num = cum_den = 0.0
    for b, r in j.iterrows():
        cum_num += (r.obs_pos - r.n_test * r.p) * (1 - 2 * r.p)
        cum_den += r.n_test * r.p * (1 - r.p) * (1 - 2 * r.p) ** 2
        o = out.loc[b]
        assert o.n_test == r.n_test and o.obs_pos == r.obs_pos
        assert abs(o.p_hat - round(r.p, 6)) < 1e-9
        assert abs(o.cum_num - round(cum_num, 6)) < 1e-6
        assert abs(o.cum_den - round(cum_den, 6)) < 1e-6
        z = cum_num / np.sqrt(cum_den) if cum_den > 0 else None
        if z is not None:
            assert abs(o.z_run - round(z, 6)) < 1e-6
    # a well-specified in-sample-ish model should not be wildly off:
    # |Z| of a real calibration break grows with n; just sanity-bound
    assert np.isfinite(out.z_run.iloc[-1])


def test_hosmer_lemeshow_brute(spark):
    out = (
        q_hosmer_lemeshow(spark, SF)
        .toPandas()
        .set_index("bin")
        .sort_index()
    )
    j = _binned()
    chi2 = 0.0
    for b, r in j.iterrows():
        exp = r.n_test * r.p
        contrib = (r.obs_pos - exp) ** 2 / (r.n_test * r.p * (1 - r.p))
        chi2 += contrib
        o = out.loc[b]
        assert o.n_test == r.n_test and o.obs_pos == r.obs_pos
        assert abs(o.exp_pos - round(exp, 6)) < 1e-9
        assert abs(o.hl_contrib - round(contrib, 6)) < 1e-6
        assert abs(o.chi2_run - round(chi2, 6)) < 1e-6
    # every contribution is non-negative, so the running chi2 is monotone
    assert (out.chi2_run.diff().dropna() >= -1e-9).all()


def test_qini_uplift_brute(spark):
    out = q_qini_uplift(spark, SF).toPandas().set_index("decile").sort_index()
    e = pd.read_parquet(f"{SF}/events.parquet").assign(day=lambda x: x.ts.dt.day)
    u = e.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "score": int((g.day <= 7).sum()),
                "conv": int(
                    ((g.event_type == "purchase") & (g.day >= 8)).any()
                ),
            }
        ),
        include_groups=False,
    )
    u = u[u.score > 0].reset_index()
    u["treat"] = u.user_id % 2
    u = u.sort_values(
        ["score", "user_id"], ascending=[False, True], ignore_index=True
    )
    n = len(u)
    base, rem = divmod(n, _QINI_TILES)
    sizes = [base + (1 if i < rem else 0) for i in range(_QINI_TILES)]
    u["decile"] = np.repeat(np.arange(1, _QINI_TILES + 1), sizes)[:n]
    cum = {"nt": 0, "rt": 0, "nc": 0, "rc": 0}
    for d in sorted(u.decile.unique()):
        g = u[u.decile == d]
        cum["nt"] += int(g.treat.sum())
        cum["rt"] += int((g.treat * g.conv).sum())
        cum["nc"] += int((1 - g.treat).sum())
        cum["rc"] += int(((1 - g.treat) * g.conv).sum())
        o = out.loc[d]
        assert (o.cum_nt, o.cum_rt, o.cum_nc, o.cum_rc) == (
            cum["nt"],
            cum["rt"],
            cum["nc"],
            cum["rc"],
        )
        if cum["nc"] > 0:
            qini = cum["rt"] - cum["rc"] * cum["nt"] / cum["nc"]
            assert abs(o.qini - round(qini, 6)) < 1e-9
        else:
            assert pd.isna(o.qini)
    # the last decile covers everyone: cum sizes add to the cohort
    last = out.iloc[-1]
    assert last.cum_nt + last.cum_nc == n
