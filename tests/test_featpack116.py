"""Semantic tests for feature-eng pack #116: Gaussian CRPS, PIT
histogram, Winkler interval score (brute replicas using scipy-free
erf; cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    _FP_LAG,
    _PIT_BINS,
    _WK_ALPHA,
    _WK_Z,
    q_crps_eval,
    q_pit_histogram,
    q_winkler_score,
)

SF = "/root/testdata/sf0.001"


def _scored():
    e = pd.read_parquet(f"{SF}/events.parquet")
    cents = np.round(e.value * 100).astype("int64")
    d = (
        pd.DataFrame({"day": e.ts.dt.day, "c": cents})
        .groupby("day")["c"]
        .sum()
        .sort_index()
        .to_numpy(dtype=float)
    )
    x = d[_FP_LAG:]
    f = d[:-_FP_LAG]
    sig = np.std(x - f, ddof=1)
    return x, f, sig


def _phi(z):
    # exact erf is fine for the test: the engine's A&S poly agrees
    # to ~1.5e-7, well inside the assertion tolerances
    return 0.5 * (1 + math.erf(z / math.sqrt(2)))


def test_crps_eval_brute(spark):
    out = q_crps_eval(spark, SF).toPandas().iloc[0]
    x, f, sig = _scored()
    z = (x - f) / sig
    crps = sig * (
        z * (2 * np.vectorize(_phi)(z) - 1)
        + 2 * (np.exp(-z * z / 2) / math.sqrt(2 * math.pi))
        - 1 / math.sqrt(math.pi)
    )
    mae = np.mean(np.abs(x - f))
    assert out.n == len(x)
    assert abs(out.mean_crps - round(crps.mean(), 4)) < 1e-2
    assert abs(out.mae - round(mae, 4)) < 1e-6
    # CRPS is bounded by MAE for any predictive distribution
    assert out.mean_crps <= out.mae


def test_pit_histogram_brute(spark):
    out = q_pit_histogram(spark, SF).toPandas()
    x, f, sig = _scored()
    pit = np.vectorize(_phi)((x - f) / sig)
    bins = np.minimum(
        _PIT_BINS - 1, np.floor(pit * _PIT_BINS).astype(int)
    )
    counts = np.bincount(bins, minlength=_PIT_BINS)
    e = len(x) / _PIT_BINS
    chi2 = float(np.sum((counts - e) ** 2 / e))
    assert list(out.bin) == list(range(_PIT_BINS))
    assert list(out.n) == list(counts)
    assert abs(out.chi2_uniform.iloc[0] - round(chi2, 6)) < 1e-3
    assert abs(out.share.sum() - 1.0) < 1e-4


def test_winkler_score_brute(spark):
    out = q_winkler_score(spark, SF).toPandas().iloc[0]
    x, f, sig = _scored()
    lo, hi = f - _WK_Z * sig, f + _WK_Z * sig
    cov = np.mean((x >= lo) & (x <= hi))
    wd = hi - lo
    wk = (
        wd
        + np.where(x < lo, 2 / _WK_ALPHA * (lo - x), 0.0)
        + np.where(x > hi, 2 / _WK_ALPHA * (x - hi), 0.0)
    )
    assert out.n == len(x)
    assert abs(out.coverage - round(cov, 6)) < 1e-9
    assert abs(out.mean_width - round(wd.mean(), 4)) < 1e-4
    assert abs(out.mean_winkler - round(wk.mean(), 4)) < 1e-4
    # Winkler >= width always, equality iff full coverage
    assert out.mean_winkler >= out.mean_width - 1e-9
