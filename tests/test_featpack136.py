"""Semantic tests for feature-eng pack #136: Goodman-Kruskal
lambda, Theil's U, bias-corrected Cramer's V (brute pandas
replicas; cross-engine parity is proven by the check_entry
sweeps)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from crawlfe.queries import (
    q_cramers_v_corrected,
    q_goodman_lambda,
    q_theils_u,
)

SF = "/root/testdata/sf0.001"


def _tab():
    d = pd.read_parquet(f"{SF}/documents.parquet")
    return d.groupby(["source", "lang"]).size().unstack(fill_value=0)


def test_goodman_lambda_brute(spark):
    out = q_goodman_lambda(spark, SF).toPandas().iloc[0]
    t = _tab()
    n = t.to_numpy().sum()
    lam_lang = (t.max(axis=1).sum() - t.sum(axis=0).max()) / (
        n - t.sum(axis=0).max()
    )
    lam_src = (t.max(axis=0).sum() - t.sum(axis=1).max()) / (
        n - t.sum(axis=1).max()
    )
    assert out.n == n
    assert abs(
        out.lambda_lang_given_source - round(lam_lang, 6)
    ) < 1e-9
    assert abs(
        out.lambda_source_given_lang - round(lam_src, 6)
    ) < 1e-9
    assert 0 <= out.lambda_lang_given_source <= 1


def test_theils_u_brute(spark):
    out = q_theils_u(spark, SF).toPandas().iloc[0]
    t = _tab().to_numpy().astype(float)
    n = t.sum()
    p = t / n

    def h(v):
        v = v[v > 0]
        return float(-(v * np.log2(v)).sum())

    h_sl = h(p.flatten())
    h_s = h(p.sum(axis=1))
    h_l = h(p.sum(axis=0))
    mi = h_s + h_l - h_sl
    assert abs(out.h_source_bits - round(h_s, 6)) < 1e-6
    assert abs(out.h_lang_bits - round(h_l, 6)) < 1e-6
    assert abs(out.mutual_info_bits - round(mi, 6)) < 1e-5
    assert abs(out.u_lang_given_source - round(mi / h_l, 6)) < 1e-5
    assert abs(out.u_source_given_lang - round(mi / h_s, 6)) < 1e-5
    assert 0 <= out.u_lang_given_source <= 1 + 1e-9


def test_cramers_v_corrected_brute(spark):
    out = q_cramers_v_corrected(spark, SF).toPandas().iloc[0]
    t = _tab().to_numpy().astype(float)
    n = t.sum()
    r, k = t.shape
    e = np.outer(t.sum(axis=1), t.sum(axis=0)) / n
    chi2 = ((t - e) ** 2 / e).sum()
    phi2 = chi2 / n
    v = math.sqrt(phi2 / min(r - 1, k - 1))
    phi2c = max(0.0, phi2 - (r - 1) * (k - 1) / (n - 1))
    rc = r - (r - 1) ** 2 / (n - 1)
    kc = k - (k - 1) ** 2 / (n - 1)
    vc = math.sqrt(phi2c / min(rc - 1, kc - 1))
    assert out.n == n
    assert abs(out.chi2 - round(chi2, 4)) < 1e-3
    assert abs(out.cramers_v - round(v, 6)) < 1e-5
    assert abs(out.cramers_v_corrected - round(vc, 6)) < 1e-5
    # the correction only shrinks
    assert out.cramers_v_corrected <= out.cramers_v + 1e-9
