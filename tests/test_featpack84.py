"""Semantic tests for feature-eng pack #84: Fleiss' kappa,
Krippendorff's alpha (nominal), Gwet's AC1 over the deterministic
hash-perturbed rater panel (brute python replicas; cross-engine
parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd

from crawlfe.queries import (
    _CATS,
    _FLIP_MOD,
    _LANGS,
    _RATERS,
    q_fleiss_kappa,
    q_gwet_ac1,
    q_krippendorff_alpha,
)

SF = "/root/testdata/sf0.001"


def _r6(x):
    # Spark/DuckDB round() is HALF_UP; python round() is banker's —
    # p_exp at sf0.001 is exactly 0.2277825, a live .5 boundary
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def _h4(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def _panel():
    d = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "lang"]]
    cells = Counter()
    for doc, lang in zip(d.doc_id, d.lang):
        for r in range(1, _RATERS + 1):
            if _h4(f"r{r}:{doc}") % _FLIP_MOD == 0:
                lab = _LANGS[_h4(f"c{r}:{doc}") % _CATS]
            else:
                lab = lang
            cells[(doc, lab)] += 1
    n_items = d.doc_id.nunique()
    s_nij2 = sum(v * v for v in cells.values())
    cj = Counter()
    for (_, lab), v in cells.items():
        cj[lab] += v
    return n_items, s_nij2, cj


def test_fleiss_kappa_brute(spark):
    out = q_fleiss_kappa(spark, SF).toPandas().iloc[0]
    nitems, s_nij2, cj = _panel()
    s_cj2 = sum(v * v for v in cj.values())
    n = _RATERS
    p_obs = (s_nij2 - nitems * n) / (nitems * n * (n - 1))
    p_exp = s_cj2 / (nitems * n) ** 2
    kappa = (p_obs - p_exp) / (1 - p_exp)
    assert (out.nitems, out.s_nij2, out.s_cj2) == (nitems, s_nij2, s_cj2)
    assert abs(out.p_obs - _r6(p_obs)) < 1e-9
    assert abs(out.p_exp - _r6(p_exp)) < 1e-9
    assert abs(out.kappa - _r6(kappa)) < 1e-9
    # 20% hash noise on a 5-class task: strong but imperfect agreement
    assert 0.4 < out.kappa < 1.0


def test_krippendorff_alpha_brute(spark):
    out = q_krippendorff_alpha(spark, SF).toPandas().iloc[0]
    nitems, s_nij2, cj = _panel()
    n = _RATERS
    p_tot = nitems * n
    s_cj2 = sum(v * v for v in cj.values())
    d_o = (nitems * n * n - s_nij2) / (nitems * n * (n - 1))
    d_e = (p_tot * p_tot - s_cj2) / (p_tot * (p_tot - 1))
    alpha = 1 - d_o / d_e
    assert (out.nitems, out.p_tot) == (nitems, p_tot)
    assert abs(out.d_obs - _r6(d_o)) < 1e-9
    assert abs(out.d_exp - _r6(d_e)) < 1e-9
    assert abs(out.alpha - _r6(alpha)) < 1e-9
    assert 0.4 < out.alpha < 1.0


def test_gwet_ac1_brute(spark):
    out = q_gwet_ac1(spark, SF).toPandas().iloc[0]
    nitems, s_nij2, cj = _panel()
    n = _RATERS
    p_tot = nitems * n
    s_cj2 = sum(v * v for v in cj.values())
    p_obs = (s_nij2 - nitems * n) / (nitems * n * (n - 1))
    pe = ((p_tot * p_tot - s_cj2) / (p_tot * p_tot)) / (_CATS - 1)
    ac1 = (p_obs - pe) / (1 - pe)
    assert abs(out.p_obs - _r6(p_obs)) < 1e-9
    assert abs(out.pe_gwet - _r6(pe)) < 1e-9
    assert abs(out.ac1 - _r6(ac1)) < 1e-9
    # AC1's chance term is bounded by 1/(K-1) <= 0.25, so on a
    # prevalence-skewed corpus AC1 >= Fleiss' kappa (the paradox fix)
    fk = q_fleiss_kappa(spark, SF).toPandas().iloc[0].kappa
    assert out.ac1 >= fk - 1e-9
