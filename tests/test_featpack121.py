"""Semantic tests for feature-eng pack #121: tokenizer fertility,
length CCDF, lang-ID source profile (brute pandas replicas;
cross-engine parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import re

import pandas as pd

from crawlfe.queries import (
    _BPE_RE,
    _CCDF_GRID,
    _LANG_MARKERS,
    q_langid_by_source,
    q_length_ccdf,
    q_tokenizer_fertility,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_tokenizer_fertility_brute(spark):
    out = q_tokenizer_fertility(spark, SF).toPandas().set_index("lang")
    d = _docs()
    rx = re.compile(_BPE_RE)
    for lang, g in d.groupby("lang"):
        words = sum(len(t.strip().split()) for t in g.text)
        subs = sum(len(rx.findall(t)) for t in g.text)
        chars = sum(len(re.sub(r"\s+", "", t)) for t in g.text)
        row = out.loc[lang]
        assert row.n_docs == len(g)
        assert row.n_words == words
        assert row.n_subwords == subs
        assert abs(row.fertility - round(subs / words, 6)) < 1e-9
        assert (
            abs(row.chars_per_subword - round(chars / subs, 6)) < 1e-9
        )
    # a BPE-ish pre-tokenizer splits punctuation: fertility >= 1
    assert (out.fertility >= 1.0).all()


def test_length_ccdf_brute(spark):
    out = q_length_ccdf(spark, SF).toPandas()
    d = _docs()
    for (src, l), grp in out.groupby(["source", "l"]):
        g = d[d.source == src]
        longer = int((g.n_chars > l).sum())
        row = grp.iloc[0]
        assert row.n_docs == len(g)
        assert row.n_longer == longer
        assert abs(row.ccdf - round(longer / len(g), 6)) < 1e-9
    # CCDF is non-increasing in L within each source
    for src, grp in out.groupby("source"):
        assert grp.sort_values("l").ccdf.is_monotonic_decreasing
    assert set(out.l) == set(_CCDF_GRID)


def test_langid_by_source_brute(spark):
    out = q_langid_by_source(spark, SF).toPandas()
    d = _docs()
    rows = {}
    for src, t in zip(d.source, d.text):
        toks = t.strip().split()
        sc = {
            name: sum(toks.count(m) for m in ms)
            for name, ms in _LANG_MARKERS.items()
        }
        en, sq, da = (
            sc["en-like"],
            sc["sql-like"],
            sc["data-like"],
        )
        if en >= sq and en >= da:
            p = "en-like"
        elif sq >= da:
            p = "sql-like"
        else:
            p = "data-like"
        rows[(src, p)] = rows.get((src, p), 0) + 1
    tot = {}
    for (src, _), n in rows.items():
        tot[src] = tot.get(src, 0) + n
    assert len(out) == len(rows)
    for r in out.itertuples(index=False):
        assert rows[(r.source, r.pred_lang)] == r.n
        assert (
            abs(
                r.share
                - round(r.n / tot[r.source], 6)
            )
            < 1e-9
        )
