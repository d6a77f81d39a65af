"""Corpus-cleaning funnel (crawlfe/clean.py): waterfall invariants,
redaction semantics, and the single-shuffle plan shape the 100 TB
no-fat-shuffle design depends on."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crawlfe.clean import (
    KEEP_LANGS,
    MAX_DUP_FRAC,
    MAX_TOKENS,
    MIN_TOKENS,
    STAGES,
    corpus_clean,
    flag_docs,
    funnel,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_funnel_waterfall_invariants(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rows = {r["stage"]: r for r in funnel(flag_docs(docs)).collect()}
    assert list(rows) == STAGES
    kept = [rows[s]["n_kept"] for s in STAGES]
    assert kept[0] == docs.count()
    # monotone non-increasing; per-stage drops reconcile exactly
    for i in range(1, len(kept)):
        assert kept[i] <= kept[i - 1]
        assert rows[STAGES[i]]["n_dropped_here"] == kept[i - 1] - kept[i]
    # every stage is non-vacuous at sf0.01 (calibrated thresholds)
    assert kept[-1] > 0
    assert kept[0] > kept[-1]


def test_cleaned_output_matches_flags(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    cleaned = corpus_clean(docs)
    last = funnel(flag_docs(docs)).where(
        F.col("stage") == STAGES[-1]
    ).collect()[0]["n_kept"]
    assert cleaned.count() == last
    pdf = cleaned.toPandas()
    assert pdf["n_tokens"].between(MIN_TOKENS, MAX_TOKENS).all()
    assert pdf["lang"].isin(KEEP_LANGS).all()


def test_exact_dedup_keeps_lowest_doc_id(spark):
    docs = spark.createDataFrame(
        [
            (5, "a b c " * 10, "en", "s"),
            (2, "a b c " * 10, "en", "s"),  # dup content, lower id wins
            (9, "x y z w v u t s r q " * 3, "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    f = flag_docs(docs).select("doc_id", "keep_dedup").collect()
    keep = {r["doc_id"]: r["keep_dedup"] for r in f}
    assert keep == {2: True, 5: False, 9: True}


def test_redaction_replaces_pii_and_counts(spark):
    docs = spark.createDataFrame(
        [(1, "mail me at bob@example.com or 10.0.0.1 now " + "w " * 30,
          "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    r = flag_docs(docs).select("n_emails", "n_ips", "clean_text").collect()[0]
    assert r["n_emails"] == 1 and r["n_ips"] == 1
    assert "<EMAIL>" in r["clean_text"] and "<IP>" in r["clean_text"]
    assert "bob@example.com" not in r["clean_text"]
    assert "10.0.0.1" not in r["clean_text"]


def test_repetition_flag_threshold(spark):
    # 40 tokens, 4 distinct -> dup_frac 0.9 > MAX_DUP_FRAC: dropped
    docs = spark.createDataFrame(
        [(1, "a b c d " * 10, "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    r = flag_docs(docs).collect()[0]
    assert r["dup_frac"] > MAX_DUP_FRAC
    assert r["keep_len"] and not r["keep_rep"]


def test_funnel_fat_rows_never_shuffle(spark, sf_dir):
    """The dedup decision must come from the SLIM (sha, doc_id)
    aggregation joined back — after AQE finalizes, the join must be
    broadcast (fat text rows never cross an exchange) and the only
    shuffle in the funnel is the slim pre-aggregation. A
    SortMergeJoin here would mean the whole corpus shuffles on the
    content hash — the design failure that measurably broke N->4N
    scaling (BENCH/clean_runs.jsonl, 0.727)."""
    df = corpus_clean(_docs(spark, sf_dir))
    df.count()  # finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
