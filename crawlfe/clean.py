"""Single-pass corpus-cleaning funnel (the pre-training data pipeline).

Composes the engine's filtering signals — exact dedup, length bounds,
Gopher-style repetition (Rae+21 §A1.1, public method), language keep-set,
PII redaction (C4/Dolma-style scrub) — into ONE flag-based pass:

  * every signal is computed in a single scan of the corpus (the only
    shuffle is the content-hash window for exact dedup);
  * drops are FLAGS, not per-stage filters, so the funnel report
    (rows surviving each stage, in waterfall order) comes from one
    aggregation over the flagged frame instead of N re-scans — at
    100 TB, re-scanning the corpus once per stage is the difference
    between one pass and five;
  * redaction never drops rows, so the cleaned output is
    `keep_lang AND NOT any-drop-flag` with the redacted text.

All predicates are JVM built-ins (whole-stage codegen, no Python), and
every ratio uses the scaled-integer rounding pattern so stage decisions
are bit-deterministic across engines, partition layouts, and cluster
sizes. Mirrors the shape of the reference's dataset-cleaning stage
(ref: acoss benchmark corpus preparation [R]) re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# PII patterns (Java regex == RE2 subset; shared with q_pii_redact)
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IP_RE = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"

# Funnel thresholds — calibrated so every stage is non-vacuous on the
# synthetic corpus (n_tok in [10,100], dup-frac median ~0.54, 5 langs)
# while matching the public-pipeline defaults in spirit.
MIN_TOKENS = 20
MAX_TOKENS = 90
MAX_DUP_FRAC = 0.65  # Gopher drops > 0.30 on real web text
KEEP_LANGS = ("en", "fr", "es", "de")

STAGES = ["total", "exact_dedup", "length", "repetition", "lang"]


def flag_docs(docs: DataFrame) -> DataFrame:
    """Annotate (doc_id, text, lang, ...) with cumulative keep flags.

    Adds: n_tokens, dup_frac, keep_dedup, keep_len, keep_rep,
    keep_lang (each cumulative: keep_X implies all earlier keeps),
    n_emails / n_ips and `clean_text` (redacted, never dropped).
    """
    toks = F.split(F.trim(F.col("text")), "\\s+")
    n_t = F.size(toks)
    d_t = F.size(F.array_distinct(toks))
    # scaled-integer rounding: exact integer ratios tie identically
    # across engines (same pattern as quality_repetition)
    dup_frac = (
        F.round((n_t - d_t).cast("double") * 10000.0 / n_t.cast("double"), 0)
        / 10000.0
    )
    # exact dedup: canonical row = lowest doc_id per content hash.
    # The ONE shuffle in the funnel; everything downstream is narrow.
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    out = (
        docs.withColumn("n_tokens", n_t)
        .withColumn("dup_frac", dup_frac)
        .withColumn("keep_dedup", F.row_number().over(w) == 1)
    )
    out = out.withColumn(
        "keep_len",
        F.col("keep_dedup")
        & F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS),
    )
    out = out.withColumn(
        "keep_rep", F.col("keep_len") & (F.col("dup_frac") <= MAX_DUP_FRAC)
    )
    out = out.withColumn(
        "keep_lang", F.col("keep_rep") & F.col("lang").isin(*KEEP_LANGS)
    )
    return out.withColumn(
        "n_emails",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL_RE), F.lit(0))),
    ).withColumn(
        "n_ips",
        F.size(F.regexp_extract_all("text", F.lit(PII_IP_RE), F.lit(0))),
    ).withColumn(
        "clean_text",
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL_RE, "<EMAIL>"),
            PII_IP_RE,
            "<IP>",
        ),
    )


def funnel(flagged: DataFrame) -> DataFrame:
    """Waterfall report from ONE aggregation over the flagged frame.

    Returns (stage_idx, stage, n_kept, n_dropped_here) — long-form
    scalar rows, deterministic order by stage_idx.
    """
    big = F.lit(1).cast("bigint")
    agg = flagged.agg(
        F.count(big).alias("total"),
        F.sum(F.col("keep_dedup").cast("bigint")).alias("exact_dedup"),
        F.sum(F.col("keep_len").cast("bigint")).alias("length"),
        F.sum(F.col("keep_rep").cast("bigint")).alias("repetition"),
        F.sum(F.col("keep_lang").cast("bigint")).alias("lang"),
        F.sum(F.col("n_emails").cast("bigint")).alias("n_emails"),
        F.sum(F.col("n_ips").cast("bigint")).alias("n_ips"),
    )
    pairs = []
    for i, s in enumerate(STAGES):
        prev = STAGES[i - 1] if i else None
        pairs.append(
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(s).alias("n_kept"),
                (
                    (F.col(prev) - F.col(s))
                    if prev
                    else F.lit(0).cast("bigint")
                ).alias("n_dropped_here"),
            )
        )
    return (
        agg.select(F.explode(F.array(*pairs)).alias("r"))
        .select("r.*")
    )


def corpus_clean(docs: DataFrame) -> DataFrame:
    """The cleaned corpus: surviving rows with PII-redacted text."""
    return (
        flag_docs(docs)
        .where("keep_lang")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_tokens",
            "n_emails",
            "n_ips",
            F.col("clean_text").alias("text"),
        )
    )
