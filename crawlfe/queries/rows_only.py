"""Rows-only entries (no SQL oracle), media kernels, corpus-clean funnel, PII redaction, contamination.

Split from the former crawlfe/queries.py monolith (r4); bodies unchanged.
"""
from __future__ import annotations

import pandas as pd  # noqa: F401
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T  # noqa: F401

from .. import clean  # noqa: F401
from .. import windows as W  # noqa: F401
from ..asof import asof_join  # noqa: F401
from ..textfeat import featurize_batch  # noqa: F401
from ._shared import SESSION_GAP_S, _scratch_dir, _t, _us  # noqa: F401
from .core import SQL_ASOF  # noqa: F401



def q_dedup_clusters(spark, sf_dir):
    """The dedup OUTPUT: connected components over MinHash candidate
    pairs -> (doc_id, canonical_id) keep-one assignment. Iterative
    min-label propagation (alternating large/small-star shape); web
    dedup components are shallow, so it converges in a few rounds —
    each round is two shuffles, no driver-side graph."""
    pairs = q_minhash_near_dup(spark, sf_dir)  # doc_a < doc_b
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(
        pairs.select(
            F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
        )
    )
    # labels start as self; propagate min(neighbor label) to fixpoint
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("comp", F.col("doc_id"))
    )
    # safety bound >> any real propagation depth (label distance halves
    # nothing here — it's plain min-propagation, so depth = component
    # diameter; 64 covers a 2^64-long chain in doubling variants and any
    # plausible web-dedup chain outright). Returning silently at the cap
    # would split long chain components (ADVICE r1), so overflow raises.
    max_rounds = 64
    for rnd in range(max_rounds + 1):
        cand = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("comp").alias("min_nbr"))
        )
        new_labels = (
            labels.join(cand, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("comp"), F.coalesce("min_nbr", F.col("comp"))
                ).alias("comp"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_rounds} rounds; "
            "returning partial components would silently split clusters"
        )
    return labels.select("doc_id", F.col("comp").alias("canonical_id"))


# --------------------------------------------------------------------------
# Rows-only entries (no SQL oracle — non-SQL-expressible, checked by the
# pytest parity suite instead; driver records rows-only)
# --------------------------------------------------------------------------

def q_featurize_documents(spark, sf_dir):
    """The engine featurizer (ngram profile + cepstrum) over documents —
    allclose-parity-tested against the numpy oracle in pytest."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def feat(it):
        for pdf in it:
            m = featurize_batch(list(pdf["text"]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "feat": list(m),
                }
            )

    return d.mapInPandas(feat, schema="doc_id long, feat array<double>")


def q_minhash_near_dup(spark, sf_dir):
    """MinHash(64)+LSH(16 bands) near-dup candidate pairs over documents:
    shingle -> minhash sig -> band buckets -> bucket self-join.

    The signature kernel is batch-vectorized (token + 3-gram shingle
    hashes for the WHOLE Arrow batch in one numpy pass, then 64
    seed-mixed segmented mins via ``np.minimum.reduceat``) — no
    per-document or per-shingle Python, replacing the round-1 blake2b
    loop VERDICT.md flagged as the bench hot spot. MinHash over a
    multiset equals MinHash over the set, so no per-doc dedup needed.
    """
    import numpy as np
    import pandas as pd

    from ..hashing import (
        shingle_hashes_batch,
        splitmix64_np,
        token_hashes_batch,
    )

    N_HASH, N_BANDS = 64, 16
    R = N_HASH // N_BANDS
    MH_SEED = 0x31AB_5EED
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def sigs(it):
        seeds = np.arange(1, N_HASH + 1, dtype=np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        )
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            tok_h, tok_doc = token_hashes_batch(pdf["text"])
            sh, sh_doc = shingle_hashes_batch(
                tok_h, tok_doc, n, 3, MH_SEED
            )
            # every doc emits >=1 shingle, so segments are non-empty and
            # reduceat per seed is exact
            starts = np.concatenate(
                ([0], np.cumsum(np.bincount(sh_doc, minlength=n))[:-1])
            )
            mins = np.empty((N_HASH, n), dtype=np.uint64)
            for s in range(N_HASH):
                mins[s] = np.minimum.reduceat(
                    splitmix64_np(sh ^ seeds[s]), starts
                )
            keys = (
                splitmix64_np(mins.T.reshape(n, N_BANDS, R))
                .sum(axis=2) % np.uint64(2**63)
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(
                        pdf["doc_id"].to_numpy(), N_BANDS
                    ),
                    "band": np.tile(
                        np.arange(N_BANDS, dtype=np.int32), n
                    ),
                    "bucket": keys.reshape(-1),
                }
            )

    buckets = d.mapInPandas(
        sigs, schema="doc_id long, band int, bucket long"
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def q_simhash(spark, sf_dir):
    """64-bit SimHash fingerprint per document (token-hash bit voting).

    Batch-vectorized: one token-hash pass over the whole Arrow batch,
    then 64 segmented bit-vote sums via ``np.add.reduceat`` — no
    per-document/per-token Python (round-1 blake2b loop removed)."""
    import numpy as np
    import pandas as pd

    from ..hashing import token_hashes_batch

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def sim(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            tok_h, tok_doc = token_hashes_batch(pdf["text"])
            counts = np.bincount(tok_doc, minlength=n)
            # clip: a trailing zero-token doc would point reduceat past
            # the end; its bogus segment is masked out below anyway
            starts = np.minimum(
                np.concatenate(([0], np.cumsum(counts)[:-1])),
                max(tok_h.size - 1, 0),
            )
            fp = np.zeros(n, dtype=np.uint64)
            if tok_h.size:
                for j in range(64):
                    v = ((tok_h >> np.uint64(j)) & np.uint64(1)).astype(
                        np.int64
                    )
                    votes = np.add.reduceat(2 * v - 1, starts)
                    fp |= (votes > 0).astype(np.uint64) << np.uint64(j)
            fp[counts == 0] = 0  # empty docs: reduceat segment is bogus
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "simhash": (fp % np.uint64(2**63)).astype(np.int64),
                }
            )

    return d.mapInPandas(sim, schema="doc_id long, simhash long")


def q_synth_pages(spark, sf_dir):
    """Deterministic distributed pages generator (SURVEY.md §2.B
    'synthetic pages source') — values are pure functions of (seed,
    url_id, snapshot_k); partition-count invariance is pytest-verified."""
    from ..synth import SynthConfig, synth_pages

    pages = synth_pages(spark, SynthConfig(n_urls=80), n_partitions=8)
    return pages.select(
        "url",
        F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("warc_ts_us"),
        F.sha2("text", 256).alias("text_sha"),
        "lang",
        F.length("html").alias("html_bytes"),
    )


def q_scan_pages(spark, sf_dir):
    """Iceberg-lite scan: atomically-committed pages read back through
    the manifest (parquet-dir emulation of the prod Iceberg catalog,
    SURVEY.md §1.3)."""
    import tempfile

    from ..io import IcebergLite
    from ..synth import SynthConfig, synth_pages

    tbl = IcebergLite(_scratch_dir("scan_pages"))
    pages = synth_pages(spark, SynthConfig(n_urls=40), n_partitions=4)
    tbl.commit(tbl.stage(pages), "snap-scan-0")
    got = tbl.read(spark)
    return got.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("url").alias("n_urls"),
    )


def q_sink_roundtrip(spark, sf_dir):
    """features sink roundtrip: featurize -> staged atomic commit ->
    manifest read-back; exactly-once by snapshot id (recommit of the
    same snapshot is a no-op)."""
    import tempfile

    from ..features import featurize
    from ..io import IcebergLite
    from ..synth import SynthConfig, synth_pages

    tbl = IcebergLite(_scratch_dir("sink_roundtrip"))
    pages = synth_pages(spark, SynthConfig(n_urls=40), n_partitions=4)
    feats = featurize(pages, use_html=True)
    tbl.commit(tbl.stage(feats), "snap-rt-0")
    got = tbl.read(spark)
    return got.select(
        "url",
        F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("warc_ts_us"),
        "text_sha256",
    )


def q_skew_salted(spark, sf_dir):
    """Salted as-of join (salt_k=4) on the events stream — identical
    rows to the unsalted plan (pytest skew-parity asserts this); the
    hot probe key spreads over 4 tasks while each sees full history."""
    ev = _t(spark, sf_dir, "events")
    probe = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), "event_id"
    )
    build = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    j = asof_join(
        probe, build, key="user_id", ts_probe="click_ts", ts_build="ts",
        build_cols=["purchase_value"], strategy="merge_scan",
        num_buckets=16, salt_k=4,
    )
    return j.select(
        "user_id",
        "event_id",
        _us("click_ts").alias("click_ts_us"),
        _us("ts").alias("purchase_ts_us"),
        F.round("purchase_value", 4).alias("purchase_value"),
    )


# salting must not change results: the salted plan answers the SAME
# query, so it shares the unsalted oracle verbatim
SQL_ASOF_SALT = SQL_ASOF


def q_asof_forward(spark, sf_dir):
    """Forward as-of join (direction='forward'): each click attaches
    the EARLIEST purchase at-or-after it — the LABEL-construction twin
    of the backward feature join (outcome at the next snapshot, e.g.
    "did the page change by the next crawl"). Looking forward is the
    point here, not a leak; the feature path stays backward-only
    (tests/test_leakage.py)."""
    ev = _t(spark, sf_dir, "events")
    probe = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id")
    )
    build = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    j = asof_join(
        probe, build, key="user_id", ts_probe="click_ts", ts_build="ts",
        build_cols=["purchase_value"], strategy="merge_scan",
        num_buckets=64, direction="forward",
    )
    return j.select(
        "user_id",
        "event_id",
        _us("click_ts").alias("click_ts_us"),
        _us("ts").alias("purchase_ts_us"),
        F.round("purchase_value", 4).alias("purchase_value"),
    )


SQL_ASOF_FORWARD = """
WITH probe AS (
  SELECT user_id, ts AS click_ts, event_id FROM events WHERE event_type = 'click'
), build AS (
  SELECT user_id, ts, value AS purchase_value FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id,
       p.event_id,
       epoch_us(p.click_ts) AS click_ts_us,
       epoch_us(b.ts) AS purchase_ts_us,
       round(b.purchase_value, 4) AS purchase_value
FROM probe p ASOF LEFT JOIN build b
  ON p.user_id = b.user_id AND p.click_ts <= b.ts
"""


def q_asof_nearest(spark, sf_dir):
    """Nearest as-of join (direction='nearest'): each click attaches
    the purchase minimizing |purchase_ts - click_ts|, ties to the
    earlier row (pd.merge_asof semantics) — the snapshot-alignment
    mode for joining two streams sampled on different cadences.
    Same merge-scan kernel, direction passed through; the DuckDB twin
    is a per-key candidate join ranked by absolute distance (fine at
    oracle scale; the engine side stays a single-pass merge scan)."""
    ev = _t(spark, sf_dir, "events")
    probe = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id")
    )
    build = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    j = asof_join(
        probe, build, key="user_id", ts_probe="click_ts", ts_build="ts",
        build_cols=["purchase_value"], strategy="merge_scan",
        num_buckets=64, direction="nearest",
    )
    return j.select(
        "user_id",
        "event_id",
        _us("click_ts").alias("click_ts_us"),
        _us("ts").alias("purchase_ts_us"),
        F.round("purchase_value", 4).alias("purchase_value"),
    )


SQL_ASOF_NEAREST = """
WITH probe AS (
  SELECT user_id, ts AS click_ts, event_id FROM events WHERE event_type = 'click'
), build AS (
  SELECT user_id, ts, value AS purchase_value FROM events WHERE event_type = 'purchase'
), cand AS (
  SELECT p.user_id, p.event_id, p.click_ts, b.ts, b.purchase_value,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(epoch_us(b.ts) - epoch_us(p.click_ts)), b.ts
         ) AS rn
  FROM probe p LEFT JOIN build b ON p.user_id = b.user_id
)
SELECT user_id, event_id,
       epoch_us(click_ts) AS click_ts_us,
       epoch_us(ts) AS purchase_ts_us,
       round(purchase_value, 4) AS purchase_value
FROM cand WHERE rn = 1
"""


def q_asof_tolerance(spark, sf_dir):
    """As-of join with a match-window tolerance (merge_asof semantics:
    the latest prior build row matches ONLY if probe_ts - build_ts <=
    tolerance, else nulls). First driver row for the r2 tolerance
    feature — previously pytest-only."""
    ev = _t(spark, sf_dir, "events")
    probe = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id")
    )
    build = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    j = asof_join(
        probe, build, key="user_id", ts_probe="click_ts", ts_build="ts",
        build_cols=["purchase_value"], strategy="merge_scan",
        num_buckets=64, tolerance=pd.Timedelta(hours=48),
    )
    return j.select(
        "user_id",
        "event_id",
        _us("click_ts").alias("click_ts_us"),
        _us("ts").alias("purchase_ts_us"),
        F.round("purchase_value", 4).alias("purchase_value"),
    )


# the latest-prior candidate is unique, so tolerance is a post-filter on
# the plain ASOF match: null the build columns when the match is older
# than the window (inclusive <=, matching pd.merge_asof)
SQL_ASOF_TOL = """
WITH probe AS (
  SELECT user_id, ts AS click_ts, event_id FROM events WHERE event_type = 'click'
), build AS (
  SELECT user_id, ts, value AS purchase_value FROM events WHERE event_type = 'purchase'
), a AS (
  SELECT p.user_id, p.event_id, p.click_ts, b.ts, b.purchase_value
  FROM probe p ASOF LEFT JOIN build b
    ON p.user_id = b.user_id AND p.click_ts >= b.ts
)
SELECT user_id, event_id, epoch_us(click_ts) AS click_ts_us,
       CASE WHEN epoch_us(click_ts) - epoch_us(ts) <= CAST(48 AS BIGINT) * 3600 * 1000000
            THEN epoch_us(ts) END AS purchase_ts_us,
       CASE WHEN epoch_us(click_ts) - epoch_us(ts) <= CAST(48 AS BIGINT) * 3600 * 1000000
            THEN round(purchase_value, 4) END AS purchase_value
FROM a
"""


def q_asof_union_window(spark, sf_dir):
    """The ``union_window`` as-of strategy (100% JVM, zero Python —
    the narrow-payload scale path): same query as asof_join, so it
    shares the same oracle; first driver row for this strategy."""
    ev = _t(spark, sf_dir, "events")
    probe = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id")
    )
    build = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    j = asof_join(
        probe, build, key="user_id", ts_probe="click_ts", ts_build="ts",
        build_cols=["purchase_value"], strategy="union_window",
    )
    return j.select(
        "user_id",
        "event_id",
        _us("click_ts").alias("click_ts_us"),
        _us("ts").alias("purchase_ts_us"),
        F.round("purchase_value", 4).alias("purchase_value"),
    )


def q_asof_range_scan(spark, sf_dir):
    """The ``range_scan`` as-of strategy — the mandate-literal
    physical shape (BASELINE.json:6 merge-scan over
    repartitionByRange + sortWithinPartitions with a streaming
    forward pass); same query, same oracle, first driver row."""
    ev = _t(spark, sf_dir, "events")
    probe = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id")
    )
    build = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    j = asof_join(
        probe, build, key="user_id", ts_probe="click_ts", ts_build="ts",
        build_cols=["purchase_value"], strategy="range_scan",
    )
    return j.select(
        "user_id",
        "event_id",
        _us("click_ts").alias("click_ts_us"),
        _us("ts").alias("purchase_ts_us"),
        F.round("purchase_value", 4).alias("purchase_value"),
    )


def q_win_ntile(spark, sf_dir):
    """Distribution window functions — ntile / percent_rank /
    cume_dist per user over event time (completes the ranking-window
    family next to row_number/rank/dense_rank). Unrounded doubles:
    both engines compute the identical (rank-1)/(n-1) IEEE division."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wv = Window.partitionBy("user_id").orderBy("value")
    return ev.select(
        "user_id",
        "event_id",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(wv).alias("pct_rank"),
        F.cume_dist().over(wv).alias("cume"),
    )


SQL_WIN_NTILE = """
SELECT user_id, event_id,
       ntile(4)       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile,
       percent_rank() OVER (PARTITION BY user_id ORDER BY value) AS pct_rank,
       cume_dist()    OVER (PARTITION BY user_id ORDER BY value) AS cume
FROM events
"""


def q_win_first_last(spark, sf_dir):
    """Positional window values — first_value / last_value /
    nth_value over the full partition (the latest/earliest-snapshot
    selection shape: each event row sees its user's first, last and
    second event values)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.first("value").over(w), 4).alias("first_val"),
        F.round(F.last("value").over(w), 4).alias("last_val"),
        F.round(F.nth_value("value", 2).over(w), 4).alias("second_val"),
    )


SQL_WIN_FIRST_LAST = """
SELECT user_id, event_id,
       round(first_value(value) OVER w, 4) AS first_val,
       round(last_value(value)  OVER w, 4) AS last_val,
       round(nth_value(value, 2) OVER w, 4) AS second_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_sample_split(spark, sf_dir):
    """Deterministic train/valid/test assignment by content-hash bucket
    (the training-data split op a 100 TB corpus pipeline needs): bucket
    = first md5 hex byte of the stable doc key, split by fixed hex
    ranges (~90/5/5). Pure JVM (md5 + substring + CASE), no shuffle —
    a narrow projection that's reproducible across engines, runs, and
    cluster sizes, unlike rand()-based sampling."""
    d = _t(spark, sf_dir, "documents")
    b = F.substring(
        F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8")), 1, 2
    )
    split = (
        F.when(b <= "e5", "train")
        .when(b <= "f2", "valid")
        .otherwise("test")
    )
    return d.select(
        "doc_id",
        "lang",
        b.alias("bucket"),
        split.alias("split"),
    )


SQL_SAMPLE_SPLIT = """
SELECT doc_id, lang,
       substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'e5' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'f2' THEN 'valid'
            ELSE 'test' END AS split
FROM documents
"""


def q_win_range_frame(spark, sf_dir):
    """Time-RANGE window frame (trailing 1 hour by event time) — the
    value-range twin of the rows-frame rolling window (`win_rolling`):
    `rangeBetween` over epoch micros, so frame membership follows the
    clock, not row counts. The crawl-cadence shape: activity volume in
    the trailing hour per user at every event."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        _us("ts").alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
    )


SQL_WIN_RANGE_FRAME = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       count(*) OVER w AS n_1h,
       round(sum(value) OVER w, 4) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): an aggregate-HAVING
    subquery feeding a semi-filterable three-way join + re-aggregation.
    The HAVING set is computed once and inner-joined (Catalyst plans
    the IN-subquery as a semi join); threshold 300 keeps the result
    non-vacuous at every SF tier (46 orders at sf0.01)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey",
            _us("o_orderdate").alias("o_orderdate_us"), "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate_us",
            F.round("o_totalprice", 4).alias("o_totalprice"), "sum_qty",
        )
    )


SQL_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey,
       epoch_us(o_orderdate) AS o_orderdate_us,
       round(o_totalprice, 4) AS o_totalprice,
       round(sum(l_quantity), 4) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
"""


def q_agg_vector(spark, sf_dir):
    """Grouped vector aggregate: per-label mean embedding via
    applyInPandas (the A16 patch-median analog shape).

    Output is LONG-FORM scalar rows ``(label, n, dim_idx, mean_val)``
    — one row per (label, dimension) — instead of a raw
    ``array<double>`` column: the driver's canonicalizer sorts output
    columns with pandas, which cannot sort list-valued cells
    (VERDICT r2 "What's wrong" #1). The grouped-vector kernel is
    unchanged; only the emission shape is scalar."""
    import numpy as np

    e = _t(spark, sf_dir, "embeddings")

    def mean_vec(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        mv = np.round(m.mean(axis=0), 6)
        d = mv.shape[0]
        return pd.DataFrame(
            {
                "label": np.full(d, int(pdf["label"].iloc[0]), dtype=np.int32),
                "n": np.full(d, len(pdf), dtype=np.int64),
                "dim_idx": np.arange(d, dtype=np.int32),
                "mean_val": mv,
            }
        )

    return e.groupBy("label").applyInPandas(
        mean_vec, schema="label int, n long, dim_idx int, mean_val double"
    )


SQL_AGG_VECTOR = """
WITH dims AS (
  SELECT label, i.idx - 1 AS dim_idx,
         round(avg(CAST(embedding[i.idx] AS DOUBLE)), 6) AS mean_val
  FROM embeddings, range(1, 65) i(idx)
  GROUP BY label, i.idx
), counts AS (
  SELECT label, count(*) AS n FROM embeddings GROUP BY label
)
SELECT CAST(d.label AS INTEGER) AS label,
       CAST(c.n AS BIGINT) AS n,
       CAST(d.dim_idx AS INTEGER) AS dim_idx,
       d.mean_val
FROM dims d JOIN counts c ON d.label = c.label
"""


def q_udtf_shingles(spark, sf_dir):
    """Spark 4 Python UDTF surface: lateral shingle exploder.

    Per-row Python by construction — registered to demonstrate the
    UDTF API (SURVEY.md §2.B UDF table); the ENGINE's hot path uses
    sequence+explode / mapInPandas instead (BASELINE.json:15)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, shingle string")
    class ShingleUDTF:
        def eval(self, text: str):
            toks = (text or "").split()
            for i in range(max(len(toks) - 2, 0)):
                yield i, " ".join(toks[i : i + 3])

    spark.udtf.register("shingles_udtf", ShingleUDTF)
    _t(spark, sf_dir, "documents").where(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("docs_u")
    return spark.sql("""
        SELECT d.doc_id, s.pos, s.shingle
        FROM docs_u d, LATERAL shingles_udtf(d.text) s
    """)


SQL_UDTF_SHINGLES = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents WHERE doc_id < 20
), ex AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks
)
SELECT doc_id, CAST(i - 1 AS INT) AS pos,
       array_to_string(t[i:i+2], ' ') AS shingle
FROM ex
"""


def q_lineage(spark, sf_dir):
    """Per-partition lineage rows from the featurize stage
    (BASELINE.json:6 mandate): partition id, offset range, row count,
    order-independent feature hash. committed_at dropped (wall clock)."""
    from ..features import featurize, lineage_rows
    from ..synth import SynthConfig, synth_pages

    pages = synth_pages(spark, SynthConfig(n_urls=60), n_partitions=6)
    feats = featurize(pages, use_html=True)
    return lineage_rows(feats, "snap-lineage-0").select(
        "partition_id", "input_snapshot", "first_offset", "last_offset",
        "n_rows", "feature_hash",
    )


def q_doc_fingerprint(spark, sf_dir):
    """Winnowing rolling-hash fingerprints per document — parity-tested
    against crawlfe.fingerprint.fingerprint_oracle in pytest."""
    from ..fingerprint import doc_fingerprints

    return doc_fingerprints(_t(spark, sf_dir, "documents"))


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: documents re-cast as opaque binary media
    payloads (no codec libs in the container — decode is a deterministic
    stub, see crawlfe.media) -> decoded dims + byte-histogram features."""
    from ..media import media_features

    return media_features(_media_table(spark, sf_dir))


def _media_table(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def q_media_resize(spark, sf_dir):
    """Multimodal resize-to-fit (task brief op): stubbed re-encode,
    real schema/pruning/batch plumbing — pytest-verified dims/aspect."""
    from ..media import resize_media

    return resize_media(_media_table(spark, sf_dir), max_dim=256)


def q_media_frames(spark, sf_dir):
    """Multimodal frame sampling (task brief op): one row per sampled
    frame — the mapInPandas fan-out shape; pytest-verified counts."""
    from ..media import sample_frames

    return sample_frames(_media_table(spark, sf_dir), every_k=2)


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 shape (forecasting revenue change): a pure
    scan→filter→agg with every predicate pushable to the parquet
    reader (`PushedFilters` shows shipdate/discount/quantity) — the
    canonical predicate-pushdown + whole-stage-codegen probe. At
    100 TB this is the plan that must read only row groups whose
    min/max stats survive the pushed range predicates."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQL_TPCH_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_target_encode_loo(spark, sf_dir):
    """Leave-one-out target encoding — the leakage-safe categorical
    encoder a training-data pipeline needs (the as-of join's
    'no row sees itself/the future' discipline, applied group-wise):
    each event's feature is the mean `value` of its event_type group
    EXCLUDING the row itself, `(S - x) / (n - 1)`.

    Engine-portability: `value` is 4-dec-grid exact in the fixture, so
    summing as DECIMAL(18,4) makes S bit-identical in Spark and DuckDB;
    the quotient is rounded by the scaled-integer pattern
    `round(num * 10^4 / den) / 10^4` — exact decimal ties become
    exactly-representable w.5 doubles that both engines round away
    from zero (the backfill rounding lesson)."""
    ev = _t(spark, sf_dir, "events")
    x4 = F.round(F.col("value"), 4).cast("decimal(18,4)")
    w = Window.partitionBy("event_type")
    s = F.sum(x4).over(w)
    n = F.count(F.lit(1)).over(w)
    num = (s - x4).cast("double") * F.lit(10000.0)
    den = (n - F.lit(1)).cast("double")
    return ev.select(
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
        (F.round(num / den, 0) / F.lit(10000.0)).alias("loo_mean"),
    )


SQL_TARGET_ENCODE_LOO = """
WITH g AS (
  SELECT event_id, event_type,
         CAST(round(value, 4) AS DECIMAL(18,4)) AS x4,
         round(value, 4) AS value,
         sum(CAST(round(value, 4) AS DECIMAL(18,4)))
             OVER (PARTITION BY event_type) AS s,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_id, event_type, value,
       round(CAST(s - x4 AS DOUBLE) * 10000.0 / CAST(n - 1 AS DOUBLE))
         / 10000.0 AS loo_mean
FROM g
"""


def q_zscore_norm(spark, sf_dir):
    """Group-wise z-score feature normalization (population std) —
    the standard scale step before model training, computed with
    bit-identical cross-engine arithmetic: DECIMAL sums for S and
    sum-of-squares (exact in both engines), then
    `var = SSQ/n - mean²` and the scaled-integer rounding of
    `(x - mean)/sqrt(var)` written with the identical op order in
    the Spark plan and the DuckDB oracle."""
    ev = _t(spark, sf_dir, "events")
    x4 = F.round(F.col("value"), 4).cast("decimal(18,4)")
    w = Window.partitionBy("event_type")
    s = F.sum(x4).over(w).cast("double")
    ssq = F.sum(x4 * x4).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    mean = s / n
    var = ssq / n - mean * mean
    z = (x4.cast("double") - mean) * F.lit(10000.0) / F.sqrt(var)
    return ev.select(
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
        (F.round(z, 0) / F.lit(10000.0)).alias("z"),
    )


SQL_ZSCORE_NORM = """
WITH g AS (
  SELECT event_id, event_type,
         CAST(round(value, 4) AS DECIMAL(18,4)) AS x4,
         round(value, 4) AS value,
         CAST(sum(CAST(round(value, 4) AS DECIMAL(18,4)))
              OVER (PARTITION BY event_type) AS DOUBLE) AS s,
         CAST(sum(CAST(round(value, 4) AS DECIMAL(18,4))
                  * CAST(round(value, 4) AS DECIMAL(18,4)))
              OVER (PARTITION BY event_type) AS DOUBLE) AS ssq,
         CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n
  FROM events
)
SELECT event_id, event_type, value,
       round((CAST(x4 AS DOUBLE) - s / n) * 10000.0
             / sqrt(ssq / n - (s / n) * (s / n))) / 10000.0 AS z
FROM g
"""


def q_quality_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals (Rae+21 §A1.1 analog,
    public method): per-document duplicate-token fraction and
    duplicate-word-2-gram fraction — high values flag boilerplate /
    spam for corpus filtering. All JVM higher-order functions (no
    Python); ratios use the scaled-integer rounding pattern so exact
    integer-ratio ties agree across engines."""
    d = _t(spark, sf_dir, "documents")
    d = d.withColumn("toks", F.split(F.trim(F.col("text")), "\\s+"))
    d = d.withColumn(
        "bi",
        F.when(
            F.size("toks") >= 2,
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(element_at(toks, i), ' ',"
                " element_at(toks, i + 1)))"
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    n_t = F.size("toks").cast("double")
    d_t = F.size(F.array_distinct("toks")).cast("double")
    n_b = F.size("bi").cast("double")
    d_b = F.size(F.array_distinct("bi")).cast("double")
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        (F.round((n_t - d_t) * 10000.0 / n_t, 0) / 10000.0).alias(
            "dup_token_frac"
        ),
        F.when(
            F.size("bi") > 0,
            F.round((n_b - d_b) * 10000.0 / n_b, 0) / 10000.0,
        ).alias("dup_bigram_frac"),
    )


SQL_QUALITY_REPETITION = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), b AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i + 1])
              ELSE [] END AS bi
  FROM t
)
SELECT doc_id,
       len(toks) AS n_tokens,
       round((len(toks) - len(list_distinct(toks))) * 10000.0
             / CAST(len(toks) AS DOUBLE)) / 10000.0 AS dup_token_frac,
       CASE WHEN len(bi) > 0
            THEN round((len(bi) - len(list_distinct(bi))) * 10000.0
                       / CAST(len(bi) AS DOUBLE)) / 10000.0
            END AS dup_bigram_frac
FROM b
"""


def q_contamination(spark, sf_dir):
    """Benchmark-contamination check (the train/eval n-gram-overlap
    audit every pretraining corpus needs): a deterministic 'eval set'
    (doc_id % 97 = 0) contributes its distinct word-3-gram shingles;
    corpus documents sharing any shingle are flagged with their
    distinct-overlap count. Shape at 100 TB: explode shingles on both
    sides, hash-shuffle on the shingle key (or semi-join against a
    broadcast eval-shingle set when the eval side is small — here the
    eval set is tiny so AQE demotes the join to broadcast). 3-grams
    (not the usual 8-13) because the synthetic vocab is ~30 words."""
    d = _t(spark, sf_dir, "documents")
    sh = (
        d.withColumn("toks", F.split(F.trim(F.col("text")), "\\s+"))
        .where(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 2),"
                    " i -> concat(element_at(toks, i), ' ',"
                    " element_at(toks, i + 1), ' ',"
                    " element_at(toks, i + 2)))"
                )
            ).alias("shingle"),
        )
    )
    ev = (
        sh.where(F.col("doc_id") % 97 == 0)
        .select("shingle")
        .distinct()
    )
    corpus = sh.where(F.col("doc_id") % 97 != 0).distinct()
    return (
        corpus.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


SQL_CONTAMINATION = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
           AS shingle
  FROM t WHERE len(toks) >= 3
), ev AS (
  SELECT DISTINCT shingle FROM s WHERE doc_id % 97 = 0
), corpus AS (
  SELECT DISTINCT doc_id, shingle FROM s WHERE doc_id % 97 <> 0
)
SELECT c.doc_id, count(*) AS n_shared_shingles
FROM corpus c JOIN ev USING (shingle)
GROUP BY c.doc_id
"""


def q_feature_hashing(spark, sf_dir):
    """Hashing-trick feature buckets (Weinberger+09, public method):
    per-document sparse bag-of-tokens bucketed into 256 hash buckets
    — the fixed-width featurization that needs no vocabulary build
    (no global dictionary shuffle at 100 TB). Bucket = first md5 hex
    byte of the token (engine-portable, same trick as sample_split);
    output is the sparse (doc_id, bucket, count) triplet form."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("token"),
    )
    return (
        toks.withColumn(
            "bucket", F.substring(F.md5(F.encode("token", "utf-8")), 1, 2)
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_FEATURE_HASHING = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
)
SELECT doc_id, substr(md5(token), 1, 2) AS bucket, count(*) AS n
FROM toks
GROUP BY doc_id, substr(md5(token), 1, 2)
"""


def q_dedup_keep_best(spark, sf_dir):
    """Canonical-document selection (keep-best dedup): after near-dup
    blocking (the prefix-3 content block stands in for the LSH band /
    cluster key — same blocking shape as minhash_near_dup), keep ONE
    best representative per block by quality (longest text wins,
    doc_id tie-break) and report what was dropped. One hash shuffle on
    the block key + a window rank — the canonicalization step a 100 TB
    corpus pipeline runs after near-dup clustering; never all-pairs.
    Non-vacuous: 26 multi-doc blocks at sf0.01."""
    d = _t(spark, sf_dir, "documents")
    blocked = d.select(
        "doc_id", "n_chars", F.substring("text", 1, 3).alias("block")
    )
    wb = Window.partitionBy("block")
    wr = wb.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        blocked.withColumn("n_docs", F.count(F.lit(1)).over(wb))
        .withColumn("rn", F.row_number().over(wr))
        .where((F.col("rn") == 1) & (F.col("n_docs") > 1))
        .select(
            "block",
            F.col("doc_id").alias("best_doc_id"),
            F.col("n_chars").alias("best_n_chars"),
            "n_docs",
            (F.col("n_docs") - F.lit(1)).alias("n_dropped"),
        )
    )


SQL_DEDUP_KEEP_BEST = """
WITH blocked AS (
  SELECT doc_id, n_chars, substr(text, 1, 3) AS block,
         count(*) OVER (PARTITION BY substr(text, 1, 3)) AS n_docs,
         row_number() OVER (PARTITION BY substr(text, 1, 3)
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
SELECT block, doc_id AS best_doc_id, n_chars AS best_n_chars,
       n_docs, n_docs - 1 AS n_dropped
FROM blocked WHERE rn = 1 AND n_docs > 1
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified downsampling (per-language quota — the
    corpus-rebalancing op before training): the dominant stratum (en)
    is kept at a fixed 1/4 hash-rate while minority languages pass
    through, using the same md5-bucket trick as sample_split so the
    sample is reproducible across engines, runs, partition layouts,
    and cluster sizes (unlike ``df.sampleBy``, whose seeded rand() is
    partition-layout-dependent). Pure narrow filter — no shuffle."""
    d = _t(spark, sf_dir, "documents")
    b = F.substring(
        F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8")), 1, 2
    )
    keep = (F.col("lang") != "en") | (b <= "3f")
    return d.where(keep).select("doc_id", "lang", b.alias("bucket"))


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang,
       substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
FROM documents
WHERE lang <> 'en'
   OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '3f'
"""


def q_tfidf_topk(spark, sf_dir):
    """TF-IDF top-5 terms per document — the classic two-shuffle
    distributed featurization: per-doc term counts (shuffle on
    (doc_id, token)), document frequencies (tiny agg on token), join
    back, score, window top-k. Only the ONE-ROW corpus total is
    broadcast explicitly; the df table joins normally (at web scale
    the vocabulary is itself huge — AQE picks broadcast when it fits).
    Ranking uses the 4-dec-ROUNDED score (+ token tie-break) so rank
    order is engine-portable (raw-double ordering can ulp-flip)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("n"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "token",
            "n",
            "df",
            F.round(
                F.col("n")
                * F.log(
                    F.col("n_total").cast("double")
                    / F.col("df").cast("double")
                ),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("doc_id", "token", "n", "df", "tfidf", "rn")
    )


SQL_TFIDF_TOPK = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS n FROM toks GROUP BY doc_id, token
), dfreq AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
), total AS (
  SELECT count(*) AS n_total FROM documents
), scored AS (
  SELECT tf.doc_id, tf.token, tf.n, dfreq.df,
         round(tf.n * ln(CAST(n_total AS DOUBLE) / CAST(df AS DOUBLE)), 4)
           AS tfidf
  FROM tf JOIN dfreq USING (token) CROSS JOIN total
)
SELECT doc_id, token, n, df, tfidf, rn
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, token) AS rn
  FROM scored
)
WHERE rn <= 5
"""


def q_quality_unigram_lm(spark, sf_dir):
    """Unigram-LM quality score per document (the CCNet-style LM
    filtering analog, public method): mean log-probability of the
    doc's tokens under the corpus unigram distribution. Corpus token
    counts are one small agg joined back to the token stream; the
    one-row corpus total is broadcast. Per-token ln(p) is rounded to
    4 dec and summed as exact BIGINT ten-thousandths so the per-doc
    sum is bit-deterministic across engines, partitionings, and
    cluster sizes (double summation order is not)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("token"),
    )
    ctok = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_tok"))
    total = toks.agg(F.count(F.lit(1)).alias("c_total"))
    lp_fixed = F.round(
        F.log(F.col("c_tok").cast("double") / F.col("c_total").cast("double"))
        * 10000
    ).cast("bigint")
    return (
        toks.join(ctok, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(lp_fixed).alias("sum_lp_e4"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("sum_lp_e4")
                / (F.lit(10000.0) * F.col("n_tokens")),
                4,
            ).alias("mean_logprob"),
        )
    )


SQL_QUALITY_UNIGRAM_LM = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
), ctok AS (
  SELECT token, count(*) AS c_tok FROM toks GROUP BY token
), total AS (
  SELECT count(*) AS c_total FROM toks
)
SELECT doc_id, count(*) AS n_tokens,
       round(sum(CAST(round(ln(CAST(c_tok AS DOUBLE)
                               / CAST(c_total AS DOUBLE)) * 10000)
                      AS BIGINT))
             / (10000.0 * count(*)), 4) AS mean_logprob
FROM toks JOIN ctok USING (token) CROSS JOIN total
GROUP BY doc_id
"""


# PII patterns (Java regex == RE2 subset: char classes, \\b, \\d only)
_PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IP_RE = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"


def q_pii_redact(spark, sf_dir):
    """PII redaction (the scrub pass every public training-data
    pipeline runs — C4/Dolma-style): regex-replace emails and IPv4
    addresses with typed placeholder tokens and count what was hit.
    The synthetic corpus carries no natural PII, so PII is INJECTED
    deterministically first (docs with doc_id%3==0 get one email +
    one IP) — the injection is part of the query in both engines, so
    the redaction itself is what's oracle-checked, on both dirty and
    clean rows. Pure narrow projection: regexps run JVM-side
    (whole-stage codegen), no shuffle, no UDF."""
    d = _t(spark, sf_dir, "documents")
    dirty = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1 "),
            F.col("text"),
        ),
    ).otherwise(F.col("text"))
    red = F.regexp_replace(
        F.regexp_replace(dirty, _PII_EMAIL_RE, "<EMAIL>"),
        _PII_IP_RE,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(dirty, F.lit(_PII_EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(dirty, F.lit(_PII_IP_RE), 0)).alias(
            "n_ips"
        ),
        F.substring(red, 1, 80).alias("redacted_prefix"),
    )


SQL_PII_REDACT = f"""
WITH dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN 'contact user' || CAST(doc_id AS VARCHAR)
                   || '@mail.example.com from 10.'
                   || CAST(doc_id % 256 AS VARCHAR) || '.0.1 ' || text
              ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{_PII_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(t, '{_PII_IP_RE}')) AS n_ips,
       substr(regexp_replace(regexp_replace(t, '{_PII_EMAIL_RE}', '<EMAIL>',
                                            'g'),
                             '{_PII_IP_RE}', '<IP>', 'g'),
              1, 80) AS redacted_prefix
FROM dirty
"""


def _dirty_documents(spark, sf_dir):
    """Documents with deterministic PII injection (doc_id%3==0 rows get
    one email + one IP) — shared upstream for the corpus-clean queries
    so the funnel's redaction counters are non-vacuous."""
    d = _t(spark, sf_dir, "documents")
    return d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.com from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0.1 "),
                F.col("text"),
            ),
        ).otherwise(F.col("text")),
    )


_SQL_DIRTY_DOCS = """
  SELECT doc_id, lang, source, n_chars,
         CASE WHEN doc_id % 3 = 0
              THEN 'contact user' || CAST(doc_id AS VARCHAR)
                   || '@mail.example.com from 10.'
                   || CAST(doc_id % 256 AS VARCHAR) || '.0.1 ' || text
              ELSE text END AS text
  FROM documents
"""

_SQL_CLEAN_FLAGS = f"""
WITH dirty AS ({_SQL_DIRTY_DOCS}
), f AS (
  SELECT doc_id, lang, source, text,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         round((len(regexp_split_to_array(trim(text), '\\s+'))
                - len(list_distinct(regexp_split_to_array(trim(text),
                                                          '\\s+'))))
               * 10000.0
               / CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                      AS DOUBLE)) / 10000.0 AS dup_frac,
         row_number() OVER (PARTITION BY sha256(text)
                            ORDER BY doc_id) AS rn
  FROM dirty
), k AS (
  SELECT *, (rn = 1) AS keep_dedup,
         (rn = 1 AND n_tokens BETWEEN {clean.MIN_TOKENS}
                                  AND {clean.MAX_TOKENS}) AS keep_len,
         (rn = 1 AND n_tokens BETWEEN {clean.MIN_TOKENS}
                                  AND {clean.MAX_TOKENS}
             AND dup_frac <= {clean.MAX_DUP_FRAC}) AS keep_rep
  FROM f
)
SELECT *,
       (keep_rep AND lang IN ('en', 'fr', 'es', 'de')) AS keep_lang,
       len(regexp_extract_all(text, '{_PII_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{_PII_IP_RE}')) AS n_ips
FROM k
"""


def q_clean_funnel(spark, sf_dir):
    """Corpus-cleaning funnel report (crawlfe/clean.py): exact dedup →
    length bounds → repetition → language keep-set, all flags from ONE
    scan (the only shuffle is the content-hash window), waterfall
    counts from ONE aggregation. The composition every 100 TB
    pre-training pipeline runs; per-stage re-scans would read the
    corpus five times instead of once."""
    return clean.funnel(clean.flag_docs(_dirty_documents(spark, sf_dir)))


SQL_CLEAN_FUNNEL = f"""
WITH flags AS ({_SQL_CLEAN_FLAGS}
), a AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
         CAST(sum(CASE WHEN keep_dedup THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_dedup,
         CAST(sum(CASE WHEN keep_len THEN 1 ELSE 0 END) AS BIGINT)
           AS length,
         CAST(sum(CASE WHEN keep_rep THEN 1 ELSE 0 END) AS BIGINT)
           AS repetition,
         CAST(sum(CASE WHEN keep_lang THEN 1 ELSE 0 END) AS BIGINT)
           AS lang
  FROM flags
)
SELECT 0 AS stage_idx, 'total' AS stage, total AS n_kept,
       CAST(0 AS BIGINT) AS n_dropped_here FROM a
UNION ALL
SELECT 1, 'exact_dedup', exact_dedup, total - exact_dedup FROM a
UNION ALL
SELECT 2, 'length', length, exact_dedup - length FROM a
UNION ALL
SELECT 3, 'repetition', repetition, length - repetition FROM a
UNION ALL
SELECT 4, 'lang', lang, repetition - lang FROM a
"""


def q_clean_docs(spark, sf_dir):
    """The cleaned-corpus output of the funnel: surviving rows with
    PII-redacted text (redaction flags are counters, never drops)."""
    out = clean.corpus_clean(_dirty_documents(spark, sf_dir))
    return out.select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        "n_emails",
        "n_ips",
        F.substring("text", 1, 80).alias("clean_prefix"),
    )


SQL_CLEAN_DOCS = f"""
WITH flags AS ({_SQL_CLEAN_FLAGS}
)
SELECT doc_id, lang, source, n_tokens, n_emails, n_ips,
       substr(regexp_replace(regexp_replace(text, '{_PII_EMAIL_RE}',
                                            '<EMAIL>', 'g'),
                             '{_PII_IP_RE}', '<IP>', 'g'),
              1, 80) AS clean_prefix
FROM flags WHERE keep_lang
"""


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 (pricing summary report) — the canonical wide-agg
    probe: scan → pushed date filter → hash agg on a 6-ish-key group
    with 8 aggregates. Map-side partial aggregation collapses ~all
    rows before the (tiny) shuffle, so at 100 TB the exchange carries
    kilobytes. All sums use the scaled-integer pattern (round to the
    value grid, sum as BIGINT, divide back) so group totals are
    bit-deterministic across engines and partition orders — raw
    double summation order is not associative."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def e(c, scale):
        return F.sum(F.round(c * scale, 0).cast("bigint")) / F.lit(scale)

    n = F.count(F.lit(1))
    return (
        li.where(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            e(F.col("l_quantity"), 100.0).alias("sum_qty"),
            e(F.col("l_extendedprice"), 100.0).alias("sum_base_price"),
            e(disc_price, 10000.0).alias("sum_disc_price"),
            e(charge, 1000000.0).alias("sum_charge"),
            F.round(
                e(F.col("l_quantity"), 100.0) / n.cast("double"), 4
            ).alias("avg_qty"),
            F.round(
                e(F.col("l_extendedprice"), 100.0) / n.cast("double"), 4
            ).alias("avg_price"),
            F.round(
                e(F.col("l_discount"), 100.0) / n.cast("double"), 4
            ).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity * 100.0) AS BIGINT)) / 100.0 AS sum_qty,
       sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0
         AS sum_base_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0)
                AS BIGINT)) / 10000.0 AS sum_disc_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                      * 1000000.0) AS BIGINT)) / 1000000.0 AS sum_charge,
       round(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) / 100.0
             / count(*), 4) AS avg_qty,
       round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0
             / count(*), 4) AS avg_price,
       round(sum(CAST(round(l_discount * 100.0) AS BIGINT)) / 100.0
             / count(*), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""



def q_seq_pack(spark, sf_dir):
    """Sequence packing for LLM pre-training (the GPT-style
    concat-and-chunk step, public method): concatenate documents in a
    deterministic order and slice the token stream into fixed-budget
    training sequences. The packing cumsum is a running-total window —
    done GLOBALLY that is a single-partition serial scan, so the
    engine packs WITHIN each source shard (Window.partitionBy(source))
    and shards pack in parallel; at 100 TB each shard's window is an
    independent partition-local sort, no global ordering anywhere.
    Emits one row per (shard, sequence) with fill statistics; a doc
    whose tokens straddle a boundary counts toward the sequence its
    first token lands in (exclusive cumsum), exactly like the
    chunked-concat dataloader."""
    budget = 4096
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.select(
        "source", "doc_id", toks.alias("n_tokens")
    ).withColumn(
        "seq_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget
        ).cast("bigint"),
    )
    return (
        packed.groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


SQL_SEQ_PACK = """
WITH t AS (
  SELECT source, doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
), c AS (
  SELECT source, doc_id, n_tokens,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY source
                                         ORDER BY doc_id) - n_tokens)
                    / 4096) AS BIGINT) AS seq_id
  FROM t
)
SELECT source, seq_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
FROM c GROUP BY source, seq_id
"""


def q_vocab_topv(spark, sf_dir):
    """Vocabulary construction (top-V word-level vocab, the tokenizer
    bootstrap every corpus pipeline runs): corpus-wide token counts →
    keep the V most frequent (count desc, token asc tie-break) →
    vocab id = dense rank. The token agg does map-side partial combine
    so the shuffle carries one row per distinct token per task; the
    top-V cut is `orderBy().limit(V)` — TakeOrderedAndProject, a
    per-partition heap + driver merge of V rows per partition, so even
    a 100M-token web vocabulary never funnels through a
    single-partition global sort. The rank window that assigns ids
    then runs over exactly V rows."""
    V = 500
    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select(
            F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(V)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return top.select(
        F.row_number().over(w).alias("vocab_id"), "token", "n"
    )


SQL_VOCAB_TOPV = """
WITH counts AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
), agg AS (
  SELECT token, count(*) AS n FROM counts GROUP BY token
)
SELECT vocab_id, token, n
FROM (
  SELECT *, row_number() OVER (ORDER BY n DESC, token) AS vocab_id
  FROM agg
)
WHERE vocab_id <= 500
"""


def q_shard_assign(spark, sf_dir):
    """Deterministic dataloader sharding: every doc gets a stable
    (shard, position) so N training workers read disjoint, reproducible
    slices regardless of partition layout or cluster size. Shard =
    md5-bucket of doc_id mod 8 (content-independent, layout-independent
    — the same trick as sample_split); position = row_number within
    shard ordered by doc_id. One hash shuffle on shard; positions are
    partition-local windows."""
    n_shards = 8
    d = _t(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8")),
                1,
                6,
            ),
            16,
            10,
        ).cast("bigint")
        % n_shards
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    return (
        d.select("doc_id", "lang", shard.alias("shard"))
        .withColumn("position", F.row_number().over(w))
    )


SQL_SHARD_ASSIGN = """
WITH s AS (
  SELECT doc_id, lang,
         CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
                   AS BIGINT) % 8 AS BIGINT) AS shard
  FROM documents
)
SELECT doc_id, lang, shard,
       row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS position
FROM s
"""
