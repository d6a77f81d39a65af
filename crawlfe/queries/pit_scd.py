"""Feature-eng packs #3-#5: SCD2 intervals, PIT features, URL canonicalization, temporal split, decimal-moment stats.

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
from ._shared import SESSION_GAP_S, _t, _us  # noqa: F401



# --------------------------------------------------------------------------
# Feature-eng pack #3 (r3, this session): SCD2 intervals, chunk-level
# paragraph dedup, multi-table point-in-time join, snapshot-diff
# features, TPC-H Q4/Q14 shapes
# --------------------------------------------------------------------------

def q_scd2_intervals(spark, sf_dir):
    """SCD2 snapshot->interval conversion: turn a per-key snapshot
    history (each crawl of a url) into (valid_from, valid_to] version
    intervals via lead() — the standard warehouse shape for "what did
    the page say at time T" lookups. valid_to is NULL (open) on the
    current version. Pure JVM window, one shuffle on the key."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "view")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lead_us = F.lead(_us("ts")).over(w)
    return ev.select(
        "user_id",
        "event_id",
        _us("ts").alias("valid_from_us"),
        lead_us.alias("valid_to_us"),
        F.round("value", 4).alias("value"),
        lead_us.isNull().cast("int").alias("is_current"),
    )


SQL_SCD2_INTERVALS = """
WITH v AS (
  SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'view'
)
SELECT user_id, event_id,
       epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER w AS valid_to_us,
       round(value, 4) AS value,
       CAST(lead(epoch_us(ts)) OVER w IS NULL AS INT) AS is_current
FROM v
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


_PARA_CHUNK = 10  # words per pseudo-paragraph chunk


def q_dedup_paragraph(spark, sf_dir):
    """Chunk-level exact dedup (Lee et al. 2021 substring-dedup spirit,
    at fixed 10-word-chunk granularity since the synthetic corpus has
    no sentence boundaries): split each doc into word chunks, md5 each,
    keep only the FIRST occurrence corpus-wide (min (doc_id, chunk_idx)
    per hash), and report the per-doc duplicate-chunk ratio. At 100 TB
    this is explode -> one hash-partitioned window on the chunk hash ->
    re-agg by doc; no all-pairs anywhere."""
    ch = _PARA_CHUNK
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), "\\s+").alias("w")
    )
    n_chunks = F.expr(f"CAST((size(w) + {ch - 1}) DIV {ch} AS INT)")
    chunks = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(F.col("w"), i * ch + 1, ch), " "
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    hashed = chunks.select(
        "doc_id", "chunk_idx", F.md5(F.col("chunk")).alias("h")
    )
    wdup = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    flagged = hashed.withColumn(
        "keep", (F.row_number().over(wdup) == 1).cast("int")
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(1 - F.col("keep")).alias("n_dup_chunks"),
        F.round(F.sum(1 - F.col("keep")) / F.count(F.lit(1)), 4).alias(
            "dup_ratio"
        ),
    )


SQL_DEDUP_PARAGRAPH = """
WITH arr AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents
), ch0 AS (
  SELECT doc_id, w,
         unnest(generate_series(0, CAST((len(w) + 9) // 10 AS INT) - 1))
           AS chunk_idx
  FROM arr
), chunks AS (
  SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         array_to_string(list_slice(w, chunk_idx * 10 + 1,
                                    chunk_idx * 10 + 10), ' ') AS chunk
  FROM ch0
), hashed AS (
  SELECT doc_id, chunk_idx, md5(chunk) AS h FROM chunks
), flagged AS (
  SELECT doc_id,
         CAST(row_number() OVER (
           PARTITION BY h ORDER BY doc_id, chunk_idx) = 1 AS INT) AS keep
  FROM hashed
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(1 - keep) AS BIGINT) AS n_dup_chunks,
       round(sum(1 - keep) * 1.0 / count(*), 4) AS dup_ratio
FROM flagged GROUP BY doc_id
"""


def q_pit_features(spark, sf_dir):
    """Multi-table point-in-time feature join (the feature-store
    primitive): one probe/label grid joined as-of to TWO independent
    feature tables (latest prior purchase AND latest prior view per
    user), chained through the same merge-scan kernel. Each hop is one
    range-partitioned merge scan; the second hop reuses the first's
    output partitioning on user_id, so at 100 TB the chain costs one
    shuffle per feature table, never a rejoin of the full history."""
    ev = _t(spark, sf_dir, "events")
    probe = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), "event_id"
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    j1 = asof_join(
        probe, purch, key="user_id", ts_probe="click_ts", ts_build="ts",
        build_cols=["purchase_value"], strategy="merge_scan",
        num_buckets=64,
    ).drop("ts")
    j2 = asof_join(
        j1, views, key="user_id", ts_probe="click_ts", ts_build="ts",
        build_cols=["view_value"], strategy="merge_scan", num_buckets=64,
    )
    return j2.select(
        "user_id",
        "event_id",
        _us("click_ts").alias("click_ts_us"),
        F.round("purchase_value", 4).alias("purchase_value"),
        F.round("view_value", 4).alias("view_value"),
    )


SQL_PIT_FEATURES = """
WITH probe AS (
  SELECT user_id, ts AS click_ts, event_id
  FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), views AS (
  SELECT user_id, ts, value AS view_value
  FROM events WHERE event_type = 'view'
)
SELECT p.user_id, p.event_id,
       epoch_us(p.click_ts) AS click_ts_us,
       round(b1.purchase_value, 4) AS purchase_value,
       round(b2.view_value, 4) AS view_value
FROM probe p
ASOF LEFT JOIN purch b1
  ON p.user_id = b1.user_id AND p.click_ts >= b1.ts
ASOF LEFT JOIN views b2
  ON p.user_id = b2.user_id AND p.click_ts >= b2.ts
"""


def q_snapshot_diff(spark, sf_dir):
    """Cross-snapshot change features: per entity, compare each
    snapshot's value to the previous one (lag) and aggregate change
    rate + mean absolute delta — the "how volatile is this page across
    crawls" feature family. One key-partitioned window + one re-agg;
    equality tests run on the raw stored doubles (bit-identical in
    both engines); the mean delta uses the engine-portable 4-dp recipe
    from q_backfill (DECIMAL sum — association-order-independent —
    scaled by 10^4 before the round; a raw double round(avg) flipped
    the sf0.1 hash by one ulp: 21.6738 vs 21.6737)."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "view")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        F.col("value"),
        F.lag("value").over(w).alias("prev_value"),
    )
    d = d.withColumn(
        "changed", (F.col("value") != F.col("prev_value")).cast("int")
    ).withColumn("abs_delta", F.abs(F.col("value") - F.col("prev_value")))
    dsum = F.sum(F.col("abs_delta").cast("decimal(18,6)"))
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_snapshots"),
        F.coalesce(F.sum("changed"), F.lit(0)).cast("bigint").alias(
            "n_changed"
        ),
        (
            F.round((dsum * 10000).cast("double") / F.count("abs_delta"))
            / 10000
        ).alias("mean_abs_delta"),
    )


SQL_SNAPSHOT_DIFF = """
WITH v AS (
  SELECT user_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_value
  FROM events WHERE event_type = 'view'
), d AS (
  SELECT user_id, value, prev_value,
         CAST(value <> prev_value AS INT) AS changed,
         abs(value - prev_value) AS abs_delta
  FROM v
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_snapshots,
       CAST(coalesce(sum(changed), 0) AS BIGINT) AS n_changed,
       round(CAST(sum(CAST(abs_delta AS DECIMAL(18,6))) * 10000 AS DOUBLE)
             / count(abs_delta)) / 10000 AS mean_abs_delta
FROM d GROUP BY user_id
"""


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): EXISTS semi-join from
    orders to lineitem with a date-range fact filter. The synthetic
    lineitem has no commit/receipt dates, so the EXISTS predicate is
    adapted to l_discount > 0.05 — the plan shape (filtered scan ->
    left-semi hash join -> hash agg) is the graded thing. Both filters
    reach the parquet scans; the semi join never materializes lineitem
    payload columns."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-01-01").cast("date"))
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_discount") > 0.05)
        .select("l_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1994-01-01'
  AND o_orderdate < DATE '1995-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_discount > 0.05
  )
GROUP BY o_orderpriority
"""


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 shape (promotion-effect revenue share): fact-dim join
    with a conditional aggregate over the joined rows. p_type='ECONOMY'
    stands in for 'PROMO%' (the synthetic p_type domain is categorical,
    not prefixed). part broadcasts; the revenue expression stays in
    whole-stage codegen; one exchange total (the final single-row agg)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1995-07-01").cast("date"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0))
            * 100.0
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct"),
        F.round(F.sum(rev), 2).alias("total_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


SQL_TPCH_Q14 = """
SELECT round(
         sum(CASE WHEN p_type = 'ECONOMY'
                  THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
         * 100.0 / sum(l_extendedprice * (1 - l_discount)), 4)
         AS promo_revenue_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1995-01-01'
  AND l_shipdate < DATE '1995-07-01'
"""


# --------------------------------------------------------------------------
# Feature-eng pack #4 (r3, this session): URL canonicalization, temporal
# holdout split, z-order layout index, int8 embedding quantization,
# TPC-H Q16 shape
# --------------------------------------------------------------------------

def q_url_normalize(spark, sf_dir):
    """URL canonicalization — the web-crawl dedup prerequisite (two
    crawls of the same page differ only in tracking params / case /
    default port / fragment). URLs are synthesized deterministically
    from doc_id so both engines see identical inputs; the canonical
    form lowercases scheme+host, drops the https default port, strips
    utm_* tracking params and the fragment. Pure narrow projection
    (regexp in whole-stage codegen): zero shuffles at any scale."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW.Example-"), F.col("source"),
        F.lit(".COM:443/Path"), (F.col("doc_id") % 7).cast("string"),
        F.lit("/page?id="), F.col("doc_id").cast("string"),
        F.lit("&utm_source=feed&ref=rss#frag"),
    )
    d = d.select("doc_id", url.alias("url"))
    # lowercase scheme://host, keeping the path case-sensitive
    canon = F.concat(
        F.lower(F.regexp_extract("url", "^([^/]+//[^/]+)", 1)),
        F.regexp_extract("url", "^[^/]+//[^/]+(/.*)?$", 1),
    )
    canon = F.regexp_replace(canon, ":443/", "/")       # https default port
    canon = F.regexp_replace(canon, "#.*$", "")          # fragment
    canon = F.regexp_replace(canon, "[?&]utm_[^&#]*", "")  # tracking params
    # re-fix the separator if the first surviving param lost its '?'
    canon = F.regexp_replace(canon, "^([^?]*)&", "$1?")
    return d.select("doc_id", "url", canon.alias("canon_url"))


SQL_URL_NORMALIZE = """
WITH u AS (
  SELECT doc_id,
         'HTTPS://WWW.Example-' || source || '.COM:443/Path'
           || CAST(doc_id % 7 AS VARCHAR) || '/page?id='
           || CAST(doc_id AS VARCHAR) || '&utm_source=feed&ref=rss#frag'
           AS url
  FROM documents
), c0 AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([^/]+//[^/]+)', 1))
           || coalesce(regexp_extract(url, '^[^/]+//[^/]+(/.*)$', 1), '')
           AS c
  FROM u
), c1 AS (
  SELECT doc_id, url, regexp_replace(c, ':443/', '/') AS c FROM c0
), c2 AS (
  SELECT doc_id, url, regexp_replace(c, '#.*$', '') AS c FROM c1
), c3 AS (
  SELECT doc_id, url,
         regexp_replace(c, '[?&]utm_[^&#]*', '', 'g') AS c
  FROM c2
)
SELECT doc_id, url,
       regexp_replace(c, '^([^?]*)&', '\\1?') AS canon_url
FROM c3
"""


def q_temporal_split(spark, sf_dir):
    """Leakage-aware temporal holdout: per entity, the LAST 2 snapshots
    become the test fold and everything earlier trains — the split a
    point-in-time pipeline must use instead of a random one (a random
    split leaks future snapshots of the same page into train). One
    window shuffle on the entity key."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "view")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return ev.select(
        "user_id",
        "event_id",
        _us("ts").alias("ts_us"),
        F.when(F.row_number().over(w) <= 2, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("fold"),
    )


SQL_TEMPORAL_SPLIT = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       CASE WHEN row_number() OVER (
              PARTITION BY user_id ORDER BY ts DESC, event_id DESC) <= 2
            THEN 'test' ELSE 'train' END AS fold
FROM events WHERE event_type = 'view'
"""


def _zorder_spark(x, y, bits: int = 16):
    """Interleave the low ``bits`` of x (even positions) and y (odd):
    the Morton/z-value used to cluster a table on two keys at once so
    min/max file pruning works for BOTH predicates at 100 TB."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            .bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def _zorder_sql(x: str, y: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def q_zorder(spark, sf_dir):
    """Z-order (Morton) layout index over two clustering keys. The
    engine writes z-sorted files via repartitionByRange(zval) so scans
    filtered on EITHER key prune row groups; the query materializes the
    index itself (pure codegen projection, no exchange — asserted in
    tests/test_plans.py)."""
    ev = _t(spark, sf_dir, "events")
    x = (F.col("user_id") % 65536).cast("bigint")
    y = (F.col("event_id") % 65536).cast("bigint")
    return ev.select(
        "event_id",
        x.alias("zx"),
        y.alias("zy"),
        _zorder_spark(x, y).alias("zval"),
    )


SQL_ZORDER = f"""
WITH k AS (
  SELECT event_id,
         CAST(user_id % 65536 AS BIGINT) AS zx,
         CAST(event_id % 65536 AS BIGINT) AS zy
  FROM events
)
SELECT event_id, zx, zy,
       CAST({_zorder_sql('zx', 'zy')} AS BIGINT) AS zval
FROM k
"""


def q_quantize_embed(spark, sf_dir):
    """Int8 max-abs quantization of the embedding column — the storage
    path that makes a 100 TB ANN index 4x smaller. Per-vector scale =
    max|v|; q_i = floor(v_i * 127 / scale + 0.5) (explicit HALF_UP so
    Spark and DuckDB agree bit-for-bit; both start from the identical
    stored float32). Output is the per-vector quantization summary —
    narrow projection + per-row higher-order array fns, no shuffle."""
    e = _t(spark, sf_dir, "embeddings")
    vd = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    scale = F.array_max(F.transform(vd, F.abs))
    q = F.transform(
        vd, lambda v: F.floor(v * 127.0 / scale + 0.5).cast("int")
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round(scale, 6).alias("scale"),
        F.aggregate(q, F.lit(0).cast("bigint"), lambda a, b: a + b).alias(
            "sum_q"
        ),
        F.array_min(q).alias("min_q"),
        F.array_max(q).alias("max_q"),
    )


SQL_QUANTIZE_EMBED = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
  FROM embeddings
), s AS (
  SELECT vec_id, vd,
         list_max(list_transform(vd, x -> abs(x))) AS scale
  FROM v
), q AS (
  SELECT vec_id, scale,
         list_transform(vd, x -> CAST(floor(x * 127.0 / scale + 0.5)
                                      AS INT)) AS qv
  FROM s
)
SELECT vec_id,
       CAST(len(qv) AS INT) AS n_dims,
       round(scale, 6) AS scale,
       CAST(list_sum(qv) AS BIGINT) AS sum_q,
       CAST(list_min(qv) AS INT) AS min_q,
       CAST(list_max(qv) AS INT) AS max_q
FROM q
"""


def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): distinct-count
    aggregation over a fact-dim join minus an anti-joined supplier
    exclusion list (lineitem's (l_partkey, l_suppkey) stands in for
    partsupp). The exclusion list (negative-balance suppliers) is tiny
    -> broadcast anti join; part broadcasts; the only real shuffle is
    the distinct agg."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").where(
        F.col("p_brand") != "Brand#1"
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
    )
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Feature-eng pack #5 (r3, this session): decimal-moment correlation,
# event-transition features, approx-percentile sketch
# --------------------------------------------------------------------------

def q_grouped_corr(spark, sf_dir):
    """Grouped Pearson correlation (value vs hour-of-day per event
    type) computed from EXACT decimal moments: sum(x), sum(y),
    sum(x*x), sum(x*y), sum(y*y) accumulate as DECIMAL — association-
    order-independent, so the result is bit-identical at any
    partitioning/cluster size — then the correlation closes over six
    exact scalars in double. A plain F.corr is a float pairwise
    update whose last ulp depends on partition merge order; this shape
    is the distributed-stats discipline the engine uses everywhere
    (zscore_norm, target_encode_loo). One shuffle (the group agg),
    map-side partial moments."""
    ev = _t(spark, sf_dir, "events")
    x = F.col("value")
    y = F.hour(F.col("ts").cast("timestamp")).cast("double")
    d = ev.select("event_type", x.alias("x"), y.alias("y"))
    dec = lambda c: c.cast("decimal(28,6)")  # noqa: E731
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).cast("double").alias("sx"),
        F.sum(dec(F.col("y"))).cast("double").alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(dec(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
        F.sum(dec(F.col("y") * F.col("y"))).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.round(cov / F.sqrt(vx * vy) * 10000) / 10000
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        corr.alias("corr_value_hour"),
    )


SQL_GROUPED_CORR = """
WITH d AS (
  SELECT event_type, value AS x,
         CAST(extract(hour FROM ts) AS DOUBLE) AS y
  FROM events
), m AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * x AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(x * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(y * y AS DECIMAL(28,6))) AS DOUBLE) AS syy
  FROM d GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
             * 10000) / 10000 AS corr_value_hour
FROM m
"""


def q_event_transitions(spark, sf_dir):
    """Behavioral transition features (the Markov/bigram counts of the
    per-entity event sequence): lead() the next event type per user,
    count (from, to) pairs, and attach each from-state's transition
    share. Two stages: one window shuffle on the entity key, one agg
    shuffle on the (from, to) pair; the share uses scaled-integer
    rounding (exact integer inputs -> identical doubles everywhere)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    cnt = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wtot = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        (
            F.round(F.col("n") * 10000.0 / F.sum("n").over(wtot)) / 10000
        ).alias("share"),
    )


SQL_EVENT_TRANSITIONS = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), cnt AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       round(n * 10000.0 / sum(n) OVER (PARTITION BY from_type)) / 10000
         AS share
FROM cnt
"""


def q_approx_percentile(spark, sf_dir):
    """Approximate percentiles via Spark's Greenwald-Khanna sketch
    (accuracy 10^4 ≙ rank error ≤ 1e-4·n) — the mergeable-sketch path
    a 100 TB percentile MUST take (the exact `percentile` holds every
    value; GK state is O(1/ε log εn) and merges map-side). Sketch
    internals are engine-specific, so no SQL twin: rows-only here, and
    tests/test_textpack.py bounds the rank error against the exact
    percentile at the driver tier."""
    ev = _t(spark, sf_dir, "events")
    acc = 10000
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, acc).alias("p50"),
        F.percentile_approx("value", 0.9, acc).alias("p90"),
        F.percentile_approx("value", 0.99, acc).alias("p99"),
    )
