"""Feature-eng packs #11-#12: remaining TPC-H shapes (Q2/Q9/Q11/Q12/Q20), calendar/coverage features.

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
# Feature-eng pack #11: the last TPC-H shapes (Q2/Q9/Q11/Q12/Q20 adapted
# to this column subset — all 22 classic shapes now present) + per-domain
# document cap (crawl-curation sampling)
# --------------------------------------------------------------------------

def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): the fixture has no
    partsupp, so supply cost is derived from lineitem — per
    (part, supplier) the MIN unit price in exact cents (one IEEE
    divide + round per row, then integer min). The classic correlated
    min subquery becomes a per-part window min compared for equality —
    one shuffle on p_partkey, no rescan. LARGE parts only; supplier
    name/nation attached from broadcast dims."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == "LARGE")
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    unit_cents = F.expr(
        "CAST(round(100 * l_extendedprice / l_quantity) AS BIGINT)"
    )
    cost = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_partkey", "l_suppkey", unit_cents.alias("uc"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("uc").alias("supply_cents"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn(
        "min_cents", F.min("supply_cents").over(w)
    ).where(F.col("supply_cents") == F.col("min_cents"))
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            "n_name",
            F.round(F.col("supply_cents") / 100.0, 2).alias("supplycost"),
        )
    )


SQL_TPCH_Q2 = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(100 * l_extendedprice / l_quantity) AS BIGINT))
           AS supply_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'LARGE'
  GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, l_suppkey, supply_cents,
         min(supply_cents) OVER (PARTITION BY l_partkey) AS min_cents
  FROM cost
)
SELECT l_partkey AS p_partkey, s_suppkey, s_name, n_name,
       round(supply_cents / 100.0, 2) AS supplycost
FROM best
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE supply_cents = min_cents
"""


def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by nation and year): revenue
    of 'red'-named parts grouped by the SUPPLIER's nation and order
    year (the fixture has no partsupp supplycost, so profit = revenue).
    Broadcast part/supplier/nation dims; the two fact tables sort-merge
    on orderkey."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("o_year"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("sum_profit")
    )


SQL_TPCH_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_profit
FROM lineitem, orders, part, supplier, nation
WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 shape (important stock value): per-part traded value
    from suppliers of nations {0,1,2}, keeping parts whose value
    exceeds 1/2000 of the total — the classic uncorrelated
    scalar-subquery HAVING. Values are exact integer cents; the
    threshold compare is value_cents * 2000 > total_cents, pure
    bigints, so no engine can ulp-flip a boundary part. The 1-row
    total broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    s = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey").isin(0, 1, 2))
        .select("s_suppkey")
    )
    cents = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select("l_partkey", cents.alias("cents"))
        .groupBy("l_partkey")
        .agg(F.sum("cents").alias("value_cents"))
        # val feeds BOTH the total and the output filter; materialize
        # the |parts|-row agg so the fact table is scanned once.
        .localCheckpoint(eager=False)
    )
    total = val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") * 2000 > F.col("total_cents"))
        .select(
            "l_partkey",
            F.round(F.col("value_cents") / 100.0, 2).alias("part_value"),
        )
    )


SQL_TPCH_Q11 = """
WITH val AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_cents
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey IN (0, 1, 2)
  GROUP BY l_partkey
)
SELECT l_partkey, round(value_cents / 100.0, 2) AS part_value
FROM val
WHERE value_cents * 2000 > (SELECT sum(value_cents) FROM val)
"""


def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape (late shipments by priority class): lineitems
    shipped more than 90 days after the order date in 1996-1997,
    bucketed by ship year (standing in for shipmode), counting
    high-priority (1-URGENT/2-HIGH) vs low-priority orders — the
    classic join + CASE-sum report. One fact-fact join, one agg, all
    integer counts."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).where(
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        & F.year("l_shipdate").isin(1996, 1997)
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("bigint")
    return j.groupBy(F.year("l_shipdate").alias("ship_year")).agg(
        F.sum(hi).alias("high_line_count"),
        F.sum(1 - hi).alias("low_line_count"),
    )


SQL_TPCH_Q12 = """
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND year(l_shipdate) IN (1996, 1997)
GROUP BY ship_year
"""


def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 shape (suppliers with excess share): suppliers who
    shipped MORE THAN HALF of some ECONOMY part's total quantity —
    the classic exists-with-aggregate-subquery, decorrelated to
    per-(part,supplier) sums + a per-part window total, compared as
    exact integers (2*supp_qty > total_qty). Distinct suppliers out,
    name attached from the broadcast dim."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    qty = F.expr("CAST(l_quantity AS BIGINT)")
    per_ps = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_partkey", "l_suppkey", qty.alias("qty"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qty").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = per_ps.withColumn(
        "total_qty", F.sum("supp_qty").over(w)
    ).where(F.col("supp_qty") * 2 > F.col("total_qty"))
    return (
        dominant.select("l_suppkey")
        .distinct()
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name")
    )


SQL_TPCH_Q20 = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_quantity AS BIGINT)) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'ECONOMY'
  GROUP BY l_partkey, l_suppkey
), dominant AS (
  SELECT DISTINCT l_suppkey
  FROM (
    SELECT l_suppkey, supp_qty,
           sum(supp_qty) OVER (PARTITION BY l_partkey) AS total_qty
    FROM per_ps
  )
  WHERE supp_qty * 2 > total_qty
)
SELECT s_suppkey, s_name
FROM dominant JOIN supplier ON l_suppkey = s_suppkey
"""


def q_domain_cap(spark, sf_dir):
    """Per-domain document cap (crawl-curation sampling: at most K docs
    per source so no site dominates the corpus). The kept subset is
    chosen by deterministic hash order — row_number over
    (md5(doc_id), doc_id) within each source — so any engine, layout,
    or cluster size keeps the SAME documents. One window shuffle on
    the small source key; at 100 TB sources are the partition key and
    AQE handles the hot ones."""
    k = 10
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("doc_id", "source", "rn")
    )


SQL_DOMAIN_CAP = """
SELECT doc_id, source, rn
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= 10
"""


# --------------------------------------------------------------------------
# Feature-eng pack #12: calendar feature extraction, coverage/integrity
# audit, deterministic negative sampling, grouped median imputation
# --------------------------------------------------------------------------

def q_calendar_features(spark, sf_dir):
    """Calendar feature extraction (the one-hot-able time features every
    temporal model starts with): ISO day-of-week, hour, month,
    is_weekend, days since epoch — all JVM datetime built-ins inside
    one narrow projection; nothing shuffles."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        _us("ts").alias("ts_us"),
        (F.expr("weekday(ts)") + 1).alias("iso_dow"),
        F.hour("ts").alias("hh"),
        F.month("ts").alias("mm"),
        (F.expr("weekday(ts)") >= 5).cast("int").alias("is_weekend"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .alias("epoch_day"),
    )


SQL_CALENDAR_FEATURES = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CAST(isodow(ts) AS INT) AS iso_dow,
       CAST(hour(ts) AS INT) AS hh,
       CAST(month(ts) AS INT) AS mm,
       CAST(isodow(ts) >= 6 AS INT) AS is_weekend,
       CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INT)
         AS epoch_day
FROM events
"""


def q_dormant_audit(spark, sf_dir):
    """Coverage/integrity audit (the pipeline-health report a feature
    store runs before training): per nation, customers with NO events
    (dormant) vs total, with the dormancy rate. LEFT ANTI join against
    the distinct event actors (shuffle on the key, events pre-shrunk
    to distinct user_ids map-side), then a broadcast nation count —
    integer-exact counts, one 6dp rate divide."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    actors = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey")
    ).distinct()
    dormant = c.join(actors, "c_custkey", "left_anti")
    per_nation = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    return (
        dormant.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_dormant"))
        .join(F.broadcast(per_nation), "c_nationkey")
        .select(
            "c_nationkey",
            "n_dormant",
            "n_customers",
            F.round(
                F.col("n_dormant") / F.col("n_customers"), 6
            ).alias("dormant_rate"),
        )
    )


SQL_DORMANT_AUDIT = """
WITH dormant AS (
  SELECT c_custkey, c_nationkey FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
), per_nation AS (
  SELECT c_nationkey, count(*) AS n_customers FROM customer
  GROUP BY c_nationkey
)
SELECT d.c_nationkey, CAST(count(*) AS BIGINT) AS n_dormant,
       n_customers,
       round(count(*) * 1.0 / n_customers, 6) AS dormant_rate
FROM dormant d JOIN per_nation p ON d.c_nationkey = p.c_nationkey
GROUP BY d.c_nationkey, n_customers
"""


def q_negative_sample(spark, sf_dir):
    """Deterministic negative sampling (contrastive-training pairs):
    k=4 pseudo-random negatives per anchor doc via the hash-style map
    neg = (31*doc + 17*i + 7) mod N, skipping self-collisions. No RNG
    state — any engine, layout, or retry produces the same pairs. One
    broadcast of the 1-row corpus count; sequence+explode fan-out,
    no shuffle at all."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count(F.lit(1)).alias("cnt"))
    return (
        d.crossJoin(F.broadcast(n_row))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.lit(4))).alias("i"),
            F.col("cnt"),
        )
        .select(
            "doc_id",
            "i",
            F.expr("(31 * doc_id + 17 * i + 7) % cnt").alias("neg_id"),
        )
        .where(F.col("neg_id") != F.col("doc_id"))
    )


SQL_NEGATIVE_SAMPLE = """
SELECT doc_id, CAST(i AS INT) AS i,
       (31 * doc_id + 17 * i + 7) % cnt AS neg_id
FROM documents
CROSS JOIN (SELECT count(*) AS cnt FROM documents)
CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS i)
WHERE (31 * doc_id + 17 * i + 7) % cnt != doc_id
"""


def q_impute_median(spark, sf_dir):
    """Grouped median imputation (the standard missing-feature fill):
    10% of values are masked by a deterministic rule (event_id % 10 ==
    0 stands in for real missingness), then filled with the per-user
    median of the SURVIVING values. One exact-percentile shuffle on
    the user key, one shuffle join back; medians of doubles are
    element-or-midpoint so the 4dp round is engine-stable."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 10 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(v, 0.5)").alias("med")
    )
    return ev.join(med, "user_id").select(
        "event_id",
        "user_id",
        F.col("v").isNull().cast("int").alias("was_missing"),
        F.round(F.coalesce(F.col("v"), F.col("med")), 4).alias("imputed"),
    )


SQL_IMPUTE_MEDIAN = """
WITH ev AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS v
  FROM events
), med AS (
  SELECT user_id, median(v) AS med FROM ev GROUP BY user_id
)
SELECT event_id, ev.user_id,
       CAST(v IS NULL AS INT) AS was_missing,
       round(COALESCE(v, med), 4) AS imputed
FROM ev JOIN med ON ev.user_id = med.user_id
"""
