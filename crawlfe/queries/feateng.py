"""Feature-eng pack #60 (r4): model-input transforms.

The last classic feature-engineering transforms the registry lacked:
hashed CROSS FEATURES with support pruning (the hashing-trick cross
table every CTR pipeline builds), the rank-based INVERSE-NORMAL
TRANSFORM (Blom ranks through an Acklam probit — one shared SQL
expression string evaluated by BOTH engines, so the DuckDB twin is
the literally-identical formula), and ISOTONIC CALIBRATION by
pool-adjacent-violators (inherently sequential per group, so it runs
as a grouped-map pandas kernel — the documented non-SQL path — with a
brute pytest oracle).
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ._shared import _t

_CROSS_MIN_N = 5  # support threshold for emitted cross features


def q_feature_cross(spark, sf_dir):
    """Hashed CROSS-FEATURE table: event_type × value-band × weekday
    crosses with support ≥ 5, each assigned a stable 32-bit hashed
    feature id (md5 of the 'et|band|dow' key — the hashing trick, so
    the id space is fixed no matter how many crosses exist).  Output
    also carries the exact positive rate of each cross against the
    purchase label, which is what the cross is FOR (a lookup feature).

    One narrow projection → one hash agg on the cross key → support
    filter; the id is a codegen md5 of the group key AFTER
    aggregation (O(crosses), not O(rows)).  At 100 TB the cross
    table is the broadcast side of the next join."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.when(F.col("value") < 10, "low")
        .when(F.col("value") < 100, "mid")
        .otherwise("high")
        .alias("band"),
        F.pmod(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("bigint")
            + 3,
            F.lit(7),
        ).alias("dow"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .cast("bigint")
        .alias("pos"),
    )
    agg = base.groupBy("event_type", "band", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    key = F.concat_ws(
        "|", F.col("event_type"), F.col("band"), F.col("dow").cast("string")
    )
    return agg.where(F.col("n") >= _CROSS_MIN_N).select(
        "event_type",
        "band",
        F.col("dow").cast("bigint").alias("dow"),
        F.conv(F.substring(F.md5(F.encode(key, "utf-8")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("feat_id"),
        "n",
        F.round(
            F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
        ).alias("pos_rate"),
    )


SQL_FEATURE_CROSS = f"""
WITH base AS (
  SELECT event_type,
         CASE WHEN value < 10 THEN 'low'
              WHEN value < 100 THEN 'mid' ELSE 'high' END AS band,
         (CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) + 3) % 7 AS dow,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
), agg AS (
  SELECT event_type, band, dow,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS n_pos
  FROM base GROUP BY 1, 2, 3
)
SELECT event_type, band, CAST(dow AS BIGINT) AS dow,
       CAST(CAST('0x' || substr(md5(event_type || '|' || band || '|'
                                 || CAST(dow AS VARCHAR)), 1, 8)
                 AS UBIGINT) AS BIGINT) AS feat_id,
       n,
       round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate
FROM agg WHERE n >= {_CROSS_MIN_N}
"""


# Acklam's inverse-normal-CDF rational approximation (P. J. Acklam,
# 2003; public algorithm, |rel err| < 1.15e-9): one SQL expression
# string over a column named {p}, evaluated VERBATIM by both Spark
# (F.expr) and DuckDB — same parse tree, same IEEE doubles, so parity
# holds to the last ulp of each engine's ln/sqrt.
_PROBIT_SQL = """
CASE
  WHEN {p} < 0.02425 THEN
    (((((-7.784894002430293e-03 * sqrt(-2.0 * ln({p}))
        - 3.223964580411365e-01) * sqrt(-2.0 * ln({p}))
        - 2.400758277161838e+00) * sqrt(-2.0 * ln({p}))
        - 2.549732539343734e+00) * sqrt(-2.0 * ln({p}))
        + 4.374664141464968e+00) * sqrt(-2.0 * ln({p}))
        + 2.938163982698783e+00)
    / ((((7.784695709041462e-03 * sqrt(-2.0 * ln({p}))
        + 3.224671290700398e-01) * sqrt(-2.0 * ln({p}))
        + 2.445134137142996e+00) * sqrt(-2.0 * ln({p}))
        + 3.754408661907416e+00) * sqrt(-2.0 * ln({p})) + 1.0)
  WHEN {p} > 0.97575 THEN
    -((((((-7.784894002430293e-03 * sqrt(-2.0 * ln(1.0 - {p}))
        - 3.223964580411365e-01) * sqrt(-2.0 * ln(1.0 - {p}))
        - 2.400758277161838e+00) * sqrt(-2.0 * ln(1.0 - {p}))
        - 2.549732539343734e+00) * sqrt(-2.0 * ln(1.0 - {p}))
        + 4.374664141464968e+00) * sqrt(-2.0 * ln(1.0 - {p}))
        + 2.938163982698783e+00)
    / ((((7.784695709041462e-03 * sqrt(-2.0 * ln(1.0 - {p}))
        + 3.224671290700398e-01) * sqrt(-2.0 * ln(1.0 - {p}))
        + 2.445134137142996e+00) * sqrt(-2.0 * ln(1.0 - {p}))
        + 3.754408661907416e+00) * sqrt(-2.0 * ln(1.0 - {p})) + 1.0))
  ELSE
    (((((-3.969683028665376e+01 * (({p} - 0.5) * ({p} - 0.5))
        + 2.209460984245205e+02) * (({p} - 0.5) * ({p} - 0.5))
        - 2.759285104469687e+02) * (({p} - 0.5) * ({p} - 0.5))
        + 1.383577518672690e+02) * (({p} - 0.5) * ({p} - 0.5))
        - 3.066479806614716e+01) * (({p} - 0.5) * ({p} - 0.5))
        + 2.506628277459239e+00) * ({p} - 0.5)
    / (((((-5.447609879822406e+01 * (({p} - 0.5) * ({p} - 0.5))
        + 1.615858368580409e+02) * (({p} - 0.5) * ({p} - 0.5))
        - 1.556989798598866e+02) * (({p} - 0.5) * ({p} - 0.5))
        + 6.680131188771972e+01) * (({p} - 0.5) * ({p} - 0.5))
        - 1.328068155288572e+01) * (({p} - 0.5) * ({p} - 0.5)) + 1.0)
END
"""


def q_rank_int(spark, sf_dir):
    """Rank-based INVERSE-NORMAL TRANSFORM of purchase values (the
    Blom variant, standard in GWAS and robust feature pipelines):
    p = (rank − 3/8)/(n + 1/4) over a deterministic (cents, event_id)
    ordering, then z = Φ⁻¹(p) via Acklam's rational probit — the SAME
    expression string both engines evaluate, see _PROBIT_SQL.  The
    result is exactly-normal-marginal features no matter how skewed
    the raw values.

    INT needs a GLOBAL rank, but a global row_number window would
    single-partition the sort.  Histogram-first instead (the
    `mann_whitney` pattern): the cents histogram (O(distinct values)
    rows) takes the only global cumsum window, and each raw row's
    global rank is cum_before(cents) + its row_number WITHIN its
    cents partition (a well-partitioned window) — no all-rows global
    sort anywhere."""
    ev = _t(spark, sf_dir, "events")
    base = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    hist = base.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    wh = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "cents",
        (F.sum("ct").over(wh) - F.col("ct")).cast("bigint").alias(
            "cum_before"
        ),
    )
    n = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wc = Window.partitionBy("cents").orderBy("event_id")
    ranked = (
        base.withColumn("rn_in", F.row_number().over(wc).cast("bigint"))
        .join(F.broadcast(cum), "cents")
        .withColumn("rn", (F.col("cum_before") + F.col("rn_in")))
        .crossJoin(F.broadcast(n))
    )
    p = (
        (F.col("rn").cast("double") - F.lit(0.375))
        / (F.col("n").cast("double") + F.lit(0.25))
    )
    ranked = ranked.withColumn("p", p)
    return ranked.select(
        "event_id",
        "cents",
        F.round("p", 6).alias("p_blom"),
        F.round(F.expr(_PROBIT_SQL.format(p="p")), 4).alias("z_int"),
    )


SQL_RANK_INT = f"""
WITH base AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), ranked AS (
  SELECT event_id, cents,
         CAST(row_number() OVER (ORDER BY cents, event_id) AS BIGINT)
           AS rn,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM base
), withp AS (
  SELECT event_id, cents,
         (CAST(rn AS DOUBLE) - 0.375) / (CAST(n AS DOUBLE) + 0.25) AS p
  FROM ranked
)
SELECT event_id, cents, round(p, 6) AS p_blom,
       round({_PROBIT_SQL.format(p='p')}, 4) AS z_int
FROM withp
"""


def q_isotonic_calibration(spark, sf_dir):
    """ISOTONIC CALIBRATION by pool-adjacent-violators: the monotone
    step function mapping the value-score to P(purchase), fit per
    day-of-month cohort.  PAV is inherently sequential (each pool may
    merge backward arbitrarily far), so this is a grouped-map pandas
    kernel over per-(day, cents) count/positive pre-aggregates — the
    documented applyInPandas path, like `ewma`.  The shuffle moves
    only O(distinct cents) rows per group, never raw events; the
    kernel is vectorized numpy except the O(levels) pool loop.

    Rows-only key (PAV has no portable SQL form); brute pytest parity
    in tests/test_featpack60.py.  Output: one row per fitted step
    (day, cents, n, n_pos, rate_cal)."""
    import numpy as np

    ev = _t(spark, sf_dir, "events")
    base = (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .select(
            F.dayofmonth("ts").cast("int").alias("day"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .cast("bigint")
            .alias("pos"),
        )
        .groupBy("day", "cents")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
        )
    )

    schema = (
        "day int, cents bigint, n bigint, n_pos bigint, rate_cal double"
    )

    def pav(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("cents", ignore_index=True)
        # pools as (weight, positives) with exact integer sums
        w = pdf["n"].to_numpy(dtype="int64")
        y = pdf["n_pos"].to_numpy(dtype="int64")
        pool_w, pool_y, idx = [], [], []
        for i in range(len(pdf)):
            pool_w.append(int(w[i]))
            pool_y.append(int(y[i]))
            idx.append(i)
            # merge while the rate decreases (violates monotonicity):
            # compare as cross-multiplied integers — no float drift
            while (
                len(pool_w) > 1
                and pool_y[-1] * pool_w[-2] < pool_y[-2] * pool_w[-1]
            ):
                wlast, ylast = pool_w.pop(), pool_y.pop()
                pool_w[-1] += wlast
                pool_y[-1] += ylast
                idx.pop()
        rate = np.empty(len(pdf), dtype="float64")
        bounds = idx + [len(pdf)]
        for j in range(len(pool_w)):
            rate[bounds[j]: bounds[j + 1]] = pool_y[j] / pool_w[j]
        out = pdf[["day", "cents", "n", "n_pos"]].copy()
        out["rate_cal"] = np.round(rate, 6)
        return out

    return base.groupBy("day").applyInPandas(pav, schema)
