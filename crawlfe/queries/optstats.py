"""Feature-eng pack #127 (r4): optimizer-statistics audits — the
cardinality-estimation error analyses a query engine runs on itself,
next to join_cardinality_est / scan_split_plan / salt_plan.

* ``selectivity_audit`` — the independence assumption on trial:
  for predicate pairs (event_type = 'purchase', value > global
  mean, day <= 15), the estimated conjunctive selectivity
  p1 * p2 vs the actual, with the correlation ratio err =
  actual / est — the number that decides when an optimizer needs
  multi-column stats.
* ``histogram_est_error`` — a 10-bucket equi-depth histogram of
  event cents, then range-predicate selectivity estimated by
  uniform-within-bucket interpolation vs exact, for three ranges —
  the textbook estimator and its real error.
* ``ndv_sample_est`` — distinct-user estimation from the
  deterministic 10% sample (user_id % 10 = 0 over events):
  scale-up, Goodman/GEE (d + (sqrt(1/q) - 1) f1) and Chao2-style
  (d + f1^2/(2 f2)) vs the true NDV.

Scale shape: histograms/samples are one pass + tiny grids;
predicates are counted in ONE aggregate over the fact table (no
per-predicate rescans).
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._shared import _t

_HIST_B = 10
_NDV_MOD = 10  # deterministic 10% "sample": user_id % 10 = 0
# range predicates for the histogram audit, as (lo_q, hi_q) quantile
# positions of the cents distribution
_HIST_RANGES = ((0.05, 0.25), (0.40, 0.60), (0.70, 0.99))


def q_selectivity_audit(spark, sf_dir):
    """INDEPENDENCE-ASSUMPTION audit for three predicate pairs:
    estimated p1*p2 vs actual conjunctive selectivity."""
    e = _t(spark, sf_dir, "events")
    mean_v = e.agg(F.avg("value").alias("mv"))
    j = e.crossJoin(F.broadcast(mean_v))
    p1 = F.col("event_type") == "purchase"
    p2 = F.col("value") > F.col("mv")
    p3 = F.dayofmonth(F.col("ts").cast("timestamp")) <= 15
    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg(p1.cast("double")).alias("s1"),
        F.avg(p2.cast("double")).alias("s2"),
        F.avg(p3.cast("double")).alias("s3"),
        F.avg((p1 & p2).cast("double")).alias("s12"),
        F.avg((p1 & p3).cast("double")).alias("s13"),
        F.avg((p2 & p3).cast("double")).alias("s23"),
    )
    rows = []
    for tag, a, b, ab in (
        ("type&value", "s1", "s2", "s12"),
        ("type&day", "s1", "s3", "s13"),
        ("value&day", "s2", "s3", "s23"),
    ):
        rows.append(
            m.select(
                F.lit(tag).alias("pair"),
                "n",
                F.round(F.col(a) * F.col(b), 6).alias("est_indep"),
                F.round(F.col(ab), 6).alias("actual"),
                F.round(
                    F.col(ab) / (F.col(a) * F.col(b)), 6
                ).alias("corr_ratio"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("pair")


SQL_SELECTIVITY_AUDIT = """
WITH mv AS (
  SELECT avg(value) AS mv FROM events
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    avg(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
      AS s1,
    avg(CASE WHEN value > mv THEN 1.0 ELSE 0.0 END) AS s2,
    avg(CASE WHEN dayofmonth(ts) <= 15 THEN 1.0 ELSE 0.0 END) AS s3,
    avg(CASE WHEN event_type = 'purchase' AND value > mv
        THEN 1.0 ELSE 0.0 END) AS s12,
    avg(CASE WHEN event_type = 'purchase' AND dayofmonth(ts) <= 15
        THEN 1.0 ELSE 0.0 END) AS s13,
    avg(CASE WHEN value > mv AND dayofmonth(ts) <= 15
        THEN 1.0 ELSE 0.0 END) AS s23
  FROM events CROSS JOIN mv
)
SELECT 'type&value' AS pair, n, round(s1 * s2, 6) AS est_indep,
       round(s12, 6) AS actual,
       round(s12 / (s1 * s2), 6) AS corr_ratio
FROM m
UNION ALL
SELECT 'type&day', n, round(s1 * s3, 6), round(s13, 6),
       round(s13 / (s1 * s3), 6) FROM m
UNION ALL
SELECT 'value&day', n, round(s2 * s3, 6), round(s23, 6),
       round(s23 / (s2 * s3), 6) FROM m
ORDER BY pair
"""


def q_histogram_est_error(spark, sf_dir):
    """EQUI-DEPTH-HISTOGRAM selectivity estimates for three cents
    ranges vs exact, with the estimation error."""
    e = _t(spark, sf_dir, "events").select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("c")
    )
    wr = Window.orderBy("c")
    ranked = e.select(
        "c",
        F.row_number().over(wr).cast("double").alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("double")
        .alias("n"),
    )
    # bucket b = ceil(r * B / n); boundaries = max c per bucket
    bounds = (
        ranked.groupBy(
            F.ceil(F.col("r") * _HIST_B / F.col("n"))
            .cast("bigint")
            .alias("b")
        )
        .agg(
            F.max("c").cast("double").alias("hi"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
        .localCheckpoint(eager=True)
    )
    lo_b = bounds.select(
        "b",
        "hi",
        "cnt",
        F.lag("hi")
        .over(Window.orderBy("b"))
        .alias("lo"),
    )
    mn = e.agg(
        F.min("c").cast("double").alias("cmin"),
        F.count(F.lit(1)).cast("bigint").alias("ntot"),
    )
    hist = lo_b.crossJoin(F.broadcast(mn)).select(
        "b",
        F.coalesce(F.col("lo"), F.col("cmin") - 1).alias("lo"),
        "hi",
        "cnt",
        "ntot",
    ).localCheckpoint(eager=True)

    # query ranges from exact quantile positions of the SAME data
    q = e.select(
        "c",
        ((F.row_number().over(wr) - 1).cast("double")).alias("r0"),
    ).crossJoin(
        F.broadcast(
            e.agg(
                (F.count(F.lit(1)) - 1)
                .cast("double")
                .alias("m")
            )
        )
    )
    rows = []
    for i, (a, bq) in enumerate(_HIST_RANGES):
        cuts = q.where(
            (F.col("r0") == F.floor(F.col("m") * a))
            | (F.col("r0") == F.floor(F.col("m") * bq))
        ).agg(
            F.min("c").cast("double").alias("qa"),
            F.max("c").cast("double").alias("qb"),
        )
        j = hist.crossJoin(F.broadcast(cuts))
        ov = F.greatest(
            F.lit(0.0),
            F.least(F.col("hi"), F.col("qb"))
            - F.greatest(F.col("lo"), F.col("qa")),
        )
        est = j.agg(
            F.sum(
                F.col("cnt")
                * ov
                / (F.col("hi") - F.col("lo"))
                / F.col("ntot")
            ).alias("est"),
            F.max("ntot").alias("ntot"),
        )
        actual = (
            e.crossJoin(F.broadcast(cuts))
            .agg(
                F.avg(
                    (
                        (F.col("c") > F.col("qa"))
                        & (F.col("c") <= F.col("qb"))
                    ).cast("double")
                ).alias("actual")
            )
        )
        rows.append(
            est.crossJoin(actual)
            .crossJoin(F.broadcast(cuts))
            .select(
                F.lit(f"r{i + 1}").alias("range_id"),
                F.col("qa").alias("lo_cents"),
                F.col("qb").alias("hi_cents"),
                F.round("est", 6).alias("est_sel"),
                F.round("actual", 6).alias("actual_sel"),
                F.round(
                    F.col("est") - F.col("actual"), 6
                ).alias("abs_err"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("range_id")


def _hist_sql():
    parts = []
    for i, (a, bq) in enumerate(_HIST_RANGES):
        parts.append(f"""
SELECT 'r{i + 1}' AS range_id, cuts.qa AS lo_cents,
       cuts.qb AS hi_cents,
       round((SELECT sum(h.cnt
                  * greatest(0.0, least(h.hi, cuts.qb)
                             - greatest(h.lo, cuts.qa))
                  / (h.hi - h.lo) / h.ntot)
              FROM hist h), 6) AS est_sel,
       round((SELECT avg(CASE WHEN e.c > cuts.qa AND e.c <= cuts.qb
                         THEN 1.0 ELSE 0.0 END) FROM e), 6)
         AS actual_sel,
       round((SELECT sum(h.cnt
                  * greatest(0.0, least(h.hi, cuts.qb)
                             - greatest(h.lo, cuts.qa))
                  / (h.hi - h.lo) / h.ntot)
              FROM hist h)
             - (SELECT avg(CASE WHEN e.c > cuts.qa
                            AND e.c <= cuts.qb
                           THEN 1.0 ELSE 0.0 END) FROM e), 6)
         AS abs_err
FROM (
  SELECT min(c) AS qa, max(c) AS qb FROM (
    SELECT CAST(c AS DOUBLE) AS c, r0, m FROM rq
    WHERE r0 = floor(m * {a}) OR r0 = floor(m * {bq})
  )
) cuts""")
    body = "\nUNION ALL".join(parts)
    return f"""
WITH e AS MATERIALIZED (
  SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
), ranked AS (
  SELECT c, CAST(row_number() OVER (ORDER BY c) AS DOUBLE) AS r,
         CAST(count(*) OVER () AS DOUBLE) AS n
  FROM e
), bounds AS (
  SELECT CAST(ceil(r * {_HIST_B} / n) AS BIGINT) AS b,
         CAST(max(c) AS DOUBLE) AS hi,
         CAST(count(*) AS BIGINT) AS cnt
  FROM ranked GROUP BY 1
), mn AS (
  SELECT CAST(min(c) AS DOUBLE) AS cmin,
         CAST(count(*) AS BIGINT) AS ntot
  FROM e
), hist AS MATERIALIZED (
  SELECT b,
         coalesce(lag(hi) OVER (ORDER BY b), cmin - 1) AS lo,
         hi, cnt, ntot
  FROM bounds CROSS JOIN mn
), rq AS MATERIALIZED (
  SELECT c,
         CAST(row_number() OVER (ORDER BY c) - 1 AS DOUBLE) AS r0,
         CAST(count(*) OVER () - 1 AS DOUBLE) AS m
  FROM e
)
{body}
ORDER BY range_id
"""


SQL_HISTOGRAM_EST_ERROR = _hist_sql()


def q_ndv_sample_est(spark, sf_dir):
    """SAMPLE-BASED NDV estimators (10% deterministic user sample):
    scale-up, Goodman/GEE, Chao2 — vs the true distinct count."""
    e = _t(spark, sf_dir, "events")
    truth = e.agg(
        F.countDistinct("user_id").cast("bigint").alias("true_ndv")
    )
    samp = e.where(F.col("user_id") % _NDV_MOD == 0)
    per = samp.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    s = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.sum((F.col("cnt") == 1).cast("bigint")).alias("f1"),
        F.sum((F.col("cnt") == 2).cast("bigint")).alias("f2"),
    )
    qrate = 1.0 / _NDV_MOD
    gee = F.col("d") + (
        F.lit(float(_NDV_MOD) ** 0.5) - 1
    ) * F.col("f1")
    chao = F.col("d") + F.col("f1") * F.col("f1") / (
        2 * F.greatest(F.col("f2"), F.lit(1)).cast("double")
    )
    return s.crossJoin(truth).select(
        "true_ndv",
        "d",
        "f1",
        "f2",
        F.round(F.col("d") / qrate, 2).alias("est_scaleup"),
        F.round(gee, 2).alias("est_gee"),
        F.round(chao, 2).alias("est_chao2"),
    )


SQL_NDV_SAMPLE_EST = f"""
WITH truth AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS true_ndv
  FROM events
), per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE user_id % {_NDV_MOD} = 0 GROUP BY 1
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS d,
         CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS f1,
         CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS f2
  FROM per
)
SELECT true_ndv, d, f1, f2,
       round(d / {1.0 / _NDV_MOD}, 2) AS est_scaleup,
       round(d + ({float(_NDV_MOD) ** 0.5} - 1) * f1, 2) AS est_gee,
       round(d + f1 * f1
             / (2 * CAST(greatest(f2, 1) AS DOUBLE)), 2)
         AS est_chao2
FROM s CROSS JOIN truth
"""
