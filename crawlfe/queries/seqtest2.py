"""Feature-eng pack #99 (r4): experimentation III — the decision
procedures around "the test ended": proving equivalence, spending
alpha across interim looks, and de-biasing the winning arm.

Arms are the registry's deterministic hash split (user_id % 3 == 0
treated); outcomes are purchase rates; every count is an exact BIGINT
and the gaussian pieces use closed forms both engines evaluate
identically (the logistic CDF approximation 2/(1+exp(1.702|z|)) the
registry already shares across bh_fdr / holm, and the exact normal
pdf exp(-z^2/2)/sqrt(2 pi)).

* ``tost_equivalence`` — two one-sided tests (Schuirmann 1987) with
  margin delta = 2pp on the arm purchase rates: equivalent iff
  z_lo = (diff + delta)/SE > 1.645 AND z_hi = (delta - diff)/SE >
  1.645 — the "safe to ship, no regression" readout a superiority
  test cannot give.
* ``obrien_fleming`` — two-look group-sequential monitoring: interim
  z on days 1-15 vs the O'Brien-Fleming boundary 2.797, final z on
  the full month vs 1.977 (the classic 2-look constants at overall
  alpha .05); per-look rows with the stop/continue verdict.
* ``winners_curse`` — selection-bias correction for the best arm
  (Deng et al.-style shrinkage): among the three user_id % 3 arms,
  the winner's naive rate minus SE * phi(z)/Phi(z) evaluated at the
  winner-vs-runner-up gap — the conditional-bias haircut before
  anyone ships the "best" number.

Scale shape: one hash agg to per-arm counts; everything after is
scalar algebra on <= 3 rows.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._shared import _t

_TOST_DELTA = 0.02  # equivalence margin on the rate scale
_Z_ONE_SIDED_95 = 1.644854
_OBF_INTERIM = 2.797  # O'Brien-Fleming 2-look boundaries (alpha .05)
_OBF_FINAL = 1.977
_SQRT_2PI = 2.5066282746310002


def _arm_counts(spark, sf_dir, day_lo=None, day_hi=None, mod=2):
    e = _t(spark, sf_dir, "events")
    if day_lo is not None:
        e = e.where(
            F.dayofmonth(F.col("ts").cast("timestamp")).between(
                day_lo, day_hi
            )
        )
    return e.groupBy((F.col("user_id") % mod).cast("int").alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("bigint"))
        .cast("bigint")
        .alias("y"),
    )


def _two_arm(spark, sf_dir, day_lo=None, day_hi=None):
    c = _arm_counts(spark, sf_dir, day_lo, day_hi, mod=2)
    a = c.where(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("y").alias("y0")
    )
    b = c.where(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("y").alias("y1")
    )
    return a.crossJoin(F.broadcast(b))


_SQL_TWO_ARM = """
  SELECT
    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n0,
    CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
             THEN 1 ELSE 0 END) AS BIGINT) AS y0,
    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n1,
    CAST(sum(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
             THEN 1 ELSE 0 END) AS BIGINT) AS y1
  FROM events {where}
"""


def _rate_z_cols():
    p0 = F.col("y0").cast("double") / F.col("n0")
    p1 = F.col("y1").cast("double") / F.col("n1")
    diff = p1 - p0
    se = F.sqrt(
        p0 * (1 - p0) / F.col("n0") + p1 * (1 - p1) / F.col("n1")
    )
    return p0, p1, diff, se


def q_tost_equivalence(spark, sf_dir):
    """TOST: both one-sided z's must clear 1.645 for the arms to be
    declared equivalent within the 2pp margin."""
    j = _two_arm(spark, sf_dir)
    p0, p1, diff, se = _rate_z_cols()
    z_lo = (diff + _TOST_DELTA) / se
    z_hi = (_TOST_DELTA - diff) / se
    return j.select(
        "n0",
        "n1",
        F.round(p0, 6).alias("rate0"),
        F.round(p1, 6).alias("rate1"),
        F.round(diff, 6).alias("diff"),
        F.round(z_lo, 6).alias("z_lower"),
        F.round(z_hi, 6).alias("z_upper"),
        (
            (z_lo > _Z_ONE_SIDED_95) & (z_hi > _Z_ONE_SIDED_95)
        )
        .cast("int")
        .alias("equivalent"),
    )


SQL_TOST_EQUIVALENCE = f"""
WITH m AS ({_SQL_TWO_ARM.format(where="")}),
s AS (
  SELECT n0, n1,
         CAST(y0 AS DOUBLE) / n0 AS p0,
         CAST(y1 AS DOUBLE) / n1 AS p1,
         sqrt((CAST(y0 AS DOUBLE) / n0) * (1 - CAST(y0 AS DOUBLE) / n0)
              / n0
              + (CAST(y1 AS DOUBLE) / n1)
                * (1 - CAST(y1 AS DOUBLE) / n1) / n1) AS se
  FROM m
)
SELECT n0, n1, round(p0, 6) AS rate0, round(p1, 6) AS rate1,
       round(p1 - p0, 6) AS diff,
       round((p1 - p0 + {_TOST_DELTA}) / se, 6) AS z_lower,
       round(({_TOST_DELTA} - (p1 - p0)) / se, 6) AS z_upper,
       CAST((p1 - p0 + {_TOST_DELTA}) / se > {_Z_ONE_SIDED_95}
            AND ({_TOST_DELTA} - (p1 - p0)) / se > {_Z_ONE_SIDED_95}
            AS INT) AS equivalent
FROM s
"""


def q_obrien_fleming(spark, sf_dir):
    """O'BRIEN-FLEMING 2-LOOK monitoring: interim (days 1-15) z vs
    2.797, final (full month) z vs 1.977; one row per look."""
    looks = []
    for name, lo, hi, bound in (
        ("interim_d15", 1, 15, _OBF_INTERIM),
        ("final_d30", None, None, _OBF_FINAL),
    ):
        j = _two_arm(spark, sf_dir, lo, hi)
        _, _, diff, se = _rate_z_cols()
        z = diff / se
        looks.append(
            j.select(
                F.lit(name).alias("look"),
                "n0",
                "n1",
                F.round(z, 6).alias("z"),
                F.lit(bound).alias("boundary"),
                (F.abs(z) > bound).cast("int").alias("cross"),
            )
        )
    return looks[0].unionAll(looks[1])


SQL_OBRIEN_FLEMING = f"""
WITH i AS ({_SQL_TWO_ARM.format(
    where="WHERE dayofmonth(ts) BETWEEN 1 AND 15")}),
f AS ({_SQL_TWO_ARM.format(where="")}),
iz AS (
  SELECT 'interim_d15' AS look, n0, n1,
         round((CAST(y1 AS DOUBLE) / n1 - CAST(y0 AS DOUBLE) / n0)
               / sqrt((CAST(y0 AS DOUBLE) / n0)
                      * (1 - CAST(y0 AS DOUBLE) / n0) / n0
                      + (CAST(y1 AS DOUBLE) / n1)
                        * (1 - CAST(y1 AS DOUBLE) / n1) / n1), 6) AS z,
         {_OBF_INTERIM} AS boundary
  FROM i
), fz AS (
  SELECT 'final_d30' AS look, n0, n1,
         round((CAST(y1 AS DOUBLE) / n1 - CAST(y0 AS DOUBLE) / n0)
               / sqrt((CAST(y0 AS DOUBLE) / n0)
                      * (1 - CAST(y0 AS DOUBLE) / n0) / n0
                      + (CAST(y1 AS DOUBLE) / n1)
                        * (1 - CAST(y1 AS DOUBLE) / n1) / n1), 6) AS z,
         {_OBF_FINAL} AS boundary
  FROM f
)
SELECT look, n0, n1, z, boundary,
       CAST(abs(z) > boundary AS INT) AS cross
FROM (SELECT * FROM iz UNION ALL SELECT * FROM fz)
"""


def q_winners_curse(spark, sf_dir):
    """WINNER'S CURSE haircut: the best of the three user_id % 3 arms
    by purchase rate, de-biased by SE * phi(z)/Phi(z) at the winner-
    vs-runner-up gap (phi exact, Phi via the shared logistic
    approximation)."""
    c = _arm_counts(spark, sf_dir, mod=3)
    r = c.select(
        "arm",
        "n",
        "y",
        (F.col("y").cast("double") / F.col("n")).alias("p"),
    )
    w = Window.orderBy(F.desc("p"), F.asc("arm"))
    ranked = r.withColumn("rk", F.row_number().over(w))
    best = ranked.where(F.col("rk") == 1).select(
        F.col("arm").alias("win_arm"),
        F.col("n").alias("n_win"),
        F.col("p").alias("p_win"),
    )
    second = ranked.where(F.col("rk") == 2).select(
        F.col("n").alias("n_2nd"), F.col("p").alias("p_2nd")
    )
    j = best.crossJoin(F.broadcast(second))
    se = F.sqrt(
        F.col("p_win") * (1 - F.col("p_win")) / F.col("n_win")
        + F.col("p_2nd") * (1 - F.col("p_2nd")) / F.col("n_2nd")
    )
    z = (F.col("p_win") - F.col("p_2nd")) / se
    pdf = F.exp(-z * z / 2) / _SQRT_2PI
    cdf = 1 / (1 + F.exp(-1.702 * z))
    haircut = se * pdf / cdf
    return j.select(
        "win_arm",
        "n_win",
        F.round("p_win", 6).alias("p_naive"),
        F.round(z, 6).alias("z_gap"),
        F.round(haircut, 6).alias("bias_est"),
        F.round(F.col("p_win") - haircut, 6).alias("p_adjusted"),
    )


SQL_WINNERS_CURSE = f"""
WITH c AS (
  SELECT CAST(user_id % 3 AS INT) AS arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY 1
), r AS (
  SELECT arm, n, y, CAST(y AS DOUBLE) / n AS p,
         row_number() OVER (ORDER BY CAST(y AS DOUBLE) / n DESC,
                            arm ASC) AS rk
  FROM c
), j AS (
  SELECT b.arm AS win_arm, b.n AS n_win, b.p AS p_win,
         s.n AS n_2nd, s.p AS p_2nd
  FROM (SELECT * FROM r WHERE rk = 1) b
  CROSS JOIN (SELECT * FROM r WHERE rk = 2) s
), z AS (
  SELECT j.*,
         (p_win - p_2nd)
         / sqrt(p_win * (1 - p_win) / n_win
                + p_2nd * (1 - p_2nd) / n_2nd) AS z,
         sqrt(p_win * (1 - p_win) / n_win
              + p_2nd * (1 - p_2nd) / n_2nd) AS se
  FROM j
)
SELECT win_arm, n_win, round(p_win, 6) AS p_naive,
       round(z, 6) AS z_gap,
       round(se * (exp(-z * z / 2) / {_SQRT_2PI})
             / (1 / (1 + exp(-1.702 * z))), 6) AS bias_est,
       round(p_win - se * (exp(-z * z / 2) / {_SQRT_2PI})
             / (1 / (1 + exp(-1.702 * z))), 6) AS p_adjusted
FROM z
"""
