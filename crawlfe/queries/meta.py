"""Feature-eng pack #126 (r4): meta-analysis — pooling per-stratum
effect estimates the way evidence synthesis does, with week-of-month
strata as the "studies": effect_k = mean even-arm cents minus odd-arm
cents in week k, se_k from the two-sample pooled formula (exact
BIGINT moments per stratum).

* ``meta_analysis`` — inverse-variance fixed effect, Cochran's Q,
  I^2 heterogeneity, DerSimonian-Laird tau^2 and the random-effects
  re-pool: the full forest-plot footer in one row.
* ``egger_test`` — funnel-plot asymmetry: OLS of the standardized
  effect z_k = e_k/se_k on precision 1/se_k; the intercept's t
  statistic is the small-study-bias test.
* ``loo_meta`` — leave-one-out sensitivity: the fixed effect with
  each week removed and its delta from the full pool — does any
  single stratum own the conclusion?

Scale shape: one hash agg to the O(weeks) effect table (exact
integer sums), then O(weeks) closed forms; the LOO uses the
subtract-from-totals identity, not k re-pools.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ._shared import _t


def _effects(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        F.floor(
            (F.dayofmonth(F.col("ts").cast("timestamp")) - 1) / 7
        )
        .cast("bigint")
        .alias("week"),
        (F.col("user_id") % 2 == 0).alias("a"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
    )
    m = e.groupBy("week").agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0))
        .cast("bigint")
        .alias("na"),
        F.sum(F.when(F.col("a"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("sa"),
        F.sum(
            F.when(F.col("a"), F.col("c") * F.col("c")).otherwise(0)
        )
        .cast("bigint")
        .alias("qa"),
        F.sum(F.when(~F.col("a"), 1).otherwise(0))
        .cast("bigint")
        .alias("nb"),
        F.sum(F.when(~F.col("a"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("sb"),
        F.sum(
            F.when(
                ~F.col("a"), F.col("c") * F.col("c")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("qb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    va = (F.col("qa") - F.col("sa") * F.col("sa") / na) / (na - 1)
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / nb) / (nb - 1)
    return m.select(
        "week",
        (F.col("sa") / na - F.col("sb") / nb).alias("eff"),
        (va / na + vb / nb).alias("v"),
    )


_SQL_EFFECTS = """
e AS (
  SELECT CAST(floor((dayofmonth(ts) - 1) / 7) AS BIGINT) AS week,
         (user_id % 2 = 0) AS a,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), m AS (
  SELECT week,
    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN a THEN c ELSE 0 END) AS BIGINT) AS sa,
    CAST(sum(CASE WHEN a THEN c * c ELSE 0 END) AS BIGINT) AS qa,
    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS nb,
    CAST(sum(CASE WHEN NOT a THEN c ELSE 0 END) AS BIGINT) AS sb,
    CAST(sum(CASE WHEN NOT a THEN c * c ELSE 0 END) AS BIGINT) AS qb
  FROM e GROUP BY 1
), eff AS (
  SELECT week,
    CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb AS eff,
    ((qa - CAST(sa AS DOUBLE) * sa / na) / (na - 1)) / na
      + ((qb - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1)) / nb AS v
  FROM m
)
"""


def q_meta_analysis(spark, sf_dir):
    """FIXED + RANDOM (DerSimonian-Laird) pooled arm effect over
    week strata, with Q, I^2, tau^2."""
    eff = _effects(spark, sf_dir)
    w = 1 / F.col("v")
    m = eff.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(w).alias("sw"),
        F.sum(w * F.col("eff")).alias("swe"),
        F.sum(w * w).alias("sww"),
        F.sum(w * F.col("eff") * F.col("eff")).alias("swee"),
    )
    fixed = F.col("swe") / F.col("sw")
    q = F.col("swee") - F.col("swe") * F.col("swe") / F.col("sw")
    dfk = (F.col("k") - 1).cast("double")
    cc = F.col("sw") - F.col("sww") / F.col("sw")
    tau2 = F.greatest(F.lit(0.0), (q - dfk) / cc)
    i2 = F.greatest(F.lit(0.0), (q - dfk) / q)
    base = m.select(
        "k",
        F.round(fixed, 4).alias("fixed_effect"),
        F.round(F.sqrt(1 / F.col("sw")), 4).alias("fixed_se"),
        F.round(q, 4).alias("cochran_q"),
        F.round(i2, 6).alias("i2"),
        tau2.alias("_tau2"),
    )
    re = (
        eff.crossJoin(F.broadcast(base.select("_tau2")))
        .agg(
            F.sum(1 / (F.col("v") + F.col("_tau2"))).alias("swr"),
            F.sum(
                F.col("eff") / (F.col("v") + F.col("_tau2"))
            ).alias("swre"),
        )
    )
    return base.crossJoin(re).select(
        "k",
        "fixed_effect",
        "fixed_se",
        "cochran_q",
        "i2",
        F.round("_tau2", 4).alias("tau2"),
        F.round(F.col("swre") / F.col("swr"), 4).alias(
            "random_effect"
        ),
        F.round(F.sqrt(1 / F.col("swr")), 4).alias("random_se"),
    )


SQL_META_ANALYSIS = f"""
WITH {_SQL_EFFECTS},
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         sum(1 / v) AS sw, sum(eff / v) AS swe,
         sum(1 / (v * v)) AS sww, sum(eff * eff / v) AS swee
  FROM eff
), base AS (
  SELECT k, swe / sw AS fixed, sqrt(1 / sw) AS fse,
         swee - swe * swe / sw AS q,
         CAST(k - 1 AS DOUBLE) AS dfk,
         sw - sww / sw AS cc
  FROM agg
), tau AS (
  SELECT k, fixed, fse, q, dfk,
         greatest(0.0, (q - dfk) / cc) AS tau2,
         greatest(0.0, (q - dfk) / q) AS i2
  FROM base
), re AS (
  SELECT sum(1 / (eff.v + tau.tau2)) AS swr,
         sum(eff.eff / (eff.v + tau.tau2)) AS swre
  FROM eff CROSS JOIN tau
)
SELECT k, round(fixed, 4) AS fixed_effect,
       round(fse, 4) AS fixed_se, round(q, 4) AS cochran_q,
       round(i2, 6) AS i2, round(tau2, 4) AS tau2,
       round(swre / swr, 4) AS random_effect,
       round(sqrt(1 / swr), 4) AS random_se
FROM tau CROSS JOIN re
"""


def q_egger_test(spark, sf_dir):
    """EGGER FUNNEL-ASYMMETRY: OLS of z = eff/se on precision 1/se;
    intercept and its t statistic."""
    eff = _effects(spark, sf_dir)
    z = F.col("eff") / F.sqrt("v")
    p = 1 / F.sqrt("v")
    m = eff.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.avg(p).alias("mp"),
        F.avg(z).alias("mz"),
        F.avg(p * p).alias("mpp"),
        F.avg(p * z).alias("mpz"),
        F.avg(z * z).alias("mzz"),
    )
    spz = F.col("mpz") - F.col("mp") * F.col("mz")
    spp = F.col("mpp") - F.col("mp") * F.col("mp")
    szz = F.col("mzz") - F.col("mz") * F.col("mz")
    b = spz / spp
    a = F.col("mz") - b * F.col("mp")
    kk = F.col("k").cast("double")
    sse = kk * (szz - spz * spz / spp)
    se_a = F.sqrt(
        sse
        / (kk - 2)
        * (1 / kk + F.col("mp") * F.col("mp") / (kk * spp))
    )
    return m.select(
        "k",
        F.round(a, 6).alias("egger_intercept"),
        F.round(a / se_a, 6).alias("t_intercept"),
        F.round(b, 6).alias("slope"),
    )


SQL_EGGER_TEST = f"""
WITH {_SQL_EFFECTS},
zp AS (
  SELECT eff / sqrt(v) AS z, 1 / sqrt(v) AS p FROM eff
), mm AS (
  SELECT CAST(count(*) AS BIGINT) AS k, avg(p) AS mp, avg(z) AS mz,
         avg(p * p) AS mpp, avg(p * z) AS mpz, avg(z * z) AS mzz
  FROM zp
), c AS (
  SELECT k, mp, mz,
         mpz - mp * mz AS spz, mpp - mp * mp AS spp,
         mzz - mz * mz AS szz
  FROM mm
), f AS (
  SELECT k, mp, spp,
         spz / spp AS b, mz - spz / spp * mp AS a,
         CAST(k AS DOUBLE) * (szz - spz * spz / spp) AS sse
  FROM c
)
SELECT k, round(a, 6) AS egger_intercept,
       round(a / sqrt(sse / (k - 2)
             * (1.0 / k + mp * mp / (k * spp))), 6) AS t_intercept,
       round(b, 6) AS slope
FROM f
"""


def q_loo_meta(spark, sf_dir):
    """LEAVE-ONE-OUT fixed effects: pooled estimate without each
    week via the subtract-from-totals identity, with the delta."""
    eff = _effects(spark, sf_dir)
    w = 1 / F.col("v")
    tot = eff.agg(
        F.sum(w).alias("sw"), F.sum(w * F.col("eff")).alias("swe")
    )
    j = eff.crossJoin(F.broadcast(tot))
    full = F.col("swe") / F.col("sw")
    loo = (F.col("swe") - (1 / F.col("v")) * F.col("eff")) / (
        F.col("sw") - 1 / F.col("v")
    )
    return j.select(
        "week",
        F.round(F.col("eff"), 4).alias("week_effect"),
        F.round(loo, 4).alias("loo_pooled"),
        F.round(loo - full, 4).alias("delta_vs_full"),
    ).orderBy("week")


SQL_LOO_META = f"""
WITH {_SQL_EFFECTS},
tot AS (
  SELECT sum(1 / v) AS sw, sum(eff / v) AS swe FROM eff
)
SELECT week, round(eff, 4) AS week_effect,
       round((swe - eff / v) / (sw - 1 / v), 4) AS loo_pooled,
       round((swe - eff / v) / (sw - 1 / v) - swe / sw, 4)
         AS delta_vs_full
FROM eff CROSS JOIN tot
ORDER BY week
"""
