"""Feature-eng pack #102 (r4): stylometry and classical outlier
detection — who wrote it, and which points don't belong.

* ``burrows_delta`` — Burrows' Delta (Burrows 2002), the standard
  authorship-attribution distance: per-source rates of the top-20
  corpus tokens, z-scored across sources, Delta(s1, s2) = mean |z1 -
  z2| over the token panel; the top-10 most stylistically distant
  source pairs.  Rates are exact integer rationals; the only float
  folds are over the 20-source / 20-token panels.
* ``mahalanobis_outliers`` — exact 2-D Mahalanobis distances of the
  per-user (total cents, event count) profile using the closed-form
  2x2 covariance inverse; top-10 users by d^2 — the multivariate
  outlier screen that catches points marginal z-scores miss.
* ``grubbs_test`` — Grubbs (1950) maximum-outlier test on the daily
  mean-cents series: G = max |x - xbar| / s vs the n = 30, alpha =
  .05 two-sided critical value 2.9085 — the single-most-suspicious-
  day verdict.

Scale shape: token panel = one hash agg + broadcast top-20; user
profile and daily series are single partial-aggregable reductions.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._shared import _t

_BD_TOPK = 20  # token panel size
_BD_PAIRS = 10  # reported source pairs
_MAH_TOPK = 10
_GRUBBS_CRIT = 2.9085  # n=30, alpha=.05, two-sided


def q_burrows_delta(spark, sf_dir):
    """BURROWS' DELTA between sources over the top-20 corpus tokens;
    top-10 pairs by delta (ties: source names)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("token"),
    )
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(_BD_TOPK)
        .select("token")
    )
    st = toks.join(F.broadcast(top), "token").groupBy(
        "source", "token"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("tt")
    )
    # dense panel: every (source, panel token), zero-filled
    grid = tot.crossJoin(F.broadcast(top))
    r = (
        grid.join(st, ["source", "token"], "left")
        .select(
            "source",
            "token",
            (
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("tt")
            ).alias("rate"),
        )
    )
    wt = Window.partitionBy("token")
    z = r.select(
        "source",
        "token",
        (
            (F.col("rate") - F.avg("rate").over(wt))
            / F.stddev_samp("rate").over(wt)
        ).alias("z"),
    )
    a, b = z.alias("a"), z.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
        .agg(
            F.avg(F.abs(F.col("a.z") - F.col("b.z"))).alias("delta")
        )
    )
    return (
        pairs.select("s1", "s2", F.round("delta", 6).alias("delta"))
        .orderBy(F.desc("delta"), F.asc("s1"), F.asc("s2"))
        .limit(_BD_PAIRS)
    )


SQL_BURROWS_DELTA = f"""
WITH toks AS (
  SELECT source,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
), top AS (
  SELECT token FROM (
    SELECT token, count(*) AS n FROM toks GROUP BY token
    ORDER BY n DESC, token ASC LIMIT {_BD_TOPK}
  )
), st AS (
  SELECT t.source, t.token, CAST(count(*) AS BIGINT) AS c
  FROM toks t JOIN top ON t.token = top.token
  GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(count(*) AS BIGINT) AS tt FROM toks GROUP BY 1
), grid AS (
  SELECT tot.source, tot.tt, top.token FROM tot CROSS JOIN top
), r AS (
  SELECT grid.source, grid.token,
         CAST(coalesce(st.c, 0) AS DOUBLE) / grid.tt AS rate
  FROM grid LEFT JOIN st
    ON grid.source = st.source AND grid.token = st.token
), z AS (
  SELECT source, token,
         (rate - avg(rate) OVER (PARTITION BY token))
         / stddev_samp(rate) OVER (PARTITION BY token) AS z
  FROM r
)
SELECT a.source AS s1, b.source AS s2,
       round(avg(abs(a.z - b.z)), 6) AS delta
FROM z a JOIN z b
  ON a.token = b.token AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY delta DESC, s1 ASC, s2 ASC LIMIT {_BD_PAIRS}
"""


def q_mahalanobis_outliers(spark, sf_dir):
    """2-D MAHALANOBIS outliers of per-user (cents, events): exact
    BIGINT moments -> closed-form covariance inverse -> top-10 d^2."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
    )
    per = e.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    )
    m = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("double") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("double") * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast("double") * F.col("y")).alias("syy"),
    )
    j = per.crossJoin(F.broadcast(m))
    mx = F.col("sx") / F.col("n").cast("double")
    my = F.col("sy") / F.col("n").cast("double")
    s11 = (F.col("sxx") - F.col("n") * mx * mx) / (F.col("n") - 1)
    s22 = (F.col("syy") - F.col("n") * my * my) / (F.col("n") - 1)
    s12 = (F.col("sxy") - F.col("n") * mx * my) / (F.col("n") - 1)
    det = s11 * s22 - s12 * s12
    dx = F.col("x") - mx
    dy = F.col("y") - my
    d2 = (s22 * dx * dx - 2 * s12 * dx * dy + s11 * dy * dy) / det
    return (
        j.select(
            "user_id",
            "x",
            "y",
            F.round(d2, 6).alias("d2"),
        )
        .orderBy(F.desc("d2"), F.asc("user_id"))
        .limit(_MAH_TOPK)
    )


SQL_MAHALANOBIS_OUTLIERS = f"""
WITH per AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY user_id
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS DOUBLE) * x) AS sxx,
         sum(CAST(x AS DOUBLE) * y) AS sxy,
         sum(CAST(y AS DOUBLE) * y) AS syy
  FROM per
), s AS (
  SELECT n, sx, sy, sxx, sxy, syy,
         CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my
  FROM m
), cov AS (
  SELECT s.*,
         (sxx - n * mx * mx) / (n - 1) AS s11,
         (syy - n * my * my) / (n - 1) AS s22,
         (sxy - n * mx * my) / (n - 1) AS s12
  FROM s
)
SELECT user_id, x, y,
       round((s22 * (x - mx) * (x - mx)
              - 2 * s12 * (x - mx) * (y - my)
              + s11 * (y - my) * (y - my))
             / (s11 * s22 - s12 * s12), 6) AS d2
FROM per CROSS JOIN cov
ORDER BY d2 DESC, user_id ASC LIMIT {_MAH_TOPK}
"""


def q_grubbs_test(spark, sf_dir):
    """GRUBBS' max-outlier test on daily mean cents: G = max|x-xbar|/s
    vs the 2.9085 critical value; reports the suspect day."""
    e = _t(spark, sf_dir, "events").select(
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("bigint").alias(
            "day"
        ),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
    )
    daily = e.groupBy("day").agg(
        F.sum("c").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    x = daily.select(
        "day",
        F.round(F.lit(1e4) * F.col("s") / F.col("k"))
        .cast("bigint")
        .alias("x_e4"),
    )
    m = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x_e4").cast("bigint").alias("sx"),
        F.sum(F.col("x_e4").cast("double") * F.col("x_e4")).alias("sxx"),
    )
    j = x.crossJoin(F.broadcast(m))
    mean = F.col("sx") / F.col("n").cast("double")
    sd = F.sqrt(
        (F.col("sxx") - F.col("n") * mean * mean) / (F.col("n") - 1)
    )
    g = F.abs(F.col("x_e4") - mean) / sd
    rn = F.row_number().over(Window.orderBy(F.desc("g"), F.asc("day")))
    best = j.select("day", "n", F.col("x_e4"), g.alias("g")).withColumn(
        "rn", rn
    ).where(F.col("rn") == 1)
    return best.select(
        F.col("day").alias("suspect_day"),
        "n",
        F.round(F.col("x_e4") / 1e4, 4).alias("x_cents"),
        F.round("g", 6).alias("grubbs_g"),
        (F.col("g") > _GRUBBS_CRIT).cast("int").alias("outlier"),
    )


SQL_GRUBBS_TEST = f"""
WITH daily AS (
  SELECT CAST(dayofmonth(ts) AS BIGINT) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS k
  FROM events GROUP BY 1
), x AS (
  SELECT day, CAST(round(1e4 * s / k) AS BIGINT) AS x_e4 FROM daily
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x_e4) AS BIGINT) AS sx,
         sum(CAST(x_e4 AS DOUBLE) * x_e4) AS sxx
  FROM x
), g AS (
  SELECT x.day, m.n, x.x_e4,
         abs(x.x_e4 - CAST(sx AS DOUBLE) / n)
         / sqrt((sxx - n * (CAST(sx AS DOUBLE) / n)
                       * (CAST(sx AS DOUBLE) / n)) / (n - 1)) AS g,
         row_number() OVER (
           ORDER BY abs(x.x_e4 - CAST(sx AS DOUBLE) / n) DESC, x.day ASC
         ) AS rn
  FROM x CROSS JOIN m
)
SELECT day AS suspect_day, n, round(x_e4 / 1e4, 4) AS x_cents,
       round(g, 6) AS grubbs_g,
       CAST(g > {_GRUBBS_CRIT} AS INT) AS outlier
FROM g WHERE rn = 1
"""
