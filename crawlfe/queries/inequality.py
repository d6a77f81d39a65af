"""Feature-eng pack #122 (r4): inequality decomposition — splitting
WHY two populations differ, next to the level metrics
(daily_gini, lorenz_curve, theil_index, atkinson_index,
mix_rate_decomp).

* ``oaxaca_blinder`` — the two-fold Oaxaca-Blinder decomposition of
  the even/odd-arm gap in per-user total cents, with per-user event
  count as the single covariate: gap = endowments (Xbar_a - Xbar_b)
  b_b + coefficients (Xbar_a (b_a - b_b) + (a_a - a_b)); exact
  BIGINT OLS moments per arm.
* ``theil_decomp`` — Theil-T decomposed over document sources by
  char mass: T = sum_g s_g T_g (within) + sum_g s_g ln(s_g/n_g/N)
  (between) — is length inequality a between-source or
  within-source story?
* ``lorenz_dominance`` — the even-arm vs odd-arm Lorenz curves of
  user spend compared at the decile grid: per-decile cumulative
  shares and the dominance verdict (one curve everywhere >= the
  other, or curves cross).

Scale shape: per-arm/group moment reductions (one hash agg each);
the decile grid is an ordered window over per-user totals.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._shared import _t

_LD_DECILES = 10


def _user_panel(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            ).alias("y"),
            F.count(F.lit(1)).cast("bigint").alias("x"),
        )
        .select(
            "user_id",
            "y",
            "x",
            (F.col("user_id") % 2 == 0).alias("a"),
        )
    )


_SQL_USER_PANEL = """
u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS x,
         (user_id % 2 = 0) AS a
  FROM events GROUP BY 1
)
"""


def q_oaxaca_blinder(spark, sf_dir):
    """TWO-FOLD OAXACA-BLINDER of the arm gap in user spend with
    event count as the covariate (reference coefficients: arm B)."""
    u = _user_panel(spark, sf_dir)
    m = u.groupBy("a").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nn = F.col("n").cast("double")
    mx = F.col("sx") / nn
    my = F.col("sy") / nn
    b = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    g = m.select(
        "a",
        mx.alias("mx"),
        my.alias("my"),
        b.alias("b"),
        (my - b * mx).alias("icpt"),
    )
    wide = (
        g.where(F.col("a"))
        .select(
            F.col("mx").alias("mx_a"),
            F.col("my").alias("my_a"),
            F.col("b").alias("b_a"),
            F.col("icpt").alias("i_a"),
        )
        .crossJoin(
            g.where(~F.col("a")).select(
                F.col("mx").alias("mx_b"),
                F.col("my").alias("my_b"),
                F.col("b").alias("b_b"),
                F.col("icpt").alias("i_b"),
            )
        )
    )
    gap = F.col("my_a") - F.col("my_b")
    endow = (F.col("mx_a") - F.col("mx_b")) * F.col("b_b")
    coeff = F.col("mx_a") * (F.col("b_a") - F.col("b_b")) + (
        F.col("i_a") - F.col("i_b")
    )
    return wide.select(
        F.round(gap, 4).alias("gap"),
        F.round(endow, 4).alias("endowments"),
        F.round(coeff, 4).alias("coefficients"),
        F.round(endow + coeff, 4).alias("check_sum"),
    )


SQL_OAXACA_BLINDER = f"""
WITH {_SQL_USER_PANEL},
m AS (
  SELECT a, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM u GROUP BY 1
), g AS (
  SELECT a, CAST(sx AS DOUBLE) / n AS mx,
         CAST(sy AS DOUBLE) / n AS my,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / (n * sxx - sx * sx) AS b
  FROM m
), g2 AS (
  SELECT a, mx, my, b, my - b * mx AS icpt FROM g
), wide AS (
  SELECT ga.mx AS mx_a, ga.my AS my_a, ga.b AS b_a, ga.icpt AS i_a,
         gb.mx AS mx_b, gb.my AS my_b, gb.b AS b_b, gb.icpt AS i_b
  FROM g2 ga CROSS JOIN g2 gb
  WHERE ga.a AND NOT gb.a
)
SELECT round(my_a - my_b, 4) AS gap,
       round((mx_a - mx_b) * b_b, 4) AS endowments,
       round(mx_a * (b_a - b_b) + (i_a - i_b), 4) AS coefficients,
       round((mx_a - mx_b) * b_b
             + mx_a * (b_a - b_b) + (i_a - i_b), 4) AS check_sum
FROM wide
"""


def q_theil_decomp(spark, sf_dir):
    """THEIL-T within/between decomposition of doc char mass over
    sources."""
    d = _t(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("v")
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").alias("sv"),
    )
    gsum = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("v").alias("svg"),
    )
    # within-group Theil: sum (v/svg) ln(v/(svg/ng))
    tw = (
        d.join(F.broadcast(gsum), "source")
        .groupBy("source")
        .agg(
            (
                F.sum(
                    F.col("v")
                    * F.log(
                        F.col("v")
                        / (F.col("svg") / F.col("ng"))
                    )
                )
                / F.max("svg")
            ).alias("t_g")
        )
    )
    tg = (
        gsum.join(tw, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "ng",
            "n",
            "t_g",
            (F.col("svg") / F.col("sv")).alias("s_g"),
        )
    )
    out = tg.agg(
        F.sum(F.col("s_g") * F.col("t_g")).alias("within"),
        F.sum(
            F.col("s_g")
            * F.log(
                F.col("s_g")
                / (F.col("ng") / F.col("n").cast("double"))
            )
        ).alias("between"),
    )
    return out.select(
        F.round("within", 6).alias("theil_within"),
        F.round("between", 6).alias("theil_between"),
        F.round(
            F.col("within") + F.col("between"), 6
        ).alias("theil_total"),
    )


SQL_THEIL_DECOMP = """
WITH d AS (
  SELECT source, CAST(n_chars AS DOUBLE) AS v FROM documents
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(v) AS sv FROM d
), gsum AS (
  SELECT source, CAST(count(*) AS BIGINT) AS ng, sum(v) AS svg
  FROM d GROUP BY 1
), tw AS (
  SELECT d.source,
         sum(d.v * ln(d.v / (g.svg / g.ng))) / max(g.svg) AS t_g
  FROM d JOIN gsum g USING (source)
  GROUP BY 1
), parts AS (
  SELECT g.source, g.ng, g.svg, tw.t_g,
         g.svg / tot.sv AS s_g, tot.n
  FROM gsum g JOIN tw USING (source) CROSS JOIN tot
)
SELECT round(sum(s_g * t_g), 6) AS theil_within,
       round(sum(s_g * ln(s_g / (ng / CAST(n AS DOUBLE)))), 6)
         AS theil_between,
       round(sum(s_g * t_g)
             + sum(s_g * ln(s_g / (ng / CAST(n AS DOUBLE)))), 6)
         AS theil_total
FROM parts
"""


def q_lorenz_dominance(spark, sf_dir):
    """LORENZ CURVES of user spend per arm at the decile grid, with
    the dominance verdict."""
    u = _user_panel(spark, sf_dir)
    w = Window.partitionBy("a").orderBy("y", "user_id")
    r = u.select(
        "a",
        "y",
        F.row_number().over(w).cast("double").alias("r"),
        F.sum("y")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("cum"),
        F.count(F.lit(1))
        .over(Window.partitionBy("a"))
        .cast("double")
        .alias("n"),
        F.sum("y")
        .over(Window.partitionBy("a"))
        .cast("double")
        .alias("tot"),
    )
    grid = spark.range(1, _LD_DECILES + 1).select(
        F.col("id").cast("bigint").alias("decile")
    )
    # share at decile d = cumulative share at rank ceil(d n / 10):
    # always a real row, so every (arm, decile) cell is populated
    # even when an arm has fewer than 10 users
    dec = r.crossJoin(F.broadcast(grid)).where(
        F.col("r")
        == F.ceil(
            F.col("decile") * F.col("n") / _LD_DECILES
        ).cast("double")
    )
    pivot = (
        dec.groupBy("decile")
        .agg(
            F.round(
                F.max(F.when(F.col("a"), F.col("cum") / F.col("tot"))),
                6,
            ).alias("share_even"),
            F.round(
                F.max(
                    F.when(~F.col("a"), F.col("cum") / F.col("tot"))
                ),
                6,
            ).alias("share_odd"),
        )
    )
    wall = Window.partitionBy()
    return pivot.select(
        "decile",
        "share_even",
        "share_odd",
        F.when(
            F.min(
                (F.col("share_even") >= F.col("share_odd")).cast(
                    "int"
                )
            ).over(wall)
            == 1,
            F.lit("even_dominates"),
        )
        .when(
            F.min(
                (F.col("share_odd") >= F.col("share_even")).cast(
                    "int"
                )
            ).over(wall)
            == 1,
            F.lit("odd_dominates"),
        )
        .otherwise(F.lit("curves_cross"))
        .alias("verdict"),
    ).orderBy("decile")


SQL_LORENZ_DOMINANCE = f"""
WITH {_SQL_USER_PANEL},
r AS (
  SELECT a, y,
         CAST(row_number() OVER (PARTITION BY a ORDER BY y, user_id)
              AS DOUBLE) AS r,
         CAST(sum(y) OVER (PARTITION BY a ORDER BY y, user_id
              ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum,
         CAST(count(*) OVER (PARTITION BY a) AS DOUBLE) AS n,
         CAST(sum(y) OVER (PARTITION BY a) AS DOUBLE) AS tot
  FROM u
), grid AS (
  SELECT CAST(unnest(generate_series(1, {_LD_DECILES})) AS BIGINT)
           AS decile
), dec AS (
  SELECT r.a, grid.decile, r.cum / r.tot AS share
  FROM r CROSS JOIN grid
  WHERE r.r = CAST(ceil(grid.decile * r.n / {_LD_DECILES})
                   AS DOUBLE)
), piv AS (
  SELECT decile,
         round(max(CASE WHEN a THEN share END), 6) AS share_even,
         round(max(CASE WHEN NOT a THEN share END), 6) AS share_odd
  FROM dec GROUP BY 1
)
SELECT decile, share_even, share_odd,
       CASE WHEN min(CASE WHEN share_even >= share_odd
                     THEN 1 ELSE 0 END) OVER () = 1
            THEN 'even_dominates'
            WHEN min(CASE WHEN share_odd >= share_even
                     THEN 1 ELSE 0 END) OVER () = 1
            THEN 'odd_dominates'
            ELSE 'curves_cross' END AS verdict
FROM piv ORDER BY decile
"""
