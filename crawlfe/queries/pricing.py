"""Feature-eng pack #124 (r4): pricing & inventory analytics on the
TPC-H fact tables — the demand-side trio next to discount_depth /
supplier_hhi / weekend_lift.

* ``price_elasticity`` — per-brand log-log demand regression:
  elasticity = OLS slope of ln(quantity) on ln(unit price =
  extendedprice/quantity) across that brand's line items, with R^2;
  the classic own-price elasticity panel.
* ``newsvendor_stock`` — the newsvendor quantity for daily demand
  (units/day of lineitem quantity): critical ratio cu/(cu+co) at
  (cu, co) = (3, 1), q* = the exact interpolated critical-ratile of
  daily demand, and the realized empirical cost of stocking q* vs
  stocking the mean (the cost of ignoring the asymmetry).
* ``demand_pooling`` — risk-pooling audit across the 5 brands with
  the largest volume: sd of pooled daily demand vs the sum of
  per-brand sds; ratio < 1 quantifies the safety-stock saving at
  z = 1.645.

Scale shape: lineitem folds to per-brand/day relations in one hash
agg each; OLS and quantiles are O(brands)/O(days) reductions.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._shared import _t

_NV_CU, _NV_CO = 3.0, 1.0  # underage/overage unit costs
_POOL_TOP = 5
_POOL_Z = 1.645


def q_price_elasticity(spark, sf_dir):
    """PER-BRAND LOG-LOG price elasticity of demand with R^2."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    lx = F.log(F.col("l_extendedprice") / F.col("l_quantity"))
    ly = F.log("l_quantity")
    m = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg(lx).alias("mx"),
        F.avg(ly).alias("my"),
        F.avg(lx * lx).alias("mxx"),
        F.avg(lx * ly).alias("mxy"),
        F.avg(ly * ly).alias("myy"),
    )
    sxy = F.col("mxy") - F.col("mx") * F.col("my")
    sxx = F.col("mxx") - F.col("mx") * F.col("mx")
    syy = F.col("myy") - F.col("my") * F.col("my")
    return m.select(
        "p_brand",
        "n",
        F.round(sxy / sxx, 6).alias("elasticity"),
        F.round(sxy * sxy / (sxx * syy), 6).alias("r2"),
    ).orderBy("p_brand")


SQL_PRICE_ELASTICITY = """
WITH j AS (
  SELECT p.p_brand,
         ln(l.l_extendedprice / l.l_quantity) AS lx,
         ln(l.l_quantity) AS ly
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), m AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
         avg(lx) AS mx, avg(ly) AS my, avg(lx * lx) AS mxx,
         avg(lx * ly) AS mxy, avg(ly * ly) AS myy
  FROM j GROUP BY 1
)
SELECT p_brand, n,
       round((mxy - mx * my) / (mxx - mx * mx), 6) AS elasticity,
       round((mxy - mx * my) * (mxy - mx * my)
             / ((mxx - mx * mx) * (myy - my * my)), 6) AS r2
FROM m ORDER BY p_brand
"""


def _daily_demand(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.to_date("l_shipdate").alias("d")
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("q")
    )


_SQL_DAILY_DEMAND = """
daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1
)
"""


def q_newsvendor_stock(spark, sf_dir):
    """NEWSVENDOR stock level at critical ratio cu/(cu+co) = 0.75:
    exact interpolated quantile of daily demand, plus the realized
    cost of q* vs stocking the mean."""
    d = _daily_demand(spark, sf_dir)
    cr = _NV_CU / (_NV_CU + _NV_CO)
    wr = Window.orderBy("q", "d")
    ranked = d.select(
        F.col("q").cast("double").alias("v"),
        (F.row_number().over(wr) - 1).cast("double").alias("r"),
        (F.count(F.lit(1)).over(Window.partitionBy()) - 1)
        .cast("double")
        .alias("m"),
    )
    pos = F.col("m") * cr
    qstar = ranked.where(
        (F.col("r") == F.floor(pos)) | (F.col("r") == F.ceil(pos))
    ).agg(
        F.sum(
            F.when(
                F.col("r") == F.floor(pos),
                F.when(
                    F.ceil(pos) == F.floor(pos), F.col("v")
                ).otherwise(F.col("v") * (1 - (pos - F.floor(pos)))),
            ).otherwise(F.col("v") * (pos - F.floor(pos)))
        ).alias("qstar")
    )
    mean = d.agg(
        F.avg(F.col("q").cast("double")).alias("qmean"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    j = d.crossJoin(F.broadcast(qstar)).crossJoin(F.broadcast(mean))

    def cost(stock):
        over = F.greatest(stock - F.col("q"), F.lit(0.0))
        under = F.greatest(F.col("q") - stock, F.lit(0.0))
        return F.avg(_NV_CO * over + _NV_CU * under)

    out = j.agg(
        F.max("n").alias("n"),
        F.round(F.max("qstar"), 4).alias("q_star"),
        F.round(F.max("qmean"), 4).alias("q_mean"),
        F.round(cost(F.col("qstar")), 4).alias("cost_at_qstar"),
        F.round(cost(F.col("qmean")), 4).alias("cost_at_mean"),
    )
    return out.select(
        "n",
        F.lit(round(cr, 6)).alias("critical_ratio"),
        "q_star",
        "q_mean",
        "cost_at_qstar",
        "cost_at_mean",
    )


SQL_NEWSVENDOR_STOCK = f"""
WITH {_SQL_DAILY_DEMAND},
ranked AS (
  SELECT CAST(q AS DOUBLE) AS v,
         CAST(row_number() OVER (ORDER BY q, d) - 1 AS DOUBLE) AS r,
         CAST(count(*) OVER () - 1 AS DOUBLE) AS m
  FROM daily
), qs AS (
  SELECT sum(CASE WHEN r = floor(m * {_NV_CU / (_NV_CU + _NV_CO)})
                  THEN CASE WHEN ceil(m * {_NV_CU / (_NV_CU + _NV_CO)})
                              = floor(m * {_NV_CU / (_NV_CU + _NV_CO)})
                       THEN v
                       ELSE v * (1 - (m * {_NV_CU / (_NV_CU + _NV_CO)}
                                 - floor(m * {_NV_CU / (_NV_CU + _NV_CO)})))
                       END
                  ELSE v * (m * {_NV_CU / (_NV_CU + _NV_CO)}
                            - floor(m * {_NV_CU / (_NV_CU + _NV_CO)}))
             END) AS qstar
  FROM ranked
  WHERE r = floor(m * {_NV_CU / (_NV_CU + _NV_CO)})
     OR r = ceil(m * {_NV_CU / (_NV_CU + _NV_CO)})
), mn AS (
  SELECT avg(CAST(q AS DOUBLE)) AS qmean,
         CAST(count(*) AS BIGINT) AS n
  FROM daily
)
SELECT max(n) AS n,
       {round(_NV_CU / (_NV_CU + _NV_CO), 6)} AS critical_ratio,
       round(max(qstar), 4) AS q_star,
       round(max(qmean), 4) AS q_mean,
       round(avg({_NV_CO} * greatest(qstar - q, 0.0)
                 + {_NV_CU} * greatest(q - qstar, 0.0)), 4)
         AS cost_at_qstar,
       round(avg({_NV_CO} * greatest(qmean - q, 0.0)
                 + {_NV_CU} * greatest(q - qmean, 0.0)), 4)
         AS cost_at_mean
FROM daily CROSS JOIN qs CROSS JOIN mn
"""


def q_demand_pooling(spark, sf_dir):
    """RISK POOLING across the top-5 volume brands: pooled daily sd
    vs summed per-brand sds; safety-stock saving at z=1.645."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(
        F.broadcast(p), li["l_partkey"] == p["p_partkey"]
    ).select(
        "p_brand",
        F.to_date("l_shipdate").alias("d"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    top = (
        j.groupBy("p_brand")
        .agg(F.sum("q").cast("bigint").alias("tq"))
        .orderBy(F.desc("tq"), F.asc("p_brand"))
        .limit(_POOL_TOP)
        .select("p_brand")
    )
    jj = j.join(F.broadcast(top), "p_brand")
    byday = jj.groupBy("p_brand", "d").agg(
        F.sum("q").cast("bigint").alias("dq")
    )
    per = byday.groupBy("p_brand").agg(
        F.stddev_samp(F.col("dq").cast("double")).alias("sd")
    )
    sum_sd = per.agg(F.sum("sd").alias("sum_sd"))
    pooled = (
        byday.groupBy("d")
        .agg(F.sum("dq").cast("bigint").alias("pq"))
        .agg(
            F.stddev_samp(F.col("pq").cast("double")).alias(
                "pooled_sd"
            )
        )
    )
    return sum_sd.crossJoin(pooled).select(
        F.round("sum_sd", 4).alias("sum_sd"),
        F.round("pooled_sd", 4).alias("pooled_sd"),
        F.round(F.col("pooled_sd") / F.col("sum_sd"), 6).alias(
            "pooling_ratio"
        ),
        F.round(
            _POOL_Z * (F.col("sum_sd") - F.col("pooled_sd")), 4
        ).alias("safety_stock_saving"),
    )


SQL_DEMAND_POOLING = f"""
WITH j AS (
  SELECT p.p_brand, CAST(l.l_shipdate AS DATE) AS d,
         CAST(l.l_quantity AS BIGINT) AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), top AS (
  SELECT p_brand FROM (
    SELECT p_brand, CAST(sum(q) AS BIGINT) AS tq
    FROM j GROUP BY 1
    ORDER BY tq DESC, p_brand ASC LIMIT {_POOL_TOP}
  )
), byday AS (
  SELECT j.p_brand, j.d, CAST(sum(j.q) AS BIGINT) AS dq
  FROM j JOIN top USING (p_brand)
  GROUP BY 1, 2
), per AS (
  SELECT sum(sd) AS sum_sd FROM (
    SELECT p_brand, stddev_samp(CAST(dq AS DOUBLE)) AS sd
    FROM byday GROUP BY 1
  )
), pooled AS (
  SELECT stddev_samp(CAST(pq AS DOUBLE)) AS pooled_sd FROM (
    SELECT d, CAST(sum(dq) AS BIGINT) AS pq FROM byday GROUP BY 1
  )
)
SELECT round(sum_sd, 4) AS sum_sd,
       round(pooled_sd, 4) AS pooled_sd,
       round(pooled_sd / sum_sd, 6) AS pooling_ratio,
       round({_POOL_Z} * (sum_sd - pooled_sd), 4)
         AS safety_stock_saving
FROM per CROSS JOIN pooled
"""
