"""Feature-eng pack #72 (r4): categorical encoders + multi-class eval.

The model-input encoders a tabular training pipeline applies to
high-cardinality categoricals, plus the multi-class quality readout.
All integer-count cores with closed-form tails:

* ``count_encode`` — count / smoothed-frequency encoding of two
  categorical columns at once (event_type and day-of-week), emitted
  long-form (feature, level): raw count, Laplace-smoothed frequency
  (cnt+α)/(N+α·K), and log1p-count — the three standard variants
  (public recipe; cf. scikit-learn CountEncoder / CatBoost docs).
  One hash agg per column over the fat table, union of O(K) rows.
* ``one_hot_topk`` — top-3-plus-other one-hot expansion: the top
  levels are chosen by a deterministic (count desc, name asc) rank,
  every other level folds into ``evt_other``, and the expansion is
  emitted LONG-form (user_id, feature, value) — the shape a feature
  store ingests, and the sparse-safe alternative to a wide
  N-column one-hot at 10^12 rows.  The top-k relation is O(K) and
  broadcast into the fat-side map.
* ``macro_f1`` — macro/per-class precision-recall-F1 of a histogram
  classifier: train on days 1-15 (per value-bin argmax class with a
  deterministic tie rule, global-argmax fallback for empty bins),
  score days 16+.  The confusion counts are one hash agg; per-class
  rows plus a __MACRO__ summary row.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._shared import _t

_CE_ALPHA = 5  # Laplace smoothing pseudo-count
_OH_TOPK = 3
_F1_BIN_CENTS = 2000  # $20 value bins
_F1_MAX_BIN = 9
_F1_TRAIN_DAY_MAX = 15


def q_count_encode(spark, sf_dir):
    """Count / smoothed-frequency / log1p-count encoding of
    event_type and day-of-week, long-form.  freq_smooth uses
    (cnt+α)/(N+α·K) with α=5 and K = the column's observed level
    count, so the tiny encoder table is self-contained."""
    e = _t(spark, sf_dir, "events")

    def enc(col, feat):
        g = e.groupBy(col.alias("level")).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        tot = g.agg(
            F.sum("cnt").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("k"),
        )
        return g.crossJoin(F.broadcast(tot)).select(
            F.lit(feat).alias("feature"),
            F.col("level").cast("string").alias("level"),
            "cnt",
            F.round(
                (F.col("cnt") + F.lit(_CE_ALPHA))
                / (F.col("n") + F.lit(_CE_ALPHA) * F.col("k")).cast(
                    "double"
                ),
                6,
            ).alias("freq_smooth"),
            F.round(F.log1p("cnt"), 6).alias("log1p_cnt"),
        )

    return enc(F.col("event_type"), "event_type").unionAll(
        enc(F.dayofweek("ts"), "dow")
    )


SQL_COUNT_ENCODE = f"""
WITH g1 AS (
  SELECT event_type AS level, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), t1 AS (SELECT sum(cnt) AS n, CAST(count(*) AS BIGINT) AS k FROM g1),
g2 AS (
  SELECT CAST(dayofweek(ts) + 1 AS VARCHAR) AS level,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), t2 AS (SELECT sum(cnt) AS n, CAST(count(*) AS BIGINT) AS k FROM g2)
SELECT 'event_type' AS feature, level, cnt,
       round((cnt + {_CE_ALPHA})
             / CAST(n + {_CE_ALPHA} * k AS DOUBLE), 6) AS freq_smooth,
       round(ln(1 + cnt), 6) AS log1p_cnt
FROM g1 CROSS JOIN t1
UNION ALL
SELECT 'dow', level, cnt,
       round((cnt + {_CE_ALPHA})
             / CAST(n + {_CE_ALPHA} * k AS DOUBLE), 6),
       round(ln(1 + cnt), 6)
FROM g2 CROSS JOIN t2
"""


def q_one_hot_topk(spark, sf_dir):
    """Top-3-plus-other one-hot expansion of event_type per user,
    long-form (user_id, feature, value).  The top-k levels come from
    a deterministic (count desc, name asc) rank over the O(K) level
    table, broadcast back into the fat-side CASE map; the expansion
    itself is one (user_id, feature) hash agg — no wide pivot, no
    per-row Python."""
    e = _t(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = (
        counts.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(
                    F.col("cnt").desc(), F.col("event_type").asc()
                )
            ),
        )
        .where(F.col("rk") <= _OH_TOPK)
        .select(F.col("event_type").alias("top_evt"))
    )
    mapped = e.join(
        F.broadcast(top), e["event_type"] == top["top_evt"], "left"
    ).select(
        "user_id",
        F.when(
            F.col("top_evt").isNotNull(),
            F.concat(F.lit("evt_"), F.col("event_type")),
        )
        .otherwise(F.lit("evt_other"))
        .alias("feature"),
    )
    return (
        mapped.groupBy("user_id", "feature")
        .agg(F.count(F.lit(1)).cast("bigint").alias("value"))
    )


SQL_ONE_HOT_TOPK = f"""
WITH counts AS (
  SELECT event_type, count(*) AS cnt FROM events GROUP BY 1
), top AS (
  SELECT event_type AS top_evt
  FROM (SELECT event_type, row_number()
               OVER (ORDER BY cnt DESC, event_type ASC) AS rk
        FROM counts)
  WHERE rk <= {_OH_TOPK}
)
SELECT user_id,
       CASE WHEN t.top_evt IS NOT NULL THEN 'evt_' || e.event_type
            ELSE 'evt_other' END AS feature,
       CAST(count(*) AS BIGINT) AS value
FROM events e LEFT JOIN top t ON e.event_type = t.top_evt
GROUP BY 1, 2
"""


def q_macro_f1(spark, sf_dir):
    """Macro / per-class P-R-F1 of a histogram classifier: per $20
    value bin, argmax train-class (days 1-15, tie rule count desc
    then class asc; global train argmax backs empty bins), scored on
    days 16+.  tp/fp/fn come from one (true,pred) hash agg; per-class
    rows + a __MACRO__ row carrying the macro-F1."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.dayofmonth("ts").alias("day"),
        F.least(
            F.lit(_F1_MAX_BIN),
            F.expr(
                f"CAST(round(value * 100) AS BIGINT) DIV {_F1_BIN_CENTS}"
            ),
        ).alias("bin"),
    )
    train = e.where(F.col("day") <= _F1_TRAIN_DAY_MAX)
    test = e.where(F.col("day") > _F1_TRAIN_DAY_MAX)
    rk = Window.partitionBy("bin").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    bin_pred = (
        train.groupBy("bin", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") == 1)
        .select("bin", F.col("event_type").alias("pred"))
    )
    global_pred = (
        train.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(
                    F.col("cnt").desc(), F.col("event_type").asc()
                )
            ),
        )
        .where(F.col("rk") == 1)
        .select(F.col("event_type").alias("gpred"))
    )
    scored = (
        test.join(F.broadcast(bin_pred), "bin", "left")
        .crossJoin(F.broadcast(global_pred))
        .select(
            F.col("event_type").alias("true_cls"),
            F.coalesce("pred", "gpred").alias("pred_cls"),
        )
    )
    conf = scored.groupBy("true_cls", "pred_cls").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    classes = conf.select(
        F.col("true_cls").alias("cls")
    ).unionAll(conf.select("pred_cls")).distinct()
    tp = conf.where(F.col("true_cls") == F.col("pred_cls")).select(
        F.col("true_cls").alias("cls"), F.col("n").alias("tp")
    )
    fp = (
        conf.where(F.col("true_cls") != F.col("pred_cls"))
        .groupBy(F.col("pred_cls").alias("cls"))
        .agg(F.sum("n").alias("fp"))
    )
    fn = (
        conf.where(F.col("true_cls") != F.col("pred_cls"))
        .groupBy(F.col("true_cls").alias("cls"))
        .agg(F.sum("n").alias("fn"))
    )
    per = (
        classes.join(tp, "cls", "left")
        .join(fp, "cls", "left")
        .join(fn, "cls", "left")
        .select(
            "cls",
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
            F.coalesce("fp", F.lit(0)).cast("bigint").alias("fp"),
            F.coalesce("fn", F.lit(0)).cast("bigint").alias("fn"),
        )
        .withColumn(
            "precision",
            F.when(F.col("tp") + F.col("fp") == 0, F.lit(0.0)).otherwise(
                F.col("tp") / (F.col("tp") + F.col("fp"))
            ),
        )
        .withColumn(
            "recall",
            F.when(F.col("tp") + F.col("fn") == 0, F.lit(0.0)).otherwise(
                F.col("tp") / (F.col("tp") + F.col("fn"))
            ),
        )
        .withColumn(
            "f1",
            F.when(
                F.col("precision") + F.col("recall") == 0, F.lit(0.0)
            ).otherwise(
                2
                * F.col("precision")
                * F.col("recall")
                / (F.col("precision") + F.col("recall"))
            ),
        )
    )
    rows = per.select(
        "cls",
        "tp",
        "fp",
        "fn",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
    )
    macro = per.agg(
        F.lit("__MACRO__").alias("cls"),
        F.sum("tp").cast("bigint").alias("tp"),
        F.sum("fp").cast("bigint").alias("fp"),
        F.sum("fn").cast("bigint").alias("fn"),
        F.round(F.avg("precision"), 6).alias("precision"),
        F.round(F.avg("recall"), 6).alias("recall"),
        F.round(F.avg("f1"), 6).alias("f1"),
    )
    return rows.unionAll(macro)


SQL_MACRO_F1 = f"""
WITH e AS (
  SELECT event_type,
         CAST(extract(day FROM ts) AS INTEGER) AS day,
         least({_F1_MAX_BIN},
               CAST(round(value * 100) AS BIGINT) // {_F1_BIN_CENTS})
           AS bin
  FROM events
), train AS (SELECT * FROM e WHERE day <= {_F1_TRAIN_DAY_MAX}),
test AS (SELECT * FROM e WHERE day > {_F1_TRAIN_DAY_MAX}),
bin_pred AS (
  SELECT bin, event_type AS pred
  FROM (SELECT bin, event_type, row_number() OVER (
          PARTITION BY bin ORDER BY count(*) DESC, event_type ASC) AS rk
        FROM train GROUP BY bin, event_type)
  WHERE rk = 1
), global_pred AS (
  SELECT event_type AS gpred
  FROM (SELECT event_type, row_number() OVER (
          ORDER BY count(*) DESC, event_type ASC) AS rk
        FROM train GROUP BY event_type)
  WHERE rk = 1
), scored AS (
  SELECT t.event_type AS true_cls,
         coalesce(b.pred, g.gpred) AS pred_cls
  FROM test t LEFT JOIN bin_pred b ON t.bin = b.bin
  CROSS JOIN global_pred g
), conf AS (
  SELECT true_cls, pred_cls, CAST(count(*) AS BIGINT) AS n
  FROM scored GROUP BY 1, 2
), classes AS (
  SELECT true_cls AS cls FROM conf
  UNION SELECT pred_cls FROM conf
), tp AS (
  SELECT true_cls AS cls, n AS tp FROM conf WHERE true_cls = pred_cls
), fp AS (
  SELECT pred_cls AS cls, sum(n) AS fp FROM conf
  WHERE true_cls <> pred_cls GROUP BY 1
), fn AS (
  SELECT true_cls AS cls, sum(n) AS fn FROM conf
  WHERE true_cls <> pred_cls GROUP BY 1
), per AS (
  SELECT c.cls,
         CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
         CAST(coalesce(fp.fp, 0) AS BIGINT) AS fp,
         CAST(coalesce(fn.fn, 0) AS BIGINT) AS fn,
         CASE WHEN coalesce(tp.tp, 0) + coalesce(fp.fp, 0) = 0 THEN 0.0
              ELSE coalesce(tp.tp, 0)
                   / CAST(coalesce(tp.tp, 0) + coalesce(fp.fp, 0)
                          AS DOUBLE) END AS precision,
         CASE WHEN coalesce(tp.tp, 0) + coalesce(fn.fn, 0) = 0 THEN 0.0
              ELSE coalesce(tp.tp, 0)
                   / CAST(coalesce(tp.tp, 0) + coalesce(fn.fn, 0)
                          AS DOUBLE) END AS recall
  FROM classes c
  LEFT JOIN tp ON c.cls = tp.cls
  LEFT JOIN fp ON c.cls = fp.cls
  LEFT JOIN fn ON c.cls = fn.cls
), perf AS (
  SELECT *,
         CASE WHEN precision + recall = 0 THEN 0.0
              ELSE 2 * precision * recall / (precision + recall) END
           AS f1
  FROM per
)
SELECT cls, tp, fp, fn, round(precision, 6) AS precision,
       round(recall, 6) AS recall, round(f1, 6) AS f1
FROM perf
UNION ALL
SELECT '__MACRO__', CAST(sum(tp) AS BIGINT), CAST(sum(fp) AS BIGINT),
       CAST(sum(fn) AS BIGINT), round(avg(precision), 6),
       round(avg(recall), 6), round(avg(f1), 6)
FROM perf
"""
