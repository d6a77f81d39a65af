"""Feature-eng packs #54-#56: classifier evaluation, growth accounting, Zipf/lognormal fits.

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
# Feature-eng pack #54: classifier-eval completion — MCC/Youden at
# the median threshold, temporal ECE, cost-optimal threshold,
# fairness gaps, precision@k, gains AUC
# --------------------------------------------------------------------------

def _pc_scored(spark, sf_dir):
    """Shared scored-event base for the classifier-eval pack: the
    value-score separating purchase (positive) from click (negative),
    the same convention as q_roc_auc."""
    e = _t(spark, sf_dir, "events")
    return e.where(
        F.col("event_type").isin("purchase", "click")
    ).select(
        "event_id",
        "user_id",
        F.dayofmonth("ts").cast("int").alias("day"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .cast("bigint")
        .alias("pos"),
    )


def q_mcc_score(spark, sf_dir):
    """MATTHEWS CORRELATION COEFFICIENT (plus balanced accuracy and
    Youden's J) of the value-score classifier at the EXACT combined-
    median threshold — the single-number confusion summary that
    stays honest under class imbalance where accuracy and even F1
    lie. The doubled median comes from the cumulative cent
    histogram; the four confusion cells are exact bigints; MCC's
    n^4-scale denominator is a product of four sqrt's of exact
    doubles (deterministic in both engines)."""
    base = _pc_scored(spark, sf_dir)
    hist = base.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = hist.select(
        "cents",
        F.sum("ct").over(w).cast("bigint").alias("cum"),
        F.sum("ct").over(wall).cast("bigint").alias("n"),
    )
    med = cum.select(
        F.min(
            F.when(
                F.expr("cum >= CAST((n + 1) div 2 AS BIGINT)"),
                F.col("cents"),
            )
        ).alias("v1"),
        F.min(
            F.when(
                F.expr("cum >= CAST(n div 2 + 1 AS BIGINT)"),
                F.col("cents"),
            )
        ).alias("v2"),
    ).select(F.expr("v1 + v2").cast("bigint").alias("med2"))
    cells = base.crossJoin(F.broadcast(med)).agg(
        F.sum(
            F.expr(
                "CASE WHEN 2 * cents > med2 AND pos = 1"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("tp"),
        F.sum(
            F.expr(
                "CASE WHEN 2 * cents > med2 AND pos = 0"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("fp"),
        F.sum(
            F.expr(
                "CASE WHEN 2 * cents <= med2 AND pos = 0"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("tn"),
        F.sum(
            F.expr(
                "CASE WHEN 2 * cents <= med2 AND pos = 1"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("fn"),
    )
    return cells.select(
        "tp",
        "fp",
        "tn",
        "fn",
        F.round(
            F.expr(
                "(CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)"
                " / nullif(sqrt(CAST(tp + fp AS DOUBLE))"
                "   * sqrt(CAST(tp + fn AS DOUBLE))"
                "   * sqrt(CAST(tn + fp AS DOUBLE))"
                "   * sqrt(CAST(tn + fn AS DOUBLE)), 0.0)"
            ),
            6,
        ).alias("mcc"),
        F.round(
            F.expr(
                "0.5 * (CAST(tp AS DOUBLE) / nullif(tp + fn, 0)"
                " + CAST(tn AS DOUBLE) / nullif(tn + fp, 0))"
            ),
            6,
        ).alias("balanced_acc"),
        F.round(
            F.expr(
                "CAST(tp AS DOUBLE) / nullif(tp + fn, 0)"
                " + CAST(tn AS DOUBLE) / nullif(tn + fp, 0) - 1.0"
            ),
            6,
        ).alias("youden_j"),
    )


SQL_MCC_SCORE = """
WITH base AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
              AS BIGINT) AS pos
  FROM events WHERE event_type IN ('purchase', 'click')
), hist AS (
  SELECT cents, CAST(count(*) AS BIGINT) AS ct FROM base GROUP BY 1
), cum AS (
  SELECT cents,
         CAST(sum(ct) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(sum(ct) OVER () AS BIGINT) AS n
  FROM hist
), med AS (
  SELECT CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN cents END)
              + min(CASE WHEN cum >= n // 2 + 1 THEN cents END)
              AS BIGINT) AS med2
  FROM cum
), cells AS (
  SELECT
    CAST(sum(CASE WHEN 2 * cents > med2 AND pos = 1
             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(sum(CASE WHEN 2 * cents > med2 AND pos = 0
             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(sum(CASE WHEN 2 * cents <= med2 AND pos = 0
             THEN 1 ELSE 0 END) AS BIGINT) AS tn,
    CAST(sum(CASE WHEN 2 * cents <= med2 AND pos = 1
             THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM base CROSS JOIN med
)
SELECT tp, fp, tn, fn,
       round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
             / nullif(sqrt(CAST(tp + fp AS DOUBLE))
               * sqrt(CAST(tp + fn AS DOUBLE))
               * sqrt(CAST(tn + fp AS DOUBLE))
               * sqrt(CAST(tn + fn AS DOUBLE)), 0.0), 6) AS mcc,
       round(0.5 * (CAST(tp AS DOUBLE) / nullif(tp + fn, 0)
                    + CAST(tn AS DOUBLE) / nullif(tn + fp, 0)), 6)
         AS balanced_acc,
       round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0)
             + CAST(tn AS DOUBLE) / nullif(tn + fp, 0) - 1.0, 6)
         AS youden_j
FROM cells
"""


def q_ece_score(spark, sf_dir):
    """TEMPORAL EXPECTED CALIBRATION ERROR: train bin-wise purchase
    probabilities on WEEK 1 (value-decile bins by exact rank cuts
    over the week-1 histogram), evaluate on WEEKS 3-4, and report
    per-bin (predicted vs observed) plus the weighted |gap| sum —
    does last week's calibration still hold (`calibration_bins`
    bins one window; this is the drift-aware ECE). All counts exact
    bigints; the ECE fold is O(bins)."""
    base = _pc_scored(spark, sf_dir)
    w1 = base.where(F.col("day") <= 7)
    hist = w1.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = hist.select(
        "cents",
        F.sum("ct").over(w).cast("bigint").alias("cum"),
        F.sum("ct").over(wall).cast("bigint").alias("n"),
    )
    edges = (
        cum.crossJoin(
            F.broadcast(
                spark.range(1, 10).select(
                    F.col("id").cast("int").alias("d")
                )
            )
        )
        .where(F.expr("cum >= (d * n + 9) div 10"))
        .groupBy("d")
        .agg(F.min("cents").cast("bigint").alias("edge"))
    )
    def binned(df):
        return (
            df.crossJoin(F.broadcast(edges))
            .groupBy("event_id", "pos")
            .agg(
                (1 + F.sum(
                    F.expr("CASE WHEN cents > edge THEN 1 ELSE 0 END")
                ))
                .cast("int")
                .alias("bin")
            )
        )
    train = binned(w1).groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train"),
        F.sum("pos").cast("bigint").alias("p_train"),
    )
    test = binned(base.where(F.col("day") >= 15)).groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum("pos").cast("bigint").alias("p_test"),
    )
    j = train.join(test, "bin")
    tot = j.agg(F.sum("n_test").cast("bigint").alias("nt"))
    ece = (
        j.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.expr(
                    "CAST(n_test AS DOUBLE) / nt"
                    " * abs(CAST(p_train AS DOUBLE) / n_train"
                    "       - CAST(p_test AS DOUBLE) / n_test)"
                )
            ).alias("ece")
        )
    )
    return j.crossJoin(F.broadcast(ece)).select(
        "bin",
        "n_train",
        "n_test",
        F.round(
            F.expr("CAST(p_train AS DOUBLE) / n_train"), 6
        ).alias("pred_rate"),
        F.round(
            F.expr("CAST(p_test AS DOUBLE) / n_test"), 6
        ).alias("obs_rate"),
        F.round("ece", 6).alias("ece"),
    )


SQL_ECE_SCORE = """
WITH base AS (
  SELECT event_id, CAST(day(ts) AS INTEGER) AS day,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
              AS BIGINT) AS pos
  FROM events WHERE event_type IN ('purchase', 'click')
), w1 AS (
  SELECT * FROM base WHERE day <= 7
), hist AS (
  SELECT cents, CAST(count(*) AS BIGINT) AS ct FROM w1 GROUP BY 1
), cum AS (
  SELECT cents,
         CAST(sum(ct) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(sum(ct) OVER () AS BIGINT) AS n
  FROM hist
), edges AS (
  SELECT d, CAST(min(cents) AS BIGINT) AS edge
  FROM cum CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS d) ds
  WHERE cum >= (d * n + 9) // 10
  GROUP BY 1
), train AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_train,
         CAST(sum(pos) AS BIGINT) AS p_train
  FROM (
    SELECT w1.event_id, max(w1.pos) AS pos,
           CAST(1 + sum(CASE WHEN w1.cents > e.edge
                        THEN 1 ELSE 0 END) AS INTEGER) AS bin
    FROM w1 CROSS JOIN edges e
    GROUP BY w1.event_id
  ) GROUP BY 1
), test AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(pos) AS BIGINT) AS p_test
  FROM (
    SELECT b.event_id, max(b.pos) AS pos,
           CAST(1 + sum(CASE WHEN b.cents > e.edge
                        THEN 1 ELSE 0 END) AS INTEGER) AS bin
    FROM base b CROSS JOIN edges e
    WHERE b.day >= 15
    GROUP BY b.event_id
  ) GROUP BY 1
), j AS (
  SELECT train.bin, n_train, p_train, n_test, p_test
  FROM train JOIN test USING (bin)
), tot AS (
  SELECT CAST(sum(n_test) AS BIGINT) AS nt FROM j
), ece AS (
  SELECT sum(CAST(n_test AS DOUBLE) / nt
             * abs(CAST(p_train AS DOUBLE) / n_train
                   - CAST(p_test AS DOUBLE) / n_test)) AS ece
  FROM j CROSS JOIN tot
)
SELECT bin, n_train, n_test,
       round(CAST(p_train AS DOUBLE) / n_train, 6) AS pred_rate,
       round(CAST(p_test AS DOUBLE) / n_test, 6) AS obs_rate,
       round(ece, 6) AS ece
FROM j CROSS JOIN ece
"""


def q_cost_threshold(spark, sf_dir):
    """COST-OPTIMAL DECISION THRESHOLD: with a false positive
    costing 1 and a false negative costing 5, sweep EVERY distinct
    score cut (predict positive when cents > t) via two cumulative
    histograms and return the cost-minimizing threshold — what
    `best_threshold` does for KS, done for asymmetric business cost.
    Exact integer costs; deterministic (cost asc, t asc) argmin."""
    base = _pc_scored(spark, sf_dir)
    hist = base.groupBy("cents").agg(
        F.sum("pos").cast("bigint").alias("p"),
        F.sum(F.expr("1 - pos")).cast("bigint").alias("ng"),
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = hist.select(
        "cents",
        F.sum("p").over(w).cast("bigint").alias("cum_p"),
        F.sum("ng").over(w).cast("bigint").alias("cum_n"),
        F.sum("p").over(wall).cast("bigint").alias("tot_p"),
        F.sum("ng").over(wall).cast("bigint").alias("tot_n"),
    )
    # threshold t = this cents value: FN = positives <= t, FP =
    # negatives > t; cost = 5*FN + 1*FP (exact bigint)
    scored = cum.select(
        "cents",
        F.expr("5 * cum_p + (tot_n - cum_n)")
        .cast("bigint")
        .alias("cost"),
        F.col("cum_p").alias("fn"),
        F.expr("tot_n - cum_n").cast("bigint").alias("fp"),
        "tot_p",
        "tot_n",
    )
    wr = Window.orderBy(F.col("cost").asc(), F.col("cents").asc())
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") == 1)
        .select(
            F.expr("CAST(cents AS DOUBLE) / 100.0").alias(
                "threshold_value"
            ),
            "fn",
            "fp",
            F.col("cost").alias("min_cost"),
            F.expr("5 * tot_p").cast("bigint").alias(
                "cost_flag_none"
            ),
            F.col("tot_n").alias("cost_flag_all"),
        )
    )


SQL_COST_THRESHOLD = """
WITH base AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
              AS BIGINT) AS pos
  FROM events WHERE event_type IN ('purchase', 'click')
), hist AS (
  SELECT cents, CAST(sum(pos) AS BIGINT) AS p,
         CAST(sum(1 - pos) AS BIGINT) AS ng
  FROM base GROUP BY 1
), cum AS (
  SELECT cents,
         CAST(sum(p) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_p,
         CAST(sum(ng) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_n,
         CAST(sum(p) OVER () AS BIGINT) AS tot_p,
         CAST(sum(ng) OVER () AS BIGINT) AS tot_n
  FROM hist
), scored AS (
  SELECT cents,
         CAST(5 * cum_p + (tot_n - cum_n) AS BIGINT) AS cost,
         cum_p AS fn, CAST(tot_n - cum_n AS BIGINT) AS fp,
         tot_p, tot_n
  FROM cum
)
SELECT CAST(cents AS DOUBLE) / 100.0 AS threshold_value,
       fn, fp, cost AS min_cost,
       CAST(5 * tot_p AS BIGINT) AS cost_flag_none,
       tot_n AS cost_flag_all
FROM (
  SELECT *, row_number() OVER (ORDER BY cost ASC, cents ASC) AS rk
  FROM scored
) WHERE rk = 1
"""


def q_fairness_gaps(spark, sf_dir):
    """FAIRNESS AUDIT of the value-score classifier at the median
    threshold: per user cohort (user_id % 4), the TPR and FPR, plus
    the max cross-group TPR gap (equal opportunity) and FPR gap
    (predictive equality) — the responsible-AI table every deployed
    filter ships with. Exact per-group confusion counts; the gap
    fold is O(groups)."""
    base = _pc_scored(spark, sf_dir)
    hist = base.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = hist.select(
        "cents",
        F.sum("ct").over(w).cast("bigint").alias("cum"),
        F.sum("ct").over(wall).cast("bigint").alias("n"),
    )
    med = cum.select(
        F.min(
            F.when(
                F.expr("cum >= CAST((n + 1) div 2 AS BIGINT)"),
                F.col("cents"),
            )
        ).alias("v1"),
        F.min(
            F.when(
                F.expr("cum >= CAST(n div 2 + 1 AS BIGINT)"),
                F.col("cents"),
            )
        ).alias("v2"),
    ).select(F.expr("v1 + v2").cast("bigint").alias("med2"))
    per = (
        base.crossJoin(F.broadcast(med))
        .groupBy((F.col("user_id") % 4).cast("int").alias("cohort"))
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN 2 * cents > med2 AND pos = 1"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("tp"),
            F.sum("pos").cast("bigint").alias("npos"),
            F.sum(
                F.expr(
                    "CASE WHEN 2 * cents > med2 AND pos = 0"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("fp"),
            F.sum(F.expr("1 - pos")).cast("bigint").alias("nneg"),
        )
    )
    rates = per.select(
        "cohort",
        "npos",
        "nneg",
        F.expr("CAST(tp AS DOUBLE) / nullif(npos, 0)").alias("tpr"),
        F.expr("CAST(fp AS DOUBLE) / nullif(nneg, 0)").alias("fpr"),
    )
    gaps = rates.agg(
        (F.max("tpr") - F.min("tpr")).alias("tpr_gap"),
        (F.max("fpr") - F.min("fpr")).alias("fpr_gap"),
    )
    return rates.crossJoin(F.broadcast(gaps)).select(
        "cohort",
        "npos",
        "nneg",
        F.round("tpr", 6).alias("tpr"),
        F.round("fpr", 6).alias("fpr"),
        F.round("tpr_gap", 6).alias("tpr_gap"),
        F.round("fpr_gap", 6).alias("fpr_gap"),
    )


SQL_FAIRNESS_GAPS = """
WITH base AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
              AS BIGINT) AS pos
  FROM events WHERE event_type IN ('purchase', 'click')
), hist AS (
  SELECT cents, CAST(count(*) AS BIGINT) AS ct FROM base GROUP BY 1
), cum AS (
  SELECT cents,
         CAST(sum(ct) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(sum(ct) OVER () AS BIGINT) AS n
  FROM hist
), med AS (
  SELECT CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN cents END)
              + min(CASE WHEN cum >= n // 2 + 1 THEN cents END)
              AS BIGINT) AS med2
  FROM cum
), per AS (
  SELECT CAST(user_id % 4 AS INTEGER) AS cohort,
         CAST(sum(CASE WHEN 2 * cents > med2 AND pos = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(pos) AS BIGINT) AS npos,
         CAST(sum(CASE WHEN 2 * cents > med2 AND pos = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(1 - pos) AS BIGINT) AS nneg
  FROM base CROSS JOIN med
  GROUP BY 1
), rates AS (
  SELECT cohort, npos, nneg,
         CAST(tp AS DOUBLE) / nullif(npos, 0) AS tpr,
         CAST(fp AS DOUBLE) / nullif(nneg, 0) AS fpr
  FROM per
), gaps AS (
  SELECT max(tpr) - min(tpr) AS tpr_gap,
         max(fpr) - min(fpr) AS fpr_gap
  FROM rates
)
SELECT cohort, npos, nneg,
       round(tpr, 6) AS tpr, round(fpr, 6) AS fpr,
       round(tpr_gap, 6) AS tpr_gap, round(fpr_gap, 6) AS fpr_gap
FROM rates CROSS JOIN gaps
"""


def q_prec_at_k(spark, sf_dir):
    """PRECISION@K of the value-score ranking: flag the top
    100/500/1000 scored events (deterministic (cents desc,
    event_id) order) and report the purchase precision plus recall
    at each k — the review-queue quality table a human-in-the-loop
    pipeline sizes its batches with. Exact integer cuts and
    counts."""
    base = _pc_scored(spark, sf_dir)
    wr = Window.orderBy(F.col("cents").desc(), F.col("event_id").asc())
    ranked = base.select(
        "pos",
        F.row_number().over(wr).cast("bigint").alias("rk"),
    )
    tot = ranked.agg(F.sum("pos").cast("bigint").alias("tot_pos"))
    ks = spark.createDataFrame([(100,), (500,), (1000,)], "k int")
    per = (
        ranked.crossJoin(F.broadcast(ks))
        .where(F.expr("rk <= k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_flagged"),
            F.sum("pos").cast("bigint").alias("n_hits"),
        )
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "k",
        "n_flagged",
        "n_hits",
        F.round(
            F.expr("CAST(n_hits AS DOUBLE) / n_flagged"), 6
        ).alias("precision_at_k"),
        F.round(
            F.expr("CAST(n_hits AS DOUBLE) / tot_pos"), 6
        ).alias("recall_at_k"),
    )


SQL_PREC_AT_K = """
WITH base AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
              AS BIGINT) AS pos
  FROM events WHERE event_type IN ('purchase', 'click')
), ranked AS (
  SELECT pos,
         CAST(row_number() OVER (ORDER BY cents DESC, event_id ASC)
              AS BIGINT) AS rk
  FROM base
), tot AS (
  SELECT CAST(sum(pos) AS BIGINT) AS tot_pos FROM ranked
), ks AS (
  SELECT CAST(k AS INTEGER) AS k
  FROM (VALUES (100), (500), (1000)) t(k)
)
SELECT k,
       CAST(count(*) AS BIGINT) AS n_flagged,
       CAST(sum(pos) AS BIGINT) AS n_hits,
       round(CAST(sum(pos) AS DOUBLE) / count(*), 6)
         AS precision_at_k,
       round(CAST(sum(pos) AS DOUBLE) / max(tot_pos), 6)
         AS recall_at_k
FROM ranked CROSS JOIN ks CROSS JOIN tot
WHERE rk <= k
GROUP BY 1
"""


def q_gains_auc(spark, sf_dir):
    """CUMULATIVE GAINS AUC: the exact area under the gains curve
    (share of positives captured vs share of population flagged,
    sweeping the deterministic (cents desc, event_id) ranking) — the
    single-number summary of `decile_lift`'s table; 0.5 = random,
    1.0 = perfect ranking. EXACT RATIONAL: the area telescopes to
    sum(cum_pos_i) over all ranks / (n * total_pos) via the
    trapezoid-free right-sum, all bigint (DECIMAL(38)/HUGEINT for
    the rank-sum scale at 10^10 rows)."""
    base = _pc_scored(spark, sf_dir)
    wr = Window.orderBy(F.col("cents").desc(), F.col("event_id").asc())
    wcum = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = base.select(
        "pos",
        F.sum("pos").over(wcum).cast("bigint").alias("cum_pos"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("tot_pos"),
        F.sum(F.expr("CAST(cum_pos AS DECIMAL(38,0))"))
        .cast("decimal(38,0)")
        .alias("s_cum"),
    )
    return agg.select(
        "n",
        "tot_pos",
        F.round(
            F.expr(
                "CAST(s_cum AS DOUBLE)"
                " / (CAST(n AS DOUBLE) * tot_pos)"
            ),
            6,
        ).alias("gains_auc"),
    )


SQL_GAINS_AUC = """
WITH base AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
              AS BIGINT) AS pos
  FROM events WHERE event_type IN ('purchase', 'click')
), ranked AS (
  SELECT pos,
         CAST(sum(pos) OVER (ORDER BY cents DESC, event_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_pos
  FROM base
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(pos) AS BIGINT) AS tot_pos,
       round(CAST(sum(CAST(cum_pos AS HUGEINT)) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * sum(pos)), 6)
         AS gains_auc
FROM ranked
"""


# --------------------------------------------------------------------------
# Feature-eng pack #55: growth accounting, power-user curve,
# diversified top-k, band-anomaly days, rank stability,
# conversion-lag histogram
# --------------------------------------------------------------------------

def q_growth_accounting(spark, sf_dir):
    """GROWTH ACCOUNTING (the canonical new/retained/resurrected/
    churned decomposition) per full week 2-4: every week-w active
    user is NEW (first active week is w), RETAINED (active w-1), or
    RESURRECTED (inactive w-1 but seen earlier); CHURNED counts the
    w-1 actives who went quiet — and new + retained + resurrected
    provably equals the week's actives (pytest asserts the
    identity). One distinct (user, week) presence table, one
    first-week agg, two keyed self-joins; exact bigints."""
    e = _t(spark, sf_dir, "events")
    pres = (
        e.where(F.expr("dayofmonth(ts) <= 28"))
        .select(
            "user_id",
            F.expr(
                "CAST((dayofmonth(ts) - 1) div 7 + 1 AS INT)"
            ).alias("wk"),
        )
        .distinct()
    )
    first = pres.groupBy("user_id").agg(
        F.min("wk").alias("first_wk")
    )
    prev = pres.select(
        "user_id", (F.col("wk") + 1).alias("wk")
    )
    lab = (
        pres.join(first, "user_id")
        .join(
            prev.withColumnRenamed("wk", "wk_").selectExpr(
                "user_id", "wk_ AS wk", "1 AS was_prev"
            ),
            ["user_id", "wk"],
            "left",
        )
        .where(F.col("wk") >= 2)
        .select(
            "wk",
            F.expr(
                "CASE WHEN first_wk = wk THEN 'new'"
                " WHEN was_prev = 1 THEN 'retained'"
                " ELSE 'resurrected' END"
            ).alias("state"),
        )
    )
    counts = lab.groupBy("wk").agg(
        F.sum(F.expr("CASE WHEN state = 'new' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_new"),
        F.sum(
            F.expr("CASE WHEN state = 'retained' THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.expr(
                "CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("n_resurrected"),
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
    )
    churn = (
        pres.where(F.col("wk") <= 3)
        .join(
            pres.select(
                "user_id", (F.col("wk") - 1).alias("wk")
            ),
            ["user_id", "wk"],
            "left_anti",
        )
        .select((F.col("wk") + 1).alias("wk"))
        .groupBy("wk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    return counts.join(churn, "wk", "left").select(
        F.col("wk").alias("week"),
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce("n_churned", F.lit(0))
        .cast("bigint")
        .alias("n_churned"),
        F.round(
            F.expr(
                "(CAST(n_new + n_resurrected AS DOUBLE)"
                " - coalesce(n_churned, 0))"
                " / n_active"
            ),
            6,
        ).alias("quick_ratio_delta"),
    )


SQL_GROWTH_ACCOUNTING = """
WITH pres AS (
  SELECT DISTINCT user_id,
         CAST((day(ts) - 1) // 7 + 1 AS INTEGER) AS wk
  FROM events WHERE day(ts) <= 28
), first AS (
  SELECT user_id, min(wk) AS first_wk FROM pres GROUP BY 1
), lab AS (
  SELECT p.wk,
         CASE WHEN f.first_wk = p.wk THEN 'new'
              WHEN EXISTS (SELECT 1 FROM pres q
                           WHERE q.user_id = p.user_id
                             AND q.wk = p.wk - 1) THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM pres p JOIN first f USING (user_id)
  WHERE p.wk >= 2
), counts AS (
  SELECT wk,
         CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new,
         CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_retained,
         CAST(sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_resurrected,
         CAST(count(*) AS BIGINT) AS n_active
  FROM lab GROUP BY 1
), churn AS (
  SELECT p.wk + 1 AS wk, CAST(count(*) AS BIGINT) AS n_churned
  FROM pres p
  WHERE p.wk <= 3 AND NOT EXISTS (
    SELECT 1 FROM pres q
    WHERE q.user_id = p.user_id AND q.wk = p.wk + 1)
  GROUP BY 1
)
SELECT counts.wk AS week, n_active, n_new, n_retained,
       n_resurrected,
       CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned,
       round((CAST(n_new + n_resurrected AS DOUBLE)
              - coalesce(n_churned, 0)) / n_active, 6)
         AS quick_ratio_delta
FROM counts LEFT JOIN churn ON counts.wk = churn.wk
"""


def q_power_user_curve(spark, sf_dir):
    """POWER USER CURVE: the distribution of users by ACTIVE-DAY
    count over the month, bucketed 1 / 2-3 / 4-7 / 8-14 / 15+ — a
    right-shifted curve is an engaged product, a wall at 1 is
    drive-by traffic (`dau_mau` is this curve's mean; the shape is
    the diagnosis). Exact distinct-day counts and bucket counts."""
    e = _t(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        F.countDistinct(F.dayofmonth("ts"))
        .cast("bigint")
        .alias("days")
    )
    tot = pu.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    bucketed = pu.select(
        F.expr(
            "CASE WHEN days = 1 THEN '01' WHEN days <= 3 THEN '02-03'"
            " WHEN days <= 7 THEN '04-07'"
            " WHEN days <= 14 THEN '08-14' ELSE '15+' END"
        ).alias("day_bucket"),
        "days",
    )
    return (
        bucketed.groupBy("day_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("days").cast("bigint").alias("active_days"),
        )
        .crossJoin(
            F.broadcast(
                tot.select(F.col("n_users").alias("n_total"))
            )
        )
        .select(
            "day_bucket",
            "n_users",
            "active_days",
            F.round(
                F.expr("CAST(n_users AS DOUBLE) / n_total"), 6
            ).alias("user_share"),
        )
    )


SQL_POWER_USER_CURVE = """
WITH pu AS (
  SELECT user_id,
         CAST(count(DISTINCT day(ts)) AS BIGINT) AS days
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM pu
), bucketed AS (
  SELECT CASE WHEN days = 1 THEN '01'
              WHEN days <= 3 THEN '02-03'
              WHEN days <= 7 THEN '04-07'
              WHEN days <= 14 THEN '08-14'
              ELSE '15+' END AS day_bucket,
         days
  FROM pu
)
SELECT day_bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(days) AS BIGINT) AS active_days,
       round(CAST(count(*) AS DOUBLE) / max(n_total), 6)
         AS user_share
FROM bucketed CROSS JOIN tot
GROUP BY 1
"""


def q_diverse_topk(spark, sf_dir):
    """DIVERSIFIED TOP-K retrieval: the top 10 documents by length
    score with AT MOST 2 PER SOURCE — the per-provider cap every
    "related items" surface enforces so one feed can't monopolize
    the slate (the windowed cousin of `domain_cap`'s corpus quota).
    Two deterministic rank windows (within-source, then global over
    the survivors); exact integer keys everywhere."""
    d = _t(spark, sf_dir, "documents")
    ws = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    capped = (
        d.select("doc_id", "source", "n_chars")
        .withColumn("src_rank", F.row_number().over(ws))
        .where(F.col("src_rank") <= 2)
    )
    wg = Window.orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        capped.withColumn("rk", F.row_number().over(wg))
        .where(F.col("rk") <= 10)
        .select("rk", "doc_id", "source", "n_chars", "src_rank")
    )


SQL_DIVERSE_TOPK = """
WITH capped AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC)
           AS src_rank
  FROM documents
)
SELECT * FROM (
  SELECT row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)
           AS rk,
         doc_id, source, n_chars, src_rank
  FROM capped WHERE src_rank <= 2
) WHERE rk <= 10
"""


def q_band_anomaly_days(spark, sf_dir):
    """QUANTILE-BAND ANOMALY DAYS: days whose count falls outside
    the type's own exact [p10, p90] daily band — the robust
    (order-statistic) twin of `burst_intervals`' mean+2*sigma flag,
    immune to the outliers it hunts. Band edges via rank picks on
    the 30-day series; exact integer comparisons."""
    e = _t(spark, sf_dir, "events")
    days = (
        e.select(F.dayofmonth("ts").cast("int").alias("day"))
        .distinct()
    )
    types = e.select("event_type").distinct()
    raw = (
        e.select(
            "event_type",
            F.dayofmonth("ts").cast("int").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(raw, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("c", F.lit(0)).cast("bigint").alias("c"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("c", "day")
    wn = Window.partitionBy("event_type")
    ranked = grid.select(
        "event_type",
        "day",
        "c",
        F.row_number().over(wr).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    bands = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.expr("rn = (10 * n + 99) div 100"), F.col("c")
            )
        ).alias("p10"),
        F.max(
            F.when(
                F.expr("rn = (90 * n + 99) div 100"), F.col("c")
            )
        ).alias("p90"),
    )
    return (
        grid.join(F.broadcast(bands), "event_type")
        .where(F.expr("c < p10 OR c > p90"))
        .select(
            "event_type",
            "day",
            F.col("c").alias("count"),
            F.col("p10").cast("bigint").alias("band_lo"),
            F.col("p90").cast("bigint").alias("band_hi"),
            F.expr(
                "CASE WHEN c > p90 THEN 'high' ELSE 'low' END"
            ).alias("side"),
        )
    )


SQL_BAND_ANOMALY_DAYS = """
WITH days AS (
  SELECT DISTINCT CAST(day(ts) AS INTEGER) AS day FROM events
), types AS (
  SELECT DISTINCT event_type FROM events
), raw AS (
  SELECT event_type, CAST(day(ts) AS INTEGER) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, d.day, CAST(coalesce(r.c, 0) AS BIGINT) AS c
  FROM types t CROSS JOIN days d
  LEFT JOIN raw r ON r.event_type = t.event_type AND r.day = d.day
), ranked AS (
  SELECT event_type, day, c,
         CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY c, day) AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
           AS n
  FROM grid
), bands AS (
  SELECT event_type,
         max(CASE WHEN rn = (10 * n + 99) // 100 THEN c END) AS p10,
         max(CASE WHEN rn = (90 * n + 99) // 100 THEN c END) AS p90
  FROM ranked GROUP BY 1
)
SELECT g.event_type, g.day, g.c AS count,
       CAST(p10 AS BIGINT) AS band_lo,
       CAST(p90 AS BIGINT) AS band_hi,
       CASE WHEN g.c > p90 THEN 'high' ELSE 'low' END AS side
FROM grid g JOIN bands b ON g.event_type = b.event_type
WHERE g.c < p10 OR g.c > p90
"""


def q_rank_stability(spark, sf_dir):
    """RANK STABILITY of the top spenders: Spearman correlation
    between users' week-1 and week-4 spend RANKS (users active in
    both; doubled midranks keep ties integer) — does the leaderboard
    persist or reshuffle (`rbo_overlap` compares two lists top-down;
    this correlates the full common set). Exact integer rank
    machinery; the Spearman fold uses the integer-moment Pearson
    formula on the doubled ranks."""
    e = _t(spark, sf_dir, "events")
    pu = (
        e.where(
            F.expr(
                "dayofmonth(ts) <= 7 OR dayofmonth(ts)"
                " BETWEEN 22 AND 28"
            )
        )
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.expr("dayofmonth(ts) <= 7"),
                    F.expr("CAST(round(value * 100) AS BIGINT)"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("w1"),
            F.sum(
                F.when(
                    F.expr("dayofmonth(ts) >= 22"),
                    F.expr("CAST(round(value * 100) AS BIGINT)"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("w4"),
        )
        .where(F.expr("w1 > 0 AND w4 > 0"))
    )
    w1h = pu.groupBy("w1").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    ww = Window.orderBy("w1").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r1 = w1h.select(
        "w1",
        (2 * (F.sum("t").over(ww) - F.col("t")) + F.col("t") + 1)
        .cast("bigint")
        .alias("r1"),
    )
    w4h = pu.groupBy("w4").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    ww4 = Window.orderBy("w4").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r4 = w4h.select(
        "w4",
        (2 * (F.sum("t").over(ww4) - F.col("t")) + F.col("t") + 1)
        .cast("bigint")
        .alias("r4"),
    )
    j = pu.join(r1, "w1").join(r4, "w4")
    agg = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r1").cast("bigint").alias("sx"),
        F.sum("r4").cast("bigint").alias("sy"),
        F.sum(F.expr("r1 * r1")).cast("bigint").alias("sxx"),
        F.sum(F.expr("r4 * r4")).cast("bigint").alias("syy"),
        F.sum(F.expr("r1 * r4")).cast("bigint").alias("sxy"),
    )
    return agg.select(
        F.col("n").alias("n_users"),
        F.round(
            F.expr(
                "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
                " / sqrt((CAST(n AS DOUBLE) * sxx"
                "         - CAST(sx AS DOUBLE) * sx)"
                "        * (CAST(n AS DOUBLE) * syy"
                "           - CAST(sy AS DOUBLE) * sy))"
            ),
            6,
        ).alias("spearman_w1_w4"),
    )


SQL_RANK_STABILITY = """
WITH pu AS (
  SELECT user_id,
         CAST(sum(CASE WHEN day(ts) <= 7
                  THEN CAST(round(value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS w1,
         CAST(sum(CASE WHEN day(ts) >= 22
                  THEN CAST(round(value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS w4
  FROM events
  WHERE day(ts) <= 7 OR day(ts) BETWEEN 22 AND 28
  GROUP BY 1
  HAVING sum(CASE WHEN day(ts) <= 7
             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) > 0
     AND sum(CASE WHEN day(ts) >= 22
             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) > 0
), r1 AS (
  SELECT w1, CAST(2 * (sum(t) OVER (ORDER BY w1
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t)
              + t + 1 AS BIGINT) AS r1
  FROM (SELECT w1, CAST(count(*) AS BIGINT) AS t
        FROM pu GROUP BY 1)
), r4 AS (
  SELECT w4, CAST(2 * (sum(t) OVER (ORDER BY w4
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t)
              + t + 1 AS BIGINT) AS r4
  FROM (SELECT w4, CAST(count(*) AS BIGINT) AS t
        FROM pu GROUP BY 1)
), j AS (
  SELECT pu.user_id, r1.r1, r4.r4
  FROM pu JOIN r1 USING (w1) JOIN r4 USING (w4)
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r1) AS BIGINT) AS sx,
         CAST(sum(r4) AS BIGINT) AS sy,
         CAST(sum(r1 * r1) AS BIGINT) AS sxx,
         CAST(sum(r4 * r4) AS BIGINT) AS syy,
         CAST(sum(r1 * r4) AS BIGINT) AS sxy
  FROM j
)
SELECT n AS n_users,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx
                     - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy
                       - CAST(sy AS DOUBLE) * sy)), 6)
         AS spearman_w1_w4
FROM agg
"""


def q_conversion_lag_hist(spark, sf_dir):
    """CONVERSION LAG HISTOGRAM: for each user's FIRST purchase, the
    lag since their FIRST event, bucketed <1h / 1-24h / 1-3d / 3-7d
    / 7d+ — the funnel-velocity shape behind `time_to_convert`'s
    percentiles. Exact microsecond lags and bucket counts."""
    e = _t(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        F.min(_us("ts")).alias("first_us"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", _us("ts")
            )
        ).alias("buy_us"),
    )
    lagged = pu.where(F.col("buy_us").isNotNull()).select(
        F.expr("buy_us - first_us").alias("lag_us")
    )
    tot = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converters")
    )
    bucketed = lagged.select(
        F.expr(
            "CASE WHEN lag_us < 3600000000 THEN 'a_<1h'"
            " WHEN lag_us < 86400000000 THEN 'b_1-24h'"
            " WHEN lag_us < 259200000000 THEN 'c_1-3d'"
            " WHEN lag_us < 604800000000 THEN 'd_3-7d'"
            " ELSE 'e_7d+' END"
        ).alias("lag_bucket")
    )
    return (
        bucketed.groupBy("lag_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            "lag_bucket",
            "n_users",
            F.round(
                F.expr("CAST(n_users AS DOUBLE) / n_converters"), 6
            ).alias("share"),
        )
    )


SQL_CONVERSION_LAG_HIST = """
WITH pu AS (
  SELECT user_id, min(epoch_us(ts)) AS first_us,
         min(CASE WHEN event_type = 'purchase'
             THEN epoch_us(ts) END) AS buy_us
  FROM events GROUP BY 1
), lagged AS (
  SELECT buy_us - first_us AS lag_us
  FROM pu WHERE buy_us IS NOT NULL
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_converters FROM lagged
), bucketed AS (
  SELECT CASE WHEN lag_us < 3600000000 THEN 'a_<1h'
              WHEN lag_us < 86400000000 THEN 'b_1-24h'
              WHEN lag_us < 259200000000 THEN 'c_1-3d'
              WHEN lag_us < 604800000000 THEN 'd_3-7d'
              ELSE 'e_7d+' END AS lag_bucket
  FROM lagged
)
SELECT lag_bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       round(CAST(count(*) AS DOUBLE) / max(n_converters), 6)
         AS share
FROM bucketed CROSS JOIN tot
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Feature-eng pack #56: Zipf rank-frequency fit quality, lognormal
# length fit
# --------------------------------------------------------------------------

def q_zipf_r2(spark, sf_dir):
    """ZIPF FIT QUALITY: the R^2 (and slope) of the least-squares
    log-log rank-frequency regression over the corpus's top-100
    tokens — `zipf_two_point` reads the slope from two points; this
    says how LINEAR the whole head actually is (natural text ~0.98+,
    templated/generated text sags). Token counts and ranks are exact
    integers; the OLS runs over the tiny 100-row head with
    deterministic (count desc, token) ranking."""
    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select(
            F.explode(
                F.split(F.trim(F.col("text")), "\\s+")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wr = Window.orderBy(F.col("c").desc(), F.col("w").asc())
    head = tf.select(
        "c", F.row_number().over(wr).cast("bigint").alias("r")
    ).where(F.col("r") <= 100)
    agg = head.select(
        F.expr("ln(CAST(r AS DOUBLE))").alias("x"),
        F.expr("ln(CAST(c AS DOUBLE))").alias("y"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    return agg.select(
        F.col("n").alias("n_head"),
        F.round(
            F.expr(
                "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
            ),
            6,
        ).alias("zipf_slope"),
        F.round(
            F.expr(
                "pow(n * sxy - sx * sy, 2)"
                " / ((n * sxx - sx * sx) * (n * syy - sy * sy))"
            ),
            6,
        ).alias("r2"),
    )


SQL_ZIPF_R2 = """
WITH tf AS (
  SELECT u.w, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT regexp_split_to_array(trim(text), '\\s+') AS arr
    FROM documents
  ) t, unnest(t.arr) AS u(w)
  WHERE u.w <> ''
  GROUP BY 1
), head AS (
  SELECT c, CAST(row_number() OVER (ORDER BY c DESC, w ASC)
           AS BIGINT) AS r
  FROM tf QUALIFY r <= 100
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(ln(CAST(r AS DOUBLE))) AS sx,
         sum(ln(CAST(c AS DOUBLE))) AS sy,
         sum(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))) AS sxx,
         sum(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS syy,
         sum(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS sxy
  FROM head
)
SELECT n AS n_head,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
         AS zipf_slope,
       round(pow(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS r2
FROM agg
"""


def q_lognormal_fit(spark, sf_dir):
    """LOGNORMAL FIT of document lengths (n_chars) per source:
    mu/sigma of ln(length) by method of moments, plus the implied
    lognormal median exp(mu) next to the EXACT empirical median —
    the sanity pair a corpus card prints (lengths that aren't even
    roughly lognormal signal truncation or templating;
    `length_buckets` bins, this fits). Integer lengths; ln folds per
    source; empirical median from the rank pick."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "source", F.col("n_chars").cast("bigint").alias("len")
    ).where(F.col("len") > 0)
    mom = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg(F.expr("ln(CAST(len AS DOUBLE))")).alias("mu"),
        (
            F.avg(
                F.expr(
                    "ln(CAST(len AS DOUBLE))"
                    " * ln(CAST(len AS DOUBLE))"
                )
            )
        ).alias("m2"),
    )
    wo = Window.partitionBy("source").orderBy("len")
    wn = Window.partitionBy("source")
    med = (
        base.select(
            "source",
            "len",
            F.row_number().over(wo).cast("bigint").alias("rn"),
            F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
        )
        .where(F.expr("rn = (n + 1) div 2 OR rn = n div 2 + 1"))
        .groupBy("source")
        .agg(
            (
                F.sum(
                    F.expr(
                        "len * (CASE WHEN (n + 1) div 2 = n div 2 + 1"
                        " THEN 2 ELSE 1 END)"
                    )
                )
                / 2.0
            ).alias("emp_median")
        )
    )
    return mom.join(med, "source").select(
        "source",
        "n",
        F.round("mu", 6).alias("log_mu"),
        F.round(F.expr("sqrt(m2 - mu * mu)"), 6).alias("log_sigma"),
        F.round(F.expr("exp(mu)"), 6).alias("lognormal_median"),
        F.round("emp_median", 6).alias("empirical_median"),
    )


SQL_LOGNORMAL_FIT = """
WITH base AS (
  SELECT source, CAST(n_chars AS BIGINT) AS len
  FROM documents WHERE n_chars > 0
), mom AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         avg(ln(CAST(len AS DOUBLE))) AS mu,
         avg(ln(CAST(len AS DOUBLE)) * ln(CAST(len AS DOUBLE)))
           AS m2
  FROM base GROUP BY 1
), rk AS (
  SELECT source, len,
         row_number() OVER (PARTITION BY source ORDER BY len) AS rn,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM base
), med AS (
  SELECT source,
         sum(len * (CASE WHEN (n + 1) // 2 = n // 2 + 1
                    THEN 2 ELSE 1 END)) / 2.0 AS emp_median
  FROM rk WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
  GROUP BY 1
)
SELECT mom.source, mom.n,
       round(mu, 6) AS log_mu,
       round(sqrt(m2 - mu * mu), 6) AS log_sigma,
       round(exp(mu), 6) AS lognormal_median,
       round(emp_median, 6) AS empirical_median
FROM mom JOIN med USING (source)
"""
