"""Feature-eng pack #97 (r4): one-step Cox regression, the classic
sort-based blocking strategy, and the credit-scoring KS statistic.

* ``cox_one_step`` — one-Newton-step Cox proportional hazards from
  beta = 0 (the efficient one-step estimator; score and information
  at 0 are closed forms over the life table): subjects are customers
  with first->second-order durations (the km_hazard construction),
  binary covariate x = custkey % 2; with Breslow ties
  U(0) = sum_t (dx_t - d_t s1/s0), I(0) = sum_t d_t (s1/s0)(1-s1/s0)
  over reverse-cumulative risk-set sums — every per-time term rounds
  to an e9 BIGINT before the exact final sums, so beta = U/I and the
  hazard ratio exp(beta) are engine-exact.
* ``sorted_neighborhood`` — Hernandez & Stolfo (1995) sorted-
  neighborhood blocking over the planted-duplicate corpus (pack #87):
  sort by the 20-char text prefix, compare each record with its next
  w = 3 neighbors; candidates / planted-pair recall / precision —
  the sort-based alternative to hash banding (distributed form:
  range-partition by the sort key; the window never crosses more
  than w rows past a partition boundary).
* ``ks_classifier`` — the Kolmogorov-Smirnov separation of the
  value-score classifier (purchase vs click): KS = max_v
  |F_pos(v) - F_neg(v)| with the exact BIGINT numerator
  |cp*N - cn*P|, plus the attaining threshold (smallest cents on
  ties) — the standard scorecard separation metric next to roc_auc.

Scale shape: life-table and CDF scans run on O(distinct values)
aggregates; the SNM window is w = 3 leads over a range-sorted
relation; nothing quadratic.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._shared import _t
from .bucketops import _ND_MOD, _ND_OFF, _aug_corpus

_SNM_W = 3  # sorted-neighborhood window
_SNM_KEY = 20  # chars of the sort key


def q_cox_one_step(spark, sf_dir):
    """ONE-STEP COX: score U(0) and information I(0) over the
    duration life table with reverse-cumulative risk sums; each
    per-time term is one identically-computed double rounded to e9."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    rk = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        "o_orderkey",
    ).withColumn("rk", F.row_number().over(w))
    per = rk.where(F.col("rk") <= 2).groupBy("o_custkey").agg(
        F.min(F.when(F.col("rk") == 1, F.col("d"))).alias("first_d"),
        F.min(F.when(F.col("rk") == 2, F.col("d"))).alias("second_d"),
    )
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("max_d"))
    dur = per.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("second_d").isNotNull(),
            F.datediff(F.col("second_d"), F.col("first_d")),
        )
        .otherwise(F.datediff(F.col("max_d"), F.col("first_d")))
        .cast("bigint")
        .alias("t"),
        F.when(F.col("second_d").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("ev"),
        (F.col("o_custkey") % 2).cast("bigint").alias("x"),
    )
    g = dur.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t"),
        F.sum("x").cast("bigint").alias("x_t"),
        F.sum("ev").cast("bigint").alias("d_t"),
        F.sum(F.col("ev") * F.col("x")).cast("bigint").alias("dx_t"),
    )
    wrev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = g.select(
        "t",
        "d_t",
        "dx_t",
        F.sum("n_t").over(wrev).cast("bigint").alias("s0"),
        F.sum("x_t").over(wrev).cast("bigint").alias("s1"),
    ).where(F.col("d_t") > 0)
    p = F.col("s1").cast("double") / F.col("s0")
    u_term = F.round(
        F.lit(1e9) * (F.col("dx_t") - F.col("d_t") * p)
    ).cast("bigint")
    i_term = F.round(
        F.lit(1e9) * F.col("d_t") * p * (1 - p)
    ).cast("bigint")
    agg = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_times"),
        F.sum("d_t").cast("bigint").alias("n_events"),
        F.sum(u_term).cast("bigint").alias("u_e9"),
        F.sum(i_term).cast("bigint").alias("i_e9"),
    )
    beta = F.col("u_e9").cast("double") / F.col("i_e9")
    return agg.select(
        "n_times",
        "n_events",
        "u_e9",
        "i_e9",
        F.round(beta, 6).alias("beta_one_step"),
        F.round(F.exp(beta), 6).alias("hazard_ratio"),
    )


SQL_COX_ONE_STEP = """
WITH rk AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_orderdate AS DATE),
                                     o_orderkey) AS rk
  FROM orders
), per AS (
  SELECT o_custkey,
         min(CASE WHEN rk = 1 THEN d END) AS first_d,
         min(CASE WHEN rk = 2 THEN d END) AS second_d
  FROM rk WHERE rk <= 2 GROUP BY o_custkey
), mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS max_d FROM orders),
dur AS (
  SELECT CAST(CASE WHEN second_d IS NOT NULL
                   THEN datediff('day', first_d, second_d)
                   ELSE datediff('day', first_d, max_d) END AS BIGINT)
           AS t,
         CAST(CASE WHEN second_d IS NOT NULL THEN 1 ELSE 0 END
              AS BIGINT) AS ev,
         CAST(o_custkey % 2 AS BIGINT) AS x
  FROM per CROSS JOIN mx
), g AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_t,
         CAST(sum(x) AS BIGINT) AS x_t,
         CAST(sum(ev) AS BIGINT) AS d_t,
         CAST(sum(ev * x) AS BIGINT) AS dx_t
  FROM dur GROUP BY t
), r AS (
  SELECT t, d_t, dx_t,
         CAST(sum(n_t) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS s0,
         CAST(sum(x_t) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS s1
  FROM g
), f AS (SELECT * FROM r WHERE d_t > 0),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_times,
         CAST(sum(d_t) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(1e9 * (dx_t - d_t * (CAST(s1 AS DOUBLE)
                                                  / s0))) AS BIGINT))
              AS BIGINT) AS u_e9,
         CAST(sum(CAST(round(1e9 * d_t * (CAST(s1 AS DOUBLE) / s0)
                             * (1 - CAST(s1 AS DOUBLE) / s0))
                       AS BIGINT)) AS BIGINT) AS i_e9
  FROM f
)
SELECT n_times, n_events, u_e9, i_e9,
       round(CAST(u_e9 AS DOUBLE) / i_e9, 6) AS beta_one_step,
       round(exp(CAST(u_e9 AS DOUBLE) / i_e9), 6) AS hazard_ratio
FROM agg
"""


def q_sorted_neighborhood(spark, sf_dir):
    """SORTED-NEIGHBORHOOD blocking eval: sort the planted corpus by
    the 20-char text prefix, pair each record with its next 3
    neighbors; recall against the planted pairs and precision of the
    candidate set."""
    aug = _aug_corpus(spark, sf_dir).select(
        "doc_id", F.substring("text", 1, _SNM_KEY).alias("key")
    )
    w = Window.orderBy("key", "doc_id")
    leads = aug.select(
        "doc_id",
        *[
            F.lead("doc_id", k).over(w).alias(f"n{k}")
            for k in range(1, _SNM_W + 1)
        ],
    )
    cands = None
    for k in range(1, _SNM_W + 1):
        c = leads.where(F.col(f"n{k}").isNotNull()).select(
            F.least("doc_id", f"n{k}").alias("doc_a"),
            F.greatest("doc_id", f"n{k}").alias("doc_b"),
        )
        cands = c if cands is None else cands.unionAll(c)
    cands = cands.distinct()
    truth = (
        _t(spark, sf_dir, "documents")
        .where((F.col("doc_id") % _ND_MOD).isin(0, 1))
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + _ND_OFF).alias("doc_b"),
        )
    )
    hits = cands.join(truth, ["doc_a", "doc_b"], "left_semi")
    m = (
        cands.agg(F.count(F.lit(1)).cast("bigint").alias("n_cand"))
        .crossJoin(
            F.broadcast(
                truth.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_truth")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                hits.agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
            )
        )
    )
    return m.select(
        "n_truth",
        "n_cand",
        "n_hit",
        F.round(
            F.col("n_hit") / F.col("n_cand").cast("double"), 6
        ).alias("precision"),
        F.round(
            F.col("n_hit") / F.col("n_truth").cast("double"), 6
        ).alias("recall"),
    )


SQL_SORTED_NEIGHBORHOOD = f"""
WITH aug AS (
  SELECT doc_id, substring(text, 1, {_SNM_KEY}) AS key FROM documents
  UNION ALL
  SELECT doc_id + {_ND_OFF}, substring(text, 1, {_SNM_KEY})
  FROM documents WHERE doc_id % {_ND_MOD} = 0
  UNION ALL
  SELECT doc_id + {_ND_OFF},
         substring(text || ' zz7', 1, {_SNM_KEY})
  FROM documents WHERE doc_id % {_ND_MOD} = 1
), leads AS (
  SELECT doc_id,
         {", ".join(
             f"lead(doc_id, {k}) OVER (ORDER BY key, doc_id) AS n{k}"
             for k in range(1, _SNM_W + 1)
         )}
  FROM aug
), cands AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    {" UNION ALL ".join(
        f"SELECT least(doc_id, n{k}) AS doc_a,"
        f" greatest(doc_id, n{k}) AS doc_b"
        f" FROM leads WHERE n{k} IS NOT NULL"
        for k in range(1, _SNM_W + 1)
    )}
  )
), truth AS (
  SELECT doc_id AS doc_a, doc_id + {_ND_OFF} AS doc_b
  FROM documents WHERE doc_id % {_ND_MOD} IN (0, 1)
), m AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
         (SELECT CAST(count(*) AS BIGINT) FROM cands) AS n_cand,
         (SELECT CAST(count(*) AS BIGINT)
          FROM cands c JOIN truth t
            ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS n_hit
)
SELECT n_truth, n_cand, n_hit,
       round(CAST(n_hit AS DOUBLE) / n_cand, 6) AS precision,
       round(CAST(n_hit AS DOUBLE) / n_truth, 6) AS recall
FROM m
"""


def q_ks_classifier(spark, sf_dir):
    """CLASSIFIER KS: max |F_pos - F_neg| over the value-cents score
    (purchase = positive, click = negative), exact BIGINT numerator
    |cp * N - cn * P|; reports the separation and the attaining
    threshold (smallest cents on ties)."""
    e = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "click"))
        .groupBy(F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("bigint"))
            .cast("bigint")
            .alias("p_at"),
            F.sum((F.col("event_type") == "click").cast("bigint"))
            .cast("bigint")
            .alias("n_at"),
        )
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = e.select(
        "c",
        F.sum("p_at").over(w).cast("bigint").alias("cp"),
        F.sum("n_at").over(w).cast("bigint").alias("cn"),
        F.sum("p_at").over(wall).cast("bigint").alias("tp"),
        F.sum("n_at").over(wall).cast("bigint").alias("tn"),
    )
    num = F.abs(F.col("cp") * F.col("tn") - F.col("cn") * F.col("tp"))
    r = cum.select(
        "c", "tp", "tn", num.cast("bigint").alias("num")
    )
    rn = F.row_number().over(Window.orderBy(F.desc("num"), F.asc("c")))
    best = r.withColumn("rn", rn).where(F.col("rn") == 1)
    return best.select(
        F.col("tp").alias("n_pos"),
        F.col("tn").alias("n_neg"),
        F.col("c").alias("at_cents"),
        F.round(
            F.col("num") / (F.col("tp") * F.col("tn")).cast("double"), 6
        ).alias("ks"),
    )


SQL_KS_CLASSIFIER = """
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS p_at,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_at
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY 1
), cum AS (
  SELECT c,
         CAST(sum(p_at) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cp,
         CAST(sum(n_at) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cn,
         CAST(sum(p_at) OVER () AS BIGINT) AS tp,
         CAST(sum(n_at) OVER () AS BIGINT) AS tn
  FROM e
), r AS (
  SELECT c, tp, tn,
         CAST(abs(cp * tn - cn * tp) AS BIGINT) AS num,
         row_number() OVER (ORDER BY abs(cp * tn - cn * tp) DESC, c ASC)
           AS rn
  FROM cum
)
SELECT tp AS n_pos, tn AS n_neg, c AS at_cents,
       round(CAST(num AS DOUBLE) / (tp * tn), 6) AS ks
FROM r WHERE rn = 1
"""
