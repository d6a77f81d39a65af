"""Feature-eng packs #20-#23: ROC/PR AUC, PSI drift, mutual info, recursive/lateral SQL, simhash pairs, sketches.

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
# Feature-eng pack #20: model-eval + drift diagnostics — ROC AUC,
# PSI drift, effective sample size, equal-frequency binning
# --------------------------------------------------------------------------


def q_roc_auc(spark, sf_dir):
    """Per-day ROC AUC of ``value`` separating purchase (positive)
    from click (negative) events — the Mann-Whitney rank statistic a
    label-quality / feature-screen job computes per slice.

    Distributed shape: the 100 TB event stream collapses to a
    per-(day, value) pos/neg count histogram (one map-side-combinable
    hash agg); the ordered window then runs over DISTINCT values per
    day, not raw rows. The AUC numerator stays INTEGER the whole way
    (ties get the standard half credit via ``2*neg_below*pos_at +
    neg_at*pos_at`` summed as bigints); one double division per day
    at the very end, so the statistic is engine-exact."""
    ev = _t(spark, sf_dir, "events")
    pv = (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .select(
            F.dayofmonth("ts").cast("int").alias("day"),
            F.col("value").alias("v"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("p"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("ng"),
        )
        .groupBy("day", "v")
        .agg(
            F.sum("p").cast("bigint").alias("pos_at"),
            F.sum("ng").cast("bigint").alias("neg_at"),
        )
    )
    w = (
        Window.partitionBy("day")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pv.select(
        "day",
        "pos_at",
        "neg_at",
        (F.sum("neg_at").over(w) - F.col("neg_at")).alias("neg_below"),
    )
    tot = pv.groupBy("day").agg(
        F.sum("pos_at").alias("n_pos"), F.sum("neg_at").alias("n_neg")
    )
    return (
        cum.join(F.broadcast(tot), "day")
        .groupBy("day")
        .agg(
            F.max("n_pos").alias("n_pos"),
            F.max("n_neg").alias("n_neg"),
            F.sum(
                2 * F.col("neg_below") * F.col("pos_at")
                + F.col("neg_at") * F.col("pos_at")
            ).alias("num2"),
        )
        .select(
            "day",
            "n_pos",
            "n_neg",
            F.round(
                F.col("num2").cast("double")
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                6,
            ).alias("auc"),
        )
    )


SQL_ROC_AUC = """
WITH pv AS (
  SELECT CAST(day(ts) AS INTEGER) AS day, value AS v,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos_at,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS neg_at
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY 1, 2
), cum AS (
  SELECT day, pos_at, neg_at,
         CAST(sum(neg_at) OVER (PARTITION BY day ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - neg_at
              AS BIGINT) AS neg_below
  FROM pv
), tot AS (
  SELECT day, CAST(sum(pos_at) AS BIGINT) AS n_pos,
         CAST(sum(neg_at) AS BIGINT) AS n_neg
  FROM pv GROUP BY day
)
SELECT c.day, max(n_pos) AS n_pos, max(n_neg) AS n_neg,
       round(CAST(sum(2 * neg_below * pos_at + neg_at * pos_at)
                  AS DOUBLE)
             / (2.0 * max(n_pos) * max(n_neg)), 6) AS auc
FROM cum c JOIN tot t ON c.day = t.day
GROUP BY c.day
"""


def q_psi_drift(spark, sf_dir):
    """Population Stability Index per event_type between the first and
    second half of the month over the fixed-width value bins of
    ``q_histogram`` — the binned companion to the KS monitor
    (``q_ks_drift``): PSI localizes WHERE the distribution moved.

    Per-bin term ``(p_act - p_exp) * ln(p_act/p_exp)`` is computed
    from integer counts (the ln argument is an exact integer ratio);
    bins empty on either side yield NULL terms (excluded from the
    total, the standard finite-PSI convention). The per-type total is
    a window sum over <= 20 bin rows. One hash agg over the raw
    events + a broadcast totals join — scale-right."""
    ev = _t(spark, sf_dir, "events")
    b = (
        ev.select(
            "event_type",
            F.least(
                F.floor(F.col("value") / F.lit(25.0)).cast("bigint"),
                F.lit(19),
            ).alias("bucket"),
            F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("e"),
            F.when(F.dayofmonth("ts") > 15, 1).otherwise(0).alias("a"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum("e").cast("bigint").alias("n_exp"),
            F.sum("a").cast("bigint").alias("n_act"),
        )
    )
    tot = b.groupBy("event_type").agg(
        F.sum("n_exp").alias("tot_exp"), F.sum("n_act").alias("tot_act")
    )
    term = F.when(
        (F.col("n_exp") > 0) & (F.col("n_act") > 0),
        (
            F.col("n_act") / F.col("tot_act").cast("double")
            - F.col("n_exp") / F.col("tot_exp").cast("double")
        )
        * F.log(
            (F.col("n_act") * F.col("tot_exp")).cast("double")
            / (F.col("n_exp") * F.col("tot_act")).cast("double")
        ),
    )
    wt = Window.partitionBy("event_type")
    return (
        b.join(F.broadcast(tot), "event_type")
        .select(
            "event_type", "bucket", "n_exp", "n_act", term.alias("t")
        )
        .select(
            "event_type",
            "bucket",
            "n_exp",
            "n_act",
            F.round("t", 6).alias("psi_term"),
            F.round(F.sum("t").over(wt), 6).alias("psi_total"),
        )
    )


SQL_PSI_DRIFT = """
WITH b AS (
  SELECT event_type,
         least(CAST(floor(value / 25.0) AS BIGINT), 19) AS bucket,
         CAST(sum(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_exp,
         CAST(sum(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_act
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, CAST(sum(n_exp) AS BIGINT) AS tot_exp,
         CAST(sum(n_act) AS BIGINT) AS tot_act
  FROM b GROUP BY 1
), terms AS (
  SELECT b.event_type, bucket, n_exp, n_act,
         CASE WHEN n_exp > 0 AND n_act > 0 THEN
           (n_act / CAST(tot_act AS DOUBLE)
            - n_exp / CAST(tot_exp AS DOUBLE))
           * ln(CAST(n_act * tot_exp AS DOUBLE)
                / CAST(n_exp * tot_act AS DOUBLE))
         ELSE NULL END AS t
  FROM b JOIN t ON b.event_type = t.event_type
)
SELECT event_type, bucket, n_exp, n_act,
       round(t, 6) AS psi_term,
       round(sum(t) OVER (PARTITION BY event_type), 6) AS psi_total
FROM terms
"""


def q_ess_weights(spark, sf_dir):
    """Importance-weight diagnostics per event_type with ``value`` as
    the sample weight: Kish effective sample size
    ``(sum w)^2 / sum w^2`` and its ratio to the raw count — the
    sanity check run after any reweighting (domain mixture, inverse
    propensity) to catch a few heavy weights silently dominating the
    corpus. One map-side-combinable hash agg; nothing else."""
    ev = _t(spark, sf_dir, "events")
    sw = F.sum("value")
    sw2 = F.sum(F.col("value") * F.col("value"))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(sw, 4).alias("sum_w"),
        F.round((sw * sw) / sw2, 4).alias("ess"),
        F.round((sw * sw) / sw2 / F.count(F.lit(1)), 6).alias(
            "ess_ratio"
        ),
    )


SQL_ESS_WEIGHTS = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS sum_w,
       round(sum(value) * sum(value) / sum(value * value), 4) AS ess,
       round(sum(value) * sum(value) / sum(value * value)
             / count(*), 6) AS ess_ratio
FROM events GROUP BY event_type
"""


def q_equal_freq_bins(spark, sf_dir):
    """Deterministic equal-frequency decile binning of ``value`` per
    event_type — the feature-discretization operator (quantile
    binning) built WITHOUT ntile: ntile breaks ties arbitrarily, so
    two engines (or two runs) can bin tied rows differently. Here
    every distinct value gets ``bin = ceil(10 * cum_count / total)``
    from the cumulative count over distinct values, so ties land in
    one bin and the assignment is engine-exact INTEGER arithmetic
    (``(10*cum + tot - 1) div tot``).

    Scale shape: raw rows collapse to a per-(type, value) count
    first; the ordered window runs over distinct values per type
    (bounded by the value domain), never over raw rows."""
    ev = _t(spark, sf_dir, "events")
    pv = (
        ev.groupBy("event_type", F.col("value").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pv.select(
        "event_type", "v", "c", F.sum("c").over(w).alias("cumc")
    )
    tot = pv.groupBy("event_type").agg(F.sum("c").alias("tot"))
    return (
        cum.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "v",
            "c",
            F.expr("CAST((10 * cumc + tot - 1) DIV tot AS INT)").alias(
                "bin"
            ),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.round(F.min("v"), 4).alias("lo"),
            F.round(F.max("v"), 4).alias("hi"),
        )
    )


SQL_EQUAL_FREQ_BINS = """
WITH pv AS (
  SELECT event_type, value AS v, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, v, c,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cumc
  FROM pv
), tot AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS tot
  FROM pv GROUP BY 1
)
SELECT c.event_type,
       CAST((10 * cumc + tot - 1) // tot AS INTEGER) AS bin,
       CAST(sum(c.c) AS BIGINT) AS n,
       round(min(v), 4) AS lo, round(max(v), 4) AS hi
FROM cum c JOIN tot t ON c.event_type = t.event_type
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Feature-eng pack #21: corpus-association + sampling — mutual
# information, sequential Poisson weighted sample, power-iteration
# top principal direction, group-k-fold assignment
# --------------------------------------------------------------------------


def q_mutual_info(spark, sf_dir):
    """Mutual information between ``lang`` and ``source`` over the
    documents table — the categorical-association audit that catches
    a corpus whose language mix is secretly a proxy for one source
    (a leakage/confound screen before per-lang models are trained).

    Per-cell PMI ``ln(n_ls * N / (n_l * n_s))`` takes ln of an exact
    integer ratio; the MI total is a window sum over the tiny
    lang x source cell table. One hash agg over raw docs + two
    broadcast marginal joins — scale-right."""
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ml = cells.groupBy("lang").agg(F.sum("n").alias("n_l"))
    ms = cells.groupBy("source").agg(F.sum("n").alias("n_s"))
    tot = cells.agg(F.sum("n").alias("n_all"))
    pmi = F.log(
        (F.col("n") * F.col("n_all")).cast("double")
        / (F.col("n_l") * F.col("n_s")).cast("double")
    )
    wt = Window.partitionBy()
    return (
        cells.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n",
            F.round(pmi, 6).alias("pmi"),
            (F.col("n") / F.col("n_all").cast("double") * pmi).alias(
                "_t"
            ),
        )
        .select(
            "lang",
            "source",
            "n",
            "pmi",
            F.round("_t", 6).alias("mi_term"),
            F.round(F.sum("_t").over(wt), 6).alias("mi_total"),
        )
    )


SQL_MUTUAL_INFO = """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
), ml AS (
  SELECT lang, CAST(sum(n) AS BIGINT) AS n_l FROM cells GROUP BY 1
), ms AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_s FROM cells GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_all FROM cells
), terms AS (
  SELECT c.lang, c.source, c.n,
         ln(CAST(c.n * n_all AS DOUBLE)
            / CAST(n_l * n_s AS DOUBLE)) AS pmi,
         c.n / CAST(n_all AS DOUBLE)
           * ln(CAST(c.n * n_all AS DOUBLE)
                / CAST(n_l * n_s AS DOUBLE)) AS t
  FROM cells c JOIN ml USING (lang) JOIN ms USING (source)
       CROSS JOIN tot
)
SELECT lang, source, n, round(pmi, 6) AS pmi,
       round(t, 6) AS mi_term,
       round(sum(t) OVER (), 6) AS mi_total
FROM terms
"""


_WSAMPLE_K = 5  # PPS sample size per group


def q_pps_sample(spark, sf_dir):
    """Deterministic weight-proportional sampling without replacement
    (k=5 per event_type, weight = ``value``) by sequential Poisson
    sampling (Ohlsson '98): priority = u / w with a content-hash
    uniform ``u = (md5_32(event_id) + 1) / 2^32``, keep the k smallest
    priorities per group. Unlike Efraimidis-Spirakis' ``u^(1/w)`` key
    this priority needs NO transcendental (one IEEE divide of a dyadic
    rational by the weight), so the selection is bit-identical across
    engines, runs, and cluster sizes — rand()-free PPS sampling fit
    for a 100 TB reshuffle-proof pipeline. Top-k per group prunes
    map-side before the single shuffle (rank window per group)."""
    ev = _t(spark, sf_dir, "events")
    u = (
        F.conv(
            F.substring(
                F.md5(F.encode(F.col("event_id").cast("string"), "utf-8")),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(4294967296.0)
    keyed = ev.where(F.col("value") > 0).select(
        "event_type",
        "event_id",
        F.round("value", 4).alias("value"),
        (u / F.col("value")).alias("prio"),
    )
    w = Window.partitionBy("event_type").orderBy("prio", "event_id")
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _WSAMPLE_K)
        .select(
            "event_type",
            F.col("rank").cast("int").alias("rank"),
            "event_id",
            "value",
            F.round("prio", 8).alias("prio"),
        )
    )


SQL_PPS_SAMPLE = """
WITH keyed AS (
  SELECT event_type, event_id, round(value, 4) AS value,
         ((CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                AS UBIGINT) AS BIGINT) + 1) / 4294967296.0)
           / value AS prio
  FROM events WHERE value > 0
), ranked AS (
  SELECT event_type, event_id, value, prio,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY prio, event_id) AS rank
  FROM keyed
)
SELECT event_type, CAST(rank AS INTEGER) AS rank, event_id, value,
       round(prio, 8) AS prio
FROM ranked WHERE rank <= 5
"""


_PCA_ROUNDS = 3  # unnormalized power-iteration rounds


def q_embedding_pca1(spark, sf_dir):
    """Fixed-round power iteration toward the top principal direction
    of the embedding table: the 3-round unnormalized iterate
    v3 = (X^T X)^2 (X^T 1) on the Gram matrix (convergence to the
    dominant singular vector depends on the eigengap — more rounds =
    more CTE pairs; the ITERATE, bit-reproducible across engines, is
    the contract). Each round is two long-form hash aggs (vec-dot
    then dim-sum); nothing ever leaves the cluster. Normalization/sign are deferred to the very
    end: the output divides v3 by its largest-|component| entry
    (deterministic argmax, ties by lowest idx), one exact IEEE divide
    per dim — so no intermediate sqrt/normalize whose rounding could
    drift between rounds. The same fixed-round recipe as the k-means++
    seeder (``q_kmeanspp_seeds``); the SQL twin chains one CTE pair
    per round."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id",
        F.posexplode("embedding").alias("idx", "val"),
    ).select(
        "vec_id", "idx", F.col("val").cast("double").alias("val")
    )
    # v0 = all-ones: s_i = sum_j x_ij
    v = dims.groupBy("idx").agg(F.sum("val").alias("v"))  # after rnd 1
    for _ in range(_PCA_ROUNDS - 1):
        s = (
            dims.join(F.broadcast(v), "idx")
            .groupBy("vec_id")
            .agg(F.sum(F.col("val") * F.col("v")).alias("s"))
        )
        v = (
            dims.join(s, "vec_id")
            .groupBy("idx")
            .agg(F.sum(F.col("val") * F.col("s")).alias("v"))
        )
    pivot = v.orderBy(F.abs(F.col("v")).desc(), F.col("idx").asc()).limit(1)
    return (
        v.crossJoin(
            F.broadcast(pivot.select(F.col("v").alias("pivot")))
        )
        .select(
            F.col("idx").cast("int").alias("idx"),
            F.round(F.col("v") / F.col("pivot"), 6).alias("component"),
        )
    )


SQL_EMBEDDING_PCA1 = """
WITH dims AS (
  SELECT vec_id, i.idx - 1 AS idx,
         CAST(embedding[i.idx] AS DOUBLE) AS val
  FROM embeddings, range(1, 65) i(idx)
), v1 AS (
  SELECT idx, sum(val) AS v FROM dims GROUP BY idx
), s2 AS (
  SELECT vec_id, sum(val * v) AS s
  FROM dims JOIN v1 USING (idx) GROUP BY vec_id
), v2 AS (
  SELECT idx, sum(val * s) AS v
  FROM dims JOIN s2 USING (vec_id) GROUP BY idx
), s3 AS (
  SELECT vec_id, sum(val * v) AS s
  FROM dims JOIN v2 USING (idx) GROUP BY vec_id
), v3 AS (
  SELECT idx, sum(val * s) AS v
  FROM dims JOIN s3 USING (vec_id) GROUP BY idx
), piv AS (
  SELECT v AS pv FROM v3 ORDER BY abs(v) DESC, idx ASC LIMIT 1
)
SELECT CAST(idx AS INTEGER) AS idx,
       round(v / pv, 6) AS component
FROM v3 CROSS JOIN piv
"""


def q_group_kfold(spark, sf_dir):
    """Group-k-fold assignment: every ``source`` lands wholly in one
    of 5 folds (``md5_16(source) mod 5``), so same-source documents
    can never straddle a train/eval boundary — the group-leakage twin
    of the temporal holdout (``q_temporal_split``). Reports per
    (fold, lang) doc counts, distinct sources, and the fold's share of
    the corpus; content-hashed assignment is reproducible across
    engines, runs, and cluster sizes. Narrow projection + one hash
    agg + one broadcast total."""
    d = _t(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.encode("source", "utf-8")), 1, 4), 16, 10)
        .cast("bigint")
        % 5
    ).cast("int")
    per = (
        d.select("lang", "source", fold.alias("fold"))
        .groupBy("fold", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
    )
    tot = per.agg(F.sum("n_docs").alias("n_all"))
    return per.crossJoin(F.broadcast(tot)).select(
        "fold",
        "lang",
        "n_docs",
        "n_sources",
        F.round(F.col("n_docs") / F.col("n_all").cast("double"), 6).alias(
            "share"
        ),
    )


SQL_GROUP_KFOLD = """
WITH assigned AS (
  SELECT lang, source,
         CAST(CAST(CAST('0x' || substr(md5(source), 1, 4) AS UBIGINT)
              AS BIGINT) % 5 AS INTEGER) AS fold
  FROM documents
), per AS (
  SELECT fold, lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM assigned GROUP BY 1, 2
), tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS n_all FROM per
)
SELECT fold, lang, n_docs, n_sources,
       round(n_docs / CAST(n_all AS DOUBLE), 6) AS share
FROM per CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# Feature-eng pack #22: SQL-surface recursion/lateral + JVM simhash
# pairs, exact-moment grouped OLS, Gini concentration, PR-AUC
# --------------------------------------------------------------------------


_BFS_DEPTH = 4  # bounded-depth reachability rounds


def q_sql_recursive(spark, sf_dir):
    """Bounded-depth BFS reachability over the shared deterministic doc
    graph, declared as a Spark 4 ``WITH RECURSIVE`` CTE (the SQL
    recursion surface; DuckDB runs the identical statement). Seeds are
    ``doc_id % 97 = 0``; output is each reachable node's minimum hop
    count within 4 rounds.

    Scale note: the recursive CTE is the declarative twin of the
    engine's iterated-join loops (``q_label_prop``/``q_dedup_clusters``
    do the same frontier expansion with an explicit per-round
    localCheckpoint, which is the shape to prefer when rounds need
    skew salting or per-round dedup); here each recursion step is one
    equi join of the frontier against the 2-out-regular edge list, so
    rows grow 2x per round and depth is hard-bounded — never an
    unbounded transitive closure over a fat web graph."""
    d = _t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents_rec_v")
    return spark.sql(
        """
        WITH RECURSIVE walk(node, depth) AS (
          SELECT doc_id, 0 FROM documents_rec_v WHERE doc_id % 97 = 0
          UNION ALL
          SELECT e.dst, w.depth + 1
          FROM walk w JOIN (
            SELECT doc_id AS src, (doc_id * 7 + 3) % cnt AS dst
            FROM documents_rec_v
            CROSS JOIN (SELECT count(*) AS cnt FROM documents_rec_v)
            UNION ALL
            SELECT doc_id, (doc_id * 13 + 5) % cnt
            FROM documents_rec_v
            CROSS JOIN (SELECT count(*) AS cnt FROM documents_rec_v)
          ) e ON e.src = w.node
          WHERE w.depth < 4
        )
        SELECT CAST(node AS BIGINT) AS node,
               CAST(min(depth) AS INT) AS hops
        FROM walk GROUP BY node
        """
    )


SQL_SQL_RECURSIVE = """
WITH RECURSIVE walk(node, depth) AS (
  SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
  UNION ALL
  SELECT e.dst, w.depth + 1
  FROM walk w JOIN (
    SELECT doc_id AS src, (doc_id * 7 + 3) % cnt AS dst
    FROM documents CROSS JOIN (SELECT count(*) AS cnt FROM documents)
    UNION ALL
    SELECT doc_id, (doc_id * 13 + 5) % cnt
    FROM documents CROSS JOIN (SELECT count(*) AS cnt FROM documents)
  ) e ON e.src = w.node
  WHERE w.depth < 4
)
SELECT CAST(node AS BIGINT) AS node, CAST(min(depth) AS INTEGER) AS hops
FROM walk GROUP BY node
"""


def q_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery join (Spark 3.4+/4 SQL surface;
    DuckDB runs the identical statement): for every source, the
    LATERAL derived table re-evaluates an ORDER BY ... LIMIT 3 against
    that source's documents — the per-group top-k declared relationally
    instead of via a rank window.

    Catalyst decorrelates the lateral into a join + per-group limit
    (same physical family as ``q_topk_per_group``'s window), which is
    why the declarative form is scale-safe: there is no per-outer-row
    re-execution at runtime."""
    d = _t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents_lat_v")
    return spark.sql(
        """
        SELECT s.source, t.doc_id, t.n_chars
        FROM (SELECT DISTINCT source FROM documents_lat_v) s,
        LATERAL (
          SELECT d.doc_id, d.n_chars FROM documents_lat_v d
          WHERE d.source = s.source
          ORDER BY d.n_chars DESC, d.doc_id LIMIT 3
        ) t
        """
    )


SQL_LATERAL_TOPK = """
SELECT s.source, t.doc_id, t.n_chars
FROM (SELECT DISTINCT source FROM documents) s,
LATERAL (
  SELECT d.doc_id, d.n_chars FROM documents d
  WHERE d.source = s.source
  ORDER BY d.n_chars DESC, d.doc_id LIMIT 3
) t
"""


_SIMHASH_BITS = 64  # fingerprint width (two engine-portable 32-bit halves)
_SIMHASH_HAM = 3  # near-dup hamming radius


def q_simhash_pairs(spark, sf_dir):
    """JVM-side simhash near-duplicate PAIR detection — the
    oracle-backed upgrade of the Python-kernel ``q_simhash``
    fingerprint (which stays as the mapInPandas surface demo): 64-bit
    frequency-weighted bit-voting simhash (Manku et al. 2007's web
    width) computed entirely with whole-stage-codegen built-ins (md5
    token hash -> per-(doc, bit) vote agg -> fingerprint reassembly by
    shifted sums), then 4 bands of 16 bits bucket the candidate
    self-join and ``bit_count(a ^ b)`` keeps pairs within hamming
    distance 3 (pigeonhole: <=3 flipped bits across 4 bands leaves at
    least one band exact, so banding loses no true pair).

    The fingerprint is carried as TWO 32-bit halves (fp_hi, fp_lo):
    a single 64-bit value built from hex would overflow signed BIGINT
    under ANSI mode, and two conv(substr(md5)) halves are bit-exact in
    both engines.

    Scale shape: tokens are compacted to (doc, token_hash, weight)
    BEFORE the 64x bit fan-out, both votes and fingerprints are
    map-side-combinable hash aggs, and the pair join is banded LSH —
    shuffle keys are (band, band_value) buckets, never all-pairs.
    16-bit bands (65,536 buckets per band) keep expected candidates
    ~linear in corpus size where the r4 8-bit-band variant went
    quadratic past ~10^4 docs (measured e=1.39 at the r5 10x tier —
    256 buckets saturate, so bucket occupancy and hence candidates
    grew with n^2; this is the LSH knob you widen with the corpus,
    exactly as you widen MinHash band count). Ties (vote sum 0)
    resolve to bit 0 in both engines."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("token"),
    )
    hashed = (
        toks.select(
            "doc_id",
            F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10)
            .cast("bigint")
            .alias("h_hi"),
            F.conv(F.substring(F.md5(F.col("token")), 9, 8), 16, 10)
            .cast("bigint")
            .alias("h_lo"),
        )
        .groupBy("doc_id", "h_hi", "h_lo")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    votes = (
        hashed.select(
            "doc_id",
            "h_hi",
            "h_lo",
            "w",
            F.explode(
                F.sequence(F.lit(0), F.lit(_SIMHASH_BITS - 1))
            ).alias("b"),
        )
        .select(
            "doc_id",
            "b",
            (
                F.col("w")
                * (
                    2
                    * F.expr(
                        "CASE WHEN b < 32 THEN shiftright(h_lo, b) & 1 "
                        "ELSE shiftright(h_hi, b - 32) & 1 END"
                    )
                    - 1
                )
            ).alias("vote"),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
    )
    fp = votes.groupBy("doc_id").agg(
        F.sum(
            F.when(
                (F.col("v") > 0) & (F.col("b") < 32),
                F.expr("shiftleft(1L, b)"),
            ).otherwise(F.lit(0))
        ).alias("fp_lo"),
        F.sum(
            F.when(
                (F.col("v") > 0) & (F.col("b") >= 32),
                F.expr("shiftleft(1L, b - 32)"),
            ).otherwise(F.lit(0))
        ).alias("fp_hi"),
    )
    banded = fp.select(
        "doc_id",
        "fp_lo",
        "fp_hi",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).select(
        "doc_id",
        "fp_lo",
        "fp_hi",
        "band",
        F.expr(
            "CASE WHEN band < 2 THEN shiftright(fp_lo, 16 * band) & 65535 "
            "ELSE shiftright(fp_hi, 16 * (band - 2)) & 65535 END"
        ).alias("band_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (
                F.bit_count(
                    F.col("a.fp_lo").bitwiseXOR(F.col("b.fp_lo"))
                )
                + F.bit_count(
                    F.col("a.fp_hi").bitwiseXOR(F.col("b.fp_hi"))
                )
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= _SIMHASH_HAM)
        .distinct()
    )
    return pairs


SQL_SIMHASH_PAIRS = """
WITH hashed AS (
  SELECT doc_id,
         CAST(CAST('0x' || substr(md5(token), 1, 8) AS UBIGINT)
              AS BIGINT) AS h_hi,
         CAST(CAST('0x' || substr(md5(token), 9, 8) AS UBIGINT)
              AS BIGINT) AS h_lo,
         CAST(count(*) AS BIGINT) AS w
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
    FROM documents
  )
  GROUP BY 1, 2, 3
), votes AS (
  SELECT doc_id, b.b,
         CAST(sum(w * (2 * (CASE WHEN b.b < 32 THEN (h_lo >> b.b)
                                 ELSE (h_hi >> (b.b - 32)) END & 1)
                        - 1)) AS BIGINT) AS v
  FROM hashed, range(0, 64) b(b)
  GROUP BY 1, 2
), fp AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 AND b < 32
                       THEN (1::BIGINT << b) ELSE 0 END)
              AS BIGINT) AS fp_lo,
         CAST(sum(CASE WHEN v > 0 AND b >= 32
                       THEN (1::BIGINT << (b - 32)) ELSE 0 END)
              AS BIGINT) AS fp_hi
  FROM votes GROUP BY 1
), banded AS (
  SELECT doc_id, fp_lo, fp_hi, band.band,
         CASE WHEN band.band < 2
              THEN (fp_lo >> (16 * band.band)) & 65535
              ELSE (fp_hi >> (16 * (band.band - 2))) & 65535
         END AS band_val
  FROM fp, range(0, 4) band(band)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.fp_lo, b.fp_lo))
            + bit_count(xor(a.fp_hi, b.fp_hi)) AS INTEGER) AS hamming
FROM banded a JOIN banded b
  ON a.band = b.band AND a.band_val = b.band_val
 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp_lo, b.fp_lo))
      + bit_count(xor(a.fp_hi, b.fp_hi)) <= 3
"""


def q_grouped_ols(spark, sf_dir):
    """Per-group closed-form OLS regression (value on day-of-month per
    event_type) from EXACT integer moments — the distributed
    normal-equations recipe: one map-side-combinable hash agg collapses
    the raw stream to six sums per group (n, Sx, Sy, Sxx, Sxy, Syy
    with y pre-scaled to integer ten-thousandths), and slope /
    intercept / R^2 are computed by cross-multiplied DECIMAL(38,0)
    arithmetic with exactly one double division each at the very end —
    so the fit is bit-identical regardless of partitioning, cluster
    size, or engine (a naive avg-based formula would accumulate
    association-order-dependent float error)."""
    ev = _t(spark, sf_dir, "events")
    m = (
        ev.select(
            "event_type",
            F.dayofmonth("ts").cast("bigint").alias("x"),
            F.round(F.col("value") * 10000)
            .cast("bigint")
            .alias("y"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (dec("n") * dec("sxy") - dec("sx") * dec("sy")).alias("num")
    den = (dec("n") * dec("sxx") - dec("sx") * dec("sx")).alias("den")
    syy_c = (dec("n") * dec("syy") - dec("sy") * dec("sy")).alias("syy_c")
    t = m.select("event_type", "n", "sx", "sy", num, den, syy_c)
    return t.select(
        "event_type",
        "n",
        F.round(
            F.col("num").cast("double")
            / (F.col("den").cast("double") * 10000.0),
            6,
        ).alias("slope"),
        F.round(
            (
                F.col("sy").cast("decimal(38,0)") * F.col("den")
                - F.col("num") * F.col("sx").cast("decimal(38,0)")
            ).cast("double")
            / (
                F.col("n").cast("double")
                * F.col("den").cast("double")
                * 10000.0
            ),
            6,
        ).alias("intercept"),
        F.round(
            (F.col("num") * F.col("num")).cast("double")
            / (F.col("den") * F.col("syy_c")).cast("double"),
            6,
        ).alias("r2"),
    )


SQL_GROUPED_OLS = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM (
    SELECT event_type, CAST(day(ts) AS BIGINT) AS x,
           CAST(round(value * 10000) AS BIGINT) AS y
    FROM events
  )
  GROUP BY 1
), t AS (
  SELECT event_type, n, sx, sy,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS syy_c
  FROM m
)
SELECT event_type, n,
       round(CAST(num AS DOUBLE) / (CAST(den AS DOUBLE) * 10000.0),
             6) AS slope,
       round(CAST(CAST(sy AS HUGEINT) * den - num * sx AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(den AS DOUBLE) * 10000.0),
             6) AS intercept,
       round(CAST(num * num AS DOUBLE) / CAST(den * syy_c AS DOUBLE),
             6) AS r2
FROM t
"""


def q_gini_skew(spark, sf_dir):
    """Gini concentration coefficient of the per-user event-count
    distribution, per event_type — the single-number skew diagnostic
    that quantifies what ``q_skew_report`` itemizes (Gini near 0 =
    uniform keys, near 1 = one hot key owns the traffic; it feeds the
    decision to salt).

    Scale shape: raw events collapse to a compacted (type, user, n)
    count table first (map-side combine), the rank window runs over
    compacted counts only, and the Gini numerator ``2*sum(i*n_i) -
    (N+1)*sum(n)`` stays INTEGER until one final double division —
    engine- and partitioning-exact."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("c", "user_id")
    ranked = counts.withColumn(
        "i", F.row_number().over(w).cast("bigint")
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("c").alias("total_events"),
            F.sum(F.col("i") * F.col("c")).alias("t"),
        )
        .select(
            "event_type",
            "n_users",
            "total_events",
            F.round(
                (
                    2 * F.col("t")
                    - (F.col("n_users") + 1) * F.col("total_events")
                ).cast("double")
                / (F.col("n_users") * F.col("total_events")).cast(
                    "double"
                ),
                6,
            ).alias("gini"),
        )
    )


SQL_GINI_SKEW = """
WITH counts AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT event_type, c,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY c, user_id) AS BIGINT) AS i
  FROM counts
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(c) AS BIGINT) AS total_events,
       round(CAST(2 * sum(i * c) - (count(*) + 1) * sum(c) AS DOUBLE)
             / CAST(count(*) * sum(c) AS DOUBLE), 6) AS gini
FROM ranked GROUP BY 1
"""


def q_pr_auc(spark, sf_dir):
    """Per-day average precision (PR-AUC) of ``value`` separating
    purchase (positive) from click (negative) events — the companion
    rank statistic to ``q_roc_auc`` for imbalanced labels, where ROC
    flatters weak rankers.

    Same distributed recipe: the stream collapses to a per-(day,
    value) pos/neg histogram, the ordered window runs over DISTINCT
    values (descending — ties form ONE group evaluated at the group's
    closing rank, a fixed deterministic tie convention), and each
    group's precision term is fixed-pointed to an integer billionth
    (`floor(pos*cum_pos*1e9/cum_n + 0.5)` — exact integer inputs, one
    correctly-rounded IEEE divide) so the cross-group sum is
    association-order-independent; one double division per day at the
    end."""
    ev = _t(spark, sf_dir, "events")
    pv = (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .select(
            F.dayofmonth("ts").cast("int").alias("day"),
            F.col("value").alias("v"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("p"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("ng"),
        )
        .groupBy("day", "v")
        .agg(
            F.sum("p").cast("bigint").alias("pos_at"),
            F.sum("ng").cast("bigint").alias("neg_at"),
        )
    )
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pv.select(
        "day",
        "pos_at",
        (F.sum("pos_at").over(w)).alias("cum_pos"),
        (F.sum(F.col("pos_at") + F.col("neg_at")).over(w)).alias("cum_n"),
    )
    terms = cum.select(
        "day",
        "pos_at",
        F.floor(
            (F.col("pos_at") * F.col("cum_pos")).cast("double")
            * 1000000000.0
            / F.col("cum_n").cast("double")
            + 0.5
        )
        .cast("bigint")
        .alias("term"),
    )
    tot = pv.groupBy("day").agg(
        F.sum("pos_at").alias("n_pos"), F.sum("neg_at").alias("n_neg")
    )
    return (
        terms.groupBy("day")
        .agg(F.sum("term").alias("t"))
        .join(F.broadcast(tot), "day")
        .select(
            "day",
            "n_pos",
            "n_neg",
            F.round(
                F.col("t").cast("double")
                / (1000000000.0 * F.col("n_pos").cast("double")),
                6,
            ).alias("avg_precision"),
        )
    )


SQL_PR_AUC = """
WITH pv AS (
  SELECT CAST(day(ts) AS INTEGER) AS day, value AS v,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos_at,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS neg_at
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY 1, 2
), cum AS (
  SELECT day, pos_at,
         CAST(sum(pos_at) OVER (PARTITION BY day ORDER BY v DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cum_pos,
         CAST(sum(pos_at + neg_at)
              OVER (PARTITION BY day ORDER BY v DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS cum_n
  FROM pv
), terms AS (
  SELECT day,
         CAST(floor(CAST(pos_at * cum_pos AS DOUBLE) * 1000000000.0
                    / CAST(cum_n AS DOUBLE) + 0.5) AS BIGINT) AS term
  FROM cum
), tot AS (
  SELECT day, CAST(sum(pos_at) AS BIGINT) AS n_pos,
         CAST(sum(neg_at) AS BIGINT) AS n_neg
  FROM pv GROUP BY day
)
SELECT t.day, tot.n_pos, tot.n_neg,
       round(CAST(sum(term) AS DOUBLE)
             / (1000000000.0 * CAST(tot.n_pos AS DOUBLE)), 6)
         AS avg_precision
FROM terms t JOIN tot ON t.day = tot.day
GROUP BY t.day, tot.n_pos, tot.n_neg
"""


# --------------------------------------------------------------------------
# Feature-eng pack #23: inverted-index sparse top-k, signed-random-
# projection signatures, manual HLL registers, Spearman rank
# correlation, integer CUSUM changepoint, KS best-threshold
# --------------------------------------------------------------------------

_SPARSE_Q = 1000  # fixed-point grid for embedding values (exact: 24+10 bits)
_SPARSE_MIN = 200  # keep |q| >= 200, i.e. |v| >= 0.2 (~11% density here)
_SPARSE_POST_CAP = 128  # impact-ordered posting-list truncation per dim
_SPARSE_TOPK = 3


def q_sparse_topk(spark, sf_dir):
    """Sparse top-k similarity by INVERTED-INDEX join — the scale path
    for sparse/thresholded vectors that ``knn_cosine`` (brute) and
    ``ann_lsh`` (dense signatures) don't cover: explode each vector to
    its significant (dim, weight) postings, equi-join on dim, and sum
    weight products per pair, so cost is sum-of-squared-posting-lists
    instead of N^2.

    Two scale controls, both deterministic: values are fixed-pointed
    to an integer grid (``round(v*1000)`` — a float's 24-bit mantissa
    times 2^3*5^3 stays exact in a double, and the grid can never land
    on an exact .5, so HALF_UP-vs-half-even engines agree) making
    every dot product an exact BIGINT; and posting lists are
    IMPACT-ORDERED-TRUNCATED to the top-|q| 128 entries per dim
    (ties by vec_id) — the classic IR trick that bounds the self-join
    quadratic term per dimension no matter how hot a dimension gets.
    One narrow shuffle on dim, one pair agg, one per-vec top-k window."""
    e = _t(spark, sf_dir, "embeddings")
    pe = e.select("vec_id", F.posexplode("embedding").alias("d", "v"))
    q = pe.select(
        "vec_id",
        "d",
        F.round(F.col("v").cast("double") * _SPARSE_Q, 0)
        .cast("bigint")
        .alias("q"),
    ).where(F.abs(F.col("q")) >= _SPARSE_MIN)
    wd = Window.partitionBy("d").orderBy(
        F.abs(F.col("q")).desc(), F.col("vec_id")
    )
    post = (
        q.withColumn("r", F.row_number().over(wd))
        .where(F.col("r") <= _SPARSE_POST_CAP)
        .drop("r")
    )
    pairs = (
        post.alias("a")
        .join(
            post.alias("b"),
            (F.col("a.d") == F.col("b.d"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("nbr_id"),
        )
        .agg(
            F.sum(F.col("a.q") * F.col("b.q")).alias("dot_q"),
            F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        )
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.col("dot_q").desc(), F.col("nbr_id")
    )
    return (
        pairs.where(F.col("dot_q") > 0)
        .withColumn("rk", F.row_number().over(wv).cast("int"))
        .where(F.col("rk") <= _SPARSE_TOPK)
    )


SQL_SPARSE_TOPK = """
WITH pe AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
  FROM embeddings
), kept AS (
  SELECT * FROM pe WHERE abs(q) >= 200
), post AS (
  SELECT vec_id, d, q FROM (
    SELECT *, row_number() OVER (PARTITION BY d
                                 ORDER BY abs(q) DESC, vec_id) AS r
    FROM kept) t
  WHERE r <= 128
), pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         CAST(sum(a.q * b.q) AS BIGINT) AS dot_q,
         CAST(count(*) AS BIGINT) AS n_dims
  FROM post a JOIN post b ON a.d = b.d AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
)
SELECT vec_id, nbr_id, dot_q, n_dims, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY dot_q DESC, nbr_id) AS rk
  FROM pairs WHERE dot_q > 0) t
WHERE rk <= 3
"""


_SRP_BITS = 16  # signature width
_SRP_Q = 1000000  # fixed-point grid (24+20 bits — exact in a double)


def q_srp_signature(spark, sf_dir):
    """Signed-random-projection (SimHash-for-vectors) signatures: bit
    j of a vector's signature is the sign of its dot product with a
    pseudorandom +/-1 hyperplane — the JVM-declarative, oracle-backed
    twin of the numpy sign-bit bucketing inside ``ann_lsh``.

    Engine-portable by construction: the hyperplane sign for (dim, j)
    is the parity of an md5 nibble (content-addressed — identical on
    any engine, run, or cluster size), values are fixed-pointed to
    integers so each projection sum is an exact BIGINT (association-
    order-independent — safe under any partitioning), and the
    signature packs bits as sum(bit * 2^j). Emits each vector's
    signature, its popcount, and the signature's bucket occupancy
    (the LSH collision-rate diagnostic). Linear work, one narrow agg."""
    e = _t(spark, sf_dir, "embeddings")
    pe = e.select("vec_id", F.posexplode("embedding").alias("d", "v"))
    q = pe.select(
        "vec_id",
        "d",
        F.round(F.col("v").cast("double") * _SRP_Q, 0)
        .cast("bigint")
        .alias("q"),
    )
    j = q.select(
        "vec_id",
        "d",
        "q",
        F.explode(F.sequence(F.lit(0), F.lit(_SRP_BITS - 1))).alias("j"),
    )
    sign = (
        F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat_ws(
                            ":",
                            F.col("d").cast("string"),
                            F.col("j").cast("string"),
                        ),
                        "utf-8",
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    ) * 2 - 1
    proj = (
        j.select("vec_id", "j", (sign * F.col("q")).alias("t"))
        .groupBy("vec_id", "j")
        .agg(F.sum("t").alias("s"))
    )
    bits = proj.select(
        "vec_id",
        F.when(
            F.col("s") > 0,
            F.expr("CAST(power(2, j) AS BIGINT)"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("bit_val"),
        F.when(F.col("s") > 0, 1).otherwise(0).cast("bigint").alias("one"),
    )
    sigs = bits.groupBy("vec_id").agg(
        F.sum("bit_val").alias("sig"), F.sum("one").alias("n_bits")
    )
    occ = sigs.groupBy("sig").agg(
        F.count(F.lit(1)).cast("bigint").alias("bucket_n")
    )
    return sigs.join(occ, "sig").select("vec_id", "sig", "n_bits", "bucket_n")


SQL_SRP_SIGNATURE = """
WITH pe AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS q
  FROM embeddings
), j AS (
  SELECT vec_id, d, q, r.j
  FROM pe CROSS JOIN (SELECT unnest(range(16)) AS j) r
), proj AS (
  SELECT vec_id, j,
         CAST(sum(((CAST(CAST('0x' || substr(
                 md5(CAST(d AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 4)
               AS UBIGINT) AS BIGINT) % 2) * 2 - 1) * q) AS BIGINT) AS s
  FROM j GROUP BY 1, 2
), sigs AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN s > 0
                       THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS sig,
         CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bits
  FROM proj GROUP BY 1
), occ AS (
  SELECT sig, CAST(count(*) AS BIGINT) AS bucket_n FROM sigs GROUP BY 1
)
SELECT s.vec_id, s.sig, s.n_bits, o.bucket_n
FROM sigs s JOIN occ o ON s.sig = o.sig
"""


_HLL_M = 16  # registers (bucket = low 4 hash bits)
_HLL_W = 56  # rank-observable width (60-bit md5 prefix minus 4)


def q_hll_distinct(spark, sf_dir):
    """Manual HyperLogLog distinct-user estimate per event_type, built
    from first principles so the MERGEABLE-SKETCH mechanics (the thing
    that makes distinct counts map-side-combinable at 10^12 rows) are
    visible and oracle-checkable — unlike ``agg_approx_distinct``
    which delegates to Spark's built-in HLL++.

    A 60-bit md5 prefix splits into a 4-bit register index and a
    56-bit observable whose geometric rank is trailing-zeros+1,
    computed EXACTLY with integer ops (``bit_count((x & -x) - 1)``) —
    no float log2 at the edge. Register state is max(rank): any
    partitioning/merge order gives the same registers. The harmonic
    denominator is kept as an exact integer sum(2^(57-r)) (max 16 *
    2^56 < 2^63) so the one double division happens once at the end;
    the exact countDistinct rides along as the audit column."""
    ev = _t(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(F.encode(F.col("user_id").cast("string"), "utf-8")), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    based = ev.select("event_type", "user_id", h.alias("h")).select(
        "event_type",
        "user_id",
        (F.col("h") % _HLL_M).cast("int").alias("bucket"),
        F.shiftright(F.col("h"), 4).alias("rest"),
    )
    ranked = based.select(
        "event_type",
        "user_id",
        "bucket",
        F.when(F.col("rest") == 0, F.lit(_HLL_W + 1))
        .otherwise(F.bit_count(F.expr("(rest & -rest) - 1")) + 1)
        .cast("int")
        .alias("rank"),
    )
    regs = ranked.groupBy("event_type", "bucket").agg(
        F.max("rank").alias("r")
    )
    den = regs.groupBy("event_type").agg(
        F.sum(F.expr("CAST(power(2, 57 - r) AS BIGINT)")).alias("dp"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct"),
    )
    full = den.select(
        "event_type",
        (
            F.col("dp")
            + (F.lit(_HLL_M) - F.col("nb")) * F.lit(144115188075855872)
        ).alias("den_scaled"),
    )
    return (
        exact.join(full, "event_type")
        .select(
            "event_type",
            "n_events",
            "exact_distinct",
            F.round(
                F.lit(0.673)
                * 256.0
                * 144115188075855872.0
                / F.col("den_scaled").cast("double"),
                4,
            ).alias("hll_est"),
        )
    )


SQL_HLL_DISTINCT = """
WITH based AS (
  SELECT event_type, user_id,
         CAST(h % 16 AS INTEGER) AS bucket,
         h >> 4 AS rest
  FROM (
    SELECT event_type, user_id,
           CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                AS UBIGINT) AS BIGINT) AS h
    FROM events) t
), ranked AS (
  SELECT event_type, bucket,
         CAST(CASE WHEN rest = 0 THEN 57
                   ELSE bit_count((rest & -rest) - 1) + 1 END
              AS INTEGER) AS rank
  FROM based
), regs AS (
  SELECT event_type, bucket, max(rank) AS r
  FROM ranked GROUP BY 1, 2
), den AS (
  SELECT event_type,
         CAST(sum(CAST(power(2, 57 - r) AS BIGINT)) AS BIGINT)
           + (16 - CAST(count(*) AS BIGINT)) * 144115188075855872
           AS den_scaled
  FROM regs GROUP BY 1
), exact AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT e.event_type, e.n_events, e.exact_distinct,
       round(0.673 * 256.0 * 144115188075855872.0
             / CAST(d.den_scaled AS DOUBLE), 4) AS hll_est
FROM exact e JOIN den d ON e.event_type = d.event_type
"""


def q_spearman_corr(spark, sf_dir):
    """Per-event_type Spearman rank correlation between ``value`` and
    arrival order — the monotone-trend detector that Pearson
    (``grouped_corr``) misses on non-linear drifts.

    Both rankings use row_number with the event_id tie-break (a fixed,
    documented tie convention — deterministic on any engine), so the
    rank difference d and sum(d^2) are EXACT integers; the classic
    ``rho = 1 - 6*sum(d^2) / (n*(n^2-1))`` does one double division
    per group at the end. Two sorts within the group partition, one
    agg — no joins."""
    ev = _t(spark, sf_dir, "events")
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wt = Window.partitionBy("event_type").orderBy("ts", "event_id")
    r = ev.select(
        "event_type",
        F.row_number().over(wv).cast("bigint").alias("rv"),
        F.row_number().over(wt).cast("bigint").alias("rt"),
    )
    return (
        r.select(
            "event_type",
            ((F.col("rv") - F.col("rt")) * (F.col("rv") - F.col("rt"))).alias(
                "d2"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("d2").alias("sum_d2"),
        )
        .select(
            "event_type",
            "n",
            "sum_d2",
            F.round(
                1.0
                - (6.0 * F.col("sum_d2").cast("double"))
                / (F.col("n") * (F.col("n") * F.col("n") - 1)).cast(
                    "double"
                ),
                6,
            ).alias("rho"),
        )
    )


SQL_SPEARMAN_CORR = """
WITH r AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY value, event_id) AS BIGINT) AS rv,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS BIGINT) AS rt
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum((rv - rt) * (rv - rt)) AS BIGINT) AS sum_d2,
       round(1.0 - (6.0 * CAST(sum((rv - rt) * (rv - rt)) AS DOUBLE))
             / CAST(count(*) * (count(*) * count(*) - 1) AS DOUBLE), 6)
         AS rho
FROM r GROUP BY 1
"""


def q_cusum_changepoint(spark, sf_dir):
    """Per-user CUSUM changepoint: the event index where the running
    sum's deviation from the global trend line peaks — the standard
    level-shift detector for metric streams (did this user's spend
    regime change, and when?).

    Fully integer until the report: values go to exact cents
    (``round(value*100)`` — never an exact .5 on this grid), and the
    centered deviation is cross-multiplied as ``n*cumsum - i*total``
    instead of subtracting a float mean, so the argmax is over exact
    BIGINTs (no ulp ties across engines). The per-user total rides in
    the same window pass (unbounded frame) — one sort per user key,
    no self-join; the argmax is a second tiny window over the same
    partitioning."""
    ev = _t(spark, sf_dir, "events")
    c = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    cum = c.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("bigint").alias("i"),
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
        F.sum("cents").over(wall).alias("total"),
    )
    dev = cum.select(
        "user_id",
        "event_id",
        "i",
        "n",
        F.abs(F.col("n") * F.col("cum") - F.col("i") * F.col("total")).alias(
            "adev"
        ),
    )
    wpick = Window.partitionBy("user_id").orderBy(
        F.col("adev").desc(), F.col("i")
    )
    return (
        dev.withColumn("pk", F.row_number().over(wpick))
        .where(F.col("pk") == 1)
        .select(
            "user_id",
            "n",
            F.col("i").alias("cp_i"),
            F.col("event_id").alias("cp_event_id"),
            F.col("adev").alias("max_abs_dev"),
        )
    )


SQL_CUSUM_CHANGEPOINT = """
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), cum AS (
  SELECT user_id, event_id,
         CAST(row_number() OVER w AS BIGINT) AS i,
         CAST(sum(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
         CAST(sum(cents) OVER (PARTITION BY user_id) AS BIGINT) AS total
  FROM c
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), dev AS (
  SELECT user_id, event_id, i, n,
         abs(n * cum - i * total) AS adev
  FROM cum
)
SELECT user_id, n, i AS cp_i, event_id AS cp_event_id,
       adev AS max_abs_dev
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY adev DESC, i) AS pk
  FROM dev) t
WHERE pk = 1
"""


def q_best_threshold(spark, sf_dir):
    """Per-day best split threshold by the Kolmogorov-Smirnov / Youden
    statistic: the ``value`` cut that maximizes |TPR - FPR| separating
    purchase (positive) from click (negative) events — the
    decision-stump learner behind score cutoff selection, and the
    argmax companion to ``roc_auc``/``pr_auc`` (which integrate the
    whole curve instead).

    Argmax over EXACT integers: at each distinct value (ascending,
    <= threshold predicts negative) the KS numerator is
    ``|cum_pos*n_neg - cum_neg*n_pos|`` — pure BIGINT cross-
    multiplication, so no float ulp can flip the winner across
    engines; ties break to the smallest threshold. Stream collapses
    to the per-(day, value) histogram first (map-side combine); days
    with a single class are excluded (KS undefined)."""
    ev = _t(spark, sf_dir, "events")
    pv = (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .select(
            F.dayofmonth("ts").cast("int").alias("day"),
            F.col("value").alias("v"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("p"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("ng"),
        )
        .groupBy("day", "v")
        .agg(
            F.sum("p").cast("bigint").alias("pos_at"),
            F.sum("ng").cast("bigint").alias("neg_at"),
        )
    )
    w = (
        Window.partitionBy("day")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("day")
    cum = pv.select(
        "day",
        "v",
        F.sum("pos_at").over(w).alias("cum_pos"),
        F.sum("neg_at").over(w).alias("cum_neg"),
        F.sum("pos_at").over(wall).alias("n_pos"),
        F.sum("neg_at").over(wall).alias("n_neg"),
    ).where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    scored = cum.select(
        "day",
        "v",
        "n_pos",
        "n_neg",
        F.abs(
            F.col("cum_pos") * F.col("n_neg")
            - F.col("cum_neg") * F.col("n_pos")
        ).alias("ks_num"),
    )
    wpick = Window.partitionBy("day").orderBy(
        F.col("ks_num").desc(), F.col("v")
    )
    return (
        scored.withColumn("pk", F.row_number().over(wpick))
        .where(F.col("pk") == 1)
        .select(
            "day",
            F.col("v").alias("thr_v"),
            "n_pos",
            "n_neg",
            F.round(
                F.col("ks_num").cast("double")
                / (F.col("n_pos") * F.col("n_neg")).cast("double"),
                6,
            ).alias("ks"),
        )
    )


SQL_BEST_THRESHOLD = """
WITH pv AS (
  SELECT CAST(day(ts) AS INTEGER) AS day, value AS v,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos_at,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS neg_at
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY 1, 2
), cum AS (
  SELECT day, v,
         CAST(sum(pos_at) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cum_pos,
         CAST(sum(neg_at) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cum_neg,
         CAST(sum(pos_at) OVER (PARTITION BY day) AS BIGINT) AS n_pos,
         CAST(sum(neg_at) OVER (PARTITION BY day) AS BIGINT) AS n_neg
  FROM pv
  WINDOW w AS (PARTITION BY day ORDER BY v)
), scored AS (
  SELECT day, v, n_pos, n_neg,
         abs(cum_pos * n_neg - cum_neg * n_pos) AS ks_num
  FROM cum WHERE n_pos > 0 AND n_neg > 0
)
SELECT day, v AS thr_v, n_pos, n_neg,
       round(CAST(ks_num AS DOUBLE)
             / CAST(n_pos * n_neg AS DOUBLE), 6) AS ks
FROM (
  SELECT *, row_number() OVER (PARTITION BY day
                               ORDER BY ks_num DESC, v) AS pk
  FROM scored) t
WHERE pk = 1
"""
