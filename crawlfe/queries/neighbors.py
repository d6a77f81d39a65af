"""Feature-eng pack #109 (r4): embedding neighborhood statistics —
the local-density family that complements the global geometry
queries (embedding_isotropy, mean_pairwise_cosine, jl_distortion)
and the search queries (knn_cosine, ann_lsh, ann_ivf).

All three run on the deterministic 200-point reference panel
(vec_id < 200, present at every SF) with exact Euclidean distances:
the panel bounds the pairwise grid at 200 x 200 regardless of table
size, the same probe-panel discipline as ``knn_cosine``.  Distances
fold the 64-dim float list in list order in both engines, so the
doubles are bit-identical.

* ``lof_scores`` — Breunig et al. (2000) Local Outlier Factor at
  k = 5: k-distance, reachability distance, local reachability
  density, LOF; top-10 most outlying points.
* ``twonn_dim`` — Facco et al. (2017) TwoNN intrinsic-dimension
  estimator: mu_i = d2/d1, id_mle = n / sum(ln mu).
* ``hubness_skew`` — k-occurrence distribution at k = 5: how often
  each point appears in others' kNN lists; moment skewness, max
  hub size and the anti-hub count — high skew is the classic
  curse-of-dimensionality symptom that degrades ANN recall.

Scale shape: one filter to the panel, one 200^2 broadcastable pair
grid, then windows/joins on O(panel * k) rows; raw table size only
affects the initial scan.
"""
from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._shared import _t

_NB_PANEL = 200  # reference panel: vec_id < 200 at every SF
_NB_K = 5


def _pairs(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < _NB_PANEL
    )
    vec_d = F.transform(
        F.col("embedding"), lambda x: x.cast("double")
    )
    base = e.select("vec_id", vec_d.alias("v"))
    a = base.select(
        F.col("vec_id").alias("i"), F.col("v").alias("vi")
    )
    b = base.select(
        F.col("vec_id").alias("j"), F.col("v").alias("vj")
    )
    d = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("vi"), F.col("vj"), lambda x, y: x - y
            ),
            F.lit(0.0),
            lambda acc, t: acc + t * t,
        )
    )
    return (
        a.join(F.broadcast(b), F.col("i") != F.col("j"))
        .select("i", "j", d.alias("d"))
    )


_SQL_PAIRS = f"""
base AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < {_NB_PANEL}
), pairs AS MATERIALIZED (
  SELECT a.vec_id AS i, b.vec_id AS j,
         sqrt(list_sum(list_transform(list_zip(a.v, b.v),
              t -> (t[1] - t[2]) * (t[1] - t[2])))) AS d
  FROM base a JOIN base b ON a.vec_id <> b.vec_id
)
"""


def _knn(spark, sf_dir):
    p = _pairs(spark, sf_dir)
    w = Window.partitionBy("i").orderBy("d", "j")
    return p.select(
        "i", "j", "d", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= _NB_K)


_SQL_KNN = f"""
{_SQL_PAIRS},
knn AS MATERIALIZED (
  SELECT i, j, d, rn FROM (
    SELECT i, j, d,
           row_number() OVER (PARTITION BY i ORDER BY d, j) AS rn
    FROM pairs
  ) WHERE rn <= {_NB_K}
)
"""


def q_lof_scores(spark, sf_dir):
    """LOCAL OUTLIER FACTOR (k=5) on the 200-point panel: top-10 by
    LOF with the local reachability density alongside."""
    knn = _knn(spark, sf_dir).localCheckpoint(eager=True)
    kdist = knn.where(F.col("rn") == _NB_K).select(
        F.col("i").alias("o"), F.col("d").alias("kdist")
    )
    reach = knn.join(
        kdist, knn["j"] == kdist["o"]
    ).select(
        "i",
        "j",
        F.greatest(F.col("kdist"), F.col("d")).alias("rd"),
    )
    lrd = reach.groupBy("i").agg(
        (F.lit(1.0) / F.avg("rd")).alias("lrd")
    )
    lof = (
        knn.select("i", "j")
        .join(
            lrd.select(
                F.col("i").alias("j"), F.col("lrd").alias("lrd_o")
            ),
            "j",
        )
        .groupBy("i")
        .agg(F.avg("lrd_o").alias("_m"))
        .join(lrd, "i")
        .select(
            F.col("i").alias("vec_id"),
            F.round(F.col("_m") / F.col("lrd"), 6).alias("lof"),
            F.round("lrd", 6).alias("lrd"),
        )
    )
    return lof.orderBy(F.desc("lof"), F.asc("vec_id")).limit(10)


SQL_LOF_SCORES = f"""
WITH {_SQL_KNN},
kdist AS MATERIALIZED (
  SELECT i AS o, d AS kdist FROM knn WHERE rn = {_NB_K}
), reach AS MATERIALIZED (
  SELECT knn.i, knn.j, greatest(kdist.kdist, knn.d) AS rd
  FROM knn JOIN kdist ON knn.j = kdist.o
), lrd AS MATERIALIZED (
  SELECT i, 1.0 / avg(rd) AS lrd FROM reach GROUP BY 1
), lof AS (
  SELECT knn.i AS vec_id, avg(lo.lrd) AS _m
  FROM knn JOIN lrd lo ON knn.j = lo.i
  GROUP BY 1
)
SELECT lof.vec_id, round(lof._m / lrd.lrd, 6) AS lof,
       round(lrd.lrd, 6) AS lrd
FROM lof JOIN lrd ON lof.vec_id = lrd.i
ORDER BY lof DESC, vec_id ASC LIMIT 10
"""


def q_twonn_dim(spark, sf_dir):
    """TWONN intrinsic dimension: id_mle = n / sum(ln(d2/d1)) over
    panel points with d1 > 0."""
    knn = _knn(spark, sf_dir)
    two = (
        knn.where(F.col("rn") <= 2)
        .groupBy("i")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
            F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
        )
        .where(F.col("d1") > 0)
    )
    m = two.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_used"),
        F.sum(F.log(F.col("d2") / F.col("d1"))).alias("_s"),
        F.avg(F.col("d2") / F.col("d1")).alias("_mu"),
    )
    return m.select(
        "n_used",
        F.round(F.col("n_used") / F.col("_s"), 4).alias("id_mle"),
        F.round("_mu", 6).alias("mean_mu"),
    )


SQL_TWONN_DIM = f"""
WITH {_SQL_KNN},
two AS (
  SELECT i,
         min(CASE WHEN rn = 1 THEN d END) AS d1,
         min(CASE WHEN rn = 2 THEN d END) AS d2
  FROM knn WHERE rn <= 2 GROUP BY 1
), f AS (
  SELECT * FROM two WHERE d1 > 0
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_used,
         sum(ln(d2 / d1)) AS _s, avg(d2 / d1) AS _mu
  FROM f
)
SELECT n_used, round(n_used / _s, 4) AS id_mle,
       round(_mu, 6) AS mean_mu
FROM m
"""


def q_hubness_skew(spark, sf_dir):
    """HUBNESS at k=5: moment skewness of the k-occurrence counts
    (0-count anti-hubs included), max hub size, anti-hub count."""
    knn = _knn(spark, sf_dir)
    occ = knn.groupBy("j").agg(
        F.count(F.lit(1)).cast("bigint").alias("kocc")
    )
    panel = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _NB_PANEL)
        .select(F.col("vec_id").alias("j"))
    )
    full = panel.join(occ, "j", "left").select(
        F.coalesce(F.col("kocc"), F.lit(0))
        .cast("bigint")
        .alias("kocc")
    )
    m = full.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("kocc").alias("m1"),
        F.avg(F.col("kocc") * F.col("kocc")).alias("m2"),
        F.avg(
            F.col("kocc") * F.col("kocc") * F.col("kocc")
        ).alias("m3"),
        F.max("kocc").cast("bigint").alias("max_kocc"),
        F.sum((F.col("kocc") == 0).cast("bigint")).alias(
            "n_antihubs"
        ),
    )
    var = F.col("m2") - F.col("m1") * F.col("m1")
    mu3 = (
        F.col("m3")
        - 3 * F.col("m1") * F.col("m2")
        + 2 * F.col("m1") * F.col("m1") * F.col("m1")
    )
    return m.select(
        "n",
        F.round(F.col("m1"), 4).alias("mean_kocc"),
        F.round(mu3 / F.pow(var, F.lit(1.5)), 6).alias("skewness"),
        "max_kocc",
        "n_antihubs",
    )


SQL_HUBNESS_SKEW = f"""
WITH {_SQL_KNN},
occ AS (
  SELECT j, CAST(count(*) AS BIGINT) AS kocc FROM knn GROUP BY 1
), panel AS (
  SELECT vec_id AS j FROM embeddings WHERE vec_id < {_NB_PANEL}
), occfull AS (
  SELECT CAST(coalesce(occ.kocc, 0) AS BIGINT) AS kocc
  FROM panel LEFT JOIN occ USING (j)
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, avg(kocc) AS m1,
         avg(kocc * kocc) AS m2,
         avg(kocc * kocc * kocc) AS m3,
         CAST(max(kocc) AS BIGINT) AS max_kocc,
         CAST(sum(CASE WHEN kocc = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_antihubs
  FROM occfull
)
SELECT n, round(m1, 4) AS mean_kocc,
       round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
             / pow(m2 - m1 * m1, 1.5), 6) AS skewness,
       max_kocc, n_antihubs
FROM m
"""
