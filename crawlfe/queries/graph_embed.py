"""Feature-eng pack #61 (r4): graph peeling + embedding truncation.

K-CORE PEELING (bounded rounds) on the shared deterministic doc graph
— the standard link-graph denoising step before any community or
centrality feature (drop tendrils, keep the dense core) — and a
MATRYOSHKA TRUNCATION EVAL over the embeddings table: how much cosine
structure survives keeping only the first 8 of 64 dims (the
cheap-retrieval question every matryoshka/MRL deployment asks).
Both oracled: the peel unrolls to identical fixed-round SQL, the
cosine math reuses the knn_cosine higher-order-function idiom
(crawlfe/queries/text.py) that is driver-green since r1.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ._shared import _t
from .stats_links import SQL_UND_EDGES, _und_edges

_KCORE_K = 2        # peel threshold
_KCORE_ROUNDS = 3   # fixed peel rounds (bounded, deterministic)
_MAT_DIMS = 8       # matryoshka truncation width


def q_kcore_peel(spark, sf_dir):
    """Fixed-round K-CORE PEEL (k=2, 3 rounds) of the undirected doc
    graph: each round computes degrees and drops nodes below k, edges
    restricted to survivors.  Three rounds of (union-all degree agg +
    two semi joins) — the same bounded-iteration shape as `hits_scores`
    and `label_prop`, so no unbounded convergence loop; at 100 TB each
    round is two keyed shuffles and the frontier only shrinks.
    Output: surviving nodes with their post-peel degree (the core
    membership + coreness-lower-bound feature).  Each round
    localCheckpoints the surviving edge list (the dedup_clusters /
    label_prop iteration discipline) — without it the lineage
    re-derives the synthetic edge relation 2^rounds times and the
    plan alone blows past the data cost."""
    edges = _und_edges(spark, sf_dir).localCheckpoint(eager=False)
    for _ in range(_KCORE_ROUNDS):
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        )
        keep = deg.where(F.col("deg") >= _KCORE_K).select("node")
        edges = (
            edges.join(keep.withColumnRenamed("node", "u"), "u", "semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "semi")
            .localCheckpoint(eager=False)
        )
    final = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    return final.select(F.col("node").cast("bigint").alias("node"), "deg")


def _sql_kcore_round(prev: str, this: str) -> str:
    return f"""
d_{this} AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM e_{prev} UNION ALL SELECT v FROM e_{prev}
  ) GROUP BY 1
), k_{this} AS (
  SELECT node FROM d_{this} WHERE deg >= {_KCORE_K}
), e_{this} AS (
  SELECT e.u, e.v FROM e_{prev} e
  JOIN k_{this} a ON e.u = a.node
  JOIN k_{this} b ON e.v = b.node
)"""


SQL_KCORE_PEEL = f"""
WITH e_0 AS ({SQL_UND_EDGES}),
{_sql_kcore_round('0', '1').lstrip()},
{_sql_kcore_round('1', '2').lstrip()},
{_sql_kcore_round('2', '3').lstrip()}
SELECT CAST(node AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS deg
FROM (SELECT u AS node FROM e_3 UNION ALL SELECT v FROM e_3)
GROUP BY 1
"""


def q_matryoshka_eval(spark, sf_dir):
    """MATRYOSHKA TRUNCATION EVAL: for each consecutive vector pair
    (vec_id, vec_id+1), the full-width cosine vs the cosine of the
    FIRST {_MAT_DIMS} dims — the per-pair evidence for whether a
    truncated prefix index (the MRL trick: coarse search on 8 dims,
    re-rank on 64) preserves similarity structure.  All JVM
    higher-order functions on the float arrays (cast to double first,
    left-to-right folds — identical association in both engines);
    one self-join on vec_id+1, no shuffle of anything fat."""
    e = _t(spark, sf_dir, "embeddings")
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def cos(a, b):
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
        nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
        return dot / (na * nb)

    base = e.select("vec_id", vec_d.alias("v"))
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b, F.col("b.vec_id") == F.col("a.vec_id") + 1
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("a.v").alias("va"),
        F.col("b.v").alias("vb"),
    )
    full = cos(F.col("va"), F.col("vb"))
    trunc = cos(
        F.slice(F.col("va"), 1, _MAT_DIMS),
        F.slice(F.col("vb"), 1, _MAT_DIMS),
    )
    return pairs.select(
        "vec_id",
        F.round(full, 6).alias("cos_full"),
        F.round(trunc, 6).alias("cos_trunc"),
        F.round(F.abs(full - trunc), 6).alias("abs_gap"),
    )


SQL_MATRYOSHKA_EVAL = f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), pairs AS (
  SELECT a.vec_id, a.v AS va, b.v AS vb
  FROM base a JOIN base b ON b.vec_id = a.vec_id + 1
), scored AS (
  SELECT vec_id,
         list_sum(list_transform(list_zip(va, vb), t -> t[1] * t[2]))
           / (sqrt(list_sum(list_transform(va, x -> x * x)))
              * sqrt(list_sum(list_transform(vb, x -> x * x))))
           AS cos_full,
         list_sum(list_transform(
             list_zip(va[1:{_MAT_DIMS}], vb[1:{_MAT_DIMS}]),
             t -> t[1] * t[2]))
           / (sqrt(list_sum(list_transform(va[1:{_MAT_DIMS}],
                                           x -> x * x)))
              * sqrt(list_sum(list_transform(vb[1:{_MAT_DIMS}],
                                             x -> x * x))))
           AS cos_trunc
  FROM pairs
)
SELECT vec_id, round(cos_full, 6) AS cos_full,
       round(cos_trunc, 6) AS cos_trunc,
       round(abs(cos_full - cos_trunc), 6) AS abs_gap
FROM scored
"""
