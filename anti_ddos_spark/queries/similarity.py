"""Oracle-checked similarity-search queries over `embeddings`.

Cosine arithmetic is bitwise-identical between Spark's ordered
aggregate-fold and DuckDB's list functions (verified empirically), so
scores are rounded at 6 dp only as belt-and-braces; ids and cluster
assignments are exact."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from anti_ddos_spark.operators.similarity import brute_force_topk, ivf_assign
from anti_ddos_spark.queries.base import Query, rnd, t

TOPK = 10
QUERY_ID = 0
CENTROIDS = 8

_COS = (
    "list_dot_product(a, b) / (sqrt(list_dot_product(a, a)) * sqrt(list_dot_product(b, b)))"
)


def _cos_sql(a: str, b: str) -> str:
    d = f"list_dot_product({a}, {b})"
    na = f"sqrt(list_dot_product({a}, {a}))"
    nb = f"sqrt(list_dot_product({b}, {b}))"
    return f"CASE WHEN {na} > 0 AND {nb} > 0 THEN {d} / ({na} * {nb}) ELSE 0.0 END"


# --- q40: brute-force cosine top-k ---------------------------------------

def q40_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    res = brute_force_topk(t(spark, sf, "embeddings"), QUERY_ID, TOPK)
    return res.select("vec_id", rnd(F.col("cos"), 6).alias("cos"))


Q40_SQL = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {QUERY_ID}),
scored AS (
  SELECT vec_id, {_cos_sql('embedding::DOUBLE[]', 'qe')} AS cos
  FROM embeddings, q WHERE vec_id != {QUERY_ID})
SELECT vec_id, floor((cos) * 1000000 + 0.5) / 1000000.0 AS cos
FROM scored ORDER BY scored.cos DESC, vec_id ASC LIMIT {TOPK}
"""


# --- q41: IVF cell assignment + cluster histogram ------------------------

def q41_ivf_clusters(spark: SparkSession, sf: str) -> DataFrame:
    assigned = ivf_assign(t(spark, sf, "embeddings"), CENTROIDS)
    return assigned.groupBy("centroid_id").agg(
        F.count("*").alias("n_vectors"),
        rnd(F.avg("cos"), 6).alias("avg_cos"),
    )


Q41_SQL = f"""
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
  FROM embeddings WHERE vec_id < {CENTROIDS}),
scored AS (
  SELECT e.vec_id, c.centroid_id, {_cos_sql('e.embedding::DOUBLE[]', 'c.cvec')} AS cos
  FROM embeddings e, cents c),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id ASC) AS rn
  FROM scored)
SELECT centroid_id, count(*) AS n_vectors,
       floor((avg(cos)) * 1000000 + 0.5) / 1000000.0 AS avg_cos
FROM ranked WHERE rn = 1 GROUP BY centroid_id
"""


# --- q42: embedding-cosine near-duplicate pairs --------------------------

NEARDUP_COS = 0.2  # synthetic vectors are near-orthogonal; low bar → rows


def q42_cosine_neardup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """All-pairs cosine above threshold within each label bucket —
    embedding near-dup detection. Bucketing by label keeps the join
    quadratic only within cells (the LSH/IVF trick at scale)."""
    from anti_ddos_spark.operators.similarity import as_double, cosine

    emb = t(spark, sf, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("e")
    )
    a, b = emb.alias("a"), emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    sim = cosine(F.col("a.e"), F.col("b.e"))
    return (
        pairs.select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            rnd(sim, 6).alias("cos"),
        )
        .filter(F.col("cos") >= NEARDUP_COS)
    )


Q42_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         floor(({_cos_sql('a.e', 'b.e')}) * 1000000 + 0.5) / 1000000.0 AS cos
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
SELECT id_a, id_b, cos FROM pairs WHERE cos >= {NEARDUP_COS}
"""


# --- q43: LSH-bucketed ANN (random-hyperplane signs) ---------------------

LSH_PLANES = 4  # hyperplanes → 16 buckets


def q43_lsh_ann(spark: SparkSession, sf: str) -> DataFrame:
    """Hyperplane-LSH ANN: sign bits of dot(e, h_j) for LSH_PLANES
    deterministic hyperplanes (vectors 1..LSH_PLANES of the table — same
    trick as IVF's leading-vector centroids, so the oracle can replicate
    without RNG) form a bucket id; candidates = same-bucket vectors; the
    query's top-k is computed among candidates only.

    Scale shape: signature is a narrow map-side projection; the bucket
    equi-join replaces the all-pairs cross product, scanning ~n/2^planes
    candidates per query instead of n."""
    from anti_ddos_spark.operators.similarity import as_double, cosine, dot

    emb = t(spark, sf, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    planes = emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= LSH_PLANES)).select(
        F.col("vec_id").alias("plane_id"), F.col("e").alias("h")
    )
    sig = (
        emb.crossJoin(F.broadcast(planes))
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.when(
                    dot(F.col("e"), F.col("h")) >= 0,
                    F.expr("shiftleft(1, cast(plane_id as int) - 1)"),
                ).otherwise(0)
            ).alias("bucket"),
            F.first("e").alias("e"),
        )
    )
    q = sig.filter(F.col("vec_id") == QUERY_ID).select(
        F.col("bucket").alias("qb"), F.col("e").alias("qe")
    )
    cands = sig.join(F.broadcast(q), sig.bucket == F.col("qb")).filter(
        F.col("vec_id") != QUERY_ID
    )
    scored = cands.select("vec_id", rnd(cosine(F.col("e"), F.col("qe")), 6).alias("cos"))
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(TOPK)


Q43_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
planes AS (SELECT vec_id AS plane_id, e AS h FROM e WHERE vec_id BETWEEN 1 AND {LSH_PLANES}),
sig AS (
  SELECT e.vec_id, any_value(e.e) AS e,
         CAST(sum(CASE WHEN list_dot_product(e.e, p.h) >= 0
                       THEN 1 << (CAST(p.plane_id AS INT) - 1) ELSE 0 END) AS BIGINT) AS bucket
  FROM e, planes p GROUP BY e.vec_id),
q AS (SELECT bucket AS qb, e AS qe FROM sig WHERE vec_id = {QUERY_ID}),
cands AS (
  SELECT s.vec_id, {_cos_sql('s.e', 'q.qe')} AS cos
  FROM sig s, q WHERE s.bucket = q.qb AND s.vec_id != {QUERY_ID})
SELECT vec_id, floor((cands.cos) * 1000000 + 0.5) / 1000000.0 AS cos
FROM cands ORDER BY cands.cos DESC, vec_id ASC LIMIT {TOPK}
"""


QUERIES: dict[str, Query] = {
    "q40_cosine_topk": Query(q40_cosine_topk, Q40_SQL, "brute-force cosine top-k"),
    "q41_ivf_clusters": Query(q41_ivf_clusters, Q41_SQL, "IVF centroid assignment histogram"),
    "q42_cosine_neardup_pairs": Query(
        q42_cosine_neardup_pairs, Q42_SQL, "embedding-cosine near-dup pairs (bucketed all-pairs)"
    ),
    "q43_lsh_ann": Query(
        q43_lsh_ann, Q43_SQL, "hyperplane-LSH bucketed ANN top-k"
    ),
}
