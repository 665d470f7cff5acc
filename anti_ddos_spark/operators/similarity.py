"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension (no analogue in the reference). Two
strategies, both Catalyst-native (higher-order array expressions — the
dot product folds inside codegen, no Python):

- brute-force: broadcast the query vector(s), score every row, top-k.
  The right baseline ≤ ~10⁸ vectors/executor-scan; one pass, no shuffle
  except the final top-k (which is a partial+global TakeOrdered).
- IVF (inverted-file): assign rows to the nearest of C centroids
  (broadcast), then search only matching cells — at 100 TB the cell
  assignment becomes a partition key so a probe touches 1/C of the data.
  Centroid learning is delegated to MLlib KMeans when quality matters;
  here any fixed seed set works for the plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Ordered left fold — bitwise-stable across engines for the oracle."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbours of one stored vector, excluding itself."""
    q = (
        vectors.filter(F.col(id_col) == query_id)
        .select(as_double(F.col(vec_col)).alias("qvec"))
    )
    scored = (
        vectors.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine(as_double(F.col(vec_col)), F.col("qvec")).alias("cos"),
        )
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def ivf_assign(
    vectors: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (centroids = the
    first n stored vectors — deterministic plumbing; swap in KMeans
    centers for quality)."""
    cents = (
        vectors.filter(F.col(id_col) < n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            as_double(F.col(vec_col)).alias("cvec"),
        )
    )
    scored = (
        vectors.crossJoin(F.broadcast(cents))
        .select(
            id_col,
            "centroid_id",
            cosine(as_double(F.col(vec_col)), F.col("cvec")).alias("cos"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy(F.desc("cos"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "centroid_id", "cos")
    )
