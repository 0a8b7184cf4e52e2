"""Similarity search over embedding columns (SURVEY.md §2 M2).

- ``cosine_expr``: pure-expression cosine (zip_with product, sequential
  aggregate fold → deterministic summation order, mirrorable in DuckDB with
  list_zip + list_sum).
- ``topk_bruteforce``: exact top-k per query via a query×candidate join and
  a row_number window. The baseline; O(Q×N) — fine when Q is small or N is
  pre-filtered.
- ``topk_lsh``: random-hyperplane LSH scale path: sign-bit bucket over D
  deterministic hyperplanes, candidates share a bucket (multi-probe via
  bands), exact re-rank inside the bucket only. Recall < 1 by design; the
  bucket join replaces the O(Q×N) product with per-bucket fan-out.

Hyperplanes are seeded (numpy, seed 7) → deterministic across runs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
_planes = np.random.RandomState(7).normal(size=(N_PLANES, 64))


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def topk_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query vector. Deterministic tie-break on
    (score desc, neighbor id)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


def _bucket_expr(vec: Column) -> Column:
    """Sign-bit bucket over the seeded hyperplanes → one long per vector."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(w)) for w in _planes[p]]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in range(N_PLANES)
    ]
    out = F.lit(0).cast("bigint")
    for b in bits:
        out = out * 2 + b
    return out


def assign_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cent_id: str = "centroid_id",
) -> DataFrame:
    """Nearest-centroid assignment (one IVF build pass): broadcast the
    centroid table, score every (vector, centroid) pair, keep the argmax
    by cosine. Deterministic tie-break on centroid id."""
    c = centroids.select(
        F.col(cent_id), F.col(vec_col).alias("__cv")
    )
    scored = vectors.crossJoin(F.broadcast(c)).withColumn(
        "__cs", cosine_expr(F.col(vec_col), F.col("__cv"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__cs"), F.col(cent_id))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__cs", "__cv")
    )


def topk_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: partition candidates into centroid cells (centroids =
    first ``n_centroids`` candidate vectors — deterministic), probe the
    query's ``n_probe`` nearest cells, exact re-rank inside them.

    Scale shape: the cell assignment is one broadcast pass; search joins on
    the 8-byte cell id with per-cell fan-out ≈ N/n_centroids × n_probe —
    the O(Q×N) product never materializes. A real deployment would learn
    centroids with k-means; cell-local search is identical."""
    cents = (
        candidates.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.row_number()
            .over(Window.orderBy(id_col))
            .cast("int")
            .alias("centroid_id"),
            F.col(vec_col),
        )
    )
    cand_cells = assign_centroids(
        candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        cents.select("centroid_id", F.col(vec_col).alias("cv")),
        vec_col="cv",
        id_col="neighbor_id",
    )
    # each query probes its n_probe nearest cells
    qc = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q_scored = qc.crossJoin(
        F.broadcast(cents.select("centroid_id", F.col(vec_col).alias("__cv")))
    ).withColumn("__cs", cosine_expr(F.col("qv"), F.col("__cv")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("__cs"), F.col("centroid_id"))
    q_cells = (
        q_scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "centroid_id")
    )
    scored = (
        q_cells.join(cand_cells, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


def topk_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    exact cosine re-rank inside it. At 100 TB the bucket join shuffles on an
    8-byte bucket key; per-bucket size is tunable via N_PLANES."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
        .orderBy("query_id", "rank")
    )
