"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the (small) query set, JVM-side dot
  products via zip_with/aggregate, window top-k. Exact baseline.
- IVF-style top-k: coarse centroids (deterministic sample -> driver
  k-means-lite), probe only the nprobe nearest inverted lists. The scale
  path: candidate set shrinks by ~ncells/nprobe; exactness bounded by probe
  coverage (standard IVF contract).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k: queries broadcast against every vector."""
    q = queries.select(F.col(query_id_col), F.col(query_vec_col))
    v = vectors.select(F.col(id_col), F.col(vec_col))
    joined = v.crossJoin(F.broadcast(q))
    scored = joined.withColumn(
        "cosine", cosine_col(F.col(vec_col).cast("array<double>"), F.col(query_vec_col).cast("array<double>"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def train_centroids(
    vectors: DataFrame, ncells: int, vec_col: str = "embedding",
    sample: int = 4096, iters: int = 5, seed: int = 42,
) -> np.ndarray:
    """Driver-side Lloyd iterations on a deterministic sample (ORDER BY
    xxhash64(id) LIMIT sample). ncells is small (sqrt(N) rule); the model
    ships back as a broadcast literal array."""
    id_col = vectors.columns[0]
    pdf = (
        vectors.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(sample)
        .toPandas()
    )
    X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(ncells, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = X[m].mean(0)
    return cents


def _nearest_cells_expr(vec, cents: np.ndarray, nprobe: int):
    """Array of the nprobe nearest centroid ids, pure column expressions
    (distance per centroid unrolled at plan time; fine for <= a few
    hundred centroids)."""
    dists = [
        F.struct(
            F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(float(x)) for x in c]), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            F.lit(i).alias("cell"),
        )
        for i, c in enumerate(cents)
    ]
    return F.slice(F.transform(F.sort_array(F.array(*dists)), lambda s: s["cell"]), 1, nprobe)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    ncells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-bucketed approximate top-k: vectors assigned to their nearest
    centroid cell once; queries probe nprobe cells; exact cosine within."""
    if centroids is None:
        centroids = train_centroids(vectors, ncells, vec_col)
    vcast = F.col(vec_col).cast("array<double>")
    v = vectors.select(
        F.col(id_col), F.col(vec_col),
        _nearest_cells_expr(vcast, centroids, 1)[0].alias("cell"),
    )
    q = queries.select(
        F.col(query_id_col), F.col(query_vec_col),
        F.explode(_nearest_cells_expr(F.col(query_vec_col).cast("array<double>"), centroids, nprobe)).alias("cell"),
    )
    cand = v.join(q, "cell")
    scored = cand.withColumn(
        "cosine", cosine_col(F.col(vec_col).cast("array<double>"), F.col(query_vec_col).cast("array<double>"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
