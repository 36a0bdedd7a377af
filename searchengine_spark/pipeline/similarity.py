"""Embedding similarity search over an array<float> column.

* brute-force cosine top-k — the exact baseline: JVM-side zip_with dot
  products, TakeOrderedAndProject top-k. O(N) per query but fully
  shuffle-free (map + top-k), so it scales linearly with executors.
* LSH-bucketed variant (random hyperplane signatures) — the scale path:
  probe only the buckets whose signature is within ``max_hamming`` of the
  query signature, i.e. a tunable recall/cost dial. Hyperplanes are
  deterministic (seeded), so signatures are reproducible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (vec_id, cosine), ties by vec_id."""
    q = F.lit([float(x) for x in query_vec])
    v = F.col(vec_col)
    # zero-norm vector (or query): ANSI mode (Spark 4 default) THROWS on
    # 0/0 and non-ANSI yields NaN which sorts ABOVE all doubles — use
    # try_divide (NULL on zero divisor) and rank such vectors last
    cos = F.coalesce(
        F.nanvl(F.try_divide(_dot(v, q), _norm(v) * _norm(q)), F.lit(-2.0)),
        F.lit(-2.0),
    )
    return (
        vectors.select(F.col(id_col).alias("vec_id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def rp_signature_expr(vec_col, planes: np.ndarray):
    """Random-hyperplane LSH signature as a BIGINT bit field: bit i set
    when dot(vec, plane_i) > 0."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = _dot(vec_col, F.lit([float(x) for x in p]))
        sig = sig + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_cosine_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    max_hamming: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: filter to vectors whose hyperplane
    signature is within ``max_hamming`` bits of the query's, then exact
    cosine on the survivors. At cluster scale the signature is a stored,
    bucketed column — the filter becomes partition pruning."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qsig = int(
        sum(1 << i for i, p in enumerate(planes) if float(np.dot(p, query_vec)) > 0)
    )
    v = F.col(vec_col)
    sig = rp_signature_expr(v, planes)
    hamming = F.bit_count(sig.bitwiseXOR(F.lit(qsig)))
    q = F.lit([float(x) for x in query_vec])
    cos = F.coalesce(
        F.nanvl(F.try_divide(_dot(v, q), _norm(v) * _norm(q)), F.lit(-2.0)),
        F.lit(-2.0),
    )
    return (
        vectors.filter(hamming <= max_hamming)
        .select(F.col(id_col).alias("vec_id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_build(
    vectors: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """IVF (inverted-file) index: k-means coarse quantizer + cluster
    assignment. Returns (assigned_df, centroids) where assigned_df adds a
    ``list_id`` column. At cluster scale, write ``assigned_df``
    partitioned by list_id so a probe reads only n_probe partitions —
    the same partition-pruning story as the text index's term_bucket."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.withColumn("_features", array_to_vector(F.col(vec_col)))
    model = KMeans(
        k=n_lists, seed=seed, featuresCol="_features", predictionCol="list_id"
    ).fit(feat)
    assigned = model.transform(feat).drop("_features")
    centroids = [np.asarray(c).tolist() for c in model.clusterCenters()]
    return assigned, centroids


def ivf_cosine_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k over an IVF index: probe only the
    ``n_probe`` lists whose centroids are closest to the query (by
    cosine), exact cosine within them. The list filter is a partition
    prune when ``assigned`` is stored partitioned by list_id."""
    q = np.asarray(query_vec, dtype=float)
    qn = np.linalg.norm(q)
    sims = [
        (i, float(np.dot(q, np.asarray(c)) / (qn * np.linalg.norm(c) + 1e-12)))
        for i, c in enumerate(centroids)
    ]
    probe = [i for i, _ in sorted(sims, key=lambda x: -x[1])[:n_probe]]

    qcol = F.lit([float(x) for x in query_vec])
    v = F.col(vec_col)
    cos = F.coalesce(
        F.nanvl(F.try_divide(_dot(v, qcol), _norm(v) * _norm(qcol)), F.lit(-2.0)),
        F.lit(-2.0),
    )
    return (
        assigned.filter(F.col("list_id").isin(probe))
        .select(F.col(id_col).alias("vec_id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
