"""Embedding similarity search over an array<float> column.

* brute-force cosine top-k — the exact baseline: JVM-side zip_with dot
  products, TakeOrderedAndProject top-k. O(N) per query but fully
  shuffle-free (map + top-k), so it scales linearly with executors.
* MATERIALIZED ANN indexes — the scale path, mirroring the text index's
  term_bucket story: signatures / list assignments are computed ONCE at
  build time (numpy matmul in an Arrow-batched pandas UDF) and written
  as parquet PARTITIONED by the probe key, so a query is a partition-
  pruned read of a few directories, never a full scan:
    - IVF (``ann_build_ivf`` / ``ann_query_ivf``): k-means coarse lists,
      partitioned by list_id; probe = n_probe closest lists.
    - banded hyperplane LSH (``ann_build_lsh`` / ``ann_query_lsh``): the
      n-bit signature is split into B bands and each vector is stored
      once per band, partitioned by (band, band_val); by pigeonhole, any
      vector within Hamming distance B-1 of the query signature matches
      the query's value in at least one band — probing the B matching
      partitions guarantees recall of that Hamming ball.
  Hyperplanes/centroids are seeded, so builds are reproducible.
* in-line LSH/IVF variants (no stored index) remain for one-shot use.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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
    """One-shot approximate cosine top-k: compute hyperplane signatures
    inline (16 interpreted HOF aggregates per row!), Hamming-filter, then
    exact cosine on survivors. This variant SCANS THE FULL TABLE and does
    strictly more per-row work than brute force — it exists only for
    ad-hoc use on small frames with no index on disk. For anything
    repeated or large, build the materialized index once
    (:func:`ann_build_lsh`) and probe it (:func:`ann_query_lsh`):
    signatures become a stored column computed by one numpy matmul, and
    the probe is a ``bands``-partition pruned read."""
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


def _cosine_expr(vec_col, query_vec: list[float]):
    """Shared exact-cosine Column (zero-norm rows rank last, ANSI-safe)."""
    q = F.lit([float(x) for x in query_vec])
    return F.coalesce(
        F.nanvl(
            F.try_divide(_dot(vec_col, q), _norm(vec_col) * _norm(q)),
            F.lit(-2.0),
        ),
        F.lit(-2.0),
    )


def with_rp_signatures(
    vectors: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec) -> (id, vec, sig): random-hyperplane signature via ONE
    numpy matmul per Arrow batch (build-time cost; replaces the 16
    interpreted HOF aggregates the inline variant pays per row at query
    time). bit i of sig is set when dot(vec, plane_i) > 0."""
    n_planes = planes.shape[0]
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    pl = planes.astype(np.float64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            sig = ((mat @ pl.T) > 0).astype(np.int64) @ weights
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: list(pdf[vec_col]),
                    "sig": sig,
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, {vec_col} array<float>, sig long"
    )


def banded_signatures(
    vectors: DataFrame,
    planes: np.ndarray,
    bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec) -> one row per (id, band) with the band's signature
    slice: the shared write-side shape of the batch LSH store
    (ann_build_lsh) and the streaming segment appender
    (streaming/ann.py)."""
    n_planes = planes.shape[0]
    assert n_planes % bands == 0
    band_bits = n_planes // bands
    mask = (1 << band_bits) - 1
    signed = with_rp_signatures(vectors, planes, id_col, vec_col)
    return signed.select(
        id_col,
        vec_col,
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(sig, band * {band_bits}) & {mask}"),
    )


def ann_build_lsh(
    vectors: DataFrame,
    out_dir: str,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Materialize a banded-LSH ANN index: each vector is written once
    per band, hive-partitioned by (band, band_val) — bands * 2^(n/B)
    directories. A query probes exactly ``bands`` partitions (its own
    band values), which by pigeonhole contains every vector within
    Hamming distance bands-1 of the query signature."""
    planes = hyperplanes(dim, n_planes, seed)
    exploded = banded_signatures(vectors, planes, bands, id_col, vec_col)
    (
        exploded.write.mode("overwrite")
        .partitionBy("band", "band_val")
        .parquet(os.path.join(out_dir, "vectors"))
    )
    meta = {
        "method": "lsh",
        "dim": dim,
        "n_planes": n_planes,
        "bands": bands,
        "seed": seed,
        "planes": planes.tolist(),
    }
    with open(os.path.join(out_dir, "ann_meta.json"), "w") as f:
        json.dump(meta, f)


def lsh_query_signature(meta: dict, query_vec: list[float]) -> int:
    """The query vector's full hyperplane signature under a store's
    persisted planes (ann_meta.json)."""
    planes = np.asarray(meta["planes"])
    return int(
        sum(
            1 << i
            for i, p in enumerate(planes)
            if float(np.dot(p, query_vec)) > 0
        )
    )


def lsh_probe_filter(meta: dict, qsig: int):
    """Partition-pruning predicate selecting exactly the query's
    ``bands`` (band, band_val) partitions."""
    bands = meta["bands"]
    band_bits = meta["n_planes"] // bands
    probe = None
    for b in range(bands):
        cond = (F.col("band") == b) & (
            F.col("band_val")
            == ((qsig >> (b * band_bits)) & ((1 << band_bits) - 1))
        )
        probe = cond if probe is None else (probe | cond)
    return probe


def resolve_lsh_store_dir(out_dir: str) -> str:
    """Store directory of a (possibly streamed) LSH ANN index. A
    :class:`streaming.ann.StreamingAnnIndexer` compaction publishes
    versioned ``vectors_v<N>`` directories and flips the version pointer
    atomically in ``ann_stream_state.json``; a batch ``ann_build_lsh``
    store is the plain ``vectors`` directory (version 0)."""
    state_path = os.path.join(out_dir, "ann_stream_state.json")
    if os.path.exists(state_path):
        with open(state_path) as f:
            v = json.load(f).get("store_version", 0)
        if v:
            return os.path.join(out_dir, f"vectors_v{int(v)}")
    return os.path.join(out_dir, "vectors")


def ann_query_lsh(
    spark: SparkSession,
    out_dir: str,
    query_vec: list[float],
    k: int = 10,
    max_hamming: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Partition-pruned ANN probe: read only the ``bands`` (band,
    band_val) partitions matching the query signature, drop the per-band
    duplicates, Hamming-filter on the STORED signature (one xor +
    bit_count per row — no per-row hyperplane math), exact cosine on the
    survivors. Guaranteed to contain every vector within Hamming
    distance bands-1; ``max_hamming`` defaults to that radius."""
    with open(os.path.join(out_dir, "ann_meta.json")) as f:
        meta = json.load(f)
    if max_hamming is None:
        max_hamming = meta["bands"] - 1
    qsig = lsh_query_signature(meta, query_vec)
    df = (
        spark.read.parquet(resolve_lsh_store_dir(out_dir))
        .filter(lsh_probe_filter(meta, qsig))
        .dropDuplicates([id_col])
        .filter(
            F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
        )
    )
    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            F.round(_cosine_expr(F.col(vec_col), query_vec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS — the vector-space member of
    the dedup family (exact sha / MinHash-LSH / SimHash / n-gram Jaccard
    / THIS): hyperplane signatures (one numpy matmul), banded self-join
    on (band, band_val) for candidates — never an all-pairs cross join —
    then exact cosine on candidates only. Returns (vec_a, vec_b, cosine)
    with cosine >= threshold, vec_a < vec_b.

    Recall is the banding curve (a pair at angle θ collides in some band
    with prob 1-(1-(1-θ/π)^(n/B))^B); raise bands or n_planes for
    near-identical-duplicate workloads where θ ≈ 0 makes collision
    near-certain. Feed the output to
    :func:`searchengine_spark.pipeline.dedup.connected_components` for a
    keep/drop verdict, exactly like the text near-dup path."""
    assert n_planes % bands == 0
    band_bits = n_planes // bands
    mask = (1 << band_bits) - 1
    planes = hyperplanes(dim, n_planes, seed)
    signed = with_rp_signatures(vectors, planes, id_col, vec_col)
    # ID-ONLY banded self-join: the shuffle carries (id, band, band_val)
    # — three longs per row — never the embedding payload, which would
    # otherwise ride the exchange x bands on BOTH sides and again through
    # the pair dedup (~6x the bytes at 768-dim floats). Vectors are
    # re-attached AFTER dedup via two joins against the (id, vec) frame,
    # whose shuffle is one copy per vector per surviving pair side.
    banded = signed.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "sig",
    ).withColumn("band_val", F.expr(f"shiftright(sig, band * {band_bits}) & {mask}"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    vecs = vectors.select(id_col, vec_col)
    pairs = (
        pairs.join(vecs.withColumnRenamed(id_col, "vec_a"), "vec_a")
        .withColumnRenamed(vec_col, "_va")
        .join(vecs.withColumnRenamed(id_col, "vec_b"), "vec_b")
        .withColumnRenamed(vec_col, "_vb")
    )
    cos = F.coalesce(
        F.nanvl(
            F.try_divide(
                _dot(F.col("_va"), F.col("_vb")),
                _norm(F.col("_va")) * _norm(F.col("_vb")),
            ),
            F.lit(-2.0),
        ),
        F.lit(-2.0),
    )
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def ann_build_ivf(
    vectors: DataFrame,
    out_dir: str,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Materialize an IVF index: k-means assignment written partitioned
    by list_id (so a probe reads only n_probe directories — the same
    partition-prune story as postings' term_bucket), centroids to JSON."""
    assigned, centroids = ivf_build(
        vectors, n_lists=n_lists, id_col=id_col, vec_col=vec_col, seed=seed
    )
    (
        assigned.select(id_col, vec_col, "list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(os.path.join(out_dir, "vectors"))
    )
    with open(os.path.join(out_dir, "ann_meta.json"), "w") as f:
        json.dump(
            {"method": "ivf", "n_lists": n_lists, "seed": seed,
             "centroids": centroids},
            f,
        )
    return centroids


def ann_query_ivf(
    spark: SparkSession,
    out_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Partition-pruned IVF probe: exact cosine within the n_probe lists
    whose centroids are closest to the query."""
    with open(os.path.join(out_dir, "ann_meta.json")) as f:
        meta = json.load(f)
    df = spark.read.parquet(os.path.join(out_dir, "vectors"))
    return ivf_cosine_topk(
        df, meta["centroids"], query_vec, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
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
    prune ONLY when ``assigned`` is stored partitioned by list_id —
    which is what :func:`ann_build_ivf` does; prefer
    ann_build_ivf/ann_query_ivf over calling this on an unpartitioned
    frame (where the isin filter still scans everything)."""
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
