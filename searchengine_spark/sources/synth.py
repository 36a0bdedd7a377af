"""Deterministic synthetic corpora — Zipfian text at any scale, no RNG.

The driver's ``documents.parquet`` has a 24-term uniform vocabulary
(every term's df ~= 77% of docs) — useful for correctness oracles,
useless for demonstrating selectivity-dependent behavior: MaxScore
pruning (MaxScore.java:41-96), skew salting, and caching all hinge on a
Zipfian term distribution, which every real corpus has (MS MARCO, the
reference's dataset, included). This module synthesizes one
deterministically, fully distributed:

* ``spark.range(n_docs)`` partitions the id space — no driver data.
* Token draws are counter-based hashes (splitmix64 of (seed, doc_id,
  position)) mapped through the Zipf(s) inverse CDF — no RNG state, so
  any row is reproducible in isolation: the same (doc_id, seed) yields
  the same document on any partitioning, any parallelism, any retry
  (the determinism contract the scaling protocol's rank-identity check
  relies on).
* The per-batch work is pure numpy (vectorized searchsorted over the
  cumulative weights); the CDF for (vocab_size, s) is memoized per
  worker process.

Output schema == the canonical corpus (BASELINE.json input_hint):
(repo, path, commit, lang, content), lexicographic path order == doc
order, commit = content-hash prefix like sources/corpus.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

_cdf_cache: dict = {}


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based 64-bit mixer (public splitmix64 constants): uniform
    uint64 from any uint64 counter, vectorized."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> np.uint64(31))


def _zipf_cdf(vocab_size: int, s: float) -> np.ndarray:
    key = (vocab_size, round(s, 6))
    if key not in _cdf_cache:
        w = 1.0 / np.power(np.arange(1, vocab_size + 1, dtype=np.float64), s)
        _cdf_cache[key] = np.cumsum(w) / w.sum()
    return _cdf_cache[key]


def zipf_corpus(
    spark: SparkSession,
    n_docs: int,
    vocab_size: int = 50_000,
    avg_tokens: int = 120,
    s: float = 1.07,
    seed: int = 7,
    num_partitions: int | None = None,
) -> DataFrame:
    """Corpus of ``n_docs`` documents over a ``vocab_size``-term Zipf(s)
    vocabulary; token i of doc d is term ``t<rank>`` where rank is the
    inverse-CDF image of hash(seed, d, i). Doc length varies in
    [avg_tokens/2, 3*avg_tokens/2) — hash-derived, so avgdl is stable.

    Terms survive the index pipeline unchanged: lowercase alnum, no
    stopword hits, Porter-stable, < 20 chars."""
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    lo = max(1, avg_tokens // 2)
    span = max(1, 2 * avg_tokens - 2 * lo)

    def gen(batches):
        cdf = _zipf_cdf(vocab_size, s)
        terms = np.array([f"t{r}" for r in range(1, vocab_size + 1)])
        sd = np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            if len(ids) == 0:
                continue
            lens = (
                lo
                + (
                    _splitmix64((ids * np.uint64(0x2545F4914F6CDD1D)) ^ sd)
                    % np.uint64(span)
                ).astype(np.int64)
            )
            total = int(lens.sum())
            # counter = doc_id * 2^20 + position (docs < 2^44, pos < 2^20)
            doc_rep = np.repeat(ids, lens)
            pos = np.arange(total, dtype=np.uint64) - np.repeat(
                np.cumsum(lens) - lens, lens
            ).astype(np.uint64)
            u = _splitmix64((doc_rep << np.uint64(20)) ^ pos ^ sd)
            ranks = np.searchsorted(
                cdf, u.astype(np.float64) / 2**64, side="right"
            )
            toks = terms[np.minimum(ranks, vocab_size - 1)]
            bounds = np.cumsum(lens)
            content = [
                " ".join(toks[a:b])
                for a, b in zip(bounds - lens, bounds)
            ]
            yield pd.DataFrame({"doc": ids.astype(np.int64), "content": content})

    docs = (
        spark.range(1, n_docs + 1, 1, n_parts)
        .mapInPandas(gen, "doc long, content string")
    )
    return docs.select(
        F.lit("zipf").alias("repo"),
        F.concat(F.lit("doc/"), F.lpad(F.col("doc").cast("string"), 12, "0")).alias(
            "path"
        ),
        F.substring(F.sha2(F.col("content").cast("binary"), 256), 1, 40).alias(
            "commit"
        ),
        F.lit("txt").alias("lang"),
        "content",
    )


def mixed_selectivity_queries(
    lexicon_rows: list[tuple[str, int]], n_queries: int = 16
) -> list[str]:
    """Deterministic mixed-df query set from a (term, df) list — the
    TREC-query shape (a few discriminative terms + a few frequent ones)
    that selectivity-sensitive algorithms are measured on. Takes terms
    at fixed df-rank fractions: each query = 1 rare + 1 mid + 2 common,
    rotating through the rank space so no two queries share a rare term."""
    ranked = [t for t, _ in sorted(lexicon_rows, key=lambda r: (-r[1], r[0]))]
    n = len(ranked)
    if n < 8:
        raise ValueError("lexicon too small for a mixed-selectivity set")
    out = []
    for i in range(n_queries):
        common_a = ranked[i % max(1, n // 100)]
        common_b = ranked[(2 * i + 1) % max(1, n // 50)]
        mid = ranked[n // 4 + (i * 37) % max(1, n // 8)]
        rare = ranked[(3 * n) // 4 + (i * 101) % max(1, n // 8)]
        out.append(f"{rare} {mid} {common_a} {common_b}")
    return out
