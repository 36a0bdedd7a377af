"""Corpus sources — load the canonical source-code table and assign
deterministic dense doc_ids.

Canonical input schema (BASELINE.json input_hint):
    (repo: string, path: string, commit: string, lang: string, content: string)

This plays the role of the reference's collection scan of ``docno \\t text``
TSV lines from collection.tar.gz (PartialIndexBuilder.java:34-53): ``docno``
becomes the natural key (repo, path, commit); blank / malformed lines become
the null/empty-content filter (PartialIndexBuilder.java:51-53).

doc_id assignment
-----------------
The reference assigns dense sequential ints in input order via a
single-threaded counter (PartialIndexBuilder.java:31, 83). The distributed
equivalent is a dense rank over the natural key's total order. Two
implementations:

* ``assign_doc_ids(two_phase=False)`` — one global window. Simple, but a
  single-task sort: fine at test scale, a bottleneck at 1e12 rows.
* ``assign_doc_ids(two_phase=True)`` (default) — range-repartition by the
  key, sort within partitions, count rows per partition (tiny collect),
  and add the exclusive-prefix-sum offset to the within-partition
  row_number. Because the key order is total and unique, the resulting
  ids are identical regardless of partition boundaries or parallelism —
  which is what makes top-k results rank-identical between the N and 4N
  runs of the scaling protocol.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

NATURAL_KEY = ["repo", "path", "commit"]


def load_documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's documents.parquet (doc_id, text, lang, source,
    n_chars) onto the canonical corpus schema. Deterministic: commit is a
    content hash prefix, path zero-pads the original id so lexicographic
    order == numeric order."""
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.lpad(F.col("doc_id").cast("string"), 12, "0")).alias(
            "path"
        ),
        F.substring(F.sha2(F.col("text").cast("binary"), 256), 1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def load_table_corpus(spark: SparkSession, table: str) -> DataFrame:
    """Catalog-table source for the canonical corpus — `spark.read.table`
    resolves through whatever catalog the session is configured with
    (an Iceberg catalog on a real cluster per BASELINE.json input_hint;
    this sandbox ships no Iceberg runtime, so tests exercise the path
    via a temp view — the projection and downstream pipeline are
    identical either way). Catalyst pushes the malformed-row filter and
    the 5-column projection into the table scan, and Iceberg partition
    pruning/metadata filtering compose with it for free."""
    t = spark.read.table(table)
    return t.select("repo", "path", "commit", "lang", "content")


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def load_jsonl_corpus(spark: SparkSession, path: str) -> DataFrame:
    """JSONL source (one object per line — the common web-scale text-dump
    format): reads only the five canonical fields with an EXPLICIT schema
    (never schema inference, which would scan the data twice at 100 TB);
    extra fields are ignored by the reader, missing ones surface as
    nulls for filter_malformed to drop."""
    return spark.read.schema(CORPUS_SCHEMA).json(path)


def load_csv_corpus(
    spark: SparkSession, path: str, sep: str = "\t", header: bool = True
) -> DataFrame:
    """Delimited-text source (TSV by default — the reference's own input
    framing, PartialIndexBuilder.java:46). Explicit schema, multiline
    off: each row must be one physical line, malformed rows become nulls
    (PERMISSIVE) and are dropped by filter_malformed — the reference
    skips lines without a tab the same way."""
    return (
        spark.read.schema(CORPUS_SCHEMA)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def filter_malformed(corpus: DataFrame) -> DataFrame:
    """Drop null/empty-content rows — the reference skips blank lines and
    lines without a tab (PartialIndexBuilder.java:51-53)."""
    return corpus.filter(
        F.col("content").isNotNull() & (F.length(F.col("content")) > 0)
    )


def with_sha256(corpus: DataFrame) -> DataFrame:
    """Per-row invariant vs the source table (north_rule): sha256 of the
    raw content, carried through the build and checked by pytest."""
    return corpus.withColumn("sha256", F.sha2(F.col("content").cast("binary"), 256))


def assign_doc_ids(
    corpus: DataFrame,
    two_phase: bool = True,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Dense deterministic doc_id (1-based, like the reference's counter
    which starts at 1 — PartialIndexBuilder.java:31) ordered by the natural
    key. See module docstring for the two implementations."""
    key = [F.col(c) for c in NATURAL_KEY]

    if not two_phase:
        w = Window.orderBy(*key)
        return corpus.withColumn("doc_id", F.row_number().over(w).cast("long"))

    # Two-phase with FROZEN range boundaries. repartitionByRange is NOT
    # usable here: its boundaries come from reservoir sampling re-executed
    # per action, so the counts job and the assignment job can see
    # different partitionings — and different parallelism levels certainly
    # do — silently corrupting the offsets (observed as rank-identity
    # failures between local[8] and local[32]). Instead:
    #   1. take a DETERMINISTIC sample of the sort key (hash-mod filter,
    #      no RNG), collect it, derive n-1 boundary keys on the driver;
    #   2. range_id = #boundaries <= key — a pure function of the key, so
    #      every job agrees on the partitioning forever;
    #   3. count rows per range (tiny collect), prefix-sum offsets,
    #      doc_id = within-range row_number + offset[range].
    # Scale: the sample collect is ~(rows / 512) keys capped by taking
    # every k-th after sorting; the per-row cost is one O(n_ranges)
    # vectorized array filter (n_ranges = shuffle partitions).
    spark = corpus.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    skey = F.concat_ws("\x00", *key)
    # Cap the driver-side boundary sample: pick the hash modulus so the
    # EXPECTED sample is ~64 keys per range (bounded regardless of corpus
    # size — at 1e12 rows the modulus grows instead of the sample). Costs
    # one column-pruned count; the builder calls this on a cached frame.
    n_rows = corpus.count()
    target = max(2 * n, min(100_000, 64 * n))
    mod = max(1, n_rows // target)
    sampled = sorted(
        r["k"]
        for r in corpus.select(skey.alias("k"))
        .filter(F.pmod(F.xxhash64(skey), F.lit(mod)) == 0)
        .collect()
    )
    if len(sampled) >= 2 * n:
        step = len(sampled) / n
        boundaries = [sampled[int(i * step)] for i in range(1, n)]
    else:
        boundaries = []

    if boundaries:
        b_arr = F.array(*[F.lit(b) for b in boundaries])
        rid = F.size(F.filter(b_arr, lambda b: b <= skey))
    else:
        rid = F.lit(0)
    with_rid = corpus.withColumn("_rid", rid)
    counts = {
        r["_rid"]: r["cnt"]
        for r in with_rid.groupBy("_rid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for r in sorted(counts):
        offsets[r] = acc
        acc += counts[r]
    if offsets:
        offset_expr = F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for r in sorted(offsets) for x in (r, offsets[r])]
                ),
                F.col("_rid"),
            ),
            F.lit(0),
        )
    else:  # empty corpus
        offset_expr = F.lit(0)
    w = Window.partitionBy("_rid").orderBy(*key)
    return with_rid.withColumn(
        "doc_id", (F.row_number().over(w) + offset_expr).cast("long")
    ).drop("_rid")
