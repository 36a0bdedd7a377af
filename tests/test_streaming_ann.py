"""Streaming ANN segments (round 4): per-micro-batch (band, band_val)
signature segments + latest-wins compaction. The headline pin: a
streamed-then-compacted store probes IDENTICALLY (same rows, same
hash) to a batch-built store over the same vectors."""

import hashlib

import pytest
from pyspark.sql import functions as F

from searchengine_spark.pipeline.similarity import ann_build_lsh, ann_query_lsh
from searchengine_spark.streaming.ann import StreamingAnnIndexer

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") != 0
    ).select("vec_id", "embedding")


@pytest.fixture(scope="module")
def query_vec(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]


def _hash(rows) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update(f"{r['vec_id']}|{round(r['cosine'], 6)}\n".encode())
    return h.hexdigest()


def _chunks(vectors, n=3):
    return [vectors.filter(F.col("vec_id") % n == i) for i in range(n)]


def test_streamed_store_probe_identical_to_batch_store(
    spark, vectors, query_vec, tmp_path_factory
):
    batch_dir = str(tmp_path_factory.mktemp("ann") / "batch")
    ann_build_lsh(vectors, batch_dir, dim=DIM)
    want = ann_query_lsh(spark, batch_dir, query_vec, k=10).collect()
    assert len(want) > 0

    stream_dir = str(tmp_path_factory.mktemp("ann") / "stream")
    idx = StreamingAnnIndexer(spark, stream_dir, dim=DIM)
    for i, chunk in enumerate(_chunks(vectors)):
        idx.process_batch(chunk, i)

    # BEFORE compaction: probe over segments only
    pre = idx.query(query_vec, k=10).collect()
    assert _hash(pre) == _hash(want)

    assert idx.compact() == 3
    post = idx.query(query_vec, k=10).collect()
    assert _hash(post) == _hash(want)

    # the compacted store has the batch layout: the BATCH probe function
    # reads it directly
    direct = ann_query_lsh(spark, stream_dir, query_vec, k=10).collect()
    assert _hash(direct) == _hash(want)


def test_replay_is_idempotent(spark, vectors, query_vec, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann") / "replay")
    idx = StreamingAnnIndexer(spark, d, dim=DIM)
    chunks = _chunks(vectors)
    idx.process_batch(chunks[0], 0)
    idx.process_batch(chunks[1], 1)
    before = idx.query(query_vec, k=10).collect()
    # checkpoint-recovery replay of batch 1
    idx.process_batch(chunks[1], 1)
    after = idx.query(query_vec, k=10).collect()
    assert _hash(before) == _hash(after)
    assert idx._load_state()["pending_batches"] == [0, 1]


def test_reingest_latest_wins(spark, vectors, query_vec, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann") / "upsert")
    idx = StreamingAnnIndexer(spark, d, dim=DIM)
    idx.process_batch(vectors, 0)
    top = idx.query(query_vec, k=1).collect()[0]
    # re-ingest the current top hit with the QUERY vector itself — it
    # must move to cosine 1.0
    moved = vectors.filter(F.col("vec_id") == top["vec_id"]).select(
        "vec_id", F.lit([float(x) for x in query_vec]).alias("embedding")
    )
    idx.process_batch(moved, 1)
    new_top = idx.query(query_vec, k=1).collect()[0]
    assert new_top["vec_id"] == top["vec_id"]
    assert new_top["cosine"] == pytest.approx(1.0, abs=1e-6)
    # ...and survives compaction
    idx.compact()
    again = idx.query(query_vec, k=1).collect()[0]
    assert again["vec_id"] == top["vec_id"]
    assert again["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_incremental_batches_after_compaction(
    spark, vectors, query_vec, tmp_path_factory
):
    """Segments arriving AFTER a compaction merge with the compacted
    store (batch_id -1 loses to any segment)."""
    d = str(tmp_path_factory.mktemp("ann") / "incr")
    idx = StreamingAnnIndexer(spark, d, dim=DIM)
    chunks = _chunks(vectors)
    idx.process_batch(chunks[0], 0)
    idx.compact()
    idx.process_batch(chunks[1], 1)
    idx.process_batch(chunks[2], 2)
    got = idx.query(query_vec, k=10).collect()

    full_dir = str(tmp_path_factory.mktemp("ann") / "full")
    ann_build_lsh(vectors, full_dir, dim=DIM)
    want = ann_query_lsh(spark, full_dir, query_vec, k=10).collect()
    assert _hash(got) == _hash(want)
