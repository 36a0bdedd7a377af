"""Structured Streaming incremental indexing: micro-batch segments must
compact into an index equivalent to the batch build over the same rows
(streamed and batch paths share the lexicon/postings stage code, so
lexicon stats and query scores must agree exactly)."""

import shutil

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.sources.corpus import filter_malformed
from searchengine_spark.streaming.incremental import StreamingIndexer, stream_corpus

from .conftest import TEST_CONFIG


@pytest.fixture(scope="module")
def streamed_index(spark, corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    input_dir = str(root / "input")
    # several input files -> several micro-batches (maxFilesPerTrigger=2)
    corpus.repartition(6).write.parquet(input_dir)

    idx_dir = str(root / "stream_idx")
    shutil.rmtree(idx_dir, ignore_errors=True)
    indexer = StreamingIndexer(spark, idx_dir, TEST_CONFIG)
    q = indexer.start(stream_corpus(spark, input_dir, max_files_per_trigger=2))
    q.awaitTermination(300)
    manifest = indexer.compact()
    return idx_dir, indexer, manifest


def test_multiple_batches_ingested(streamed_index):
    _, indexer, _ = streamed_index
    state = indexer._load_state()
    assert len(state["batches"]) >= 2, "expected several micro-batches"
    for entry in state["batches"].values():
        assert entry["n_docs"] > 0
        assert entry["docs_per_sec"] > 0


def test_doc_ids_dense_and_unique(spark, streamed_index, corpus):
    idx_dir, indexer, _ = streamed_index
    doct = spark.read.parquet(f"{idx_dir}/compacted/doctable")
    n = doct.count()
    assert n == filter_malformed(corpus).count()
    ids = doct.agg(
        F.min("doc_id"), F.max("doc_id"), F.countDistinct("doc_id")
    ).collect()[0]
    assert ids[0] == 1 and ids[1] == n and ids[2] == n
    assert indexer._load_state()["high_water_doc_id"] == n


def test_compacted_matches_batch_lexicon(spark, streamed_index, index_dir):
    idx_dir, _, _ = streamed_index
    streamed = (
        spark.read.parquet(f"{idx_dir}/compacted/lexicon")
        .select("term", "df", "cf")
        .orderBy("term")
        .collect()
    )
    batch = (
        spark.read.parquet(f"{index_dir}/lexicon")
        .select("term", "df", "cf")
        .orderBy("term")
        .collect()
    )
    assert streamed == batch


def test_compacted_query_scores_match_batch(spark, streamed_index, index_dir):
    idx_dir, _, _ = streamed_index
    s_eng = SearchEngine(spark, f"{idx_dir}/compacted")
    b_eng = SearchEngine(spark, index_dir)
    for query in ["spark table join fast", "window agg customer stream"]:
        s = [round(r["score"], 9) for r in s_eng.search(query, k=10).collect()]
        b = [round(r["score"], 9) for r in b_eng.search(query, k=10).collect()]
        assert s == b, query


def test_batch_replay_is_idempotent(spark, streamed_index, corpus):
    """Re-processing an already-recorded batch (checkpoint-recovery
    replay) must reproduce the same doc_ids and not advance the
    high-water mark."""
    idx_dir, indexer, _ = streamed_index
    state_before = indexer._load_state()
    seg_before = (
        spark.read.parquet(f"{idx_dir}/doctable_segments/batch_id=0")
        .select("doc_id", "repo", "path", "commit")
        .orderBy("doc_id")
        .collect()
    )
    # reconstruct batch 0's exact input rows from its doctable slice —
    # REPARTITIONED differently than the original micro-batch, pinning
    # that two-phase doc_id assignment is parallelism-independent
    keys = spark.read.parquet(f"{idx_dir}/doctable_segments/batch_id=0").select(
        "repo", "path", "commit"
    )
    replay_input = corpus.join(keys, ["repo", "path", "commit"]).repartition(7)
    indexer.process_batch(replay_input, 0)

    state_after = indexer._load_state()
    assert state_after["high_water_doc_id"] == state_before["high_water_doc_id"]
    assert (
        state_after["batches"]["0"]["base_doc_id"]
        == state_before["batches"]["0"]["base_doc_id"]
    )
    seg_after = (
        spark.read.parquet(f"{idx_dir}/doctable_segments/batch_id=0")
        .select("doc_id", "repo", "path", "commit")
        .orderBy("doc_id")
        .collect()
    )
    assert seg_after == seg_before


def test_compact_latest_only_upserts_reingested_paths(spark, tmp_path):
    """A path re-ingested with new content (new commit) must supersede
    its old version under latest_only compaction: one doctable row per
    (repo, path), postings/df/stats reflecting only live versions."""
    rows_v1 = [
        ("r1", "a.py", "c1", "py", "alpha beta gamma"),
        ("r1", "b.py", "c2", "py", "delta epsilon"),
    ]
    rows_v2 = [("r1", "a.py", "c9", "py", "omega omega omega")]
    indexer = StreamingIndexer(spark, str(tmp_path / "ups_idx"), TEST_CONFIG)
    schema = "repo string, path string, commit string, lang string, content string"
    indexer.process_batch(spark.createDataFrame(rows_v1, schema), 0)
    indexer.process_batch(spark.createDataFrame(rows_v2, schema), 1)

    indexer.compact(str(tmp_path / "ups_all"), latest_only=False)
    indexer.compact(str(tmp_path / "ups_latest"), latest_only=True)

    all_doct = spark.read.parquet(str(tmp_path / "ups_all" / "doctable"))
    latest_doct = spark.read.parquet(str(tmp_path / "ups_latest" / "doctable"))
    assert all_doct.count() == 3
    assert latest_doct.count() == 2
    a_rows = latest_doct.filter(F.col("path") == "a.py").collect()
    assert len(a_rows) == 1 and a_rows[0]["commit"] == "c9"

    eng = SearchEngine(spark, str(tmp_path / "ups_latest"))
    # v1-only terms are gone from the live index; v2 terms searchable
    assert eng.search("alpha").count() == 0
    hits = eng.search("omega").collect()
    assert len(hits) == 1 and hits[0]["doc_id"] == a_rows[0]["doc_id"]
    # stats reflect survivors only (Q-1: n_docs = live docs + 1)
    assert eng.stats["n_docs"] == 3


def test_engine_refresh_after_inplace_compaction(spark, tmp_path):
    """A long-lived SearchEngine over an index dir that is re-compacted
    IN PLACE memoizes negative lexicon probes; refresh() must drop them
    so newly indexed terms become searchable (ADVICE r1 scenario)."""
    schema = "repo string, path string, commit string, lang string, content string"
    indexer = StreamingIndexer(spark, str(tmp_path / "rf_idx"), TEST_CONFIG)
    indexer.process_batch(
        spark.createDataFrame([("r1", "a.py", "c1", "py", "alpha beta")], schema), 0
    )
    out = str(tmp_path / "rf_compacted")
    indexer.compact(out)
    eng = SearchEngine(spark, out)
    assert eng.search("alpha").count() == 1
    # negative probe gets memoized
    assert eng.search("zeppelin").count() == 0

    indexer.process_batch(
        spark.createDataFrame(
            [("r1", "b.py", "c2", "py", "zeppelin zeppelin")], schema
        ),
        1,
    )
    indexer.compact(out)  # same dir, in place
    # stale caches: still absent without refresh
    assert eng.search("zeppelin").count() == 0
    eng.refresh()
    hits = eng.search("zeppelin").collect()
    assert len(hits) == 1
    assert eng.search("alpha").count() == 1


def test_compact_before_any_batch_raises(spark, tmp_path):
    indexer = StreamingIndexer(spark, str(tmp_path / "empty_idx"), TEST_CONFIG)
    with pytest.raises(RuntimeError, match="no segment directories"):
        indexer.compact()
