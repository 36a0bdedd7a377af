"""Heavy-term skew: a token present in EVERY document (the 'def'/'import'
of a code corpus) must (a) never materialize as one giant posting row —
range-mode blocks split it into doc_id-disjoint groups processed by
independent tasks — and (b) score correctly. This is the north_rule's
'salted repartitioning of heavy terms' behavior: the two-phase hash
aggregation plus per-block rows bound any single task's share of a hot
term to one block, regardless of df."""

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.config import EngineConfig
from searchengine_spark.index.builder import build_index
from searchengine_spark.query.engine import SearchEngine

HOT = "hottoken"
N_DOCS = 400


@pytest.fixture(scope="module")
def skew_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("skew") / "idx")
    rows = [
        (
            "r",
            f"doc/{i:06d}",
            f"c{i:06d}",
            "txt",
            # hot token in every doc (i+1 times in doc i), one rare token
            " ".join([HOT] * (i % 3 + 1)) + f" rare{i:03d}",
        )
        for i in range(N_DOCS)
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    cfg = EngineConfig(stopstem=False, skip_threshold=64, shuffle_partitions=8)
    build_index(spark, corpus, d, cfg, resume=False)
    return d


def test_hot_term_split_into_blocks(spark, skew_index):
    blocks = (
        spark.read.parquet(f"{skew_index}/postings")
        .filter(F.col("term") == HOT)
        .select("block_id", "n_postings", "max_doc_id")
        .collect()
    )
    assert len(blocks) > 1, "hot term must span multiple block rows"
    # blocks are doc_id-disjoint and jointly complete
    assert sum(b["n_postings"] for b in blocks) == N_DOCS
    # no block holds the whole list (bounded task memory)
    assert max(b["n_postings"] for b in blocks) < N_DOCS
    lex = (
        spark.read.parquet(f"{skew_index}/lexicon")
        .filter(F.col("term") == HOT)
        .collect()[0]
    )
    assert lex["df"] == N_DOCS
    assert lex["n_blocks"] >= math.floor(math.sqrt(N_DOCS) / 2)


def test_hot_term_query_correct(spark, skew_index):
    eng = SearchEngine(spark, skew_index)
    rows = eng.search(HOT, k=10).collect()
    assert len(rows) == 10
    # BM25 with this corpus: tf in {1,2,3}; doc_len = tf + 1. Higher tf
    # wins (monotone per Q-4 formula); tie-break ascending doc_id.
    # docs with i % 3 == 2 have tf=3 -> best; smallest such doc_id is 3
    # (doc ids are 1-based in corpus order: doc i has doc_id i+1).
    top = rows[0]
    assert top["doc_id"] == 3
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rare_term_unaffected_by_skew(spark, skew_index):
    eng = SearchEngine(spark, skew_index)
    rows = eng.search("rare123", k=10).collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 124  # doc i=123 -> doc_id 124
