"""Text-analysis operators vs hand-computed / pure-Python references."""

import math
import re

import pytest
from pyspark.sql import functions as F

from searchengine_spark.pipeline import textstats as TS

DOCS = [
    (1, "The quick brown fox, and the lazy dog!"),
    (2, "x = foo(bar, 42) + baz[7]; // trailing comment"),
    (3, "   "),  # whitespace-only
    (4, "word"),
    (5, "the of and to in is was for on are"),  # pure EN markers
    (6, "supercalifragilisticexpialidocious antidisestablishmentarianism"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, content string").persist()


def test_token_stats(docs):
    rows = {r["doc_id"]: r for r in TS.with_token_stats(docs).collect()}
    assert rows[1]["n_tokens"] == 8
    assert rows[3]["n_tokens"] == 0 and rows[3]["mean_token_len"] == 0.0
    assert rows[4]["n_tokens"] == 1 and rows[4]["mean_token_len"] == 4.0


def test_lang_id(docs):
    rows = {r["doc_id"]: r for r in TS.with_lang_id(docs).collect()}
    assert rows[5]["lang_pred"] == "en" and rows[5]["en_ratio"] == 1.0
    assert rows[6]["lang_pred"] == "other"


def test_quality_bounds(docs):
    for r in TS.with_quality_score(docs).collect():
        assert 0.0 <= r["quality"] <= 1.0


def test_fingerprint_normalization(spark):
    pairs = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different")],
        "doc_id long, content string",
    )
    rows = {r["doc_id"]: r["fingerprint"]
            for r in TS.with_fingerprint(pairs).collect()}
    assert rows[1] == rows[2] != rows[3]


def _bpe_ref(text: str) -> tuple[int, int]:
    pieces = re.findall(TS.BPE_SPLIT_PATTERN, text.lower())
    return len(pieces), sum(math.ceil(len(p) / TS.BPE_CHARS_PER_TOKEN)
                            for p in pieces)


def test_chunk_documents_windows(spark):
    words = [f"w{i}" for i in range(25)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "short doc"), (3, "   ")],
        "doc_id long, content string",
    )
    rows = TS.chunk_documents(docs, max_tokens=10, overlap=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 25 tokens, window 10, stride 7 -> chunks at 0,7,14,21 (last short)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["n_chunk_tokens"] for r in c1] == [10, 10, 10, 4]
    assert c1[0]["chunk_text"].split(" ") == words[0:10]
    assert c1[1]["chunk_text"].split(" ") == words[7:17]
    assert c1[3]["chunk_text"].split(" ") == words[21:25]
    # overlap: last 3 tokens of chunk i == first 3 of chunk i+1
    assert c1[0]["chunk_text"].split(" ")[-3:] == c1[1]["chunk_text"].split(" ")[:3]
    # short doc -> one chunk; blank doc -> one empty chunk
    assert [(r["chunk_id"], r["n_chunk_tokens"]) for r in by_doc[2]] == [(0, 2)]
    assert [(r["chunk_id"], r["n_chunk_tokens"]) for r in by_doc[3]] == [(0, 0)]
    with pytest.raises(ValueError, match="overlap"):
        TS.chunk_documents(docs, max_tokens=10, overlap=10)


def test_bpe_token_estimate_matches_python(docs):
    rows = {r["doc_id"]: (r["n_pieces"], r["est_bpe_tokens"])
            for r in TS.with_bpe_token_estimate(docs).collect()}
    for doc_id, text in DOCS:
        assert rows[doc_id] == _bpe_ref(text), (doc_id, text)
    # long words split into ~4-char subwords: 34-char word -> 9 tokens
    assert rows[6] == (2, math.ceil(34 / 4) + math.ceil(28 / 4))
    # whitespace-only -> zero
    assert rows[3] == (0, 0)
