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


def test_bpe_token_estimate_matches_python(docs):
    rows = {r["doc_id"]: (r["n_pieces"], r["est_bpe_tokens"])
            for r in TS.with_bpe_token_estimate(docs).collect()}
    for doc_id, text in DOCS:
        assert rows[doc_id] == _bpe_ref(text), (doc_id, text)
    # long words split into ~4-char subwords: 34-char word -> 9 tokens
    assert rows[6] == (2, math.ceil(34 / 4) + math.ceil(28 / 4))
    # whitespace-only -> zero
    assert rows[3] == (0, 0)
