"""Text pipeline fixtures (T1-T12) and Spark-vs-Python agreement."""

import pandas as pd
from pyspark.sql import functions as F

from searchengine_spark.config import EngineConfig
from searchengine_spark.functions.text import (
    tokenize,
    tokenize_doc_py,
    tokenize_query_py,
    truncate_terms,
)
from searchengine_spark.resources.stopwords import STOPWORDS

NO_STEM = EngineConfig(stopstem=False)
SW_ONLY = EngineConfig(stopstem=False, stopwords_only=True)
FULL = EngineConfig(stopstem=True)

FIXTURES = [
    # (raw, expected tokens with stopwords+stemming)
    ("Hello World", ["hello", "world"]),
    ("visit https://example.com/x?q=1 now", ["visit"]),  # 'now' is a stopword
    ("<b>Bold</b> and <a href='x'>link</a>", ["bold", "link"]),
    # single letters are stopwords (the 429-word list includes a-z)
    ("foo.bar(baz_qux); x=1", ["foo", "bar", "baz", "qux", "1"]),
    ("café naïve 中文", ["caf", "na", "ve"]),
    ("  lots   of\t\twhitespace \n", ["lot", "whitespac"]),
    ("", []),
    ("the and of", []),  # pure stopwords
    ("Running runners ran", ["run", "runner", "ran"]),
]


def test_python_pipeline_fixtures():
    for raw, expected in FIXTURES:
        assert tokenize_doc_py(raw, FULL) == expected, raw


def test_stopwords_not_deduping():
    # removeAll semantics: survivors keep duplicates (TextProcessor.java:94-98)
    assert tokenize_doc_py("spark spark the spark", SW_ONLY) == [
        "spark",
        "spark",
        "spark",
    ]


def test_query_distinct_first_occurrence():
    # T12: distinct, first-occurrence order (Query.java:89)
    assert tokenize_query_py("spark table spark join table", NO_STEM) == [
        "spark",
        "table",
        "join",
    ]


def test_spark_matches_python(spark):
    raws = [r for r, _ in FIXTURES] + [
        "MiXeD CaSe TEXT", "a.b,c;d:e!f?g", "x" * 50,
        "http://a.b c https://d.e/f g",
        # astral-plane chars: Java regex sees surrogate pairs, Python a
        # single code point — the fused T4+T5 class must agree anyway
        # (both collapse to spaces before tokenize)
        "emoji \U0001F600 mid\U0001F680dle end\U0001F4A9",
    ]
    for cfg in (NO_STEM, SW_ONLY, FULL):
        df = spark.createDataFrame(pd.DataFrame({"content": raws}))
        got = [
            r["toks"]
            for r in df.select(
                tokenize(F.col("content"), cfg).alias("toks")
            ).collect()
        ]
        want = [tokenize_doc_py(r, cfg) for r in raws]
        assert got == want, cfg


def test_truncation(spark):
    df = spark.createDataFrame(pd.DataFrame({"content": ["x" * 50 + " yy"]}))
    row = df.select(
        truncate_terms(tokenize(F.col("content"), NO_STEM), NO_STEM).alias("t")
    ).collect()[0]
    assert row["t"] == ["x" * 20, "yy"]


def test_stopword_list_shape():
    # 429 lines in the reference's stopwords.txt, 423 distinct (the file
    # has duplicate lines; set semantics match the reference's removeAll)
    assert len(STOPWORDS) == 423
    assert "the" in STOPWORDS and "spark" not in STOPWORDS
    assert all(c in STOPWORDS for c in "abcdefghijklmnopqrstuvwxyz")
