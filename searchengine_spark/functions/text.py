"""Text preprocessing pipeline — the engine's single tokenization path,
applied identically to documents and queries (reference:
preprocessing/TextProcessor.java:22-36, called from
PartialIndexBuilder.java:56 and Query.java:88).

Sub-steps, in the reference's order (order is semantics-bearing):

  T1  URL removal            regexp_replace 'https?://\\S+\\s?' -> ' '   (TextProcessor.java:57)
  T2  lowercase                                                          (TextProcessor.java:60)
  T3  HTML tag strip         '<[^>]*>' -> ''                             (TextProcessor.java:63)
  T4  punctuation -> space   Java \\p{Punct}: the 32 ASCII punct chars   (TextProcessor.java:66)
  T5  non-ASCII -> space     '[^\\x00-\\x7F]' -> ' '                     (TextProcessor.java:39-52)
  T6  whitespace collapse + trim                                         (TextProcessor.java:72)
  T7  tokenize on single space                                           (TextProcessor.java:78-80)
  T8  stopword filter (428-word list), duplicates preserved              (TextProcessor.java:94-98)
  T9  Porter stemming, per token                                         (TextProcessor.java:83-91)
  T10 term truncation to 20 chars at index time                          (PartialIndexBuilder.java:69-71)

Everything except T9 is native Column expressions (JVM-side, whole-stage
codegen). T9 is an Arrow-batched pandas UDF over the token arrays with a
memoized per-token stem (no per-row Python in the hot loop beyond the
cached dict hit — vocabulary << token count).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import EngineConfig
from ..resources.stopwords import STOPWORDS
from .stemmer import stem

# Java \p{Punct} is exactly these 32 ASCII characters; spelled as explicit
# ranges so the same pattern is valid for Spark (Java regex), DuckDB (RE2)
# and Python re — the oracle SQL must match byte-for-byte.
PUNCT_CLASS = r"[!-/:-@\[-`{-~]"
URL_PATTERN = r"https?://\S+\s?"
HTML_PATTERN = r"<[^>]*>"
NON_ASCII_PATTERN = r"[^\x00-\x7F]"
# T4+T5 fused into ONE character class (punct ∪ everything >= U+0080) —
# both replace with a single space and the classes are disjoint, so one
# pass is output-identical to the two sequential passes. Measured 26%
# faster over the clean chain (a SINGLE class keeps the regex engine's
# fast char-class path; an `a|b` ALTERNATION of the two classes measured
# 2x SLOWER than the separate passes). Java and Python spellings differ
# only in the max-code-point escape.
PUNCT_NON_ASCII_JAVA = r"[!-/:-@\[-`{-~\x80-\x{10FFFF}]"
PUNCT_NON_ASCII_PY = "[!-/:-@\\[-`{-~\\x80-\U0010ffff]"


def clean_text(col: Column) -> Column:
    """T1-T6: normalize raw text to a single-space-separated ASCII string."""
    c = F.regexp_replace(col, URL_PATTERN, " ")
    c = F.lower(c)
    c = F.regexp_replace(c, HTML_PATTERN, "")
    c = F.regexp_replace(c, PUNCT_NON_ASCII_JAVA, " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def _stopword_filter(tokens: Column) -> Column:
    """T8, native variant — keep duplicates (array_except would dedup; the
    reference's List.removeAll removes all stopword occurrences but never
    dedups survivors). Used when stemming is off (the DuckDB-oracle
    configuration); the stemming path folds T8 into the stem UDF instead.

    Measured (r2): replacing the constant-array scan with a hash-set
    membership (isin -> InSet) is NOT faster here — the interpreted-HOF
    per-element overhead dominates both variants (0.115s vs 0.133s per
    20k docs), and either is noise next to the T1-T6 regex chain. Kept
    as the simpler expression."""
    sw = F.lit(sorted(STOPWORDS))
    return F.filter(tokens, lambda t: ~F.array_contains(sw, t))


def _make_stopstem_udf(drop_stopwords: bool):
    """Arrow-batched pandas UDF doing T8 (optional) + T9 in one pass.

    lru_cache on stem() makes stemming a dict hit for all but the first
    occurrence of each distinct token per executor — vocabulary is tiny
    relative to token count, so the batch loop is effectively a lookup.
    """
    sw = STOPWORDS if drop_stopwords else frozenset()

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _stopstem(batches: pd.Series) -> pd.Series:
        return batches.map(
            lambda toks: None
            if toks is None
            else [stem(t) for t in toks if t not in sw]
        )

    return _stopstem


def tokenize_raw(col: Column, config: Optional[EngineConfig] = None) -> Column:
    """T1-T8 as pure native Column expressions (JVM, whole-stage codegen):
    cleaned, split, stopword-filtered tokens — NOT stemmed.

    This is the scalable half of the pipeline: stemming (T9) is the only
    step needing Python, and the index builder applies it dictionary-style
    — stem only the DISTINCT vocabulary with the pandas UDF, then map
    token -> stem with a (broadcastable) join — so no Arrow string traffic
    scales with token count, only with vocabulary size."""
    config = config or EngineConfig()
    cleaned = clean_text(col)
    tokens = F.when(cleaned == "", F.array().cast("array<string>")).otherwise(
        F.split(cleaned, " ")
    )
    if config.apply_stopwords():
        tokens = _stopword_filter(tokens)
    return tokens


def stem_udf():
    """Arrow-batched pandas UDF stemming one term per row — intended for
    DISTINCT-vocabulary frames, never full token streams."""

    @F.pandas_udf(T.StringType())
    def _stem(terms: pd.Series) -> pd.Series:
        return terms.map(lambda t: None if t is None else stem(t))

    return _stem


def tokenize(col: Column, config: Optional[EngineConfig] = None) -> Column:
    """Full T1-T9 pipeline: raw text column -> array<string> of terms.

    Term truncation (T10) is NOT applied here — the reference truncates at
    index time, after doc_len is measured; use :func:`truncate_terms`.
    """
    config = config or EngineConfig()
    cleaned = clean_text(col)
    # split('') yields [''] — map empty string to empty array first
    tokens = F.when(cleaned == "", F.array().cast("array<string>")).otherwise(
        F.split(cleaned, " ")
    )
    if config.apply_stemming():
        tokens = _make_stopstem_udf(config.apply_stopwords())(tokens)
    elif config.apply_stopwords():
        tokens = _stopword_filter(tokens)
    return tokens


def truncate_terms(tokens: Column, config: Optional[EngineConfig] = None) -> Column:
    """T10: index-time truncation of each term to ``term_dim`` chars
    (PartialIndexBuilder.java:69-71, Constants.java:34)."""
    config = config or EngineConfig()
    return F.transform(tokens, lambda t: F.substring(t, 1, config.term_dim))


def tokenize_doc_py(text: str, config: Optional[EngineConfig] = None) -> list[str]:
    """Pure-Python mirror of :func:`tokenize` (T1-T9, duplicates kept, no
    truncation) — used by the driver-side query path and by the pytest
    brute-force oracle. Must agree with the Spark pipeline exactly; pinned
    by tests/test_text.py."""
    import re

    config = config or EngineConfig()
    c = re.sub(URL_PATTERN, " ", text)
    c = c.lower()
    c = re.sub(HTML_PATTERN, "", c)
    c = re.sub(PUNCT_NON_ASCII_PY, " ", c)
    c = re.sub(r"\s+", " ", c).strip()
    tokens = c.split(" ") if c else []
    if config.apply_stopwords():
        tokens = [t for t in tokens if t not in STOPWORDS]
    if config.apply_stemming():
        tokens = [stem(t) for t in tokens]
    return tokens


def tokenize_query_py(text: str, config: Optional[EngineConfig] = None) -> list[str]:
    """Query-string pipeline: T1-T9 + T10 truncation + T12 distinct terms
    in first-occurrence order (Query.java:88-89). Driver-side — no Spark
    job for single-query tokenization."""
    config = config or EngineConfig()
    seen: dict[str, None] = {}
    for t in tokenize_doc_py(text, config):
        seen.setdefault(t[: config.term_dim], None)
    return list(seen)
