"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting. Pure Column
expressions — every formula is reproducible in ANSI SQL for the DuckDB
correctness oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import PUNCT_CLASS, clean_text
from ..resources.stopwords import STOPWORDS

# 40 high-frequency English function words used by the language-ID
# heuristic (a tiny, fixed marker set — NOT the stopword list, which is
# engine config; this one is part of the operator's definition).
EN_MARKERS = (
    "the of and to in is was for on are as with his they at be this have "
    "from or had by but not what all were when we there can an your which "
    "their said if do"
).split()


def whitespace_token_count(content=None):
    """Raw whitespace token count (pre-pipeline), 0 for blank docs."""
    content = F.col("content") if content is None else content
    trimmed = F.trim(F.regexp_replace(content, r"\s+", " "))
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, " "))
    ).cast("long")


def with_token_stats(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Add n_tokens (whitespace), n_chars, mean_token_len."""
    c = F.col(content_col)
    n_tokens = whitespace_token_count(c)
    return docs.withColumn("n_tokens", n_tokens).withColumn(
        "n_chars", F.length(c).cast("long")
    ).withColumn(
        "mean_token_len",
        F.when(F.col("n_tokens") > 0,
               F.round(F.length(F.regexp_replace(c, r"\s+", "")) / F.col("n_tokens"), 6)
               ).otherwise(F.lit(0.0)),
    )


# BPE-ish pre-tokenization split over lowercased text: letter runs,
# digit runs, punctuation/symbol runs (whitespace separates, never
# counts). Alternatives use DISJOINT char classes so leftmost-first
# (Java regex) and leftmost-longest (RE2/DuckDB) semantics agree — the
# oracle depends on that.
BPE_SPLIT_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"
# ~4 chars/token for word pieces is the standard BPE rule-of-thumb;
# digit/punct runs count 1 token per run member class below
BPE_CHARS_PER_TOKEN = 4


def with_bpe_token_estimate(
    docs: DataFrame, content_col: str = "content"
) -> DataFrame:
    """BPE-ish token counting (the LLM-budget estimator, vs the plain
    whitespace count of with_token_stats):

      n_pieces     — matches of BPE_SPLIT_PATTERN over lower(content)
                     (word runs, number runs, punct runs)
      est_bpe_tokens — sum over pieces of ceil(len(piece)/4): long words
                     split into ~4-char subwords like a real BPE would;
                     short pieces count 1.

    Pure Column expressions (regexp_extract_all + aggregate), exactly
    reproducible in DuckDB for the oracle."""
    c = F.lower(F.col(content_col))
    pieces = F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), 0)
    est = F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.ceil(F.length(p) / F.lit(float(BPE_CHARS_PER_TOKEN))).cast("long"),
    )
    return docs.withColumn(
        "n_pieces", F.size(pieces).cast("long")
    ).withColumn("est_bpe_tokens", est)


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 256,
    overlap: int = 32,
    content_col: str = "content",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard LLM-pretraining prep step. One row per chunk:
    (doc_id, chunk_id, n_chunk_tokens, chunk_text).

    Whitespace tokens (pre-pipeline: chunking must preserve the raw
    text, not the search-normalized form); window i covers tokens
    [i*stride, i*stride + max_tokens) with stride = max_tokens - overlap;
    the last window is short rather than padded; a doc shorter than
    max_tokens is one chunk. Pure Column expressions — sequence +
    slice + posexplode, no shuffle, no Python."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    c = F.col(content_col)
    trimmed = F.trim(F.regexp_replace(c, r"\s+", " "))
    toks = F.when(
        trimmed == "", F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, " "))
    n = F.size(toks)
    # number of windows: 1 + ceil((n - max_tokens) / stride) for n > max
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.lit(1)
        + F.ceil((n - F.lit(max_tokens)) / F.lit(float(stride))).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, max_tokens),
    )
    return (
        docs.select(
            "doc_id", F.posexplode(chunks).alias("chunk_id", "chunk_toks")
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("chunk_toks").cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", "chunk_toks").alias("chunk_text"),
        )
    )


def with_quality_score(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Heuristic quality score in [0,1] from length, punctuation density
    and stopword ratio — the standard web-corpus filtering trio:

      len_score   = least(n_tokens/50, 1)           (too-short penalty)
      punct_ratio = punct_chars / n_chars
      sw_ratio    = stopword_tokens / tokens        (natural prose has some)
      quality     = round(0.4*len_score + 0.3*(1 - least(punct_ratio*4, 1))
                          + 0.3*least(sw_ratio*4, 1), 6)
    """
    c = F.col(content_col)
    n_tokens = whitespace_token_count(c)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    toks = F.split(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), " ")
    n_sw = F.size(
        F.filter(toks, lambda t: F.array_contains(F.lit(sorted(STOPWORDS)), t))
    )
    len_score = F.least(n_tokens / F.lit(50.0), F.lit(1.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tokens > 0, n_sw / n_tokens).otherwise(F.lit(0.0))
    return docs.withColumn(
        "quality",
        F.round(
            F.lit(0.4) * len_score
            + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
            + F.lit(0.3) * F.least(sw_ratio * 4, F.lit(1.0)),
            6,
        ),
    )


def with_lang_id(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """n-gram-free language-ID heuristic: fraction of lowercase whitespace
    tokens that are high-frequency English function words; >= 0.1 -> 'en',
    else 'other'. (Real pipelines plug a fastText model in via the same
    column contract; the heuristic keeps the operator SQL-checkable.)"""
    c = F.col(content_col)
    toks = F.split(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), " ")
    n = F.size(toks)
    n_en = F.size(F.filter(toks, lambda t: F.array_contains(F.lit(EN_MARKERS), t)))
    ratio = F.when(n > 0, n_en / n).otherwise(F.lit(0.0))
    return docs.withColumn("en_ratio", F.round(ratio, 6)).withColumn(
        "lang_pred", F.when(ratio >= 0.1, F.lit("en")).otherwise(F.lit("other"))
    )


def with_fingerprint(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Normalized-content fingerprint: sha256 of the cleaned (T1-T6) text —
    whitespace/punctuation/case-insensitive duplicate detector."""
    return docs.withColumn(
        "fingerprint", F.sha2(clean_text(F.col(content_col)).cast("binary"), 256)
    )
