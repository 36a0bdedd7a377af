"""searchengine_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch Spark engine with the query and data-processing
capabilities of the reference MIRCV full-text search engine
(/root/reference, Java): SPIMI-style index construction becomes
shuffle-based aggregation, the k-way block merge becomes a groupBy,
fixed-width binary files become partitioned Parquet tables, and
DAAT / MaxScore / Conjunctive top-k become DataFrame plans plus a
vectorized block-max scorer.

Layout
------
- ``config``      — EngineConfig (the reference's persisted Flags)
- ``functions``   — text pipeline, Porter stemmer, scoring exprs, codecs
- ``sources``     — corpus loading / mapping to the canonical schema
- ``index``       — distributed index build (doc table, postings, lexicon)
- ``query``       — DAAT / Conjunctive / MaxScore top-k engines
- ``pipeline``    — training-data ops (dedup, quality, similarity, ...)
"""

__version__ = "0.1.0"
