"""Brute-force pure-pandas retrieval oracle — independent of the Spark
engine. Applies the exact reference formulas (FIXTURES.md §5):

  BM25  = tf / (k1*((1-b) + b*dl/avgdl) + tf) * idf     (Score.java:24-29, no (k1+1))
  TFIDF = (1 + log10(tf)) * idf                          (Score.java:19-22)
  idf   = log10(nDocs / df), nDocs = true count + 1      (Q-1)
  ties: score desc, doc_id asc                           (ResultBlock.java:41-52)
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from searchengine_spark.config import EngineConfig
from searchengine_spark.functions.text import tokenize_doc_py, tokenize_query_py


class BruteForceOracle:
    def __init__(self, docs: pd.DataFrame, config: EngineConfig):
        """docs: (doc_id, content) with the engine's doc_id assignment."""
        self.config = config
        self.tf: dict[str, dict[int, int]] = {}
        self.doc_len: dict[int, int] = {}
        for doc_id, content in zip(docs["doc_id"], docs["content"]):
            toks = [
                t[: config.term_dim] for t in tokenize_doc_py(content, config)
            ]
            self.doc_len[int(doc_id)] = len(toks)
            for t, n in Counter(toks).items():
                self.tf.setdefault(t, {})[int(doc_id)] = n
        self.n_docs = len(self.doc_len) + 1  # Q-1
        self.avgdl = sum(self.doc_len.values()) / self.n_docs

    def idf(self, term: str) -> float:
        return math.log10(self.n_docs / len(self.tf[term]))

    def score(self, term: str, doc_id: int, scorer: str) -> float:
        tf = self.tf[term][doc_id]
        if scorer == "bm25":
            cfg = self.config
            dl = self.doc_len[doc_id]
            partial = tf / (cfg.k1 * ((1 - cfg.b) + cfg.b * dl / self.avgdl) + tf)
        else:
            partial = 1.0 + math.log10(tf)
        return partial * self.idf(term)

    def search(self, query: str, k: int = 10, mode: str = "disjunctive",
               scorer: str = "bm25") -> list[tuple[int, float]]:
        terms = [t for t in tokenize_query_py(query, self.config) if t in self.tf]
        if not terms:
            return []
        scores: dict[int, float] = {}
        hits: dict[int, int] = {}
        for t in terms:
            for d in self.tf[t]:
                scores[d] = scores.get(d, 0.0) + self.score(t, d, scorer)
                hits[d] = hits.get(d, 0) + 1
        if mode == "conjunctive":
            scores = {d: s for d, s in scores.items() if hits[d] == len(terms)}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
