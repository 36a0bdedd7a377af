"""Query engine — top-k BM25/TFIDF retrieval over the partitioned index.

The reference's three algorithms (query/ directory) and their Spark forms:

* DAAT disjunctive (DAAT.java:10-49) — n-way sorted union + score sum.
  Spark: filter postings to the query terms (partition pruning on
  term_bucket + row-group pruning on term), explode the block arrays,
  ``groupBy(doc_id).agg(sum(score))``, TakeOrderedAndProject top-k. The
  shuffle IS the sorted union; parity comes from using the same score
  expression as the build.

* Conjunctive (Conjunctive.java:19-57) — n-way sorted intersection.
  Spark: same plan + ``count(distinct term) == n_terms`` filter (an n-way
  equi-join on doc_id expressed as an aggregation — no join chain needed,
  and Catalyst's hash aggregate beats a cascade of sort-merge joins).

* MaxScore (MaxScore.java:14-96) — upper-bound pruned disjunctive.
  Distributed form (exact, rank-identical to DAAT by construction):
    1. theta = k-th best single-term score of the highest-upper-bound
       term (a valid lower bound on the final top-k threshold);
    2. split terms into essential/non-essential by the reference's
       cumulative-upper-bound rule (MaxScore.java:41-55): the longest
       ascending-ub prefix whose ub sum <= theta is non-essential — a doc
       appearing ONLY in non-essential lists cannot reach theta;
    3. candidates = distinct doc_ids of the essential lists (usually the
       rare terms — tiny fraction of postings);
    4. exact-score ONLY the candidates (semi-join) over all lists, top-k.
  Fixes reference quirks Q-2/Q-3 (stale per-term bound; list 0 never
  probed): bounds here are true global maxima stored by the build, so
  MaxScore == DAAT always — the reference's own equivalence-test intent.

Tie-break everywhere: score DESC, doc_id ASC (ResultBlock.java:41-52).
Missing query terms are silently dropped (Query.java:134-136).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.scoring import bm25_partial_expr, tfidf_partial_expr
from ..functions.text import tokenize_query_py
from ..index.builder import term_bucket_py


class SearchEngine:
    """Loads an index built by :class:`IndexBuilder` and answers queries.

    Unlike the reference — which loads the FULL lexicon and doc table into
    RAM before the first query (Query.java:62-72) — only the query's own
    lexicon rows are collected (a few rows via bucket-pruned parquet read);
    postings stay distributed.
    """

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir.rstrip("/")
        self.config = EngineConfig.load(self.index_dir)
        with open(os.path.join(self.index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self._lex_cache: dict[str, Optional[dict]] = {}
        self._lexicon_df: Optional[DataFrame] = None
        self.postings = spark.read.parquet(os.path.join(self.index_dir, "postings"))
        self.doctable = spark.read.parquet(os.path.join(self.index_dir, "doctable"))

    @property
    def lexicon(self) -> DataFrame:
        """Full lexicon as a DataFrame (analytics over the dictionary).
        Lazy: the QUERY path never touches it — per-term probes go through
        the bucket-pruned pyarrow read in _term_stats — so engine
        construction skips the parquet listing/schema pass."""
        if self._lexicon_df is None:
            self._lexicon_df = self.spark.read.parquet(
                os.path.join(self.index_dir, "lexicon")
            )
        return self._lexicon_df

    # ---------- plumbing ----------

    def tokenize_query(self, text: str) -> list[str]:
        return tokenize_query_py(text, self.config)

    def _bucket_filter(self, terms: Sequence[str]):
        buckets = sorted({term_bucket_py(t, self.config.n_term_buckets) for t in terms})
        return F.col("term_bucket").isin(buckets) & F.col("term").isin(list(terms))

    def _term_stats(self, terms: Sequence[str]) -> dict[str, dict]:
        """J5 dictionary probe: read the (tiny) lexicon rows for the query
        terms; absent terms drop out.

        Driver-side pyarrow read, not a Spark job: the reference answers
        this probe from its RAM-resident dictionary (Query.java:62-72); our
        analogue is a footer-pruned read of only the term_bucket hive
        partitions the query terms hash into, with the term predicate
        pushed into the parquet scan. Probed rows are memoized per engine
        instance — repeated query terms never touch disk again."""
        out: dict[str, dict] = {}
        missing = []
        for t in terms:
            if t in self._lex_cache:
                if self._lex_cache[t] is not None:
                    out[t] = self._lex_cache[t]
            else:
                missing.append(t)
        if missing:
            import pyarrow.dataset as ds

            dataset = ds.dataset(
                os.path.join(self.index_dir, "lexicon"),
                format="parquet",
                partitioning="hive",
            )
            buckets = sorted(
                {term_bucket_py(t, self.config.n_term_buckets) for t in missing}
            )
            tbl = dataset.to_table(
                filter=ds.field("term_bucket").isin(buckets)
                & ds.field("term").isin(missing)
            )
            found = {r["term"]: r for r in tbl.to_pylist()}
            for t in missing:
                self._lex_cache[t] = found.get(t)
                if t in found:
                    out[t] = found[t]
        return out

    def _exploded_postings(self, terms: Sequence[str]) -> DataFrame:
        """(term, doc_id, tf, doc_len) rows for the query terms only —
        bucket partition pruning + term row-group pruning feed the scan."""
        blocks = self.postings.filter(self._bucket_filter(terms))
        if self.config.compression:
            exploded = _decode_blocks(blocks)
            # compressed blocks don't carry doc_len: re-join the doctable
            exploded = exploded.join(
                self.doctable.select("doc_id", "doc_len"), "doc_id"
            )
        else:
            exploded = blocks.select(
                "term",
                F.explode(F.arrays_zip("doc_ids", "tfs", "doc_lens")).alias("p"),
            ).select(
                "term",
                F.col("p.doc_ids").alias("doc_id"),
                F.col("p.tfs").alias("tf"),
                F.col("p.doc_lens").alias("doc_len"),
            )
        return exploded

    def _scored(self, terms: Sequence[str], stats: dict, scorer: str) -> DataFrame:
        cfg = self.config
        idf_map = F.create_map(
            *[F.lit(x) for t in sorted(stats) for x in (t, stats[t]["idf"])]
        )
        partial = (
            bm25_partial_expr(F.col("tf"), F.col("doc_len"), self.stats["avgdl"], cfg.k1, cfg.b)
            if scorer == "bm25"
            else tfidf_partial_expr(F.col("tf"))
        )
        return self._exploded_postings(terms).withColumn(
            "score", partial * F.element_at(idf_map, F.col("term"))
        )

    @staticmethod
    def _sum_scores(scored: DataFrame, terms: Sequence[str]) -> DataFrame:
        """Per-doc score sum, ORDER-DETERMINISTIC: addends are folded in
        sorted-term order regardless of partitioning, so the same index
        gives bit-identical scores at any parallelism (the scaling
        protocol's rank-identity criterion). A plain float groupBy-sum
        would add in shuffle arrival order — ulp-nondeterministic.

        Each (term, doc) pair occurs exactly once in ``scored`` (tf is
        pre-aggregated; blocks partition disjoint doc ranges), so
        ``sum(when(term==t, score))`` is that single double, and the
        final expression adds the per-term values in a fixed order —
        a pure hash aggregate, no per-doc collect_list/sort_array."""
        ordered = sorted(set(terms))
        aggs = [
            F.sum(F.when(F.col("term") == t, F.col("score"))).alias(f"_s{i}")
            for i, t in enumerate(ordered)
        ] + [F.count("*").alias("n_terms")]
        per = scored.groupBy("doc_id").agg(*aggs)
        total = F.lit(0.0)
        for i in range(len(ordered)):
            total = total + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
        return per.select("doc_id", total.alias("score"), "n_terms")

    @staticmethod
    def _topk(per_doc: DataFrame, k: int) -> DataFrame:
        topk = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return topk.withColumn("rank", F.row_number().over(w)).select(
            "rank", "doc_id", "score"
        )

    # ---------- public API ----------

    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "disjunctive",
        scorer: str = "bm25",
        algo: str = "daat",
        with_docno: bool = False,
    ) -> DataFrame:
        """Top-k for a raw query string. Returns (rank, doc_id, score
        [, docno]). k in {10, 20, 100} in the reference UI (Main.java:58);
        any positive k accepted here."""
        terms = self.tokenize_query(query)
        stats = self._term_stats(terms)
        terms = [t for t in terms if t in stats]  # drop unknown terms (J5)
        if not terms:
            result = self.spark.createDataFrame(
                [], "rank int, doc_id long, score double"
            )
        elif mode == "conjunctive":
            result = self._conjunctive(terms, stats, scorer, k)
        elif algo == "maxscore":
            result = self._maxscore(terms, stats, scorer, k)
        else:
            result = self._daat(terms, stats, scorer, k)
        if with_docno:
            # broadcast the k-row RESULT and stream the doctable past it
            result = self.doctable.select("doc_id", "docno").join(
                F.broadcast(result), "doc_id"
            ).select("rank", "doc_id", "docno", "score")
        return result

    # ---------- algorithms ----------

    def _daat(self, terms, stats, scorer: str, k: int) -> DataFrame:
        per_doc = self._sum_scores(self._scored(terms, stats, scorer), terms).drop(
            "n_terms"
        )
        return self._topk(per_doc, k)

    def _conjunctive(self, terms, stats, scorer: str, k: int) -> DataFrame:
        n = len(terms)
        per_doc = (
            self._sum_scores(self._scored(terms, stats, scorer), terms)
            .filter(F.col("n_terms") == n)
            .drop("n_terms")
        )
        return self._topk(per_doc, k)

    def _maxscore(self, terms, stats, scorer: str, k: int) -> DataFrame:
        ub_key = "max_bm25" if scorer == "bm25" else "max_tfidf"
        # ascending upper bounds, like MaxScore.java:27-33
        ordered = sorted(terms, key=lambda t: stats[t][ub_key])

        # phase 1: theta seed from the highest-ub term alone
        top_term = ordered[-1]
        seed = (
            self._scored([top_term], {top_term: stats[top_term]}, scorer)
            .orderBy(F.desc("score"))
            .limit(k)
            .collect()
        )
        theta = seed[k - 1]["score"] if len(seed) >= k else 0.0

        # phase 2: essential/non-essential split by cumulative ub
        cum, essential = 0.0, []
        for t in ordered:
            cum += stats[t][ub_key]
            if cum > theta:
                essential.append(t)
        if not essential:  # defensive: can't happen (top term alone > theta)
            essential = [ordered[-1]]

        scored = self._scored(terms, stats, scorer)
        if len(essential) < len(terms):
            candidates = self._candidates_block_max(
                essential, stats, scorer, theta, total_ub=cum
            )
            scored = scored.join(candidates, "doc_id", "left_semi")
        per_doc = self._sum_scores(scored, terms).drop("n_terms")
        # theta is a LOWER bound on the kth final score: safe pre-filter
        per_doc = per_doc.filter(F.col("score") >= F.lit(theta))
        return self._topk(per_doc, k)

    def _candidates_block_max(
        self, essential, stats, scorer: str, theta: float, total_ub: float
    ) -> DataFrame:
        """Candidate doc_ids from the essential lists with BLOCK-MAX
        pruning (the distributed form of nextGEQ skip-block seeking,
        PostingList.java:77-113, and block-max upper-bound pruning, P5):

        a block of essential term t can only yield a doc whose final score
        reaches theta if  block_max_t + sum(ub of all OTHER terms) >= theta
        — any doc confined to pruned blocks (and non-essential lists) is
        bounded below theta, and theta lower-bounds the final k-th score,
        so dropping it is exact. Docs surviving in ANY unpruned block stay
        candidates and are scored exactly over all lists afterwards.

        The filter runs JVM-side against the per-block max columns, so
        parquet reads skip pruned blocks' array columns entirely."""
        ub_key = "max_bm25" if scorer == "bm25" else "max_tfidf"
        bm_col = "block_max_bm25" if scorer == "bm25" else "block_max_tfidf"
        # per-term allowance: theta minus the others' upper bounds
        thresh_map = F.create_map(
            *[
                F.lit(x)
                for t in essential
                for x in (t, theta - (total_ub - stats[t][ub_key]))
            ]
        )
        blocks = self.postings.filter(self._bucket_filter(essential)).filter(
            F.col(bm_col) >= F.element_at(thresh_map, F.col("term"))
        )
        if self.config.compression:
            exploded = _decode_blocks(blocks).select("doc_id")
        else:
            exploded = blocks.select(
                F.explode("doc_ids").alias("doc_id")
            )
        return exploded.distinct()

    # ---------- batch (TestPerformance.java analogue) ----------

    def batch_search(
        self,
        queries: Sequence[tuple[str, str]],
        k: int = 10,
        mode: str = "disjunctive",
        scorer: str = "bm25",
        algo: str = "daat",
    ) -> DataFrame:
        """Run (query_id, text) pairs; returns a TREC-run-shaped DataFrame
        (query_id, rank, doc_id, score) — S10's run-file sink is then just
        a .write.csv of this."""
        out = None
        for qid, text in queries:
            r = self.search(text, k=k, mode=mode, scorer=scorer, algo=algo)
            r = r.select(F.lit(qid).alias("query_id"), "rank", "doc_id", "score")
            out = r if out is None else out.unionAll(r)
        if out is None:  # empty query set -> empty run, not None
            out = self.spark.createDataFrame(
                [], "query_id string, rank int, doc_id long, score double"
            )
        return out


def _decode_blocks(blocks: DataFrame) -> DataFrame:
    """mapInPandas decoder for compressed blocks -> (term, doc_id, tf)."""
    from ..functions import codecs

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                ids = codecs.vbyte_decode(row.doc_ids_vb)
                tfs = codecs.unary_decode(row.tfs_unary, row.n_postings)
                outs.append(
                    pd.DataFrame(
                        {"term": row.term, "doc_id": ids, "tf": tfs.astype("int32")}
                    )
                )
            yield pd.concat(outs) if outs else pd.DataFrame(
                {"term": pd.Series(dtype="str"),
                 "doc_id": pd.Series(dtype="int64"),
                 "tf": pd.Series(dtype="int32")}
            )

    return blocks.mapInPandas(gen, "term string, doc_id long, tf int")
