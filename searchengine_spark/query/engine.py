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
  Distributed form (exact, rank-identical to DAAT by construction), ONE
  Spark job, zero driver-side collects:
    1. theta from index METADATA already held driver-side: for any query
       term, its blocks partition disjoint doc sets, so k distinct docs
       achieve its k largest per-block maxima — the k-th largest block
       max is a valid lower bound on the final k-th score (all partial
       scores are positive). theta = the best such bound over the query
       terms. This replaces the reference's heap-threshold bootstrap
       (MaxScore.java:75-83) without scanning any posting data.
    2. split terms into essential/non-essential by the reference's
       cumulative-upper-bound rule (MaxScore.java:41-55): the longest
       ascending-ub prefix whose ub sum <= theta is non-essential — a doc
       appearing ONLY in non-essential lists cannot reach theta;
    3. candidates = doc_ids of the essential lists' unpruned blocks
       (usually the rare terms — tiny fraction of postings);
    4. exact-score ONLY the candidates (left-semi join, broadcast when
       the essential dfs say the candidate side is small) over all
       lists, top-k.
  Fixes reference quirks Q-2/Q-3 (stale per-term bound; list 0 never
  probed): bounds here are true global maxima stored by the build, so
  MaxScore == DAAT always — the reference's own equivalence-test intent.

Tie-break everywhere: score DESC, doc_id ASC (ResultBlock.java:41-52).
Missing query terms are silently dropped (Query.java:134-136).
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterator, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
        self._block_max_cache: dict[str, list[dict]] = {}
        self._block_summary_cache: dict[str, Optional[dict]] = {}
        self._block_summary_full = False
        self._block_summary_should_load: Optional[bool] = None
        self._phrase_caches: list[DataFrame] = []
        self._lexicon_df: Optional[DataFrame] = None
        self._positions_df: Optional[DataFrame] = None
        self._pa_postings = None
        self._pa_lexicon = None
        self._pa_positions = None
        # None = auto (engage when the query's postings fit the driver
        # gate); True/False force. search(local=...) overrides per call.
        self.local_exec: Optional[bool] = None
        self.postings = spark.read.parquet(os.path.join(self.index_dir, "postings"))
        self.doctable = spark.read.parquet(os.path.join(self.index_dir, "doctable"))
        # schema facts resolved ONCE (a .columns probe mid-query forces a
        # fresh analysis pass — measurable per-query planning cost)
        self._has_block_range = "min_doc_id" in self.postings.columns
        self._decoded_has_doc_len = "doc_lens" in self.postings.columns

    def refresh(self) -> None:
        """Invalidate the per-term memo caches and re-read the index
        frames. Call after the index directory is updated IN PLACE (e.g.
        streaming compaction into the same dir) — without this, negative
        lexicon lookups memoized before the update would keep treating
        newly indexed terms as absent."""
        self._lex_cache.clear()
        self._block_max_cache.clear()
        self._block_summary_cache.clear()
        self._block_summary_full = False
        self._block_summary_should_load = None
        self._retire_phrase_cache(None)
        self._lexicon_df = None
        self._positions_df = None
        self._pa_postings = None
        self._pa_lexicon = None
        self._pa_positions = None
        with open(os.path.join(self.index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.config = EngineConfig.load(self.index_dir)
        self.postings = self.spark.read.parquet(
            os.path.join(self.index_dir, "postings")
        )
        self.doctable = self.spark.read.parquet(
            os.path.join(self.index_dir, "doctable")
        )
        self._has_block_range = "min_doc_id" in self.postings.columns
        self._decoded_has_doc_len = "doc_lens" in self.postings.columns

    def warm(self) -> "SearchEngine":
        """Pin the postings frame in executor memory and materialize it —
        the distributed analogue of the reference loading its whole index
        into RAM before the first query (Query.java:62-72; its 16-72 ms
        latencies are RAM-probe numbers). Optional: cold queries are
        identical in results; warm() trades executor memory for scan
        latency, and at cluster scale the cache is cluster-RAM-sized —
        the same trade the reference makes on one machine. Partition/
        batch-stat pruning still applies to the cached relation, and
        every query derives from this same frame, so the cache is hit by
        all of them. The positional frame warms on first phrase query if
        already resolved."""
        self.postings = self.postings.persist()
        self.postings.count()
        if self._positions_df is not None:
            self._positions_df = self._positions_df.persist()
        # pull the block_summary into driver RAM too (when small enough)
        # so the first MaxScore query pays no metadata read
        self._block_summary([])
        return self

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

    def _postings_dataset(self):
        """Memoized pyarrow dataset handle for the postings table — the
        file listing / hive-partition discovery is a per-query driver
        cost worth paying once per engine instance (refresh() resets)."""
        if self._pa_postings is None:
            import pyarrow.dataset as ds

            self._pa_postings = ds.dataset(
                os.path.join(self.index_dir, "postings"),
                format="parquet",
                partitioning="hive",
            )
        return self._pa_postings

    def _positions_dataset(self):
        """Memoized pyarrow dataset handle for the positional table
        (phrase fast path) — same once-per-engine listing trade as
        _postings_dataset."""
        if self._pa_positions is None:
            import pyarrow.dataset as ds

            self._pa_positions = ds.dataset(
                os.path.join(self.index_dir, "positions"),
                format="parquet",
                partitioning="hive",
            )
        return self._pa_positions

    def _lexicon_dataset(self):
        if self._pa_lexicon is None:
            import pyarrow.dataset as ds

            self._pa_lexicon = ds.dataset(
                os.path.join(self.index_dir, "lexicon"),
                format="parquet",
                partitioning="hive",
            )
        return self._pa_lexicon

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

            dataset = self._lexicon_dataset()
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

    def _block_maxima(self, terms: Sequence[str]) -> dict[str, list[dict]]:
        """Per-term skip-block metadata (block_max_bm25/tfidf, n_postings)
        — the driver-side analogue of the reference's RAM-resident skip
        info (SkipList.java:24-46). Column-projected pyarrow read of the
        postings table: parquet being columnar, the posting arrays/blobs
        are never touched — this reads 3 small columns of the query
        terms' bucket partitions only. Memoized per engine instance."""
        missing = [t for t in terms if t not in self._block_max_cache]
        if missing:
            import pyarrow.dataset as ds

            dataset = self._postings_dataset()
            buckets = sorted(
                {term_bucket_py(t, self.config.n_term_buckets) for t in missing}
            )
            tbl = dataset.to_table(
                filter=ds.field("term_bucket").isin(buckets)
                & ds.field("term").isin(missing),
                columns=["term", "n_postings", "block_max_bm25", "block_max_tfidf"],
            )
            for t in missing:
                self._block_max_cache[t] = []
            for r in tbl.to_pylist():
                self._block_max_cache[r["term"]].append(r)
        return {t: self._block_max_cache[t] for t in terms}

    def _block_summary(self, terms: Sequence[str]) -> dict[str, dict]:
        """Per-term top-K block maxima + actual block-row count from the
        ``block_summary`` stage (one row per term — the lexicon's shape,
        not the postings'). This bounds the theta metadata read at
        O(|terms| * K) driver bytes even for a stopword-scale term whose
        postings span ~1e6 block rows. Memoized; absent terms map to
        None. Returns {} when the index predates the stage (pre-r3) —
        callers then fall back to :meth:`_block_maxima`."""
        summ_dir = os.path.join(self.index_dir, "block_summary")
        if not os.path.exists(summ_dir):
            return {}
        if self._block_summary_full:
            return {
                t: self._block_summary_cache[t]
                for t in terms
                if self._block_summary_cache.get(t) is not None
            }
        missing = [t for t in terms if t not in self._block_summary_cache]
        if missing or not terms:
            import pyarrow.dataset as ds

            dataset = ds.dataset(summ_dir, format="parquet", partitioning="hive")
            # small summary table => load it ALL once and answer every
            # later probe from RAM — the reference's own move (the full
            # dictionary is RAM-resident before the first query,
            # Query.java:62-72). The per-term bucket-pruned probe below
            # stays the path for web-scale vocabularies, where the
            # summary is too big to hold driver-side. (terms == [] is
            # warm()'s explicit preload request.) The load/no-load
            # decision is sized on UNCOMPRESSED parquet bytes (row-group
            # total_byte_size from the footers — no data read) times a
            # measured pylist expansion factor, NOT compressed file
            # size: the cache stores to_pylist() dicts whose Python
            # object overhead dwarfs the snappy-compressed footprint.
            # Decided once per engine instance (refresh() resets).
            if self._block_summary_should_load is None:
                unc = 0
                for frag in dataset.get_fragments():
                    md = frag.metadata
                    unc += sum(
                        md.row_group(i).total_byte_size
                        for i in range(md.num_row_groups)
                    )
                self._block_summary_should_load = (
                    unc * self.PYLIST_BYTES_PER_ARROW_BYTE
                    <= self.BLOCK_SUMMARY_RAM_BYTES
                )
            if self._block_summary_should_load:
                for r in dataset.to_table().to_pylist():
                    self._block_summary_cache.setdefault(r["term"], r)
                self._block_summary_full = True
                return {
                    t: self._block_summary_cache[t]
                    for t in terms
                    if self._block_summary_cache.get(t) is not None
                }
            if missing:
                buckets = sorted(
                    {term_bucket_py(t, self.config.n_term_buckets) for t in missing}
                )
                tbl = dataset.to_table(
                    filter=ds.field("term_bucket").isin(buckets)
                    & ds.field("term").isin(missing)
                )
                found = {r["term"]: r for r in tbl.to_pylist()}
                for t in missing:
                    self._block_summary_cache[t] = found.get(t)
        return {
            t: self._block_summary_cache[t]
            for t in terms
            if self._block_summary_cache.get(t) is not None
        }

    def _theta_from_blocks(
        self, terms: Sequence[str], scorer: str, k: int
    ) -> float:
        """Lower bound on the k-th best final score, from metadata alone.

        Preferred form (index >= r3): the k-th largest single-POSTING
        score of any one query term. Within one term each posting is a
        distinct doc, so its top-k posting scores are achieved by k
        DISTINCT docs — and every partial score is positive (idf > 0
        because df <= true_docs < n_docs under Q-1 inflation), so final
        scores only exceed them. This is the strongest bound single-term
        metadata can give, and it is what makes a RARE query term (df in
        [k, ~1000] — the discriminative term of a typical query) push
        theta to its idf scale: the r2 block-max form needed >= k skip
        blocks, which rare terms never have, so exactly the queries
        MaxScore should win collapsed to theta ~= 0.

        Fallbacks, in order: per-term top-100 block maxima (r2-era
        block_summary; the k-th block max is also achieved by k distinct
        docs since blocks partition disjoint doc ranges), then the
        per-block metadata scan (pre-r2 index or k > stored K)."""
        bm_key = "block_max_bm25" if scorer == "bm25" else "block_max_tfidf"
        post_key = "top_post_bm25" if scorer == "bm25" else "top_post_tfidf"
        blk_key = (
            "top_block_max_bm25" if scorer == "bm25" else "top_block_max_tfidf"
        )
        theta = 0.0
        summary = self._block_summary(terms) if k <= 100 else {}
        if summary:
            for t in terms:
                row = summary.get(t)
                if row is None:
                    continue
                top_posts = row.get(post_key)
                if top_posts is not None and len(top_posts) >= k:
                    theta = max(theta, top_posts[k - 1])
                elif row.get(blk_key) is not None and row["n_block_rows"] >= k:
                    theta = max(theta, row[blk_key][k - 1])
            return theta
        for t, blocks in self._block_maxima(terms).items():
            if len(blocks) >= k:
                kth = sorted((b[bm_key] for b in blocks), reverse=True)[k - 1]
                theta = max(theta, kth)
        return theta

    def _candidates_driver(
        self, essential, stats, scorer: str, theta: float, total_ub: float
    ):
        """Candidate doc_ids as a DRIVER-side numpy array — the direct
        analogue of the reference holding its essential posting lists in
        RAM and driving nextGEQ from them (MaxScore.java:57-74). Gated by
        the caller to small essential lists (ess_df <= RANGE_PRUNE_DF),
        so this is a bounded bucket-pruned pyarrow read like the lexicon
        probe (_term_stats) — NOT a Spark job: the alternative (a
        DataFrame candidate subplan) costs one extra broadcast-exchange
        job per query, which at local-mode overheads erases most of what
        the pruning saves. Same block-max pruning rule as
        _candidates_block_max."""
        import numpy as np
        import pyarrow.dataset as ds

        from ..functions.codecs import vbyte_decode, vbyte_decode_delta

        bm_col = "block_max_bm25" if scorer == "bm25" else "block_max_tfidf"
        ub_key = "max_bm25" if scorer == "bm25" else "max_tfidf"
        dataset = self._postings_dataset()
        expr = None
        for t in essential:
            thresh = theta - (total_ub - stats[t][ub_key])
            e = (ds.field("term") == t) & (ds.field(bm_col) >= thresh)
            expr = e if expr is None else (expr | e)
        buckets = sorted(
            {term_bucket_py(t, self.config.n_term_buckets) for t in essential}
        )
        col = "doc_ids_vb" if self.config.compression else "doc_ids"
        tbl = dataset.to_table(
            filter=ds.field("term_bucket").isin(buckets) & expr, columns=[col]
        )
        if self.config.compression:
            dec = (
                vbyte_decode_delta
                if self.config.delta_docids
                else vbyte_decode
            )
            arrs = [dec(b.as_py()) for b in tbl[col]]
        else:
            arrs = [np.asarray(a.as_py(), dtype=np.int64) for a in tbl[col]]
        if not arrs:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(arrs))

    # above this many distinct terms, the per-term In() predicate stops
    # paying: planning/pushdown cost grows with the literal list while
    # most buckets are hit anyway. Callers that re-filter by term (the
    # batch join) then run bucket-pruned only.
    MAX_TERM_PREDICATE = 1024

    def _exploded_postings(
        self,
        terms: Sequence[str],
        term_predicate: bool = True,
        block_thresh: Optional[dict[str, float]] = None,
        scorer: str = "bm25",
        candidate_range: Optional[DataFrame] = None,
        candidate_ids=None,
    ) -> DataFrame:
        """(term, doc_id, tf, doc_len) rows for the query terms only —
        bucket partition pruning + term row-group pruning feed the scan.
        With ``term_predicate=False`` only the bucket partition filter is
        applied (huge term sets: the caller's join does term filtering).

        ``block_thresh`` (MaxScore) drops whole blocks BEFORE the arrays
        are touched: a block of term t with block_max < thresh[t] is
        skipped — parquet never reads its array/blob columns. Only exact
        when the caller also applies the theta score filter (see
        _maxscore for the bound argument).

        Candidate-directed scan (MaxScore nextGEQ, PostingList.java:
        77-113): keep only blocks whose [min_doc_id, max_doc_id] range
        contains at least one candidate doc_id — with c candidates, at
        most c blocks per term are decoded no matter how long the list
        is. Two forms:

        * ``candidate_ids`` (sorted ints, caller keeps it small): pure
          LITERAL predicates — a pushable coarse [min(c), max(c)] range
          filter plus an exists() containment check over the block
          metadata columns, then an InSet on the exploded doc_ids. NO
          extra Spark job, no broadcast: the whole query stays one job,
          like DAAT.
        * ``candidate_range`` (DataFrame): broadcast left-semi range
          join over block metadata rows — for candidate sets too large
          to inline as literals.

        Either form is exact only when the caller then applies the theta
        score filter — non-candidate docs in surviving blocks still ride
        into scoring."""
        if term_predicate and len(terms) <= self.MAX_TERM_PREDICATE:
            blocks = self.postings.filter(self._bucket_filter(terms))
        else:
            buckets = sorted(
                {term_bucket_py(t, self.config.n_term_buckets) for t in terms}
            )
            blocks = self.postings.filter(F.col("term_bucket").isin(buckets))
        has_range = self._has_block_range
        if candidate_ids is not None and len(candidate_ids) > 0 and has_range:
            ids = [int(x) for x in candidate_ids]
            csv = ",".join(map(str, ids))
            # one SQL string = ONE py4j round-trip (the Column-API form
            # pays a JVM call per literal/lambda piece). Coarse bounds
            # are plain comparisons => parquet row-group stats pruning;
            # the exists() runs JVM-side over the ~sqrt(df) block
            # metadata rows only
            blocks = blocks.filter(
                F.expr(
                    f"max_doc_id >= {ids[0]}L AND min_doc_id <= {ids[-1]}L "
                    f"AND exists(array({csv}), "
                    "c -> c >= min_doc_id AND c <= max_doc_id)"
                )
            )
        if candidate_range is not None and has_range:
            blocks = blocks.join(
                F.broadcast(candidate_range),
                (candidate_range["doc_id"] >= blocks["min_doc_id"])
                & (candidate_range["doc_id"] <= blocks["max_doc_id"]),
                "left_semi",
            )
        if block_thresh:
            bm_col = "block_max_bm25" if scorer == "bm25" else "block_max_tfidf"
            thresh_map = F.create_map(
                *[F.lit(x) for t, v in block_thresh.items() for x in (t, v)]
            )
            blocks = blocks.filter(
                F.col(bm_col)
                >= F.coalesce(
                    F.element_at(thresh_map, F.col("term")),
                    F.lit(float("-inf")),
                )
            )
        if self.config.compression:
            exploded = _decode_blocks(blocks, delta=self.config.delta_docids)
            if not self._decoded_has_doc_len:
                # pre-r3 compressed index without in-row doc_lens: re-join
                # the doctable (one shuffle the current layout avoids)
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
        if candidate_ids is not None and len(candidate_ids) > 0:
            # exact candidate restriction pre-aggregation (InSet — a hash
            # probe per exploded row); redundant for correctness under
            # the caller's theta filter, but it keeps non-candidates in
            # surviving blocks out of the shuffle
            csv = ",".join(str(int(x)) for x in candidate_ids)
            exploded = exploded.filter(F.expr(f"doc_id IN ({csv})"))
        return exploded

    def _scored(
        self,
        terms: Sequence[str],
        stats: dict,
        scorer: str,
        block_thresh: Optional[dict[str, float]] = None,
        candidate_range: Optional[DataFrame] = None,
        candidate_ids=None,
    ) -> DataFrame:
        cfg = self.config
        idf_map = F.create_map(
            *[F.lit(x) for t in sorted(stats) for x in (t, stats[t]["idf"])]
        )
        partial = (
            bm25_partial_expr(F.col("tf"), F.col("doc_len"), self.stats["avgdl"], cfg.k1, cfg.b)
            if scorer == "bm25"
            else tfidf_partial_expr(F.col("tf"))
        )
        return self._exploded_postings(
            terms,
            block_thresh=block_thresh,
            scorer=scorer,
            candidate_range=candidate_range,
            candidate_ids=candidate_ids,
        ).withColumn(
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
        a pure hash aggregate, no per-doc collect_list/sort_array.

        Expressions are built as SQL strings (ONE py4j round-trip each):
        the Column-API form cost ~10 JVM calls per query term, which
        dominated single-query planning time. The left-associative
        ``a + b + ...`` parse is bit-identical to the old explicit
        ``0.0 + a + b + ...`` fold (0.0 + a == a exactly for the
        non-negative addends here). Terms are post-pipeline tokens (T4
        strips all ASCII punctuation), so inlining them in SQL is safe;
        quotes are escaped anyway."""
        ordered = sorted(set(terms))
        aggs = [
            F.expr(
                "sum(CASE WHEN term = '{0}' THEN score END) AS _s{1}".format(
                    t.replace("'", "''"), i
                )
            )
            for i, t in enumerate(ordered)
        ] + [F.expr("count(*) AS n_terms")]
        per = scored.groupBy("doc_id").agg(*aggs)
        total = F.expr(
            " + ".join(f"coalesce(_s{i}, 0d)" for i in range(len(ordered)))
        )
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
        local: Optional[bool] = None,
    ) -> DataFrame:
        """Top-k for a raw query string. Returns (rank, doc_id, score
        [, docno]). k in {10, 20, 100} in the reference UI (Main.java:58);
        any positive k accepted here.

        ``local`` selects the execution path: None (default) auto-gates —
        when the query terms' postings fit the driver RAM gate
        (LOCAL_EXEC_MAX_POSTINGS), score entirely driver-side in numpy
        with NO Spark job (the analogue of the reference's RAM-resident
        interactive query path, Query.java:62-72); beyond the gate, or
        with local=False, the distributed plan runs. Results are
        bit-identical either way (same formulas, same summation order,
        same tie-break)."""
        terms = self.tokenize_query(query)
        stats = self._term_stats(terms)
        terms = [t for t in terms if t in stats]  # drop unknown terms (J5)
        if not terms:
            result = self.spark.createDataFrame(
                [], "rank int, doc_id long, score double"
            )
        elif self._local_ok(terms, stats, local):
            result = self._local_df(
                self._local_topk(terms, stats, scorer, mode, algo, k)
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

    # ---------- driver-local fast path (interactive latency) ----------

    # auto-engage the driver-local path when the query terms' total df
    # is at most this many postings: ~16 B/posting decoded (int64 id +
    # doubles) keeps the transient driver footprint tens of MB. The
    # reference answers every interactive query from RAM (Query.java:
    # 62-72; Documentation.pdf Table 3's 16-72 ms are RAM-probe
    # numbers); this is the same trade with an explicit gate — at
    # web scale a stopword-laden query overflows the gate and falls
    # back to the distributed plan, which is the only one that can
    # answer it anyway.
    LOCAL_EXEC_MAX_POSTINGS = 2_000_000

    def _local_ok(self, terms, stats, override: Optional[bool]) -> bool:
        if override is False:
            return False
        if override is None and self.local_exec is False:
            return False
        if self.config.compression and not self._decoded_has_doc_len:
            # pre-r3 compressed layout: doc_len would need a doctable
            # join the local path doesn't do
            return False
        if override or self.local_exec:
            return True
        return (
            sum(stats[t]["df"] for t in terms)
            <= self.LOCAL_EXEC_MAX_POSTINGS
        )

    def _local_postings(
        self,
        terms: Sequence[str],
        block_thresh: Optional[dict[str, float]] = None,
        scorer: str = "bm25",
    ) -> dict[str, tuple]:
        """Bucket-pruned driver-side pyarrow read of the query terms'
        posting blocks -> {term: (doc_ids int64, tfs f64, doc_lens f64)}.
        Parquet columnar projection reads ONLY the posting payload
        columns of the matching bucket partitions; ``block_thresh``
        applies MaxScore block pruning inside the scan filter (same rule
        as _exploded_postings — exact only under the caller's theta
        score filter)."""
        import numpy as np
        import pyarrow.dataset as ds

        from ..functions.codecs import (
            unary_decode,
            vbyte_decode,
            vbyte_decode_delta,
        )

        dataset = self._postings_dataset()
        buckets = sorted(
            {term_bucket_py(t, self.config.n_term_buckets) for t in terms}
        )
        expr = ds.field("term_bucket").isin(buckets) & ds.field("term").isin(
            list(terms)
        )
        if block_thresh:
            bm_col = (
                "block_max_bm25" if scorer == "bm25" else "block_max_tfidf"
            )
            pruned = None
            for t in terms:
                e = (ds.field("term") == t) & (
                    ds.field(bm_col) >= block_thresh[t]
                )
                pruned = e if pruned is None else (pruned | e)
            expr = expr & pruned
        if self.config.compression:
            cols = ["term", "n_postings", "doc_ids_vb", "tfs_unary", "doc_lens"]
        else:
            cols = ["term", "doc_ids", "tfs", "doc_lens"]
        tbl = dataset.to_table(filter=expr, columns=cols).combine_chunks()
        term_col = tbl["term"].to_pylist()

        def flat(name, dtype):
            # ListArray -> (values ndarray, offsets ndarray): per-row
            # slices without to_pylist boxing
            arr = tbl[name].chunk(0) if tbl[name].num_chunks else None
            if arr is None:
                return np.empty(0, dtype), np.zeros(1, np.int64)
            return (
                arr.values.to_numpy(zero_copy_only=False).astype(
                    dtype, copy=False
                ),
                arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64),
            )

        out: dict[str, list] = {t: [[], [], []] for t in terms}
        if self.config.compression:
            dl_vals, dl_off = flat("doc_lens", np.float64)
            dec = (
                vbyte_decode_delta
                if self.config.delta_docids
                else vbyte_decode
            )
            vb = tbl["doc_ids_vb"]
            un = tbl["tfs_unary"]
            np_col = tbl["n_postings"].to_numpy(zero_copy_only=False)
            for r, t in enumerate(term_col):
                out[t][0].append(dec(vb[r].as_py()))
                out[t][1].append(
                    unary_decode(un[r].as_py(), int(np_col[r])).astype(
                        np.float64
                    )
                )
                out[t][2].append(dl_vals[dl_off[r] : dl_off[r + 1]])
        else:
            id_vals, id_off = flat("doc_ids", np.int64)
            tf_vals, tf_off = flat("tfs", np.float64)
            dl_vals, dl_off = flat("doc_lens", np.float64)
            for r, t in enumerate(term_col):
                out[t][0].append(id_vals[id_off[r] : id_off[r + 1]])
                out[t][1].append(tf_vals[tf_off[r] : tf_off[r + 1]])
                out[t][2].append(dl_vals[dl_off[r] : dl_off[r + 1]])

        def cat(parts, dtype):
            return (
                np.concatenate(parts).astype(dtype, copy=False)
                if parts
                else np.empty(0, dtype)
            )

        return {
            t: (
                cat(v[0], np.int64),
                cat(v[1], np.float64),
                cat(v[2], np.float64),
            )
            for t, v in out.items()
        }

    def _local_df(self, pdf: pd.DataFrame) -> DataFrame:
        """Wrap a driver-computed top-k as a LocalRelation via a SQL
        VALUES clause: collect() is then driver-only — NO Spark job at
        all (createDataFrame(pandas) builds an ExistingRDD whose collect
        costs a full Python-worker round-trip, measured ~0.26 s even for
        k rows). Doubles ride as CAST('<repr>' AS DOUBLE): repr
        round-trips IEEE754 exactly and parseDouble is correctly
        rounded, so the scores are bit-identical to the numpy values."""
        if len(pdf) == 0:
            return self.spark.createDataFrame(
                [], "rank int, doc_id long, score double"
            )
        rows = ",".join(
            f"({int(rank)}, {int(doc_id)}L, CAST('{float(score)!r}' AS DOUBLE))"
            for rank, doc_id, score in pdf.itertuples(index=False)
        )
        return self.spark.sql(
            f"SELECT * FROM VALUES {rows} AS t(rank, doc_id, score)"
        )

    def _local_topk(
        self, terms, stats, scorer: str, mode: str, algo: str, k: int
    ) -> pd.DataFrame:
        """Driver-side numpy scoring — bit-identical to the distributed
        plan: per-(term, doc) partials use the same double-precision
        operation order as bm25_partial_expr/tfidf_partial_expr
        (bm25_partial_py is the documented mirror), and per-doc sums
        fold addends in sorted-term order exactly like _sum_scores'
        coalesce chain (0.0 + s == s for the non-negative addends).
        ``algo='maxscore'`` applies the same metadata theta + block-max
        pruning as _maxscore — the identical exactness argument holds,
        just without a Spark job."""
        import numpy as np

        from ..functions.scoring import bm25_partial_py, tfidf_partial_py

        theta = 0.0
        block_thresh = None
        if algo == "maxscore" and mode != "conjunctive":
            theta = self._theta_from_blocks(terms, scorer, k)
            if theta > 0.0:
                ub_key = "max_bm25" if scorer == "bm25" else "max_tfidf"
                cum = sum(stats[t][ub_key] for t in terms)
                block_thresh = {
                    t: theta - (cum - stats[t][ub_key]) for t in terms
                }
        per_term = self._local_postings(
            terms, block_thresh=block_thresh, scorer=scorer
        )
        ordered = sorted(set(terms))
        nonempty = [t for t in ordered if per_term[t][0].size]
        if not nonempty:
            return pd.DataFrame(
                {"rank": [], "doc_id": [], "score": []}
            ).astype({"rank": "int32", "doc_id": "int64", "score": "float64"})
        uniq = np.unique(np.concatenate([per_term[t][0] for t in nonempty]))
        scores = np.zeros(uniq.size, dtype=np.float64)
        counts = np.zeros(uniq.size, dtype=np.int64)
        for t in ordered:
            ids, tf, dl = per_term[t]
            if ids.size == 0:
                continue
            pos = np.searchsorted(uniq, ids)
            if scorer == "bm25":
                partial = bm25_partial_py(
                    tf, dl, self.stats["avgdl"], self.config.k1, self.config.b
                )
            else:
                partial = tfidf_partial_py(tf)
            scores[pos] += partial * stats[t]["idf"]
            counts[pos] += 1
        keep = np.ones(uniq.size, dtype=bool)
        if mode == "conjunctive":
            keep &= counts == len(ordered)
        if theta > 0.0:
            keep &= scores >= theta
        uniq, scores = uniq[keep], scores[keep]
        order = np.lexsort((uniq, -scores))[:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, order.size + 1, dtype=np.int32),
                "doc_id": uniq[order],
                "score": scores[order],
            }
        )

    def _phrase_local_ok(
        self, terms, stats, override: Optional[bool]
    ) -> bool:
        """Gate for the driver-local phrase path: total cf (one position
        int per term occurrence) under the same RAM bound as
        _local_ok's df sum, and a positions layout that carries doc_len
        (every build >= r2)."""
        if override is False:
            return False
        if override is None and self.local_exec is False:
            return False
        names = self._positions_dataset().schema.names
        if "doc_len" not in names:
            return False
        if override or self.local_exec:
            return True
        return (
            sum(stats[t]["cf"] for t in set(terms))
            <= self.LOCAL_EXEC_MAX_POSTINGS
        )

    def _local_phrase(self, terms, k: int, raw: bool = False):
        """Driver-side phrase top-k — bit-identical to the distributed
        phrase plan: identical coverage semantics (a base b matches when
        every phrase index i has term_i at position b+i), identical
        scoring double-ops (bm25_partial_py mirrors bm25_partial_expr;
        score = partial * log10(n_docs / phrase_df) in the same operand
        order) and identical (partial desc, doc_id asc) ranking — idf is
        a positive per-query constant, so ranking by the idf-free
        partial is rank- and tie-identical, as in the distributed path.

        The positional slices arrive via one column-projected,
        bucket+term-pushed pyarrow read (no Spark job); coverage is an
        intersect of per-index (doc, base) key sets — doc ids are
        compacted to local indices first so the int64 key
        (doc_idx << 32 | base + L) never overflows at any doc_id
        magnitude."""
        import numpy as np
        import pyarrow.dataset as ds

        from ..functions.codecs import vbyte_decode_delta
        from ..functions.scoring import bm25_partial_py

        L = len(terms)
        dataset = self._positions_dataset()
        names = dataset.schema.names
        compressed = "positions_vb" in names
        buckets = sorted(
            {term_bucket_py(t, self.config.n_term_buckets) for t in set(terms)}
        )
        cols = ["term", "doc_id", "doc_len"] + (
            ["positions_vb"] if compressed else ["positions"]
        )
        tbl = dataset.to_table(
            filter=ds.field("term_bucket").isin(buckets)
            & ds.field("term").isin(list(set(terms))),
            columns=cols,
        ).combine_chunks()

        def empty():
            if raw:
                return (
                    pd.DataFrame(
                        {"doc_id": [], "partial": [], "phrase_tf": []}
                    ).astype(
                        {
                            "doc_id": "int64",
                            "partial": "float64",
                            "phrase_tf": "int64",
                        }
                    ),
                    0,
                )
            return self.spark.createDataFrame(
                [], "rank int, doc_id long, score double, phrase_tf int"
            )

        if tbl.num_rows == 0:
            return empty()
        term_col = np.asarray(tbl["term"].to_pylist())
        doc_col = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl_col = tbl["doc_len"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        if compressed:
            pos_rows = [
                (vbyte_decode_delta(b.as_py()) - 1).astype(np.int64)
                for b in tbl["positions_vb"]
            ]
        else:
            arr = tbl["positions"].chunk(0)
            vals = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
            offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            pos_rows = [vals[offs[r] : offs[r + 1]] for r in range(len(offs) - 1)]

        docs_unique, doc_idx = np.unique(doc_col, return_inverse=True)
        dl_by_doc = np.zeros(docs_unique.size, dtype=np.float64)
        dl_by_doc[doc_idx] = dl_col

        rows_by_term: dict[str, np.ndarray] = {
            t: np.flatnonzero(term_col == t) for t in set(terms)
        }
        inter = None
        for i, t in enumerate(terms):
            rs = rows_by_term[t]
            if rs.size == 0:
                return empty()
            keys = np.concatenate(
                [
                    (doc_idx[r] << np.int64(32)) + (pos_rows[r] - i + L)
                    for r in rs
                ]
            )
            keys.sort()
            inter = (
                keys
                if inter is None
                else np.intersect1d(inter, keys, assume_unique=True)
            )
            if inter.size == 0:
                return empty()
        hit_idx, ptf = np.unique(inter >> np.int64(32), return_counts=True)
        phrase_df = hit_idx.size
        partial = bm25_partial_py(
            ptf.astype(np.float64),
            dl_by_doc[hit_idx],
            self.stats["avgdl"],
            self.config.k1,
            self.config.b,
        )
        hit_docs = docs_unique[hit_idx]
        order = np.lexsort((hit_docs, -partial))[:k]
        if raw:
            # scatter-gather consumers (index/sharded.py) rank globally
            # on the idf-free partial and attach the GLOBAL phrase_df
            return (
                pd.DataFrame(
                    {
                        "doc_id": hit_docs[order],
                        "partial": partial[order],
                        "phrase_tf": ptf[order].astype(np.int64),
                    }
                ),
                int(phrase_df),
            )
        idf = math.log10(float(self.stats["n_docs"]) / phrase_df)
        score = partial[order] * idf
        rows = ",".join(
            f"({r + 1}, {int(d)}L, CAST('{float(s)!r}' AS DOUBLE), {int(tf)})"
            for r, (d, s, tf) in enumerate(
                zip(hit_docs[order], score, ptf[order])
            )
        )
        return self.spark.sql(
            f"SELECT * FROM VALUES {rows} "
            "AS t(rank, doc_id, score, phrase_tf)"
        )

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

    # candidate sides whose essential dfs sum below this are broadcast in
    # the semi join (doc_ids only: ~8 B/row -> <= ~16 MB broadcast)
    BROADCAST_CANDIDATE_DF = 2_000_000
    # engage the candidate semi-join only when the essential lists are at
    # most this fraction of the query's total postings: the join stage
    # costs a scan + exchange, so weak pruning (most docs candidates
    # anyway) would pay more than it saves — in that regime MaxScore
    # degrades to DAAT + the theta pre-filter, which is free. The same
    # cost logic is implicit in the reference: its non-essential skipping
    # only wins when upper bounds actually exclude lists. 0.25 measured
    # best on the Zipf bench corpus: at 0.5 a 2-equal-terms query (ess_df
    # ~= half the postings) paid the extra candidate scan for nothing.
    PRUNE_RATIO = 0.25
    # additionally direct the SCAN by candidates (nextGEQ block-range
    # semi join in _exploded_postings) when the essential lists are this
    # small: the candidate set rides a broadcast nested-loop range join
    # against block metadata, so it must stay ~thousands of rows. This
    # is the regime where the reference's MaxScore wins big (a rare
    # discriminative term + frequent terms): per common term only the
    # ~|candidates| blocks containing candidates are decoded instead of
    # the whole list.
    RANGE_PRUNE_DF = 65_536
    # candidate sets at most this big are inlined as plan literals
    # (InSet + exists() over block metadata) — zero extra jobs; bigger
    # ones become a local-relation broadcast range join
    LITERAL_CANDIDATES = 2048
    # engage candidate pruning only when the NON-essential lists hold at
    # least this many postings — the prunable work. Below it the fixed
    # cost of producing candidates (driver-side pyarrow read of the
    # essential lists, or a candidate scan job) exceeds what pruning can
    # save and MaxScore should degrade to DAAT + the free theta/block-max
    # filters. Re-measured round 4 with the literal-candidate path
    # (interleaved best-of-4, 12 mixed queries, 100k-doc Zipf, same
    # box): candidate pruning at savings ~100-140k postings now runs at
    # or slightly below DAAT (p50 0.502 s vs 0.519 s) while the gated
    # degradation pays ~50 ms of thresh-map/filter overhead (0.570 s) —
    # so the r3 value of 400k, measured before the exists()/InSet form
    # stabilized, was leaving wins on the table. At 1M docs (savings >=
    # 1.2M) pruning won every query by 0.2-0.5 s (ZIPF_SCALE.json).
    PRUNE_MIN_POSTINGS = 100_000
    # phrase coverage uses a one-hot bit_or up to this many terms (the
    # mask must fit a signed long); longer phrases use count_distinct
    PHRASE_BITMASK_MAX = 62
    # block_summary tables whose ESTIMATED driver-RAM footprint stays
    # under this are loaded whole on first probe (the reference's
    # RAM-resident dictionary, Query.java:62-72): per-query theta then
    # costs zero reads. Bigger vocabularies keep the bucket-pruned
    # per-term probe. The estimate is uncompressed-parquet bytes (from
    # footers) x PYLIST_BYTES_PER_ARROW_BYTE, because the cache holds
    # to_pylist() dicts: measured on a 20k-term summary shaped like the
    # real one (4 x 100-double top arrays per row), sys.getsizeof-walked
    # dicts run ~4.2x the Arrow buffer size (each 8-byte double becomes
    # a ~32-byte boxed float + list slot); 8 is the safety round-up.
    BLOCK_SUMMARY_RAM_BYTES = 256 * 1024 * 1024
    PYLIST_BYTES_PER_ARROW_BYTE = 8

    def _maxscore(self, terms, stats, scorer: str, k: int) -> DataFrame:
        ub_key = "max_bm25" if scorer == "bm25" else "max_tfidf"
        # ascending upper bounds, like MaxScore.java:27-33
        ordered = sorted(terms, key=lambda t: stats[t][ub_key])

        # phase 1 (driver metadata only, NO Spark job): theta lower bound
        # from the top-K block maxima the build persisted (block_summary)
        theta = self._theta_from_blocks(terms, scorer, k)

        # phase 2: essential/non-essential split by cumulative ub
        cum, essential = 0.0, []
        for t in ordered:
            cum += stats[t][ub_key]
            if cum > theta:
                essential.append(t)
        if not essential:  # defensive: can't happen (top term ub >= theta)
            essential = [ordered[-1]]

        # phase 3: block-max pruning of the SCORING scan itself (the
        # distributed form of block-max-WAND skipping). A doc d in block
        # B of term t has score(d) <= block_max_t(B) + sum(ub of the
        # OTHER query terms); when that bound is < theta, d cannot reach
        # the top-k — and d's computed score (missing at most pruned-
        # block contributions, all positive) stays < theta too, so the
        # theta pre-filter below removes it. Docs whose true score >=
        # theta by the same bound appear ONLY in unpruned blocks, so
        # their scores are computed exactly: rank-identical to DAAT.
        # JVM-side filter on the per-block max column => parquet skips
        # the pruned blocks' array/blob columns entirely.
        block_thresh = None
        if theta > 0.0:
            block_thresh = {
                t: theta - (cum - stats[t][ub_key]) for t in terms
            }
        ess_df = sum(stats[t]["df"] for t in essential)
        total_df = sum(stats[t]["df"] for t in terms)
        prune = (
            len(essential) < len(terms)
            and ess_df <= self.PRUNE_RATIO * total_df
            and total_df - ess_df >= self.PRUNE_MIN_POSTINGS
        )
        # prune implies theta > 0: ubs are strictly positive (idf > 0
        # under Q-1 inflation, partial > 0 for tf >= 1), so a non-empty
        # non-essential prefix needs its cumulative ub <= theta.
        cand_ids = cand_df = None
        range_prune = prune and ess_df <= self.RANGE_PRUNE_DF
        if range_prune:
            # essential lists small enough to hold driver-side, like the
            # reference's RAM-resident lists: nextGEQ via plan literals
            # (small sets) or a local-relation broadcast — either way the
            # query stays ONE Spark job
            ids = self._candidates_driver(
                essential, stats, scorer, theta, total_ub=cum
            )
            if len(ids) == 0:
                # can't happen (the theta-source term's top block always
                # survives its own threshold) — but an empty candidate
                # restriction would silently return no rows, so fall back
                # to the plain theta-filtered scan
                range_prune = False
            elif len(ids) <= self.LITERAL_CANDIDATES:
                cand_ids = ids
            else:
                # Arrow path: a 64k-row local relation serializes as one
                # batch instead of 64k py4j rows
                cand_df = self.spark.createDataFrame(
                    pd.DataFrame({"doc_id": ids.astype("int64")})
                )
        scored = self._scored(
            terms,
            stats,
            scorer,
            block_thresh=block_thresh,
            candidate_range=cand_df,
            candidate_ids=cand_ids,
        )
        if cand_df is not None:
            # exact restriction for the DF form (the literal form applies
            # its InSet inside _exploded_postings); broadcasting a local
            # relation launches no scan job
            scored = scored.join(F.broadcast(cand_df), "doc_id", "left_semi")
        elif prune and not range_prune:
            # large essential lists: distributed candidate scan + hash
            # semi join (broadcast under BROADCAST_CANDIDATE_DF). The
            # restriction is redundant for CORRECTNESS (the theta filter
            # below removes every non-candidate: its true score — hence
            # its computed score, partial sums being positive — is below
            # theta by the block-max bound) but prunes the aggregation.
            sem = self._candidates_block_max(
                essential, stats, scorer, theta, total_ub=cum
            )
            if ess_df <= self.BROADCAST_CANDIDATE_DF:
                sem = F.broadcast(sem)
            scored = scored.join(sem, "doc_id", "left_semi")
        per_doc = self._sum_scores(scored, terms).drop("n_terms")
        # theta is a LOWER bound on the kth final score: safe pre-filter
        # (REQUIRED for exactness whenever block_thresh pruned anything)
        if theta > 0.0:
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
        parquet reads skip pruned blocks' array columns entirely. No
        ``distinct`` — the left-semi join consuming this dedups for free,
        saving a shuffle."""
        bm_col = "block_max_bm25" if scorer == "bm25" else "block_max_tfidf"
        ub_key = "max_bm25" if scorer == "bm25" else "max_tfidf"
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
            # doc_lens dropped pre-decode: candidates only need doc_id
            return _decode_blocks(
                blocks.drop("doc_lens"), delta=self.config.delta_docids
            ).select("doc_id")
        return blocks.select(F.explode("doc_ids").alias("doc_id"))

    # ---------- phrase queries (positional index; beyond-reference) ----------

    def _retire_phrase_cache(self, new: Optional[DataFrame]) -> None:
        """Unpersist previous phrase queries' matched-doc caches and
        (when ``new`` is given) track the next one. Deferred-by-one so
        the frame returned to the caller keeps its cache until the NEXT
        phrase query — unpersisting inside the same call would drop the
        cache before the caller ever collects."""
        for df in self._phrase_caches:
            df.unpersist(blocking=False)
        self._phrase_caches = [new] if new is not None else []

    def tokenize_phrase(self, phrase: str) -> list[str]:
        """Phrase tokenization = the DOCUMENT pipeline (order-preserving,
        duplicates kept — a phrase is a token sequence, not a term set),
        truncated to term_dim like every indexed term."""
        from ..functions.text import tokenize_doc_py

        return [
            t[: self.config.term_dim]
            for t in tokenize_doc_py(phrase, self.config)
        ]

    def phrase_search(
        self,
        phrase: str,
        k: int = 10,
        local: Optional[bool] = None,
        _raw: bool = False,
    ):
        """Exact phrase top-k over the positional index (requires a build
        with ``positions=True``). A phrase occurrence is a run of the
        phrase's terms at consecutive positions of the POST-pipeline
        token sequence (stopwords removed, stems applied) — the standard
        semantics for a stopped/stemmed index.

        ONE positions scan, ONE exchange, all JVM-side: read the phrase
        terms' bucket-pruned positions rows, shift each term's positions
        by its phrase offset (an occurrence at base b means term_i sits
        at b+i; the offset comes from a literal map lookup — no
        broadcast-join of a local relation, which cost an extra exchange
        plus a py4j-built DataFrame per query), and a doc's phrase tf is
        the number of bases covered by ALL terms — ``groupBy(doc_id,
        base)`` + coverage count, no per-term join chain. An explicit
        ``repartition(doc_id)`` feeds BOTH aggregations from the same
        exchange: hashpartitioning(doc_id) satisfies the (doc_id, base)
        clustering requirement too, so the per-base coverage agg and the
        per-doc tf agg run in one stage with no second shuffle (the
        map-side partial agg the repartition skips merges almost
        nothing here — rows with equal (doc_id, base) only arise when
        different terms' positions align, i.e. at actual matches). The
        matched-doc frame is persisted so the phrase-df count and the
        ranking share the scan (two Spark jobs — the broadcast count
        materializes the cache — but the positions pipeline executes
        once). Scoring is BM25 treating the phrase as one pseudo-term:
        idf from the phrase's doc frequency, the usual Q-1/Q-4 quirks
        preserved; ranking happens on the idf-free partial (idf is a
        positive per-query constant) so only the k winners touch the df
        scalar. Strict semantics: a phrase with any unindexed term
        matches nothing (unlike the disjunctive paths'
        drop-unknown-terms rule — dropping a phrase word would silently
        change the phrase)."""
        pos_dir = os.path.join(self.index_dir, "positions")
        if not os.path.exists(pos_dir):
            raise RuntimeError(
                "no positional index: build with EngineConfig(positions=True)"
            )
        terms = self.tokenize_phrase(phrase)

        def empty() -> DataFrame:
            # phrase_tf is int in BOTH the empty and populated paths
            # (the scored path casts to int below) so callers can
            # union/compare schemas regardless of whether the phrase
            # matched. Built lazily — the hot path never pays the
            # schema-parse/py4j cost of a frame it discards.
            return self.spark.createDataFrame(
                [], "rank int, doc_id long, score double, phrase_tf int"
            )

        if not terms:
            return empty()
        stats = self._term_stats(terms)
        if any(t not in stats for t in terms):
            return empty()  # strict: unknown word => phrase cannot occur

        # driver-local fast path (same design + gate as _local_topk):
        # the phrase terms' positional slices are gated on total cf —
        # one position int per occurrence is the dominant footprint
        if self._phrase_local_ok(terms, stats, local):
            return self._local_phrase(terms, k, raw=_raw)

        # resolve the positions frame ONCE per engine (directory listing
        # + schema read are driver-side costs a per-query re-read would
        # pay every time, like postings/doctable in __init__)
        if self._positions_df is None:
            self._positions_df = self.spark.read.parquet(pos_dir)
        # bucket prune (partition-level) + term IN-list (pushed to the
        # parquet scan — positions files are term-sorted within each
        # bucket, so row-group min/max stats skip everything else; the
        # later element_at null-drop would discard those rows anyway,
        # but only AFTER exploding / decoding them)
        pos = self._positions_df.filter(self._bucket_filter(terms)).filter(
            F.col("term").isin(list(set(terms)))
        )
        if "positions_vb" in pos.columns:
            # compressed positional layout (EngineConfig.compress_positions):
            # decode in-flight AFTER the bucket prune — only the phrase
            # terms' rows pay the codec, and the scan never reads an int
            # array column at all
            pos = pos.withColumn(
                "positions", _decode_positions(F.col("positions_vb"))
            )
        # term -> ARRAY of phrase offsets as a literal map: a term
        # repeated in the phrase ("big data big") occupies several
        # offsets, and each position row must fan out to all of them —
        # exactly what the old broadcast-join against an (i, term) local
        # relation did, minus that join's extra exchange and the
        # py4j-built DataFrame per query.
        offs: dict[str, list[int]] = {}
        for i, t in enumerate(terms):
            offs.setdefault(t, []).append(i)
        imap = F.create_map(
            *[
                x
                for t, idxs in offs.items()
                for x in (F.lit(t), F.array(*[F.lit(i) for i in idxs]))
            ]
        )
        has_doc_len = "doc_len" in pos.columns
        cols = [
            "doc_id",
            F.element_at(imap, F.col("term")).alias("_is"),
            F.explode("positions").alias("p"),
        ] + ([F.col("doc_len")] if has_doc_len else [])
        bases = (
            pos.select(*cols)
            .select("*", F.explode("_is").alias("i"))
            .drop("_is")
            .withColumn("base", F.col("p") - F.col("i"))
            .repartition("doc_id")
        )
        # coverage test: base b is a phrase occurrence iff every term
        # index i appears at (doc_id, b). count_distinct(i) would compile
        # to a double aggregate with an extra (doc_id, base, i) exchange;
        # an OR of one-hot bitmasks is a single partial+final agg — same
        # answer, one fewer shuffle on the largest intermediate of the
        # query. (Phrases longer than PHRASE_BITMASK_MAX fall back to
        # count_distinct; the bitmask must fit a signed long.)
        if len(terms) <= self.PHRASE_BITMASK_MAX:
            full = (1 << len(terms)) - 1
            cover = F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), i)")
            ).alias("cover")
            cover_hit = F.col("cover") == full
        else:
            cover = F.count_distinct("i").alias("cover")
            cover_hit = F.col("cover") == len(terms)
        agg = [cover] + (
            [F.first("doc_len").alias("doc_len")] if has_doc_len else []
        )
        occ = bases.groupBy("doc_id", "base").agg(*agg).filter(cover_hit)
        ptf_aggs = [F.count("*").cast("int").alias("phrase_tf")] + (
            [F.first("doc_len").alias("doc_len")] if has_doc_len else []
        )
        ptf = occ.groupBy("doc_id").agg(*ptf_aggs)
        # ONE positions scan. Both remaining consumers — the top-k
        # ranking and the 1-row phrase_df count — read this matched-doc
        # frame; un-persisted, the broadcast count subtree would
        # re-execute the entire match pipeline (the round-3 plan showed
        # two full aggregation chains over the positions scan — 2x the
        # dominant cost at any scale). The frame is the smallest thing
        # worth sharing: 3 numeric columns x |matching docs| rows,
        # spillable. The broadcast job materializes the cache; the main
        # subtree then reads it. Retired on the next phrase query /
        # refresh(), never before the caller can collect.
        from pyspark import StorageLevel

        ptf = ptf.persist(StorageLevel.MEMORY_AND_DISK)
        self._retire_phrase_cache(ptf)
        if has_doc_len:
            # doc_len rides in the positions rows (build >= r2): no
            # doctable join — the whole query is scan -> two aggs -> topk
            scored = ptf
        else:
            # legacy positional index without doc_len: broadcast the tiny
            # matched-doc side and stream the doctable past it
            scored = self.doctable.select("doc_id", "doc_len").join(
                F.broadcast(ptf), "doc_id"
            )
        cfg = self.config
        partial = bm25_partial_expr(
            F.col("phrase_tf"), F.col("doc_len"), self.stats["avgdl"], cfg.k1, cfg.b
        )
        # idf = log10(n_docs / phrase_df) is a per-query POSITIVE
        # constant (phrase_df <= true_docs < n_docs under Q-1
        # inflation), so ranking by the idf-free partial is
        # rank-identical — ties included: equal partial <=> equal final
        # score. Top-k FIRST, then attach phrase_df (a 1-row count
        # aggregate broadcast-cross-joined — an unbounded
        # Window.partitionBy() would funnel every matching doc through
        # one task) and scale only the k winners. Same bits as scaling
        # pre-top-k: one double multiply, same operand order.
        topk = (
            scored.select("doc_id", partial.alias("_partial"), "phrase_tf")
            .orderBy(F.desc("_partial"), F.asc("doc_id"))
            .limit(k)
        )
        phrase_df_row = ptf.agg(
            F.count("*").cast("long").alias("phrase_df")
        )
        if _raw:
            # scatter-gather: (doc_id, _partial, phrase_tf) top-k + the
            # 1-row matched-doc count; the caller attaches a GLOBAL idf
            return topk, phrase_df_row
        topk = topk.crossJoin(F.broadcast(phrase_df_row))
        idf = F.log10(F.lit(float(self.stats["n_docs"])) / F.col("phrase_df"))
        topk = topk.select(
            "doc_id", (F.col("_partial") * idf).alias("score"), "phrase_tf"
        )
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return topk.withColumn("rank", F.row_number().over(w)).select(
            "rank", "doc_id", "score", "phrase_tf"
        )

    # ---------- batch (TestPerformance.java analogue) ----------

    def batch_search(
        self,
        queries: Sequence[tuple[str, str]],
        k: int = 10,
        mode: str = "disjunctive",
        scorer: str = "bm25",
        algo: str = "daat",
        term_stats: Optional[dict] = None,
    ) -> DataFrame:
        """Run (query_id, text) pairs as ONE Spark job; returns a
        TREC-run-shaped DataFrame (query_id, rank, doc_id, score) — S10's
        run-file sink is then just a .write.csv of this.

        The reference evaluates its query set serially
        (TestPerformance.java:58-147); a naive Spark translation (one
        search() plan per query unioned) is a driver bottleneck at 10k
        queries. Instead the whole set becomes data: a broadcast
        (query_id, term, idf) table joined against ONE bucket-pruned
        postings scan of the union of query terms, then
        ``groupBy(query_id, doc_id)`` and a per-query window top-k —
        plan size and job count are constant in the number of queries.

        Scores are bit-identical to the single-query path: the per-doc
        sum folds addends in sorted-term order (array_sort on the tiny
        per-doc (term, score) list — <= |query terms| elements), and
        adding coalesce-zeros for absent terms is a float no-op, so the
        two summation orders agree exactly.

        ``algo='maxscore'`` applies each query's metadata-derived theta
        (see _theta_from_blocks) as an exact score pre-filter; results
        are identical to DAAT by construction either way."""
        tokenized = [(qid, self.tokenize_query(text)) for qid, text in queries]
        all_terms = sorted({t for _, ts in tokenized for t in ts})
        # ``term_stats`` lets a scatter-gather caller (index/sharded.py)
        # inject GLOBAL df/idf and the GLOBAL known-term sets: terms the
        # dict knows but this shard's lexicon doesn't simply match no
        # postings, and n_q_terms stays the global count so the
        # conjunctive filter is exact per shard
        stats = (
            term_stats
            if term_stats is not None
            else self._term_stats(all_terms)  # ONE lexicon probe
        )
        rows = []
        for qid, ts in tokenized:
            known = sorted({t for t in ts if t in stats})
            for t in known:
                rows.append((qid, t, float(stats[t]["idf"]), len(known)))
        if not rows:
            return self.spark.createDataFrame(
                [], "query_id string, rank int, doc_id long, score double"
            )
        qterms = self.spark.createDataFrame(
            rows, "query_id string, term string, idf double, n_q_terms int"
        )
        union_terms = sorted({r[1] for r in rows})
        cfg = self.config
        partial = (
            bm25_partial_expr(
                F.col("tf"), F.col("doc_len"), self.stats["avgdl"], cfg.k1, cfg.b
            )
            if scorer == "bm25"
            else tfidf_partial_expr(F.col("tf"))
        )
        # the broadcast join filters by term regardless; the In() scan
        # predicate is kept only while the term list is predicate-sized
        scored = (
            self._exploded_postings(
                union_terms,
                term_predicate=len(union_terms) <= self.MAX_TERM_PREDICATE,
            )
            .join(F.broadcast(qterms), "term")
            .withColumn("score", partial * F.col("idf"))
        )
        per = scored.groupBy("query_id", "doc_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "score"))),
                F.lit(0.0),
                lambda acc, s: acc + s["score"],
            ).alias("score"),
            F.count("*").alias("n_hit"),
            F.first("n_q_terms").alias("n_q_terms"),
        )
        if mode == "conjunctive":
            per = per.filter(F.col("n_hit") == F.col("n_q_terms"))
        if (
            algo == "maxscore"
            and mode != "conjunctive"
            and len(all_terms) <= self.MAX_TERM_PREDICATE
        ):
            # per-query theta pre-filters (bounded driver reads via the
            # block_summary stage; huge query sets still skip them — the
            # result is exact either way). NEVER under conjunctive mode:
            # theta lower-bounds the k-th DISJUNCTIVE score, achieved by
            # docs that need not contain all query terms, so the k-th
            # CONJUNCTIVE score can sit below it and the filter would
            # drop valid rows — matching search()'s dispatch, which
            # routes conjunctive queries past MaxScore entirely.
            thetas = {
                qid: self._theta_from_blocks(
                    [t for t in ts if t in stats], scorer, k
                )
                for qid, ts in tokenized
            }
            if any(v > 0.0 for v in thetas.values()):
                theta_map = F.create_map(
                    *[F.lit(x) for q, v in thetas.items() for x in (q, v)]
                )
                per = per.filter(
                    F.col("score")
                    >= F.coalesce(
                        F.element_at(theta_map, F.col("query_id")), F.lit(0.0)
                    )
                )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            per.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score")
        )


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def _decode_positions(col: pd.Series) -> pd.Series:
    """Inverse of index/builder.py _encode_positions: delta+VByte decode
    then -1 back to 0-based positions. Arrow-batched; one numpy array
    per row, no per-row Python beyond the codec call."""
    from ..functions import codecs

    return col.map(
        lambda b: (codecs.vbyte_decode_delta(b) - 1).astype("int32")
    )


def _decode_blocks(blocks: DataFrame, delta: bool = False) -> DataFrame:
    """mapInPandas decoder for compressed blocks -> (term, doc_id, tf
    [, doc_len]). Fully vectorized per Arrow batch: the codecs return
    numpy arrays which are np.concatenate'd into ONE output frame per
    batch (the term column via np.repeat) — no per-block-row pandas
    DataFrame allocation, which on a big compressed query was millions
    of tiny frames. Input is column-pruned to exactly the decoder's
    needs so the parquet scan skips block metadata columns. ``delta``
    selects the gap-encoded docID layout (EngineConfig.delta_docids)."""
    import numpy as np

    from ..functions import codecs

    has_dl = "doc_lens" in blocks.columns
    cols = ["term", "n_postings", "doc_ids_vb", "tfs_unary"] + (
        ["doc_lens"] if has_dl else []
    )
    schema = "term string, doc_id long, tf int" + (
        ", doc_len int" if has_dl else ""
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            dec = codecs.vbyte_decode_delta if delta else codecs.vbyte_decode
            ids = [dec(b) for b in pdf["doc_ids_vb"]]
            tfs = [
                codecs.unary_decode(b, n)
                for b, n in zip(pdf["tfs_unary"], pdf["n_postings"])
            ]
            counts = np.fromiter(
                (len(a) for a in ids), dtype=np.int64, count=len(ids)
            )
            out = {
                "term": np.repeat(pdf["term"].to_numpy(), counts),
                "doc_id": np.concatenate(ids) if ids else np.empty(0, np.int64),
                "tf": (
                    np.concatenate(tfs) if tfs else np.empty(0, np.int64)
                ).astype("int32"),
            }
            if has_dl:
                out["doc_len"] = np.concatenate(
                    [np.asarray(a, dtype=np.int32) for a in pdf["doc_lens"]]
                )
            yield pd.DataFrame(out)

    return blocks.select(*cols).mapInPandas(gen, schema)
