"""Incremental index maintenance via Structured Streaming.

The reference's build is all-or-nothing: ``file_cleaner()`` wipes the index
and SPIMI re-reads the whole collection (index/IndexBuilder.java:15-63).
This module is the streaming-native extension: new corpus files are
ingested as micro-batches, each batch appending a *segment* of
``(term, doc_id, tf, doc_len)`` rows plus its doctable slice — the exact
role SPIMI's spilled partial blocks play (PartialIndexBuilder.java:85-92)
— and a compaction pass merges segments into the queryable lexicon +
postings tables (the k-way merge's role, IndexMerger.java:42-152, done by
a ``groupBy(term)`` shuffle as in the batch builder).

Design points for cluster scale:

* doc_ids continue above a persisted high-water mark; within a batch they
  are assigned deterministically by the natural key, so replaying a batch
  (checkpoint recovery) yields identical ids — exactly-once semantics come
  from the streaming checkpoint + idempotent overwrite of a batch's
  segment directory (segment dir is keyed by batch_id).
* segments are plain parquet appends — no read-modify-write of the main
  index on the hot path; queries keep hitting the last compacted index
  until ``compact()`` publishes a new one.
* compaction = the batch builder's lexicon/postings stages over the union
  of compacted tf + pending segments; it reuses the same code path, so
  streamed and batch-built indexes are bit-identical given the same rows.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import EngineConfig
from ..functions.text import tokenize_raw
from ..index.builder import stem_terms
from ..sources.corpus import assign_doc_ids, filter_malformed, with_sha256

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def stream_corpus(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """readStream of canonical corpus rows from a parquet directory —
    ``maxFilesPerTrigger`` bounds micro-batch size (backpressure)."""
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


class StreamingIndexer:
    """foreachBatch sink that appends per-batch index segments under
    ``index_dir/segments/batch_id=N/`` and doctable slices under
    ``index_dir/doctable_segments/batch_id=N/``."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        config: Optional[EngineConfig] = None,
    ):
        self.spark = spark
        self.index_dir = index_dir.rstrip("/")
        self.config = config or EngineConfig()
        os.makedirs(self.index_dir, exist_ok=True)
        self._state_path = os.path.join(self.index_dir, "stream_state.json")

    # ---------- state ----------

    def _load_state(self) -> dict:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return json.load(f)
        return {"high_water_doc_id": 0, "batches": {}}

    def _save_state(self, state: dict) -> None:
        with open(self._state_path, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)

    # ---------- per-batch ingest ----------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Tokenize a micro-batch, assign doc_ids above the high-water
        mark (deterministic within the batch by natural key), write the
        batch's doctable + tf segment. Idempotent per batch_id: a replayed
        batch overwrites its own segment directory and does not advance
        the high-water mark twice."""
        state = self._load_state()
        key = str(batch_id)
        if key in state["batches"]:
            base_id = state["batches"][key]["base_doc_id"]
        else:
            base_id = state["high_water_doc_id"]

        cfg = self.config
        t0 = time.time()
        base = with_sha256(filter_malformed(batch_df))
        # doc_ids continue above the high-water mark via the batch
        # builder's two-phase range assignment (frozen boundaries,
        # partition-parallel — no global single-task window even for a
        # large micro-batch), offset by base_id. Deterministic for the
        # same batch content at ANY parallelism, so checkpoint replay
        # reassigns identical ids.
        tokenized = (
            assign_doc_ids(base, two_phase=True)
            .withColumn("doc_id", (F.col("doc_id") + F.lit(base_id)).cast("long"))
            .withColumn("tokens", tokenize_raw(F.col("content"), cfg))
            .withColumn("doc_len", F.size("tokens"))
            .persist()
        )

        doct_dir = os.path.join(
            self.index_dir, "doctable_segments", f"batch_id={batch_id}"
        )
        (
            tokenized.select(
                "doc_id",
                F.concat_ws("/", "repo", "path").alias("docno"),
                "repo", "path", "commit", "lang", "doc_len", "sha256",
            )
            .write.mode("overwrite")
            .parquet(doct_dir)
        )

        seg_dir = os.path.join(self.index_dir, "segments", f"batch_id={batch_id}")
        exploded = stem_terms(
            tokenized.select(
                "doc_id", "doc_len", F.explode("tokens").alias("raw")
            ),
            cfg,
            raw_col="raw",
        )
        (
            exploded.groupBy("term", "doc_id", "doc_len")
            .agg(F.count("*").cast("int").alias("tf"))
            .select("term", "doc_id", "tf", "doc_len")
            .write.mode("overwrite")
            .parquet(seg_dir)
        )

        n_docs = tokenized.count()
        tokenized.unpersist()

        state["batches"][key] = {
            "base_doc_id": base_id,
            "n_docs": n_docs,
            "duration_sec": round(time.time() - t0, 3),
            "docs_per_sec": round(n_docs / max(time.time() - t0, 1e-9), 1),
        }
        state["high_water_doc_id"] = max(
            state["high_water_doc_id"], base_id + n_docs
        )
        self._save_state(state)

    def start(
        self,
        corpus_stream: DataFrame,
        checkpoint_dir: Optional[str] = None,
        available_now: bool = True,
    ):
        """Attach the sink and start the streaming query. With
        ``available_now`` the query drains all currently-available input
        then stops — the batch-ingest-shaped trigger; otherwise it runs
        continuously per micro-batch."""
        writer = corpus_stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(self.index_dir, "_checkpoint"),
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # ---------- compaction ----------

    def compact(
        self, out_dir: Optional[str] = None, latest_only: bool = False
    ) -> dict:
        """Merge all segments into a full queryable index (lexicon +
        postings + doctable + stats) using the batch builder's stage code
        over the segment union — the streaming analogue of the k-way merge.
        Returns the build manifest.

        ``latest_only`` gives UPSERT semantics for re-ingested files: when
        the stream saw the same (repo, path) more than once (a new commit
        of a file), only the latest ingest — the highest doc_id, since
        ids are monotone in ingest order — survives into the compacted
        index; superseded versions' doctable rows AND postings are
        dropped, so df/cf/idf/avgdl all reflect the live corpus only.
        The winner-selection is one max-aggregate + two broadcastable
        semi-joins over doc_id — no read-modify-write of any segment."""
        from ..index.builder import IndexBuilder

        out = (out_dir or os.path.join(self.index_dir, "compacted")).rstrip("/")
        seg_root = os.path.join(self.index_dir, "segments")
        doct_root = os.path.join(self.index_dir, "doctable_segments")
        if not (os.path.isdir(seg_root) and os.path.isdir(doct_root)):
            raise RuntimeError(
                "compact() called before any micro-batch was processed: "
                f"no segment directories under {self.index_dir!r} "
                "(run the stream first, or check the input path)"
            )

        tf = self.spark.read.option("basePath", seg_root).parquet(seg_root).drop(
            "batch_id"
        )
        doct = (
            self.spark.read.option("basePath", doct_root)
            .parquet(doct_root)
            .drop("batch_id")
        )
        if latest_only:
            winners = doct.groupBy("repo", "path").agg(
                F.max("doc_id").alias("doc_id")
            ).select("doc_id")
            doct = doct.join(winners, "doc_id", "left_semi")
            tf = tf.join(winners, "doc_id", "left_semi")

        builder = IndexBuilder(self.spark, out, self.config)
        manifest = {"stages": {}}
        os.makedirs(out, exist_ok=True)
        self.config.save(out)

        t0 = time.time()
        doct.write.mode("overwrite").parquet(os.path.join(out, "doctable"))
        builder._finish_stage(manifest, "doctable", t0)

        t0 = time.time()
        tf.write.mode("overwrite").parquet(os.path.join(out, "tf"))
        builder._finish_stage(manifest, "tf", t0)

        # remaining stages (stats, lexicon, postings) via the batch path:
        # corpus arg is unused because doctable/tf already exist on disk.
        return builder.build(corpus=None, resume=True)
