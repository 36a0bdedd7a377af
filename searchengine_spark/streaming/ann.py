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
  covers every pending batch. Latest-wins is enforced GLOBALLY, not
  just within the probed partitions: a re-ingested vector whose new
  embedding hashes into different bands must retire its old signature
  rows even though the new rows live outside the probe. The probe
  therefore joins against a per-id latest-batch frame built from a
  column-pruned scan of ALL pending segments (ids + the batch_id
  partition column only — no vectors read) and keeps a row only when
  it belongs to its id's latest batch (store rows count as latest when
  the id has no pending segment rows);
* ``compact()`` folds segments into the store with the same
  latest-wins rule and retires them. The publish is ATOMIC: the new
  store is written to a fresh ``vectors_v<N>`` directory and the state
  file — the single source of truth for both the store pointer and the
  pending-batch list — is flipped with ``os.replace``. A crash at any
  point leaves either the old state (old store + still-pending
  segments) or the new state (new store, no pending) — never a window
  where a query sees segments-only or a half-published store. Old
  store directories and retired segments are removed best-effort after
  the flip; leftovers are ignored because segment reads are filtered
  to the state's pending list;
* signatures are deterministic functions of (vector, persisted
  planes), so a streamed-then-compacted store probes IDENTICALLY to a
  batch-built store over the same vectors (pinned by test + the
  scaling protocol's ann_sha256).
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
        # recovery for stores written by the pre-versioned layout, whose
        # publish had a crash window between the two renames: if the
        # legacy "vectors" dir is gone but its "vectors_old" backup
        # survives, restore it. The versioned layout (store_version >= 1)
        # never needs this — the state flip is the only publish step.
        state = self._load_state()
        legacy = os.path.join(self.out_dir, "vectors")
        legacy_old = os.path.join(self.out_dir, "vectors_old")
        if (
            state.get("store_version", 0) == 0
            and not os.path.exists(legacy)
            and os.path.exists(legacy_old)
        ):
            os.rename(legacy_old, legacy)

    # ---------- state ----------

    def _load_state(self) -> dict:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return json.load(f)
        return {"pending_batches": [], "compactions": 0, "store_version": 0}

    def _save_state(self, state: dict) -> None:
        """Atomic write: the state file is the single pointer for both
        the store version and the pending-batch list, so readers must
        never observe a torn update."""
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)
        os.replace(tmp, self._state_path)

    def _store_path(self, state: dict) -> str:
        """Current compacted-store directory. Version 0 is the legacy
        un-versioned layout (also what a batch-built ``ann_build_lsh``
        store looks like); compactions publish ``vectors_v<N>``."""
        v = state.get("store_version", 0)
        name = "vectors" if v == 0 else f"vectors_v{v}"
        return os.path.join(self.out_dir, name)

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

    def _segments_df(self, state: dict) -> Optional[DataFrame]:
        """Pending segment rows (hive-partitioned ``batch_id`` exposed as
        a column). Filtered to the state's pending list so retired
        segment directories a crashed cleanup left behind are ignored —
        partition pruning makes the filter free."""
        pending = state["pending_batches"]
        segs = os.path.join(self.out_dir, "segments")
        if not pending or not os.path.exists(segs):
            return None
        df = self.spark.read.option("basePath", segs).parquet(segs)
        return df.filter(F.col("batch_id").isin([int(b) for b in pending]))

    def _all_rows(self, state: dict, probe=None) -> Optional[DataFrame]:
        """Compacted store + pending segments, each with a ``batch_id``
        version column (compacted rows carry -1: any segment wins over
        them). ``probe`` pushes the (band, band_val) partition filter
        into BOTH scans."""
        parts = []
        store = self._store_path(state)
        if os.path.exists(store):
            df = self.spark.read.parquet(store)
            if probe is not None:
                df = df.filter(probe)
            parts.append(df.withColumn("batch_id", F.lit(-1)))
        segs = self._segments_df(state)
        if segs is not None:
            if probe is not None:
                segs = segs.filter(probe)
            parts.append(
                segs.select(
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
        segments; the latest version per vector wins GLOBALLY (see
        module docstring): stale rows are dropped even when the
        re-ingested vector's new band values fall outside the probed
        partitions."""
        if max_hamming is None:
            max_hamming = self.meta["bands"] - 1
        state = self._load_state()
        qsig = lsh_query_signature(self.meta, query_vec)
        rows = self._all_rows(state, lsh_probe_filter(self.meta, qsig))
        if rows is None:
            return self.spark.createDataFrame(
                [], "vec_id long, cosine double"
            )
        seg_all = self._segments_df(state)
        if seg_all is not None:
            # per-id latest pending batch over ALL segments (column-
            # pruned: id + the batch_id partition column — the vector
            # and signature columns are never read). Store rows
            # (batch_id -1) survive only when the id has no pending
            # segment rows; probed segment rows only when they belong
            # to their id's latest batch. Sized by the ingest between
            # compactions, not the store — left to AQE to broadcast.
            latest_batch = seg_all.groupBy(self.id_col).agg(
                F.max(F.col("batch_id").cast("long")).alias("_latest_batch")
            )
            rows = (
                rows.join(latest_batch, self.id_col, "left")
                .filter(
                    F.col("_latest_batch").isNull()
                    | (F.col("batch_id") == F.col("_latest_batch"))
                )
                .drop("_latest_batch")
            )
        # dedup the (band-duplicated) rows of each id; all survivors of
        # an id now come from the same batch, so max_by is pure dedup
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
        """Fold pending segments into a NEW versioned store directory
        (latest-wins per vector id) and atomically flip the state
        pointer; retire old store + segments best-effort afterwards.
        Returns the number of batches folded. The store keeps the exact
        batch layout, so after compaction a probe is indistinguishable
        from a batch-built store's."""
        state = self._load_state()
        pending = state["pending_batches"]
        if not pending:
            return 0
        rows = self._all_rows(state)
        # one row per (id, band): the latest batch's signature slice.
        # Exact across band changes too — every ingest emits rows for
        # ALL bands, so the per-(id, band) winner is always the latest
        # batch's row for that band.
        latest = rows.groupBy(self.id_col, "band").agg(
            F.max_by(
                F.struct(self.vec_col, "sig", "band_val"), "batch_id"
            ).alias("_v")
        ).select(
            self.id_col, f"_v.{self.vec_col}", "_v.sig", "band", "_v.band_val"
        )
        old_store = self._store_path(state)
        new_version = int(state.get("store_version", 0)) + 1
        new_store = os.path.join(self.out_dir, f"vectors_v{new_version}")
        shutil.rmtree(new_store, ignore_errors=True)
        (
            latest.write.mode("overwrite")
            .partitionBy("band", "band_val")
            .parquet(new_store)
        )
        # ATOMIC publish: one os.replace flips store pointer AND empties
        # the pending list together. Before it: readers see old store +
        # pending segments (consistent). After it: new store only —
        # leftover segment dirs are excluded by the pending-list filter.
        state["store_version"] = new_version
        state["pending_batches"] = []
        state["compactions"] = state.get("compactions", 0) + 1
        self._save_state(state)
        # best-effort cleanup; failures leave garbage, never bad answers
        if os.path.exists(old_store):
            shutil.rmtree(old_store, ignore_errors=True)
        shutil.rmtree(
            os.path.join(self.out_dir, "segments"), ignore_errors=True
        )
        return len(pending)
