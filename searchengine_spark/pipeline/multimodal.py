"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The decode kernels themselves are STUBBED (the image/audio codec libraries
are not in this environment): ``decode_image_batch`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (seeded from the content digest) produces stable feature
vectors so the Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is fully exercised by tests. Swapping in Pillow/ffmpeg later
is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, width int, height int, n_bytes long, "
    "payload binary"
)

FEATURE_SCHEMA = "doc_id long, media_type string, feature array<float>"


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque binary column (cheap, JVM-side)."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "payload_sha", F.sha2(F.col(payload_col), 256)
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features seeded from the
    content digest. Replace with PIL/librosa/ffmpeg in production."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 8, fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow batches
    in, one feature row per media row out. Partition-parallel; no shuffle.
    """
    if not fake:
        raise NotImplementedError(
            "real decoders (Pillow/ffmpeg/librosa) are not available in "
            "this environment — run with fake=True for the deterministic "
            "test decoder"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature": [
                        _fake_decode(bytes(p), dim).tolist() for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' plumbing demo over opaque video payloads: emits up
    to max_frames byte-slices per payload as rows (doc_id, frame_id,
    frame_bytes). Real frame extraction plugs into the same shape."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_id": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    rows["doc_id"].append(doc_id)
                    rows["frame_id"].append(i)
                    rows["frame_bytes"].append(
                        raw[i * every_n_bytes : (i + 1) * every_n_bytes]
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, "doc_id long, frame_id int, frame_bytes binary")
