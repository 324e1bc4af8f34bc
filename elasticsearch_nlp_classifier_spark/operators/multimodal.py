"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

The Spark-side plumbing (schemas, batching, partition sizing, UDF
signatures) is real and tested; the codec step itself is pluggable:
this container has no image/audio libraries, so the default codec is a
clearly-marked deterministic fake (content-hash-derived features), and
``decode_with`` accepts a real decoder where PIL/ffmpeg exist.

Schema conventions:

    media(doc_id bigint, kind string, meta struct<width:int, height:int,
          frames:int, sample_rate:int>, payload binary)
    features(doc_id bigint, kind string, features array<float>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, kind string, "
    "meta struct<width:int, height:int, frames:int, sample_rate:int>, "
    "payload binary"
)
FEATURES_SCHEMA = "doc_id bigint, kind string, features array<float>"

FEATURE_DIM = 16


def fake_decode(payload: bytes, kind: str, meta) -> np.ndarray:
    """DETERMINISTIC FAKE decode — stands in for PIL/librosa/ffmpeg,
    which are absent from this container.  Produces a stable
    FEATURE_DIM-float feature vector from the payload digest so the
    pipeline shape (schemas, batching, joins) is fully exercisable."""
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (arr.astype(np.float32) / 65535.0)[:FEATURE_DIM]


def real_decode(payload: bytes, kind: str, meta) -> np.ndarray:
    """Placeholder for a real decoder (PIL image decode, audio PCM
    frame sampling...).  Raises until a codec library is provisioned."""
    raise NotImplementedError(
        "no image/audio codec libraries in this environment; "
        "inject a decoder via extract_features(decode_with=...)"
    )


def extract_features(
    media: DataFrame,
    decode_with: Callable[[bytes, str, object], np.ndarray] = fake_decode,
    batch_rows: int = 256,
) -> DataFrame:
    """media -> features via mapInPandas; one decode call per row inside
    an Arrow batch (payloads are opaque binaries — this is the one place
    per-element work is inherent, so the batch boundary is the lever:
    size partitions by *bytes* (spark.sql.files.maxPartitionBytes), not
    row count, because payload rows are huge)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [
                decode_with(p, k, m).tolist()
                for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index (real frame extraction needs ffmpeg; the row explosion,
    which is the Spark-side cost, is real)."""
    return media.where(F.col("kind") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.frames") - 1, F.lit(0)),
                F.lit(every_nth),
            )
        ).alias("frame_idx"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/demos."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=64 + (i % 5) * 32,
                               dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                {
                    "width": 64 + i % 128 if kind == "image" else None,
                    "height": 64 + i % 64 if kind == "image" else None,
                    "frames": 24 * (1 + i % 10) if kind == "video" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                },
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
