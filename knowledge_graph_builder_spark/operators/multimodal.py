"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels.

The decode/resize/frame-sample inner loops need codec libraries that are
NOT in this environment, so the media kernels are capability-gated:
``fake=None`` (default) probes for the codec library per worker
(capabilities.py) and uses the real decoder when importable, else a
deterministic fake that produces shaped-correct outputs from the byte
content; ``fake=True``/``False`` forces either branch (``False`` without
the library raises NotImplementedError at the decode site). In this
container the probes resolve to the fake path; the real branches
(PIL histogram features, PyAV frame decode) are exercised only where
those libraries exist. Everything Spark-side — schemas, partition
sizing, mapInPandas batch shape, metadata join — is real and tested.

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


def _pil_feature(payload: bytes, dim: int) -> list[float]:
    """Real image feature: normalized grayscale histogram folded to dim
    bins (PIL-only, no model weights — deterministic)."""
    import io

    from PIL import Image

    if not payload:
        return [0.0] * dim
    with Image.open(io.BytesIO(payload)) as img:
        hist = img.convert("L").resize((64, 64)).histogram()  # 256 bins
    acc = [0] * dim
    for i, h in enumerate(hist):
        acc[i % dim] += h
    total = sum(acc) or 1
    return [a / total for a in acc]


def decode_and_featurize(media: DataFrame, dim: int = 16, fake: bool | None = None) -> DataFrame:
    """image rows -> feature vectors via an Arrow-batched kernel.
    Decoder choice is capability-gated — see module docstring."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..capabilities import has_pil, resolve_fake

        use_fake = resolve_fake(fake, has_pil)
        if not use_fake and not has_pil():
            raise NotImplementedError(
                "real image decode requires PIL/libvips, not available in this container"
            )
        featurize = _fake_feature if use_fake else _pil_feature
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [featurize(p, dim) for p in pdf["payload"]],
                }
            )
            yield out

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        kernel, schema=IMAGE_FEATURES
    )


def _av_frames(payload: bytes, ts_list: list[int]) -> list[bytes]:
    """Real frame extraction (PyAV): decode once per video, return the
    nearest decoded frame (as raw RGB bytes) for each requested ts."""
    import io

    import av

    out: list[bytes] = []
    with av.open(io.BytesIO(payload)) as container:
        stream = container.streams.video[0]
        frames = [
            (int(f.time * 1000) if f.time is not None else 0, f)
            for f in container.decode(stream)
        ]
    for ts in ts_list:
        if not frames:
            out.append(b"")
            continue
        _, best = min(frames, key=lambda p: abs(p[0] - ts))
        out.append(best.to_ndarray(format="rgb24").tobytes())
    return out


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool | None = None) -> DataFrame:
    """video rows -> sampled frames. Frame timestamps are pure column math
    (sequence over duration); frame extraction is the capability-gated part."""
    timestamps = media.filter(F.col("kind") == "video").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("ts_ms"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..capabilities import has_module, resolve_fake

        use_fake = resolve_fake(fake, lambda: has_module("av"))
        if not use_fake and not has_module("av"):
            raise NotImplementedError("real frame decode requires PyAV/ffmpeg, not available")
        for pdf in batches:
            if not use_fake:
                # one decode per video within the batch, frames fanned back
                # to the exploded rows (rows for one media_id stay adjacent
                # because explode preserves row order within a partition)
                frame_bytes: dict[int, bytes] = {}
                for mid, grp in pdf.groupby("media_id"):
                    payload = grp["payload"].iloc[0]
                    decoded = _av_frames(bytes(payload) if payload is not None else b"", list(grp["ts_ms"]))
                    for idx, fb in zip(grp.index, decoded):
                        frame_bytes[idx] = fb
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "frame_idx": (pdf["ts_ms"] // every_ms).astype("int32"),
                        "ts_ms": pdf["ts_ms"].astype("int32"),
                        "frame_bytes": [frame_bytes[i] for i in pdf.index],
                    }
                )
                continue
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


AUDIO_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("frame_energy", T.ArrayType(T.FloatType()), False),
        T.StructField("rms_mean", T.FloatType(), False),
        T.StructField("peak_frame", T.IntegerType(), False),
    ]
)


def _frame_energies(samples: list[float], frame_len: int) -> list[float]:
    import math

    out = []
    for i in range(0, len(samples), frame_len):
        frame = samples[i : i + frame_len]
        out.append(math.sqrt(sum(x * x for x in frame) / len(frame)))
    return out


def _soundfile_samples(payload: bytes) -> list[float]:
    """Real audio decode (soundfile/libsndfile): mono-mixed float samples."""
    import io

    import soundfile as sf

    data, _rate = sf.read(io.BytesIO(payload), dtype="float32", always_2d=True)
    return [float(row.mean()) for row in data]


def audio_frame_features(
    media: DataFrame, frame_len: int = 16, fake: bool | None = None
) -> DataFrame:
    """audio rows -> framed RMS-energy features (the standard first stage
    of audio preprocessing: frame the waveform, compute per-frame energy,
    pick peaks). Decoder is capability-gated like the image/video kernels:
    the real branch decodes via soundfile/libsndfile; the fake branch
    (this container) interprets the payload as unsigned 8-bit PCM centred
    at 128 — deterministic, shaped-correct, same framing math."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..capabilities import has_module, resolve_fake

        use_fake = resolve_fake(fake, lambda: has_module("soundfile"))
        if not use_fake and not has_module("soundfile"):
            raise NotImplementedError(
                "real audio decode requires soundfile/libsndfile, not available"
            )
        for pdf in batches:
            rows = {"media_id": [], "n_samples": [], "n_frames": [],
                    "frame_energy": [], "rms_mean": [], "peak_frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                samples = (
                    [float(b) - 128.0 for b in raw] if use_fake
                    else _soundfile_samples(raw)
                )
                energies = _frame_energies(samples, frame_len)
                rows["media_id"].append(mid)
                rows["n_samples"].append(len(samples))
                rows["n_frames"].append(len(energies))
                rows["frame_energy"].append(energies)
                rows["rms_mean"].append(
                    sum(energies) / len(energies) if energies else 0.0
                )
                rows["peak_frame"].append(
                    energies.index(max(energies)) if energies else -1
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        kernel, schema=AUDIO_FEATURES
    )


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
