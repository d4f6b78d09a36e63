"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for the 100TB training-data pipeline: media lives in the table as an
opaque ``binary`` column plus typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so each
task streams record batches without materializing the whole partition.

The actual media decoding is STUBBED (this container ships no image/audio
codecs): ``decode_image_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake decode
(dimensions + channel means derived from the bytes) so the Spark-side
plumbing — schema, batch shape, partitioning, UDF signature — is fully
real and testable. Swap the stub body for PIL/ffmpeg on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channel_means", ArrayType(DoubleType()), True),
        StructField("digest", StringType(), True),
    ]
)


def decode_image_stub(payload: bytes, fake: bool = False):
    """STUB decode. Real implementation requires an image codec (PIL/turbojpeg)
    which this environment does not ship.

    fake=True returns a deterministic pseudo-decode: (width, height,
    channel_means) derived purely from the payload bytes — stable across
    runs/processes, so tests can pin outputs.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec; run with fake=True for "
            "the deterministic test stub"
        )
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    means = [digest[2 + c] / 255.0 for c in range(3)]
    return width, height, means


def extract_image_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake_decode: bool = True,
    batch_partitions: int | None = None,
) -> DataFrame:
    """media(binary payload) → per-item image features via mapInPandas.

    The iterator-of-batches form is the scale-correct shape: per-executor
    codec init happens once per task, batches stream through Arrow, and
    peak memory is one record batch regardless of partition size.
    """
    src = media.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    )
    if batch_partitions:
        src = src.repartition(batch_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # (real impl: initialize the codec once here, per task)
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h, means = decode_image_stub(data, fake=fake_decode)
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(data),
                        "width": w,
                        "height": h,
                        "channel_means": means,
                        "digest": hashlib.sha256(data).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA])

    return src.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("out_width", IntegerType(), False),
        StructField("out_height", IntegerType(), False),
        StructField("payload", StringType(), True),  # digest stand-in, see stub
    ]
)


def resize_image_stub(
    payload: bytes, target: tuple[int, int], fake: bool = False
) -> tuple[int, int, str]:
    """STUB resize. A real implementation decodes, resamples to ``target``
    (aspect-preserving letterbox), and re-encodes — PIL/turbojpeg territory.

    fake=True returns the source dims from the deterministic fake decode and
    a sha256 digest of (payload, target) standing in for the re-encoded
    bytes, so the pipeline shape (binary in → binary out, stable output for
    identical input) is exercised without a codec.
    """
    w, h, _means = decode_image_stub(payload, fake=fake)
    digest = hashlib.sha256(
        payload + f":{target[0]}x{target[1]}".encode()
    ).hexdigest()
    return w, h, digest


def resize_images(
    media: DataFrame,
    target: tuple[int, int] = (224, 224),
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake_decode: bool = True,
) -> DataFrame:
    """media(binary payload) → resized payloads via iterator mapInPandas.

    Same scale shape as extract_image_features: codec init once per task,
    one Arrow batch in memory at a time, map-only (no shuffle)."""
    src = media.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    )
    tw, th = int(target[0]), int(target[1])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h, out = resize_image_stub(data, (tw, th), fake=fake_decode)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": w,
                        "height": h,
                        "out_width": tw,
                        "out_height": th,
                        "payload": out,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA])

    return src.mapInPandas(run, RESIZED_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
    ]
)


def decode_audio_stub(payload: bytes, fake: bool = False):
    """STUB audio decode (no audio codec in this container). fake=True
    yields deterministic (sample_rate, duration_s, rms) from the bytes."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires an audio codec; run with fake=True for "
            "the deterministic test stub"
        )
    digest = hashlib.sha256(b"audio:" + payload).digest()
    sample_rate = (8000, 16000, 22050, 44100)[digest[0] % 4]
    duration_s = len(payload) / float(sample_rate)
    rms = digest[1] / 255.0
    return sample_rate, duration_s, rms


def extract_audio_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake_decode: bool = True,
) -> DataFrame:
    """media(binary payload) → per-item audio features via mapInPandas."""
    src = media.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                sr, dur, rms = decode_audio_stub(data, fake=fake_decode)
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(data),
                        "sample_rate": sr,
                        "duration_s": dur,
                        "rms": rms,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA]
            )

    return src.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
) -> DataFrame:
    """Deterministic frame-sampling *plan* for video payloads: emits
    (media_id, frame_index) rows for frames 0, n, 2n, ... based on a frame
    count derived from metadata (stubbed as n_bytes // 1024). JVM-side."""
    n_frames = (F.length(F.col("payload")) / F.lit(1024)).cast("int") + 1
    return media.select(
        F.col(id_col).alias("media_id"),
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_index"),
    )
