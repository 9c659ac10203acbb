"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque ``binary`` columns plus typed metadata — the
schema, partitioning, Arrow batch shape, and UDF signatures are real and
tested; the actual codec work is STUBBED (this container has no image/audio
libraries) behind ``_decode_bytes``, which produces a deterministic fake so
tests have stable expectations. Swap that one function for PIL/ffmpeg on a
real cluster; nothing else changes.

Design for 100 TB of media:

* ``mapInPandas`` streams Arrow record batches through Python — decode cost
  amortizes per-batch, not per-row;
* binary payloads stay in the executor; only extracted features shuffle;
* `spark.sql.files.maxPartitionBytes` bounds per-task media volume, so a
  task never holds more than one batch of frames in memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("byte_len", LongType(), True),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic binary payload column from existing data (the
    test stand-in for reading real media files): payload = md5 bytes of the
    text, typed by id modulo."""
    payload = F.unhex(F.md5(F.col(text_col)))
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        mtype.alias("media_type"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), mtype).alias("mime"),
        F.length(payload).cast("long").alias("byte_len"),
    )


def _decode_bytes(payload: bytes) -> dict:
    """STUB decode. A real build calls PIL/libav here. The fake derives
    deterministic pseudo-metadata from the payload bytes so the Spark-side
    plumbing (schema, batching, null handling) is fully testable."""
    if payload is None:
        return {"width": None, "height": None, "n_frames": None, "checksum": None}
    # hash the payload's hex form (not the raw bytes): same determinism, and
    # the fake metadata becomes reproducible in ANSI SQL (sha256 over VARCHAR)
    # so the correctness oracle can verify the full mapInPandas plumbing
    digest = hashlib.sha256(payload.hex().encode("ascii")).digest()
    return {
        "width": 16 + digest[0] % 240,
        "height": 16 + digest[1] % 240,
        "n_frames": 1 + digest[2] % 30,
        "checksum": digest.hex()[:16],
    }


_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("checksum", StringType(), True),
    ]
)


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Feature-extraction over Arrow batches: binary payload → metadata.
    Fans the Python decode out across cores when the input arrives
    under-partitioned (single parquet file → one partition → one decoder)."""
    from ..utils import fan_out

    df = fan_out(df, "media_id")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_bytes(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "checksum": [m["checksum"] for m in metas],
                }
            )
            yield out

    return df.mapInPandas(decode, schema=_META_SCHEMA)


def resize_images(df: DataFrame, max_dim: int = 224) -> DataFrame:
    """STUB resize: real impl transforms payload bytes; the stub rescales the
    fake metadata only, preserving aspect ratio — the plumbing (column
    carry-through, batch iteration) is the tested surface."""
    meta = decode_image_meta(df)
    scale = F.lit(max_dim) / F.greatest(F.col("width"), F.col("height"))
    clamped = F.least(scale, F.lit(1.0))
    return meta.select(
        "media_id",
        "media_type",
        F.round(F.col("width") * clamped).cast("int").alias("width"),
        F.round(F.col("height") * clamped).cast("int").alias("height"),
        "n_frames",
        "checksum",
    )


def frame_sample(df: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index. The
    frame *decode* is stubbed; the explode shape (row fan-out proportional
    to n_frames/every_n) is the real scale concern and is exercised here."""
    meta = decode_image_meta(df.filter(F.col("media_type") == "video"))
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return meta.select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
        "checksum",
    )


def audio_segments(df: DataFrame, segment_ms: int = 5000) -> DataFrame:
    """Audio segmentation: one row per fixed-length segment window —
    ``(media_id, seg_idx, t_start_ms, t_end_ms)`` with the tail clipped to
    the clip duration. The waveform *decode* is stubbed (deterministic
    pseudo-duration from the payload digest, SQL-reproducible); the real
    scale concern — Arrow-batched metadata extraction followed by a
    duration-proportional row fan-out, the same shape a whisper-style
    transcription pipeline feeds — is fully exercised."""
    from ..utils import fan_out

    audio = fan_out(df.filter(F.col("media_type") == "audio"), "media_id")

    dur_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("duration_ms", IntegerType(), True),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            durs = []
            for p in pdf["payload"]:
                if p is None:
                    durs.append(None)
                else:
                    digest = hashlib.sha256(p.hex().encode("ascii")).digest()
                    durs.append(500 + int.from_bytes(digest[3:5], "big") % 30000)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values, "duration_ms": durs}
            )

    meta = audio.mapInPandas(decode, schema=dur_schema)
    seg = F.lit(segment_ms)
    idx = F.sequence(
        F.lit(0), F.ceil(F.col("duration_ms") / seg).cast("int") - 1
    )
    return meta.select(
        "media_id",
        F.explode(idx).alias("seg_idx"),
        "duration_ms",
    ).select(
        "media_id",
        F.col("seg_idx").cast("int").alias("seg_idx"),
        (F.col("seg_idx") * seg).cast("int").alias("t_start_ms"),
        F.least((F.col("seg_idx") + 1) * seg, F.col("duration_ms"))
        .cast("int")
        .alias("t_end_ms"),
    )
