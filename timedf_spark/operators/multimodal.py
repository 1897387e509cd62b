"""Multimodal (image/audio/video) column plumbing for LLM-data pipelines.

Model: media = opaque ``binary`` payload + typed ``struct`` metadata
(SURVEY.md §1.2 reserved types). The Spark-side machinery — schemas, Arrow
batch transfer, ``mapInPandas`` signatures, partition-sized batching — is
real and tested; the codec step itself is STUBBED (this container has no
image/audio libraries): ``decode=`` defaults to a deterministic fake that
derives pixel stats from payload bytes, and ``strict=True`` raises
``NotImplementedError`` exactly where a real decoder (PIL/ffmpeg) would
plug in.

Scale notes: mapInPandas streams Arrow record batches — payloads never
materialize as one driver list; per-task memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it down for large
blobs, e.g. 64 for multi-MB images). Feature extraction emits small fixed
schemas so downstream joins/aggregations shed the payload column early —
project features, drop bytes, THEN shuffle.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_FEATURES_SCHEMA",
    "attach_fake_payloads",
    "decode_stub",
    "extract_image_features",
    "sample_frames",
    "resize_images",
    "resize_stub",
]

# media row: payload + metadata struct (what a real ingest would carry)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("mean_byte", DoubleType(), True),
        StructField("std_byte", DoubleType(), True),
        StructField("entropy", DoubleType(), True),
    ]
)


def attach_fake_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents`` (the container
    has no media files): payload = utf-8 bytes of text; metadata from
    doc stats. Exercises BinaryType end-to-end (Parquet-writable, Arrow
    round-trip) without external data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").cast(BinaryType()).alias("payload"),
        F.lit("image").alias("media_type"),
        (F.length("text") % 640).cast("int").alias("width"),
        (F.length("text") % 480).cast("int").alias("height"),
        F.lit(1).cast("int").alias("n_frames"),
    )


def decode_stub(payload: bytes, strict: bool = False) -> dict:
    """Where a real codec goes. strict=True is the honest production path:
    it raises until a decoder library is installed."""
    if strict:
        raise NotImplementedError(
            "media decode requires an image/audio codec library (e.g. PIL, "
            "torchaudio, pyav) — not available in this environment"
        )
    # deterministic fake: derive "pixel" stats from raw bytes
    import numpy as np

    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype("float64")
    p = hist[hist > 0] / arr.size
    return {
        "n_bytes": int(arr.size),
        "mean_byte": float(arr.mean()),
        "std_byte": float(arr.std()),
        "entropy": float(-(p * np.log2(p)).sum()),
    }


def extract_image_features(
    media: DataFrame,
    decode: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow).

    The UDF sees an iterator of pandas batches — constant memory per task
    regardless of table size. Rows per Arrow batch follow the session conf
    ``spark.sql.execution.arrow.maxRecordsPerBatch``; for multi-MB payloads
    set it LOW (e.g. 64) on the session *before building the plan* — the
    conf is read at execution time, so a set/restore bracket around this
    (lazy) call would restore it before any task runs.
    """
    dec = decode or decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [dec(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: explode frame indices
    0..n_frames-1 step every_nth; a real pipeline would mapInPandas-decode
    each (payload, frame_idx). Pure Column ops — the explode happens
    executor-side, so a 2-hour video row fans out without driver involvement."""
    return media.select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_nth))
        ).alias("frame_idx"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def resize_stub(payload: bytes, width: int, height: int, strict: bool = False) -> bytes:
    """Where a real resampler goes (PIL.Image.resize / ffmpeg scale).
    The deterministic fake truncates/pads the byte stream to width*height
    so output size tracks the requested dims — enough to exercise schema,
    batching and memory behavior without a codec."""
    if strict:
        raise NotImplementedError(
            "image resize requires a codec library (e.g. PIL) — not "
            "available in this environment"
        )
    n = max(width, 0) * max(height, 0)
    data = payload or b""
    return data[:n] if len(data) >= n else data + b"\x00" * (n - len(data))


def resize_images(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    resize: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Batch image resize over binary payloads via mapInPandas.

    Same scale contract (and same Arrow batch-sizing caveat) as
    extract_image_features — resize additionally holds input AND output
    buffers per row, so the session's maxRecordsPerBatch matters twice
    over. Output payload replaces input so downstream stages never carry
    both."""
    rs = resize or resize_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "payload": [rs(p, width, height) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )
