"""Multimodal column support: image/audio/video as opaque binary
columns + typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (this container has no image/audio libs —
see ``DecoderNotAvailable``); everything Spark-side is real and tested:
schemas, partition-parallel batch plumbing, UDF signatures, and batch
shapes. Plugging a real decoder means replacing ``_decode_stub`` only.

Design for 100 TB of media:
- binary payloads never hit Python unless the stage needs them —
  metadata predicates (mime/size filters) prune JVM-side first;
- ``mapInPandas`` streams Arrow record batches, bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch, so executor memory is
  batch-sized, not partition-sized;
- frame sampling / resizing emits one row per artifact (explode after
  decode), preserving partition locality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical multimodal schema: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("meta_json", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


class DecoderNotAvailable(NotImplementedError):
    """Raised by the real-decode path: image/audio libs are not in this
    container. Use deterministic_fake=True for plumbing tests."""


def _decode_stub(payload: bytes, mime: str, deterministic_fake: bool) -> list[float]:
    if not deterministic_fake:
        raise DecoderNotAvailable(
            "media decode requires an image/audio library not present here; "
            "re-run with deterministic_fake=True or plug a real decoder"
        )
    # deterministic fake "feature": byte histogram over 8 buckets, L1-normalized
    hist = [0.0] * 8
    for by in payload[:4096]:
        hist[by % 8] += 1.0
    total = sum(hist) or 1.0
    return [h / total for h in hist]


def attach_binary_payload(
    df: DataFrame, source_col: str, id_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Wrap an existing column as a multimodal payload (used in tests:
    text bytes stand in for media bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(source_col), "UTF-8").alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(F.encode(F.col(source_col), "UTF-8"))
        .cast("long")
        .alias("n_bytes"),
        F.to_json(F.struct(F.col(id_col).alias("src_id"))).alias("meta_json"),
    )


def extract_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """Decode + featurize payloads via Arrow-batched mapInPandas.

    Metadata-only predicates should be applied BEFORE this call so the
    parquet scan prunes payload bytes for filtered rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p if p is not None else b"", m, deterministic_fake)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, deterministic_fake: bool = True
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled 'frame'
    (byte-offset slice in the stub). Real video decode replaces the
    slicer; the explode-after-decode shape is the production shape."""

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_no", LongType(), False),
            StructField("frame_bytes", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise DecoderNotAvailable("video decode not available")
            ids, frame_nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = payload if payload is not None else b""
                for i, off in enumerate(range(0, max(len(data), 1), every_n_bytes)):
                    ids.append(mid)
                    frame_nos.append(i)
                    frames.append(bytes(data[off : off + every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame_bytes": frames}
            )

    return media.mapInPandas(run, schema)
