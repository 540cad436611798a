"""Multimodal column support: image/audio/video as opaque binary
columns + typed metadata, processed via Arrow-batched mapInPandas.

Header decode is REAL and stdlib-only: PNG/GIF/BMP/JPEG dimensions are
parsed from the container's header bytes, WAV duration/rate/channels
via the ``wave`` module (``parse_media_header``). Full pixel/sample
decode (the part that genuinely needs Pillow/ffmpeg) raises
``DecoderNotAvailable`` in ``strict`` mode; the default featurizer
falls back to a deterministic byte-histogram content feature.

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

import io
import struct
import wave
import zlib
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


METADATA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("kind", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("channels", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("n_frames", LongType(), True),
    ]
)


class DecoderNotAvailable(NotImplementedError):
    """Raised by strict decode on payloads whose full decode needs an
    image/audio library not present in this container. Header-level
    decode (dimensions/duration) is stdlib and always available."""


def parse_media_header(payload: bytes) -> dict | None:
    """Container-header parse, stdlib only. Returns a metadata dict
    (kind + dimensions or audio params) or None if unrecognized.

    Formats: PNG (IHDR), GIF87a/89a (logical screen), BMP
    (BITMAPINFOHEADER), JPEG (first SOFn marker), WAV (via ``wave``).
    """
    b = payload or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return {"kind": "png", "width": w, "height": h}
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return {"kind": "gif", "width": w, "height": h}
    if b[:2] == b"BM" and len(b) >= 26:
        # DIB header size at offset 14 disambiguates the two layouts:
        # BITMAPCOREHEADER (12) stores int16 dims, BITMAPINFOHEADER
        # (>=40) stores int32 dims (height sign = row order)
        (dib,) = struct.unpack("<I", b[14:18])
        if dib == 12 and len(b) >= 22:
            w, h = struct.unpack("<HH", b[18:22])
            return {"kind": "bmp", "width": w, "height": h}
        if dib >= 40:
            w, h = struct.unpack("<ii", b[18:26])
            return {"kind": "bmp", "width": w, "height": abs(h)}
        return None
    if b[:3] == b"\xff\xd8\xff":
        # walk JPEG segments to the first frame header (SOF0..SOF15,
        # excluding DHT/JPG/DAC which reuse the C-range)
        i = 2
        while i + 9 <= len(b) and b[i] == 0xFF:
            marker, seglen = b[i + 1], struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return {"kind": "jpeg", "width": w, "height": h}
            i += 2 + seglen
        return None
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        try:
            with wave.open(io.BytesIO(b), "rb") as w:
                return {
                    "kind": "wav",
                    "channels": w.getnchannels(),
                    "sample_rate": w.getframerate(),
                    "n_frames": w.getnframes(),
                }
        except (wave.Error, EOFError, struct.error):
            # truncated/corrupt RIFF raises EOFError/struct.error from
            # the chunk reader, not just wave.Error — all are "not a
            # parseable WAV", never a task-killing exception
            return None
    return None


def _decode_feature(payload: bytes, mime: str, strict: bool) -> list[float]:
    """Content feature for any payload: 8-bucket byte histogram,
    L1-normalized — deterministic and format-agnostic. ``strict``
    demands a recognized media container first (full pixel/sample
    decode beyond the header needs libs absent here)."""
    if strict and parse_media_header(payload) is None:
        raise DecoderNotAvailable(
            "full media decode requires an image/audio library not present "
            "here and the payload has no recognizable container header"
        )
    hist = [0.0] * 8
    for by in payload[:4096]:
        hist[by % 8] += 1.0
    total = sum(hist) or 1.0
    return [h / total for h in hist]


# --- deterministic fixture synthesis (no media files ship in testdata) ----


def png_bytes(width: int, height: int) -> bytes:
    """Minimal standards-valid PNG: magic + IHDR + IEND (45 bytes),
    correct CRCs; no pixel data (header-decode fixture)."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")


def wav_bytes(n_frames: int, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Real (silent) 16-bit PCM WAV via the stdlib writer: 44-byte
    canonical header + 2*n_frames*channels data bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"\x00\x00" * (n_frames * channels))
    return buf.getvalue()


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


def synthesize_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic binary media fixtures keyed on ``id_col``: even
    ids*20 get a real PNG whose dimensions are closed-form functions of
    the id, others a real WAV with id-derived frame count. Lets decode
    tests (and the driver oracle) verify parsed metadata against
    arithmetic on the id — no media files needed in testdata.

        width       = 16 + id % 97          (png rows: id % 20 == 0)
        height      = 16 + (7 * id) % 89
        n_frames    = 100 + id % 400        (wav rows, 8 kHz mono 16-bit)
    """
    src = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mimes = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                if mid % 20 == 0:
                    payloads.append(png_bytes(16 + mid % 97, 16 + (7 * mid) % 89))
                    mimes.append("image/png")
                else:
                    payloads.append(wav_bytes(100 + mid % 400))
                    mimes.append("audio/wav")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": mimes,
                    "n_bytes": [len(p) for p in payloads],
                    "meta_json": ["{}"] * len(payloads),
                }
            )

    return src.mapInPandas(run, MEDIA_SCHEMA)


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Parse container headers (stdlib) into typed metadata columns via
    Arrow-batched mapInPandas — the de-stubbed decode path. Unrecognized
    payloads yield NULL metadata, not errors (poison-pill safety: one
    corrupt object must not kill a 100 TB scan)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fields = ("kind", "width", "height", "channels", "sample_rate", "n_frames")
        for pdf in batches:
            parsed = [
                parse_media_header(p if p is not None else b"")
                for p in pdf["payload"]
            ]
            out = {
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "n_bytes": pdf["n_bytes"],
            }
            for f in fields:
                out[f] = [(h or {}).get(f) for h in parsed]
            yield pd.DataFrame(out)

    return media.mapInPandas(run, METADATA_SCHEMA)


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Featurize payloads via Arrow-batched mapInPandas (8-dim byte
    histogram; ``strict=True`` additionally requires a recognized media
    container, else DecoderNotAvailable).

    Metadata-only predicates should be applied BEFORE this call so the
    parquet scan prunes payload bytes for filtered rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_feature(p if p is not None else b"", m, strict)
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


def sample_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled 'frame'
    (byte-offset slice — real video frame decode needs ffmpeg, absent
    here). The explode-after-decode shape is the production shape."""

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_no", LongType(), False),
            StructField("frame_bytes", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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


ENTROPY_SCHEMA = (
    "media_id long, mime string, n_bytes long, "
    "byte_entropy double, top_byte_frac double"
)


def payload_entropy(media: DataFrame) -> DataFrame:
    """Byte-level Shannon entropy + modal-byte share per payload — the
    corruption/placeholder detector for media corpora: truncated or
    zero-filled blobs collapse toward 0 bits/byte, healthy compressed
    media sits near 8, and a high modal-byte share flags padding even
    at moderate entropy.

    Arrow-batched mapInPandas (the documented exception for byte-level
    work): one numpy bincount per payload, no JVM→Python row loop.
    Entropy is floor-rounded at 6dp so the value is reproducible
    across numpy builds."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ent, top = [], []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload, dtype=np.uint8)
                if len(b) == 0:
                    ent.append(0.0)
                    top.append(1.0)
                    continue
                counts = np.bincount(b, minlength=256)
                p = counts[counts > 0] / len(b)
                h = float(-(p * np.log2(p)).sum())
                ent.append(float(np.floor(h * 1e6 + 0.5) / 1e6))
                top.append(float(np.floor(counts.max() / len(b) * 1e6 + 0.5) / 1e6))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_entropy": ent,
                    "top_byte_frac": top,
                }
            )

    return media.select("media_id", "mime", "n_bytes", "payload").mapInPandas(
        run, ENTROPY_SCHEMA
    )
