"""Multimodal column plumbing (LLM-pipeline surface).

Media (image/audio/video) are opaque ``binary`` columns with typed
metadata. The Spark-side plumbing — schema, partition-preserving batch
processing via ``mapInPandas``, Arrow batch shapes — is real and tested;
the actual codec work is stubbed (the image/audio libraries are not in this
container) behind ``decode_stub``: a clearly-marked deterministic fake that
parses a fake header so tests can assert the full pipeline shape.

At 100 TB: media bytes never shuffle — metadata extraction is a narrow
``mapInPandas`` pass, and any grouping happens on the extracted (small)
metadata columns, not the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media-table schema.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    binary pipeline can be exercised on the driver testdata."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def binary_meta(df: DataFrame) -> DataFrame:
    """Cheap JVM-side metadata: byte length + content digest. No Python.

    This is the hot-path variant — prefer it whenever the metadata needed
    is expressible natively.
    """
    return df.select(
        "media_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha"),
    )


def decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode — deterministic fake in place of a real image codec.

    Real implementation would use PIL/libvips/ffmpeg (not in this
    container). The fake derives a (width, height) from the first payload
    bytes so the pipeline is testable end-to-end. Raise instead if strict
    behavior is wanted: ``NotImplementedError("image codecs not bundled")``.
    """
    if payload is None or len(payload) == 0:
        return (0, 0)
    w = 1 + payload[0] % 64
    h = 1 + payload[-1] % 64
    return (w, h)


def extract_media_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction via ``mapInPandas``.

    Partition-preserving (no shuffle); each Arrow batch is processed as a
    pandas DataFrame; the decode step is `decode_stub`. This is the
    pattern slot for real decode/resize/frame-sample UDFs.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            dims = pdf["payload"].map(
                lambda p: decode_stub(bytes(p) if p is not None else b"")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "sha": pdf["payload"].map(
                        lambda p: hashlib.sha256(
                            bytes(p) if p is not None else b""
                        ).hexdigest()
                    ),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                }
            )

    return df.mapInPandas(_extract, schema=META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_media(df: DataFrame, max_dim: int = 32) -> DataFrame:
    """Resize pipeline slot via ``mapInPandas`` (partition-preserving; the
    blobs never shuffle). The codec is stubbed: "resizing" scales the
    fake-decoded dims to fit ``max_dim`` and truncates the payload
    proportionally — a real implementation swaps in PIL/libvips here,
    keeping the identical schema and Arrow batch shape."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "width": [],
                "height": [],
                "payload": [],
            }
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else b""
                w, h = decode_stub(raw)
                scale = min(1.0, max_dim / max(w, h, 1))
                out["width"].append(int(w * scale) or 1)
                out["height"].append(int(h * scale) or 1)
                keep = max(1, int(len(raw) * scale)) if raw else 0
                out["payload"].append(raw[:keep])
            yield pd.DataFrame(out)

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling slot: one payload row fans out to ``n_frames``
    evenly-spaced "frames" (1-to-N ``mapInPandas`` — output batches need
    not align with input rows). The stub slices the payload into chunks;
    a real implementation swaps in ffmpeg keyframe extraction with the
    same output schema."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                if not raw:
                    continue
                step = max(1, len(raw) // n_frames)
                for i in range(min(n_frames, len(raw))):
                    rows.append((mid, i, raw[i * step : i * step + step]))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in FRAMES_SCHEMA]
                )

    return df.mapInPandas(_sample, schema=FRAMES_SCHEMA)
