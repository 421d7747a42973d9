"""Multimodal (image/audio/video) column plumbing (BASELINE.json north
star). Media lives as opaque `binary` columns + typed metadata structs;
decode/resize/frame-sample run as Arrow-batched mapInPandas kernels.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this image, so
the kernels are stubbed per the build contract: `decode_features` emits
a deterministic fake feature vector derived from the bytes (so the
pipeline is end-to-end testable), and the real decoders raise
NotImplementedError with a clear message. The Spark-side plumbing —
schema, batch iteration, partition sizing — is real and tested.

Scale notes: media bytes never pass through a shuffle here; kernels are
per-partition streaming (mapInPandas iterator), so memory is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch` × avg blob size. For
100 TB media, pair with small parquet row groups and
`spark.sql.files.maxPartitionBytes` sized so one partition of blobs
fits an executor.
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
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("content", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("width", LongType(), True),          # image/video
    StructField("height", LongType(), True),
    StructField("duration_ms", LongType(), True),    # audio/video
])

_FEAT_DIM = 16


def media_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap byte-level stats as plain JVM expressions: size + crc —
    no kernel needed, stays in codegen."""
    return df.withColumn("n_bytes", F.length(F.col(content_col))) \
             .withColumn("crc", F.crc32(F.col(content_col)))


def _fake_embedding(blob: bytes | None) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: sha256 bytes
    → _FEAT_DIM floats in [0,1). Stable across runs and workers."""
    if blob is None:
        return [0.0] * _FEAT_DIM
    digest = hashlib.sha256(blob).digest()
    arr = np.frombuffer(digest[: _FEAT_DIM * 2], dtype=np.uint16)
    return (arr.astype(np.float64) / 65536.0).astype(float).tolist()


def decode_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas kernel: blob → feature vector (stubbed decode).

    Real deployments replace `_fake_embedding` with PIL/torchvision etc;
    the batch shape, output schema and partition behavior are identical.
    """
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [StructField("features", ArrayType(FloatType()), True)]
    )
    keep = [f.name for f in df.schema.fields if f.name != content_col]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[content_col].map(
                lambda b: _fake_embedding(bytes(b) if b is not None else None)
            )
            yield pdf[keep].assign(features=feats)

    return df.mapInPandas(kernel, out_schema)


def decode_image(df: DataFrame, content_col: str = "content",
                 size: tuple[int, int] = (224, 224)) -> DataFrame:
    """Real image decode+resize — requires PIL, absent from this image."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow; use decode_features (stub) for "
            "pipeline plumbing, or install Pillow"
        ) from e
    raise NotImplementedError("PIL present but decoder not implemented yet")


def sample_frames(df: DataFrame, content_col: str = "content",
                  every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — requires ffmpeg bindings, absent here."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg bindings not in this image; "
        "the mapInPandas harness is decode_features"
    )
