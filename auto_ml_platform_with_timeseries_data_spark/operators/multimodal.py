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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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

_FEAT_DIM = 8


def media_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap byte-level stats as plain JVM expressions: size + crc —
    no kernel needed, stays in codegen."""
    return df.withColumn("n_bytes", F.length(F.col(content_col))) \
             .withColumn("crc", F.crc32(F.col(content_col)))


def _fake_embedding(blob: bytes | None) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: the md5 hex
    digest split into 8 16-bit ints, scaled to [0,1). Stable across runs
    and workers — and expressible in portable SQL (hex-digit arithmetic
    over md5()), so the mapInPandas kernel itself is oracle-checkable."""
    if blob is None:
        return [0.0] * _FEAT_DIM
    hexd = hashlib.md5(blob).hexdigest()
    return [int(hexd[4 * i: 4 * i + 4], 16) / 65536.0 for i in range(_FEAT_DIM)]


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
    """Real image decode+resize — requires PIL, absent from this image.
    The stubbed-but-real-plumbing twin is resize_media below."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow; use resize_media (stub decode) "
            "for pipeline plumbing, or install Pillow"
        ) from e
    raise NotImplementedError("PIL present but decoder not implemented yet")


def resize_media(df: DataFrame, content_col: str = "content",
                 id_col: str = "media_id",
                 out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Image resize kernel with a stubbed decoder: the byte stream is
    treated as row-major 1-byte pixels and top-left-cropped to
    out_w×out_h (deterministic; short blobs keep their length). A real
    deployment swaps the kernel body for PIL/torchvision decode+resize —
    the Arrow batch iteration, binary-in/binary-out schema, and metadata
    update are exactly what the real operator uses. Blobs never shuffle;
    the kernel is map-only."""
    n_out = out_w * out_h

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[content_col].map(
                lambda b: bytes(b)[:n_out] if b is not None else None
            )
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": out_w,
                "height": out_h,
                "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0),
                "content": blobs,
            })

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        f"{id_col} long, width int, height int, n_bytes long, content binary",
    )


def sample_frames(df: DataFrame, content_col: str = "content",
                  id_col: str = "media_id",
                  frame_bytes: int = 64, every: int = 2) -> DataFrame:
    """Video frame-sampling kernel with a stubbed demuxer: the byte
    stream is a sequence of fixed-size frames; every `every`-th frame is
    emitted as its own row — the 1→many generator fan-out shape of real
    frame extraction (ffmpeg swap-in), map-only, with memory bounded by
    one Arrow batch of blobs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                if blob is None:
                    continue
                b = bytes(blob)
                # a zero-length (non-null) blob has no frames — same as
                # null; ceil(len/frame_bytes) is 0 there, matching the
                # q117 oracle's range(0, ceil(nb/64.0))
                for fi in range(0, -(-len(b) // frame_bytes), every):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(b[fi * frame_bytes:(fi + 1) * frame_bytes])
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "n_bytes": pd.Series([len(f) for f in frames], dtype="int64"),
                "frame": frames,
            })

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        f"{id_col} long, frame_idx long, n_bytes long, frame binary",
    )


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------

from auto_ml_platform_with_timeseries_data_spark.registry import query  # noqa: E402
from auto_ml_platform_with_timeseries_data_spark.tables import load_table  # noqa: E402


def documents_as_media(df: DataFrame) -> DataFrame:
    """Fixture adapter: expose `documents` as an opaque-binary media
    table (media_id, kind, content binary, mime). The testdata carries no
    real blobs, so content = utf-8 bytes of the text — the binary-column
    plumbing (schema, Arrow batches, kernels) is identical to real media."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )


@query(
    "q37_media_stats",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS fingerprint
    FROM documents
    """,
)
def q37_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level media profiling on a binary column — JVM-only
    expressions (length + md5 of the blob), no kernel."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.length("content").alias("n_bytes"),
        F.md5("content").alias("fingerprint"),
    )


def _media_features_oracle() -> str:
    # features[i] = int(md5_hex[4i:4i+4], 16) / 65536, via hex-digit
    # arithmetic (strpos over a hex alphabet — portable SQL, no casts
    # from hex literals needed).
    digit = ("(strpos('0123456789abcdef', substr(md5(text), {p}, 1)) - 1)")
    terms = []
    for i in range(_FEAT_DIM):
        base = 4 * i + 1
        term = " + ".join(
            f"{digit.format(p=base + j)} * {16 ** (3 - j)}" for j in range(4)
        )
        terms.append(f"ROUND(({term}) / 65536.0, 6) AS f{i}")
    cols = ",\n           ".join(terms)
    return f"SELECT doc_id AS media_id,\n           {cols}\nFROM documents"


@query("q38_media_features", oracle=_media_features_oracle())
def q38_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode kernel end-to-end: binary column → Arrow-batched
    mapInPandas → fixed-dim feature vector, one column per dimension so
    the oracle hash covers every float. Proves the kernel plumbing
    (batch iteration, schema, null handling) against independent SQL."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = decode_features(media.select("media_id", "content"))
    return feats.select(
        "media_id",
        *[F.round(F.col("features")[i].cast("double"), 6).alias(f"f{i}")
          for i in range(_FEAT_DIM)],
    )


@query(
    "q116_media_resize",
    oracle="""
    SELECT doc_id AS media_id, 16 AS width, 16 AS height,
           CAST(least(256, octet_length(encode(text))) AS BIGINT) AS n_bytes,
           substring(hex(encode(text)), 1, 512) AS content_hex
    FROM documents
    """,
)
def q116_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize kernel end-to-end: binary in → binary out with updated
    (width, height) metadata; the resized blob is hex-encoded JVM-side so
    the oracle hash covers every output byte (DuckDB slices the same
    bytes in the hex domain — it has no blob substring)."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    out = resize_media(media, out_w=16, out_h=16)
    return out.select(
        "media_id", "width", "height", "n_bytes",
        F.hex("content").alias("content_hex"),
    )


@query(
    "q117_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents
    )
    SELECT media_id, fi AS frame_idx,
           CAST(least(64, nb - fi*64) AS BIGINT) AS n_bytes,
           substring(hx, fi*128 + 1, 128) AS frame_hex
    FROM f, LATERAL unnest(range(0, CAST(ceil(nb/64.0) AS BIGINT))) AS t(fi)
    WHERE fi % 2 = 0
    """,
)
def q117_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame-sampling kernel end-to-end: every 2nd 64-byte frame of
    each blob as its own row (generator fan-out), frame bytes verified
    via hex against the oracle's hex-domain slicing."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(media, frame_bytes=64, every=2)
    return frames.select(
        "media_id", "frame_idx", "n_bytes",
        F.hex("frame").alias("frame_hex"),
    )
