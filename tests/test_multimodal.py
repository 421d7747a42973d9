"""Multimodal plumbing: binary columns through Arrow mapInPandas kernels
(decode stubbed per the build contract; plumbing real and tested)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from auto_ml_platform_with_timeseries_data_spark.operators import multimodal as mm


def _media_df(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNG fake image bytes"), "image/png", 64, 64, None),
        (2, "image", bytearray(b"\x89PNG other bytes"), "image/png", 32, 32, None),
        (3, "audio", bytearray(b"RIFF fake wav"), "audio/wav", None, None, 1200),
        (4, "image", None, "image/png", 8, 8, None),  # missing blob
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_media_stats_jvm_side(spark):
    got = {r["media_id"]: r for r in _media_df(spark)
           .transform(mm.media_stats).collect()}
    assert got[1]["n_bytes"] == 21
    assert got[4]["n_bytes"] is None
    assert got[1]["crc"] != got[2]["crc"]


def test_decode_features_schema_and_determinism(spark):
    out = mm.decode_features(_media_df(spark))
    assert "content" not in out.columns
    assert dict(out.dtypes)["features"] == "array<float>"
    a = {r["media_id"]: r["features"] for r in out.collect()}
    b = {r["media_id"]: r["features"] for r in mm.decode_features(_media_df(spark)).collect()}
    assert a == b                      # deterministic across runs
    assert len(a[1]) == 8
    assert a[1] != a[2]                # distinct blobs → distinct features
    assert a[4] == [0.0] * 8           # null blob → zero vector


def test_real_decoders_raise_cleanly(spark):
    with pytest.raises(NotImplementedError):
        mm.decode_image(_media_df(spark))
    with pytest.raises(NotImplementedError):
        mm.sample_frames(_media_df(spark))
