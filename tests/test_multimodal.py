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


def test_real_decoder_raises_cleanly(spark):
    with pytest.raises(NotImplementedError):
        mm.decode_image(_media_df(spark))


def test_resize_media_crop_and_metadata(spark):
    out = {r["media_id"]: r for r in
           mm.resize_media(_media_df(spark), out_w=2, out_h=3).collect()}
    assert out[1]["content"] == b"\x89PNG f"      # top-left 6 bytes
    assert (out[1]["width"], out[1]["height"]) == (2, 3)
    assert out[1]["n_bytes"] == 6
    assert out[3]["content"] == b"RIFF f"
    assert out[4]["content"] is None and out[4]["n_bytes"] == 0
    # short blob: kept whole, n_bytes reflects the truncation shortfall
    tiny = mm.resize_media(_media_df(spark), out_w=100, out_h=100).collect()
    tiny = {r["media_id"]: r for r in tiny}
    assert tiny[2]["n_bytes"] == 16 and len(tiny[2]["content"]) == 16


def test_sample_frames_fan_out(spark):
    out = mm.sample_frames(_media_df(spark), frame_bytes=4, every=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["media_id"], []).append(r)
    # doc 1: 21 bytes → 6 frames (0..5), sampled 0,2,4
    idx1 = sorted(r["frame_idx"] for r in by_doc[1])
    assert idx1 == [0, 2, 4]
    f0 = next(r for r in by_doc[1] if r["frame_idx"] == 0)
    assert f0["frame"] == b"\x89PNG" and f0["n_bytes"] == 4
    last = next(r for r in by_doc[1] if r["frame_idx"] == 4)
    assert last["n_bytes"] == 4                   # 21 bytes: frame 4 full
    # null blob emits no frames
    assert 4 not in by_doc
