"""Multimodal binary-column tests: encode/decode round trip on real
bytes, corrupt-magic rejection, pinned audio features, and the
real-decoder stub contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sensor_data_pipeline_spark.operators.multimodal import (
    _HEADER_FMT,
    MAGIC,
    audio_features,
    decode_media_meta,
    decode_media_real,
    resize_plan,
    sample_frames,
    synthesize_media,
)


def test_encode_decode_round_trip(spark):
    docs = spark.createDataFrame(
        [(0, "an image doc"), (1, "an audio doc"), (2, "a video doc")],
        "doc_id long, text string",
    )
    out = {r.media_id: r for r in decode_media_meta(synthesize_media(docs)).collect()}
    assert out[0].kind == "image" and out[0].n_frames == 1 and out[0].width == 64
    assert out[1].kind == "audio" and out[1].sample_rate == 12000 and out[1].width == 0
    assert out[2].kind == "video" and out[2].n_frames == 18
    assert out[0].payload_len == 256 and out[2].payload_len == 258


def test_decoder_drops_corrupt_magic(spark):
    good = MAGIC["image"] + struct.pack(_HEADER_FMT, 10, 10, 0, 1) + b"xx"
    bad = b"NOPE" + struct.pack(_HEADER_FMT, 10, 10, 0, 1) + b"xx"
    df = spark.createDataFrame([(1, good), (2, bad)], "media_id long, content binary")
    out = decode_media_meta(df).collect()
    assert [r.media_id for r in out] == [1]  # E2: corrupt diverted, job alive


def test_audio_features_pinned_values(spark):
    payload = bytes([10, 20, 30, 40])
    clip = MAGIC["audio"] + struct.pack(_HEADER_FMT, 0, 0, 8000, 0) + payload
    df = spark.createDataFrame([(7, clip)], "media_id long, content binary")
    row = audio_features(df).first()
    arr = np.array([10, 20, 30, 40], dtype=np.float64)
    assert row.n_bytes == 4
    assert row.mean_byte == arr.mean()
    assert row.rms_byte == np.sqrt((arr**2).mean())


def test_resize_plan_aspect_ratio(spark):
    decoded = spark.createDataFrame(
        [(1, "image", 512, 192, 0, 1, 0), (2, "image", 128, 96, 0, 1, 0)],
        "media_id long, kind string, width int, height int, sample_rate int, n_frames int, payload_len long",
    )
    out = {r.media_id: r for r in resize_plan(decoded).collect()}
    # 512x192 -> scale = min(1, .5, 1) = .5 -> 256x96
    assert (out[1].out_w, out[1].out_h) == (256, 96)
    # already fits -> untouched
    assert (out[2].out_w, out[2].out_h) == (128, 96)
    assert out[2].out_rgb_bytes == 128 * 96 * 3


def test_sample_frames_every_k(spark):
    decoded = spark.createDataFrame(
        [(1, "video", 0, 0, 0, 25, 0)],
        "media_id long, kind string, width int, height int, sample_rate int, n_frames int, payload_len long",
    )
    out = sample_frames(decoded, every_k=10).collect()
    assert [r.frame_idx for r in out] == [0, 10, 20]
    assert out[-1].frame_ts_sec == 20 / 25.0


def test_real_decoder_is_a_stub(spark):
    df = spark.createDataFrame([(1, b"x")], "media_id long, content binary")
    with pytest.raises(NotImplementedError):
        decode_media_real(df)
