"""Multimodal plumbing: mapInPandas featurization + frame sampling."""

import hashlib

import pytest

from scones.mediaops import (
    default_decoder,
    extract_media_features,
    fake_decoder,
    sample_frames,
)


def _media_df(spark):
    rows = [
        (1, b"\x89PNG fake image bytes", "image/png"),
        (2, b"RIFF fake audio payload" * 10, "audio/wav"),
        (3, b"", "image/png"),
        (4, None, "video/mp4"),
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, media binary, media_type string"
    )


def test_default_decoder_is_an_honest_stub():
    with pytest.raises(NotImplementedError):
        default_decoder(b"x", "image/png")


def test_fake_decoder_features(spark):
    df = _media_df(spark)
    out = {r.doc_id: r for r in extract_media_features(df, decoder=fake_decoder).collect()}
    assert out[1].feature_fp == hashlib.md5(b"\x89PNG fake image bytes").hexdigest()
    assert out[1].n_bytes == 21
    assert out[3].feature_fp == hashlib.md5(b"").hexdigest()
    assert out[4].n_bytes == 0  # null payload → empty
    assert all(1 <= r.width <= 640 and 1 <= r.height <= 480 for r in out.values())


def test_frame_sampling_shapes(spark):
    df = spark.createDataFrame(
        [(1, bytes(range(256)) * 20)], "doc_id bigint, media binary"
    )  # 5120 bytes → 6 windows at stride 1024 (last partial), capped at 8
    frames = sample_frames(df, every_n_bytes=1024, max_frames=8).collect()
    assert len(frames) == 6
    assert [f.frame_idx for f in frames] == list(range(6))
    assert all(len(f.frame) <= 1024 for f in frames)
    whole = b"".join(bytes(f.frame) for f in sorted(frames, key=lambda x: x.frame_idx))
    assert whole == bytes(range(256)) * 20
