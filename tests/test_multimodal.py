"""Multimodal plumbing: metadata pass, stubbed decode, frame fan-out."""

from __future__ import annotations

import pytest

from data_engineering_etl_self_service_spark.operators.multimodal import (
    attach_binary_metadata,
    extract_features,
    frame_sample_plan,
)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _payloads(spark):
    rows = [
        (0, bytearray(PNG_MAGIC + b"fakepngdata")),
        (1, bytearray(b"\xff\xd8\xffjpegish")),
        (2, bytearray(b"plain text bytes")),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_metadata_no_decode(spark):
    out = {r.doc_id: r for r in attach_binary_metadata(_payloads(spark)).collect()}
    assert out[0].format == "png"
    assert out[1].format == "jpeg"
    assert out[2].format == "unknown"
    assert out[2].n_bytes == len(b"plain text bytes")
    assert len(out[0].payload_sha) == 64


def test_feature_extraction_stub_deterministic(spark):
    a = extract_features(_payloads(spark), feature_dim=4).collect()
    b = extract_features(_payloads(spark), feature_dim=4).collect()
    fa = {r.doc_id: list(r.features) for r in a}
    fb = {r.doc_id: list(r.features) for r in b}
    assert fa == fb
    assert all(len(v) == 4 for v in fa.values())


def test_feature_extraction_real_codec_is_explicit_stub(spark):
    with pytest.raises(Exception) as e:
        extract_features(_payloads(spark), decode_stub=False).collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, NotImplementedError
    )


def test_frame_sample_fan_out(spark):
    big = spark.createDataFrame(
        [(0, bytearray(b"x" * 2500))], "doc_id long, payload binary"
    )
    frames = frame_sample_plan(big, every_n=10).collect()
    assert len(frames) == 3  # 2500 // 1000 + 1
    assert [f.frame_idx for f in frames] == [0, 10, 20]
    assert len({f.frame_sha for f in frames}) == 3
