"""TFRecord (operators/tfrecord.py): CRC-32C public vector, masked-CRC
framing, Example wire codec incl. negatives/floats/multi-values,
corruption detection, truncation tolerance."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_etl_self_service_spark.operators.tfrecord import (
    build_example,
    build_tfrecord,
    crc32c,
    iter_tfrecord,
    masked_crc,
    parse_example,
)


def test_crc32c_public_vectors():
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA  # RFC 3720 B.4 vector


def test_example_roundtrip_types():
    feats = {
        "text": [b"hello", b"world"],
        "ids": [0, 1, 127, 128, 300, -1, -(1 << 62)],
        "score": [0.5, -2.25],
    }
    got = parse_example(build_example(feats))
    assert got["text"] == feats["text"]
    assert got["ids"] == feats["ids"]
    assert got["score"] == feats["score"]


def test_framing_roundtrip_and_corruption_flags():
    exs = [build_example({"id": [i]}) for i in range(5)]
    raw = build_tfrecord(exs)
    recs = list(iter_tfrecord(raw))
    assert len(recs) == 5
    assert all(r["len_crc_ok"] and r["data_crc_ok"] for r in recs)
    assert [parse_example(r["payload"])["id"] for r in recs] == [[i] for i in range(5)]
    # flip one payload byte: that record's data CRC flags, others stay ok
    first_len = struct.unpack("<Q", raw[:8])[0]
    bad = bytearray(raw)
    bad[12] ^= 0xFF
    flags = [r["data_crc_ok"] for r in iter_tfrecord(bytes(bad))]
    assert flags[0] is False and all(flags[1:])
    assert first_len == len(exs[0])


def test_truncated_tail_stops_cleanly():
    raw = build_tfrecord([build_example({"id": [7]})] * 3)
    recs = list(iter_tfrecord(raw[:-6]))
    assert len(recs) == 2


def test_masked_crc_differs_from_plain():
    assert masked_crc(b"abc") != crc32c(b"abc")


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300))
def test_iter_never_raises(raw):
    for r in iter_tfrecord(raw):
        assert isinstance(r["payload"], bytes)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300))
def test_parse_example_never_raises(raw):
    assert isinstance(parse_example(raw), dict)


def test_tfrecord_example_rows_exploder(spark):
    shard = build_tfrecord(
        [
            build_example({"text": [b"hello world"], "id": [1]}),
            build_example({"text": [b"second rec"], "id": [2]}),
        ]
    )
    df = spark.createDataFrame(
        [(7, bytearray(shard)), (8, bytearray(b"junk"))],
        "doc_id long, data binary",
    )
    from data_engineering_etl_self_service_spark.operators.tfrecord import (
        tfrecord_example_rows,
    )

    rows = sorted(
        tfrecord_example_rows(df).collect(),
        key=lambda r: (r["doc_id"], r["record_pos"]),
    )
    assert [(r["doc_id"], r["record_pos"], r["text"]) for r in rows] == [
        (7, 0, "hello world"),
        (7, 1, "second rec"),
    ]
    assert all(r["crc_ok"] for r in rows)
    assert rows[0]["feature_names"] == "id,text"
