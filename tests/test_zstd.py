"""Pure-Python RFC 8878 zstd decoder (operators/zstd.py): parity with
pyarrow's libzstd compressor, hand-built frames, corruption fuzz."""

from __future__ import annotations

import random
import struct

import pyarrow as pa
import pytest

from data_engineering_etl_self_service_spark.operators.zstd import (
    ZSTD_MAGIC,
    zstd_decompress,
)


def _comp(data: bytes, level=None) -> bytes:
    codec = (
        pa.Codec("zstd")
        if level is None
        else pa.Codec("zstd", compression_level=level)
    )
    return codec.compress(data, asbytes=True)


def _profiles():
    rng = random.Random(42)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "zstd"]
    return [
        b"",
        b"a",
        b"hello world",
        b"A" * 10000,  # RLE blocks
        b"AB" * 5000,
        " ".join(rng.choice(words) for _ in range(5000)).encode(),
        bytes(rng.randrange(256) for _ in range(3000)),  # raw blocks
        bytes(rng.randrange(4) for _ in range(100000)),  # low entropy
        # > one 128 KiB block → matches reach into PREVIOUS blocks of
        # the same frame (the window spans the frame, regression-pinned)
        (" ".join(rng.choice(words) for _ in range(120000))).encode(),
    ]


@pytest.mark.parametrize("level", [None, 1, 3, 9, 19])
def test_parity_with_libzstd_across_profiles(level):
    """Every entropy profile × compression level round-trips exactly.
    Level sweep matters: low levels emit more raw/RLE literals, high
    levels denser Huffman tables, FSE-compressed distributions, and
    4-stream literal sections."""
    for data in _profiles():
        assert zstd_decompress(_comp(data, level)) == data


def test_parity_fuzz_many_small_inputs():
    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta"]
    for i in range(120):
        n = rng.randrange(0, 3000)
        kind = i % 4
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            data = bytes(rng.randrange(3) for _ in range(n))
        elif kind == 2:
            data = " ".join(
                rng.choice(words) for _ in range(n // 4)
            ).encode()
        else:
            data = bytes([rng.randrange(256)]) * n
        level = [1, 3, 9, 19][i % 4]
        assert zstd_decompress(_comp(data, level)) == data


def test_handbuilt_raw_and_rle_blocks_and_skippable_frame():
    """Frames this decoder can be FED without libzstd: hand-assembled
    raw + RLE blocks (the spec's simplest shapes) preceded by a
    skippable frame, which must be skipped per spec."""
    skippable = struct.pack("<II", 0x184D2A53, 5) + b"metaX"
    fhd = bytes([0x20])  # single-segment, FCS size 1
    fcs = bytes([9])  # 4 + 5
    raw_block = struct.pack("<I", (4 << 3) | (0 << 1) | 0)[:3] + b"abcd"
    rle_block = struct.pack("<I", (5 << 3) | (1 << 1) | 1)[:3] + b"z"
    frame = struct.pack("<I", ZSTD_MAGIC) + fhd + fcs + raw_block + rle_block
    assert zstd_decompress(skippable + frame) == b"abcd" + b"z" * 5


def test_multi_frame_concatenation():
    a, b = b"first frame " * 100, b"second " * 333
    assert zstd_decompress(_comp(a) + _comp(b, 19)) == a + b


def test_content_checksum_frames_decode():
    """pyarrow doesn't emit checksums, so hand-flip the frame-header
    descriptor path instead: build a frame WITH the checksum flag and
    4 trailing bytes; the decoder consumes them and still verifies the
    content size."""
    fhd = bytes([0x24])  # single-segment + checksum, FCS 1 byte
    frame = (
        struct.pack("<I", ZSTD_MAGIC)
        + fhd
        + bytes([3])
        + struct.pack("<I", (3 << 3) | (0 << 1) | 1)[:3]
        + b"xyz"
        + b"\x00\x00\x00\x00"  # unverified xxhash32 slot
    )
    assert zstd_decompress(frame) == b"xyz"


def test_dictionary_frames_rejected_loudly():
    fhd = bytes([0x21])  # single-segment + 1-byte Dictionary_ID
    frame = struct.pack("<I", ZSTD_MAGIC) + fhd + bytes([7, 0])
    with pytest.raises(ValueError, match="dictionary"):
        zstd_decompress(frame)


def test_corruption_fuzz_fails_loudly_never_wrong():
    """Flip one byte anywhere in a valid frame: the decoder must either
    raise ValueError or — if the flip lands in literal payload bytes —
    produce output that differs from the original; it must NEVER hang
    or return the original bytes for a corrupted stream... except where
    the flipped byte is genuinely don't-care (none exist in this frame:
    no checksum, no skippable padding)."""
    rng = random.Random(3)
    data = (b"some text that compresses " * 40) + bytes(range(256))
    good = _comp(data, 19)
    for _ in range(200):
        pos = rng.randrange(len(good))
        bad = bytearray(good)
        old = bad[pos]
        bad[pos] ^= 1 << rng.randrange(8)
        try:
            out = zstd_decompress(bytes(bad))
        except (ValueError, IndexError):
            continue
        # decoded without structural error → the output reflects the flip
        # or the flip was in a dead field (window descriptor bounds)
        if out == data:
            # only the window-descriptor byte is semantics-free here
            assert pos in (4,) or bad[pos] == old, pos


def test_truncation_always_raises():
    data = b"truncate me " * 100
    good = _comp(data, 9)
    for cut in (1, 2, 3, 4, 5, 7, 10, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            zstd_decompress(good[:cut])
    with pytest.raises(ValueError):
        zstd_decompress(b"")
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00" * 16)
