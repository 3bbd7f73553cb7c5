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


def test_content_checksum_frames_verified():
    """pyarrow doesn't emit checksums, so hand-build a frame WITH the
    checksum flag: the decoder must verify XXH64(content)&0xFFFFFFFF
    (pinned vectors for xxh64 itself below) and reject a wrong one."""
    from data_engineering_etl_self_service_spark.operators.xxhash import (
        xxh64,
    )

    fhd = bytes([0x24])  # single-segment + checksum, FCS 1 byte
    body = (
        struct.pack("<I", ZSTD_MAGIC)
        + fhd
        + bytes([3])
        + struct.pack("<I", (3 << 3) | (0 << 1) | 1)[:3]
        + b"xyz"
    )
    good = body + struct.pack("<I", xxh64(b"xyz") & 0xFFFFFFFF)
    assert zstd_decompress(good) == b"xyz"
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(body + b"\x00\x00\x00\x00")


def test_xxhash_reference_vectors():
    """operators/xxhash.py against the published XXH sanity vectors."""
    from data_engineering_etl_self_service_spark.operators.xxhash import (
        xxh32,
        xxh64,
    )

    msg80 = b"1234567890" * 8
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(b"message digest") == 0x066ED728FCEEB3BE
    assert xxh64(b"abcdefghijklmnopqrstuvwxyz") == 0xCFE1F278FA89835C
    assert xxh64(msg80) == 0xE04A477F19EE145D
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"message digest") == 0x7C948494
    assert xxh32(msg80) == 0x9C05F475


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


# ----------------------------------------------------------------- lz4


def test_lz4_parity_with_liblz4():
    import pyarrow as pa

    from data_engineering_etl_self_service_spark.operators.lz4 import (
        lz4_decompress,
    )

    rng = random.Random(9)
    words = ["the", "quick", "brown", "fox", "lz4"]
    cases = [
        b"",
        b"a",
        b"A" * 10000,
        " ".join(rng.choice(words) for _ in range(5000)).encode(),
        bytes(rng.randrange(256) for _ in range(3000)),
        (" ".join(rng.choice(words) for _ in range(300000))).encode(),
    ]
    for i in range(60):
        n = rng.randrange(0, 2000)
        cases.append(
            bytes(rng.randrange(256) for _ in range(n))
            if i % 2
            else bytes(rng.randrange(3) for _ in range(n))
        )
    for data in cases:
        for lvl in (None, 1, 9):
            codec = (
                pa.Codec("lz4")
                if lvl is None
                else pa.Codec("lz4", compression_level=lvl)
            )
            assert lz4_decompress(codec.compress(data, asbytes=True)) == data


def test_lz4_handbuilt_frame_with_all_checksums():
    """Frame exercising the options liblz4 doesn't emit by default:
    per-block checksums, content size, content checksum, an
    uncompressed block, and a skippable frame prefix — every checksum
    VERIFIED (flip any and the decode fails loudly)."""
    from data_engineering_etl_self_service_spark.operators.lz4 import (
        LZ4_MAGIC,
        lz4_decompress,
    )
    from data_engineering_etl_self_service_spark.operators.xxhash import (
        xxh32,
    )

    content = b"hello hello hello lz4 frame format"
    # hand-coded LZ4 sequences:
    #   seq1: literals "hello " (6) + match(offset=6, len=12)
    #         -> "hello hello hello " (18 bytes)
    #   seq2 (final, literals only): "lz4 frame format" (16 literals,
    #         lit nibble 15 + extension byte 1, match nibble 0)
    blk = bytes([(6 << 4) | (12 - 4)]) + b"hello " + struct.pack("<H", 6)
    blk += bytes([0xF0, 1]) + b"lz4 frame format"

    def frame(flg_extra=0):
        flg = 0b01100000 | 0x10 | 0x08 | 0x04 | flg_extra  # indep+bsum+csize+csum
        bd = 0x40
        desc = bytes([flg, bd]) + struct.pack("<Q", len(content))
        hc = (xxh32(desc) >> 8) & 0xFF
        out = struct.pack("<I", 0x184D2A51) + struct.pack("<I", 3) + b"xyz"
        out += struct.pack("<I", LZ4_MAGIC) + desc + bytes([hc])
        out += struct.pack("<I", len(blk)) + blk
        out += struct.pack("<I", xxh32(blk))
        tail = b""  # no second block; content fits one
        out += tail
        out += struct.pack("<I", 0)  # EndMark
        out += struct.pack("<I", xxh32(content))
        return out

    good = frame()
    assert lz4_decompress(good) == content
    # flip one bit in the stored block -> block checksum catches it
    bad = bytearray(good)
    blk_pos = good.index(blk)
    bad[blk_pos + 2] ^= 1
    with pytest.raises(ValueError, match="checksum"):
        lz4_decompress(bytes(bad))
    # header checksum catches descriptor tampering
    bad2 = bytearray(good)
    flg_pos = good.index(struct.pack("<I", LZ4_MAGIC)) + 4
    bad2[flg_pos] ^= 0x10
    with pytest.raises(ValueError, match="checksum|reserved"):
        lz4_decompress(bytes(bad2))


def test_lz4_corruption_and_truncation_fail_loudly():
    import pyarrow as pa

    from data_engineering_etl_self_service_spark.operators.lz4 import (
        lz4_decompress,
    )

    data = b"some text that compresses " * 50
    good = pa.Codec("lz4").compress(data, asbytes=True)
    for cut in (1, 3, 5, 9, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            lz4_decompress(good[:cut])
    with pytest.raises(ValueError, match="magic"):
        lz4_decompress(b"\x00" * 12)
    # liblz4 emits no content checksum by default, so retrofit one with
    # our own tools (flip FLG bit 2, recompute the header checksum,
    # append XXH32(content)): now EVERY content-affecting flip must
    # raise — a successful decode can only ever equal the original
    # (the only surviving flips are spec-dead bits like the final
    # token's unused match nibble).
    from data_engineering_etl_self_service_spark.operators.xxhash import (
        xxh32,
    )

    flg = good[4] | 0x04
    desc = bytes([flg]) + good[5:6]
    hc = (xxh32(desc) >> 8) & 0xFF
    checked = good[:4] + desc + bytes([hc]) + good[7:] + struct.pack(
        "<I", xxh32(data)
    )
    assert lz4_decompress(checked) == data
    rng = random.Random(5)
    for _ in range(200):
        bad = bytearray(checked)
        bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        try:
            out = lz4_decompress(bytes(bad))
        except ValueError:
            continue
        assert out == data  # dead-bit flip; wrong output is impossible


def test_stored_writers_native_and_pure_readers():
    """zstd_compress_stored / lz4_compress_stored emit VALID frames:
    both the pure decoders AND the native libzstd/liblz4 readers
    (pyarrow) must recover the exact bytes — the no-dependency WRITE
    path for .zst/.lz4 artifacts."""
    import io

    import pyarrow as pa

    from data_engineering_etl_self_service_spark.operators.lz4 import (
        lz4_compress_stored,
        lz4_decompress,
    )
    from data_engineering_etl_self_service_spark.operators.zstd import (
        zstd_compress_stored,
    )

    rng = random.Random(1)
    cases = [
        b"",
        b"x",
        b"A" * 100000,  # exercises the zstd RLE-block win
        bytes(rng.randrange(256) for _ in range(70000)),
        b"hello world " * 5000,
        bytes([7]) * 300 + b"tail",
    ]
    for data in cases:
        z = zstd_compress_stored(data, block_size=3000)
        l4 = lz4_compress_stored(data, block_size=3000)
        assert zstd_decompress(z) == data
        assert lz4_decompress(l4) == data
        assert pa.input_stream(io.BytesIO(z), compression="zstd").read() == data
        assert pa.input_stream(io.BytesIO(l4), compression="lz4").read() == data
    # the checksums the writers stamp are load-bearing: flip a payload
    # byte and both pure readers must reject
    z = bytearray(zstd_compress_stored(b"payload bytes here"))
    z[-6] ^= 1
    with pytest.raises(ValueError):
        zstd_decompress(bytes(z))
    l4 = bytearray(lz4_compress_stored(b"payload bytes here"))
    l4[20] ^= 1
    with pytest.raises(ValueError):
        lz4_decompress(bytes(l4))


def test_crafted_huffman_weight_bomb_rejected():
    """A crafted frame whose Huffman description claims out-of-spec
    weights must raise ValueError BEFORE allocating 2^weight table
    slots (review r7: a ~50-byte payload could OOM the executor)."""
    from data_engineering_etl_self_service_spark.operators.zstd import (
        _huffman_from_weights,
    )

    with pytest.raises(ValueError, match="bound"):
        _huffman_from_weights([60, 1])
    with pytest.raises(ValueError, match="bound"):
        _huffman_from_weights([12, 12, 12])


def test_skippable_frame_size_past_eof_raises():
    data = b"content " * 30
    for comp, fn in (("zstd", zstd_decompress),):
        good = _comp(data)
        bad = good + struct.pack("<II", 0x184D2A51, 100) + b"xx"
        with pytest.raises(ValueError, match="skippable"):
            fn(bad)
    from data_engineering_etl_self_service_spark.operators.lz4 import (
        lz4_compress_stored,
        lz4_decompress,
    )

    bad = (
        lz4_compress_stored(data)
        + struct.pack("<II", 0x184D2A51, 100)
        + b"xx"
    )
    with pytest.raises(ValueError, match="skippable"):
        lz4_decompress(bad)


def test_lz4_truncation_in_struct_fields_raises_valueerror():
    """Truncation inside the content-size field / checksum words must
    surface as the documented ValueError, not struct.error."""
    from data_engineering_etl_self_service_spark.operators.lz4 import (
        lz4_compress_stored,
        lz4_decompress,
    )

    good = lz4_compress_stored(b"payload " * 20)
    for cut in range(5, len(good), 3):
        try:
            lz4_decompress(good[:cut])
        except ValueError:
            continue
        raise AssertionError(f"no ValueError at cut {cut}")


def test_lz4_real_compressor_roundtrips_both_decoders():
    """lz4_compress (round 8 — REAL greedy block compression, not the
    stored-block writer): every entropy profile and edge size decodes
    bit-identically with BOTH liblz4 and the pure decoder, repetitive
    data actually shrinks, and incompressible blocks take the stored
    escape so output never blows up."""
    import hashlib
    import io

    from data_engineering_etl_self_service_spark.operators.lz4 import (
        lz4_compress,
        lz4_decompress,
    )

    rng = random.Random(8)
    rnd_bytes = b"".join(
        hashlib.sha256(str(i).encode()).digest() for i in range(300)
    )
    profiles = {
        "empty": b"",
        "one": b"x",
        "twelve": b"abcabcabcabc",  # < 13 bytes: all-literal rule
        "thirteen": b"abcabcabcabca",
        "rle": b"a" * 50_000,  # offset-1 overlapping matches
        "text": (b"the quick brown fox jumps over the lazy dog " * 800),
        "periodic": bytes(range(251)) * 97,
        "random": rnd_bytes,
        "mixed": b"".join(
            bytes([rng.randrange(4)]) * rng.randrange(1, 40)
            for _ in range(2_000)
        ),
        "multiblock": b"spark " * 100_000,  # > one 256 KiB block
    }
    for name, data in profiles.items():
        frame = lz4_compress(data)
        assert lz4_decompress(frame) == data, name
        got = pa.input_stream(
            io.BytesIO(frame), compression="lz4"
        ).read()
        assert got == data, f"liblz4 rejects/{name}"
        # framing overhead is bounded even for incompressible input
        assert len(frame) <= len(data) + 4 * (len(data) // (1 << 18) + 1) + 27, name
    assert len(lz4_compress(profiles["rle"])) < len(profiles["rle"]) // 100
    assert len(lz4_compress(profiles["text"])) < len(profiles["text"]) // 10


def test_lz4_compressor_fuzz_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_engineering_etl_self_service_spark.operators.lz4 import (
        lz4_compress,
        lz4_decompress,
    )

    @settings(max_examples=120, deadline=None)
    @given(st.binary(max_size=2_000))
    def check(data):
        assert lz4_decompress(lz4_compress(data)) == data

    check()


def test_zstd_real_compressor_roundtrips_both_decoders():
    """zstd_compress (round 8 — REAL compressed blocks: raw literals +
    predefined-FSE sequences, the encoder inverting zstd.py's decoder
    state machine): every profile decodes bit-identically with BOTH
    libzstd and the pure decoder, repetitive data shrinks by orders of
    magnitude, and incompressible blocks take the Raw escape."""
    import hashlib
    import io

    from data_engineering_etl_self_service_spark.operators.zstd import (
        zstd_decompress,
    )
    from data_engineering_etl_self_service_spark.operators.zstd_enc import (
        zstd_compress,
    )

    rng = random.Random(7)
    profiles = {
        "empty": b"",
        "one": b"z",
        "tiny": b"abcd",
        "rle": b"a" * 300_000,  # offset-1 overlap through FSE coding
        "text": b"the quick brown fox jumps over the lazy dog " * 3000,
        "periodic": bytes(range(251)) * 517,  # spans 64 KiB blocks
        "random": b"".join(
            hashlib.sha256(str(i).encode()).digest() for i in range(2000)
        ),
        "mixed": b"".join(
            bytes([rng.randrange(5)]) * rng.randrange(1, 50)
            for _ in range(5000)
        ),
    }
    for name, data in profiles.items():
        frame = zstd_compress(data)
        assert zstd_decompress(frame) == data, name
        got = pa.input_stream(
            io.BytesIO(frame), compression="zstd"
        ).read()
        assert got == data, f"libzstd rejects/{name}"
    assert len(zstd_compress(profiles["rle"])) < 100
    assert len(zstd_compress(profiles["text"])) < len(profiles["text"]) // 100
    # incompressible input: raw-block escape bounds the overhead
    rnd = profiles["random"]
    assert len(zstd_compress(rnd)) <= len(rnd) + 3 * (len(rnd) // (1 << 16) + 1) + 17


def test_zstd_compressor_fuzz_roundtrip():
    """Hypothesis + structured fuzz: arbitrary and low-entropy inputs
    round-trip through (pure encode -> pure decode) AND
    (pure encode -> libzstd)."""
    import io

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_engineering_etl_self_service_spark.operators.zstd import (
        zstd_decompress,
    )
    from data_engineering_etl_self_service_spark.operators.zstd_enc import (
        zstd_compress,
    )

    @settings(max_examples=120, deadline=None)
    @given(st.binary(max_size=3_000))
    def check(data):
        frame = zstd_compress(data)
        assert zstd_decompress(frame) == data
        assert (
            pa.input_stream(io.BytesIO(frame), compression="zstd").read()
            == data
        )

    check()
    # low-entropy alphabet (match-heavy paths, multi-byte runs)
    rng = random.Random(3)
    for _ in range(60):
        data = bytes(
            rng.choice(b"abcab") for _ in range(rng.randrange(0, 4000))
        )
        frame = zstd_compress(data)
        assert zstd_decompress(frame) == data
        assert (
            pa.input_stream(io.BytesIO(frame), compression="zstd").read()
            == data
        )


def test_snappy_pure_codec_parity_with_libsnappy():
    """Pure raw-snappy codec (round 8): our encode decodes with
    libsnappy, libsnappy's encode decodes with us, self round-trips
    across entropy profiles + fuzz, and malformed inputs raise
    ValueError."""
    import hashlib

    from data_engineering_etl_self_service_spark.operators.snappy import (
        snappy_compress,
        snappy_decompress,
    )

    rng = random.Random(11)
    profiles = [
        b"",
        b"x",
        b"a" * 100_000,
        b"the quick brown fox jumps over the lazy dog " * 2000,
        b"".join(
            hashlib.sha256(str(i).encode()).digest() for i in range(800)
        ),
        b"".join(
            bytes([rng.randrange(5)]) * rng.randrange(1, 50)
            for _ in range(3000)
        ),
    ]
    lib = pa.Codec("snappy")
    for data in profiles:
        ours = snappy_compress(data)
        assert snappy_decompress(ours) == data
        assert (
            lib.decompress(ours, decompressed_size=len(data), asbytes=True)
            == data
        )
        assert snappy_decompress(lib.compress(data, asbytes=True)) == data
    assert len(snappy_compress(profiles[2])) < len(profiles[2]) // 10
    for _ in range(150):
        m = rng.randrange(0, 2000)
        data = bytes(rng.choice(b"pqrpq") for _ in range(m))
        assert snappy_decompress(snappy_compress(data)) == data
    for bad in (b"", b"\xff\xff\xff\xff\xff\xff", b"\x05\x10ab",
                b"\x04\x09\x01\x00"):
        with pytest.raises(ValueError):
            snappy_decompress(bad)


def test_zstd_compressor_huffman_literals():
    """Huffman-compressed literals (round 8b): entropy-coded literal
    sections decode through BOTH decoders; a low-entropy literal-heavy
    input approaches the ideal bits/symbol (beating raw literals by
    ~2.6x here); the literals-only candidate wins over a marginal LZ
    parse on near-random small-alphabet data; RLE literal sections
    cover single-byte runs."""
    import io

    from data_engineering_etl_self_service_spark.operators.zstd import (
        zstd_decompress,
    )
    from data_engineering_etl_self_service_spark.operators.zstd_enc import (
        zstd_compress,
    )

    rng = random.Random(5)
    # 8 roughly-uniform symbols -> ideal 3 bits/symbol; the greedy LZ
    # parse alone coded this WORSE than raw before the literals-only
    # candidate
    litonly = bytes(rng.choice(b"abcdefgh") for _ in range(50_000))
    frame = zstd_compress(litonly)
    assert len(frame) < 20_000  # ~3/8 of input + framing
    assert zstd_decompress(frame) == litonly
    assert (
        pa.input_stream(io.BytesIO(frame), compression="zstd").read()
        == litonly
    )
    # skewed frequencies exercise the length-limit Kraft repair
    skew = b"".join(
        bytes([s]) * f
        for s, f in zip(range(40), [3 ** min(i, 12) for i in range(40)])
    )
    skew = bytes(rng.sample(skew * 1, len(skew)))  # shuffle
    f2 = zstd_compress(skew)
    assert zstd_decompress(f2) == skew
    assert (
        pa.input_stream(io.BytesIO(f2), compression="zstd").read() == skew
    )
    # single-distinct-byte literal runs take the RLE literal form
    rle = b"q" * 100_000
    f3 = zstd_compress(rle)
    assert len(f3) < 60
    assert zstd_decompress(f3) == rle


def test_codec_hardening_round8b():
    """Second-review fixes: bounded decompression raises BEFORE
    materializing bombs; block_size guards; the 3-byte sequence-count
    form handles match-dense 128 KiB blocks."""
    import io

    from data_engineering_etl_self_service_spark.operators.lz4 import (
        lz4_compress,
    )
    from data_engineering_etl_self_service_spark.operators.snappy import (
        snappy_compress,
        snappy_decompress,
    )
    from data_engineering_etl_self_service_spark.operators.zstd import (
        zstd_decompress,
    )
    from data_engineering_etl_self_service_spark.operators.zstd_enc import (
        zstd_compress,
    )

    # zstd max_out: a high-ratio frame must raise without materializing
    big = zstd_compress(b"a" * (1 << 20))
    assert len(big) < 200
    assert zstd_decompress(big, max_out=1 << 20) == b"a" * (1 << 20)
    with pytest.raises(ValueError, match="bound"):
        zstd_decompress(big, max_out=1 << 10)
    # snappy: crafted block declaring a small n but emitting more
    # output raises mid-decode (declared length IS the budget)
    body = snappy_compress(b"xy" * 600)
    small_n = bytes([10]) + body[2:]  # preamble says 10 bytes
    with pytest.raises(ValueError, match="length|exceeds"):
        snappy_decompress(small_n)
    # block_size guards: zero/negative loop forever without them
    for bad in (0, -1, (4 << 20) + 1):
        with pytest.raises(ValueError, match="block_size"):
            lz4_compress(b"data", block_size=bad)
    for bad in (0, -1, (1 << 17) + 1):
        with pytest.raises(ValueError, match="block_size"):
            zstd_compress(b"data", block_size=bad)
    # 3-byte Number_of_Sequences form: a 128 KiB block of back-to-back
    # 4-byte matches exceeds the 2-byte ceiling on VALID input
    rng = random.Random(13)
    vocab = [bytes([rng.randrange(256) for _ in range(4)]) for _ in range(700)]
    dense = b"".join(rng.choice(vocab) for _ in range(32 * 1024))  # 128 KiB
    frame = zstd_compress(dense, block_size=1 << 17)
    assert zstd_decompress(frame) == dense
    assert (
        pa.input_stream(io.BytesIO(frame), compression="zstd").read()
        == dense
    )


def test_dictionary_frame_specific_error_all_paths():
    """VERDICT r8 #6: a zstd frame naming an external dictionary must
    fail with a DISTINCT actionable error — naming the dictionary id
    and the missing piece — through the raw decoder, the sniffing
    front door (ok=False passthrough + error message), and the Avro
    OCF block path (loud). The spec's explicit Dictionary_ID=0 form
    ('no dictionary') must still decode."""
    from data_engineering_etl_self_service_spark.operators.encoding import (
        sniff_decompress,
    )
    from data_engineering_etl_self_service_spark.operators.zstd import (
        zstd_dictionary_id,
    )
    from data_engineering_etl_self_service_spark.operators.zstd_enc import (
        zstd_compress,
    )
    from data_engineering_etl_self_service_spark.sources.avro_ocf import (
        _decompress_block,
    )

    payload = b"hello dictionary world " * 40
    frame = zstd_compress(payload)
    assert zstd_decompress(frame) == payload
    assert zstd_dictionary_id(frame) is None
    # graft a 1-byte Dictionary_ID=7 into the real frame header
    fhd = frame[4]
    assert fhd & 3 == 0
    ins = 5 if fhd & 0x20 else 6  # after Window_Descriptor if present
    crafted = (
        frame[:4] + bytes([fhd | 0x01]) + frame[5:ins] + b"\x07"
        + frame[ins:]
    )
    assert zstd_dictionary_id(crafted) == 7
    with pytest.raises(
        ValueError, match=r"dictionary_id=7.*requires its external"
    ):
        zstd_decompress(crafted)
    # sniffing front door: bytes pass through with the specific reason
    r = sniff_decompress(crafted)
    assert r["compression"] == "zstd" and r["ok"] is False
    assert r["data"] == crafted
    assert "requires its external dictionary" in r["error"]
    assert "dictionary_id=7" in r["error"]
    # OCF block path: loud, specific
    with pytest.raises(
        ValueError, match=r"avro: zstd dictionary frame \(dictionary_id=7\)"
    ):
        _decompress_block(crafted, "zstd")
    # Dictionary_ID=0 is the spec's 'no dictionary' encoding: decodes
    crafted0 = (
        frame[:4] + bytes([fhd | 0x01]) + frame[5:ins] + b"\x00"
        + frame[ins:]
    )
    assert zstd_dictionary_id(crafted0) is None
    assert zstd_decompress(crafted0) == payload


def test_rep_offset_codes_shrink_structured_data():
    """VERDICT r8 #7: repeat-offset emission. The encoder walks the
    decoder's three-slot offset history (ll==0 remap + rep1-1 form
    included) and emits Offset_Value 1-3 when the match offset sits in
    it. Structured data with a dominant stride must shrink vs the
    literal-offset form, and every frame must decode bit-identically
    through BOTH libzstd and the pure decoder."""
    import io

    from data_engineering_etl_self_service_spark.operators.zstd_enc import (
        zstd_compress,
    )

    def lib_decode(frame):
        return pa.input_stream(
            io.BytesIO(frame), compression="zstd"
        ).read()

    rng = random.Random(11)
    words = ["alpha", "beta", "gamma", "delta", "zstd"]
    stride = b"".join(
        b"key%04d=value%04d;" % (i, i % 50) for i in range(4000)
    )
    profiles = [
        stride,  # constant stride -> rep1 dominates
        b"AB" * 5000,
        " ".join(rng.choice(words) for _ in range(8000)).encode(),
        bytes(rng.randrange(4) for _ in range(50000)),
        # multi-block: the history must thread ACROSS 64 KiB blocks
        stride * 3,
    ]
    for i, d in enumerate(profiles):
        f_rep = zstd_compress(d)
        f_lit = zstd_compress(d, use_rep_offsets=False)
        assert zstd_decompress(f_rep) == d, i
        assert zstd_decompress(f_lit) == d, i
        assert lib_decode(f_rep) == d, i
        assert lib_decode(f_lit) == d, i
        assert len(f_rep) <= len(f_lit), i
    # the stride profile must improve MATERIALLY, not incidentally
    assert len(zstd_compress(stride)) < 0.7 * len(
        zstd_compress(stride, use_rep_offsets=False)
    )
