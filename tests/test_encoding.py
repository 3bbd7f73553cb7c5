"""Charset sniffing (operators/encoding.py): BOM ladder, UTF-16
heuristic, fall-through, replacement accounting, fuzz totality."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_etl_self_service_spark.operators.encoding import (
    sniff_decode,
)


def test_bom_ladder_priority():
    # UTF-32 LE BOM starts with the UTF-16 LE BOM bytes: longest wins
    raw32 = b"\xff\xfe\x00\x00" + "ab".encode("utf-32-le")
    assert sniff_decode(raw32)["encoding"] == "utf-32-le"
    assert sniff_decode(raw32)["text"] == "ab"
    raw16 = b"\xff\xfe" + "ab".encode("utf-16-le")
    assert sniff_decode(raw16)["encoding"] == "utf-16-le"


def test_utf16_heuristic_without_bom():
    for enc in ("utf-16-le", "utf-16-be"):
        r = sniff_decode("ascii heavy text".encode(enc))
        assert r["encoding"] == enc and r["text"] == "ascii heavy text"
    # an odd-length buffer never triggers the heuristic
    r = sniff_decode("abc".encode("utf-16-le") + b"x")
    assert r["encoding"] != "utf-16-le"


def test_utf8_strict_then_latin1_fallback():
    assert sniff_decode("héllo".encode("utf-8"))["encoding"] == "utf-8"
    r = sniff_decode(b"caf\xe9 au lait")
    assert r["encoding"] == "latin-1"
    assert r["text"] == "café au lait"
    assert r["high_bytes"] == 1 and r["n_replacements"] == 0


def test_bom_with_corrupt_body_counts_replacements():
    r = sniff_decode(b"\xef\xbb\xbfok \xff\xfe broken")
    assert r["encoding"] == "utf-8" and r["had_bom"]
    assert r["n_replacements"] == 2
    assert "ok" in r["text"]


def test_empty_input():
    r = sniff_decode(b"")
    assert r["encoding"] == "empty" and r["text"] == ""


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=300))
def test_sniff_total_and_consistent(raw):
    r = sniff_decode(raw)
    assert isinstance(r["text"], str)
    assert r["n_replacements"] == r["text"].count("�") or r[
        "encoding"
    ] in ("utf-8", "latin-1", "empty")


def test_sniff_decompress_all_containers_and_degrade():
    import bz2
    import gzip
    import lzma

    from data_engineering_etl_self_service_spark.operators.encoding import (
        sniff_decompress,
    )

    text = b"round trip payload"
    for raw, comp in [
        (gzip.compress(text), "gzip"),
        (bz2.compress(text), "bzip2"),
        (lzma.compress(text), "xz"),
        (text, "none"),
    ]:
        r = sniff_decompress(raw)
        assert (r["compression"], r["ok"], r["data"]) == (comp, True, text)
    # sniff false-positive: 'BZh' is printable ASCII — the payload
    # must survive verbatim, not be destroyed
    fp = sniff_decompress(b"BZh is a legit sentence start")
    assert fp["compression"] == "bzip2" and not fp["ok"]
    assert fp["data"] == b"BZh is a legit sentence start"
    broken = sniff_decompress(b"\x1f\x8bnot really gzip")
    assert broken["compression"] == "gzip" and not broken["ok"]
    assert broken["data"] == b"\x1f\x8bnot really gzip"
    # zstd/lz4 (round 7): real frames inflate exactly; corrupt frames
    # with the right magic degrade to passthrough like the others
    import pyarrow as pa

    for codec in ("zstd", "lz4"):
        r = sniff_decompress(pa.Codec(codec).compress(text, asbytes=True))
        assert (r["compression"], r["ok"], r["data"]) == (codec, True, text)
    zstd = sniff_decompress(b"\x28\xb5\x2f\xfd payload")
    assert zstd["compression"] == "zstd" and not zstd["ok"]
    assert zstd["data"].startswith(b"\x28")
    lz4 = sniff_decompress(b"\x04\x22\x4d\x18 nope")
    assert lz4["compression"] == "lz4" and not lz4["ok"]


def test_sniff_decompress_native_first_pure_fallback(monkeypatch):
    """Codec ordering contract (VERDICT r7 #1): the arrival front door
    uses the native libzstd/liblz4 codec when pyarrow is importable and
    falls back to the pure-Python decoders only when it isn't (or the
    native decode fails)."""
    import pyarrow as pa

    from data_engineering_etl_self_service_spark.operators import (
        encoding,
        lz4,
        zstd,
    )

    text = b"ordering contract payload " * 8
    frames = {
        "zstd": pa.Codec("zstd").compress(text, asbytes=True),
        "lz4": pa.Codec("lz4").compress(text, asbytes=True),
    }

    # 1) native path is the default: poison the pure decoders — the
    #    decode must still succeed without ever touching them
    monkeypatch.setattr(
        zstd, "zstd_decompress", lambda raw: (_ for _ in ()).throw(
            AssertionError("pure zstd decoder reached on native path")
        ),
    )
    monkeypatch.setattr(
        lz4, "lz4_decompress", lambda raw: (_ for _ in ()).throw(
            AssertionError("pure lz4 decoder reached on native path")
        ),
    )
    for codec, raw in frames.items():
        r = encoding.sniff_decompress(raw)
        assert (r["compression"], r["ok"], r["data"]) == (codec, True, text)

    # 2) no-pyarrow fallback: kill the native path — the pure decoders
    #    (restored) must inflate the same frames bit-identically
    monkeypatch.undo()
    monkeypatch.setattr(
        encoding,
        "_native_decompress",
        lambda raw, codec: (_ for _ in ()).throw(ImportError("no pyarrow")),
    )
    for codec, raw in frames.items():
        r = encoding.sniff_decompress(raw)
        assert (r["compression"], r["ok"], r["data"]) == (codec, True, text)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300))
def test_sniff_decompress_never_raises(raw):
    from data_engineering_etl_self_service_spark.operators.encoding import (
        sniff_decompress,
    )

    r = sniff_decompress(raw)
    assert isinstance(r["data"], bytes)
