"""TIFF container metadata (operators/tiff.py): builder round-trips in
both byte orders, IFD chaining, offset-valued entries, tolerance."""

from __future__ import annotations

from data_engineering_etl_self_service_spark.operators.tiff import (
    build_tiff,
    parse_tiff,
)


def test_tiff_roundtrip_matrix():
    for be in (False, True):
        for spp in (1, 3):
            for pages in (1, 4):
                m = parse_tiff(
                    build_tiff(
                        33, 17, n_pages=pages, samples_per_pixel=spp,
                        big_endian=be,
                        date_time="2024:01:15 12:00:00",
                    )
                )
                assert m["byte_order"] == ("MM" if be else "II")
                assert (m["width"], m["height"]) == (33, 17)
                assert m["n_pages"] == pages
                assert m["samples_per_pixel"] == spp
                assert m["bits_per_sample"] == 8
                assert m["photometric"] == (2 if spp == 3 else 1)
                assert m["strip_bytes"] == pages * 33 * 17 * spp
                assert m["date_time"] == "2024:01:15 12:00:00"


def test_tiff_tolerant_on_malformed():
    assert parse_tiff(b"") is None
    assert parse_tiff(b"not a tiff at all") is None
    assert parse_tiff(b"II\x2a\x00\xff\xff\xff\xff") is None
    good = build_tiff(20, 10, n_pages=3)
    # progressively truncate: must never raise, returns None or partial
    for cut in range(0, len(good), 23):
        r = parse_tiff(good[:cut])
        assert r is None or r["n_pages"] >= 1
    # cyclic IFD chain terminates (loop guard)
    import struct

    cyc = bytearray(build_tiff(4, 4))
    (ifd0,) = struct.unpack_from("<I", cyc, 4)
    n = struct.unpack_from("<H", cyc, ifd0)[0]
    struct.pack_into("<I", cyc, ifd0 + 2 + 12 * n, ifd0)  # self-link
    r = parse_tiff(bytes(cyc))
    assert r is not None and r["n_pages"] == 1


def test_tiff_sniffed_and_decoded_in_multimodal(spark):
    from data_engineering_etl_self_service_spark.operators.multimodal import (
        attach_binary_metadata,
        decode_payload,
    )

    blob = build_tiff(40, 20, samples_per_pixel=3, big_endian=True)
    row = decode_payload(blob)
    assert row["kind"] == "tiff"
    assert (row["width"], row["height"], row["channels"]) == (40, 20, 3)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"II\x2a\x00junk"))],
        "doc_id long, payload binary",
    )
    kinds = {
        r.doc_id: r.format
        for r in attach_binary_metadata(df).select("doc_id", "format").collect()
    }
    assert kinds == {1: "tiff", 2: "tiff"}  # sniff is prefix-based
    assert decode_payload(b"II\x2a\x00junk")["kind"] == "tiff"  # sniffed-only


def test_tiff_random_tail_fuzz_never_raises():
    """Arbitrary bytes behind a valid TIFF magic (the adversarial case a
    100 TB dirty corpus feeds the sniffed branch) never raise — None or
    a partial dict only."""
    import random

    rng = random.Random(0x71FF)
    for _ in range(300):
        blob = (
            (b"II\x2a\x00" if rng.random() < 0.5 else b"MM\x00\x2a")
            + bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))
        )
        r = parse_tiff(blob)
        assert r is None or isinstance(r, dict)
    # bit-flip fuzz over a real file
    good = bytearray(build_tiff(12, 9, n_pages=2, samples_per_pixel=3))
    for _ in range(300):
        b = bytearray(good)
        for _ in range(rng.randrange(1, 6)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        r = parse_tiff(bytes(b))
        assert r is None or isinstance(r, dict)
