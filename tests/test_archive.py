"""Archive containers (operators/archive.py): tar/zip builder
round-trips, two-way stdlib interop (tarfile/zipfile read our bytes
and we read theirs — the Annex-K-style independent-implementation
check), WebDataset adjacency grouping, malformed-byte tolerance, and
the single-scan Spark explodes."""

from __future__ import annotations

import io
import tarfile
import zipfile

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_etl_self_service_spark.operators.archive import (
    build_tar,
    build_zip,
    iter_tar_members,
    iter_wds_samples,
    iter_zip_members,
    parse_tar,
    parse_zip,
    tar_member_rows,
    wds_key_ext,
    wds_sample_rows,
    zip_member_rows,
)

MEMBERS = [
    ("a/b.txt", b"hello world"),
    ("0001.json", b'{"x": 1}'),
    ("empty.bin", b""),
    ("/".join(f"d{i:02d}" for i in range(30)) + "/deep.bin", bytes(range(256)) * 3),
]


# ------------------------------------------------------------- tar


def test_tar_roundtrip_plain_and_gzip():
    for gz in (False, True):
        blob = build_tar(MEMBERS, mtime=1234, gzip_whole=gz)
        got = list(iter_tar_members(blob))
        assert [(m["name"], m["payload"]) for m in got] == MEMBERS
        assert all(m["checksum_ok"] for m in got)
        assert all(m["mtime"] == 1234 for m in got)
        meta = parse_tar(blob)
        assert meta["n_members"] == len(MEMBERS)
        assert meta["total_bytes"] == sum(len(p) for _, p in MEMBERS)
        assert meta["checksums_ok"] is True
        assert meta["gzipped"] is gz


def test_tar_stdlib_reads_ours():
    tf = tarfile.open(fileobj=io.BytesIO(build_tar(MEMBERS)))
    got = [(i.name, tf.extractfile(i).read()) for i in tf]
    assert got == MEMBERS


def test_tar_we_read_stdlib():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        for n, p in MEMBERS:
            ti = tarfile.TarInfo(n)
            ti.size = len(p)
            ti.mtime = 77
            w.addfile(ti, io.BytesIO(p))
    got = list(iter_tar_members(buf.getvalue()))
    assert [(m["name"], m["payload"]) for m in got] == MEMBERS
    assert all(m["checksum_ok"] for m in got)


def test_tar_corrupt_checksum_flagged():
    blob = bytearray(build_tar([("x.txt", b"payload")]))
    blob[0] ^= 0xFF  # flip a name byte -> checksum no longer matches
    got = list(iter_tar_members(bytes(blob)))
    assert len(got) == 1 and got[0]["checksum_ok"] is False


def test_tar_unfittable_name_raises():
    import pytest

    with pytest.raises(ValueError):
        build_tar([("dir/" + "n" * 120 + ".bin", b"")])


# ------------------------------------------------------------- zip


def test_zip_roundtrip_both_methods():
    for deflate in (False, True):
        blob = build_zip(MEMBERS, deflate=deflate)
        got = list(iter_zip_members(blob))
        assert [(m["name"], m["payload"]) for m in got] == MEMBERS
        assert all(m["crc_ok"] for m in got)
        assert all(m["method"] == (8 if deflate else 0) for m in got)
        meta = parse_zip(blob)
        assert meta["n_members"] == len(MEMBERS)
        assert meta["total_bytes"] == sum(len(p) for _, p in MEMBERS)
        assert meta["crcs_ok"] is True


def test_zip_stdlib_reads_ours():
    zf = zipfile.ZipFile(io.BytesIO(build_zip(MEMBERS)))
    got = [(i.filename, zf.read(i)) for i in zf.infolist()]
    assert got == MEMBERS


def test_zip_we_read_stdlib():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as w:
        for n, p in MEMBERS:
            w.writestr(n, p)
    got = list(iter_zip_members(buf.getvalue()))
    assert [(m["name"], m["payload"]) for m in got] == MEMBERS
    assert all(m["crc_ok"] for m in got)


def test_zip_eocd_found_behind_comment():
    # An archive comment puts bytes AFTER the EOCD start; the
    # backwards scan must still find it.
    blob = build_zip([("a.txt", b"abc")]) + b"trailing archive comment"
    got = list(iter_zip_members(blob))
    assert [(m["name"], m["payload"]) for m in got] == [("a.txt", b"abc")]


def test_zip_bad_crc_flagged():
    blob = bytearray(build_zip([("a.txt", b"abcdef")], deflate=False))
    blob[blob.rindex(b"abcdef")] ^= 0xFF  # corrupt stored payload only
    got = list(iter_zip_members(bytes(blob)))
    assert len(got) == 1 and got[0]["crc_ok"] is False


# ------------------------------------------------------- webdataset


def test_wds_key_ext_rule():
    assert wds_key_ext("dir/000123.tar.txt") == ("000123", "tar.txt")
    assert wds_key_ext("plain") == ("plain", "")
    assert wds_key_ext("a/b/c.json") == ("c", "json")


def test_wds_adjacent_grouping_and_reappearing_key():
    shard = build_tar(
        [
            ("s/a.txt", b"t1"),
            ("s/a.json", b"{}"),
            ("s/b.txt", b"t2"),
            ("s/a.cls", b"late"),  # 'a' again after 'b' -> NEW sample
        ]
    )
    samples = list(iter_wds_samples(shard))
    assert [(k, sorted(p)) for k, p in samples] == [
        ("a", ["json", "txt"]),
        ("b", ["txt"]),
        ("a", ["cls"]),
    ]


# ------------------------------------------------------- tolerance


def test_truncations_never_raise():
    t = build_tar(MEMBERS)
    z = build_zip(MEMBERS)
    tg = build_tar(MEMBERS, gzip_whole=True)
    for blob in (t, z, tg):
        for cut in range(0, len(blob), 13):
            list(iter_tar_members(blob[:cut]))
            list(iter_zip_members(blob[:cut]))
            list(iter_wds_samples(blob[:cut]))


@settings(max_examples=60, deadline=None)
@given(
    pos=st.integers(min_value=0, max_value=4000),
    val=st.integers(min_value=0, max_value=255),
)
def test_bitflip_fuzz_never_raises(pos, val):
    t = bytearray(build_tar(MEMBERS))
    z = bytearray(build_zip(MEMBERS))
    t[pos % len(t)] ^= val
    z[pos % len(z)] ^= val
    list(iter_tar_members(bytes(t)))
    list(iter_zip_members(bytes(z)))
    list(iter_wds_samples(bytes(t)))
    parse_tar(bytes(t))
    parse_zip(bytes(z))


@settings(max_examples=40, deadline=None)
@given(junk=st.binary(max_size=600))
def test_random_bytes_never_raise(junk):
    list(iter_tar_members(junk))
    list(iter_zip_members(junk))
    list(iter_wds_samples(junk))


# ----------------------------------------------------- spark entries


def test_spark_member_and_sample_explodes(spark):
    rows = [
        (1, build_tar([("00001-x.txt", b"alpha"), ("00001-x.json", b"{}")])),
        (2, build_tar([("00002-y.txt", b"beta")], gzip_whole=True)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")

    tm = tar_member_rows(df).orderBy("doc_id", "member_name").collect()
    assert [(r.doc_id, r.member_name, r.member_size, r.checksum_ok) for r in tm] == [
        (1, "00001-x.json", 2, True),
        (1, "00001-x.txt", 5, True),
        (2, "00002-y.txt", 4, True),
    ]

    ws = wds_sample_rows(df).orderBy("doc_id").collect()
    assert [(r.doc_id, r.sample_key, r.n_parts, r.exts, r.text) for r in ws] == [
        (1, "00001-x", 2, "json,txt", "alpha"),
        (2, "00002-y", 1, "txt", "beta"),
    ]

    zrows = [(7, build_zip([("a.txt", b"zzz"), ("b.bin", b"\x00\x01")]))]
    zdf = spark.createDataFrame(zrows, "doc_id long, data binary")
    zm = zip_member_rows(zdf).orderBy("member_name").collect()
    assert [(r.doc_id, r.member_name, r.method, r.member_size, r.crc_ok) for r in zm] == [
        (7, "a.txt", 8, 3, True),
        (7, "b.bin", 8, 2, True),
    ]


def test_spark_explode_plan_is_single_scan(spark):
    df = spark.createDataFrame(
        [(1, build_tar([("k.txt", b"v")]))], "doc_id long, data binary"
    )
    plan = tar_member_rows(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
