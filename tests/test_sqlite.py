"""SQLite file parsing (operators/sqlite.py): stdlib-written databases
read back by the hand page walker — value types, rowid alias, interior
pages, overflow chains, corruption tolerance."""

from __future__ import annotations

import os
import sqlite3
import struct
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_etl_self_service_spark.operators.sqlite import (
    iter_sqlite_rows,
    sqlite_table_dicts,
)


def _db(rows, schema="(id INTEGER PRIMARY KEY, text TEXT, score REAL, tag BLOB)"):
    fd, p = tempfile.mkstemp(suffix=".db")
    os.close(fd)  # sqlite3 initializes the empty reserved file in place
    con = sqlite3.connect(p)
    con.execute(f"CREATE TABLE docs {schema}")
    width = len(rows[0])
    con.executemany(
        f"INSERT INTO docs VALUES ({','.join('?' * width)})", rows
    )
    con.commit()
    con.close()
    raw = open(p, "rb").read()
    os.unlink(p)
    return raw


def test_value_types_roundtrip():
    rows = [
        (1, "plain", 0.5, b"\x01\x02"),
        (2, None, None, None),
        (3, "unicode é中", -2.25, b""),
        (4, "big int", float(1 << 40), b"\xff" * 9),
    ]
    got = list(sqlite_table_dicts(_db(rows), "docs", ["id", "text", "score", "tag"]))
    assert [(g["id"], g["text"], g["score"], g["tag"]) for g in got] == rows


def test_rowid_alias_resolved():
    raw = _db([(7, "x", None, None)])
    # raw record stores NULL at the INTEGER PRIMARY KEY position
    rowid, rec = next(iter_sqlite_rows(raw, "docs"))
    assert rowid == 7 and rec[0] is None
    assert next(iter(sqlite_table_dicts(raw, "docs", ["id"])))["id"] == 7


def test_interior_pages_and_overflow_chains():
    rows = [(i, "y" * 5000, None, None) for i in range(1, 300)]
    got = list(sqlite_table_dicts(_db(rows), "docs", ["id", "text"]))
    assert len(got) == 299
    assert [g["id"] for g in got] == list(range(1, 300))
    assert all(g["text"] == "y" * 5000 for g in got)


def test_negative_and_boundary_ints():
    rows = [(1, None, None, None), (-(1 << 40), None, None, None)]
    got = sorted(
        (g["id"] for g in sqlite_table_dicts(_db(rows), "docs", ["id"])),
    )
    assert got == [-(1 << 40), 1]


def test_missing_table_and_garbage():
    raw = _db([(1, "x", None, None)])
    assert list(iter_sqlite_rows(raw, "absent")) == []
    assert list(iter_sqlite_rows(b"definitely not sqlite", "docs")) == []
    assert list(iter_sqlite_rows(raw[:40], "docs")) == []


def test_corrupt_page_degrades():
    raw = bytearray(_db([(i, f"t{i}", None, None) for i in range(1, 50)]))
    page_size = struct.unpack(">H", bytes(raw[16:18]))[0]
    # zero out a later page: rows on it vanish, walk continues
    raw[3 * page_size : 4 * page_size] = b"\x00" * page_size
    got = list(sqlite_table_dicts(bytes(raw), "docs", ["id"]))
    assert len(got) <= 49  # never raises


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=400))
def test_parser_never_raises(raw):
    list(iter_sqlite_rows(raw, "docs"))


def test_truncated_database_degrades():
    """Truncation at or inside any page yields partial rows, never an
    exception (the dirty-corpus property the module promises)."""
    raw = _db([(i, "x" * 300, None, None) for i in range(1, 200)])
    for cut in (100, 150, 4096, 4098, len(raw) // 2, len(raw) - 7):
        rows = list(iter_sqlite_rows(raw[:cut], "docs"))
        assert all(isinstance(r, tuple) for r in rows)


def test_fixture_token_minimum_precondition(spark, sf_dir):
    """sqlite_extract_stats' text_chars = length(text)-2 formula needs
    every doc to split into three non-empty thirds (>= 5 tokens)."""
    from pyspark.sql import functions as F
    from data_engineering_etl_self_service_spark.catalog import load_table

    mn = (
        load_table(spark, sf_dir, "documents")
        .agg(F.min(F.size(F.split("text", " "))))
        .collect()[0][0]
    )
    assert mn >= 5
