"""Driver-contract smoke: entry() returns rows; registry is well-formed."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_every_oracle_has_a_query():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 35


def test_queries_run_at_sf0001(spark):
    q = entrymod.queries()
    for name, fn in q.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
