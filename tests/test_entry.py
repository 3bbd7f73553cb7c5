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


def test_duplicate_query_registration_fails_fast():
    """register() must raise on a name collision instead of silently
    shadowing an existing query (a live round-3 bug class)."""
    import pytest

    from data_engineering_etl_self_service_spark.queries import register

    with pytest.raises(AssertionError, match="duplicate query registration"):
        @register("pricing_summary")
        def pricing_summary(spark, sf_dir):  # pragma: no cover
            return None
