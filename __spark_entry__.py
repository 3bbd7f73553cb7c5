"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship sessionization query at sf0.001;
``queries()``/``oracle_sql()`` expose the engine's named query surface
(see data_engineering_etl_self_service_spark/queries.py — one entry per
operator family from SURVEY.md §2 plus the north-star operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineering_etl_self_service_spark import queries as _q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["sessionize_stats"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return _q.oracle_sql()
