"""Deterministic (order-independent) numeric aggregation helpers.

Floating-point SUM is not associative, so a distributed sum over doubles is
nondeterministic across partitionings — and never bit-identical to a
single-node oracle. These helpers cast each element to an exact DECIMAL
*before* aggregating, making the aggregate order-independent and
bit-reproducible, then cast the final value back to DOUBLE so schemas stay
simple. The per-element double→decimal rounding is deterministic in both
Spark and DuckDB, so oracle hashes match exactly.

At 100 TB this also means a re-run (or an AQE re-plan that changes partition
counts) produces byte-identical results — a property the pandas-based
reference could not offer (ref: operators/data_quality_operator.py:69).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scale used for the exact intermediate decimal; 38-digit precision leaves
#: ~28 integer digits of headroom — enough for 100 TB-scale sums of prices.
DECIMAL_TYPE = "decimal(38,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM(double) → double, exact via decimal transit."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL_TYPE)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG(double) → double (exact sum / exact count)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL_TYPE)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dsum_expr(sql_expr: str) -> str:
    """The oracle-side (ANSI SQL) twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def davg_expr(sql_expr: str) -> str:
    """The oracle-side (ANSI SQL) twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({sql_expr})"
    )
