"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (on by default in ``session.py``) handles most
skew; explicit salting is the tool for the pathological case — one key
carrying a double-digit percentage of a 100 TB fact table, where even a
split partition floods a single join task.

Semantics are IDENTICAL to a plain inner join (the salted-join demo query
is oracle-checked against an unsalted SQL join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner-join a skewed ``fact`` to ``dim`` with ``salt``-way key salting.

    The fact side gets a uniform random salt in [0, salt); the dim side is
    replicated ``salt``× via an exploded literal range. The join key becomes
    (key, salt), spreading one hot key across ``salt`` tasks. Dim
    replication costs salt× its size — use for genuinely small-to-medium
    dims or pre-filtered dim slices.
    """
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=7) * salt).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["_salt"] == salted_dim["_salt"]),
        how,
    )
    return joined.drop("_salt")


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    max_gap_sec: int = 60,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Keyless time-range join: all (left, right) pairs with
    ``0 <= right.ts - left.ts <= max_gap_sec``.

    A naive inequality join is a cartesian product with a filter — O(n·m).
    Bucketizing the timeline into ``max_gap_sec``-wide buckets turns it
    into an equi-join: a qualifying pair is always in the same or adjacent
    bucket, so the left side joins on {bucket, bucket+1} (2 rows per left
    row) and a final filter applies the exact range. Cost: 2× left
    replication instead of n·m — the standard Spark range-join recipe.
    """
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    bucket_us = max_gap_sec * 1_000_000

    def bucket(c):
        # exact integer floor-division ((a - a%b)/b): epoch micros exceed
        # nothing, but plain double division could wobble at bucket edges
        a = us(c)
        return ((a - a % bucket_us) / bucket_us).cast("long")

    l = left.select(
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
    ).withColumn(
        "_bkts",
        F.array(bucket(f"{left_prefix}{ts_col}"), bucket(f"{left_prefix}{ts_col}") + 1),
    ).withColumn("_bkt", F.explode("_bkts")).drop("_bkts")

    r = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    ).withColumn("_bkt", bucket(f"{right_prefix}{ts_col}"))

    gap = us(f"{right_prefix}{ts_col}") - us(f"{left_prefix}{ts_col}")
    return (
        l.join(r, "_bkt")
        .filter((gap >= 0) & (gap <= bucket_us))
        .drop("_bkt")
    )
