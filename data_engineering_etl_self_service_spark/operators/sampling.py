"""Deterministic hash-based sampling: Bernoulli and stratified.

North-star utility (no counterpart in the reference): training-data
pipelines sample constantly — eval holdouts, ablation subsets,
per-source quota draws — and at 100 TB the sample must be (a) computable
in one shuffle-free scan, (b) reproducible across runs/engines/partition
layouts, and (c) coordinated (the same key samples identically in every
table, so sampled fact rows keep their sampled dimension rows).

``rand(seed)`` fails (b)/(c): Spark seeds per-partition, so the sample
changes with the partition layout, and no other engine can reproduce it.
Hashing a stable key is the standard fix (the train_test_split /
corpus_mix queries use the same discipline): here the hash is the Knuth
multiplicative constant 2654435761 (= floor(2^32/phi), Fibonacci
hashing) mod a permille scale — plain int64 arithmetic that any engine,
including the DuckDB oracle, reproduces bit-for-bit. The key is first
folded into 31 bits (``key % 2^31``) so the product is at most
(2^31-1) * 2654435761 ~= 5.7e18 < 2^63: without the fold, keys past
~3.49e9 would overflow int64 — Spark (non-ANSI) silently wraps while
DuckDB raises, breaking engine portability exactly when the corpus gets
big. The fold is a no-op for keys below 2^31, so existing samples are
unchanged; oracles apply the identical ``% 2147483648`` fold.

Per-stratum rates make quota sampling declarative: pass
``{stratum: permille}`` and each group is Bernoulli-sampled at its own
rate in the SAME single scan — no per-group jobs, no shuffle, filters
fully pushed past the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761  # floor(2^32 / golden ratio): Fibonacci hashing
KEY_FOLD = 2**31  # fold keys to 31 bits: (2^31-1)*KNUTH < 2^63 (no overflow)


def hash_bucket(key: Column, buckets: int = 1000) -> Column:
    """Deterministic bucket in [0, buckets) from an integer key column.

    The key is folded to 31 bits before the multiply so the int64
    product cannot overflow for ANY key value (identical result for
    keys < 2^31; the DuckDB oracle twin applies the same fold)."""
    folded = F.pmod(key.cast("long"), F.lit(KEY_FOLD))
    return F.pmod(folded * F.lit(KNUTH), F.lit(buckets))


def hash_sample(
    df: DataFrame, key_col: str, permille: int, buckets: int = 1000
) -> DataFrame:
    """Keep rows whose key hashes below ``permille`` of ``buckets`` —
    a reproducible, engine-portable Bernoulli sample."""
    return df.filter(hash_bucket(F.col(key_col), buckets) < permille)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    buckets: int = 1000,
) -> DataFrame:
    """Per-stratum Bernoulli sampling at per-stratum rates, one scan.

    ``rates_permille`` maps stratum values to keep-rates out of
    ``buckets``; unlisted strata fall back to ``default_permille``.
    The predicate is a single CASE expression over two columns — it
    pushes to the parquet scan, shuffles nothing, and a given key is
    kept/dropped identically regardless of partitioning or engine.
    """
    rate = F.lit(default_permille)
    for value, pm in sorted(rates_permille.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(pm)).otherwise(rate)
    return df.filter(hash_bucket(F.col(key_col), buckets) < rate)
