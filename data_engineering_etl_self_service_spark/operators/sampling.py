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


def domain_mix_weights(
    df: DataFrame,
    domain_col: str,
    size_col: str,
    target_ppm: dict[str, int] | None = None,
    cap_ppm: int = 4_000_000,
) -> DataFrame:
    """Per-domain sampling weights that steer a corpus toward a TARGET
    mixture — the static form of training-data mixture reweighting
    (DoReMi-style domain weights, Pile/ROOTS-style source mixes): given
    each domain's actual share of the corpus by ``size_col`` (tokens,
    chars, bytes), compute the rate that makes the SAMPLED corpus match
    ``target_ppm`` (parts-per-million per domain; default = uniform
    across observed domains).

    One row per domain: ``n_rows``, ``domain_size``, ``actual_ppm``
    (observed share), ``target_ppm``, ``weight_ppm`` — the per-row
    sampling rate in ppm, > 1e6 meaning UP-sampling (epochs), capped at
    ``cap_ppm`` (4.0 epochs default — the standard guard against a tiny
    domain exploding into hundreds of repeats).

    All arithmetic is int64 floor-division (ppm-scaled), so the DuckDB
    oracle reproduces every value bit-for-bit and results are identical
    at any partitioning. Scale: one groupBy on the domain column; the
    share/weight math runs on the one-row-per-domain rollup via a
    whole-frame window (domains are tens, not millions — document
    cardinality lives in the groupBy, which map-side combines)."""
    from pyspark.sql import Window

    agg = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(size_col).cast("long").alias("domain_size"),
    )
    w = Window.partitionBy()
    agg = (
        agg.withColumn("_total", F.sum("domain_size").over(w))
        .withColumn("_n_domains", F.count(F.lit(1)).over(w))
        .withColumn(
            "actual_ppm",
            F.expr("greatest(domain_size * 1000000 div _total, 1L)"),
        )
    )
    if target_ppm is None:
        agg = agg.withColumn(
            "target_ppm", F.expr("1000000 div _n_domains")
        )
    else:
        m = F.create_map(
            *[
                F.lit(x)
                for kv in sorted(target_ppm.items())
                for x in kv
            ]
        )
        agg = agg.withColumn(
            "target_ppm",
            F.coalesce(m[F.col(domain_col)], F.lit(0)).cast("long"),
        )
    return (
        agg.withColumn(
            "weight_ppm",
            F.least(
                F.lit(cap_ppm).cast("long"),
                F.expr("target_ppm * 1000000 div actual_ppm"),
            ),
        )
        .drop("_total", "_n_domains")
    )


def apply_mix_epochs(
    df: DataFrame,
    weights: DataFrame,
    domain_col: str,
    key_col: str,
) -> DataFrame:
    """Materialize a mixture: input rows + ``weight_ppm`` and
    ``n_copies`` — how many times this row appears in the reweighted
    corpus (0 = dropped). Integer epochs are ``weight_ppm div 1e6``;
    the fractional remainder is a deterministic Bernoulli draw from
    the module's Knuth hash of ``key_col`` (same fold/multiply the
    samplers use, mod 1e6), so the SAME row up/down-samples
    identically on every engine, run, and partition layout.

    Scale: ``weights`` is one row per domain — broadcast join; the
    draw is a pure map-side expression. Callers that need physical
    copies explode ``sequence(1, n_copies)``; keeping the count column
    is free and preserves exact token accounting."""
    wsel = F.broadcast(weights.select(domain_col, "weight_ppm"))
    folded = F.pmod(F.col(key_col).cast("long"), F.lit(KEY_FOLD))
    frac = F.pmod(folded * F.lit(KNUTH), F.lit(1_000_000))
    return df.join(wsel, domain_col).withColumn(
        "n_copies",
        F.expr("weight_ppm div 1000000")
        + (frac < F.pmod(F.col("weight_ppm"), F.lit(1_000_000))).cast(
            "long"
        ),
    )


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
