"""Explicit bloom-filter semi-join: the runtime-filter pattern as an operator.

At 100 TB the cheapest join is the one whose probe side never leaves the
scan: build a bloom filter over the (small) dim key set, broadcast it, and
test membership INSIDE the fact scan stage so non-matching rows die before
any shuffle. The exact join then verifies only survivors. Blooms have no
false negatives, so the result is IDENTICAL to a plain semi-join — which is
exactly what the SQL oracle checks (``bloom_semi_revenue``).

Spark's optimizer injects this itself in narrow cases
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but its
``bloom_filter_agg`` expression is internal — not in the function registry
— so this module builds the filter from PUBLIC expressions only:

- the bitset is a DataFrame of (word, bits) longs — ``k`` hash positions
  per key (``xxhash64(key, seed_i) mod m``), OR-combined per 64-bit word
  with ``bit_or`` (map-side combinable like any aggregate; ``m`` bits →
  at most ``m/64`` rows ≈ a few hundred KB, always broadcastable);
- the probe is ``k`` broadcast hash joins on the word index plus a
  bitmask test — each is map-side, so the whole membership check stays in
  the scan stage with zero exchanges before it.

Deterministic (xxhash64), so results are engine-exact and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..runtime import truncate_lineage


def build_key_bloom(
    dim: DataFrame,
    key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Bloom bitset over ``dim[key]`` as a (word long, bits long) frame.

    With ``m`` bits and ``n`` keys at ``k=3`` hashes, the false-positive
    rate is ``(1 - e^(-kn/m))^k`` — ~3% at m = 8n. A false positive only
    costs one wasted row through the verify join, never a wrong answer.

    ``materialize`` (default) eagerly computes the bitset once
    (``localCheckpoint`` — bounded at ``m/64`` rows by construction, a
    few hundred KB): the probe reuses it across its ``k`` joins instead
    of re-scanning the dim per hash.
    """
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(num_hashes)])
    ).alias("__seed")
    pos = F.pmod(F.xxhash64(F.col(key), F.col("__seed")), F.lit(num_bits))
    out = (
        dim.select(F.col(key), seeds)
        .select(
            F.floor(pos / 64).cast("long").alias("word"),
            F.expr(
                f"shiftleft(1L, cast(pmod(xxhash64({key}, __seed), "
                f"{num_bits}) % 64 as int))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return out.transform(truncate_lineage) if materialize else out


def bloom_probe(
    fact: DataFrame,
    bloom: DataFrame,
    key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """Keep only ``fact`` rows whose ``key`` MIGHT be in the bloom.

    One broadcast word-lookup per hash; a key is kept iff every one of
    its ``k`` bits is set (absent word ⇒ definite non-member). No false
    negatives; the residue of false positives is for the caller's exact
    verify join.
    """
    out = fact
    keep = F.lit(True)
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(num_bits))
        wtab = bloom.select(
            F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
        )
        out = out.withColumn(f"__word{i}", F.floor(pos / 64).cast("long")).withColumn(
            f"__mask{i}",
            F.expr(f"shiftleft(1L, cast(pmod(xxhash64({key}, {i}), {num_bits}) % 64 as int))"),
        )
        out = out.join(
            F.broadcast(wtab), out[f"__word{i}"] == wtab[f"__w{i}"], "left"
        )
        keep = keep & (
            F.coalesce(F.col(f"__b{i}"), F.lit(0)).bitwiseAND(
                F.col(f"__mask{i}")
            )
            != 0
        )
    drop = [c for i in range(num_hashes) for c in (f"__word{i}", f"__mask{i}", f"__w{i}", f"__b{i}")]
    return out.filter(keep).drop(*drop)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """Semantically a plain ``fact SEMI JOIN dim``, executed as
    bloom-pre-filter → exact verify. The dim key set feeds both the
    filter build and the verify join."""
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    bloom = build_key_bloom(keys, fact_key, num_bits, num_hashes)
    pre = bloom_probe(fact, bloom, fact_key, num_bits, num_hashes)
    return pre.join(F.broadcast(keys), fact_key, "left_semi")
