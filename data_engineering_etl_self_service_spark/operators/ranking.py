"""Distributed total-order ranking without a single-partition sort.

A global ``row_number()``/``ntile()``/``lead()`` window (no PARTITION BY)
forces every row through ONE task — the classic scale-killer that works at
sf0.1 and serializes at 100 TB. These primitives get the same answers with
per-shard sorts only:

- ``distributed_rank``: exact global rank = range-partition on the sort key,
  rank *within* each shard (a window partitioned by shard → parallel), then
  add each shard's prefix offset. The only driver artifact is the per-shard
  row count — ``num_shards`` scalars, the same bounded-collect budget as
  k-means centroids.
- ``ntile_bucket``: SQL ``NTILE(k)`` bucket from a precomputed global rank
  (pure arithmetic; bucket sizes match the window function exactly).
- ``sharded_key_gaps``: global ``lead``-based gap detection re-expressed as
  lead-within-shard plus a driver-side stitch of the ``num_shards`` shard
  boundaries.

Range partitioning samples split points, so the shard assignment of a row is
only stable *within one materialization* — every caller persists the sharded
frame before the count pass and the rank pass so both see identical shards.
Callers must unpersist via the returned handle once the downstream result is
materialized (``localCheckpoint`` the small output first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from ..runtime import truncate_lineage

_SHARD = "__shard"
_LOCAL_RN = "__local_rn"


def distributed_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    rank_col: str,
    num_shards: int = 32,
) -> tuple[DataFrame, int, DataFrame]:
    """Add an exact 1-based global rank over ``order_cols`` without a
    single-partition window.

    ``order_cols`` must define a TOTAL order (include a unique tiebreak
    column) and are ascending — negate a numeric column for descending.

    Returns ``(ranked_df, total_rows, persisted_handle)``; the caller
    unpersists the handle after materializing its result.

    Plan shape: one range exchange on the sort key, one hash exchange on
    the shard id for the per-shard window — both distributed. No
    SinglePartition exchange anywhere.
    """
    sharded = (
        df.repartitionByRange(num_shards, *order_cols)
        .withColumn(_SHARD, F.spark_partition_id())
        .persist()
    )
    # Bounded driver artifact: num_shards (shard, count) rows. Range
    # partitions are index-ordered by key range, so prefix sums in shard-id
    # order are the global offsets.
    counts = sharded.groupBy(_SHARD).agg(F.count(F.lit(1)).alias("c")).collect()
    offsets: dict[int, int] = {}
    total = 0
    for sid, c in sorted((r[_SHARD], r["c"]) for r in counts):
        offsets[sid] = total
        total += c
    if offsets:
        pairs: list[Column] = []
        for sid, off in offsets.items():
            pairs.extend([F.lit(sid), F.lit(off)])
        off_expr = F.create_map(*pairs)[F.col(_SHARD)]
    else:
        off_expr = F.lit(0)
    w = W.partitionBy(_SHARD).orderBy(*order_cols)
    ranked = (
        sharded.withColumn(_LOCAL_RN, F.row_number().over(w))
        .withColumn(rank_col, (F.col(_LOCAL_RN) + off_expr).cast("long"))
        .drop(_SHARD, _LOCAL_RN)
    )
    return ranked, total, sharded


def ntile_bucket(rank: Column, total: int, k: int) -> Column:
    """The ``NTILE(k)`` bucket of a 1-based global ``rank`` over ``total``
    rows, as pure arithmetic (no window).

    SQL NTILE semantics: the first ``total % k`` buckets hold
    ``total // k + 1`` rows, the rest ``total // k`` — reproduced exactly so
    results hash-match a window-function oracle.
    """
    q, r = divmod(total, k)
    big = r * (q + 1)  # rows covered by the (q+1)-sized buckets
    if q == 0:
        # fewer rows than buckets: bucket == rank
        return rank.cast("long")

    def ceil_div(a: Column, b: int) -> Column:
        # exact integer ceil(a/b): (a+b-1) - (a+b-1)%b is a multiple of b,
        # so the double division is exact (no FP wobble at bucket edges)
        n = (a + F.lit(b - 1)).cast("long")
        return ((n - n % b) / b).cast("long")

    return (
        F.when(rank <= F.lit(big), ceil_div(rank, q + 1))
        .otherwise(F.lit(r) + ceil_div(rank - F.lit(big), q))
        .cast("long")
    )


def _key_gaps_plan(
    df: DataFrame, key_col: str, num_shards: int
) -> tuple[DataFrame, DataFrame]:
    """Build the sharded gap plan; returns (gaps_df, persisted_handle).

    Exposed separately so plan tests can assert on the pre-checkpoint
    physical plan (``sharded_key_gaps`` materializes via localCheckpoint,
    which hides the shape behind an ExistingRDD scan).
    """
    spark = df.sparkSession
    keyed = (
        df.select(F.col(key_col).cast("long").alias("key"))
        .repartitionByRange(num_shards, "key")
        .withColumn(_SHARD, F.spark_partition_id())
        .persist()
    )
    w = W.partitionBy(_SHARD).orderBy("key")
    intra = (
        keyed.select("key", F.lead("key").over(w).alias("nxt"))
        .filter(F.col("nxt") - F.col("key") > 1)
        .select("key", "nxt")
    )
    # Boundary stitch: bounded driver artifact (num_shards min/max pairs).
    bounds = sorted(
        (r["mn"], r["mx"])
        for r in keyed.groupBy(_SHARD)
        .agg(F.min("key").alias("mn"), F.max("key").alias("mx"))
        .collect()
    )
    cross = [
        (prev_mx, nxt_mn)
        for (_, prev_mx), (nxt_mn, _) in zip(bounds, bounds[1:])
        if nxt_mn - prev_mx > 1
    ]
    gaps = intra
    if cross:
        gaps = intra.union(
            spark.createDataFrame(cross, schema=intra.schema)
        )
    out = gaps.select(
        (F.col("key") + 1).alias("gap_start"),
        (F.col("nxt") - 1).alias("gap_end"),
        (F.col("nxt") - F.col("key") - 1).cast("bigint").alias("n_missing"),
    )
    return out, keyed


def sharded_key_gaps(
    df: DataFrame, key_col: str, num_shards: int = 32
) -> DataFrame:
    """Missing runs in a supposedly-dense integer key space, computed with
    lead-within-shard instead of one global window.

    Range-partition the keys, run ``lead`` inside each shard (window
    partitioned by shard — parallel), then stitch the shard boundaries on
    the driver: per-shard min/max is ``num_shards`` rows, and a gap that
    crosses a boundary is visible as ``next_shard.min - shard.max > 1``.
    Returns ``(gap_start, gap_end, n_missing)`` — identical rows to the
    global-window form, which serves as the SQL oracle twin.
    """
    out, keyed = _key_gaps_plan(df, key_col, num_shards)
    out = out.transform(truncate_lineage)
    keyed.unpersist()
    return out


def sharded_running_agg(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    agg: str = "sum",
    out_col: str = "running",
    num_shards: int = 32,
    inclusive: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Exact global running SUM or MAX over a total order, with per-shard
    windows only — the prefix-scan primitive behind sweep-line operators
    (concurrency counting, skyline frontiers, cumulative inventories).

    A global ``sum(x) OVER (ORDER BY ...)`` serializes on one task; this
    range-partitions on the order, runs the running agg *within* each
    shard (parallel), collects one per-shard total (``num_shards``
    scalars — the bounded-driver-artifact budget of
    :func:`distributed_rank`), prefix-combines them on the driver, and
    folds each shard's prefix carry into its local running values
    (`+` for sum, ``greatest`` for max). Associativity of the combine is
    exactly what makes the scan shardable (Blelloch's prefix-sum
    decomposition).

    ``order_cols`` must be a TOTAL order (unique tiebreak). Returns
    ``(result, persisted_handle)``; the caller unpersists the handle
    after materializing downstream. NULL carries are treated as the
    identity (0 / -inf respectively) — shards can be empty of values.
    ``inclusive=False`` uses the strict-predecessor frame
    (UNBOUNDED PRECEDING .. 1 PRECEDING): NULL on each shard's first row
    unless a prior shard carries — the skyline/dominance frame.
    """
    assert agg in ("sum", "max")
    sharded = (
        df.repartitionByRange(num_shards, *order_cols)
        .withColumn(_SHARD, F.spark_partition_id())
        .persist()
    )
    agg_fn = F.sum if agg == "sum" else F.max
    totals = (
        sharded.groupBy(_SHARD).agg(agg_fn(value_col).alias("t")).collect()
    )
    carry: dict[int, int | None] = {}
    acc: int | None = None
    for sid, t in sorted((r[_SHARD], r["t"]) for r in totals):
        carry[sid] = acc  # EXCLUSIVE prefix: combined total of prior shards
        if t is not None:
            if acc is None:
                acc = t
            elif agg == "sum":
                acc = acc + t
            else:
                acc = max(acc, t)
    if carry:
        pairs: list[Column] = []
        for sid, c in carry.items():
            pairs.extend([F.lit(sid), F.lit(c)])
        carry_expr = F.create_map(*pairs)[F.col(_SHARD)]
    else:
        carry_expr = F.lit(None)
    upper = W.currentRow if inclusive else -1
    w = (
        W.partitionBy(_SHARD)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, upper)
    )
    local = agg_fn(value_col).over(w)
    if agg == "sum":
        combined = local + F.coalesce(carry_expr, F.lit(0))
        if not inclusive:
            # local is NULL on each shard's first row; the carry alone is
            # the exclusive prefix there (NULL only for the global first).
            combined = F.when(
                local.isNull(), carry_expr.cast("long")
            ).otherwise(local + F.coalesce(carry_expr, F.lit(0)))
    else:
        combined = F.greatest(local, carry_expr)
    out = sharded.withColumn(out_col, combined.cast("long")).drop(_SHARD)
    return out, sharded
