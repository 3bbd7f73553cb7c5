"""Bounded-memory mergeable summaries: Misra-Gries heavy hitters.

North-star operator (no counterpart in the reference): find every item
whose frequency exceeds n/k in a stream of n items, WITHOUT a full
groupBy over the long tail. A training-corpus vocabulary has hundreds of
millions of distinct tokens; a full token-frequency aggregation shuffles
all of them, yet a heavy-hitter question ("which tokens exceed 0.5% of
the corpus?") has at most k answers. The classical answer is the
Misra-Gries summary (Misra & Gries, Sci. Comp. Prog. 1982; the
"space-saving"/"frequent" family): k counters per partition, decrement-all
when full — undercount per item is bounded by n_p/(k+1).

Exactness contract (why this is oracle-checkable): the summary alone is
approximate, but a SECOND exact pass over only the candidate set makes
the final answer exact —

1. per-partition MG with capacity m >= k emits every item whose
   partition count exceeds n_p/(m+1) (survival bound);
2. any item with GLOBAL count > n/k must exceed n_p/k >= n_p/(m+1) in at
   least one partition (pigeonhole), so the union of partition summaries
   is a provably complete candidate superset;
3. one broadcast semi-join of the (tiny, <= m * n_partitions rows)
   candidate set against the stream + one exact count + the exact
   ``cnt * k > n`` filter removes all false positives.

Scale shape: pass 1 is a single ``mapInPandas`` scan with O(m) state per
task and no shuffle at all; pass 2 shuffles only rows matching ~k
distinct keys (the heavy keys themselves — skewed by definition, but the
partial aggregation collapses them map-side before the exchange, so the
shuffle moves one row per (task, key)). The full-vocabulary shuffle of
the naive plan never happens.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..runtime import truncate_lineage


def _mg_partition(
    batches: Iterator[pd.DataFrame], col: str, capacity: int
) -> Iterator[pd.DataFrame]:
    """Misra-Gries over one partition, in its MERGEABLE formulation
    (Agarwal et al., PODS'12 "Mergeable Summaries"): each Arrow batch is
    counted exactly (vectorized ``value_counts``), merged into the
    running summary by addition, and pruned back to ``capacity`` by
    subtracting the (capacity+1)-th largest count from everything — the
    batched equivalent of decrement-all, with the same total-undercount
    bound n_p/(capacity+1) and no per-token Python loop.

    Yields the (item, lb) counters PLUS one sentinel row
    (item=NULL, lb=partition row count): the single pass thus also
    carries the n_total every caller needs, so no second counting scan
    of the stream ever runs. Shared by :func:`heavy_hitters` (which
    only needs the candidate items + n) and :func:`mg_summary` (which
    keeps the lower bounds) — one implementation of the prune rule."""
    counters: pd.Series = pd.Series(dtype="int64")
    n_rows = 0
    for pdf in batches:
        n_rows += len(pdf)
        merged = counters.add(pdf[col].value_counts(), fill_value=0)
        if len(merged) > capacity:
            # Subtracting (not just thresholding on) the cut is what makes
            # the undercount bound hold: every prune removes >= cut *
            # (capacity+1) mass, so the cuts sum to <= n_p/(capacity+1)
            # and a surviving counter underestimates by at most that.
            cut = merged.nlargest(capacity + 1).iloc[-1]
            merged = merged - cut
            merged = merged[merged > 0]
        counters = merged
    yield pd.DataFrame(
        {
            col: list(counters.index) + [None],
            "lb": list(counters.to_numpy(dtype="int64")) + [n_rows],
        }
    )


def heavy_hitters(
    items: DataFrame, col: str, k: int, capacity: int | None = None
) -> DataFrame:
    """Exact items with frequency > n/k via MG summary + exact verify.

    ``items``: single-column-of-interest DataFrame (extra columns are
    pruned). ``capacity`` (default 2k) is the per-partition counter
    budget; any value >= k preserves the completeness proof above —
    larger values only shrink the candidate set's false-positive tail.

    Output: (``col``, cnt, n_total) for every item with cnt*k > n_total.
    Deterministic and exact — the MG pass affects only WHICH candidates
    are verified, never the verified answer.
    """
    if capacity is None:
        capacity = 2 * k
    assert capacity >= k, "capacity < k breaks the completeness guarantee"
    stream = items.select(F.col(col).alias("item"))
    # One scan produces candidates AND per-partition row counts (NULL-item
    # sentinels); the partials frame is capacity x n_partitions rows, so
    # persisting it is free and keeps total full-stream scans at two
    # (this pass + the verify join).
    partials = stream.mapInPandas(
        lambda it: _mg_partition(it, "item", capacity),
        schema=f"item {dict(stream.dtypes)['item']}, lb long",
    ).persist()
    n_total = (
        partials.filter(F.col("item").isNull())
        .agg(F.sum("lb"))
        .collect()[0][0]
        or 0
    )
    cands = partials.filter(F.col("item").isNotNull()).select("item").distinct()
    exact = (
        stream.join(F.broadcast(cands), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > n_total)
        .withColumn("n_total", F.lit(n_total).cast("long"))
        .withColumnRenamed("item", col)
        .transform(truncate_lineage)
    )
    partials.unpersist()
    return exact


def mg_summary(
    items: DataFrame, col: str, capacity: int
) -> DataFrame:
    """A GLOBAL bounded Misra-Gries summary (item, lb) with at most
    ``capacity`` rows — the storable/mergeable artifact form of
    :func:`heavy_hitters`'s pass 1.

    Per-partition MG summaries (with counters) merge by summed counts,
    then one prune subtracts the (capacity+1)-th largest so the invariant
    "total undercount <= n/(capacity+1)" survives (Agarwal et al.,
    PODS'12: MG summaries are mergeable with no error inflation). The
    global merge runs over <= capacity x n_partitions rows — KBs.
    """
    stream = items.select(F.col(col).alias("item"))
    partials = stream.mapInPandas(
        lambda it: _mg_partition(it, "item", capacity),
        schema=f"item {dict(stream.dtypes)['item']}, lb long",
    ).filter(F.col("item").isNotNull())  # drop the row-count sentinels
    summed = partials.groupBy("item").agg(F.sum("lb").alias("lb"))
    return _mg_prune(summed, capacity)


def _mg_prune(summary: DataFrame, capacity: int) -> DataFrame:
    """Prune a summed (item, lb) frame back to ``capacity`` rows by
    subtracting the (capacity+1)-th largest lb (decrement-all, batched).
    The frame is summary-sized — the sort/limit is over KBs."""
    top = (
        summary.orderBy(F.desc("lb"), "item")
        .limit(capacity + 1)
        .collect()
    )
    if len(top) <= capacity:
        return summary
    cut = top[-1]["lb"]
    return summary.select(
        "item", (F.col("lb") - F.lit(cut)).alias("lb")
    ).filter(F.col("lb") > 0)


def mg_merge(a: DataFrame, b: DataFrame, capacity: int) -> DataFrame:
    """Merge two stored MG summaries — the continuous-ingest step: the
    standing summary absorbs each batch's summary without ever touching
    historical raw data. Outer-join sum + one prune."""
    summed = (
        a.select("item", "lb")
        .unionByName(b.select("item", "lb"))
        .groupBy("item")
        .agg(F.sum("lb").alias("lb"))
    )
    return _mg_prune(summed, capacity)


def mg_batch_sink(base_dir: str, col: str, capacity: int):
    """``foreachBatch`` body maintaining a STREAMING standing MG summary
    — continuous "trending items" over an unbounded stream with O(capacity)
    stored state and exactly-once folding across restarts (the snapshot
    ``batch_id`` replay guard of rollup_batch_sink): each micro-batch's
    bounded summary merges into the snapshot-stored summary; historical
    micro-batches are never rescanned. Read the current summary with
    ``read_snapshot`` — it is the provably-complete candidate set for any
    k <= capacity (verify against the raw stream when exactness is
    needed, as `incremental_heavy_hitters` does).
    """
    from ..sources.snapshots import (
        last_committed_batch,
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        last = last_committed_batch(base_dir)
        if last is not None and batch_id <= last:
            return
        batch_sum = mg_summary(batch_df, col, capacity)
        if snapshot_versions(base_dir):
            merged = mg_merge(
                read_snapshot(batch_df.sparkSession, base_dir),
                batch_sum,
                capacity,
            )
        else:
            merged = batch_sum
        write_snapshot(
            merged, base_dir, mode="overwrite", meta={"batch_id": batch_id}
        )

    return _write
