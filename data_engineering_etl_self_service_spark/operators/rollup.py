"""Incremental rollups (continuous aggregates): answer coarse-grain
queries from fine-grain partials without ever rescanning raw data.

The 100 TB pattern behind every "hypertable continuous aggregate" /
"materialized rollup": raw events are aggregated ONCE, at ingest, into a
small partial-aggregate table at a fine grain (e.g. hour × event_type);
dashboards then aggregate the partials up to day/week/total — touching
kilobytes, not the 100 TB of raw history. Only MERGEABLE aggregates
qualify (count, sum, min, max): their partials combine associatively, so
ingest order cannot change the result.

Exactness: sums are stored in the partial table as DECIMAL(38,6)
(functions/numeric.py transit) and only cast to DOUBLE at read time —
merging double partials would re-introduce float-order nondeterminism.

Storage is a snapshot table (sources/snapshots.py): each upsert commits
an atomic new version (readers never see a half-merged rollup, old
versions stay time-travelable), the agg spec is recorded in the manifest
so reads are self-describing, and the streaming sink reuses the
snapshot ``batch_id`` replay guard for exactly-once maintenance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DECIMAL_TYPE
from ..sources.snapshots import (
    last_committed_batch,
    read_snapshot,
    snapshot_versions,
    write_snapshot,
)

#: agg kinds → (partial expression over raw rows, merge function over partials)
_KINDS = ("count", "sum", "min", "max", "hll", "hist:<lo>:<hi>:<bins>")


def _partial(kind: str, col: str | None) -> Column:
    if kind == "count":
        # count(*) without a column; count(col) (non-null) with one —
        # both merge by summing. Exact COUNT(DISTINCT) is deliberately
        # absent: it is not mergeable — use kind "hll" instead.
        return F.count(F.lit(1)) if col is None else F.count(col)
    if kind == "sum":
        return F.sum(F.col(col).cast(DECIMAL_TYPE))
    if kind == "min":
        return F.min(col)
    if kind == "max":
        return F.max(col)
    if kind == "hll":
        # approximate distinct as a MERGEABLE few-KB sketch state (Apache
        # DataSketches HLL): the partial table stores the binary sketch,
        # merges union it, and the read estimates — distinct-per-grain
        # dashboards without ever rescanning raw history. Estimates are
        # approximate by contract (rows-only tier; exact twin:
        # distinct_counts / the raw COUNT(DISTINCT)).
        return F.hll_sketch_agg(col, 12)
    if kind.startswith("hist:"):
        # fixed-bin histogram partial: "hist:<lo>:<hi>:<bins>" stores an
        # array<long> of bin counts per grain — EXACT-mergeable (unlike a
        # t-digest) because element-wise array addition is associative,
        # and enough for percentile-at-read dashboards with bin-width
        # resolution. Out-of-range values clamp to the edge bins, and
        # NULLs are EXCLUDED (explicitly, below — without the guard,
        # Spark's null-skipping greatest() would silently clamp NULL to
        # bin 0), so the total is always the NON-NULL row count; hist
        # percentile denominators therefore also exclude NULLs, while
        # the "count" kind counts per its own column argument.
        lo, hi, bins = _hist_spec(kind)
        width = (hi - lo) / bins
        idx = F.when(
            F.col(col).isNotNull(),
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(col) - F.lit(lo)) / F.lit(width)
                    ).cast("int"),
                ),
            ),
        )
        return F.array(
            *[
                F.sum(F.when(idx == i, 1).otherwise(0)).cast("long")
                for i in range(bins)
            ]
        )
    raise ValueError(f"unmergeable agg kind: {kind!r} (want one of {_KINDS})")


def _hist_spec(kind: str) -> "tuple[float, float, int]":
    _, lo, hi, bins = kind.split(":")
    lo, hi, bins = float(lo), float(hi), int(bins)
    assert hi > lo and bins >= 2, f"bad hist spec {kind!r}"
    return lo, hi, bins


def _merge(kind: str, col: str) -> Column:
    # count partials re-combine by summing; sums stay in exact decimal;
    # hll sketch states union
    if kind in ("count", "sum"):
        return F.sum(col)
    if kind == "hll":
        return F.hll_union_agg(col)
    if kind.startswith("hist:"):
        _, _, bins = _hist_spec(kind)
        zero = F.array_repeat(F.lit(0).cast("long"), bins)
        return F.aggregate(
            F.collect_list(col),
            zero,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        )
    return _partial(kind, col)


def upsert_rollup(
    spark: SparkSession,
    base_dir: str,
    batch: DataFrame,
    grains: "dict[str, Column]",
    aggs: "dict[str, tuple[str, str | None]]",
    batch_id: int | None = None,
    run_key: str | None = None,
) -> int:
    """Fold ``batch`` into the rollup at ``base_dir``; returns the new
    snapshot version.

    ``grains`` maps output grain column names to expressions over the
    raw batch (e.g. ``{"hour": F.date_trunc("hour", F.col("ts"))}``);
    ``aggs`` maps output columns to ``(kind, source_col)`` with kind in
    count/sum/min/max. One shuffle on the grain key for the batch
    partials; the merge then groups |existing ∪ new| grain rows — the
    (small) rollup itself, never raw history.

    Folding is NOT naturally idempotent (re-ingesting a batch
    double-counts), so callers with replayable inputs pass an identity:
    ``batch_id`` (monotonic — the streaming guard) or ``run_key`` (any
    string, e.g. the ``ds`` partition — the batch/backfill guard; seen
    keys are recorded in the vacuum-proof sidecar and re-runs become
    no-ops).
    """
    if run_key is not None and run_key in _sidecar(base_dir).get("runs", []):
        return snapshot_versions(base_dir)[-1]
    gcols = [expr.alias(name) for name, expr in grains.items()]
    gnames = list(grains)
    part = batch.groupBy(*gcols).agg(
        *[_partial(kind, col).alias(out) for out, (kind, col) in aggs.items()]
    )
    if snapshot_versions(base_dir):
        cur = read_snapshot(spark, base_dir)
        part = (
            cur.unionByName(part)
            .groupBy(*gnames)
            .agg(
                *[
                    _merge(kind, out).alias(out)
                    for out, (kind, _) in aggs.items()
                ]
            )
        )
    kinds = {out: kind for out, (kind, _) in aggs.items()}
    meta: dict = {"rollup_aggs": kinds}
    if batch_id is not None:
        meta["batch_id"] = batch_id
    v = write_snapshot(part, base_dir, mode="overwrite", meta=meta)
    # durable sidecar: vacuum drops old manifests and maintenance commits
    # don't restate the spec, so the agg kinds and the seen run keys
    # resolve from here when the head manifest lacks them
    side = _sidecar(base_dir)
    side["rollup_aggs"] = kinds
    if run_key is not None:
        side.setdefault("runs", []).append(run_key)
    _write_sidecar(base_dir, side)
    return v


def _sidecar(base_dir: str) -> dict:
    import json
    import os

    p = os.path.join(base_dir, "_snapshots", "rollup_spec.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _write_sidecar(base_dir: str, side: dict) -> None:
    import json
    import os

    os.makedirs(os.path.join(base_dir, "_snapshots"), exist_ok=True)
    tmp = os.path.join(base_dir, "_snapshots", ".rollup_spec.tmp")
    with open(tmp, "w") as f:
        json.dump(side, f)
    os.replace(tmp, os.path.join(base_dir, "_snapshots", "rollup_spec.json"))


def read_rollup(
    spark: SparkSession,
    base_dir: str,
    group_exprs: "dict[str, Column] | None" = None,
    version: int | None = None,
) -> DataFrame:
    """Aggregate the stored partials up to a coarser grain.

    ``group_exprs`` maps output names to expressions over the PARTIAL
    table's grain columns (e.g. ``{"day": F.to_date(F.col("hour"))}``);
    None returns the grand total. Agg kinds come from the manifest, so
    callers never restate them. Sums surface as DOUBLE, counts as LONG.
    """
    import json
    import os

    part = read_snapshot(spark, base_dir, version=version)
    # agg kinds: newest manifest at-or-before the read version carrying
    # them, else the durable spec sidecar (maintenance commits don't
    # restate the spec and vacuum drops old manifests)
    kinds: dict[str, str] | None = None
    versions = snapshot_versions(base_dir)
    upto = [v for v in versions if version is None or v <= version]
    for v in reversed(upto):
        with open(
            os.path.join(base_dir, "_snapshots", f"v{v:012d}.json")
        ) as f:
            m = json.load(f)
        if "rollup_aggs" in m:
            kinds = m["rollup_aggs"]
            break
    if kinds is None:
        spec_path = os.path.join(base_dir, "_snapshots", "rollup_spec.json")
        if os.path.exists(spec_path):
            with open(spec_path) as f:
                kinds = json.load(f)["rollup_aggs"]
    if kinds is None:
        raise ValueError(f"no rollup spec found at {base_dir}")

    def final(out: str, kind: str) -> Column:
        m = _merge(kind, out)
        if kind == "sum":
            return m.cast("double").alias(out)
        if kind == "count":
            return m.cast("long").alias(out)
        if kind == "hll":
            return F.hll_sketch_estimate(m).cast("long").alias(out)
        return m.alias(out)  # hist surfaces the merged array<long>

    gcols = (
        [expr.alias(name) for name, expr in group_exprs.items()]
        if group_exprs
        else []
    )
    aggs = [final(out, kind) for out, kind in kinds.items()]
    if gcols:
        return part.groupBy(*gcols).agg(*aggs)
    return part.agg(*aggs)


def rollup_batch_sink(
    base_dir: str,
    grains: "dict[str, Column]",
    aggs: "dict[str, tuple[str, str | None]]",
):
    """``foreachBatch`` body maintaining the rollup EXACTLY-ONCE across
    restarts: a crash-replayed micro-batch (``batch_id`` at or below the
    committed watermark) is skipped instead of double-counted — the same
    manifest-carried guard as ``snapshot_batch_sink``, which maintenance
    (compact/vacuum) preserves.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        last = last_committed_batch(base_dir)
        if last is not None and batch_id <= last:
            return
        upsert_rollup(
            batch_df.sparkSession,
            base_dir,
            batch_df,
            grains,
            aggs,
            batch_id=batch_id,
        )

    return _write


def hist_percentile(
    hist: Column, p_num: int, p_den: int, kind: str
) -> Column:
    """Approximate percentile from a merged ``hist:`` rollup array: the
    upper edge of the smallest bin whose cumulative count reaches
    ``p_num/p_den`` of the total. Bin choice is integer arithmetic
    (``cum * p_den >= p_num * total``) so the answer is deterministic
    and engine-portable; resolution is one bin width by construction.
    Expression-only (no UDF) — a chain of ``bins`` comparisons over the
    rollup-sized row.
    """
    lo, hi, bins = _hist_spec(kind)
    width = (hi - lo) / bins
    elems = [F.element_at(hist, i + 1) for i in range(bins)]
    total = elems[0]
    for e in elems[1:]:
        total = total + e
    cums = []
    c = elems[0]
    for e in elems[1:]:
        cums.append(c)
        c = c + e
    cums.append(c)
    expr: Column = F.lit(float(hi))
    for i in reversed(range(bins)):
        expr = F.when(
            cums[i] * p_den >= p_num * total,
            F.lit(float(lo + (i + 1) * width)),
        ).otherwise(expr)
    return expr
