"""Persisted file-level DATA-SKIPPING index + index-backed scan.

The audit trilogy (``parquet_meta.pruning_report`` / page / bloom)
MEASURES how much a layout could skip; this module makes the skipping
ACTIONABLE without re-reading footers per query: ``build_skip_index``
distills every file's footer into one small typed-stats row, the caller
persists that frame as an ordinary parquet table (KBs per thousand
files), and ``indexed_scan`` answers ``lo <= column <= hi`` by pruning
the index FIRST and handing Spark only the surviving files — the same
min/max file elimination Delta/Iceberg do from their manifests, built
here from plain parquet footers (ref: dags/self_service_elt.py:1 — the
reference's self-service jobs re-list and re-scan full prefixes per
run; the index is the scalable restatement of that repeated scan).

Soundness contract (mirrors ``pruning_report``): a file is skipped only
when it PROVABLY misses — every row group carried stats of the
predicate's kind and the file window [min, max] is disjoint from
[lo, hi], or the file is all-NULL. Missing stats, foreign-typed stats,
or a truncated-stats writer all leave the file IN the scan. Integer
stats ride a dedicated long lane (never a double round-trip — a
2^53+ key must not round into a false miss).

Scale: index build is the footers-only ranged-read posture of
``lake_audit_report`` (one output row per file x column). ``indexed_scan``
collects ONE path string per SURVIVING file — bounded by the pruned
file count, the same driver-side list Spark's own file source
materializes for any read — then reads exactly those files with the
predicate still attached, so row-group/page skipping inside survivors
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .parquet_meta import (
    _footer_frame,
    _listing,
    _rel_label,
    _root_norm,
    read_footer_handle,
)

#: Index schema version — stamped on every row so a reader can refuse
#: an index produced by an incompatible builder.
INDEX_VERSION = 1


def build_skip_index(
    spark: SparkSession,
    path: str,
    columns: list[str],
    force_generic: bool = False,
    files: DataFrame | None = None,
    format: str = "parquet",
) -> DataFrame:
    """One row per (file, indexed column): the file-level stats an
    index-backed scan prunes with. Columns: ``path`` (full URI),
    ``partition`` (hive label), ``bytes``, ``n_rows``,
    ``n_row_groups``, ``column``, ``ptype``, typed min/max lanes
    (``min_i/max_i`` int64, ``min_d/max_d`` float/double,
    ``min_s/max_s`` string), ``null_count`` (None when any row group
    omitted it), ``num_values``, ``has_stats`` (every row group
    carried usable stats — the soundness gate), ``index_version``.

    File-level windows: min of row-group mins / max of maxs, valid
    only when every row group is statted.

    ``format="orc"`` indexes an ORC lake through the same row shape
    (round 9 — second-format parity): file-level ColumnStatistics from
    the tail (operators/orc_meta.py), int/date kinds on the long lane,
    float/double on the double lane, string/varchar/char on the string
    lane; ORC ``numberOfValues`` counts NON-NULL values, so the row is
    NORMALIZED to the index's parquet semantics (``num_values`` = all
    slots, ``null_count = n_rows - numberOfValues``) and the shared
    all-NULL rule ``null_count == num_values`` holds across both
    lanes. Missing file stats or a column absent from the type tree
    leave ``has_stats`` false (never pruned)."""
    if format not in ("parquet", "orc"):
        raise ValueError(f"build_skip_index: unknown format {format!r}")
    root_norm = _root_norm(path)
    cols = list(columns)

    def _rows(p, fsize, fh):
        f = read_footer_handle(fh, fsize)
        label = _rel_label(p, root_norm)
        out = []
        for name in cols:
            mn = mx = None
            nulls: int | None = 0
            nvals = 0
            ok = len(f["row_groups"]) > 0
            ptype = None
            for rg in f["row_groups"]:
                c = next(
                    (c for c in rg["columns"] if c["path"] == name),
                    None,
                )
                if c is None:
                    ok = False
                    break
                ptype = c["type"]
                nvals += c["num_values"]
                if c["null_count"] is None:
                    nulls = None
                elif nulls is not None:
                    nulls += c["null_count"]
                all_null = (
                    c["null_count"] is not None
                    and c["null_count"] == c["num_values"]
                )
                if c["min"] is None or c["max"] is None:
                    # an all-NULL row group legitimately has no
                    # min/max — it constrains nothing but doesn't
                    # invalidate the file window
                    if not all_null and c["num_values"] > 0:
                        ok = False
                    continue
                if isinstance(c["min"], bool):
                    ok = False
                    continue
                mn = c["min"] if mn is None else min(mn, c["min"])
                mx = c["max"] if mx is None else max(mx, c["max"])
            has = ok and (mn is not None or (nvals == 0 or nulls == nvals))
            is_i = has and isinstance(mn, int)
            is_d = has and isinstance(mn, float)
            is_s = has and isinstance(mn, str)
            out.append(
                {
                    "path": p,
                    "partition": label,
                    "bytes": fsize,
                    "n_rows": f["num_rows"],
                    "n_row_groups": len(f["row_groups"]),
                    "column": name,
                    "ptype": ptype,
                    "min_i": mn if is_i else None,
                    "max_i": mx if is_i else None,
                    "min_d": mn if is_d else None,
                    "max_d": mx if is_d else None,
                    "min_s": mn if is_s else None,
                    "max_s": mx if is_s else None,
                    "null_count": nulls,
                    "num_values": nvals,
                    "has_stats": bool(has),
                    "index_version": INDEX_VERSION,
                }
            )
        return out

    def _orc_rows(p, fsize, fh):
        from .orc_meta import column_id, read_orc_tail

        t = read_orc_tail(fh, fsize)
        label = _rel_label(p, root_norm)
        n_rows = t["num_rows"]
        out = []
        for name in cols:
            mn = mx = None
            nulls = None
            nvals = 0
            has = False
            ptype = None
            try:
                cid = column_id(t["types"], name)
            except ValueError:
                cid = None
            if cid is not None:
                ptype = t["types"][cid]["kind"]
                if cid < len(t["file_stats"]):
                    st = t["file_stats"][cid]
                    if st["n_values"] is not None:
                        # normalize to the index's PARQUET semantics:
                        # num_values counts ALL slots (so the shared
                        # all-NULL rule null_count == num_values
                        # holds); ORC's numberOfValues is non-null
                        nvals = n_rows
                        nulls = n_rows - st["n_values"]
                        mn, mx = st["min"], st["max"]
                        # window present, or provably all-NULL/empty
                        has = (
                            mn is not None and mx is not None
                        ) or st["n_values"] == 0
            is_i = has and isinstance(mn, int)
            is_d = has and isinstance(mn, float)
            is_s = has and isinstance(mn, str)
            out.append(
                {
                    "path": p,
                    "partition": label,
                    "bytes": fsize,
                    "n_rows": n_rows,
                    "n_row_groups": t["n_stripes"],
                    "column": name,
                    "ptype": ptype,
                    "min_i": mn if is_i else None,
                    "max_i": mx if is_i else None,
                    "min_d": mn if is_d else None,
                    "max_d": mx if is_d else None,
                    "min_s": mn if is_s else None,
                    "max_s": mx if is_s else None,
                    "null_count": nulls,
                    "num_values": nvals,
                    "has_stats": bool(has),
                    "index_version": INDEX_VERSION,
                }
            )
        return out

    schema = (
        "path string, partition string, bytes long, n_rows long, "
        "n_row_groups long, column string, ptype string, "
        "min_i long, max_i long, min_d double, max_d double, "
        "min_s string, max_s string, null_count long, "
        "num_values long, has_stats boolean, index_version int"
    )
    glob = "*.orc" if format == "orc" else "*.parquet"
    return _footer_frame(
        _listing(spark, path, glob=glob) if files is None else files,
        _orc_rows if format == "orc" else _rows,
        schema,
        force_generic,
    )


def refresh_skip_index(
    spark: SparkSession,
    path: str,
    old_index: DataFrame,
    columns: list[str],
    force_generic: bool = False,
    format: str = "parquet",
) -> DataFrame:
    """Incremental index maintenance: bring ``old_index`` up to date
    with the lake at ``path`` WITHOUT re-reading footers for files the
    index already covers. File identity is (path, bytes) — a file
    that vanished drops out, a file whose size changed (rewritten in
    place) re-reads, a new file reads for the first time, everything
    else reuses its existing index rows byte-for-byte. ``columns``
    must be the set the old index was built with (rows for a file are
    reused wholesale; a widened column list needs a fresh
    ``build_skip_index``).

    Scale: the incremental cost is footer reads for CHANGED files
    only, plus one file-listing join against the index — refreshing a
    100 TB lake that gained a day's partitions costs that day's
    footers, not the lake's."""
    glob = "*.orc" if format == "orc" else "*.parquet"
    listing = _listing(spark, path, glob=glob).select("path", "length")
    old = old_index.filter(F.col("index_version") == INDEX_VERSION)
    known = old.select(
        "path", F.col("bytes").alias("length")
    ).distinct()
    fresh_files = listing.join(known, ["path", "length"], "left_anti")
    kept = old.join(
        listing.withColumnRenamed("length", "bytes"),
        ["path", "bytes"],
        "left_semi",
    ).select(*old.columns)  # joins front their keys; keep index order
    fresh = build_skip_index(
        spark, path, columns, force_generic, files=fresh_files,
        format=format,
    )
    return kept.unionByName(fresh)


def _survivors(index: DataFrame, column: str, lo, hi) -> DataFrame:
    """Index rows for ``column`` that might satisfy lo <= v <= hi.

    Provable miss = has_stats AND (typed window disjoint OR file
    all-NULL). Everything else survives — including rows without
    stats and predicates typed differently from the stats."""
    if isinstance(lo, bool) or isinstance(hi, bool):
        raise ValueError("indexed_scan: boolean predicates not supported")
    ix = index.filter(F.col("column") == column).filter(
        F.col("index_version") == INDEX_VERSION
    )
    if isinstance(lo, int):
        window_miss = (F.col("max_i") < lo) | (F.col("min_i") > hi)
    elif isinstance(lo, float):
        window_miss = (F.col("max_d") < lo) | (F.col("min_d") > hi)
    elif isinstance(lo, str):
        window_miss = (F.col("max_s") < lo) | (F.col("min_s") > hi)
    else:
        raise ValueError(f"indexed_scan: unsupported bound type {type(lo)}")
    all_null = (F.col("null_count").isNotNull()) & (
        F.col("null_count") == F.col("num_values")
    )
    miss = F.col("has_stats") & (
        F.coalesce(window_miss, F.lit(False)) | all_null
    )
    return ix.filter(~miss)


def indexed_scan(
    spark: SparkSession,
    index: DataFrame,
    root: str,
    column: str,
    lo,
    hi,
    format: str = "parquet",
) -> DataFrame:
    """Read only the files the skip index can't rule out for
    ``lo <= column <= hi``, with the predicate re-applied (the index
    prunes FILES; row-group/page pruning inside survivors and exact
    filtering remain the scan's job). ``root`` anchors hive partition
    column recovery (``basePath``). An index that rules out every
    file returns an empty frame with the table's schema.
    ``format="orc"`` scans an ORC lake (the index itself is
    format-agnostic — same row shape either way)."""
    if format not in ("parquet", "orc"):
        raise ValueError(f"indexed_scan: unknown format {format!r}")
    paths = [
        r["path"]
        for r in _survivors(index, column, lo, hi)
        .select("path")
        .collect()
    ]
    reader = spark.read.option("basePath", root)
    if format == "orc":
        # DataFrameReader.orc takes a LIST (extra positionals bind to
        # mergeSchema/... options); .parquet takes varargs
        load = lambda *ps: reader.orc(list(ps))  # noqa: E731
    else:
        load = reader.parquet
    if not paths:
        return load(root).filter(F.lit(False))
    return load(*paths).filter(F.col(column).between(lo, hi))


def scan_file_counts(index: DataFrame, column: str, lo, hi) -> DataFrame:
    """Per-partition pruning accounting for a predicate against the
    index alone (no data I/O): ``n_files, n_files_read, rows_total,
    rows_scanned`` — the planner-side view of what ``indexed_scan``
    will pay."""
    ix = index.filter(F.col("column") == column)
    surv = _survivors(index, column, lo, hi).select(
        "path", F.lit(1).alias("_live")
    )
    return (
        ix.join(surv, "path", "left")
        .groupBy("partition")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(F.coalesce(F.col("_live"), F.lit(0))).alias(
                "n_files_read"
            ),
            F.sum("n_rows").alias("rows_total"),
            F.sum(
                F.when(F.col("_live").isNotNull(), F.col("n_rows")).otherwise(0)
            ).alias("rows_scanned"),
        )
    )
