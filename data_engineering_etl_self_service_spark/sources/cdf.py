"""Streaming change-data-feed (CDF) over snapshot tables.

The Delta CDF / Iceberg incremental-read analog for the manifest
protocol of ``sources/snapshots.py`` (round 11 — VERDICT r10 #1): a
downstream pipeline tails a snapshot table and receives each committed
version's row-level changes as ``(row..., change_type, version)``
micro-batches, instead of polling and re-diffing with
``snapshot_diff``. This natively completes the reference's
Kafka→Spark handoff (ref: dags/kafka_stream.py:87-92 recovered — its
consumer re-reads a topic to learn what changed; here the TABLE is the
topic).

Two faces, one change-derivation contract:

- :func:`changes_between` — BATCH: the change feed for versions in
  ``(after_version, to_version]`` as one DataFrame (plain reads +
  joins; Catalyst plans it like any query).
- ``spark.readStream.format("snapshot_cdf").option("path", dir)`` — a
  PySpark-4 Python STREAMING data source. Offsets are committed
  version numbers, so Spark's own checkpoint makes the tail
  crash-resumable (the offset log persists the last-emitted version —
  the read-side mirror of ``snapshot_batch_sink``'s batch_id guard);
  ``trigger(availableNow=True)`` drains everything committed and
  stops. Partitions are planned per data/vector FILE and decoded
  EXECUTOR-side with Arrow (``pyarrow``), so throughput scales with
  the cluster, not a driver loop.

Change derivation per committed version (manifest modes):

- ``append``      → the NEW data dirs' rows as ``insert`` (reads only
  the appended files — an append to a 100 TB table costs its own rows).
- ``delete``      → the NEW position-delete vectors' rows as
  ``delete`` (one semi-join of the referenced files against the new
  vector; rows already dead can't reappear — ``delete_where`` scans
  through prior vectors, so each vector holds first deaths only).
- ``overwrite``   → full restatement: the PREVIOUS version's visible
  rows as ``delete`` plus the new version's rows as ``insert`` (the
  key-less contract Iceberg's changelog scan uses; with natural keys,
  downstream can reconcile delete+insert pairs — or use
  ``snapshot_diff`` for keyed update classification).
- ``merge``       → delta merge (``merge_into_snapshot_delta``): the
  NEW vectors' rows as ``delete`` plus the NEW dirs' rows as
  ``insert`` — both are the commit's own delta; a keyed consumer
  reconciles same-version delete+insert pairs into updates
  (:func:`reconcile_updates`).
- ``compact`` / ``materialize`` / any commit tagged
  ``maintenance: true`` (``compact_snapshot``) → NO rows: data-layout
  maintenance never changes logical content, so the feed is silent.

History expiry (``vacuum``) follows the Delta/Iceberg contract: a
consumer starting BEFORE the earliest retained version gets that
version as an initial-snapshot of ``insert`` rows; a consumer whose
next version's PARENT manifest was vacuumed away cannot be diffed and
fails loudly — schedule ``vacuum(keep_last=...)`` to cover consumer
lag.

Both table formats (parquet + ORC) are supported end to end; the
format rides the manifest, never file extensions.
"""

from __future__ import annotations

import os
import posixpath
import urllib.parse

from pyspark.sql import DataFrame, SparkSession

from .snapshots import (
    _BROADCAST_DELETE_ROWS,
    _read_manifest,
    _table_format,
    read_snapshot,
    snapshot_versions,
)

CHANGE_COL = "change_type"
VERSION_COL = "version"

#: data-file suffixes per manifest format (never trust extensions for
#: DISPATCH — the manifest names the format; suffixes only filter out
#: _SUCCESS/.crc noise when listing a dir of that known format)
_DATA_SUFFIX = {"parquet": ".parquet", "orc": ".orc"}


# ---------------------------------------------------------------------------
# per-version change classification (shared by batch + stream)
# ---------------------------------------------------------------------------


def _classify_version(base_dir: str, v: int, committed: set[int]) -> dict:
    """What changed at version ``v``, derived from manifests only (no
    data I/O): a dict with ``kind`` in

    - ``none``            — maintenance commit, feed is silent
    - ``initial``         — parent expired/absent: v's visible state as inserts
    - ``insert_dirs``     — append: only ``new_dirs`` rows are inserts
    - ``delete_vecs``     — delete: only ``new_vecs`` positions died
    - ``restate``         — overwrite: delete-all-parent + insert-all-new
    - ``merge``           — delta merge: ``new_vecs`` positions died AND
      ``new_dirs`` rows are inserts (``merge_into_snapshot_delta`` —
      a keyed consumer reconciles same-version pairs into updates)
    """
    m = _read_manifest(base_dir, v)
    mode = m.get("mode")
    fmt = _table_format(m)
    parent = _read_manifest(base_dir, v - 1) if (v - 1) in committed else None
    if parent is None and v > 1 and v - 1 >= min(committed, default=v):
        # versions are dense; a missing interior parent can't happen
        raise FileNotFoundError(
            f"snapshot v{v - 1} manifest missing at {base_dir}"
        )
    if parent is None and v > 1:
        # v is the table's earliest retained version: emit its visible
        # state as an initial snapshot (vectors of v applied). This
        # check runs BEFORE the maintenance short-circuit — after the
        # documented compact→vacuum maintenance pair the earliest
        # retained version IS a maintenance commit, and classifying it
        # 'none' would hand a from-the-beginning consumer an EMPTY
        # feed (review r11: silent total loss on the standard
        # maintenance schedule).
        return {"kind": "initial", "manifest": m, "fmt": fmt}
    if mode in ("compact", "materialize") or m.get("maintenance"):
        return {"kind": "none", "manifest": m, "fmt": fmt}
    if parent is None:
        # v == 1: the table's first commit, whatever its mode
        return {"kind": "initial", "manifest": m, "fmt": fmt}
    if mode == "append":
        prev = set(parent.get("data_dirs", []))
        return {
            "kind": "insert_dirs",
            "manifest": m,
            "fmt": fmt,
            "new_dirs": [d for d in m["data_dirs"] if d not in prev],
        }
    if mode == "delete":
        prev = set(parent.get("delete_dirs", []))
        return {
            "kind": "delete_vecs",
            "manifest": m,
            "fmt": fmt,
            "new_vecs": [
                d for d in m.get("delete_dirs", []) if d not in prev
            ],
        }
    if mode == "overwrite":
        return {
            "kind": "restate",
            "manifest": m,
            "fmt": fmt,
            "parent": parent,
        }
    if mode == "merge":
        prev_dirs = set(parent.get("data_dirs", []))
        prev_vecs = set(parent.get("delete_dirs", []))
        return {
            "kind": "merge",
            "manifest": m,
            "fmt": fmt,
            "new_dirs": [
                d for d in m["data_dirs"] if d not in prev_dirs
            ],
            "new_vecs": [
                d for d in m.get("delete_dirs", []) if d not in prev_vecs
            ],
        }
    raise ValueError(
        f"snapshot v{v} at {base_dir} has unknown mode {mode!r} — "
        "cannot derive a change feed for it"
    )


def _plan_versions(
    base_dir: str, after_version: int, to_version: int | None
) -> list[int]:
    """Committed versions in ``(after_version, to_version]``, with the
    history-expiry contract enforced: a consumer starting from the
    beginning (``after_version <= 0``) gets the earliest retained
    version as an initial snapshot; a consumer that HAS seen a version
    (``after_version >= 1``) whose successor's parent manifest was
    vacuumed away cannot be diffed and fails loudly — silent
    re-insertion of rows it already holds is the one thing a change
    feed must never do."""
    committed = snapshot_versions(base_dir)
    if not committed:
        raise FileNotFoundError(f"no snapshots at {base_dir}")
    hi = committed[-1] if to_version is None else to_version
    vs = [v for v in committed if after_version < v <= hi]
    # versions are dense, so an expired parent can only mean the range
    # start fell off the retained suffix
    if vs and after_version >= 1 and (vs[0] - 1) not in committed:
        raise ValueError(
            f"change-feed history expired at {base_dir}: the consumer "
            f"last saw v{after_version}, but v{vs[0] - 1} (the parent "
            f"needed to diff v{vs[0]}) was vacuumed. Re-sync from a "
            "full read, or retain more history (vacuum keep_last must "
            "cover consumer lag)."
        )
    return vs


# ---------------------------------------------------------------------------
# BATCH face
# ---------------------------------------------------------------------------


def _with_change(df: DataFrame, change: str, v: int) -> DataFrame:
    from pyspark.sql import functions as F

    return df.select(
        "*",
        F.lit(change).alias(CHANGE_COL),
        F.lit(v).cast("long").alias(VERSION_COL),
    )


def _read_dirs(
    spark: SparkSession, base_dir: str, dirs: list[str], fmt: str
) -> DataFrame:
    paths = [os.path.join(base_dir, d) for d in dirs]
    reader = spark.read.option("mergeSchema", "true")
    if fmt == "orc":
        return reader.orc(paths)  # .orc takes a LIST, not varargs
    return reader.parquet(*paths)


def _deleted_rows(
    spark: SparkSession, base_dir: str, info: dict
) -> DataFrame:
    """The rows a ``delete`` commit killed: ONLY the data files the new
    vectors reference (their distinct file keys are a bounded metadata
    collect), semi-joined against the vectors on (file, pos) —
    broadcast under the same cap as every vector reader. Reading whole
    data dirs here would make a 100-row delete on a 100k-file version
    cost a full table scan (review r11); the streaming face plans
    per-referenced-file already. Prior vectors need no application:
    ``delete_where`` computes matches through them, so a new vector
    holds only rows that were visible at its parent."""
    from pyspark.sql import functions as F

    from .snapshots import _DV_FILE, _DV_POS, _rel_file_col

    import re

    m = info["manifest"]
    vecs = spark.read.parquet(
        *[os.path.join(base_dir, d) for d in info["new_vecs"]]
    ).select("file", "pos")
    keys = [
        r["file"] for r in vecs.select("file").distinct().collect()
    ]
    # keys are relative to the table root when either root-strip fired
    # at write time, absolute otherwise (symlink/mount spellings —
    # _rel_file_col). An absolute key is NOT under basePath=base_dir,
    # so reading it there raises AnalysisException; mirror the
    # streaming face (read(), delete_vec branch — ADVICE r11): group
    # absolute keys by their 'data/<uuid>' version-dir prefix and read
    # each group under THAT root, so hive partition columns below it
    # still discover. basePath keeps those columns discoverable when
    # the referenced files live under key=value subdirs.
    rel_keys = sorted(k for k in keys if not k.startswith("/"))
    by_root: dict[str, list[str]] = {}
    for k in sorted(keys):
        if k.startswith("/"):
            mt = re.match(r"^(.*/data/[^/]+)/", k)
            root = mt.group(1) if mt else os.path.dirname(k)
            by_root.setdefault(root, []).append(k)

    def _lineage(raw: DataFrame, key_col) -> DataFrame:
        # _metadata is a hidden SCAN column: it must materialize into
        # real columns per read, BEFORE any union
        return raw.withColumn(_DV_FILE, key_col).withColumn(
            _DV_POS, F.col("_metadata.row_index")
        )

    #: for ABSOLUTE-key groups the join key is the raw schemeless
    #: path, NOT the root-stripped one: the files are read AT the
    #: vector's own key paths, so the raw spelling matches the stored
    #: key by construction (the stream face's logic) — root-stripping
    #: could re-relativize a path the writer stored absolute and
    #: silently match nothing
    abs_key = F.regexp_replace(
        F.col("_metadata.file_path"), r"^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"
    )
    frames = []
    if rel_keys:
        frames.append(
            _lineage(
                spark.read.option("mergeSchema", "true")
                .option("basePath", base_dir)
                .parquet(*[os.path.join(base_dir, k) for k in rel_keys]),
                _rel_file_col(base_dir),
            )
        )
    for root in sorted(by_root):
        frames.append(
            _lineage(
                spark.read.option("mergeSchema", "true")
                .option("basePath", root)
                .parquet(*by_root[root]),
                abs_key,
            )
        )
    df = frames[0]
    for fdf in frames[1:]:
        df = df.unionByName(fdf, allowMissingColumns=True)
    if m.get("n_deleted", 0) <= _BROADCAST_DELETE_ROWS:
        vecs = F.broadcast(vecs)
    return df.join(
        vecs,
        (df[_DV_FILE] == vecs["file"]) & (df[_DV_POS] == vecs["pos"]),
        "left_semi",
    ).drop(_DV_FILE, _DV_POS)


def reconcile_updates(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keyed update classification over a change feed (round 12 —
    VERDICT r11 #2, the Delta CDF semantics): same-version
    ``delete``+``insert`` pairs on equal keys — a restatement's two
    halves, or a delta merge's kill+replace — reconcile into
    ``update_preimage``/``update_postimage`` row pairs; pairs whose
    non-key columns are all equal (rows a restatement carried through
    unchanged) drop entirely; unpaired rows keep their original
    ``change_type``. Works on any frame speaking the feed contract
    (table columns + ``change_type`` + ``version``): the batch face's
    output, or each micro-batch of the streaming source inside
    ``foreachBatch`` (the per-FILE streaming partitions cannot pair
    rows across files, so keyed classification is a one-join batch
    transform by design — see ``replicate_snapshot`` for the apply
    side).

    ``key_cols`` must uniquely identify rows within one version.
    Rows with a NULL key never pair (SQL equality): they surface as
    the unpaired delete + insert, the same documented behavior as
    ``snapshot_diff``. Change types other than 'insert'/'delete'
    (an already-reconciled frame) pass through untouched.

    Plan: ONE pass over the feed — a single grouped aggregation on
    (version, key) collects each key's ≤1 insert and ≤1 delete side
    (plus any passthrough rows), classification is an array expression
    exploded back out. The feed is scanned exactly once (review r12:
    the join formulation filtered the uncached feed three times — 3×
    the Arrow decode on a deep-range backfill), and the one key
    shuffle matches the ``snapshot_diff`` cost contract."""
    from pyspark.sql import functions as F

    missing = [k for k in key_cols if k not in df.columns]
    if missing or not key_cols:
        raise ValueError(
            f"reconcile_updates: key columns {missing or key_cols!r} "
            "not in the feed frame"
        )
    for c in (CHANGE_COL, VERSION_COL):
        if c not in df.columns:
            raise ValueError(
                f"reconcile_updates expects a change-feed frame with "
                f"{c!r} (got columns {df.columns})"
            )
    table_cols = [
        c for c in df.columns if c not in (CHANGE_COL, VERSION_COL)
    ]
    data_cols = [c for c in table_cols if c not in key_cols]

    # the per-row payload carried through the aggregation; keys-only
    # tables carry a placeholder so the struct is never empty
    payload = (
        F.struct(*[F.col(c) for c in data_cols])
        if data_cols
        else F.struct(F.lit(1).alias("__present"))
    )
    is_ins = F.col(CHANGE_COL) == "insert"
    is_del = F.col(CHANGE_COL) == "delete"
    g = df.groupBy(VERSION_COL, *key_cols).agg(
        # collect_list skips NULLs; under the key contract each side
        # holds ≤1 element (try_element_at(.,1) is NULL on the empty
        # side — element_at throws under ANSI — and pins determinism
        # only for contract-violating duplicate keys, like
        # snapshot_diff's tiebreak). No max(struct): structs carrying
        # maps aren't orderable, collect_list doesn't care.
        F.try_element_at(
            F.collect_list(F.when(is_ins, payload)), F.lit(1)
        ).alias("_new"),
        F.try_element_at(
            F.collect_list(F.when(is_del, payload)), F.lit(1)
        ).alias("_old"),
        F.collect_list(
            F.when(
                ~is_ins & ~is_del,
                F.struct(
                    payload.alias("_r"), F.col(CHANGE_COL).alias("_ct")
                ),
            )
        ).alias("_others"),
    )
    if data_cols:
        changed = None
        for c in data_cols:
            t = ~F.col(f"_old.{c}").eqNullSafe(F.col(f"_new.{c}"))
            changed = t if changed is None else (changed | t)
    else:
        changed = F.lit(False)

    def _mk(side: str, tag: str) -> F.Column:
        return F.struct(
            *[F.col(f"{side}.{c}").alias(c) for c in data_cols],
            F.lit(tag).alias(CHANGE_COL),
        )

    both = F.col("_old").isNotNull() & F.col("_new").isNotNull()
    pairs = (
        F.when(
            F.col("_old").isNull() & F.col("_new").isNotNull(),
            F.array(_mk("_new", "insert")),
        )
        .when(
            F.col("_new").isNull() & F.col("_old").isNotNull(),
            F.array(_mk("_old", "delete")),
        )
        .when(
            both & changed,
            F.array(
                _mk("_old", "update_preimage"),
                _mk("_new", "update_postimage"),
            ),
        )
        # unchanged pair (or neither side, i.e. passthrough-only key):
        # a LENGTH-0 slice of a correctly-TYPED array — the drop
        .otherwise(F.slice(F.array(_mk("_new", "insert")), 1, 0))
    )
    others = F.transform(
        F.col("_others"),
        lambda o: F.struct(
            *[o["_r"][c].alias(c) for c in data_cols],
            o["_ct"].alias(CHANGE_COL),
        ),
    )
    return g.select(
        F.col(VERSION_COL),
        *key_cols,
        F.explode(F.concat(pairs, others)).alias("_e"),
    ).select(
        *[
            F.col(c) if c in key_cols else F.col(f"_e.{c}").alias(c)
            for c in table_cols
        ],
        F.col(f"_e.{CHANGE_COL}").alias(CHANGE_COL),
        F.col(VERSION_COL),
    )


#: one-shot guard for the by-value registration below — the effect is
#: process-global, so repeated registration only re-pays the bookkeeping
_PICKLE_BY_VALUE_DONE = False


def _ensure_pickle_by_value() -> None:
    """Register the cdf + snapshots modules for BY-VALUE cloudpickle
    serialization, once per process — the Python workers that execute
    the streaming source AND the deep-history ``mapInArrow`` route
    inherit only PYTHONPATH, so a driver that put this repo on
    ``sys.path`` by hand (the supported external driver contract)
    would otherwise ship closures the workers can't import (review
    r12: the batch route hit exactly that cliff at version
    ``max_union_versions+1``). See :func:`register_snapshot_cdf` for
    the task-payload cost this trades."""
    global _PICKLE_BY_VALUE_DONE
    if _PICKLE_BY_VALUE_DONE:
        return
    try:
        from pyspark import cloudpickle as _cp  # Spark's serializer
    except ImportError:  # pragma: no cover
        import cloudpickle as _cp  # type: ignore[no-redef]
    import sys

    for modname in (
        __name__,
        __name__.rsplit(".", 1)[0] + ".snapshots",
    ):
        mod = sys.modules.get(modname)
        if mod is not None:
            try:
                _cp.register_pickle_by_value(mod)
            except Exception:  # pragma: no cover - older cloudpickle
                pass
    _PICKLE_BY_VALUE_DONE = True


def _changes_via_files(
    spark: SparkSession,
    base_dir: str,
    after_version: int,
    to_version: int,
    head_schema,
    infos: dict | None = None,
) -> DataFrame:
    """Deep-history batch route (round 12 — VERDICT r11 #3): the
    union-arm face grows its analyzed plan by one scan per version, the
    same plan-growth class the r11 sf0.1 sweep caught in connected
    components — a backfill over 10³–10⁴ committed versions pays
    quadratic analysis cost or OOMs the driver. This route reuses the
    STREAMING face's per-file planner instead: one spec row per
    data/vector file, decoded executor-side with Arrow
    (``_read_partition_spec``) under a single ``mapInArrow`` node — the
    plan is O(1) in version count, and each version still costs only
    its own delta I/O. Pushdown is moot (the feed is whole-row by
    contract)."""
    import json

    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    # the _gen closure below references this module by name; make it
    # self-contained on the wire for bare-sys.path drivers
    _ensure_pickle_by_value()
    parts = _plan_partitions(
        base_dir, after_version, to_version, infos=infos
    )
    out_struct = T.StructType(
        list(head_schema.fields)
        + [
            T.StructField(CHANGE_COL, T.StringType(), False),
            T.StructField(VERSION_COL, T.LongType(), False),
        ]
    )
    if not parts:
        return spark.createDataFrame([], out_struct)
    arrow_schema = to_arrow_schema(out_struct)
    specs = [(json.dumps(p),) for p in parts]
    n_tasks = max(
        1, min(len(specs), spark.sparkContext.defaultParallelism * 2)
    )
    spec_df = spark.createDataFrame(specs, "spec string").repartition(
        n_tasks
    )

    def _gen(batches):
        for b in batches:
            for s in b.column(0).to_pylist():
                yield from _read_partition_spec(
                    json.loads(s), arrow_schema
                )

    return spec_df.mapInArrow(_gen, schema=out_struct)


def changes_between(
    spark: SparkSession,
    base_dir: str,
    after_version: int = 0,
    to_version: int | None = None,
    key_cols: list[str] | None = None,
    max_union_versions: int = 64,
) -> DataFrame:
    """BATCH change feed: every row-level change committed in versions
    ``(after_version, to_version]``, as the table's columns plus
    ``change_type`` ('insert'|'delete') and ``version``. The streaming
    source emits exactly these rows (pinned by parity tests); use this
    face for backfills and ad-hoc "what changed since v?" queries.

    ``key_cols`` (round 12 — VERDICT r11 #2) switches the feed to
    KEYED classification: same-version delete+insert pairs reconcile
    into ``update_preimage``/``update_postimage`` rows and unchanged
    restated rows drop — Delta CDF semantics, one extra key-shuffle
    (:func:`reconcile_updates`; parity with ``snapshot_diff`` is
    pinned in tests).

    Scale: each version contributes only its own delta I/O — appends
    read the appended files, deletes semi-join the new vector
    (broadcast under the reader cap), and only full overwrites restate
    both sides. Maintenance commits contribute nothing."""
    committed = set(snapshot_versions(base_dir))
    frames: list[DataFrame] = []
    head_schema = read_snapshot(spark, base_dir).limit(0).schema
    head_cols = [f.name for f in head_schema]
    clash = {CHANGE_COL, VERSION_COL} & set(head_cols)
    if clash:
        raise ValueError(
            f"snapshot table has reserved column(s) {sorted(clash)}"
        )
    plan = _plan_versions(base_dir, after_version, to_version)
    infos = {v: _classify_version(base_dir, v, committed) for v in plan}
    active = [v for v in plan if infos[v]["kind"] != "none"]
    if len(active) > max_union_versions:
        # deep range: one union arm per version would grow the analyzed
        # plan with history depth (the r11-sweep plan-growth class) —
        # route through the streaming face's per-file planner instead,
        # one mapInArrow node whatever the version count. The range end
        # is pinned to the version set THIS call planned against, so a
        # commit racing this call cannot widen the feed past the
        # decision point.
        feed = _changes_via_files(
            spark, base_dir, after_version, plan[-1], head_schema, infos
        )
        return reconcile_updates(feed, key_cols) if key_cols else feed
    for v in active:
        info = infos[v]
        kind = info["kind"]
        if kind == "initial":
            frames.append(
                _with_change(read_snapshot(spark, base_dir, v), "insert", v)
            )
        elif kind == "insert_dirs":
            if info["new_dirs"]:
                frames.append(
                    _with_change(
                        _read_dirs(
                            spark, base_dir, info["new_dirs"], info["fmt"]
                        ),
                        "insert",
                        v,
                    )
                )
        elif kind == "delete_vecs":
            if info["new_vecs"]:
                frames.append(
                    _with_change(_deleted_rows(spark, base_dir, info), "delete", v)
                )
        elif kind == "merge":
            if info["new_vecs"]:
                frames.append(
                    _with_change(_deleted_rows(spark, base_dir, info), "delete", v)
                )
            if info["new_dirs"]:
                frames.append(
                    _with_change(
                        _read_dirs(
                            spark, base_dir, info["new_dirs"], info["fmt"]
                        ),
                        "insert",
                        v,
                    )
                )
        else:  # restate
            frames.append(
                _with_change(
                    read_snapshot(spark, base_dir, v - 1), "delete", v
                )
            )
            frames.append(
                _with_change(read_snapshot(spark, base_dir, v), "insert", v)
            )
    if not frames:
        # empty range: the head's schema + change columns, zero rows
        empty = read_snapshot(spark, base_dir).limit(0)
        return _with_change(empty, "insert", 0).limit(0)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    # the feed speaks the table's CURRENT schema, exactly like the
    # streaming face (and Delta CDF): columns a later overwrite DROPPED
    # do not resurrect in old versions' rows, columns it ADDED null-in,
    # and columns whose TYPE drifted (int widened to bigint by a later
    # overwrite) cast to the head's type even when the requested range
    # ends before the drift — the streaming face casts every column
    # through Arrow already (ADVICE r11)
    from pyspark.sql import functions as F

    feed = out.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in out.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in head_schema
        ],
        CHANGE_COL,
        VERSION_COL,
    )
    return reconcile_updates(feed, key_cols) if key_cols else feed


# ---------------------------------------------------------------------------
# STREAMING face — PySpark 4 Python data source
# ---------------------------------------------------------------------------


def _list_data_files(dir_abs: str, suffix: str) -> list[str]:
    """Data files under one version dir (driver-side plan step; bounded
    by the files one version added, never the table)."""
    out = []
    for root, _dirs, files in os.walk(dir_abs):
        for f in files:
            if f.endswith(suffix):
                out.append(os.path.join(root, f))
    return sorted(out)


def _hive_parts(file_abs: str, dir_abs: str) -> list[tuple[str, str | None]]:
    """``key=value`` partition segments between the version dir and the
    file (``partition_by`` snapshots store those columns in the PATH,
    not the file) — value URL-unescaped, Hive NULL marker → None."""
    rel = posixpath.relpath(file_abs, dir_abs)
    out = []
    for seg in rel.split("/")[:-1]:
        if "=" in seg:
            k, _, raw = seg.partition("=")
            val = urllib.parse.unquote(raw)
            out.append(
                (k, None if val == "__HIVE_DEFAULT_PARTITION__" else val)
            )
    return out


def _plan_partitions(
    base_dir: str,
    after_version: int,
    to_version: int,
    infos: dict | None = None,
) -> list[tuple]:
    """Partition specs for every change in ``(after, to]`` — plain
    tuples (picklable) of::

        ("insert", v, file_abs, dir_abs, fmt, vec_dirs_abs)
        ("delete_vec", v, vec_file_abs)
        ("restate_del", v, file_abs, dir_abs, fmt, vec_dirs_abs)

    ``vec_dirs_abs`` carries the position-delete dirs whose pairs must
    be EXCLUDED from an emitted file (an initial snapshot / restated
    parent with live vectors must not resurrect dead rows).
    ``infos`` reuses per-version classifications a caller already
    computed (review r12: the deep batch route otherwise re-reads and
    re-classifies every manifest a second time)."""
    committed = set(snapshot_versions(base_dir))
    parts: list[tuple] = []

    def _file_parts(kind, v, m, dirs, fmt, vec_dirs):
        suffix = _DATA_SUFFIX[fmt]
        vecs_abs = tuple(
            os.path.join(base_dir, d) for d in (vec_dirs or [])
        )
        for d in dirs:
            dir_abs = os.path.join(base_dir, d)
            for f in _list_data_files(dir_abs, suffix):
                parts.append((kind, v, f, dir_abs, fmt, vecs_abs))

    for v in _plan_versions(base_dir, after_version, to_version):
        info = (
            infos[v]
            if infos is not None and v in infos
            else _classify_version(base_dir, v, committed)
        )
        kind, m, fmt = info["kind"], info["manifest"], info["fmt"]
        if kind == "none":
            continue
        if kind == "initial":
            _file_parts(
                "insert", v, m, m["data_dirs"], fmt, m.get("delete_dirs")
            )
        elif kind == "insert_dirs":
            _file_parts("insert", v, m, info["new_dirs"], fmt, None)
        elif kind in ("delete_vecs", "merge"):
            for d in info["new_vecs"]:
                vdir = os.path.join(base_dir, d)
                for f in _list_data_files(vdir, ".parquet"):
                    parts.append(("delete_vec", v, f, base_dir, "parquet", ()))
            if kind == "merge":
                # the merge's own new dirs postdate its vector (the
                # vector references only files visible at the parent),
                # so its inserts never need vector exclusion
                _file_parts("insert", v, m, info["new_dirs"], fmt, None)
        else:  # restate
            p = info["parent"]
            _file_parts(
                "restate_del",
                v,
                p,
                p["data_dirs"],
                _table_format(p),
                p.get("delete_dirs"),
            )
            _file_parts(
                "insert", v, m, m["data_dirs"], fmt, m.get("delete_dirs")
            )
    return parts


def _vector_pairs_for(vec_dirs_abs: tuple, file_keys: set) -> dict:
    """(file → sorted positions) from the vector dirs, restricted to
    the given candidate keys (each file's relative AND absolute key —
    ``_rel_file_col`` stores relative when the table root matched,
    absolute otherwise). Executor-side pyarrow; vectors are KB-to-MB
    metadata by design."""
    import pyarrow.dataset as pads

    by_file: dict[str, list[int]] = {}
    keys = sorted(file_keys)
    for vdir in vec_dirs_abs:
        ds = pads.dataset(vdir, format="parquet")
        # filter pushes into the parquet scan: each per-data-file task
        # decodes only the row groups holding ITS keys instead of
        # Python-iterating the whole vector set (review r11 — O(files
        # × vector bytes) read amplification on initial snapshots)
        tbl = ds.to_table(
            columns=["file", "pos"],
            filter=pads.field("file").isin(keys),
        )
        for fk, p in zip(
            tbl.column("file").to_pylist(), tbl.column("pos").to_pylist()
        ):
            by_file.setdefault(fk, []).append(p)
    return by_file


def _emit_arrow(
    file_abs: str,
    dir_abs: str,
    fmt: str,
    change: str,
    version: int,
    target_schema,
    drop_positions=None,
    take_positions=None,
):
    """One data file → aligned Arrow batches carrying the change
    columns. Pure executor-side pyarrow: read, apply position
    drops/takes, inject hive partition-path columns, align column set
    and types to the stream's declared schema (schema drift across
    versions nulls in), append ``change_type``/``version``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if fmt == "orc":
        import pyarrow.orc as po

        tbl = po.ORCFile(file_abs).read()
    else:
        import pyarrow.parquet as pq

        tbl = pq.read_table(file_abs)
    if take_positions is not None:
        tbl = tbl.take(pa.array(sorted(take_positions), pa.int64()))
    elif drop_positions:
        import numpy as np

        mask = np.ones(tbl.num_rows, dtype=bool)
        mask[np.asarray(list(drop_positions), dtype=np.int64)] = False
        tbl = tbl.filter(pa.array(mask))
    n = tbl.num_rows
    hive = dict(_hive_parts(file_abs, dir_abs))
    cols = []
    for field in target_schema:
        if field.name == CHANGE_COL:
            cols.append(pa.array([change] * n, field.type))
        elif field.name == VERSION_COL:
            cols.append(pa.array([version] * n, field.type))
        elif field.name in tbl.column_names:
            col = tbl.column(field.name)
            if col.type != field.type:
                col = pc.cast(col, field.type)
            cols.append(col)
        elif field.name in hive:
            v = hive[field.name]
            col = pa.array([v] * n, pa.string())
            if field.type != pa.string():
                col = pc.cast(col, field.type)
            cols.append(col)
        else:  # column added in a later version: null-fill
            cols.append(pa.nulls(n, field.type))
    out = pa.table(cols, schema=target_schema)
    yield from out.to_batches(max_chunksize=1 << 16)


def _read_partition_spec(spec, target_schema):
    """Decode ONE planned partition spec (``_plan_partitions``) into
    aligned Arrow batches — the executor-side unit shared by the
    STREAMING source's ``read()`` and the batch face's deep-history
    ``mapInArrow`` route (round 12 — VERDICT r11 #3). Pure pyarrow; no
    SparkContext."""
    kind, v, file_abs, dir_abs, fmt, vec_dirs = spec
    if kind == "delete_vec":
        import pyarrow.parquet as pq

        tbl = pq.read_table(file_abs, columns=["file", "pos"])
        by_file: dict[str, list[int]] = {}
        for fk, p in zip(
            tbl.column("file").to_pylist(),
            tbl.column("pos").to_pylist(),
        ):
            by_file.setdefault(fk, []).append(p)
        import re as _re

        for fk in sorted(by_file):
            # the version DATA DIR is the 'data/<uuid>' prefix
            # of the key (relative OR absolute) — hive
            # partition columns live in the path BELOW it and
            # must come back valued, not null-filled
            if fk.startswith("/"):
                data_abs = fk
                m = _re.match(r"^(.*/data/[^/]+)/", fk)
                root = m.group(1) if m else os.path.dirname(fk)
            else:
                data_abs = os.path.join(dir_abs, fk)
                root = os.path.join(dir_abs, *fk.split("/")[:2])
            yield from _emit_arrow(
                data_abs,
                root,
                fmt,
                "delete",
                v,
                target_schema,
                take_positions=by_file[fk],
            )
        return
    drop = None
    if vec_dirs:
        # every key shape a vector may store for this file:
        # relative to the table root (the normal case — both
        # the plain and the realpath'd spelling) or absolute
        base = os.path.dirname(os.path.dirname(dir_abs))
        keys = {
            file_abs,
            os.path.relpath(file_abs, base),
            os.path.relpath(
                os.path.realpath(file_abs), os.path.realpath(base)
            ),
        }
        pairs = _vector_pairs_for(vec_dirs, keys)
        drop = sorted(
            {p for ps in pairs.values() for p in ps}
        ) or None
    change = "delete" if kind == "restate_del" else "insert"
    yield from _emit_arrow(
        file_abs,
        dir_abs,
        fmt,
        change,
        v,
        target_schema,
        drop_positions=drop,
    )


def _parse_simple_type(s: str):
    """Parse a Spark ``simpleString`` type (the shape snapshot
    manifests record, e.g. ``struct<o_orderkey:bigint,ps:array<int>>``)
    into a ``DataType`` WITHOUT a SparkContext — ``DataSource.schema()``
    runs in a plan-time Python worker where no session exists, so
    ``_parse_datatype_string`` is unavailable there."""
    from pyspark.sql import types as T

    s = s.strip()
    atomic = {
        "boolean": T.BooleanType,
        "tinyint": T.ByteType,
        "byte": T.ByteType,
        "smallint": T.ShortType,
        "short": T.ShortType,
        "int": T.IntegerType,
        "integer": T.IntegerType,
        "bigint": T.LongType,
        "long": T.LongType,
        "float": T.FloatType,
        "double": T.DoubleType,
        "string": T.StringType,
        "binary": T.BinaryType,
        "date": T.DateType,
        "timestamp": T.TimestampType,
        "timestamp_ntz": T.TimestampNTZType,
        "void": T.NullType,
    }
    if s in atomic:
        return atomic[s]()
    if s.startswith("decimal(") and s.endswith(")"):
        p, sc = s[len("decimal(") : -1].split(",")
        return T.DecimalType(int(p), int(sc))
    if s == "decimal":
        return T.DecimalType(10, 0)
    if s.startswith(("char(", "varchar(")):
        return T.StringType()

    def _split_top(body: str) -> list[str]:
        parts, depth, cur = [], 0, []
        for ch in body:
            if ch == "<" or ch == "(":
                depth += 1
            elif ch == ">" or ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            parts.append("".join(cur))
        return parts

    if s.startswith("array<") and s.endswith(">"):
        return T.ArrayType(_parse_simple_type(s[len("array<") : -1]))
    if s.startswith("map<") and s.endswith(">"):
        k, v = _split_top(s[len("map<") : -1])
        return T.MapType(_parse_simple_type(k), _parse_simple_type(v))
    if s.startswith("struct<") and s.endswith(">"):
        fields = []
        body = s[len("struct<") : -1]
        for part in _split_top(body) if body else []:
            name, _, typ = part.partition(":")
            fields.append(
                T.StructField(name.strip(), _parse_simple_type(typ), True)
            )
        return T.StructType(fields)
    raise ValueError(f"cannot parse manifest schema type: {s!r}")


try:  # pragma: no cover - import surface depends on pyspark minor version
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _CDFPartition(InputPartition):
        def __init__(self, spec: tuple):
            self.spec = spec

    class _SnapshotCDFStreamReader(DataSourceStreamReader):
        def __init__(self, options, target_schema):
            path = options.get("path") or options.get("basedir")
            if not path:
                raise ValueError(
                    "snapshot_cdf requires .option('path', <table dir>)"
                )
            self.base_dir = path
            self.starting = int(options.get("startingversion", "1"))
            if "keycols" in options or "key_cols" in options:
                # loud boundary (round 12): partitions are per-FILE
                # executor-side decodes — keyed update classification
                # needs to PAIR a restatement's delete+insert rows
                # across files, a key-shuffle no independent partition
                # can perform. The keyed face is a one-join batch
                # transform over each micro-batch instead.
                raise ValueError(
                    "snapshot_cdf does not classify keyed updates at "
                    "the source (per-file partitions cannot pair rows "
                    "across files). Apply reconcile_updates(batch, "
                    "key_cols) inside foreachBatch — see "
                    "replicate_snapshot for the apply-side recipe — "
                    "or use changes_between(key_cols=...) for "
                    "batch/backfill reads."
                )
            if "maxversionsperbatch" in options:
                # deliberate non-feature (review r11): the Python
                # source API exposes neither the start offset to
                # latestOffset nor the trigger type, so ANY
                # per-batch admission cap here is leaky — a capped
                # cold offset regressed below the checkpoint and
                # double-emitted on restart (confirmed), and a warm
                # cap under availableNow's single-batch fallback
                # silently STRANDS versions beyond the cap for that
                # run (confirmed: reader objects can be reused warm
                # across query starts). Offsets stay purely
                # log-driven: latestOffset always reports the true
                # head, every batch covers exactly (start, end].
                raise ValueError(
                    "snapshot_cdf does not support "
                    "maxversionsperbatch: per-batch admission "
                    "control cannot be made exactly-once through "
                    "the Python data source API (no start offset "
                    "at latestOffset time). Pace consumers with "
                    "trigger intervals instead."
                )
            self.target_schema = target_schema
            self._floor = self.starting - 1

        def initialOffset(self) -> dict:
            return {"version": self.starting - 1}

        def latestOffset(self) -> dict:
            # ALWAYS the true head: a stateless, monotone offset can
            # neither regress below a checkpoint (duplicates) nor lag
            # it (stranded versions) whatever Spark does with reader
            # instances across (re)starts
            vs = snapshot_versions(self.base_dir)
            self._floor = max(self._floor, vs[-1] if vs else 0)
            return {"version": self._floor}

        def partitions(self, start: dict, end: dict):
            lo, hi = int(start["version"]), int(end["version"])
            if hi < lo:  # defensive: never plan a regressing range
                hi = lo
            return [
                _CDFPartition(s)
                for s in _plan_partitions(self.base_dir, lo, hi)
            ]

        def read(self, partition: "_CDFPartition"):
            yield from _read_partition_spec(
                partition.spec, self.target_schema
            )

        def commit(self, end: dict) -> None:
            self._floor = max(self._floor, int(end["version"]))

    class SnapshotCDFDataSource(DataSource):
        """``spark.readStream.format("snapshot_cdf")`` with options
        ``path`` (table dir, required) and ``startingversion`` (first
        version to include; default 1 = table start → initial
        snapshot). Each micro-batch covers every version committed
        since the last batch; pace consumers with trigger intervals
        (``maxversionsperbatch`` is a deliberate, LOUD non-feature —
        see the reader's constructor for why per-batch admission
        control cannot be exactly-once through this API)."""

        @classmethod
        def name(cls) -> str:
            return "snapshot_cdf"

        def schema(self):
            from pyspark.sql.types import LongType, StringType, StructField

            path = self.options.get("path") or self.options.get("basedir")
            if not path:
                raise ValueError(
                    "snapshot_cdf requires .option('path', <table dir>)"
                )
            vs = snapshot_versions(path)
            if not vs:
                raise FileNotFoundError(f"no snapshots at {path}")
            ddl = _read_manifest(path, vs[-1]).get("schema")
            if not ddl:
                raise ValueError(
                    f"snapshot table at {path} records no schema in its "
                    "manifest — cannot derive a stream schema"
                )
            struct = _parse_simple_type(ddl)
            clash = {CHANGE_COL, VERSION_COL} & {f.name for f in struct}
            if clash:
                raise ValueError(
                    f"snapshot table has reserved column(s) {sorted(clash)}"
                )
            return struct.add(
                StructField(CHANGE_COL, StringType(), False)
            ).add(StructField(VERSION_COL, LongType(), False))

        def streamReader(self, schema):
            from pyspark.sql.pandas.types import to_arrow_schema

            return _SnapshotCDFStreamReader(
                self.options, to_arrow_schema(schema)
            )

    HAVE_CDF_DATASOURCE = True
except ImportError:  # pragma: no cover
    SnapshotCDFDataSource = None  # type: ignore[assignment]
    HAVE_CDF_DATASOURCE = False


#: the boolean action column :func:`feed_actions` emits —
#: dunder-reserved (the ``__dv_file`` discipline) so it cannot collide
#: silently with a real table column; feed_actions raises on clash
TOMBSTONE_COL = "__cdc_tombstone"


def feed_actions(feed: DataFrame, key_cols: list[str]) -> DataFrame:
    """Fold a (possibly multi-version) change-feed frame into ONE merge
    action per key: keyed reconciliation first (unchanged restated rows
    drop, preimages are informational and drop too), then latest
    version wins per key. Returns the table's columns plus the boolean
    :data:`TOMBSTONE_COL` — exactly the input shape
    ``merge_into_snapshot_delta``/``merge_into_snapshot`` take with
    ``delete_col=TOMBSTONE_COL``. Shared by :func:`replicate_snapshot`
    and the YAML ``snapshot_merge`` destination's ``apply_feed`` mode.
    One key-shuffle for the reconcile aggregation, one for the fold
    window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    clash = {TOMBSTONE_COL, "__cdc_rn"} & set(feed.columns)
    if clash:
        raise ValueError(
            f"feed frame has reserved column(s) {sorted(clash)}"
        )
    rec = reconcile_updates(feed, key_cols).filter(
        F.col(CHANGE_COL) != "update_preimage"
    )
    # post-reconcile each (version, key) holds at most one action; the
    # change-type tiebreak only pins determinism for contract-violating
    # input (duplicate keys within one version)
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(VERSION_COL), F.desc(CHANGE_COL)
    )
    return (
        rec.withColumn("__cdc_rn", F.row_number().over(w))
        .filter(F.col("__cdc_rn") == 1)
        .drop("__cdc_rn")
        .withColumn(TOMBSTONE_COL, F.col(CHANGE_COL) == "delete")
        .drop(CHANGE_COL, VERSION_COL)
    )


def replicate_snapshot(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
) -> None:
    """Maintain ``dst_dir`` as a REPLICA of ``src_dir`` by tailing its
    change feed — the apply side of CDC, closing the loop the
    reference's Kafka consumer only gestured at (ref:
    dags/kafka_stream.py:87-92 recovered): downstream stays convergent
    through appends, row-level deletes, AND full restatements, with
    exactly-once application across restarts (Spark's checkpoint
    carries the feed position; the replica's manifest ``batch_id``
    guard drops replayed batches, the ``snapshot_batch_sink`` recipe).

    ``key_cols`` must uniquely identify upstream rows (replication is
    keyed application; a key-less multiset has no well-defined replica
    under out-of-order batch folding). Each micro-batch first
    reconciles same-version delete+insert pairs into update rows
    (:func:`reconcile_updates` — unchanged restated rows drop here,
    so a 100-row restatement diff costs 100 rows, not the table),
    then reduces to ONE action per key (latest version wins) and
    applies in one pass as a DELTA merge
    (``merge_into_snapshot_delta``, round 12 — VERDICT r11 #1):
    tombstones and replaced rows die via a position-delete vector,
    new/changed rows land as one appended dir — per-batch write cost
    proportional to the BATCH, never a rewrite of the replica (the
    r11 applier's whole-table copy-on-write overwrite is gone). Only
    batch 0 of a fresh checkpoint — a (re-)sync — restates the
    replica by full overwrite, because stale local rows can't be
    trusted there. Replica maintenance is the standard pair:
    ``materialize_deletes`` folds accumulated vectors,
    ``compact_snapshot`` merges batch dirs; both are
    maintenance-silent in the replica's own change feed. Drains
    everything committed and returns (``availableNow``); call again
    to catch up."""
    from pyspark.sql import functions as F

    from .snapshots import (
        last_committed_batch,
        merge_into_snapshot_delta,
        write_snapshot,
    )

    register_snapshot_cdf(spark)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        # replay guard — EXCEPT for batch 0: batch ids restart per
        # checkpoint, so a re-sync under a fresh checkpoint always
        # arrives as batch 0 and a guard keyed on the old run's ids
        # would silently skip it (leaving the replica stale forever).
        # Batch 0 is safe unguarded: it applies as a full restatement
        # (overwrite of the replica from the batch alone), which is
        # idempotent under crash-replay.
        last = last_committed_batch(dst_dir)
        if batch_id > 0 and last is not None and batch_id <= last:
            return  # replayed epoch — already durable
        # keyed classification + fold: restatement pairs become one
        # update action, rows a restatement carried through UNCHANGED
        # vanish before they can cost a single write, latest version
        # wins per key (feed_actions — shared with the YAML
        # snapshot_merge destination's apply_feed mode)
        act = feed_actions(batch, key_cols)
        if batch_id == 0 or not snapshot_versions(dst_dir):
            # batch 0 is the first batch of a FRESH checkpoint — a
            # (re-)sync whose feed starts from the consumer's declared
            # beginning (an initial snapshot when history expired).
            # Folding it into pre-existing replica state would keep
            # stale rows the expired window deleted upstream; the
            # replica restates from the batch alone.
            new = act.filter(~F.col(TOMBSTONE_COL)).drop(TOMBSTONE_COL)
            write_snapshot(
                new, dst_dir, mode="overwrite", meta={"batch_id": batch_id}
            )
        else:
            merge_into_snapshot_delta(
                spark,
                dst_dir,
                act,
                key_cols,
                delete_col=TOMBSTONE_COL,
                meta={"batch_id": batch_id},
            )

    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", src_dir)
        .load()
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def register_snapshot_cdf(spark: SparkSession) -> bool:
    """Register the ``snapshot_cdf`` streaming format; returns
    availability (False only on pyspark builds without the Python
    data source API).

    The source's plan-time and executor-side methods run in SEPARATE
    Python workers that inherit only PYTHONPATH — a driver that put
    this repo on ``sys.path`` by hand (the external driver contract
    does exactly that) would ship class references the workers can't
    import. Registering the module for BY-VALUE cloudpickle
    serialization makes the source self-contained on the wire, the
    same way ``__main__``-defined sources already are.

    SCOPE NOTE (ADVICE r11): ``register_pickle_by_value`` is
    PROCESS-GLOBAL for Spark's serializer — after this call, EVERY
    pickled closure in the session that references the ``cdf`` or
    ``snapshots`` modules (any snapshot UDF/foreachBatch path) ships
    those two modules by value instead of by reference, adding their
    source (~100 KB) to each such task payload. That is the price of
    supporting bare-``sys.path`` drivers; deployments that install
    this package on workers (pip / ``--py-files``) can skip this
    registration and use ``spark.dataSource.register(
    SnapshotCDFDataSource)`` directly. The registration runs ONCE per
    process; no other module is registered by value."""
    if not HAVE_CDF_DATASOURCE:
        return False
    _ensure_pickle_by_value()
    spark.dataSource.register(SnapshotCDFDataSource)
    return True
