"""Persisted skip-index + index-backed scan (operators/skipindex.py).

Soundness is the contract under test: the index may only rule a file
out when its stats PROVE no row can match — so an indexed_scan result
must equal the plain full-scan-and-filter result on every fixture,
including files with missing stats, all-NULL files, and predicates
typed differently from the column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.operators.skipindex import (
    INDEX_VERSION,
    _survivors,
    build_skip_index,
    indexed_scan,
    scan_file_counts,
)


def _lake(tmp_path):
    lake = tmp_path / "lake"
    for part, files in {
        "p=1": [range(0, 100), range(100, 200)],
        "p=2": [range(500, 600), [None] * 50],
    }.items():
        d = lake / part
        d.mkdir(parents=True)
        for j, vals in enumerate(files):
            pq.write_table(
                pa.table({"v": pa.array(vals, pa.int64())}),
                str(d / f"f{j}.parquet"),
                row_group_size=32,
            )
    return str(lake)


def test_index_rows_and_typed_lanes(spark, tmp_path):
    lake = _lake(tmp_path)
    ix = build_skip_index(spark, lake, ["v"]).collect()
    assert len(ix) == 4
    by = {(r["partition"], r["path"].rsplit("/", 1)[-1]): r for r in ix}
    r = by[("p=1", "f0.parquet")]
    assert (r["min_i"], r["max_i"]) == (0, 99)
    assert r["min_d"] is None and r["min_s"] is None
    assert r["has_stats"] and r["index_version"] == INDEX_VERSION
    assert r["n_rows"] == 100 and r["n_row_groups"] == 4
    nul = by[("p=2", "f1.parquet")]
    # all-NULL file: no window, but stats are USABLE (all-null proof)
    assert nul["has_stats"] and nul["min_i"] is None
    assert nul["null_count"] == nul["num_values"] == 50


def test_indexed_scan_equals_full_scan(spark, tmp_path):
    lake = _lake(tmp_path)
    ix = build_skip_index(spark, lake, ["v"])
    for lo, hi in [(50, 150), (0, 0), (550, 800), (10**6, 10**7)]:
        got = sorted(
            r["v"]
            for r in indexed_scan(spark, ix, lake, "v", lo, hi).collect()
        )
        want = sorted(
            r["v"]
            for r in spark.read.parquet(lake)
            .filter(F.col("v").between(lo, hi))
            .collect()
        )
        assert got == want, (lo, hi)


def test_survivor_pruning_is_exactly_right(spark, tmp_path):
    lake = _lake(tmp_path)
    ix = build_skip_index(spark, lake, ["v"])
    surv = {
        r["path"].rsplit("/", 2)[-2] + "/" + r["path"].rsplit("/", 1)[-1]
        for r in _survivors(ix, "v", 50, 150).select("path").collect()
    }
    # [50,150] hits p=1/f0 [0,99] and p=1/f1 [100,199]; misses
    # p=2/f0 [500,599]; the all-NULL file is provably empty for ranges
    assert surv == {"p=1/f0.parquet", "p=1/f1.parquet"}
    counts = {
        r["partition"]: r
        for r in scan_file_counts(ix, "v", 50, 150).collect()
    }
    assert counts["p=1"]["n_files_read"] == 2
    assert counts["p=2"]["n_files_read"] == 0
    assert counts["p=2"]["rows_scanned"] == 0
    assert counts["p=2"]["rows_total"] == 150


def test_unstatted_and_foreign_typed_predicates_survive(spark, tmp_path):
    """Missing column stats or a predicate typed unlike the stats must
    leave the file IN the scan (soundness over cleverness)."""
    lake = tmp_path / "lake"
    d = lake / "p=1"
    d.mkdir(parents=True)
    pq.write_table(
        pa.table({"v": pa.array(range(10), pa.int64())}),
        str(d / "f0.parquet"),
        write_statistics=False,
    )
    ix = build_skip_index(spark, str(lake), ["v"])
    (row,) = ix.collect()
    assert not row["has_stats"]
    # un-statted file survives an arbitrarily disjoint predicate
    assert _survivors(ix, "v", 10**9, 10**9 + 1).count() == 1
    # statted int column + string predicate -> string lanes are NULL
    # -> window cannot prove a miss -> file survives
    lake2 = tmp_path / "lake2"
    d2 = lake2 / "p=1"
    d2.mkdir(parents=True)
    pq.write_table(
        pa.table({"v": pa.array(range(10), pa.int64())}),
        str(d2 / "f0.parquet"),
    )
    ix2 = build_skip_index(spark, str(lake2), ["v"])
    assert _survivors(ix2, "v", "zzz", "zzzz").count() == 1
    with pytest.raises(ValueError):
        _survivors(ix2, "v", True, True)


def test_empty_survivor_set_returns_empty_frame_with_schema(spark, tmp_path):
    lake = _lake(tmp_path)
    ix = build_skip_index(spark, lake, ["v"])
    out = indexed_scan(spark, ix, lake, "v", 10**9, 2 * 10**9)
    assert out.count() == 0
    assert set(out.columns) == {"v", "p"}


def test_version_mismatch_rows_are_ignored(spark, tmp_path):
    lake = _lake(tmp_path)
    ix = build_skip_index(spark, lake, ["v"]).withColumn(
        "index_version", F.lit(INDEX_VERSION + 1)
    )
    # every row is from a "future" builder -> nothing survives the
    # version gate -> nothing can be pruned NOR read via the index;
    # the scan degrades to the empty-schema frame, never a wrong answer
    assert _survivors(ix, "v", 50, 150).count() == 0


def test_string_and_double_predicates(spark, tmp_path):
    lake = tmp_path / "lake"
    d = lake / "p=1"
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "s": pa.array(["apple", "banana", "cherry"]),
                "x": pa.array([1.5, 2.5, 3.5], pa.float64()),
            }
        ),
        str(d / "f0.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s": pa.array(["melon", "peach"]),
                "x": pa.array([10.5, 11.5], pa.float64()),
            }
        ),
        str(d / "f1.parquet"),
    )
    ix = build_skip_index(spark, str(lake), ["s", "x"])
    assert ix.count() == 4
    got = sorted(
        r["s"]
        for r in indexed_scan(
            spark, ix, str(lake), "s", "ba", "cz"
        ).collect()
    )
    assert got == ["banana", "cherry"]
    surv = _survivors(ix, "s", "m", "n").select("path").collect()
    assert len(surv) == 1 and surv[0]["path"].endswith("f1.parquet")
    got_x = sorted(
        r["x"]
        for r in indexed_scan(
            spark, ix, str(lake), "x", 2.0, 4.0
        ).collect()
    )
    assert got_x == [2.5, 3.5]


def test_counts_agree_with_pruning_report(spark, tmp_path):
    """Cross-operator invariant: the index's file-level accounting
    must equal pruning_report's FILE-level skip decisions on the same
    lake + predicate (the index is file-granular; row groups inside a
    surviving file are the scan's business)."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        pruning_report,
    )

    lake = _lake(tmp_path)
    ix = build_skip_index(spark, lake, ["v"])
    mine = {
        r["partition"]: r
        for r in scan_file_counts(ix, "v", 120, 520).collect()
    }
    ref = {
        r["partition"]: r
        for r in pruning_report(spark, lake, "v", 120, 520).collect()
    }
    for part in ref:
        assert mine[part]["n_files"] == ref[part]["n_files"]
        assert (
            mine[part]["n_files"] - mine[part]["n_files_read"]
            == ref[part]["n_skippable_files"]
        )
        assert mine[part]["rows_scanned"] == ref[part]["rows_scanned"]


def test_refresh_reads_only_changed_files(spark, tmp_path):
    """Incremental refresh reuses index rows for unchanged files
    WITHOUT opening them (proven by replacing an unchanged file's
    bytes with same-size garbage: any footer read would crash),
    re-reads size-changed files, indexes new files, and drops
    vanished ones."""
    import os

    from data_engineering_etl_self_service_spark.operators.skipindex import (
        refresh_skip_index,
    )

    lake = tmp_path / "lake"
    d1, d2 = lake / "p=1", lake / "p=2"
    d1.mkdir(parents=True)
    d2.mkdir(parents=True)

    def _wf(p, vals):
        pq.write_table(
            pa.table({"v": pa.array(vals, pa.int64())}), str(p)
        )

    _wf(d1 / "f0.parquet", range(0, 10))
    _wf(d1 / "f1.parquet", range(10, 20))
    _wf(d2 / "f2.parquet", range(20, 30))

    ixdir = str(tmp_path / "ix")
    build_skip_index(spark, str(lake), ["v"]).write.parquet(ixdir)
    old = spark.read.parquet(ixdir)
    old_rows = {r["path"].rsplit("/", 1)[-1]: r for r in old.collect()}

    # unchanged identity, unreadable bytes: must be REUSED, not read
    f0 = d1 / "f0.parquet"
    size0 = os.path.getsize(f0)
    f0.write_bytes(b"\x00" * size0)
    # vanished
    (d1 / "f1.parquet").unlink()
    # rewritten with a different size -> re-read
    _wf(d2 / "f2.parquet", range(100, 160))
    # brand new -> read
    _wf(d2 / "f3.parquet", range(500, 505))

    new = {
        r["path"].rsplit("/", 1)[-1]: r
        for r in refresh_skip_index(
            spark, str(lake), old, ["v"]
        ).collect()
    }
    assert set(new) == {"f0.parquet", "f2.parquet", "f3.parquet"}
    assert new["f0.parquet"] == old_rows["f0.parquet"]  # byte-for-byte reuse
    assert (new["f2.parquet"]["min_i"], new["f2.parquet"]["max_i"]) == (100, 159)
    assert new["f2.parquet"]["n_rows"] == 60
    assert (new["f3.parquet"]["min_i"], new["f3.parquet"]["max_i"]) == (500, 504)


def test_refresh_noop_lake_reads_nothing_and_matches_full_build(spark, tmp_path):
    """A refresh over an unchanged lake returns the old index exactly
    — and (garbage-bytes trick again) never opens a single file."""
    import os

    from data_engineering_etl_self_service_spark.operators.skipindex import (
        refresh_skip_index,
    )

    lake = _lake(tmp_path)
    ixdir = str(tmp_path / "ix")
    build_skip_index(spark, lake, ["v"]).write.parquet(ixdir)
    old = spark.read.parquet(ixdir)
    want = sorted(map(tuple, old.collect()))
    for root, _, names in os.walk(lake):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                sz = os.path.getsize(p)
                with open(p, "wb") as fh:
                    fh.write(b"\x00" * sz)
    got = sorted(
        map(tuple, refresh_skip_index(spark, lake, old, ["v"]).collect())
    )
    assert got == want


def test_orc_lane_indexed_scan_soundness(spark, tmp_path):
    """format="orc" (round 9): the skip index built from ORC tails
    prunes files exactly like the parquet lane — indexed results equal
    the full scan for int/string predicates, an all-NULL file prunes,
    missing columns survive, and the planner accounting matches."""
    import pyarrow as pa
    import pyarrow.orc as po

    from data_engineering_etl_self_service_spark.operators.skipindex import (
        build_skip_index,
        indexed_scan,
        refresh_skip_index,
        scan_file_counts,
    )

    lake = tmp_path / "orclake"
    for part in range(3):
        d = lake / f"part={part}"
        d.mkdir(parents=True)
        for j in range(2):
            base = part * 200 + j * 100
            po.write_table(
                pa.table(
                    {
                        "v": pa.array(
                            range(base, base + 100), pa.int64()
                        ),
                        "s": pa.array(
                            [f"k{i:06d}" for i in range(base, base + 100)]
                        ),
                    }
                ),
                str(d / f"f{j}.orc"),
                compression="snappy",
            )
    # plus an all-NULL file that must prune under any range predicate
    po.write_table(
        pa.table(
            {
                "v": pa.array([None] * 10, pa.int64()),
                "s": pa.array([None] * 10, pa.string()),
            }
        ),
        str(lake / "part=0" / "nulls.orc"),
        compression="snappy",
    )
    ix = build_skip_index(
        spark, str(lake), ["v", "s"], format="orc"
    ).localCheckpoint()
    full = spark.read.option("basePath", str(lake)).orc(str(lake))
    for lo, hi in ((120, 180), (0, 599), (9_000, 9_999)):
        got = sorted(
            r["v"]
            for r in indexed_scan(
                spark, ix, str(lake), "v", lo, hi, format="orc"
            ).collect()
        )
        exp = sorted(
            r["v"]
            for r in full.filter(f"v between {lo} and {hi}").collect()
        )
        assert got == exp
    got_s = indexed_scan(
        spark, ix, str(lake), "s", "k000150", "k000250", format="orc"
    ).count()
    assert got_s == 101
    # planner accounting: the 120..180 window lives in ONE file
    acct = {
        r["partition"]: r.asDict()
        for r in scan_file_counts(ix, "v", 120, 180).collect()
    }
    assert acct["part=0"]["n_files"] == 3  # 2 data + 1 all-null
    assert acct["part=0"]["n_files_read"] == 1
    assert acct["part=1"]["n_files_read"] == 0
    # a column absent from the type tree never prunes
    ix2 = build_skip_index(spark, str(lake), ["nope"], format="orc")
    rows = ix2.collect()
    assert rows and all(not r["has_stats"] for r in rows)
    # incremental refresh on the ORC lane reuses unchanged files
    po.write_table(
        pa.table(
            {
                "v": pa.array(range(900, 950), pa.int64()),
                "s": pa.array([f"k{i:06d}" for i in range(900, 950)]),
            }
        ),
        str(lake / "part=2" / "new.orc"),
        compression="snappy",
    )
    ix3 = refresh_skip_index(spark, str(lake), ix, ["v", "s"], format="orc")
    assert ix3.filter("column = 'v'").count() == 8
    got = indexed_scan(
        spark, ix3, str(lake), "v", 920, 930, format="orc"
    ).count()
    assert got == 11
