"""Parquet footer decoder (operators/parquet_meta.py): thrift-compact
generic reader + FileMetaData mapping, vs pyarrow's own metadata."""

from __future__ import annotations

import io
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_etl_self_service_spark.operators.parquet_meta import (
    parquet_footer,
    thrift_compact_decode,
)


def _write(table, **kw) -> bytes:
    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    return buf.getvalue()


def test_footer_parity_with_pyarrow_multi_type():
    t = pa.table(
        {
            "i32": pa.array([3, 1, 2, None], pa.int32()),
            "i64": pa.array([10, 20, None, 40], pa.int64()),
            "dbl": pa.array([0.5, -1.25, 2.0, None], pa.float64()),
            "s": pa.array(["b", None, "a", "c"]),
            "flag": pa.array([True, False, None, True]),
        }
    )
    raw = _write(t, compression="snappy", row_group_size=3)
    f = parquet_footer(raw)
    m = pq.ParquetFile(io.BytesIO(raw)).metadata
    assert f["num_rows"] == m.num_rows == 4
    assert len(f["row_groups"]) == m.num_row_groups == 2
    assert [s["name"] for s in f["schema"][1:]] == t.column_names
    for ri in range(m.num_row_groups):
        mr = m.row_group(ri)
        rg = f["row_groups"][ri]
        assert rg["num_rows"] == mr.num_rows
        for ci in range(mr.num_columns):
            mc, mine = mr.column(ci), rg["columns"][ci]
            assert mine["path"] == mc.path_in_schema
            assert mine["num_values"] == mc.num_values
            assert mine["codec"] == mc.compression.lower()
            assert mine["total_compressed_size"] == mc.total_compressed_size
            st = mc.statistics
            if st is not None:
                assert mine["null_count"] == st.null_count
                if st.has_min_max:
                    assert mine["min"] == st.min
                    assert mine["max"] == st.max


@pytest.mark.parametrize("codec", ["none", "gzip", "zstd", "lz4", "brotli"])
def test_footer_codec_names(codec):
    raw = _write(pa.table({"x": pa.array([1, 2], pa.int64())}), compression=codec)
    got = parquet_footer(raw)["row_groups"][0]["columns"][0]["codec"]
    exp = {"none": "uncompressed", "lz4": "lz4_raw"}.get(codec, codec)
    assert got == exp  # pyarrow 'lz4' writes parquet LZ4_RAW (id 7)


def test_footer_corrupt_inputs_fail_loudly():
    raw = _write(pa.table({"x": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="magic"):
        parquet_footer(raw[:-4] + b"XXXX")
    with pytest.raises(ValueError, match="magic"):
        parquet_footer(b"PAR1")
    bad_len = raw[:-8] + struct.pack("<I", 10**6) + b"PAR1"
    with pytest.raises(ValueError, match="range"):
        parquet_footer(bad_len)


def test_thrift_generic_long_form_and_types():
    """Hand-built compact-protocol struct exercising the long-form
    field header (id delta 0 → explicit zigzag id), doubles, nested
    structs, lists, and bool fields."""
    buf = bytearray()
    buf += bytes([0x15, 0x54])  # field 1, i32 zigzag(42)
    buf += bytes([0x07])  # long form: type DOUBLE, id follows
    buf += bytes([0xC8, 0x01])  # zigzag varint id = 100
    buf += struct.pack("<d", 1.5)
    buf += bytes([0x11])  # field 101 (delta 1), BOOL_TRUE
    buf += bytes([0x19, 0x25, 0x02, 0x04])  # field 102: list<i32> [1,2]
    buf += bytes([0x1C])  # field 103: struct
    buf += bytes([0x18, 0x02, ord("h"), ord("i"), 0x00])  # s.f1="hi", stop
    buf += bytes([0x00])  # stop
    out = thrift_compact_decode(bytes(buf))
    assert out[1] == 42
    assert out[100] == 1.5
    assert out[101] is True
    assert out[102] == [1, 2]
    assert out[103] == {1: b"hi"}


def test_footer_row_group_layout_formula():
    for n, rg_size in [(1, 8), (8, 8), (9, 8), (100, 7)]:
        t = pa.table({"idx": pa.array(range(n), pa.int64())})
        f = parquet_footer(_write(t, row_group_size=rg_size))
        assert len(f["row_groups"]) == (n + rg_size - 1) // rg_size
        assert sum(rg["num_rows"] for rg in f["row_groups"]) == n
        assert f["row_groups"][0]["columns"][0]["min"] == 0
        assert f["row_groups"][-1]["columns"][0]["max"] == n - 1


def test_lake_layout_report_over_fixture_dir(spark, tmp_path):
    """Directory audit: write a small 'lake' with mixed layouts and
    assert the per-file report matches what pyarrow says about the
    same files."""
    import glob

    spark.range(1000).selectExpr("id", "id % 7 AS g").repartition(
        3
    ).write.parquet(str(tmp_path / "lake"))
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        lake_layout_report,
    )

    rep = {
        r["file"]: r
        for r in lake_layout_report(spark, str(tmp_path / "lake")).collect()
    }
    files = glob.glob(str(tmp_path / "lake") + "/*.parquet")
    assert len(rep) == len(files) == 3
    total = 0
    for fp in files:
        m = pq.ParquetFile(fp).metadata
        r = rep[fp.rsplit("/", 1)[-1]]
        assert r["n_rows"] == m.num_rows
        assert r["n_row_groups"] == m.num_row_groups
        assert r["n_columns"] == m.num_columns
        total += r["n_rows"]
    assert total == 1000


def test_lake_audit_report_vs_pyarrow_ground_truth(spark, tmp_path):
    """Partition-level audit (round 8): every byte-based output —
    histograms, compression ratios, worst column, small-file and skew
    flags — recomputed independently from pyarrow's own metadata over
    a pinned two-partition lake with deliberate small-file skew."""
    import glob
    import math
    import os
    from collections import Counter, defaultdict

    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        lake_audit_report,
    )

    lake = tmp_path / "lake"
    # part=a: one big zstd file + two tiny uncompressed files (small-
    # file majority + size skew); part=b: two even snappy files
    specs = {
        "part=a": [
            (5000, "zstd", 512),
            (8, "none", 8),
            (8, "none", 8),
        ],
        "part=b": [(600, "snappy", 128), (600, "snappy", 128)],
    }
    for part, files in specs.items():
        os.makedirs(lake / part)
        for i, (nrows, codec, rg) in enumerate(files):
            pq.write_table(
                pa.table(
                    {
                        "x": pa.array(range(nrows), pa.int64()),
                        "txt": pa.array(
                            ["wordy text " * 5] * nrows, pa.string()
                        ),
                    }
                ),
                str(lake / part / f"f{i}.parquet"),
                compression=codec,
                row_group_size=rg,
            )
    # small_file_bytes between the tiny and big file sizes
    rep = {
        r["partition"]: r
        for r in lake_audit_report(
            spark, str(lake), small_file_bytes=4096
        ).collect()
    }
    assert set(rep) == {"part=a", "part=b"}
    for part, files in specs.items():
        paths = sorted(glob.glob(str(lake / part / "*.parquet")))
        metas = [pq.ParquetFile(p).metadata for p in paths]
        sizes = [os.path.getsize(p) for p in paths]
        r = rep[part]
        assert r["n_files"] == len(paths)
        assert r["total_bytes"] == sum(sizes)
        assert r["total_rows"] == sum(m.num_rows for m in metas)
        assert r["n_row_groups"] == sum(m.num_row_groups for m in metas)
        assert r["min_file_bytes"] == min(sizes)
        assert r["max_file_bytes"] == max(sizes)
        assert r["avg_file_bytes"] == sum(sizes) // len(sizes)
        n_small = sum(1 for s in sizes if s < 4096)
        assert r["n_small_files"] == n_small
        assert r["small_file_flag"] == (n_small * 2 > len(paths))
        assert r["file_skew_pct"] == int(
            max(sizes) * len(sizes) * 100 / sum(sizes)
        )
        # histograms: log2 buckets recomputed from the ground truth
        fhist = Counter(int(math.floor(math.log2(s))) for s in sizes)
        assert r["file_size_hist"] == ",".join(
            f"{b}:{c}" for b, c in sorted(fhist.items())
        )
        rg_rows = [
            m.row_group(i).num_rows
            for m in metas
            for i in range(m.num_row_groups)
        ]
        rghist = Counter(
            int(math.floor(math.log2(max(n, 1)))) for n in rg_rows
        )
        assert r["rg_rows_hist"] == ",".join(
            f"{b}:{c}" for b, c in sorted(rghist.items())
        )
        assert r["min_rg_rows"] == min(rg_rows)
        assert r["max_rg_rows"] == max(rg_rows)
        assert r["avg_rg_rows"] == sum(rg_rows) // len(rg_rows)
        # compression ratios per column chunk from pyarrow metadata
        comp = defaultdict(int)
        uncomp = defaultdict(int)
        for m in metas:
            for gi in range(m.num_row_groups):
                g = m.row_group(gi)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    comp[c.path_in_schema] += c.total_compressed_size
                    uncomp[c.path_in_schema] += c.total_uncompressed_size
        assert r["compression_ratio_pct"] == int(
            sum(uncomp.values()) * 100 / max(sum(comp.values()), 1)
        )
        ratios = {
            p: int(uncomp[p] * 100 / max(comp[p], 1)) for p in comp
        }
        worst = min(ratios, key=lambda p: (ratios[p], p))
        assert r["worst_col"] == worst
        assert r["worst_col_ratio_pct"] == ratios[worst]
        codecs = sorted(
            {
                m.row_group(gi).column(ci).compression.lower()
                for m in metas
                for gi in range(m.num_row_groups)
                for ci in range(m.row_group(gi).num_columns)
            }
        )
        assert r["codecs"] == ",".join(codecs)
    # the skewed partition actually trips the flags
    assert rep["part=a"]["small_file_flag"] is True
    assert rep["part=a"]["file_skew_pct"] > 200
    assert rep["part=b"]["small_file_flag"] is False
    assert 95 <= rep["part=b"]["file_skew_pct"] <= 105


def test_read_footer_local_parity_and_bounded_io(tmp_path):
    """read_footer_local (round 8) returns the identical parsed footer
    as the whole-bytes parser while reading only the trailing metadata
    — the property that makes the lake audits footers-only in I/O
    terms. Corrupt magics fail loudly."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        parquet_footer,
        read_footer_local,
    )

    fp = tmp_path / "x.parquet"
    pq.write_table(
        pa.table(
            {
                "a": pa.array(range(1000), pa.int64()),
                "b": pa.array([f"s{i}" for i in range(1000)]),
            }
        ),
        str(fp),
        compression="zstd",
        row_group_size=128,
    )
    raw = fp.read_bytes()
    assert read_footer_local(str(fp), len(raw)) == parquet_footer(raw)
    # corrupt trailing magic -> loud failure
    bad = tmp_path / "bad.parquet"
    bad.write_bytes(raw[:-4] + b"XXXX")
    with pytest.raises(ValueError, match="magic"):
        read_footer_local(str(bad), len(raw))
    # truncated head -> loud failure
    tiny = tmp_path / "tiny.parquet"
    tiny.write_bytes(b"PAR1")
    with pytest.raises(ValueError, match="small"):
        read_footer_local(str(tiny), 4)


def test_file_audit_rows_never_ships_content_locally(spark, tmp_path):
    """On local paths the audit scan projects only (path, length) —
    the binary content column must NOT be read (round 8: reading it
    means reading the whole lake to audit footers)."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        file_audit_rows,
        lake_layout_report,
    )

    os_dir = tmp_path / "lake" / "part=x"
    os_dir.mkdir(parents=True)
    pq.write_table(
        pa.table({"a": pa.array(range(64), pa.int64())}),
        str(os_dir / "f.parquet"),
    )
    for df in (
        file_audit_rows(spark, str(tmp_path / "lake")),
        lake_layout_report(spark, str(os_dir)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "content" not in plan
        assert df.count() == 1


def test_lake_audit_nested_partitions_and_empty_files(spark, tmp_path):
    """Review r8: nested hive layouts keep DISTINCT labels (equal leaf
    names under different parents no longer merge), and a partition of
    zero-row-group (empty) part files still appears in the report
    instead of being inner-joined away."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        lake_audit_report,
    )

    lake = tmp_path / "lake"
    for ds in ("ds=a", "ds=b"):
        d = lake / ds / "hr=00"
        d.mkdir(parents=True)
        pq.write_table(
            pa.table({"x": pa.array(range(50), pa.int64())}),
            str(d / "f.parquet"),
        )
    empty = lake / "ds=a" / "hr=01"
    empty.mkdir()
    # a writer that never writes emits ZERO row groups (pyarrow's
    # write_table of an empty table still emits one empty row group)
    pq.ParquetWriter(
        str(empty / "e.parquet"), pa.schema([("x", pa.int64())])
    ).close()
    rep = {
        r["partition"]: r
        for r in lake_audit_report(spark, str(lake)).collect()
    }
    assert set(rep) == {"ds=a/hr=00", "ds=b/hr=00", "ds=a/hr=01"}
    assert rep["ds=a/hr=00"]["total_rows"] == 50
    assert rep["ds=b/hr=00"]["total_rows"] == 50
    e = rep["ds=a/hr=01"]
    assert e["n_files"] == 1 and e["total_rows"] == 0
    assert e["min_rg_rows"] == 0 and e["rg_rows_hist"] == ""


def test_pruning_report_vs_ground_truth(spark, tmp_path):
    """Data-skipping audit (round 8): skippable counts recomputed from
    pyarrow's own statistics; files with missing/foreign-typed stats
    count as NOT skippable (the conservative scanner answer)."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        pruning_report,
    )

    lake = tmp_path / "lake"
    # part=a: three files covering [0,99], [100,199], [200,299]
    os_a = lake / "part=a"
    os_a.mkdir(parents=True)
    for j in range(3):
        pq.write_table(
            pa.table(
                {"v": pa.array(range(j * 100, j * 100 + 100), pa.int64())}
            ),
            str(os_a / f"f{j}.parquet"),
            row_group_size=16,
        )
    # part=b: one file WITHOUT the audited column -> never skippable
    os_b = lake / "part=b"
    os_b.mkdir()
    pq.write_table(
        pa.table({"other": pa.array(range(50), pa.int64())}),
        str(os_b / "f0.parquet"),
    )
    rep = {
        r["partition"]: r
        for r in pruning_report(
            spark, str(lake), column="v", lo=120, hi=180
        ).collect()
    }
    a = rep["part=a"]
    # predicate [120,180] hits only the middle file
    assert a["n_files"] == 3 and a["n_skippable_files"] == 2
    assert a["rows_total"] == 300 and a["rows_scanned"] == 100
    # rg-level: file 2's rgs cover [100,115]..[196,199]; rgs fully
    # outside [120,180] skip — ground truth from pyarrow stats
    truth_skip = 0
    truth_rgs = 0
    for j in range(3):
        m = pq.ParquetFile(str(os_a / f"f{j}.parquet")).metadata
        for gi in range(m.num_row_groups):
            st = m.row_group(gi).column(0).statistics
            truth_rgs += 1
            if st.max < 120 or st.min > 180:
                truth_skip += 1
    assert a["n_row_groups"] == truth_rgs
    assert a["n_skippable_rgs"] == truth_skip
    b = rep["part=b"]
    assert b["n_skippable_files"] == 0 and b["rows_scanned"] == 50
