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


class _CountingHandle:
    """seek/read shim that counts bytes actually read (round 9: the
    proof that the generic audit branch is footers-only in I/O)."""

    def __init__(self, fh):
        self.fh = fh
        self.bytes_read = 0

    def seek(self, pos):
        return self.fh.seek(pos)

    def read(self, n):
        out = self.fh.read(n)
        self.bytes_read += len(out)
        return out

    def close(self):
        self.fh.close()


def test_generic_branch_reads_only_footer_bytes_on_multi_gb_file(tmp_path):
    """VERDICT r8 #1 'done' bar: a byte-counting handle over a 3 GiB
    (sparse) file proves the shared footer reader — the code path BOTH
    the local and the generic/ranged branches call — reads only
    head-magic + tail word + metadata blob, never content."""
    import os

    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        open_ranged,
        read_footer_handle,
    )

    # a real footer grafted onto a 3 GiB sparse body: the audit never
    # dereferences data-page offsets, so the parse is exact while any
    # content read would show up as gigabytes in the counter
    small = io.BytesIO()
    pq.write_table(
        pa.table({"v": pa.array(range(1000), pa.int64())}),
        small,
        row_group_size=100,
    )
    raw = small.getvalue()
    meta_len = struct.unpack("<I", raw[-8:-4])[0]
    tail = raw[-(meta_len + 8) :]
    big = tmp_path / "big.parquet"
    with open(big, "wb") as f:
        f.write(b"PAR1")
        f.seek(3 << 30)
        f.write(tail)
    fsize = os.path.getsize(big)
    assert fsize > 3 << 30
    fh = _CountingHandle(open(big, "rb"))
    footer = read_footer_handle(fh, fsize)
    fh.close()
    assert footer["num_rows"] == 1000
    assert len(footer["row_groups"]) == 10
    assert fh.bytes_read == meta_len + 8  # blob + tail word, TWO reads
    # the generic (pyarrow-fs) branch parses the same file identically
    # through real positioned reads — forced even for a local URI
    gfh = open_ranged(str(big), force_generic=True)
    try:
        assert read_footer_handle(gfh, fsize) == footer
    finally:
        gfh.close()


def test_force_generic_audits_match_local_fast_path(spark, tmp_path):
    """The generic ranged-read branch (object-store posture) returns
    byte-identical audit rows to the local seek fast path, end to end
    through Spark executors, and still never projects content."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        lake_audit_report,
        pruning_report,
    )

    lake = tmp_path / "lake"
    for part in range(3):
        d = lake / f"part={part}"
        d.mkdir(parents=True)
        for j in range(2):
            base = part * 200 + j * 100
            pq.write_table(
                pa.table(
                    {"v": pa.array(range(base, base + 100), pa.int64())}
                ),
                str(d / f"f{j}.parquet"),
                row_group_size=16,
            )
    for build in (
        lambda fg: lake_audit_report(
            spark, str(lake), small_file_bytes=4096, force_generic=fg
        ),
        lambda fg: pruning_report(
            spark, str(lake), column="v", lo=120, hi=180, force_generic=fg
        ),
    ):
        local = sorted(map(tuple, build(False).collect()))
        ranged = build(True)
        plan = ranged._jdf.queryExecution().executedPlan().toString()
        assert "content" not in plan
        assert sorted(map(tuple, ranged.collect())) == local


def test_read_page_index_vs_pyarrow_page_reads(tmp_path):
    """Page-index decode (round 9) pinned field by field against the
    DATA pyarrow actually reads: slice each row group at the decoded
    OffsetIndex first_row_index boundaries and the slice min/max must
    equal the decoded ColumnIndex windows (verifying both structures
    at once); null_pages/null_counts against the known null layout."""
    import random

    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        read_footer_handle,
        read_page_index,
    )

    rng = random.Random(7)
    vals = [rng.randrange(0, 10**6) for _ in range(900)]
    # one all-null page (rows 100..149) and scattered nulls elsewhere
    col = [
        None if 100 <= i < 150 or i % 97 == 0 else v
        for i, v in enumerate(vals)
    ]
    fp = tmp_path / "x.parquet"
    pq.write_table(
        pa.table({"v": pa.array(col, pa.int64())}),
        str(fp),
        row_group_size=300,
        write_page_index=True,
        write_batch_size=50,
        data_page_size=1,
    )
    import os

    fsize = os.path.getsize(fp)
    with open(fp, "rb") as fh:
        footer = read_footer_handle(fh, fsize)
        idx = read_page_index(fh, footer, "v")
    pf = pq.ParquetFile(str(fp))
    assert len(idx) == pf.metadata.num_row_groups == 3
    for ri, pidx in enumerate(idx):
        rg_rows = pf.metadata.row_group(ri).num_rows
        data = pf.read_row_group(ri).column("v").to_pylist()
        firsts = pidx["first_rows"]
        assert firsts[0] == 0 and sorted(firsts) == firsts
        for i, start in enumerate(firsts):
            end = firsts[i + 1] if i + 1 < len(firsts) else rg_rows
            page = data[start:end]
            live = [x for x in page if x is not None]
            assert pidx["null_counts"][i] == sum(
                1 for x in page if x is None
            )
            if not live:
                assert pidx["null_pages"][i] is True
                assert pidx["mins"][i] is None
                assert pidx["maxs"][i] is None
            else:
                assert pidx["null_pages"][i] is False
                assert pidx["mins"][i] == min(live)
                assert pidx["maxs"][i] == max(live)
    # a column with no page index degrades to None entries
    fp2 = tmp_path / "noidx.parquet"
    pq.write_table(
        pa.table({"v": pa.array(range(100), pa.int64())}),
        str(fp2),
        write_page_index=False,
    )
    with open(fp2, "rb") as fh:
        footer2 = read_footer_handle(fh, os.path.getsize(fp2))
        assert read_page_index(fh, footer2, "v") == [None]


def test_page_pruning_report_vs_ground_truth(spark, tmp_path):
    """page_pruning_report (round 9): page/rg/file skip counts and the
    page-granular rows_scanned recomputed from pyarrow's own data at
    the decoded page boundaries, over a lake with an all-null stripe
    and a no-index file (row-group-granularity degradation)."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        page_pruning_report,
        read_footer_handle,
        read_page_index,
    )

    lake = tmp_path / "lake"
    d = lake / "part=a"
    d.mkdir(parents=True)
    # f0: values 0..599 in 2 rgs of 300, pages of 50; rows 100..149 null
    col = [None if 100 <= i < 150 else i for i in range(600)]
    pq.write_table(
        pa.table({"v": pa.array(col, pa.int64())}),
        str(d / "f0.parquet"),
        row_group_size=300,
        write_page_index=True,
        write_batch_size=50,
        data_page_size=1,
    )
    # f1: values 1000..1199, NO page index -> rg granularity
    pq.write_table(
        pa.table({"v": pa.array(range(1000, 1200), pa.int64())}),
        str(d / "f1.parquet"),
        row_group_size=100,
        write_page_index=False,
    )
    lo, hi = 60, 320
    rep = page_pruning_report(
        spark, str(lake), column="v", lo=lo, hi=hi
    ).collect()
    assert len(rep) == 1
    r = rep[0]
    # ground truth from the decoded indexes + pyarrow data
    import os

    exp_pages = exp_skip_pages = exp_rgs = exp_skip_rgs = 0
    exp_scanned = 0
    for name in ("f0.parquet", "f1.parquet"):
        fp = d / name
        fsize = os.path.getsize(fp)
        with open(fp, "rb") as fh:
            footer = read_footer_handle(fh, fsize)
            idx = read_page_index(fh, footer, "v")
        pf = pq.ParquetFile(str(fp))
        for ri, pidx in enumerate(idx):
            exp_rgs += 1
            st = pf.metadata.row_group(ri).column(0).statistics
            rg_rows = pf.metadata.row_group(ri).num_rows
            rg_skip = st.max < lo or st.min > hi
            if rg_skip:
                # chunk-stats skip: zero index reads, zero page counts
                # (the page counters measure the index's MARGINAL
                # pruning over surviving row groups — review r9)
                exp_skip_rgs += 1
                continue
            if pidx is None:
                exp_pages += 1
                exp_scanned += rg_rows
                continue
            data = pf.read_row_group(ri).column("v").to_pylist()
            firsts = pidx["first_rows"]
            exp_pages += len(firsts)
            for i, start in enumerate(firsts):
                end = firsts[i + 1] if i + 1 < len(firsts) else rg_rows
                live = [x for x in data[start:end] if x is not None]
                if not live or max(live) < lo or min(live) > hi:
                    exp_skip_pages += 1
                else:
                    exp_scanned += end - start
    assert r["n_files"] == 2
    assert r["n_row_groups"] == exp_rgs
    assert r["n_skippable_rgs"] == exp_skip_rgs
    assert r["n_pages"] == exp_pages
    assert r["n_skippable_pages"] == exp_skip_pages
    assert r["rows_total"] == 800
    assert r["rows_scanned"] == exp_scanned
    # sanity: the predicate really prunes at page granularity
    assert 0 < exp_skip_pages < exp_pages
    assert 0 < exp_scanned < 800


def test_pruning_report_typed_and_null_modes(spark, tmp_path):
    """Round 9 (VERDICT r8 #3): string and double predicates, all-null
    row-group skipping, and IS NOT NULL pruning — each recomputed from
    pyarrow's own statistics; per-rg skip counts survive a stats-less
    sibling row group (ADVICE r8)."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        pruning_report,
    )

    lake = tmp_path / "lake"
    d = lake / "key=cat_a"
    d.mkdir(parents=True)
    # f0: strings w000..w299 in rgs of 100; rg1 (100..199) all NULL
    svals = [
        None if 100 <= i < 200 else f"w{i:03d}" for i in range(300)
    ]
    pq.write_table(
        pa.table({"s": pa.array(svals, pa.string()),
                  "x": pa.array([None if 100 <= i < 200 else i + 0.5
                                 for i in range(300)], pa.float64())}),
        str(d / "f0.parquet"),
        row_group_size=100,
    )
    # string range [w050, w120]: rg0 overlaps, rg1 all-null skips,
    # rg2 window-misses -> 2 skippable rgs, file not skippable
    rep = {
        r["partition"]: r
        for r in pruning_report(
            spark, str(lake), column="s", lo="w050", hi="w120"
        ).collect()
    }
    a = rep["key=cat_a"]
    assert a["n_row_groups"] == 3 and a["n_skippable_rgs"] == 2
    assert a["n_skippable_files"] == 0 and a["rows_scanned"] == 300
    # double range [250.0, 260.0]: only rg2 overlaps
    rep = {
        r["partition"]: r
        for r in pruning_report(
            spark, str(lake), column="x", lo=250.0, hi=260.0
        ).collect()
    }
    a = rep["key=cat_a"]
    assert a["n_skippable_rgs"] == 2 and a["n_skippable_files"] == 0
    # IS NOT NULL: exactly the all-null rg skips
    rep = {
        r["partition"]: r
        for r in pruning_report(
            spark, str(lake), column="s", not_null=True
        ).collect()
    }
    a = rep["key=cat_a"]
    assert a["n_skippable_rgs"] == 1 and a["n_skippable_files"] == 0
    # a file that is ENTIRELY out of range is file-skippable and its
    # rows drop out of rows_scanned
    pq.write_table(
        pa.table({"s": pa.array([f"z{i}" for i in range(50)]),
                  "x": pa.array([1e6 + i for i in range(50)])}),
        str(d / "f1.parquet"),
        row_group_size=25,
    )
    rep = {
        r["partition"]: r
        for r in pruning_report(
            spark, str(lake), column="s", lo="w050", hi="w120"
        ).collect()
    }
    a = rep["key=cat_a"]
    assert a["n_files"] == 2 and a["n_skippable_files"] == 1
    assert a["rows_total"] == 350 and a["rows_scanned"] == 300


def test_page_index_read_skips_stats_skipped_row_groups(tmp_path):
    """review r9: a row group skipped by chunk stats must cost ZERO
    index bytes — read_page_index(only=...) restricts the ranged read
    span to the surviving row groups."""
    import os

    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        read_footer_handle,
        read_page_index,
    )

    fp = tmp_path / "x.parquet"
    pq.write_table(
        pa.table({"v": pa.array(range(900), pa.int64())}),
        str(fp),
        row_group_size=300,
        write_page_index=True,
        write_batch_size=50,
        data_page_size=1,
    )
    fsize = os.path.getsize(fp)
    with open(fp, "rb") as fh:
        footer = read_footer_handle(fh, fsize)
        full = read_page_index(fh, footer, "v")
        fh2 = _CountingHandle(open(fp, "rb"))
        only_mid = read_page_index(fh2, footer, "v", only={1})
        fh2.close()
        fh3 = _CountingHandle(open(fp, "rb"))
        read_page_index(fh3, footer, "v")
        fh3.close()
    assert only_mid[0] is None and only_mid[2] is None
    assert only_mid[1] == full[1]
    # restricting to one rg reads strictly fewer index bytes
    assert 0 < fh2.bytes_read < fh3.bytes_read
    # empty selection never touches the handle
    assert read_page_index(None, footer, "v", only=set()) == [
        None,
        None,
        None,
    ]


def test_s3a_scheme_rewrite_and_unknown_scheme_error():
    """review r9: Spark lakes address object stores as s3a:// — the
    ranged-read resolver must rewrite Hadoop-convention schemes to the
    pyarrow equivalent instead of dying on ArrowInvalid, and unknown
    schemes must fail with an actionable message."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        _pyarrow_uri,
        open_ranged,
    )

    assert _pyarrow_uri("s3a://bucket/k/f.parquet") == "s3://bucket/k/f.parquet"
    assert _pyarrow_uri("s3n://b/k") == "s3://b/k"
    assert _pyarrow_uri("S3A://b/k") == "s3://b/k"
    assert _pyarrow_uri("gs://b/k") == "gs://b/k"
    assert _pyarrow_uri("/local/path") == "/local/path"
    with pytest.raises(ValueError, match="known schemes"):
        open_ranged("definitelynotascheme://x/y")


def test_relative_local_root_labels_and_compaction(spark):
    """review r9b: a RELATIVE local table root must be realpath'd on
    the driver — shipped verbatim it would be re-anchored against each
    Python worker's CWD, producing garbage labels (and a silently
    no-op'd compaction downstream). Relative paths resolve against the
    driver process CWD (where the JVM was launched), so the fixture
    lives under the repo's .scratch dir."""
    import os
    import shutil
    import uuid

    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        lake_audit_report,
    )

    rel = os.path.join(".scratch", f"rel_lake_{uuid.uuid4().hex[:8]}")
    try:
        for part in ("part=a", "part=b"):
            d = os.path.join(rel, part)
            os.makedirs(d)
            pq.write_table(
                pa.table({"x": pa.array(range(100), pa.int64())}),
                os.path.join(d, "f.parquet"),
            )
        rep = {
            r["partition"]: r["total_rows"]
            for r in lake_audit_report(spark, rel).collect()
        }
        assert rep == {"part=a": 100, "part=b": 100}
    finally:
        shutil.rmtree(rel, ignore_errors=True)


def test_page_index_exact_extent_reads(tmp_path):
    """review r9b: the page-index ranged read must cover exactly the
    selected column's selected row groups — a min..max span would drag
    in other columns' index bytes and interior stats-skipped rgs. The
    byte counter pins: selecting rgs {0, 2} of a 3-column file reads
    strictly less than the whole index region, and the decoded
    entries equal the full read's."""
    import os

    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        read_footer_handle,
        read_page_index,
    )

    fp = tmp_path / "wide.parquet"
    pq.write_table(
        pa.table(
            {
                "v": pa.array(range(900), pa.int64()),
                "w": pa.array([f"pad{i:06d}" * 4 for i in range(900)]),
                "z": pa.array([i * 0.5 for i in range(900)]),
            }
        ),
        str(fp),
        row_group_size=300,
        write_page_index=True,
        write_batch_size=10,
        data_page_size=1,
    )
    fsize = os.path.getsize(fp)
    with open(fp, "rb") as fh:
        footer = read_footer_handle(fh, fsize)
    # whole index region span (all columns, all rgs) for comparison
    offs = [
        (c["ci_off"], c["ci_len"], c["oi_off"], c["oi_len"])
        for rg in footer["row_groups"]
        for c in rg["columns"]
    ]
    region = max(o + n for a, b, o, n in offs for o, n in [(a, b), (o, n)]) - min(
        min(a, o) for a, b, o, n in offs
    )
    with open(fp, "rb") as raw:
        fh_all = _CountingHandle(raw)
        full = read_page_index(fh_all, footer, "v")
    with open(fp, "rb") as raw:
        fh_sel = _CountingHandle(raw)
        sel = read_page_index(fh_sel, footer, "v", only={0, 2})
    # exact extents: the v-column selection reads far less than the
    # 3-column index region, and selecting 2 of 3 rgs reads less still
    assert fh_all.bytes_read < region
    assert fh_sel.bytes_read < fh_all.bytes_read
    assert sel[1] is None
    assert sel[0] == full[0] and sel[2] == full[2]


def test_open_ranged_uses_cached_bucket_filesystem(monkeypatch):
    """review r9b: object-store filesystems resolve once per bucket
    (cached), not once per file, and the file path handed to the
    cached client is pyarrow's '<bucket>/<key>' form."""
    from data_engineering_etl_self_service_spark.operators import (
        parquet_meta as pm,
    )

    calls = []

    class FakeFS:
        def open_input_file(self, p):
            calls.append(p)
            return io.BytesIO(b"")

    roots = []

    def fake_bucket_fs(root):
        roots.append(root)
        return FakeFS()

    # the real resolver is an LRU: same bucket -> same instance
    a = pm._bucket_fs("gs://samebucket")
    b = pm._bucket_fs("gs://samebucket")
    assert a is b

    monkeypatch.setattr(pm, "_bucket_fs", fake_bucket_fs)
    pm.open_ranged("s3a://mybucket/lake/part=1/f.parquet")
    pm.open_ranged("s3a://mybucket/lake/part=2/g.parquet")
    assert roots == ["s3://mybucket", "s3://mybucket"]
    assert calls == [
        "mybucket/lake/part=1/f.parquet",
        "mybucket/lake/part=2/g.parquet",
    ]


def test_page_pruning_typed_predicates(spark, tmp_path):
    """The page audit is type-generic through the same _window_misses
    used by the rg audit — pin it on STRING and DOUBLE page stats
    (ColumnIndex min/max decode by column type), with ground truth
    recomputed from pyarrow data slices at the decoded boundaries."""
    import os

    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        page_pruning_report,
        read_footer_handle,
        read_page_index,
    )

    lake = tmp_path / "lake"
    d = lake / "part=a"
    d.mkdir(parents=True)
    fp = d / "f0.parquet"
    pq.write_table(
        pa.table(
            {
                "s": pa.array([f"k{i:05d}" for i in range(600)]),
                "x": pa.array([i + 0.5 for i in range(600)]),
            }
        ),
        str(fp),
        row_group_size=300,
        write_page_index=True,
        write_batch_size=50,
        data_page_size=1,
    )

    def truth(col, lo, hi):
        fsize = os.path.getsize(fp)
        with open(fp, "rb") as fh:
            footer = read_footer_handle(fh, fsize)
            idx = read_page_index(fh, footer, col)
        pf = pq.ParquetFile(str(fp))
        pages = skips = scanned = 0
        for ri, pidx in enumerate(idx):
            rg_rows = pf.metadata.row_group(ri).num_rows
            st = pf.metadata.row_group(ri).column(
                0 if col == "s" else 1
            ).statistics
            if st.max < lo or st.min > hi:
                continue  # rg-skipped: excluded from page counters
            data = pf.read_row_group(ri).column(col).to_pylist()
            firsts = pidx["first_rows"]
            pages += len(firsts)
            for i, start in enumerate(firsts):
                end = firsts[i + 1] if i + 1 < len(firsts) else rg_rows
                page = data[start:end]
                if max(page) < lo or min(page) > hi:
                    skips += 1
                else:
                    scanned += end - start
        return pages, skips, scanned

    for col, lo, hi in (
        ("s", "k00120", "k00180"),  # hits pages inside rg0 only
        ("x", 320.0, 380.75),  # hits pages inside rg1 only
    ):
        rep = page_pruning_report(
            spark, str(lake), column=col, lo=lo, hi=hi
        ).collect()
        assert len(rep) == 1
        r = rep[0]
        pages, skips, scanned = truth(col, lo, hi)
        assert r["n_pages"] == pages
        assert r["n_skippable_pages"] == skips
        assert r["rows_scanned"] == scanned
        assert r["n_skippable_rgs"] == 1  # the other rg window-misses
        # the predicate genuinely prunes at page granularity
        assert 0 < skips < pages and 0 < scanned < 600


def test_encoding_report_vs_duckdb_parquet_metadata(spark, tmp_path):
    """Encoding audit parity: chunk counts and the distinct encoding
    set must match what DuckDB's parquet_metadata() reports for the
    same files, per (partition, column)."""
    from collections import defaultdict

    import duckdb

    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        encoding_report,
    )

    lake = tmp_path / "lake"
    for part, use_dict in [("a", True), ("b", False)]:
        d = lake / f"part={part}"
        d.mkdir(parents=True)
        pq.write_table(
            pa.table(
                {
                    "tok": pa.array([f"w{i % 9}" for i in range(200)]),
                    "v": pa.array(range(200), pa.int64()),
                }
            ),
            str(d / "f.parquet"),
            row_group_size=32,
            use_dictionary=use_dict,
        )
    rep = {
        (r["partition"], r["column"]): r
        for r in encoding_report(spark, str(lake)).collect()
    }
    duck = defaultdict(lambda: {"n": 0, "encs": set()})
    for part in ("a", "b"):
        rows = duckdb.sql(
            "select path_in_schema, encodings from parquet_metadata("
            f"'{lake}/part={part}/f.parquet')"
        ).fetchall()
        for col, encs in rows:
            e = duck[(f"part={part}", col)]
            e["n"] += 1
            e["encs"].update(s.strip() for s in encs.split(","))
    assert set(rep) == set(duck)
    for key, e in duck.items():
        assert rep[key]["n_chunks"] == e["n"]
        assert set(rep[key]["encodings"].split(",")) == e["encs"]
    # dict-mode partition: every chunk dictionary-encoded, one dict
    # page per chunk, one data page per 32-row row group
    for col in ("tok", "v"):
        r = rep[("part=a", col)]
        assert r["n_dict_chunks"] == r["n_chunks"] == 7
        assert r["n_plain_chunks"] == r["n_fallback_chunks"] == 0
        assert r["n_dict_pages"] == 7 and r["n_data_pages"] == 7
        rb = rep[("part=b", col)]
        assert rb["n_plain_chunks"] == rb["n_chunks"] == 7
        assert rb["n_dict_chunks"] == rb["n_fallback_chunks"] == 0
        assert rb["n_dict_pages"] == 0 and rb["n_data_pages"] == 7


def test_encoding_report_detects_dictionary_fallback(spark, tmp_path):
    """A dictionary page starved below the column's cardinality makes
    the writer fall back to PLAIN mid-chunk; the audit must report the
    chunk as fallback, not dict or plain."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        encoding_report,
    )

    lake = tmp_path / "lake"
    lake.mkdir()
    pq.write_table(
        pa.table(
            {"s": pa.array([f"value-{i:06d}" for i in range(5000)])}
        ),
        str(lake / "f.parquet"),
        use_dictionary=True,
        dictionary_pagesize_limit=1024,  # ~70 distinct values fit
        row_group_size=5000,
    )
    r = encoding_report(spark, str(lake)).collect()
    (row,) = [x for x in r if x["column"] == "s"]
    assert row["n_fallback_chunks"] == 1
    assert row["n_dict_chunks"] == 0 and row["n_plain_chunks"] == 0
    assert "RLE_DICTIONARY" in row["encodings"]
    assert row["n_data_pages"] > 1  # dict-encoded pages + plain pages
    assert row["n_dict_pages"] == 1


def test_classify_chunk_encoding_old_writer_fallback():
    """Writers that omit PageEncodingStats (field 13) classify from
    the dictionary-page offset, with page tallies reported as 0 —
    unknown, not claimed."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        classify_chunk_encoding,
    )

    old_dict = {"encoding_stats": None, "dict_page_off": 4}
    old_plain = {"encoding_stats": None, "dict_page_off": None}
    assert classify_chunk_encoding(old_dict) == ("dict", 0, 0)
    assert classify_chunk_encoding(old_plain) == ("plain", 0, 0)
    modern = {
        "encoding_stats": [
            {"page_type": 2, "encoding": 0, "count": 1},
            {"page_type": 0, "encoding": 8, "count": 3},
            {"page_type": 0, "encoding": 0, "count": 2},
        ],
        "dict_page_off": 4,
    }
    assert classify_chunk_encoding(modern) == ("fallback", 5, 1)
    v2_pages = {
        "encoding_stats": [{"page_type": 3, "encoding": 8, "count": 2},
                           {"page_type": 2, "encoding": 0, "count": 1}],
        "dict_page_off": 4,
    }
    assert classify_chunk_encoding(v2_pages) == ("dict", 2, 1)


def test_clustering_report_depth_pairs_and_edge_cases(spark, tmp_path):
    """Clustering sweep ground truth: disjoint windows -> depth 1 /
    0 pairs; TOUCHING windows overlap; fully interleaved -> depth k /
    all pairs; a file without usable stats is excluded and counted."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        clustering_report,
    )

    lake = tmp_path / "lake"

    def _wf(part, name, vals, typ=pa.int64()):
        d = lake / f"part={part}"
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.table({"v": pa.array(vals, typ)}),
            str(d / f"{name}.parquet"),
        )

    # part=a: [0,9] [10,19] [20,29] disjoint
    _wf("a", "f0", range(0, 10))
    _wf("a", "f1", range(10, 20))
    _wf("a", "f2", range(20, 30))
    # part=b: [0,5] [5,9] touching at 5 -> one overlapping pair, depth 2
    _wf("b", "f0", [0, 3, 5])
    _wf("b", "f1", [5, 7, 9])
    # part=c: three interleaved spans + one all-NULL (no stats window)
    _wf("c", "f0", [0, 30])
    _wf("c", "f1", [1, 31])
    _wf("c", "f2", [2, 32])
    _wf("c", "fnull", [None, None])
    rep = {
        r["partition"]: r
        for r in clustering_report(spark, str(lake), "v").collect()
    }
    a, b, c = rep["part=a"], rep["part=b"], rep["part=c"]
    assert (a["max_depth"], a["n_overlap_pairs"], a["clustered"]) == (1, 0, True)
    assert a["n_files"] == 3 and a["n_unstatted"] == 0
    assert (b["max_depth"], b["n_overlap_pairs"], b["clustered"]) == (2, 1, False)
    assert (c["max_depth"], c["n_overlap_pairs"]) == (3, 3)
    assert c["n_files"] == 4 and c["n_unstatted"] == 1


def test_clustering_report_string_and_double_lanes(spark, tmp_path):
    """The sweep orders on whichever typed lane the column's stats
    populate — string windows and double windows both work."""
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        clustering_report,
    )

    for typ, mk in [
        (pa.string(), lambda lo, hi: [f"k{lo:04d}", f"k{hi:04d}"]),
        (pa.float64(), lambda lo, hi: [float(lo), float(hi)]),
    ]:
        lake = tmp_path / f"lake_{typ}"
        d = lake / "part=x"
        d.mkdir(parents=True)
        pq.write_table(pa.table({"v": pa.array(mk(0, 10), typ)}), str(d / "f0.parquet"))
        pq.write_table(pa.table({"v": pa.array(mk(5, 15), typ)}), str(d / "f1.parquet"))
        pq.write_table(pa.table({"v": pa.array(mk(20, 30), typ)}), str(d / "f2.parquet"))
        (r,) = clustering_report(spark, str(lake), "v").collect()
        assert (r["max_depth"], r["n_overlap_pairs"], r["clustered"]) == (2, 1, False)
