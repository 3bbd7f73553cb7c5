"""Parquet footer introspection — hand-rolled Thrift Compact Protocol.

Lake-layout auditing at 100 TB means asking every file "how many row
groups, what codec, how big are the column chunks, what are the
min/max stats" WITHOUT reading data pages — the information lives in
the footer (a Thrift-compact-serialized ``FileMetaData`` struct at the
end of the file, length-prefixed before the trailing ``PAR1`` magic).
Spark exposes none of it at the DataFrame level; this module decodes
it directly from the public format spec (parquet-format
FileMetaData.thrift + the Thrift Compact Protocol spec), the same
family of hand decoders as ``operators/tfrecord.py`` (protobuf wire)
and ``operators/sqlite.py`` (b-tree pages).

Layers:

- :func:`thrift_compact_decode` — a GENERIC compact-protocol struct
  reader (short/long field headers, zigzag varints, little-endian
  doubles, length-prefixed binaries, size-prefixed lists/maps, nested
  structs) returning ``{field_id: value}`` trees.
- :func:`parquet_footer` — maps the generic tree through the public
  FileMetaData/RowGroup/ColumnChunk/ColumnMetaData/Statistics field
  ids into plain dicts, decoding INT32/INT64/DOUBLE min/max statistics
  from their PLAIN little-endian encoding.

Verified two ways (tests/test_parquet_meta.py + the oracled
``parquet_footer_stats`` query): against pyarrow's OWN metadata object
for the same bytes, and against symbolic expectations when the writer
layout (row-group size, codec, column set) is pinned by the builder.

Scale: footers are KB-sized regardless of file size — an audit over a
100 TB lake reads only footers (binaryFile can't slice, so pair this
with a manifest/range reader on object stores; in-container tests read
whole small files).
"""

from __future__ import annotations

import struct

# Thrift compact element types
_STOP = 0
_BOOL_TRUE = 1
_BOOL_FALSE = 2
_I8 = 3
_I16 = 4
_I32 = 5
_I64 = 6
_DOUBLE = 7
_BINARY = 8
_LIST = 9
_SET = 10
_MAP = 11
_STRUCT = 12

_CODECS = {
    0: "uncompressed",
    1: "snappy",
    2: "gzip",
    3: "lzo",
    4: "brotli",
    5: "lz4",
    6: "zstd",
    7: "lz4_raw",
}

_TYPES = {
    0: "boolean",
    1: "int32",
    2: "int64",
    3: "int96",
    4: "float",
    5: "double",
    6: "byte_array",
    7: "fixed_len_byte_array",
}


class _R:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        shift = acc = 0
        while True:
            b = self.byte()
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return acc
            shift += 7
            if shift > 70:
                raise ValueError("thrift: varint too long")

    def zigzag(self) -> int:
        u = self.varint()
        return (u >> 1) ^ -(u & 1)

    def binary(self) -> bytes:
        n = self.varint()
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("thrift: truncated binary")
        self.pos += n
        return out


def _read_value(r: _R, etype: int):
    if etype in (_BOOL_TRUE, _BOOL_FALSE):
        # list/map element form: one byte per bool
        return r.byte() == 1
    if etype == _I8:
        return r.byte()
    if etype in (_I16, _I32, _I64):
        return r.zigzag()
    if etype == _DOUBLE:
        v = struct.unpack_from("<d", r.buf, r.pos)[0]
        r.pos += 8
        return v
    if etype == _BINARY:
        return r.binary()
    if etype in (_LIST, _SET):
        head = r.byte()
        size = head >> 4
        el = head & 0x0F
        if size == 15:
            size = r.varint()
        return [_read_value(r, el) for _ in range(size)]
    if etype == _MAP:
        size = r.varint()
        if size == 0:
            return {}
        kv = r.byte()
        kt, vt = kv >> 4, kv & 0x0F
        return {
            _key(_read_value(r, kt)): _read_value(r, vt)
            for _ in range(size)
        }
    if etype == _STRUCT:
        return _read_struct(r)
    raise ValueError(f"thrift: unsupported element type {etype}")


def _key(k):
    return k.decode("utf-8", "replace") if isinstance(k, bytes) else k


def _read_struct(r: _R) -> dict:
    out: dict = {}
    fid = 0
    while True:
        head = r.byte()
        if head == _STOP:
            return out
        delta = head >> 4
        ftype = head & 0x0F
        if delta == 0:
            fid = r.zigzag()
        else:
            fid += delta
        if ftype == _BOOL_TRUE:
            out[fid] = True
        elif ftype == _BOOL_FALSE:
            out[fid] = False
        else:
            out[fid] = _read_value(r, ftype)


def thrift_compact_decode(buf: bytes, pos: int = 0) -> dict:
    """Decode one compact-protocol struct → ``{field_id: value}``."""
    return _read_struct(_R(buf, pos))


def _stat_value(raw: bytes | None, ptype: str):
    """Decode a Statistics min/max value from its PLAIN encoding."""
    if raw is None:
        return None
    if ptype == "int32":
        return struct.unpack("<i", raw)[0]
    if ptype == "int64":
        return struct.unpack("<q", raw)[0]
    if ptype == "double":
        return struct.unpack("<d", raw)[0]
    if ptype == "float":
        return struct.unpack("<f", raw)[0]
    if ptype == "boolean":
        return raw != b"\x00"
    if ptype == "byte_array":
        return raw.decode("utf-8", "replace")
    return raw


def parquet_footer(raw: bytes) -> dict:
    """Parse a whole parquet file's FOOTER → plain dicts.

    Returns ``{version, num_rows, created_by, schema: [names...],
    row_groups: [{num_rows, total_byte_size, columns: [{path, type,
    codec, encodings, num_values, total_compressed_size,
    total_uncompressed_size, null_count, min, max}]}]}``.
    """
    if len(raw) < 12 or raw[:4] != b"PAR1" or raw[-4:] != b"PAR1":
        raise ValueError("parquet: missing PAR1 magic")
    meta_len = struct.unpack("<I", raw[-8:-4])[0]
    start = len(raw) - 8 - meta_len
    if start < 4:
        raise ValueError("parquet: footer length out of range")
    return _map_footer(thrift_compact_decode(raw, start))


def read_footer_local(fspath: str, fsize: int) -> dict:
    """:func:`parquet_footer` reading ONLY the footer bytes of a local
    file — seek to the trailing ``(metadata_len, PAR1)`` word, then
    read exactly the metadata blob (round 8). This is what makes the
    lake audits footers-only in I/O terms too: a 10 GB file costs the
    same KBs to audit as a 10 MB one. (The binaryFile ``content`` path
    ships whole files; on object stores the equivalent is a ranged
    GET of the last N KB.)"""
    with open(fspath, "rb") as fh:
        if fsize < 12:
            raise ValueError("parquet: file too small")
        fh.seek(0)
        if fh.read(4) != b"PAR1":
            raise ValueError("parquet: missing PAR1 magic")
        fh.seek(fsize - 8)
        tail = fh.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError("parquet: missing PAR1 magic")
        meta_len = struct.unpack("<I", tail[:4])[0]
        start = fsize - 8 - meta_len
        if start < 4:
            raise ValueError("parquet: footer length out of range")
        fh.seek(start)
        buf = fh.read(meta_len)
    return _map_footer(thrift_compact_decode(buf, 0))


def _map_footer(fmd: dict) -> dict:
    """Map a thrift-decoded FileMetaData tree to the plain-dict shape
    :func:`parquet_footer` documents."""
    schema = [
        {
            "name": el.get(4, b"").decode("utf-8", "replace"),
            "type": _TYPES.get(el.get(1), None),
            "num_children": el.get(5, 0),
        }
        for el in fmd.get(2, [])
    ]
    row_groups = []
    for rg in fmd.get(4, []):
        cols = []
        for cc in rg.get(1, []):
            md = cc.get(3, {})
            ptype = _TYPES.get(md.get(1), "unknown")
            stats = md.get(12, {})
            cols.append(
                {
                    "path": ".".join(
                        p.decode("utf-8", "replace") for p in md.get(3, [])
                    ),
                    "type": ptype,
                    "codec": _CODECS.get(md.get(4), "unknown"),
                    "encodings": md.get(2, []),
                    "num_values": md.get(5, 0),
                    "total_uncompressed_size": md.get(6, 0),
                    "total_compressed_size": md.get(7, 0),
                    "null_count": stats.get(3),
                    # modern writers fill 5/6 (min_value/max_value);
                    # 1/2 are the deprecated pre-order fields
                    "min": _stat_value(stats.get(6, stats.get(2)), ptype),
                    "max": _stat_value(stats.get(5, stats.get(1)), ptype),
                }
            )
        row_groups.append(
            {
                "num_rows": rg.get(3, 0),
                "total_byte_size": rg.get(2, 0),
                "columns": cols,
            }
        )
    return {
        "version": fmd.get(1),
        "num_rows": fmd.get(3, 0),
        "created_by": fmd.get(6, b"").decode("utf-8", "replace"),
        "schema": schema,
        "row_groups": row_groups,
    }


def file_audit_rows(spark, path: str):
    """One row per parquet file with the footer facts the partition
    rollup (:func:`lake_audit_report`) aggregates: hive-partition label,
    file size, row/row-group counts, per-row-group row counts, and the
    per-column-chunk (path, codec, compressed, uncompressed) parallel
    arrays. Executor-side footer decode, shuffle-free — and on local
    files the I/O is footer bytes ONLY (:func:`read_footer_local`
    seeks to the trailing metadata; round 8 — the binaryFile
    ``content`` path shipped whole files, which at 100 TB would read
    the lake to audit it). Non-``file:`` schemes fall back to the
    whole-content read (object stores pair this with a ranged GET)."""
    from pyspark.sql import functions as F

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(path)
        # compaction staging/retirement dirs (layout.compact_flagged)
        # are in-flight maintenance state, not partitions — auditing
        # them would double-count a crashed swap's data (review r8)
        .filter(~F.col("path").rlike("__(compacting|retired)/"))
    )
    first = files.select("path").head()
    local = first is not None and first["path"].startswith("file:")
    # partition label = path RELATIVE to the table root, so nested
    # hive layouts (ds=.../hr=...) stay distinct — basename(dirname)
    # alone merged equal leaf names across parents (review r8). Only
    # computable when the root is a local path; the non-local fallback
    # keeps the leaf-dir label (documented).
    import os as _os_drv

    root_norm = _os_drv.path.realpath(
        path[5:] if path.startswith("file:") else path
    )

    def _label(p, _os):
        from urllib.parse import unquote, urlparse

        if p.startswith("file:"):
            d = _os.path.dirname(
                _os.path.realpath(unquote(urlparse(p).path))
            )
            return _os.path.relpath(d, root_norm)
        return _os.path.basename(_os.path.dirname(p))

    def _row(p, size, f, _os):
        rgs = f["row_groups"]
        cols = [c for rg in rgs for c in rg["columns"]]
        return {
            "partition": _label(p, _os),
            "file": _os.path.basename(p),
            "bytes": size,
            "n_rows": f["num_rows"],
            "n_row_groups": len(rgs),
            "rg_rows": [rg["num_rows"] for rg in rgs],
            "col_path": [c["path"] for c in cols],
            "col_codec": [c["codec"] for c in cols],
            "col_comp": [c["total_compressed_size"] for c in cols],
            "col_uncomp": [c["total_uncompressed_size"] for c in cols],
        }

    schema = (
        "partition string, file string, bytes long, n_rows long, "
        "n_row_groups long, rg_rows array<long>, "
        "col_path array<string>, col_codec array<string>, "
        "col_comp array<long>, col_uncomp array<long>"
    )

    if local:
        from ..sources.avro_ocf import _local_fspath

        def stats_local(it):
            import os as _os

            import pandas as pd

            for pdf in it:
                rows = [
                    _row(
                        p,
                        int(ln),
                        read_footer_local(_local_fspath(p), int(ln)),
                        _os,
                    )
                    for p, ln in zip(pdf["path"], pdf["length"])
                ]
                yield pd.DataFrame(rows)

        return files.select("path", "length").mapInPandas(
            stats_local, schema
        )

    def stats(it):
        import os as _os

        import pandas as pd

        for pdf in it:
            rows = []
            for p, raw in zip(pdf["path"], pdf["content"]):
                raw = bytes(raw)
                rows.append(_row(p, len(raw), parquet_footer(raw), _os))
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(stats, schema)


def lake_audit_report(spark, path: str, small_file_bytes: int = 32 << 20):
    """Partition-level lake audit from footers only — the questions a
    100 TB lake operator actually asks (VERDICT r7 #6): per partition,
    file counts and sizes, a log2 file-size histogram, row-group size
    spread and histogram, column-chunk compression ratios with the
    worst-compressing column named, and the small-file / size-skew
    flags that drive compaction decisions.

    One row per hive partition directory with:

    - ``n_files, total_bytes, total_rows, n_row_groups``
    - ``min/max_file_bytes, min/max_file_rows, avg_file_bytes``
    - ``n_small_files`` (< ``small_file_bytes``), ``small_file_flag``
      (majority small — the compact-me signal)
    - ``file_skew_pct`` = 100·max_file_bytes·n_files / total_bytes
      (100 = perfectly even; ≫100 = one file dominates)
    - ``file_size_hist`` / ``rg_rows_hist`` — "log2_bucket:count"
      strings, sorted (e.g. ``10:3,20:1`` = three ~KB files, one ~MB)
    - ``min/max/avg_rg_rows``
    - ``compression_ratio_pct`` = 100·uncompressed/compressed over all
      chunks; ``worst_col`` + ``worst_col_ratio_pct`` name the column
      whose chunks compress worst (candidate for re-encoding)
    - ``codecs`` — the distinct codec set actually in use

    All integer arithmetic (deterministic across partitionings). Scale:
    the per-file pass is shuffle-free; the rollups shuffle one row per
    FILE (and per file×column), never data pages — auditing a 100 TB
    lake moves MBs."""
    from pyspark.sql import functions as F

    f = file_audit_rows(spark, path)
    f = f.withColumn(
        "size_bucket", F.floor(F.log2(F.greatest("bytes", F.lit(1)))).cast("int")
    )
    # five rollups fan out of the per-file pass — materialize it ONCE
    # (eager localCheckpoint) so the lake's files are listed and their
    # footers decoded exactly once, not per branch. NOT .persist():
    # Spark's cache manager matches by canonical plan, so a persisted
    # frame would serve STALE rows to a re-audit of the same path
    # after a compaction rewrote it (caught by the round-8
    # audit→compact→re-audit test). Per-file rows are KBs at any lake
    # size.
    f = f.localCheckpoint(eager=True)
    base = f.groupBy("partition").agg(
        F.count("*").alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        F.sum("n_rows").alias("total_rows"),
        F.sum("n_row_groups").alias("n_row_groups"),
        F.min("bytes").alias("min_file_bytes"),
        F.max("bytes").alias("max_file_bytes"),
        F.min("n_rows").alias("min_file_rows"),
        F.max("n_rows").alias("max_file_rows"),
        F.sum(
            F.when(F.col("bytes") < small_file_bytes, 1).otherwise(0)
        ).alias("n_small_files"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("col_codec")))).alias("_codecs"),
    )
    base = (
        base.withColumn(
            "avg_file_bytes", (F.col("total_bytes") / F.col("n_files")).cast("long")
        )
        .withColumn(
            "small_file_flag",
            F.col("n_small_files") * 2 > F.col("n_files"),
        )
        .withColumn(
            "file_skew_pct",
            (
                F.col("max_file_bytes") * F.col("n_files") * 100
                / F.col("total_bytes")
            ).cast("long"),
        )
        .withColumn("codecs", F.concat_ws(",", "_codecs"))
        .drop("_codecs")
    )

    def hist(df, col, out):
        return (
            df.groupBy("partition", col)
            .count()
            .groupBy("partition")
            .agg(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(col, "count"))
                        ),
                        lambda s: F.concat_ws(
                            ":",
                            s[col].cast("string"),
                            s["count"].cast("string"),
                        ),
                    ),
                ).alias(out)
            )
        )

    fhist = hist(f, "size_bucket", "file_size_hist")
    rg = f.select(
        "partition", F.explode("rg_rows").alias("rg_nrows")
    ).withColumn(
        "rg_bucket",
        F.floor(F.log2(F.greatest("rg_nrows", F.lit(1)))).cast("int"),
    )
    rghist = hist(rg, "rg_bucket", "rg_rows_hist")
    rgstats = rg.groupBy("partition").agg(
        F.min("rg_nrows").alias("min_rg_rows"),
        F.max("rg_nrows").alias("max_rg_rows"),
        (F.sum("rg_nrows") / F.count("*")).cast("long").alias("avg_rg_rows"),
    )
    chunks = f.select(
        "partition",
        F.explode(
            F.arrays_zip(
                F.col("col_path").alias("cpath"),
                F.col("col_comp").alias("comp"),
                F.col("col_uncomp").alias("uncomp"),
            )
        ).alias("c"),
    ).select(
        "partition", "c.cpath", "c.comp", "c.uncomp"
    )
    percol = chunks.groupBy("partition", "cpath").agg(
        F.sum("comp").alias("comp"), F.sum("uncomp").alias("uncomp")
    ).withColumn(
        "ratio_pct",
        (F.col("uncomp") * 100 / F.greatest("comp", F.lit(1))).cast("long"),
    )
    comp = percol.groupBy("partition").agg(
        (
            F.sum("uncomp") * 100 / F.greatest(F.sum("comp"), F.lit(1))
        ).cast("long").alias("compression_ratio_pct"),
        F.min_by("cpath", F.struct("ratio_pct", "cpath")).alias(
            "worst_col"
        ),
        F.min("ratio_pct").alias("worst_col_ratio_pct"),
    )
    # LEFT joins + defaults: a partition whose files all have ZERO row
    # groups (empty part files) contributes no exploded rg/chunk rows —
    # an inner join would silently drop exactly the degenerate
    # partition an auditor most needs to see (review r8)
    return (
        base.join(fhist, "partition")
        .join(rgstats, "partition", "left")
        .join(rghist, "partition", "left")
        .join(comp, "partition", "left")
        .fillna(
            {
                "min_rg_rows": 0,
                "max_rg_rows": 0,
                "avg_rg_rows": 0,
                "rg_rows_hist": "",
                "compression_ratio_pct": 0,
                "worst_col": "",
                "worst_col_ratio_pct": 0,
            }
        )
    )


def pruning_report(spark, path: str, column: str, lo: int, hi: int):
    """Footers-only DATA-SKIPPING audit: for the predicate
    ``lo <= column <= hi``, how many files and row groups would parquet
    min/max statistics let a scan skip — per hive partition, without
    touching a data page (SURVEY §4's partition-pruning row as a
    measurable tool; round 8). A file/row group is skippable when its
    stats window misses the predicate (``max < lo or min > hi``);
    missing stats count as NOT skippable (the conservative answer a
    real scanner gives).

    One row per partition: ``n_files, n_skippable_files,
    n_row_groups, n_skippable_rgs, rows_total, rows_scanned`` (rows of
    non-skippable files — the I/O the predicate actually pays).

    Integer (int64) statistics only — the audit's reference use is
    key/timestamp-epoch columns; float stats have their own ordering
    subtleties that a skipping AUDIT should not paper over. Scale: the
    same footer-bytes-only scan as :func:`lake_audit_report` plus one
    per-file rollup."""
    from pyspark.sql import functions as F

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(path)
        .filter(~F.col("path").rlike("__(compacting|retired)/"))
    )
    first = files.select("path").head()
    local = first is not None and first["path"].startswith("file:")
    import os as _os_drv

    root_norm = _os_drv.path.realpath(
        path[5:] if path.startswith("file:") else path
    )

    def rows_of(p, fsize, footer, _os):
        from urllib.parse import unquote, urlparse

        if p.startswith("file:"):
            d = _os.path.dirname(
                _os.path.realpath(unquote(urlparse(p).path))
            )
            label = _os.path.relpath(d, root_norm)
        else:
            label = _os.path.basename(_os.path.dirname(p))
        n_rgs = n_skip_rgs = 0
        fmin = fmax = None
        stats_ok = True
        for rg in footer["row_groups"]:
            n_rgs += 1
            col = next(
                (c for c in rg["columns"] if c["path"] == column), None
            )
            if (
                col is None
                or col["min"] is None
                or col["max"] is None
                or not isinstance(col["min"], int)
            ):
                stats_ok = False
                continue
            if col["max"] < lo or col["min"] > hi:
                n_skip_rgs += 1
            fmin = col["min"] if fmin is None else min(fmin, col["min"])
            fmax = col["max"] if fmax is None else max(fmax, col["max"])
        file_skippable = bool(
            stats_ok
            and fmin is not None
            and (fmax < lo or fmin > hi)
        )
        return {
            "partition": label,
            "n_rows": footer["num_rows"],
            "n_row_groups": n_rgs,
            "n_skip_rgs": n_skip_rgs if stats_ok else 0,
            "file_skippable": file_skippable,
        }

    schema = (
        "partition string, n_rows long, n_row_groups long, "
        "n_skip_rgs long, file_skippable boolean"
    )

    if local:
        from ..sources.avro_ocf import _local_fspath

        def stats_local(it):
            import os as _os

            import pandas as pd

            for pdf in it:
                yield pd.DataFrame(
                    [
                        rows_of(
                            p,
                            int(ln),
                            read_footer_local(
                                _local_fspath(p), int(ln)
                            ),
                            _os,
                        )
                        for p, ln in zip(pdf["path"], pdf["length"])
                    ]
                )

        per_file = files.select("path", "length").mapInPandas(
            stats_local, schema
        )
    else:

        def stats(it):
            import os as _os

            import pandas as pd

            for pdf in it:
                yield pd.DataFrame(
                    [
                        rows_of(
                            p, len(raw), parquet_footer(bytes(raw)), _os
                        )
                        for p, raw in zip(pdf["path"], pdf["content"])
                    ]
                )

        per_file = files.select("path", "content").mapInPandas(
            stats, schema
        )

    return per_file.groupBy("partition").agg(
        F.count("*").alias("n_files"),
        F.sum(F.col("file_skippable").cast("long")).alias(
            "n_skippable_files"
        ),
        F.sum("n_row_groups").alias("n_row_groups"),
        F.sum("n_skip_rgs").alias("n_skippable_rgs"),
        F.sum("n_rows").alias("rows_total"),
        F.sum(
            F.when(F.col("file_skippable"), 0).otherwise(F.col("n_rows"))
        ).alias("rows_scanned"),
    )


def lake_layout_report(spark, path: str):
    """Directory-level layout audit: one row per parquet file with the
    footer-derived facts a compaction/clustering decision needs —
    row count, row-group count and average size, codec mix, and the
    small-file flag that dominates 100 TB lake health. Executor-side
    footer decode (shuffle-free); on local files the I/O is footer
    bytes only (:func:`read_footer_local` — round 8), with the
    binaryFile content path as the non-local fallback. Pair with
    :func:`parquet_footer` for per-column drill-down."""
    files = spark.read.format("binaryFile").load(
        path.rstrip("/") + "/*.parquet"
        if not path.endswith(".parquet")
        else path
    )
    first = files.select("path").head()
    local = first is not None and first["path"].startswith("file:")

    def _row(p, size, f, _os):
        rgs = f["row_groups"]
        codecs = sorted(
            {c["codec"] for rg in rgs for c in rg["columns"]}
        )
        return {
            "file": _os.path.basename(p),
            "bytes": size,
            "n_rows": f["num_rows"],
            "n_row_groups": len(rgs),
            "avg_rows_per_group": f["num_rows"] // max(len(rgs), 1),
            "n_columns": len(rgs[0]["columns"]) if rgs else 0,
            "codecs": ",".join(codecs),
            "created_by": f["created_by"].split("(")[0].strip(),
        }

    schema = (
        "file string, bytes long, n_rows long, n_row_groups long, "
        "avg_rows_per_group long, n_columns long, codecs string, "
        "created_by string"
    )

    if local:
        from ..sources.avro_ocf import _local_fspath

        def stats_local(it):
            import os as _os

            import pandas as pd

            for pdf in it:
                yield pd.DataFrame(
                    [
                        _row(
                            p,
                            int(ln),
                            read_footer_local(
                                _local_fspath(p), int(ln)
                            ),
                            _os,
                        )
                        for p, ln in zip(pdf["path"], pdf["length"])
                    ]
                )

        return files.select("path", "length").mapInPandas(
            stats_local, schema
        )

    def stats(it):
        import os as _os

        import pandas as pd

        for pdf in it:
            rows = []
            for p, raw in zip(pdf["path"], pdf["content"]):
                raw = bytes(raw)
                rows.append(_row(p, len(raw), parquet_footer(raw), _os))
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(stats, schema)
