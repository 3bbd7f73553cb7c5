"""TAR / ZIP archive-member extraction + WebDataset sample grouping —
the remaining arrival containers for training corpora. Web-scale text
ships as WARC (operators/warc.py); *packaged* corpora ship as tar
shards (the WebDataset convention: a sample is a run of adjacent tar
members sharing a basename key — ``000123.jpg`` + ``000123.txt`` +
``000123.json``) or as zip archives (scanned-document and code
corpora). The reference has no archive stage at all (its corpus
arrives as unpacked JSON on S3); these operators complete the
bytes-on-disk -> rows story for the packed case.

Public format facts only:

- **tar** (POSIX.1-1988 ustar): 512-byte header blocks — name[100]
  mode[8] uid[8] gid[8] size[12] mtime[12] chksum[8] typeflag[1]
  linkname[100] magic[6]="ustar\\0" version[2] uname[32] gname[32]
  devmajor[8] devminor[8] prefix[155] — numeric fields in padded ASCII
  octal, checksum computed with the chksum field blanked to spaces,
  payload padded to a 512 multiple, archive terminated by two zero
  blocks. Whole-file gzip (``.tar.gz``) sniffed by the 1f 8b magic.
- **zip** (PKWARE APPNOTE.TXT): local file headers (``PK\\x03\\x04``),
  a central directory of ``PK\\x01\\x02`` entries, and an end-of-
  central-directory record (``PK\\x05\\x06``) located by scanning back
  from EOF; member payloads stored (method 0) or raw-deflated (method
  8, inflated with zlib wbits=-15); integrity via the recorded CRC-32.
- **WebDataset** (public convention of the webdataset library): key =
  basename up to the FIRST dot, extension = the rest; the members of
  one sample are adjacent in the tar, so grouping is a single ordered
  pass — the property that keeps shard ingestion streaming and
  splittable at shard granularity.

All parsers are tolerant by the module-wide contract (same line as
warc.py/tiff.py): malformed framing ends the walk with whatever
parsed — one dirty shard in a 100 TB corpus must not kill a task.

Spark entries (:func:`tar_member_rows`, :func:`zip_member_rows`,
:func:`wds_sample_rows`) are Arrow-batched ``mapInPandas`` explodes:
one archive blob per input row -> member/sample rows, a scan-stage
pass with no exchange, so added executors divide shard ingestion
directly.
"""

from __future__ import annotations

import struct
import zlib

_BLOCK = 512
_USTAR_MAGICS = (b"ustar\x00", b"ustar ")


# ---------------------------------------------------------------- tar


def _octal(value: int, width: int) -> bytes:
    return (f"%0{width - 1}o" % value).encode("ascii") + b"\x00"


def _tar_header(name: str, size: int, mtime: int, typeflag: bytes = b"0") -> bytes:
    nbytes = name.encode("utf-8")
    prefix = b""
    if len(nbytes) > 100:
        # ustar split: prefix[155] '/' name[100], split at a '/'
        cut = nbytes.rfind(b"/", 0, 156)
        if cut <= 0 or len(nbytes) - cut - 1 > 100:
            raise ValueError(f"name does not fit ustar fields: {name!r}")
        prefix, nbytes = nbytes[:cut], nbytes[cut + 1 :]
    hdr = bytearray(_BLOCK)
    hdr[0:100] = nbytes.ljust(100, b"\x00")
    hdr[100:108] = _octal(0o644, 8)
    hdr[108:116] = _octal(0, 8)
    hdr[116:124] = _octal(0, 8)
    hdr[124:136] = _octal(size, 12)
    hdr[136:148] = _octal(mtime, 12)
    hdr[148:156] = b" " * 8  # chksum blanked for computation
    hdr[156:157] = typeflag
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    hdr[345 : 345 + len(prefix)] = prefix
    chk = sum(hdr)
    hdr[148:156] = (b"%06o" % chk) + b"\x00 "
    return bytes(hdr)


def build_tar(
    members: "list[tuple[str, bytes]]",
    mtime: int = 0,
    gzip_whole: bool = False,
) -> bytes:
    """Deterministic ustar writer: fixed mode/uid/gid, caller-pinned
    mtime, two-zero-block terminator; optional whole-file gzip with a
    zeroed gzip MTIME field so equal inputs give equal bytes."""
    out = bytearray()
    for name, payload in members:
        out += _tar_header(name, len(payload), mtime)
        out += payload
        pad = -len(payload) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    if gzip_whole:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(bytes(out)) + co.flush()
    return bytes(out)


def _read_octal(field: bytes) -> int:
    text = field.split(b"\x00", 1)[0].strip(b" \x00")
    if not text:
        return 0
    return int(text, 8)


def iter_tar_members(raw: bytes):
    """Yield ``{"name", "size", "mtime", "typeflag", "checksum_ok",
    "payload"}`` per member. Accepts plain tar or whole-file gzip
    (sniffed). Tolerant: a block that is not a valid ustar header
    (bad magic, non-octal size, failed checksum arithmetic) or a
    truncated payload ends the walk with whatever already parsed."""
    try:
        if raw[:2] == b"\x1f\x8b":
            raw = zlib.decompress(raw, 47)
        pos = 0
        while pos + _BLOCK <= len(raw):
            hdr = raw[pos : pos + _BLOCK]
            if hdr == b"\x00" * _BLOCK:
                return  # end-of-archive marker
            if hdr[257:263] not in _USTAR_MAGICS:
                return
            try:
                size = _read_octal(hdr[124:136])
                mtime = _read_octal(hdr[136:148])
                declared = _read_octal(hdr[148:156])
            except ValueError:
                return
            blanked = hdr[:148] + b" " * 8 + hdr[156:]
            name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
            prefix = hdr[345:500].split(b"\x00", 1)[0].decode("utf-8", "replace")
            if prefix:
                name = prefix + "/" + name
            body_start = pos + _BLOCK
            if body_start + size > len(raw):
                return  # truncated member
            yield {
                "name": name,
                "size": size,
                "mtime": mtime,
                "typeflag": hdr[156:157].decode("latin-1"),
                "checksum_ok": sum(blanked) == declared,
                "payload": raw[body_start : body_start + size],
            }
            pos = body_start + size + (-size % _BLOCK)
    except Exception:
        return


def parse_tar(raw: bytes) -> dict:
    """File-level tar metadata: member count, total payload bytes,
    whether every header checksum verified, gzip flag."""
    gzipped = raw[:2] == b"\x1f\x8b"
    n = 0
    total = 0
    all_ok = True
    for m in iter_tar_members(raw):
        n += 1
        total += m["size"]
        all_ok = all_ok and m["checksum_ok"]
    return {
        "format": "tar",
        "n_members": n,
        "total_bytes": total,
        "checksums_ok": all_ok,
        "gzipped": gzipped,
    }


# ---------------------------------------------------------------- zip

_ZIP_LOCAL = b"PK\x03\x04"
_ZIP_CENTRAL = b"PK\x01\x02"
_ZIP_EOCD = b"PK\x05\x06"
# DOS date/time for 1980-01-01 00:00:00 — the epoch of the format,
# pinned so equal inputs build equal archives.
_DOS_TIME = 0
_DOS_DATE = 0x21


def build_zip(members: "list[tuple[str, bytes]]", deflate: bool = True) -> bytes:
    """Deterministic zip writer: fixed DOS timestamps, no extra
    fields/comments, method 8 (raw deflate, level 6) when ``deflate``
    else method 0 (stored)."""
    locals_out = bytearray()
    entries = []
    for name, payload in members:
        nbytes = name.encode("utf-8")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        if deflate:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = co.compress(payload) + co.flush()
            method = 8
        else:
            data, method = payload, 0
        entries.append((nbytes, method, crc, len(data), len(payload), len(locals_out)))
        locals_out += _ZIP_LOCAL + struct.pack(
            "<HHHHHIIIHH",
            20, 0, method, _DOS_TIME, _DOS_DATE,
            crc, len(data), len(payload), len(nbytes), 0,
        ) + nbytes + data
    cd_start = len(locals_out)
    central = bytearray()
    for nbytes, method, crc, data_len, usize, off in entries:
        central += _ZIP_CENTRAL + struct.pack(
            "<HHHHHHIIIHHHHHII",
            20, 20, 0, method, _DOS_TIME, _DOS_DATE,
            crc, data_len, usize,
            len(nbytes), 0, 0, 0, 0, 0, off,
        ) + nbytes
    eocd = _ZIP_EOCD + struct.pack(
        "<HHHHIIH",
        0, 0, len(members), len(members), len(central), cd_start, 0,
    )
    return bytes(locals_out) + bytes(central) + eocd


def iter_zip_members(raw: bytes):
    """Yield ``{"name", "method", "size", "compressed_size", "crc_ok",
    "payload"}`` per central-directory entry. Locates the EOCD by
    scanning back from EOF (max comment 64 KiB per spec), walks the
    central directory, and reads each payload via its local header
    (honoring the LOCAL name/extra lengths, which may differ from the
    central ones). Tolerant: bad signatures, offsets past EOF, or an
    inflate error end the walk / degrade that member (``crc_ok``
    False, empty payload) instead of raising."""
    try:
        tail_start = max(0, len(raw) - 65557)
        eocd_pos = raw.rfind(_ZIP_EOCD, tail_start)
        if eocd_pos < 0 or eocd_pos + 22 > len(raw):
            return
        (_, _, _, n_total, cd_size, cd_off, _) = struct.unpack(
            "<HHHHIIH", raw[eocd_pos + 4 : eocd_pos + 22]
        )
        pos = cd_off
        for _ in range(n_total):
            if raw[pos : pos + 4] != _ZIP_CENTRAL or pos + 46 > len(raw):
                return
            (
                _ver_made, _ver_need, _flags, method, _t, _d,
                crc, csize, usize, nlen, xlen, clen,
                _disk, _iattr, _eattr, local_off,
            ) = struct.unpack("<HHHHHHIIIHHHHHII", raw[pos + 4 : pos + 46])
            name = raw[pos + 46 : pos + 46 + nlen].decode("utf-8", "replace")
            pos += 46 + nlen + xlen + clen
            payload = b""
            if (
                raw[local_off : local_off + 4] == _ZIP_LOCAL
                and local_off + 30 <= len(raw)
            ):
                lnlen, lxlen = struct.unpack(
                    "<HH", raw[local_off + 26 : local_off + 30]
                )
                data_start = local_off + 30 + lnlen + lxlen
                data = raw[data_start : data_start + csize]
                if len(data) == csize:
                    if method == 0:
                        payload = data
                    elif method == 8:
                        try:
                            payload = zlib.decompress(data, -15)
                        except zlib.error:
                            payload = b""
            yield {
                "name": name,
                "method": method,
                "size": usize,
                "compressed_size": csize,
                "crc_ok": bool(payload or usize == 0)
                and (zlib.crc32(payload) & 0xFFFFFFFF) == crc
                and len(payload) == usize,
                "payload": payload,
            }
    except Exception:
        return


def parse_zip(raw: bytes) -> dict:
    """File-level zip metadata: member count, stored/deflated split,
    total uncompressed bytes, whether every CRC verified."""
    n = stored = deflated = 0
    total = 0
    all_ok = True
    for m in iter_zip_members(raw):
        n += 1
        total += m["size"]
        stored += m["method"] == 0
        deflated += m["method"] == 8
        all_ok = all_ok and m["crc_ok"]
    return {
        "format": "zip",
        "n_members": n,
        "stored": stored,
        "deflated": deflated,
        "total_bytes": total,
        "crcs_ok": all_ok,
    }


# --------------------------------------------------------- webdataset


def wds_key_ext(name: str) -> "tuple[str, str]":
    """WebDataset naming rule: strip directories, key = basename up to
    the FIRST dot, extension = everything after it ('' if none)."""
    base = name.rsplit("/", 1)[-1]
    key, dot, ext = base.partition(".")
    return key, ext if dot else ""


def iter_wds_samples(raw: bytes):
    """Group a tar shard's members into WebDataset samples: one
    ``(key, {ext: payload})`` per run of ADJACENT members sharing a
    key — the library's own contract, which makes grouping a single
    ordered pass (no sort, no shuffle). A key that re-appears after an
    intervening key starts a NEW sample, exactly as webdataset's
    streaming reader behaves."""
    cur_key = None
    parts: dict[str, bytes] = {}
    for m in iter_tar_members(raw):
        if m["typeflag"] not in ("0", "\x00"):
            continue  # directories / links are not sample parts
        key, ext = wds_key_ext(m["name"])
        if key != cur_key:
            if cur_key is not None:
                yield cur_key, parts
            cur_key, parts = key, {}
        parts[ext] = m["payload"]
    if cur_key is not None:
        yield cur_key, parts


# ------------------------------------------------------ spark entries


def tar_member_rows(df, col: str = "data", id_col: str = "doc_id"):
    """Explode one-tar-per-row ``df`` into member rows: Arrow-batched
    ``mapInPandas``, single scan stage, no exchange — shard files are
    row-partitioned so added executors divide ingestion directly.
    Payload bytes are intentionally NOT carried (member name/size/
    integrity only); use :func:`wds_sample_rows` when payloads feed a
    downstream decode so bytes live exactly one stage."""

    def explode(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[col]):
                for m in iter_tar_members(bytes(blob)):
                    rows.append(
                        {
                            id_col: rid,
                            "member_name": m["name"],
                            "member_size": m["size"],
                            "mtime": m["mtime"],
                            "checksum_ok": m["checksum_ok"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "member_name", "member_size", "mtime", "checksum_ok"],
            )

    return df.mapInPandas(
        explode,
        f"{id_col} long, member_name string, member_size long, "
        "mtime long, checksum_ok boolean",
    )


def zip_member_rows(df, col: str = "data", id_col: str = "doc_id"):
    """Explode one-zip-per-row ``df`` into member rows (name, method,
    sizes, CRC verdict) — same single-scan shape as
    :func:`tar_member_rows`."""

    def explode(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[col]):
                for m in iter_zip_members(bytes(blob)):
                    rows.append(
                        {
                            id_col: rid,
                            "member_name": m["name"],
                            "method": m["method"],
                            "member_size": m["size"],
                            "compressed_size": m["compressed_size"],
                            "crc_ok": m["crc_ok"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "member_name", "method", "member_size",
                    "compressed_size", "crc_ok",
                ],
            )

    return df.mapInPandas(
        explode,
        f"{id_col} long, member_name string, method int, member_size long, "
        "compressed_size long, crc_ok boolean",
    )


def wds_sample_rows(
    df,
    col: str = "data",
    id_col: str = "doc_id",
    payload_ext: "str | None" = None,
):
    """Explode one-tar-shard-per-row ``df`` into WebDataset sample
    rows: (sample_key, sorted extension list, part count, total bytes,
    the decoded ``.txt`` part when present). ``payload_ext`` adds a
    ``payload`` binary column carrying that extension's raw bytes —
    the seam that composes shard ingestion with the media decoders
    (``extract_archive`` → ``decode_media`` in the YAML surface), so
    image/audio parts flow decode-ready without a second shard pass.
    Single-scan like the member explodes; the adjacency grouping needs
    no shuffle."""

    def explode(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[col]):
                for key, parts in iter_wds_samples(bytes(blob)):
                    txt = parts.get("txt")
                    row = {
                        id_col: rid,
                        "sample_key": key,
                        "n_parts": len(parts),
                        "exts": ",".join(sorted(parts)),
                        "total_bytes": sum(len(p) for p in parts.values()),
                        "text": (
                            txt.decode("utf-8", "replace")
                            if txt is not None
                            else None
                        ),
                    }
                    if payload_ext is not None:
                        row["payload"] = parts.get(payload_ext)
                    rows.append(row)
            cols = [id_col, "sample_key", "n_parts", "exts", "total_bytes", "text"]
            if payload_ext is not None:
                cols.append("payload")
            yield pd.DataFrame(rows, columns=cols)

    schema = (
        f"{id_col} long, sample_key string, n_parts int, exts string, "
        "total_bytes long, text string"
    )
    if payload_ext is not None:
        schema += ", payload binary"
    return df.mapInPandas(explode, schema)
