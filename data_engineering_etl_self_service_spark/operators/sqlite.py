"""Read-only SQLite file parsing — application databases (.db/.sqlite
dumps) are a classic data-engineering arrival format, and the on-disk
layout is a public, stable spec (sqlite.org/fileformat2.html). This is
a hand-rolled page walker — header, sqlite_master, table b-trees,
record serial types, payload overflow chains — with the stdlib
``sqlite3`` module as the REAL writer on the other side of every test
(the audioop/nfc_normalize two-implementation interop discipline).

Scope (documented): table b-trees only (full scans — exactly what an
ingestion pipeline does), serial types NULL / 1-6-byte ints / float /
0-1 constants / text / blob, single-file databases (no WAL/journal
recovery). UTF-8 text encoding (header enc 1).

Malformed bytes degrade: a bad magic/page returns no rows; a corrupt
cell ends that page's walk — never raises (dirty-corpus property).

Scale: one database file per row, Arrow-batched per-row parse,
shuffle-free and linear; databases are independent rows like every
other container here.
"""

from __future__ import annotations

import struct

MAGIC = b"SQLite format 3\x00"


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    """SQLite varint: big-endian 7-bit groups, 9th byte uses all 8."""
    result = 0
    for i in range(8):
        b = buf[pos + i]
        result = (result << 7) | (b & 0x7F)
        if not b & 0x80:
            return result, pos + i + 1
    result = (result << 8) | buf[pos + 8]
    return result, pos + 9


def _serial_size(t: int) -> int:
    if t <= 4:
        return t  # NULL=0, ints 1-4 bytes
    if t in (5, 6):
        return {5: 6, 6: 8}[t]
    if t == 7:
        return 8
    if t in (8, 9):
        return 0
    return (t - 12) // 2  # blob (even) / text (odd)


def _decode_value(t: int, body: bytes, pos: int):
    n = _serial_size(t)
    raw = body[pos : pos + n]
    if t == 0:
        return None, pos
    if 1 <= t <= 6:
        return int.from_bytes(raw, "big", signed=True), pos + n
    if t == 7:
        return struct.unpack(">d", raw)[0], pos + n
    if t == 8:
        return 0, pos
    if t == 9:
        return 1, pos
    if t >= 12 and t % 2 == 0:
        return bytes(raw), pos + n
    return raw.decode("utf-8", "replace"), pos + n


def _decode_record(payload: bytes) -> list:
    hdr_len, pos = _varint(payload, 0)
    types = []
    while pos < hdr_len:
        t, pos = _varint(payload, pos)
        types.append(t)
    values = []
    pos = hdr_len
    for t in types:
        v, pos = _decode_value(t, payload, pos)
        values.append(v)
    return values


class _Db:
    def __init__(self, raw: bytes):
        self.raw = raw
        self.page_size = struct.unpack(">H", raw[16:18])[0]
        if self.page_size == 1:
            self.page_size = 65536
        self.usable = self.page_size - raw[20]  # minus reserved bytes

    def page(self, num: int) -> bytes:
        off = (num - 1) * self.page_size
        return self.raw[off : off + self.page_size]

    def _payload(self, page: bytes, pos: int, total: int, local_max: int,
                 local_min: int) -> tuple[bytes, int]:
        """Cell payload with overflow-chain reassembly (spec 1.6)."""
        if total <= local_max:
            return page[pos : pos + total], pos + total
        # K = min-local + (total - min-local) % (usable - 4); local part
        # is K if K <= max else min-local
        k = local_min + (total - local_min) % (self.usable - 4)
        local = k if k <= local_max else local_min
        out = bytearray(page[pos : pos + local])
        pos += local
        (nxt,) = struct.unpack(">I", page[pos : pos + 4])
        pos += 4
        while nxt and len(out) < total:
            pg = self.page(nxt)
            (nxt,) = struct.unpack(">I", pg[:4])
            out += pg[4 : self.usable]
        return bytes(out[:total]), pos

    def table_rows(self, root: int):
        """Yield (rowid, values) from a table b-tree, in-order walk."""
        stack = [root]
        while stack:
            num = stack.pop()
            try:
                page = self.page(num)
                hdr_off = 100 if num == 1 else 0
                ptype = page[hdr_off]
                ncells = struct.unpack(
                    ">H", page[hdr_off + 3 : hdr_off + 5]
                )[0]
                cp_start = hdr_off + (12 if ptype == 0x05 else 8)
                if ptype == 0x05:  # interior table page
                    kids = []
                    for i in range(ncells):
                        (cp,) = struct.unpack(
                            ">H", page[cp_start + 2 * i : cp_start + 2 * i + 2]
                        )
                        (child,) = struct.unpack(">I", page[cp : cp + 4])
                        kids.append(child)
                    (right,) = struct.unpack(
                        ">I", page[hdr_off + 8 : hdr_off + 12]
                    )
                    kids.append(right)
                    stack.extend(reversed(kids))
                elif ptype == 0x0D:  # leaf table page
                    local_max = self.usable - 35
                    local_min = ((self.usable - 12) * 32) // 255 - 23
                    for i in range(ncells):
                        (cp,) = struct.unpack(
                            ">H", page[cp_start + 2 * i : cp_start + 2 * i + 2]
                        )
                        total, p = _varint(page, cp)
                        rowid, p = _varint(page, p)
                        if rowid >= 1 << 63:  # rowids are SIGNED 64-bit
                            rowid -= 1 << 64
                        payload, _ = self._payload(
                            page, p, total, local_max, local_min
                        )
                        yield rowid, _decode_record(payload)
            except (IndexError, struct.error, ValueError):
                continue  # corrupt page: keep walking the rest


def iter_sqlite_rows(raw: bytes, table: str):
    """Yield ``(rowid, values)`` for every row of ``table``.

    Walks page 1's sqlite_master to find the table's rootpage, then
    scans its b-tree. A NULL in a value list at the rowid-alias
    position (INTEGER PRIMARY KEY) means "use the rowid" per spec —
    callers see the raw record; :func:`sqlite_table_dicts` resolves it.
    """
    if raw[:16] != MAGIC or len(raw) < 100:
        return
    db = _Db(raw)
    for _rowid, rec in db.table_rows(1):
        # sqlite_master: (type, name, tbl_name, rootpage, sql)
        if len(rec) >= 5 and rec[0] == "table" and rec[1] == table:
            root = rec[3]
            if isinstance(root, int) and root > 0:
                yield from db.table_rows(root)
            return


def sqlite_table_dicts(raw: bytes, table: str, columns: "list[str]"):
    """Rows as dicts; resolves the INTEGER-PRIMARY-KEY rowid alias
    (a NULL first value takes the rowid, the common `id INTEGER
    PRIMARY KEY` layout)."""
    for rowid, rec in iter_sqlite_rows(raw, table):
        vals = list(rec[: len(columns)])
        vals += [None] * (len(columns) - len(vals))
        if vals and vals[0] is None:
            vals[0] = rowid
        yield dict(zip(columns, vals))
