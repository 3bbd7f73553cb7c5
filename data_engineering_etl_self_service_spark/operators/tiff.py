"""TIFF container metadata parser (public Adobe TIFF 6.0 layout) — the
scanned-document arrival format, completing the sniff table alongside
MP3/MP4/Ogg: what curation needs from TIFFs is page count, dimensions,
sample layout, compression, and timestamps — all of which live in the
IFD directory tree, not the strip bitstream (no strip decode by scope,
same line as operators/mp3.py).

- :func:`parse_tiff` — header (II/MM byte order + magic 42) + chained
  IFD walk (12-byte entries: tag/type/count/value-or-offset, inline
  values honored per byte order, SHORT/LONG/ASCII read, external
  BitsPerSample arrays followed); returns a typed dict or None for
  non-TIFF / corrupt framing. Tolerant: a malformed IFD ends the walk
  with whatever parsed (one dirty scan must not kill a task), and the
  chain is loop-guarded.
- :func:`build_tiff` — deterministic minimal-but-valid multi-page
  writer (gray or RGB strips, both byte orders, optional DateTime tag)
  so the parser is builder-exercised like jpeg/flac/mp4.
"""

from __future__ import annotations

import struct

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BPS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_DATETIME = 306


def build_tiff(
    width: int,
    height: int,
    n_pages: int = 1,
    samples_per_pixel: int = 1,
    big_endian: bool = False,
    date_time: "str | None" = None,
) -> bytes:
    """Deterministic uncompressed TIFF: ``n_pages`` identical-geometry
    pages, each one strip of (x+y)-patterned bytes, IFD entries in
    ascending tag order, IFDs chained via next-IFD offsets.
    ``samples_per_pixel`` 1 (gray) or 3 (RGB; BitsPerSample becomes an
    external 3-SHORT array — exercising offset-valued entries)."""
    e = ">" if big_endian else "<"
    strip = bytes(
        (x + y) & 0xFF
        for y in range(height)
        for x in range(width * samples_per_pixel)
    )
    photometric = 2 if samples_per_pixel == 3 else 1
    dt = (date_time.encode("ascii") + b"\x00") if date_time else b""

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # inline value left-justified in the 4-byte field per byte order
        if typ == 3 and count == 1:  # SHORT
            val = struct.pack(e + "H", value) + b"\x00\x00"
        else:  # LONG or offset
            val = struct.pack(e + "I", value)
        return struct.pack(e + "HHI", tag, typ, count) + val

    out = bytearray()
    out += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
    out += struct.pack(e + "I", 0)  # IFD0 offset backpatched below
    prev_link = 4  # position of the 4-byte pointer to the next IFD
    for _ in range(n_pages):
        strip_off = len(out)
        out += strip
        bps_off = 0
        if samples_per_pixel == 3:
            bps_off = len(out)
            out += struct.pack(e + "HHH", 8, 8, 8)
        dt_off = 0
        if dt:
            dt_off = len(out)
            out += dt
        ifd_off = len(out)
        entries = [
            entry(_TAG_WIDTH, 4, 1, width),
            entry(_TAG_HEIGHT, 4, 1, height),
            (
                entry(_TAG_BPS, 3, 3, bps_off)
                if samples_per_pixel == 3
                else entry(_TAG_BPS, 3, 1, 8)
            ),
            entry(_TAG_COMPRESSION, 3, 1, 1),
            entry(_TAG_PHOTOMETRIC, 3, 1, photometric),
            entry(_TAG_STRIP_OFFSETS, 4, 1, strip_off),
            entry(_TAG_SPP, 3, 1, samples_per_pixel),
            entry(_TAG_ROWS_PER_STRIP, 4, 1, height),
            entry(_TAG_STRIP_COUNTS, 4, 1, len(strip)),
        ]
        if dt:
            entries.append(entry(_TAG_DATETIME, 2, len(dt), dt_off))
        struct.pack_into(e + "I", out, prev_link, ifd_off)
        out += struct.pack(e + "H", len(entries))
        for en in entries:
            out += en
        prev_link = len(out)
        out += struct.pack(e + "I", 0)  # next-IFD (0 = last)
    return bytes(out)


def parse_tiff(raw: bytes):
    """Typed TIFF metadata → dict or None (not a TIFF).

    Keys: byte_order ('II'/'MM'), n_pages, width, height,
    bits_per_sample, samples_per_pixel, compression, photometric,
    strip_bytes (total declared strip bytes across pages), date_time
    (first page's, or None). First-page geometry is reported (the
    curation-relevant page); page COUNT covers the whole chain. Never
    raises on arbitrary bytes."""
    try:
        if raw[:4] == b"II\x2a\x00":
            e = "<"
        elif raw[:4] == b"MM\x00\x2a":
            e = ">"
        else:
            return None
        (ifd_off,) = struct.unpack_from(e + "I", raw, 4)

        def read_entry(pos):
            tag, typ, count = struct.unpack_from(e + "HHI", raw, pos)
            if typ == 3:  # SHORT: inline when count*2 <= 4
                if count == 1:
                    (v,) = struct.unpack_from(e + "H", raw, pos + 8)
                    return tag, typ, count, v
                (off,) = struct.unpack_from(e + "I", raw, pos + 8)
                return tag, typ, count, off
            (v,) = struct.unpack_from(e + "I", raw, pos + 8)
            return tag, typ, count, v

        out = {
            "byte_order": "II" if e == "<" else "MM",
            "n_pages": 0,
            "width": None,
            "height": None,
            "bits_per_sample": None,
            "samples_per_pixel": None,
            "compression": None,
            "photometric": None,
            "strip_bytes": 0,
            "date_time": None,
        }
        seen = set()
        while ifd_off and ifd_off not in seen and ifd_off + 2 <= len(raw):
            seen.add(ifd_off)  # loop guard: cyclic chains terminate
            (n_entries,) = struct.unpack_from(e + "H", raw, ifd_off)
            pos = ifd_off + 2
            if pos + 12 * n_entries + 4 > len(raw):
                break  # truncated IFD: keep what parsed
            first = out["n_pages"] == 0
            for i in range(n_entries):
                tag, typ, count, v = read_entry(pos + 12 * i)
                if tag == _TAG_STRIP_COUNTS:
                    out["strip_bytes"] += v
                if not first:
                    continue
                if tag == _TAG_WIDTH:
                    out["width"] = v
                elif tag == _TAG_HEIGHT:
                    out["height"] = v
                elif tag == _TAG_BPS:
                    if count == 1:
                        out["bits_per_sample"] = v
                    elif v + 2 <= len(raw):
                        (bps0,) = struct.unpack_from(e + "H", raw, v)
                        out["bits_per_sample"] = bps0
                elif tag == _TAG_SPP:
                    out["samples_per_pixel"] = v
                elif tag == _TAG_COMPRESSION:
                    out["compression"] = v
                elif tag == _TAG_PHOTOMETRIC:
                    out["photometric"] = v
                elif tag == _TAG_DATETIME and v + count <= len(raw):
                    out["date_time"] = (
                        raw[v : v + count].split(b"\x00")[0].decode(
                            "ascii", "replace"
                        )
                        or None
                    )
            out["n_pages"] += 1
            (ifd_off,) = struct.unpack_from(
                e + "I", raw, pos + 12 * n_entries
            )
        if out["n_pages"] == 0:
            return None
        return out
    except Exception:
        return None
