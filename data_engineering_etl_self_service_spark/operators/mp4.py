"""MP4 / ISO Base Media File Format box-structure metadata parser
(public ISO/IEC 14496-12 layout). NO codec decode — like
operators/mp3.py, what curation needs from video containers is
metadata: brand, duration, track count, video dimensions, per-track
media types — all of which live in the box tree, not the bitstream.

Closes the "mp4 container opaque" line in the multimodal sniff table:
MP4 payloads now yield typed rows instead of kind-only.

- :func:`parse_mp4` walks the top-level box sequence (size+fourcc
  framing, 64-bit largesize and to-end-of-file sizes supported),
  descends into ``moov`` for ``mvhd`` (version 0 AND 1: timescale +
  duration) and each ``trak``'s ``tkhd`` (dimensions, 16.16 fixed
  point) + ``mdia/hdlr`` (handler type: vide/soun/...); returns None
  for non-BMFF / corrupt framing.
- :func:`build_mp4` emits a deterministic minimal-but-valid box tree
  (ftyp + moov(mvhd, trak(tkhd, mdia(mdhd, hdlr))) + mdat) so the
  parser is testable without a muxer in the container — the same
  encoder-exercises-decoder strategy as jpeg/flac/mp3.
"""

from __future__ import annotations

import struct


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(
        fourcc, bytes([version]) + flags.to_bytes(3, "big") + body
    )


def build_mp4(
    brand: bytes = b"isom",
    timescale: int = 1000,
    duration: int = 5000,
    tracks=((b"vide", 640, 360), (b"soun", 0, 0)),
    mdat_size: int = 64,
    mvhd_version: int = 0,
) -> bytes:
    """Deterministic minimal MP4: ftyp + moov(mvhd + one trak per
    (handler, width, height)) + an mdat of ``mdat_size`` zero bytes.
    ``mvhd_version`` 1 uses the 64-bit timestamp layout."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    if mvhd_version == 0:
        mvhd = _full(
            b"mvhd", 0, 0,
            struct.pack(">IIII", 0, 0, timescale, duration)
            + b"\x00" * 80,
        )
    else:
        mvhd = _full(
            b"mvhd", 1, 0,
            struct.pack(">QQIQ", 0, 0, timescale, duration)
            + b"\x00" * 80,
        )
    traks = b""
    for tid, (handler, w, h) in enumerate(tracks, start=1):
        # version-0 tkhd body is exactly 80 bytes (ISO 14496-12 8.3.2):
        # creation/modification/track_ID/reserved (16) + duration(4) +
        # reserved(8) + layer/alternate_group/volume/reserved(8) +
        # matrix(36) + width/height(8)
        tkhd = _full(
            b"tkhd", 0, 7,
            struct.pack(">IIII", 0, 0, tid, 0)
            + b"\x00" * 56
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _full(
            b"mdhd", 0, 0,
            struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
        )
        hdlr = _full(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + handler + b"\x00" * 12 + b"\x00",
        )
        mdia = _box(b"mdia", mdhd + hdlr)
        traks += _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(b"mdat", b"\x00" * mdat_size)
    return ftyp + moov + mdat


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in a range."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # to end of enclosing range
            size = end - pos
        if size < 8 or pos + size > end:
            return  # corrupt framing: stop (complete prefix only)
        yield fourcc, body, pos + size
        pos += size


def parse_mp4(raw: bytes):
    """MP4 metadata → dict or None (not BMFF / corrupt before moov).

    Keys: brand, timescale, duration_units, duration_ms, n_tracks,
    video_width, video_height (first video track, None if no video),
    handlers (sorted ':'-joined handler fourccs), n_boxes (top-level).

    Never raises on arbitrary bytes (mapInPandas safety — an escaped
    exception on one malformed file would kill the whole task).
    """
    try:
        return _parse_mp4(raw)
    except (struct.error, IndexError, ValueError, OverflowError,
            UnicodeDecodeError):
        return None


def _parse_mp4(raw: bytes):
    raw = bytes(raw)
    if len(raw) < 12 or raw[4:8] != b"ftyp":
        return None
    brand = raw[8:12].decode("latin-1")
    out = {
        "brand": brand,
        "timescale": None,
        "duration_units": None,
        "duration_ms": None,
        "n_tracks": 0,
        "video_width": None,
        "video_height": None,
        "handlers": "",
        "n_boxes": 0,
    }
    handlers = []
    for fourcc, body, boxend in _walk(raw, 0, len(raw)):
        out["n_boxes"] += 1
        if fourcc != b"moov":
            continue
        for f2, b2, e2 in _walk(raw, body, boxend):
            if f2 == b"mvhd":
                ver = raw[b2]
                if ver == 0:
                    _, _, ts, dur = struct.unpack_from(
                        ">IIII", raw, b2 + 4
                    )
                elif ver == 1:
                    _, _, ts, dur = struct.unpack_from(
                        ">QQIQ", raw, b2 + 4
                    )
                else:
                    return None
                out["timescale"] = ts
                out["duration_units"] = dur
                if ts:
                    out["duration_ms"] = dur * 1000 // ts
            elif f2 == b"trak":
                out["n_tracks"] += 1
                width = height = None
                handler = None
                for f3, b3, e3 in _walk(raw, b2, e2):
                    if f3 == b"tkhd":
                        ver = raw[b3]
                        off = e3 - 8  # width/height: last 8 bytes
                        wfx, hfx = struct.unpack_from(">II", raw, off)
                        width, height = wfx >> 16, hfx >> 16
                    elif f3 == b"mdia":
                        for f4, b4, _e4 in _walk(raw, b3, e3):
                            if f4 == b"hdlr":
                                handler = raw[b4 + 8 : b4 + 12].decode(
                                    "latin-1"
                                )
                if handler:
                    handlers.append(handler)
                if (
                    handler == "vide"
                    and out["video_width"] is None
                    and width
                ):
                    out["video_width"] = width
                    out["video_height"] = height
    if out["timescale"] is None:
        return None  # no moov/mvhd reached — treat as opaque
    out["handlers"] = ":".join(sorted(handlers))
    return out
