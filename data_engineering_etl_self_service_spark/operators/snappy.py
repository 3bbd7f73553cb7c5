"""Pure-Python raw Snappy block codec — the public format description
(google/snappy format_description.txt), round 8.

Completes the dependency-free codec set: with it, every Avro OCF codec
(null/deflate/snappy/zstd) reads AND writes with no optional package
(``sources/avro_ocf.py`` falls back here when pyarrow is absent). Raw
snappy is the BLOCK format the Avro spec embeds (plus its big-endian
CRC32 suffix, handled by the caller) — not the framed variant.

Format implemented in full for decode:

- preamble: uncompressed length as a little-endian base-128 varint;
- elements tagged by the low 2 bits of a tag byte:
  ``00`` literal (6-bit length-1, values 60-63 escape to 1-4
  little-endian extra length bytes), ``01`` copy with 1-byte offset
  (3-bit length-4, 3-bit offset high + 1 byte), ``10`` copy with
  2-byte little-endian offset, ``11`` copy with 4-byte offset;
- copies may overlap (offset < length) — byte-at-a-time back-reference
  semantics, same as LZ4/zstd matches.

The compressor is the same greedy 4-byte-prefix hash matcher as
``lz4.lz4_block_compress``: literals + type-``10`` copies (64 KiB
window, matches chunked to the tag's 64-byte maximum). Parity with
pyarrow's libsnappy both directions plus fuzz lives in
tests/test_zstd.py. Like every pure codec here, this is the
no-dependency fallback tier — native snappy remains the bulk hot path.
"""

from __future__ import annotations


def snappy_decompress(raw: bytes) -> bytes:
    """Inflate one raw snappy block. Malformed input raises
    ``ValueError`` (untrusted-bytes contract)."""
    n = 0
    shift = 0
    pos = 0
    while True:
        if pos >= len(raw):
            raise ValueError("snappy: truncated length preamble")
        b = raw[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")
    out = bytearray()
    while pos < len(raw):
        if len(out) > n:
            # incremental: the declared length is the output budget —
            # never materialize past it before the final equality check
            # (review r8b: copy tags emit up to 21x their input)
            raise ValueError("snappy: output exceeds declared length")
        tag = raw[pos]
        pos += 1
        ttype = tag & 3
        if ttype == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > len(raw):
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(raw[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > len(raw):
                raise ValueError("snappy: truncated literal")
            out += raw[pos : pos + ln]
            pos += ln
            continue
        if ttype == 1:  # copy, 1-byte offset
            ln = 4 + ((tag >> 2) & 7)
            if pos >= len(raw):
                raise ValueError("snappy: truncated copy offset")
            off = ((tag >> 5) << 8) | raw[pos]
            pos += 1
        elif ttype == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > len(raw):
                raise ValueError("snappy: truncated copy offset")
            off = int.from_bytes(raw[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > len(raw):
                raise ValueError("snappy: truncated copy offset")
            off = int.from_bytes(raw[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        for _ in range(ln):  # overlapping copies are the point
            out.append(out[-off])
    if len(out) != n:
        raise ValueError("snappy: decompressed size mismatch")
    return bytes(out)


def _emit_literal(out: bytearray, lits: bytes) -> None:
    ln = len(lits)
    if ln == 0:
        return
    rem = ln - 1
    if rem < 60:
        out.append(rem << 2)
    elif rem < 1 << 8:
        out.append(60 << 2)
        out.append(rem)
    elif rem < 1 << 16:
        out.append(61 << 2)
        out += rem.to_bytes(2, "little")
    elif rem < 1 << 24:
        out.append(62 << 2)
        out += rem.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += rem.to_bytes(4, "little")
    out += lits


def _emit_copy(out: bytearray, off: int, ln: int) -> None:
    # type-10 copies: length 1-64, 2-byte offset; long matches chunk
    while ln > 64:
        out.append(((64 - 1) << 2) | 2)
        out += off.to_bytes(2, "little")
        ln -= 64
    # avoid a trailing sub-4 remainder the next chunk can't express
    # efficiently — valid either way, but keep chunks >= 4 when we can
    if ln:
        out.append(((ln - 1) << 2) | 2)
        out += off.to_bytes(2, "little")


def snappy_compress(src: bytes) -> bytes:
    """Compress ``src`` into one raw snappy block (greedy 4-byte-prefix
    matcher; literals + 2-byte-offset copies, 64 KiB window). Always
    valid output; never exceeds input + length preamble + literal
    headers."""
    out = bytearray()
    n = len(src)
    v = n
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | 0x80 if v else b)
        if not v:
            break
    from .lzmatch import greedy_matches

    matches, anchor = greedy_matches(src, 0xFFFF, n - 4, n)
    for a, p, off, ml in matches:
        _emit_literal(out, src[a:p])
        _emit_copy(out, off, ml)
    _emit_literal(out, src[anchor:])
    return bytes(out)
