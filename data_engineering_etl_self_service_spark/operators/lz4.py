"""Pure-Python LZ4 frame decoder — the public LZ4 Frame Format spec.

Companion to ``operators/zstd.py``: with it, every codec in
``sniff_decompress``'s magic table inflates without ANY optional
dependency (gzip/bzip2/xz are stdlib; zstd and lz4 decode natively
via pyarrow when it is importable — the ~300×-faster bulk default,
see SCALE.md — with these pure decoders as the no-pyarrow fallback
and the independent parity implementation).

Implements:

- **Frames**: magic 0x184D2204, FLG/BD descriptor with header checksum
  (``XXH32(descriptor) >> 8`` — VERIFIED), optional Content_Size
  (verified against the decoded length), optional per-block checksums
  (XXH32 of the stored block — verified), optional content checksum
  (XXH32 of the decoded frame — verified), block-independence flag
  honored (linked blocks may match into previous blocks' output),
  skippable frames, multi-frame concatenation. Dictionary-ID frames
  are rejected loudly.
- **Blocks**: uncompressed (high bit of the size word) and LZ4 block
  format: token nibbles, 255-run length extensions, 2-byte
  little-endian offsets, overlapping match copies, the end-of-block
  literal-only sequence rules.

Checksums use ``operators/xxhash.py`` (pinned to the published XXH
sanity vectors). Parity with pyarrow's liblz4 compressor plus
structural-corruption fuzz live in tests/test_zstd.py.
"""

from __future__ import annotations

import struct

from .xxhash import xxh32

LZ4_MAGIC = 0x184D2204
SKIPPABLE_LO = 0x184D2A50
SKIPPABLE_HI = 0x184D2A5F


def _decode_block(src: bytes, out: bytearray, window_start: int) -> None:
    """LZ4 block format → append to ``out``; matches may reach back to
    ``window_start`` (frame start for independent blocks, earlier for
    linked ones)."""
    pos, n = 0, len(src)
    while True:
        if pos >= n:
            raise ValueError("lz4: truncated block (missing token)")
        token = src[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = src[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("lz4: truncated literals")
        out += src[pos : pos + lit_len]
        pos += lit_len
        if pos == n:
            return  # last sequence is literals-only per spec
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = src[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        if offset > len(out) - window_start:
            raise ValueError("lz4: match offset beyond window")
        for _ in range(match_len):
            out.append(out[-offset])


def lz4_decompress(raw: bytes) -> bytes:
    """Decode one-or-more concatenated LZ4 frames → original bytes.
    Raises ``ValueError`` on anything structurally invalid, any failed
    checksum, or dictionary frames."""
    try:
        return _decompress(raw)
    except (IndexError, struct.error) as ex:
        # truncation surfaces as indexing or short-unpack errors deep
        # in header fields — normalize to the documented ValueError
        raise ValueError("lz4: truncated input") from ex


def _decompress(raw: bytes) -> bytes:
    if not raw:
        raise ValueError("lz4: empty input")
    pos = 0
    out = bytearray()
    while pos < len(raw):
        if pos + 4 > len(raw):
            raise ValueError("lz4: truncated magic")
        magic = struct.unpack_from("<I", raw, pos)[0]
        pos += 4
        if SKIPPABLE_LO <= magic <= SKIPPABLE_HI:
            if pos + 4 > len(raw):
                raise ValueError("lz4: truncated skippable frame")
            pos += 4 + struct.unpack_from("<I", raw, pos)[0]
            if pos > len(raw):  # declared size runs past end-of-input
                raise ValueError("lz4: truncated skippable frame")
            continue
        if magic != LZ4_MAGIC:
            raise ValueError("lz4: bad magic")
        desc_start = pos
        flg = raw[pos]
        bd = raw[pos + 1]
        pos += 2
        if (flg >> 6) != 0b01:
            raise ValueError("lz4: unsupported frame version")
        if flg & 0x02:
            raise ValueError("lz4: reserved FLG bit set")
        if bd & 0x8F:
            raise ValueError("lz4: reserved BD bits set")
        block_indep = bool(flg & 0x20)
        block_checksum = bool(flg & 0x10)
        has_content_size = bool(flg & 0x08)
        content_checksum = bool(flg & 0x04)
        if flg & 0x01:
            raise ValueError("lz4: dictionary frames unsupported")
        content_size = None
        if has_content_size:
            content_size = struct.unpack_from("<Q", raw, pos)[0]
            pos += 8
        hc = raw[pos]
        pos += 1
        if ((xxh32(raw[desc_start:pos - 1]) >> 8) & 0xFF) != hc:
            raise ValueError("lz4: header checksum mismatch")
        frame_start = len(out)
        while True:
            if pos + 4 > len(raw):
                raise ValueError("lz4: truncated block size")
            word = struct.unpack_from("<I", raw, pos)[0]
            pos += 4
            if word == 0:
                break  # EndMark
            uncompressed = bool(word & 0x80000000)
            size = word & 0x7FFFFFFF
            block = raw[pos : pos + size]
            if len(block) != size:
                raise ValueError("lz4: truncated block")
            pos += size
            if block_checksum:
                want = struct.unpack_from("<I", raw, pos)[0]
                pos += 4
                if xxh32(block) != want:
                    raise ValueError("lz4: block checksum mismatch")
            window = len(out) if block_indep else frame_start
            if uncompressed:
                out += block
            else:
                _decode_block(block, out, window)
        if content_checksum:
            if pos + 4 > len(raw):
                raise ValueError("lz4: truncated content checksum")
            want = struct.unpack_from("<I", raw, pos)[0]
            pos += 4
            if xxh32(bytes(out[frame_start:])) != want:
                raise ValueError("lz4: content checksum mismatch")
        if content_size is not None and len(out) - frame_start != content_size:
            raise ValueError("lz4: content size mismatch")
    return bytes(out)


def _emit_seq(
    out: bytearray, lits: bytes, offset: int | None, mlen: int
) -> None:
    """One LZ4 sequence: token, literal-length extension, literals,
    then (unless this is the literals-only final sequence) the 2-byte
    little-endian offset and match-length extension."""
    ll = len(lits)
    ml_code = 0 if offset is None else mlen - 4
    token_l = 15 if ll >= 15 else ll
    token_m = 0 if offset is None else (15 if ml_code >= 15 else ml_code)
    out.append((token_l << 4) | token_m)
    if ll >= 15:
        rem = ll - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += lits
    if offset is None:
        return
    out += struct.pack("<H", offset)
    if ml_code >= 15:
        rem = ml_code - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)


def lz4_block_compress(src: bytes) -> bytes:
    """REAL LZ4 block compression (round 8): greedy hash-table match
    finder over 4-byte prefixes — the reference algorithm's fast path,
    from the public block-format spec. Honors the spec's end rules
    (matches start >= 12 bytes before block end, the last 5 bytes are
    literals, blocks under 13 bytes are all-literal), so output decodes
    with any conforming decoder. Greedy per-position probing; the
    native codec remains the hot path — this is the no-pyarrow WRITE
    tier (the read side's mirror)."""
    from .lzmatch import greedy_matches

    n = len(src)
    out = bytearray()
    if n < 13:
        _emit_seq(out, src, None, 0)
        return bytes(out)
    # shared matcher with lz4's spec end rules: matches START >= 12
    # bytes before block end and never cover the final 5 literals
    matches, anchor = greedy_matches(src, 0xFFFF, n - 12, n - 5)
    for a, p, off, ml in matches:
        _emit_seq(out, src[a:p], off, ml)
    _emit_seq(out, src[anchor:], None, 0)
    return bytes(out)


def lz4_compress(data: bytes, block_size: int = 1 << 18) -> bytes:
    """Full lz4 frame writer with REAL compressed blocks: independent
    blocks (window resets per block, matching the descriptor flag),
    per-block checksums, content size + content checksum — readable by
    liblz4 and by :func:`lz4_decompress` (both pinned in tests). A
    block whose compressed form doesn't shrink is stored raw (the
    spec's high-bit escape), so output never exceeds
    input + framing."""
    if not 0 < block_size <= 4 << 20:
        # upper bound: the descriptor declares the 4 MiB bin — bigger
        # blocks emit frames liblz4 rejects (review r8, repro'd);
        # lower bound: block_size 0 looped forever (review r8b)
        raise ValueError("lz4: block_size must be in (0, 4 MiB]")
    flg = 0b01100000 | 0x10 | 0x08 | 0x04  # indep + bsum + csize + csum
    bd = 0x70  # 4 MiB max-block-size bin (any size <= bin is legal)
    desc = bytes([flg, bd]) + struct.pack("<Q", len(data))
    out = bytearray()
    out += struct.pack("<I", LZ4_MAGIC)
    out += desc
    out += bytes([(xxh32(desc) >> 8) & 0xFF])
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + block_size]
        pos += len(chunk)
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
            out += struct.pack("<I", xxh32(comp))
        else:  # incompressible: stored form
            out += struct.pack("<I", 0x80000000 | len(chunk))
            out += chunk
            out += struct.pack("<I", xxh32(chunk))
    out += struct.pack("<I", 0)  # EndMark
    out += struct.pack("<I", xxh32(data))
    return bytes(out)


def lz4_compress_stored(data: bytes, block_size: int = 1 << 18) -> bytes:
    """Minimal VALID lz4 frame writer: uncompressed blocks with content
    size, per-block checksums, and content checksum — readable by any
    conforming decoder (liblz4, this module). The write path for .lz4
    artifacts where no native codec is deployed."""
    flg = 0b01100000 | 0x10 | 0x08 | 0x04  # indep + bsum + csize + csum
    bd = 0x70  # 4 MiB max-block-size bin (any size <= bin is legal)
    desc = bytes([flg, bd]) + struct.pack("<Q", len(data))
    out = bytearray()
    out += struct.pack("<I", LZ4_MAGIC)
    out += desc
    out += bytes([(xxh32(desc) >> 8) & 0xFF])
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + block_size]
        pos += len(chunk)
        out += struct.pack("<I", 0x80000000 | len(chunk))
        out += chunk
        out += struct.pack("<I", xxh32(chunk))
    out += struct.pack("<I", 0)  # EndMark
    out += struct.pack("<I", xxh32(data))
    return bytes(out)
