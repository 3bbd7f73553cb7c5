"""Pure-Python Zstandard COMPRESSOR — real compressed blocks from the
RFC 8878 spec, the write-side mirror of ``operators/zstd.py`` (round 8).

``zstd_compress_stored`` (zstd.py) emits valid-but-uncompressed frames;
this module emits genuinely compressed ones: an LZ match stage (the
same greedy 4-byte hash probing as ``lz4.lz4_block_compress``) feeding
zstd Compressed blocks with **entropy-coded literals +
predefined-FSE-coded sequences**:

- literals take the smallest expressible section: RLE for single-byte
  runs, HUFFMAN-compressed (1-stream or 4-stream with jump table,
  direct 4-bit weight description, 11-bit length-limited canonical
  codes whose encode map is derived from the DECODER's own table
  construction) when that shrinks, Raw otherwise; each block also
  evaluates a literals-only form, which beats a marginal LZ parse on
  near-random small-alphabet data (measured: it edges out libzstd
  there);
- sequences (literal-length / offset / match-length code triples) are
  FSE-encoded against the spec's PREDEFINED distributions, so no table
  descriptions are written and the decoder side is the already-proven
  ``_predef`` tables. The encoder is the exact inverse of the decoder's
  state machine: for each symbol stream it walks the chain BACKWARD,
  picking for step i the unique state whose (baseline, nb_bits) range
  contains step i+1's state — the FSE spread tiles the state space per
  symbol, so the choice is total and unambiguous — then packs the bit
  ops in decode order under the 1-bit sentinel of the backward stream.
- offsets prefer the REPEAT-OFFSET codes (Offset_Value 1-3, round 9 —
  VERDICT r8 #7): the encoder walks the decoder's three-slot repeat
  history forward over the sequence stream (including the ll==0
  remapping and the rep1-1 special form) and emits the 0/1-extra-bit
  repeat form whenever the match offset sits in the history, falling
  back to the literal form (Offset_Value = offset + 3) otherwise. The
  history threads across blocks within a frame, exactly like the
  decoder's ``_FrameCtx.rep``; structured data with a dominant stride
  (the OCF fallback's actual payload shape) saves ~log2(offset) bits
  per repeated match. ``use_rep_offsets=False`` restores the stateless
  literal-only form (and is what the ratio test compares against).
- blocks cap at 64 KiB source; a block whose compressed form doesn't
  shrink is stored Raw (every block stays under the format's 128 KiB
  Block_Maximum_Size).

Verified both ways in tests/test_zstd.py: libzstd (pyarrow) decodes the
output bit-identically, and so does the in-repo pure decoder — plus
ratio assertions and hypothesis round-trip fuzz. Like the decoder, this
is the no-pyarrow fallback/write tier: the native codec remains the
bulk hot path (SCALE.md).
"""

from __future__ import annotations

import bisect
import struct

from .xxhash import xxh64
from .zstd import (
    ZSTD_MAGIC,
    _LL_BASE,
    _LL_BITS,
    _ML_BASE,
    _ML_BITS,
    _huffman_from_weights,
    _predef,
)

#: per kind: {symbol: sorted [(baseline, nb_bits, state)]}, accuracy_log
_ENC_TABLES: dict = {}


def _enc_table(kind: str):
    if kind not in _ENC_TABLES:
        table, al = _predef(kind)
        by_sym: dict[int, list] = {}
        for state, (sym, nb, base) in enumerate(table):
            by_sym.setdefault(sym, []).append((base, nb, state))
        for slots in by_sym.values():
            slots.sort()
        _ENC_TABLES[kind] = (by_sym, al)
    return _ENC_TABLES[kind]


def _code_of(value: int, bases: list[int]) -> int:
    """Largest code whose baseline <= value (bases are sorted)."""
    return bisect.bisect_right(bases, value) - 1


def _state_chain(codes: list[int], kind: str):
    """Backward FSE state assignment: (initial_state, accuracy_log,
    transition bit ops [(value, nb_bits)] for steps 0..n-2)."""
    by_sym, al = _enc_table(kind)
    n = len(codes)
    try:
        nxt = by_sym[codes[-1]][0][2]  # last state: any slot of its code
    except KeyError:
        raise ValueError(f"zstd encode: {kind} code {codes[-1]} invalid")
    trans: list = [None] * (n - 1)
    for i in range(n - 2, -1, -1):
        slots = by_sym.get(codes[i])
        if not slots:
            raise ValueError(f"zstd encode: {kind} code {codes[i]} invalid")
        j = bisect.bisect_right(slots, (nxt, 1 << 30, 1 << 30)) - 1
        base, nb, state = slots[j]
        if not base <= nxt < base + (1 << nb):  # tiling guarantees this
            raise AssertionError("zstd encode: FSE range gap")
        trans[i] = (nxt - base, nb)
        nxt = state
    return nxt, al, trans


def _pack_backward(ops: list) -> bytes:
    """Bit ops in DECODE order → backward-read bitstream bytes: the
    first-read value sits just under the 1-bit sentinel (the inverse of
    zstd.py's _BackBits). Packs LINEARLY by iterating in reverse and
    flushing whole bytes — the one-big-int left-shift form copied the
    whole accumulator per op, O(bits²) on match-heavy 64 KiB blocks
    (review r8b)."""
    buf = bytearray()
    acc = 0
    filled = 0
    for v, nb in reversed(ops):
        acc |= v << filled
        filled += nb
        while filled >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            filled -= 8
    acc |= 1 << filled  # sentinel
    while True:
        buf.append(acc & 0xFF)
        acc >>= 8
        filled -= 8
        if filled < 0:
            return bytes(buf)


def _offset_values(seqs: list, rep: list) -> tuple:
    """Map each sequence's match offset to its Offset_Value, preferring
    the repeat codes (VERDICT r8 #7) — the exact forward image of the
    decoder's repeat-history walk (zstd.py ``_decode_block``: the ll==0
    index remap, the rep1-1 form, and every history rotation). Returns
    ``(offset_values, rep_after)``; ``rep`` is not mutated."""
    r0, r1, r2 = rep
    ovs = []
    for ll, off, _ml in seqs:
        if ll != 0 and off == r0:
            ov = 1  # history untouched
        elif ll != 0 and off == r1:
            ov = 2
            r0, r1 = r1, r0
        elif ll != 0 and off == r2:
            ov = 3
            r0, r1, r2 = r2, r0, r1
        elif ll == 0 and off == r1:
            ov = 1
            r0, r1 = r1, r0
        elif ll == 0 and off == r2:
            ov = 2
            r0, r1, r2 = r2, r0, r1
        elif ll == 0 and off == r0 - 1 and off > 0:
            ov = 3
            r0, r1, r2 = off, r0, r1
        else:
            ov = off + 3
            r0, r1, r2 = off, r0, r1
        ovs.append(ov)
    return ovs, [r0, r1, r2]


def _encode_sequences(seqs: list, ovs: list) -> bytes:
    """[(ll, offset, ml)] + per-sequence Offset_Values → the
    sequences-section bitstream (predefined tables; header bytes added
    by the caller)."""
    n = len(seqs)
    ll_codes = [_code_of(s[0], _LL_BASE) for s in seqs]
    ml_codes = [_code_of(s[2], _ML_BASE) for s in seqs]
    of_codes = [ov.bit_length() - 1 for ov in ovs]
    ll0, _, ll_tr = _state_chain(ll_codes, "ll")
    of0, _, of_tr = _state_chain(of_codes, "of")
    ml0, _, ml_tr = _state_chain(ml_codes, "ml")
    ops = [(ll0, 6), (of0, 5), (ml0, 6)]  # init reads: LL, OF, ML
    for i, (ll, off, ml) in enumerate(seqs):
        ops.append((ovs[i] - (1 << of_codes[i]), of_codes[i]))
        ops.append((ml - _ML_BASE[ml_codes[i]], _ML_BITS[ml_codes[i]]))
        ops.append((ll - _LL_BASE[ll_codes[i]], _LL_BITS[ll_codes[i]]))
        if i + 1 < n:  # decoder updates LL, ML, OF after each non-last
            ops.append(ll_tr[i])
            ops.append(ml_tr[i])
            ops.append(of_tr[i])
    return _pack_backward(ops)


def _huffman_lengths(freqs: dict, cap: int = 11) -> dict:
    """Huffman code lengths limited to ``cap`` bits: plain heap Huffman
    then the standard Kraft-sum repair when clamping overflowed depths
    (lengthen cheap shallow leaves / shorten deep ones until the sum is
    exactly 2^cap — the equality the zstd weight table demands)."""
    import heapq

    if len(freqs) < 2:
        raise ValueError("huffman: need two symbols")
    heap = [
        (f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))
    ]
    heapq.heapify(heap)
    lens = {s: 0 for s in freqs}
    tie = len(heap)
    while len(heap) > 1:
        f1, _, l1 = heapq.heappop(heap)
        f2, _, l2 = heapq.heappop(heap)
        for s in l1 + l2:
            lens[s] += 1
        tie += 1
        heapq.heappush(heap, (f1 + f2, tie, l1 + l2))
    if max(lens.values()) <= cap:
        return lens
    for s in lens:
        lens[s] = min(lens[s], cap)
    target = 1 << cap
    kraft = sum(1 << (cap - v) for v in lens.values())
    guard = 0
    while kraft > target:  # overfull: deepen the deepest sub-cap leaf
        s = max(
            (x for x in lens if lens[x] < cap),
            key=lambda x: (lens[x], -freqs[x]),
        )
        kraft -= 1 << (cap - lens[s] - 1)
        lens[s] += 1
        guard += 1
        if guard > 4096:
            raise ValueError("huffman: kraft repair diverged")
    while kraft < target:  # underfull: shorten a deep leaf that fits
        for s in sorted(lens, key=lambda x: -lens[x]):
            gain = 1 << (cap - lens[s])
            if lens[s] > 1 and kraft + gain <= target:
                lens[s] -= 1
                kraft += gain
                break
        else:
            raise ValueError("huffman: kraft repair stuck")
        guard += 1
        if guard > 4096:
            raise ValueError("huffman: kraft repair diverged")
    return lens


def _huffman_encoder(lits: bytes):
    """(description bytes, {symbol: (code, nb_bits)}, max_bits) for the
    literal bytes, or None when the table can't be expressed in the
    direct-weights header (>=129 distinct-symbol span) or wouldn't
    help. Codes come from the DECODER's own table construction
    (_huffman_from_weights), so encode and decode agree by
    construction."""
    freqs: dict = {}
    for b in lits:
        freqs[b] = freqs.get(b, 0) + 1
    if len(freqs) < 2:
        return None
    max_present = max(freqs)
    if max_present > 128:  # direct header caps Number_of_Weights at 128
        return None
    try:
        lens = _huffman_lengths(freqs)
    except ValueError:
        return None
    maxlen = max(lens.values())
    # weight = maxlen + 1 - len for present symbols, 0 for gaps; the
    # LAST present symbol's weight is implied by Kraft completion
    weights = [
        (maxlen + 1 - lens[s]) if s in lens else 0
        for s in range(max_present + 1)
    ]
    desc_weights = weights[:-1]
    table, max_bits = _huffman_from_weights(desc_weights)
    enc: dict = {}
    seen: set = set()
    for pos, (sym, nb) in enumerate(table):
        if sym in seen:
            continue
        seen.add(sym)
        cell = 1 << (max_bits - nb)
        if pos % cell:  # canonical construction guarantees alignment
            raise AssertionError("huffman: misaligned code cell")
        enc[sym] = (pos >> (max_bits - nb), nb)
    hdr = 127 + len(desc_weights)
    nibbles = bytearray()
    for i in range(0, len(desc_weights), 2):
        hi = desc_weights[i] << 4
        lo = desc_weights[i + 1] if i + 1 < len(desc_weights) else 0
        nibbles.append(hi | lo)
    return bytes([hdr]) + bytes(nibbles), enc, max_bits


def _huffman_stream(syms: bytes, enc: dict) -> bytes:
    """One backward-read Huffman literal stream (codes in output order
    under the 1-bit sentinel — the inverse of _huffman_decode_stream;
    linear packing via _pack_backward)."""
    return _pack_backward([enc[s] for s in syms])


def _literals_section(lits: bytes) -> bytes:
    """The smallest literals section we can write for ``lits``: RLE for
    single-byte runs, Huffman-compressed (1-stream or 4-stream) when it
    shrinks, Raw otherwise."""
    rsize = len(lits)
    # Raw baseline (size_format=3: 20-bit size, 3 header bytes)
    raw = bytes(
        [
            0 | (3 << 2) | ((rsize & 0xF) << 4),
            (rsize >> 4) & 0xFF,
            rsize >> 12,
        ]
    ) + lits
    if rsize >= 2 and len(set(lits)) == 1:  # RLE literals
        return bytes(
            [
                1 | (3 << 2) | ((rsize & 0xF) << 4),
                (rsize >> 4) & 0xFF,
                rsize >> 12,
                lits[0],
            ]
        )
    if rsize < 32:
        return raw
    info = _huffman_encoder(lits)
    if info is None:
        return raw
    desc, enc, _ = info
    if rsize <= 1023:  # 1-stream form (size_format=0, 10-bit sizes)
        stream = _huffman_stream(lits, enc)
        csize = len(desc) + len(stream)
        if csize > 1023 or 3 + csize >= len(raw):
            return raw
        return bytes(
            [
                2 | (0 << 2) | ((rsize & 0xF) << 4),
                ((rsize >> 4) & 0x3F) | ((csize & 3) << 6),
                csize >> 2,
            ]
        ) + desc + stream
    # 4-stream form (size_format=3, 18-bit sizes)
    per = (rsize + 3) // 4
    parts = [lits[i * per : (i + 1) * per] for i in range(3)]
    parts.append(lits[3 * per :])
    streams = [_huffman_stream(p, enc) for p in parts]
    jump = struct.pack(
        "<HHH", len(streams[0]), len(streams[1]), len(streams[2])
    )
    body = desc + jump + b"".join(streams)
    csize = len(body)
    if (
        csize >= 1 << 18
        or any(len(s) > 0xFFFF for s in streams[:3])
        or 5 + csize >= len(raw)
    ):
        return raw
    return bytes(
        [
            2 | (3 << 2) | ((rsize & 0xF) << 4),
            (rsize >> 4) & 0xFF,
            ((rsize >> 12) & 0x3F) | ((csize & 3) << 6),
            (csize >> 2) & 0xFF,
            csize >> 10,
        ]
    ) + body


def _find_sequences(src: bytes):
    """Greedy LZ parse (shared matcher, zstd-flavored: no end-of-block
    literal rules, unbounded in-block offsets, min match 4) →
    (sequences [(lit_len, offset, match_len)], literals bytes)."""
    from .lzmatch import greedy_matches

    n = len(src)
    matches, anchor = greedy_matches(src, None, n - 4, n)
    seqs = [(p - a, off, ml) for a, p, off, ml in matches]
    lits = b"".join(
        [src[a:p] for a, p, _, _ in matches] + [src[anchor:]]
    )
    return seqs, lits


def _compress_block(
    src: bytes, rep: list, use_rep_offsets: bool = True
) -> tuple:
    """One zstd Compressed-block CONTENT for ``src`` →
    ``(content_or_None, rep_after)`` — None when the compressed form
    wouldn't shrink (caller stores the block raw; the repeat-offset
    history is untouched, matching the decoder, which only rotates it
    on decoded sequences)."""
    seqs, lits = _find_sequences(src)
    # literals-only candidate: on near-random data the greedy LZ parse
    # emits marginal 4-byte matches whose sequence coding costs MORE
    # than Huffman-coding the bytes straight — evaluate both and keep
    # the smaller (native encoders price this per-sequence; one extra
    # entropy pass per 64 KiB block is our cheaper approximation)
    lit_only = bytes(_literals_section(src)) + b"\x00" if src else None
    out = bytearray(_literals_section(lits))
    n = len(seqs)
    if n == 0:
        out.append(0)  # 0 sequences
        best = bytes(out)
        if lit_only is not None and len(lit_only) < len(best):
            best = lit_only
        return (best if len(best) < len(src) else None), rep
    if n < 128:
        out.append(n)
    elif n < 0x7F00:
        out.append(128 + (n >> 8))
        out.append(n & 0xFF)
    else:
        # 3-byte form (0xFF prefix): 128 KiB blocks of back-to-back
        # 4-byte matches can exceed the 2-byte ceiling on VALID input
        # (review r8b); max expressible 0x7F00 + 0xFFFF covers any
        # block <= 128 KiB with >= 4-byte matches
        out.append(255)
        out += (n - 0x7F00).to_bytes(2, "little")
    out.append(0)  # modes byte: Predefined for LL, OF, ML
    if use_rep_offsets:
        ovs, rep_after = _offset_values(seqs, rep)
    else:
        # literal form for every offset; the decoder still rotates its
        # history on each ov>3, so walk the same rotation
        ovs = [s[1] + 3 for s in seqs]
        r = list(rep)
        for _ll, off, _ml in seqs:
            r = [off, r[0], r[1]]
        rep_after = r
    out += _encode_sequences(seqs, ovs)
    best = bytes(out)
    best_rep = rep_after
    if lit_only is not None and len(lit_only) < len(best):
        # the winning candidate decodes with ZERO sequences — the
        # decoder's history never rotates for this block
        best, best_rep = lit_only, rep
    if len(best) < len(src):
        return best, best_rep
    return None, rep


def zstd_compress(
    data: bytes,
    block_size: int = 1 << 16,
    use_rep_offsets: bool = True,
) -> bytes:
    """Compress ``data`` into a standard zstd frame (single-segment,
    frame content size, VERIFIED content checksum). Every block is
    Compressed when that shrinks it and Raw otherwise, so output never
    exceeds input + framing. Match offsets use the repeat-offset codes
    whenever the offset sits in the decoder's three-slot history
    (``use_rep_offsets=False`` restores literal-only offsets — kept
    for the ratio comparison test). Readable by libzstd and by
    :func:`operators.zstd.zstd_decompress` (both pinned in tests)."""
    if not 0 < block_size <= 1 << 17:
        raise ValueError("zstd encode: block_size must be in (0, 128 KiB]")
    out = bytearray()
    out += struct.pack("<I", ZSTD_MAGIC)
    n = len(data)
    # Single_Segment + Content_Checksum; FCS width by content size
    if n < 256:
        out += bytes([0x24, n])
    elif n < 65536 + 256:
        out += bytes([0x64])
        out += struct.pack("<H", n - 256)
    else:
        out += bytes([0xA4])
        out += struct.pack("<I", n)
    chunks = [
        data[i : i + block_size] for i in range(0, n, block_size)
    ] or [b""]
    rep = [1, 4, 8]  # the spec's initial repeat-offset history
    for i, chunk in enumerate(chunks):
        last = 1 if i == len(chunks) - 1 else 0
        comp = None
        if chunk:
            comp, rep = _compress_block(chunk, rep, use_rep_offsets)
        if comp is not None:
            out += struct.pack("<I", last | (2 << 1) | (len(comp) << 3))[
                :3
            ]
            out += comp
        else:
            out += struct.pack("<I", last | (0 << 1) | (len(chunk) << 3))[
                :3
            ]
            out += chunk
    out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)
