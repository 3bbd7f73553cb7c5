"""Pure-Python FLAC codec subset (public xiph.org spec).

Closes the lossless-AUDIO stub the way PNG/GIF closed the image side:
FLAC is bit-packed integer coding, so stdlib-only code covers a real
decode path. Scope:

- decoder: STREAMINFO parse, metadata skip, FIXED-blocksize frames,
  subframe types CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC (any
  order, arbitrary quantized coefficients + shift) with
  partitioned-Rice residuals; mono, independent multichannel, and ALL
  THREE stereo decorrelation modes (left/side, right/side, mid/side —
  what real FLAC encoders emit almost exclusively); wasted-bits
  subframes (low-bit-silent material coded at reduced width);
  8/12/16/20/24-bit samples; BOTH blocksize strategies (the block size
  is read per frame either way — the variable-blocksize strategy bit
  only changes frame-number semantics, which this decoder does not
  rely on; pinned by test). Corrupt frames degrade to a sniffed
  kind-only row (None), never raise.
- encoder: VERBATIM / CONSTANT / FIXED(0-2) / LPC(n) (Levinson-Durbin
  coefficients quantized to 15-bit precision, shift 12 — the filter
  quality only affects compression, never correctness, because the
  residual is computed against the SAME quantized integer predictor
  the decoder runs) + Rice subframes; mono or stereo with any of the 4
  channel assignments; one metadata block, CRC-8 frame headers and
  CRC-16 frame footers per spec.

Lossless, so tests pin exact sample round-trips through every encoder
mode x channel assignment (which exercises the decoder's
unary/Rice/warmup/LPC-predictor/decorrelation paths). The container
ships no reference FLAC codec, so byte-level interop with other
encoders is asserted structurally (magic, STREAMINFO fields, CRCs)
rather than against third-party files.

API: :func:`decode_flac_channels` is the general decoder →
``(rate, bits, [channel, ...])``; :func:`decode_flac` keeps the
original mono shape ``(rate, bits, samples)`` (None for multichannel)
for existing mono call sites.
"""

from __future__ import annotations

import struct


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.w(0, 32)
            q -= 32
        self.w(1, q + 1)  # q zero bits then a one bit

    def align(self) -> None:
        if self.n:
            self.w(0, 8 - self.n)


class _BR:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def r(self, bits: int) -> int:
        while self.n < bits:
            if self.pos >= len(self.data):
                raise EOFError
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        v = (self.acc >> (self.n - bits)) & ((1 << bits) - 1)
        self.n -= bits
        self.acc &= (1 << self.n) - 1
        return v

    def signed(self, bits: int) -> int:
        v = self.r(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.r(1) == 0:
            q += 1
            if q > 1 << 24:
                raise EOFError
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0


def _utf8_number(bw: _BW, n: int) -> None:
    """UTF-8-style frame-number coding (FLAC frame header rule)."""
    if n < 0x80:
        bw.w(n, 8)
        return
    t = 2  # total bytes: lead prefix has t ones + a zero, 7-t value bits
    while n >> (6 * (t - 1)) >= (1 << (7 - t)):
        t += 1
    bw.w(((0xFF << (8 - t)) & 0xFF) | (n >> (6 * (t - 1))), 8)
    for i in range(t - 2, -1, -1):
        bw.w(0x80 | ((n >> (6 * i)) & 0x3F), 8)


def _read_utf8_number(br: _BR) -> int:
    b0 = br.r(8)
    if b0 < 0x80:
        return b0
    extra = 0
    mask = 0x40
    while b0 & mask:
        extra += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(extra):
        n = (n << 6) | (br.r(8) & 0x3F)
    return n


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _rice_write(bw: _BW, residuals: "list[int]", k: int) -> None:
    for r in residuals:
        u = (r << 1) if r >= 0 else (-(r << 1) - 1)
        bw.unary(u >> k)
        if k:
            bw.w(u & ((1 << k) - 1), k)


def _rice_read(br: _BR, n: int, k: int) -> "list[int]":
    out = []
    for _ in range(n):
        u = (br.unary() << k) | (br.r(k) if k else 0)
        out.append((u >> 1) ^ -(u & 1))
    return out


_LPC_PRECISION = 15  # quantized coefficient width (signed bits)
_LPC_SHIFT = 12


def _lpc_coefs(blk: "list[int]", order: int) -> "list[int] | None":
    """Levinson-Durbin LPC fit, quantized to signed _LPC_PRECISION-bit
    integers at _LPC_SHIFT. Returns None when the block is degenerate
    (too short / zero variance / unstable), in which case the caller
    falls back to a verbatim subframe — filter quality only affects
    compression, never correctness."""
    n = len(blk)
    if n <= order:
        return None
    ac = [
        float(sum(blk[i] * blk[i + lag] for i in range(n - lag)))
        for lag in range(order + 1)
    ]
    if ac[0] == 0.0:
        return None
    err = ac[0]
    lpc = [0.0] * order
    for i in range(order):
        acc = ac[i + 1]
        for j in range(i):
            acc -= lpc[j] * ac[i - j]
        if err == 0.0:
            return None
        k = acc / err
        lpc[i] = k
        for j in range(i // 2):
            t = lpc[j]
            lpc[j] = t - k * lpc[i - 1 - j]
            lpc[i - 1 - j] -= k * t
        if i % 2:
            lpc[i // 2] -= k * lpc[i // 2]
        err *= 1.0 - k * k
    lim = (1 << (_LPC_PRECISION - 1)) - 1
    q = [
        max(-lim - 1, min(lim, round(c * (1 << _LPC_SHIFT)))) for c in lpc
    ]
    if all(v == 0 for v in q):
        return None
    return q


def _write_residual(body: _BW, resid: "list[int]") -> None:
    mean = sum(abs(r) for r in resid) // max(1, len(resid))
    k = min(14, max(0, mean.bit_length()))
    body.w(0b00, 2)  # rice method (4-bit params)
    body.w(0, 4)  # partition order 0 → one partition
    body.w(k, 4)
    _rice_write(body, resid, k)


def _subframe_header(body: _BW, stype: int, wasted: int) -> None:
    body.w(0, 1)
    body.w(stype, 6)
    if wasted:
        body.w(1, 1)  # wasted-bits flag
        body.w(1, wasted)  # unary: (k-1) zero bits then a one
    else:
        body.w(0, 1)


def _write_subframe(
    body: _BW, blk: "list[int]", sbits: int, mode: str, wasted: int = 0
) -> None:
    """One subframe at ``sbits`` sample width in the given mode
    ('constant' requires constant input; 'lpcN' falls back to verbatim
    on degenerate blocks). ``wasted`` > 0 requests wasted-bits coding:
    like real encoders, the count is clamped PER SUBFRAME to the
    block's actual common trailing-zero bits (a derived mid channel,
    for example, can lose one factor of two), then samples are coded
    >> wasted at reduced width under a wasted-bits header."""
    if wasted:
        actual = wasted
        for s in blk:
            if s:
                tz = (s & -s).bit_length() - 1
                if tz < actual:
                    actual = tz
                if actual == 0:
                    break
        wasted = min(wasted, actual, sbits - 1)
    if wasted:
        blk = [s >> wasted for s in blk]
        sbits -= wasted
    if mode == "constant" and len(set(blk)) == 1:
        _subframe_header(body, 0b000000, wasted)
        body.w(blk[0] & ((1 << sbits) - 1), sbits)
        return
    if mode.startswith("fixed") and len(blk) >= int(mode[5:]):
        # blocks shorter than the predictor order (a short final block)
        # cannot carry enough warmup samples — verbatim fallback below,
        # the same discipline as degenerate LPC blocks
        order = int(mode[5:])
        coefs = _FIXED_COEFS[order]
        _subframe_header(body, 0b001000 | order, wasted)
        for s in blk[:order]:
            body.w(s & ((1 << sbits) - 1), sbits)
        resid = [
            blk[i] - sum(c * blk[i - j - 1] for j, c in enumerate(coefs))
            for i in range(order, len(blk))
        ]
        _write_residual(body, resid)
        return
    if mode.startswith("lpc"):
        order = int(mode[3:])
        if not (1 <= order <= 32):
            raise ValueError(f"lpc order out of range: {mode!r}")
        q = _lpc_coefs(blk, order)
        if q is not None:
            _subframe_header(body, 0b100000 | (order - 1), wasted)
            for s in blk[:order]:
                body.w(s & ((1 << sbits) - 1), sbits)
            body.w(_LPC_PRECISION - 1, 4)
            body.w(_LPC_SHIFT, 5)  # non-negative, 5-bit signed field
            for c in q:
                body.w(c & ((1 << _LPC_PRECISION) - 1), _LPC_PRECISION)
            resid = [
                blk[i]
                - (
                    sum(c * blk[i - j - 1] for j, c in enumerate(q))
                    >> _LPC_SHIFT
                )
                for i in range(order, len(blk))
            ]
            _write_residual(body, resid)
            return
        # degenerate block → verbatim fallback
    _subframe_header(body, 0b000001, wasted)
    for s in blk:
        body.w(s & ((1 << sbits) - 1), sbits)


#: stereo channel assignments → (4-bit frame-header code,
#: per-subframe extra bit on (left?, right?) — the SIDE channel carries
#: one extra bit per spec)
_STEREO_CODES = {
    "independent": (0b0001, (0, 0)),
    "left_side": (0b1000, (0, 1)),
    "right_side": (0b1001, (1, 0)),
    "mid_side": (0b1010, (0, 1)),
}


def build_flac(
    sample_rate: int,
    samples,
    bits: int = 16,
    block_size: int = 4096,
    mode: str = "verbatim",
    stereo_mode: str = "independent",
    wasted_bits: int = 0,
) -> bytes:
    """Encode integer samples as a FLAC stream.

    ``samples``: a flat list (mono) or a (left, right) pair of lists
    (stereo). ``mode``: 'verbatim', 'constant' (requires constant input
    per block), 'fixed0'/'fixed1'/'fixed2' (FIXED-predictor subframes),
    or 'lpcN' (order-N LPC subframes, Levinson-Durbin quantized
    coefficients; degenerate blocks fall back to verbatim). For stereo,
    ``stereo_mode`` picks the channel assignment: 'independent',
    'left_side', 'right_side' or 'mid_side' (inter-channel
    decorrelation per the spec: side = left - right, mid =
    (left + right) >> 1). ``wasted_bits`` k > 0 writes wasted-bits
    subframe headers and codes samples at reduced width (every sample
    must be a multiple of 2**k — the low-bit-silent material real
    encoders exploit)."""
    stereo = (
        isinstance(samples, (tuple, list))
        and len(samples) == 2
        and isinstance(samples[0], (list, tuple))
    )
    if stereo:
        left, right = list(samples[0]), list(samples[1])
        if len(left) != len(right):
            raise ValueError("stereo channels must be equal length")
        n_total = len(left)
        chan_code, extra = _STEREO_CODES[stereo_mode]
        nch = 2
    else:
        mono = list(samples)
        n_total = len(mono)
        chan_code, extra = 0, (0,)
        nch = 1

    out = bytearray(b"fLaC")
    info = _BW()
    info.w(block_size, 16)
    info.w(block_size, 16)
    info.w(0, 24)
    info.w(0, 24)
    info.w(sample_rate, 20)
    info.w(nch - 1, 3)
    info.w(bits - 1, 5)
    info.w(n_total, 36)
    info_bytes = bytes(info.out) + b"\x00" * 16  # md5 unknown
    out += bytes([0x80]) + struct.pack(">I", len(info_bytes))[1:] + info_bytes

    for fi, start in enumerate(range(0, n_total, block_size)):
        if stereo:
            lb = left[start : start + block_size]
            rb = right[start : start + block_size]
            if stereo_mode == "independent":
                chans = [lb, rb]
            elif stereo_mode == "left_side":
                chans = [lb, [a - b for a, b in zip(lb, rb)]]
            elif stereo_mode == "right_side":
                chans = [[a - b for a, b in zip(lb, rb)], rb]
            else:  # mid_side
                chans = [
                    [(a + b) >> 1 for a, b in zip(lb, rb)],
                    [a - b for a, b in zip(lb, rb)],
                ]
            bs = len(lb)
        else:
            chans = [mono[start : start + block_size]]
            bs = len(chans[0])
        hdr = _BW()
        hdr.w(0b11111111111110, 14)
        hdr.w(0, 1)
        hdr.w(0, 1)  # fixed blocksize strategy
        hdr.w(0b0111, 4)  # blocksize: 16-bit value follows
        hdr.w(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.w(chan_code, 4)
        hdr.w({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bits], 3)
        hdr.w(0, 1)
        _utf8_number(hdr, fi)
        hdr.w(bs - 1, 16)
        hdr.align()
        hbytes = bytes(hdr.out)
        hbytes += bytes([_crc8(hbytes)])

        body = _BW()
        for ci, blk in enumerate(chans):
            _write_subframe(
                body, blk, bits + extra[ci], mode, wasted_bits
            )
        body.align()
        frame = hbytes + bytes(body.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def decode_flac(raw: bytes):
    """Mono-shaped FLAC decode → (sample_rate, bits, [samples]) or None
    (None also for multichannel streams — use
    :func:`decode_flac_channels` for those)."""
    dec = decode_flac_channels(raw)
    if dec is None or len(dec[2]) != 1:
        return None
    rate, bits, chans = dec
    return rate, bits, chans[0]


def decode_flac_channels(raw: bytes):
    """General FLAC subset decode → (sample_rate, bits,
    [channel_samples, ...]) or None for corrupt / out-of-subset
    payloads. Handles LPC + FIXED + CONSTANT + VERBATIM subframes and
    all four channel assignments."""
    try:
        return _decode(raw)
    except (EOFError, IndexError, KeyError, struct.error, ValueError):
        return None


def _read_subframe(br: _BR, sbits: int, bs: int):
    """One subframe → ``bs`` samples, or None when out of subset."""
    if br.r(1) != 0:
        return None
    stype = br.r(6)
    wasted = 0
    if br.r(1):  # wasted-bits-per-sample: unary k-1, samples << k
        wasted = 1
        while br.r(1) == 0:
            wasted += 1
        if wasted >= sbits:
            return None
        sbits -= wasted
    blk = _read_subframe_body(br, stype, sbits, bs)
    if blk is None or not wasted:
        return blk
    return [s << wasted for s in blk]


def _read_subframe_body(br: _BR, stype: int, sbits: int, bs: int):
    if stype == 0b000000:  # CONSTANT
        return [br.signed(sbits)] * bs
    if stype == 0b000001:  # VERBATIM
        return [br.signed(sbits) for _ in range(bs)]
    if 0b001000 <= stype <= 0b001100 or stype & 0b100000:
        if stype & 0b100000:  # LPC
            order = (stype & 0x1F) + 1
            blk = [br.signed(sbits) for _ in range(order)]
            prec = br.r(4) + 1
            if prec == 16:  # 0b1111 is invalid per spec
                return None
            shift = br.signed(5)
            if shift < 0:
                return None
            coefs = [br.signed(prec) for _ in range(order)]

            def predict(hist):
                return (
                    sum(c * hist[-j - 1] for j, c in enumerate(coefs))
                    >> shift
                )

        else:  # FIXED 0-4
            order = stype & 0x07
            blk = [br.signed(sbits) for _ in range(order)]
            fixed = _FIXED_COEFS[order]

            def predict(hist):
                return sum(
                    c * hist[-j - 1] for j, c in enumerate(fixed)
                )

        method = br.r(2)
        if method not in (0, 1):
            return None
        pbits = 4 if method == 0 else 5
        porder = br.r(4)
        n_part = 1 << porder
        for p in range(n_part):
            want = (bs >> porder) - (order if p == 0 else 0)
            k = br.r(pbits)
            if k == (1 << pbits) - 1:  # escape: raw residuals
                rb = br.r(5)
                resid = [br.signed(rb) for _ in range(want)]
            else:
                resid = _rice_read(br, want, k)
            for r in resid:
                blk.append(r + predict(blk))
        if len(blk) != bs:
            return None
        return blk
    return None  # unknown subframe type


def _decode(raw: bytes):
    if raw[:4] != b"fLaC":
        return None
    pos = 4
    info = None
    while True:
        hdr = raw[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + raw[pos + 1 : pos + 4])
        body = raw[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if btype == 0:
            br = _BR(body)
            br.r(16)
            br.r(16)
            br.r(24)
            br.r(24)
            rate = br.r(20)
            nch = br.r(3) + 1
            bits = br.r(5) + 1
            total = br.r(36)
            info = (rate, nch, bits, total)
        if last:
            break
    if info is None:
        return None
    rate, nch, bits, total = info
    chans: "list[list[int]]" = [[] for _ in range(nch)]
    br = _BR(raw, pos)
    while len(chans[0]) < total:
        if br.r(14) != 0b11111111111110:
            return None
        br.r(1)
        strategy = br.r(1)
        bs_code = br.r(4)
        sr_code = br.r(4)
        chan = br.r(4)
        size_code = br.r(3)
        br.r(1)
        # channel assignment: 0-7 independent (chan+1 channels),
        # 8 left/side, 9 right/side, 10 mid/side
        if chan <= 7:
            if chan + 1 != nch:
                return None
            extra = (0,) * nch
            stereo_mode = None
        elif chan in (8, 9, 10):
            if nch != 2:
                return None
            extra = (0, 1) if chan in (8, 10) else (1, 0)
            stereo_mode = chan
        else:
            return None
        _read_utf8_number(br)
        if bs_code == 0b0110:
            bs = br.r(8) + 1
        elif bs_code == 0b0111:
            bs = br.r(16) + 1
        else:
            bs = {
                0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304,
                0b0101: 4608, 0b1000: 256, 0b1001: 512, 0b1010: 1024,
                0b1011: 2048, 0b1100: 4096, 0b1101: 8192, 0b1110: 16384,
                0b1111: 32768,
            }.get(bs_code)
            if bs is None:
                return None
        if sr_code == 0b1100:
            br.r(8)
        elif sr_code in (0b1101, 0b1110):
            br.r(16)
        sbits = {0: bits, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24}.get(size_code)
        if sbits is None:
            return None
        br.r(8)  # header crc (structure validated by successful parse)
        subs = []
        for ci in range(nch):
            blk = _read_subframe(br, sbits + extra[ci], bs)
            if blk is None:
                return None
            subs.append(blk)
        br.align()
        br.pos += 2  # frame crc16
        # inter-channel decorrelation (spec 9.1.4): side = left - right,
        # mid = (left + right) >> 1 reconstructed via the parity of side
        if stereo_mode == 8:  # left/side
            left, side = subs
            subs = [left, [a - s for a, s in zip(left, side)]]
        elif stereo_mode == 9:  # right/side
            side, right = subs
            subs = [[s + b for s, b in zip(side, right)], right]
        elif stereo_mode == 10:  # mid/side
            mid, side = subs
            subs = [
                [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)],
                [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(mid, side)],
            ]
        for ci in range(nch):
            chans[ci].extend(subs[ci])
        if br.pos >= len(raw) and len(chans[0]) < total:
            return None
    return rate, bits, [c[:total] for c in chans]
