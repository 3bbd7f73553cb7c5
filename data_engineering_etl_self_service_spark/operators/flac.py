"""Pure-Python FLAC codec subset (public xiph.org spec).

Closes the lossless-AUDIO stub the way PNG/GIF closed the image side:
FLAC is bit-packed integer coding (no DSP), so stdlib-only code covers a
real decode path. Scope:

- decoder: STREAMINFO parse, metadata skip, FIXED-blocksize frames,
  independent channels, subframe types CONSTANT / VERBATIM / FIXED
  (orders 0-4) with partitioned-Rice residuals; 8/12/16/20/24-bit
  samples. LPC subframes, stereo decorrelation modes, and variable
  blocksize return None (out of subset — the decode pass degrades to a
  sniffed kind-only row).
- encoder: VERBATIM or FIXED(0-2)+Rice subframes, one metadata block,
  CRC-8 frame headers and CRC-16 frame footers per spec.

Lossless, so tests pin exact sample round-trips through every encoder
mode (which exercises the decoder's unary/Rice/warmup paths). The
container ships no reference FLAC codec, so byte-level interop with
other encoders is asserted structurally (magic, STREAMINFO fields,
CRCs) rather than against third-party files.
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


def build_flac(
    sample_rate: int,
    samples: "list[int]",
    bits: int = 16,
    block_size: int = 4096,
    mode: str = "verbatim",
) -> bytes:
    """Encode mono integer samples as a FLAC stream.

    ``mode``: 'verbatim', 'constant' (requires constant input per block),
    or 'fixed0'/'fixed1'/'fixed2' — FIXED-predictor subframes with
    Rice-coded residuals (k chosen per block from the mean residual).
    """
    out = bytearray(b"fLaC")
    info = _BW()
    info.w(block_size, 16)
    info.w(block_size, 16)
    info.w(0, 24)
    info.w(0, 24)
    info.w(sample_rate, 20)
    info.w(0, 3)  # channels - 1
    info.w(bits - 1, 5)
    info.w(len(samples), 36)
    info_bytes = bytes(info.out) + b"\x00" * 16  # md5 unknown
    out += bytes([0x80]) + struct.pack(">I", len(info_bytes))[1:] + info_bytes

    for fi, start in enumerate(range(0, len(samples), block_size)):
        blk = samples[start : start + block_size]
        hdr = _BW()
        hdr.w(0b11111111111110, 14)
        hdr.w(0, 1)
        hdr.w(0, 1)  # fixed blocksize strategy
        hdr.w(0b0111, 4)  # blocksize: 16-bit value follows
        hdr.w(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.w(0, 4)  # channel assignment: 1 channel
        hdr.w({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bits], 3)
        hdr.w(0, 1)
        _utf8_number(hdr, fi)
        hdr.w(len(blk) - 1, 16)
        hdr.align()
        hbytes = bytes(hdr.out)
        hbytes += bytes([_crc8(hbytes)])

        body = _BW()
        if mode == "constant" and len(set(blk)) == 1:
            body.w(0, 1)
            body.w(0b000000, 6)
            body.w(0, 1)
            body.w(blk[0] & ((1 << bits) - 1), bits)
        elif mode.startswith("fixed"):
            order = int(mode[5:])
            coefs = _FIXED_COEFS[order]
            body.w(0, 1)
            body.w(0b001000 | order, 6)
            body.w(0, 1)
            for s in blk[:order]:
                body.w(s & ((1 << bits) - 1), bits)
            resid = [
                blk[i] - sum(c * blk[i - j - 1] for j, c in enumerate(coefs))
                for i in range(order, len(blk))
            ]
            mean = sum(abs(r) for r in resid) // max(1, len(resid))
            k = min(14, max(0, mean.bit_length()))
            body.w(0b00, 2)  # rice method (4-bit params)
            body.w(0, 4)  # partition order 0 → one partition
            body.w(k, 4)
            _rice_write(body, resid, k)
        else:  # verbatim
            body.w(0, 1)
            body.w(0b000001, 6)
            body.w(0, 1)
            for s in blk:
                body.w(s & ((1 << bits) - 1), bits)
        body.align()
        frame = hbytes + bytes(body.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def decode_flac(raw: bytes):
    """FLAC subset decode → (sample_rate, bits, [samples]) or None."""
    try:
        return _decode(raw)
    except (EOFError, IndexError, KeyError, struct.error, ValueError):
        return None


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
    if nch != 1:
        return None  # multichannel out of subset
    samples: "list[int]" = []
    br = _BR(raw, pos)
    while len(samples) < total:
        hstart = br.pos
        if br.r(14) != 0b11111111111110:
            return None
        br.r(1)
        strategy = br.r(1)
        bs_code = br.r(4)
        sr_code = br.r(4)
        chan = br.r(4)
        size_code = br.r(3)
        br.r(1)
        if chan != 0:
            return None  # stereo modes out of subset
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
        # subframe
        if br.r(1) != 0:
            return None
        stype = br.r(6)
        if br.r(1) != 0:
            return None  # wasted bits out of subset
        if stype == 0b000000:  # CONSTANT
            v = br.signed(sbits)
            blk = [v] * bs
        elif stype == 0b000001:  # VERBATIM
            blk = [br.signed(sbits) for _ in range(bs)]
        elif 0b001000 <= stype <= 0b001100:  # FIXED 0-4
            order = stype & 0x07
            warm = [br.signed(sbits) for _ in range(order)]
            method = br.r(2)
            if method not in (0, 1):
                return None
            pbits = 4 if method == 0 else 5
            porder = br.r(4)
            blk = list(warm)
            n_part = 1 << porder
            coefs = _FIXED_COEFS[order]
            done = order
            for p in range(n_part):
                want = (bs >> porder) - (order if p == 0 else 0)
                k = br.r(pbits)
                if k == (1 << pbits) - 1:  # escape: raw residuals
                    rb = br.r(5)
                    resid = [br.signed(rb) for _ in range(want)]
                else:
                    resid = _rice_read(br, want, k)
                for r in resid:
                    pred = sum(
                        c * blk[len(blk) - j - 1] for j, c in enumerate(coefs)
                    )
                    blk.append(r + pred)
                done += want
            if len(blk) != bs:
                return None
        else:
            return None  # LPC out of subset
        br.align()
        br.pos += 2  # frame crc16
        samples.extend(blk)
        if br.pos >= len(raw) and len(samples) < total:
            return None
    return rate, bits, samples[:total]
