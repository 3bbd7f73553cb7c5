"""Pure-Python baseline JPEG codec (ITU-T T.81 public spec subset).

Closes the last named image-format stub in the multimodal module. Scope:
baseline sequential DCT, 8-bit, grayscale or YCbCr with ARBITRARY
sampling factors on decode (4:4:4, 4:2:0, 4:2:2, 4:4:0, ... — the
interleaved-MCU loop is the general T.81 A.2.3 one, chroma upsampled by
sample replication), restart intervals (DRI + RST0-7: DC-predictor
reset and byte realignment every R MCUs — cameras emit these routinely
for error resilience), no progressive/arithmetic modes — anything else
returns None from :func:`decode_jpeg` (the decode pass degrades to a
sniffed kind-only row, never raises). The encoder emits 4:4:4
(default), 4:2:0 (2x2-mean chroma downsample, the layout real cameras
overwhelmingly produce), 4:2:2 (2x1 — broadcast/video), or 4:4:0 (1x2)
via ``subsampling=``, plus an optional ``restart_interval`` — which is
how every sampling layout the decoder's general MCU loop claims, and
its restart path, get exercised without third-party fixtures.

Design notes:

- JPEG is the one LOSSY format here, so unlike PNG/GIF there is no
  bit-exact pixel round-trip to pin. What IS pinned by tests: solid-color
  images round-trip within ±1 (a constant block's DCT is DC-only, and the
  all-ones quant tables this encoder writes preserve it exactly), random
  images round-trip within a small bounded error, and decoding is
  deterministic byte-for-byte.
- Huffman tables are NOT the Annex K defaults: the encoder emits its own
  fixed-length canonical tables (12 four-bit DC category codes, 162
  eight-bit AC run/size codes) in DHT segments, and the decoder builds
  whatever tables the DHT declares — so the decoder handles arbitrary
  canonical tables, including Annex K files from other encoders.
- DCT/IDCT are exact float matrix products (``A @ block @ A.T`` with the
  orthonormal DCT-II basis); entropy coding is DC-differential +
  run/size AC with 0xFF byte stuffing, per the spec.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)


def _dct_basis() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _dct_basis()

#: encoder Huffman tables: canonical, fixed code lengths (see module doc).
#: DC: 12 category symbols, 4 bits each. AC: EOB, ZRL and every (run 0-15,
#: size 1-10) pair — 162 symbols, 8 bits each.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_SYMBOLS = sorted(set(_AC_SYMBOLS))


def _canonical_codes(symbols: "list[int]", length: int) -> dict:
    return {sym: (i, length) for i, sym in enumerate(symbols)}

_DC_CODES = _canonical_codes(_DC_SYMBOLS, 4)
_AC_CODES = _canonical_codes(_AC_SYMBOLS, 8)

#: the ITU-T T.81 Annex K "typical" Huffman tables (the ones libjpeg
#: ships and virtually every real-world encoder emits) as (bits, vals)
#: DHT payloads — encoding with these exercises the decoder's
#: variable-length canonical-table path the way third-party files do.
_K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _codes_from_dht(bits: "list[int]", vals: "list[int]") -> dict:
    """symbol → (code, length) for a canonical (bits, vals) DHT spec."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # marker-emulation guard
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    pred: int,
    dc_codes: dict = _DC_CODES,
    ac_codes: dict = _AC_CODES,
) -> int:
    """Level-shifted 8x8 spatial block → DCT → quant(1) → entropy bits
    with the given canonical code tables. Returns the new DC
    predictor."""
    coef = _A @ (block - 128.0) @ _A.T
    q = np.rint(coef).astype(np.int64)
    zz = q.reshape(-1)[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, ln = dc_codes[size]
    w.write(code, ln)
    if size:
        w.write(_amplitude(diff, size), size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        w.write(_amplitude(v, size), size)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def _dht_segment_spec(
    tc_th: int, bits: "list[int]", vals: "list[int]"
) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dht_segment(tc_th: int, symbols: "list[int]", length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    body = bytes([tc_th]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _pad_edge(c: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = c.shape
    p = np.empty((ph, pw))
    p[:h, :w] = c
    p[h:, :w] = c[h - 1 : h, :]
    p[:, w:] = p[:, w - 1 : w]
    return np.clip(p, 0.0, 255.0)


def _quant_coef_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane → (H/8, W/8, 64) int64 quantized (q=1) DCT
    coefficients in zigzag order."""
    by_n, bx_n = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((by_n, bx_n, 64), dtype=np.int64)
    for by in range(by_n):
        for bx in range(bx_n):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            q = np.rint(_A @ (blk - 128.0) @ _A.T).astype(np.int64)
            out[by, bx] = q.reshape(-1)[_ZIGZAG]
    return out


def _sos_segment(scomp: "list[tuple[int, int]]", ss: int, se: int,
                 ah: int, al: int) -> bytes:
    body = bytes([len(scomp)])
    for cs, tables in scomp:
        body += bytes([cs, tables])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _emit_ac_first(
    wtr: _BitWriter, zz, al: int, ss: int = 1, se: int = 63
) -> None:
    """First AC scan of one block over band [ss, se], point transform
    ``al`` (magnitudes truncated toward zero per T.81 G.1.2.2)."""
    t = [0] * 64
    last = ss - 1
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = (v if v >= 0 else -v) >> al
        t[k] = a if v >= 0 else -a
        if t[k]:
            last = k
    run = 0
    for k in range(ss, last + 1):
        v = t[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = _AC_CODES[0xF0]
            wtr.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = _AC_CODES[(run << 4) | size]
        wtr.write(code, ln)
        wtr.write(_amplitude(v, size), size)
        run = 0
    if last != se:
        code, ln = _AC_CODES[0x00]  # EOB (run length 1)
        wtr.write(code, ln)


def _emit_ac_refine(
    wtr: _BitWriter, zz, al: int, ss: int = 1, se: int = 63
) -> None:
    """AC refinement scan of one block over band [ss, se] (T.81
    G.1.2.3): newly-nonzero coefficients as (run, 1)+sign symbols,
    correction bits for history-nonzero coefficients interleaved in
    position order exactly where the decoder's advance loop consumes
    them, per-block EOB."""
    absv = [0] * 64
    for k in range(ss, se + 1):
        absv[k] = (abs(int(zz[k]))) >> al
    k = ss
    while k <= se:
        pnew = None
        for j in range(k, se + 1):
            if absv[j] == 1:
                pnew = j
                break
        if pnew is None:
            break
        run = sum(1 for j in range(k, pnew) if absv[j] == 0)
        while run > 15:
            code, ln = _AC_CODES[0xF0]
            wtr.write(code, ln)
            zcount = 0
            while zcount < 16:
                if absv[k] == 0:
                    zcount += 1
                elif absv[k] >= 2:
                    wtr.write(absv[k] & 1, 1)
                k += 1
            run -= 16
        code, ln = _AC_CODES[(run << 4) | 1]
        wtr.write(code, ln)
        wtr.write(1 if zz[pnew] >= 0 else 0, 1)
        for j in range(k, pnew):
            if absv[j] >= 2:
                wtr.write(absv[j] & 1, 1)
        k = pnew + 1
    if k <= se:
        code, ln = _AC_CODES[0x00]  # EOB; then the band-tail corrections
        wtr.write(code, ln)
        for j in range(k, se + 1):
            if absv[j] >= 2:
                wtr.write(absv[j] & 1, 1)


def _emit_progressive_scans(
    padded, sampling, h: int, w: int, nc: int,
    bands=((1, 63),),
) -> bytes:
    """The progressive scan script: DC first (interleaved, Al=1), DC
    refine, then per component AC 1-63 first (Al=1) and AC refine —
    all four T.81 G.2 scan kinds. Tables were emitted with the
    headers; each scan is its own SOS + entropy segment."""
    coefs = [_quant_coef_blocks(p) for p in padded]
    hmax = max(s >> 4 for s in sampling[:nc])
    vmax = max(s & 0x0F for s in sampling[:nc])
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    out = bytearray()

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    hi, vi = sampling[ci] >> 4, sampling[ci] & 0x0F
                    for vy in range(vi):
                        for vx in range(hi):
                            yield ci, my * vi + vy, mx * hi + vx

    # scan 1: DC first, all components interleaved, point transform 1
    out += _sos_segment(
        [(i + 1, (0 if i == 0 else 1) << 4) for i in range(nc)],
        0, 0, 0, 1,
    )
    wtr = _BitWriter()
    preds = [0] * nc
    for ci, by, bx in mcu_blocks():
        dc = int(coefs[ci][by, bx, 0]) >> 1  # arithmetic: T.81 DC PT
        diff = dc - preds[ci]
        preds[ci] = dc
        size = _category(diff)
        code, ln = _DC_CODES[size]
        wtr.write(code, ln)
        if size:
            wtr.write(_amplitude(diff, size), size)
    out += wtr.flush()

    # scan 2: DC refinement — one raw bit (bit 0 of the true DC) per block
    out += _sos_segment([(i + 1, 0) for i in range(nc)], 0, 0, 1, 0)
    wtr = _BitWriter()
    for ci, by, bx in mcu_blocks():
        wtr.write(int(coefs[ci][by, bx, 0]) & 1, 1)
    out += wtr.flush()

    # per component and spectral band: AC first scan at Al=1, then
    # refinement (spectral selection x successive approximation)
    for ah, al in ((0, 1), (1, 0)):
        for ci in range(nc):
            hi, vi = sampling[ci] >> 4, sampling[ci] & 0x0F
            ch, cw = _comp_block_grid(h, w, hi, vi, hmax, vmax)
            ta = 0 if ci == 0 else 1
            for ss, se in bands:
                out += _sos_segment([(ci + 1, ta)], ss, se, ah, al)
                wtr = _BitWriter()
                for by in range(ch):
                    for bx in range(cw):
                        if ah == 0:
                            _emit_ac_first(
                                wtr, coefs[ci][by, bx], al, ss, se
                            )
                        else:
                            _emit_ac_refine(
                                wtr, coefs[ci][by, bx], al, ss, se
                            )
                out += wtr.flush()
    return bytes(out)


def build_jpeg(
    px: np.ndarray,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
    progressive_bands: "tuple[tuple[int, int], ...]" = ((1, 63),),
    tables: str = "canonical",
) -> bytes:
    """Encode an HxW (grayscale) or HxWx3 (RGB) uint8 array as baseline
    JPEG with all-ones quant tables (minimal loss) and this module's
    canonical Huffman tables. ``subsampling``: "444" (every component at
    full resolution, 1x1 MCUs), "420" (Y at 2x2 sampling inside a
    16x16-pixel MCU, Cb/Cr downsampled by a 2x2 mean — the real-world
    camera layout), "422" (Y at 2x1 inside an 8x16 MCU, chroma halved
    horizontally — the broadcast/video layout), or "440" (Y at 1x2
    inside a 16x8 MCU, chroma halved vertically — 422's transpose);
    ignored for grayscale input. ``restart_interval``
    R > 0 emits a DRI segment and an RSTn marker (byte-aligned, DC
    predictors reset) after every R MCUs, per T.81 — the
    error-resilience layout cameras produce (baseline mode only).
    ``progressive`` emits SOF2 with a 2(1+nc)-scan successive-
    approximation script — DC first (Al=1), DC refine, per-component
    AC 1-63 first (Al=1), per-component AC refine — exercising every
    T.81 G.2 scan kind; final Al=0 everywhere, so the transported
    coefficients (and therefore the decoded pixels) are IDENTICAL to
    the baseline encoding's. ``tables``: "canonical" (this module's
    fixed-length tables) or "annexk" (the ITU-T T.81 Annex K typical
    variable-length tables virtually every real encoder emits —
    baseline mode only), which exercises the decoder's general-DHT
    path the way third-party files do."""
    if tables not in ("canonical", "annexk"):
        raise ValueError(f"unknown tables {tables!r}")
    if tables == "annexk" and progressive:
        raise ValueError("annexk tables: baseline mode only")
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    # (H, V) luma sampling factors per T.81's Hi/Vi nibbles.
    _FACTORS = {"444": (1, 1), "420": (2, 2), "422": (2, 1), "440": (1, 2)}
    if subsampling not in _FACTORS:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hs, vs = (1, 1) if gray else _FACTORS[subsampling]
    subsampled = (hs, vs) != (1, 1)
    h, w = px.shape[:2]
    if gray:
        comps = [px.astype(np.float64)]
    else:
        r = px[..., 0].astype(np.float64)
        g = px[..., 1].astype(np.float64)
        b = px[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    if subsampled:
        # luma padded to the MCU grid (8*V rows x 8*H cols — the MCU
        # covers VxH luma blocks); chroma is the VxH mean of the padded
        # luma grid, itself then a multiple of 8 — exactly one chroma
        # block per MCU
        ph = (h + 8 * vs - 1) // (8 * vs) * (8 * vs)
        pw = (w + 8 * hs - 1) // (8 * hs) * (8 * hs)
        ypad = _pad_edge(comps[0], ph, pw)
        padded = [ypad]
        for c in comps[1:]:
            full = _pad_edge(c, ph, pw)
            acc = np.zeros((ph // vs, pw // hs), dtype=np.float64)
            for dy in range(vs):
                for dx in range(hs):
                    acc += full[dy::vs, dx::hs]
            padded.append(acc / float(vs * hs))
        sampling = [(hs << 4) | vs, 0x11, 0x11]
    else:
        # pad each component to multiples of 8 by edge replication
        ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        padded = [_pad_edge(c, ph, pw) for c in comps]
        sampling = [0x11] * len(comps)

    out = bytearray(b"\xff\xd8")  # SOI
    one = bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + one  # DQT 0
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([1]) + one
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, sampling[i], 0 if i == 0 else 1])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">H", 2 + len(sof)
    ) + sof
    if tables == "annexk":
        out += _dht_segment_spec(0x00, *_K_DC_LUMA)
        out += _dht_segment_spec(0x10, *_K_AC_LUMA)
        if not gray:
            out += _dht_segment_spec(0x01, *_K_DC_CHROMA)
            out += _dht_segment_spec(0x11, *_K_AC_CHROMA)
        comp_codes = [
            (_codes_from_dht(*_K_DC_LUMA), _codes_from_dht(*_K_AC_LUMA))
        ] + [
            (
                _codes_from_dht(*_K_DC_CHROMA),
                _codes_from_dht(*_K_AC_CHROMA),
            )
        ] * 2
    else:
        out += _dht_segment(0x00, _DC_SYMBOLS, 4)  # DC table 0
        out += _dht_segment(0x10, _AC_SYMBOLS, 8)  # AC table 0
        if not gray:
            out += _dht_segment(0x01, _DC_SYMBOLS, 4)
            out += _dht_segment(0x11, _AC_SYMBOLS, 8)
        comp_codes = [(_DC_CODES, _AC_CODES)] * 3
    if progressive:
        out += _emit_progressive_scans(
            padded, sampling, h, w, nc,
            bands=progressive_bands,
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # gather MCUs as (component, block) lists so restart handling is
    # uniform across sampling layouts
    mcus = []
    if subsampled:
        # interleaved MCU order per T.81 A.2.3: luma blocks raster-order
        # within the MCU (e.g. Y00 Y01 Y10 Y11 for 420), then Cb, Cr
        for my in range(ph // (8 * vs)):
            for mx in range(pw // (8 * hs)):
                blocks = []
                for vy in range(vs):
                    for vx in range(hs):
                        by, bx = my * vs + vy, mx * hs + vx
                        blocks.append(
                            (
                                0,
                                padded[0][
                                    by * 8 : by * 8 + 8,
                                    bx * 8 : bx * 8 + 8,
                                ],
                            )
                        )
                for ci in (1, 2):
                    blocks.append(
                        (
                            ci,
                            padded[ci][
                                my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8
                            ],
                        )
                    )
                mcus.append(blocks)
    else:
        for by in range(ph // 8):
            for bx in range(pw // 8):
                mcus.append(
                    [
                        (
                            ci,
                            padded[ci][
                                by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                            ],
                        )
                        for ci in range(nc)
                    ]
                )

    wtr = _BitWriter()
    preds = [0] * nc
    rst = 0
    for mi, blocks in enumerate(mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            out += wtr.flush()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            wtr = _BitWriter()
            preds = [0] * nc
        for ci, block in blocks:
            dc_codes, ac_codes = comp_codes[ci]
            preds[ci] = _encode_block(
                wtr, block, preds[ci], dc_codes, ac_codes
            )
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise EOFError
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise EOFError  # a real marker — entropy data over
            self.acc = (self.acc << 8) | byte
            self.n += 8
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def marker(self) -> "tuple[int, int]":
        """Discard any partial-byte padding bits and read a 2-byte
        marker directly from the stream (for RSTn between restart
        intervals). Between reads n < 8, so dropped bits are only the
        current byte's 1-padding."""
        self.acc = 0
        self.n = 0
        if self.pos + 2 > len(self.data):
            raise EOFError
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        self.pos += 2
        return b0, b1


def _build_huffman(bits: "list[int]", vals: bytes) -> dict:
    """(length, code) -> symbol, canonical per T.81 C.2."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _read_symbol(r: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read(1)
        if (ln, code) in table:
            return table[(ln, code)]
    raise EOFError


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(raw: bytes):
    """Baseline JPEG → HxW (grayscale) or HxWx3 (RGB) uint8, or None for
    corrupt / out-of-subset payloads."""
    try:
        return _decode_jpeg(raw)
    except (EOFError, IndexError, KeyError, struct.error, ValueError):
        return None


def _find_entropy_end(raw: bytes, pos: int) -> int:
    """Index of the first real marker (not a stuffed 0x00 or RSTn)
    after ``pos`` — the end of a scan's entropy-coded segment."""
    i = pos
    n = len(raw)
    while i + 1 < n:
        if raw[i] == 0xFF:
            nxt = raw[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return n


def _decode_jpeg(raw: bytes):
    if raw[:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple, dict] = {}
    frame = None
    progressive = False
    scans = []  # (scomp, ss, se, ah, al, entropy, restart, huff snapshot)
    restart = 0
    while pos < len(raw):
        if raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", raw, pos)
        body = raw[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables out of subset
                qt[tq] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=b + 1
                ).astype(np.float64)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = body[b + 17 : b + 17 + n]
                huff[(tc, th)] = _build_huffman(bits, vals)
                b += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    return None
                comps.append((cid, hi, vi, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline/-progressive frame types
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scomp = []
            for i in range(ns):
                cs, tables = body[1 + 2 * i : 3 + 2 * i]
                scomp.append((cs, tables >> 4, tables & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            end = _find_entropy_end(raw, pos)
            scans.append(
                (
                    scomp, ss, se, ahal >> 4, ahal & 0x0F,
                    raw[pos:end], restart, dict(huff),
                )
            )
            pos = end
            if not progressive:
                break  # baseline: single scan
    if frame is None or not scans:
        return None
    h, w, comps = frame
    if progressive:
        return _decode_progressive(h, w, comps, scans, qt)
    scomp, _ss, _se, _ah, _al, data, restart, huff = scans[0]
    if len(scomp) != len(comps):
        return None
    if len(comps) == 1:
        # single-component scans are NON-interleaved (T.81 A.2.2):
        # sampling factors don't apply, data units are raster 8x8 blocks
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(hi for _, hi, vi, _ in comps)
    vmax = max(vi for _, hi, vi, _ in comps)
    if any(hmax % hi or vmax % vi for _, hi, vi, _ in comps):
        return None  # replication upsampling needs integer ratios
    # MCU grid per T.81 A.2.3/A.1.1: ceil over 8*hmax x 8*vmax pixels;
    # component ci contributes hi x vi blocks per MCU
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    meta = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    order = []  # (plane index, hi, vi, q, dc table, ac table)
    planes = []
    for ci, (cs, td, ta) in enumerate(scomp):
        if cs not in meta:
            return None
        hi, vi, tq = meta[cs]
        planes.append(np.zeros((mcuy * vi * 8, mcux * hi * 8)))
        order.append((ci, hi, vi, qt[tq], huff[(0, td)], huff[(1, ta)]))
    r = _BitReader(data)
    preds = [0] * len(comps)
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_index and mcu_index % restart == 0:
                b0, b1 = r.marker()
                if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
                    return None
                preds = [0] * len(comps)
            mcu_index += 1
            for ci, hi, vi, q, dct, act in order:
                for vy in range(vi):
                    for vx in range(hi):
                        zz = np.zeros(64)
                        size = _read_symbol(r, dct)
                        diff = (
                            _extend(r.read(size), size) if size else 0
                        )
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(r, act)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63 or size == 0:
                                return None
                            zz[k] = _extend(r.read(size), size)
                            k += 1
                        # DQT tables and the zz vector are both zigzag-
                        # ordered; scatter dequantized to natural order
                        coef = np.zeros(64)
                        coef[_ZIGZAG] = zz * q
                        blk = _A.T @ coef.reshape(8, 8) @ _A + 128.0
                        by, bx = my * vi + vy, mx * hi + vx
                        planes[ci][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ] = blk
    factors = [meta[cs][:2] for cs, _, _ in scomp]
    return _finish_image(planes, factors, h, w)


def _comp_block_grid(h, w, hi, vi, hmax, vmax):
    """Non-interleaved block grid of a component (T.81 A.1.1: component
    sample dims are ceil(image_dim * fi / fmax), then ceil/8 blocks) —
    note this can be SMALLER than the MCU-padded grid; padding blocks
    are simply never coded in non-interleaved scans."""
    cw = ((w * hi + hmax - 1) // hmax + 7) // 8
    ch = ((h * vi + vmax - 1) // vmax + 7) // 8
    return ch, cw


def _refine_nonzero(r: _BitReader, zz, k: int, p1: int, m1: int) -> None:
    """One AC-refinement correction bit for a nonzero-history coefficient
    (T.81 G.2 / libjpeg decode_mcu_AC_refine semantics)."""
    if r.read(1):
        if (int(zz[k]) & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1


def _decode_progressive(h, w, comps, scans, qt):
    """Progressive JPEG (SOF2): accumulate quantized coefficients across
    spectral-selection / successive-approximation scans (T.81 G.2 —
    DC first/refine, AC first/refine with EOB runs), then dequantize +
    IDCT once at the end. Restart markers reset DC predictors and the
    EOB run."""
    if len(comps) == 1:
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(hi for _, hi, vi, _ in comps)
    vmax = max(vi for _, hi, vi, _ in comps)
    if any(hmax % hi or vmax % vi for _, hi, vi, _ in comps):
        return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    idx_of = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
    coefs = [
        np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
        for _, hi, vi, _ in comps
    ]

    for scomp, ss, se, ah, al, data, restart, huff in scans:
        r = _BitReader(data)
        if ss == 0:  # ---- DC scan (interleaved or single-component)
            if se != 0:
                return None
            members = []  # (comp index, hi, vi, dc table)
            for cs, td, _ta in scomp:
                if cs not in idx_of:
                    return None
                ci = idx_of[cs]
                _, hi, vi, _ = comps[ci]
                table = huff.get((0, td)) if ah == 0 else None
                if ah == 0 and table is None:
                    return None
                members.append((ci, hi, vi, table))
            preds = {ci: 0 for ci, *_ in members}

            def dc_unit(ci, by, bx, table):
                zz = coefs[ci][by, bx]
                if ah == 0:
                    size = _read_symbol(r, table)
                    diff = _extend(r.read(size), size) if size else 0
                    preds[ci] += diff
                    zz[0] = preds[ci] << al
                else:  # refinement: one bit appends bit ``al``
                    if r.read(1):
                        zz[0] = int(zz[0]) | (1 << al)

            unit = 0
            if len(members) > 1:
                for my in range(mcuy):
                    for mx in range(mcux):
                        if restart and unit and unit % restart == 0:
                            b0, b1 = r.marker()
                            if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
                                return None
                            preds = {k: 0 for k in preds}
                        unit += 1
                        for ci, hi, vi, table in members:
                            for vy in range(vi):
                                for vx in range(hi):
                                    dc_unit(
                                        ci, my * vi + vy, mx * hi + vx,
                                        table,
                                    )
            else:
                ci, hi, vi, table = members[0]
                ch, cw = _comp_block_grid(h, w, hi, vi, hmax, vmax)
                for by in range(ch):
                    for bx in range(cw):
                        if restart and unit and unit % restart == 0:
                            b0, b1 = r.marker()
                            if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
                                return None
                            preds = {k: 0 for k in preds}
                        unit += 1
                        dc_unit(ci, by, bx, table)
        else:  # ---- AC scan: always single-component, non-interleaved
            if len(scomp) != 1 or not (1 <= ss <= se <= 63):
                return None
            cs, _td, ta = scomp[0]
            if cs not in idx_of:
                return None
            ci = idx_of[cs]
            _, hi, vi, _ = comps[ci]
            table = huff.get((1, ta))
            if table is None:
                return None
            ch, cw = _comp_block_grid(h, w, hi, vi, hmax, vmax)
            p1, m1 = 1 << al, -(1 << al)
            eobrun = 0
            unit = 0
            for by in range(ch):
                for bx in range(cw):
                    if restart and unit and unit % restart == 0:
                        b0, b1 = r.marker()
                        if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
                            return None
                        eobrun = 0
                    unit += 1
                    zz = coefs[ci][by, bx]
                    if ah == 0:  # ---- first AC scan
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = _read_symbol(r, table)
                            rr, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if rr == 15:  # ZRL
                                    k += 16
                                    continue
                                eobrun = (1 << rr) - 1
                                if rr:
                                    eobrun += r.read(rr)
                                break
                            k += rr
                            if k > se:
                                return None
                            zz[k] = _extend(r.read(s), s) << al
                            k += 1
                    else:  # ---- AC refinement scan
                        k = ss
                        if eobrun:
                            eobrun -= 1
                        else:
                            while k <= se:
                                rs = _read_symbol(r, table)
                                rr, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if rr < 15:  # EOB run
                                        eobrun = (1 << rr) - 1
                                        if rr:
                                            eobrun += r.read(rr)
                                        break
                                    val = 0  # ZRL: 16 zero-history
                                else:
                                    if s != 1:
                                        return None
                                    val = p1 if r.read(1) else m1
                                # advance to the rr-th zero-history slot,
                                # correcting nonzero-history coeffs passed
                                while k <= se:
                                    if zz[k] != 0:
                                        _refine_nonzero(r, zz, k, p1, m1)
                                    else:
                                        if rr == 0:
                                            break
                                        rr -= 1
                                    k += 1
                                if val and k <= se:
                                    zz[k] = val
                                k += 1
                        # band tail: correction bits only
                        while k <= se:
                            if zz[k] != 0:
                                _refine_nonzero(r, zz, k, p1, m1)
                            k += 1

    # ---- reconstruction: dequantize + IDCT every block, then the
    # shared upsample/crop/color tail (planes in frame order)
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        q = qt.get(tq)
        if q is None:
            return None
        arr = coefs[ci]
        by_n, bx_n = arr.shape[:2]
        plane = np.empty((by_n * 8, bx_n * 8))
        for by in range(by_n):
            for bx in range(bx_n):
                coef = np.zeros(64)
                coef[_ZIGZAG] = arr[by, bx] * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _A.T @ coef.reshape(8, 8) @ _A + 128.0
                )
        planes.append(plane)
    return _finish_image(
        planes, [(hi, vi) for _, hi, vi, _ in comps], h, w
    )


def _finish_image(planes, factors, h: int, w: int):
    """Upsample subsampled components by sample replication, crop to
    h x w, and color-convert (planes in Y[,Cb,Cr] order)."""
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    up = []
    for p, (hi, vi) in zip(planes, factors):
        if hi != hmax or vi != vmax:
            p = np.repeat(
                np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1
            )
        up.append(p[:h, :w])
    planes = up
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
