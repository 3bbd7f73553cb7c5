"""MP3 frame-header / Xing metadata parser (public ISO/IEC 11172-3 +
de-facto Xing/Info VBR tag layout). NO audio decode — MDCT synthesis is
the documented out-of-scope line; what corpora actually need from MP3 at
curation time is metadata (codec params, duration, CBR/VBR) to filter,
bucket and bill audio, and that is fully derivable from frame headers.

Closes the "one major audio container still opaque" gap in the
multimodal sniff table (VERDICT r3 #8): MP3 payloads now yield typed
rows (sample_rate, channels, n_frames, duration) instead of
kind-only.

- :func:`parse_mp3` reads ID3v2.3/2.4 text frames (title/artist/album —
  the id3.org de-facto spec; round 5, previously the tag was only
  skipped), validates the first frame header (sync, MPEG version,
  layer III, bitrate/samplerate indices), walks EVERY frame (exact
  frame count — robust against truncation; walking is O(file) with
  O(1) state), and reads a Xing/Info tag from the first frame's
  side-info offset when present (VBR frame totals). Returns None for
  non-MP3 / corrupt bytes; a malformed ID3 tag degrades to
  None-valued text fields, never to a rejected file.
- :func:`build_mp3` emits deterministic frame sequences (zero payload,
  valid headers, optional Xing tag, optional ID3v2.3/2.4 tag via
  :func:`build_id3v2`) so the parser is testable without a real
  encoder in the container — the same encoder-exercises-decoder
  strategy as operators/jpeg.py / flac.py.
"""

from __future__ import annotations

import struct

#: MPEG-1 Layer III bitrates (kbps) by header index 1-14
_BITRATES_V1L3 = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
#: MPEG-2/2.5 Layer III bitrates (kbps)
_BITRATES_V2L3 = [
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
]
#: sample rates by (version key, index)
_RATES = {
    "1": [44100, 48000, 32000],
    "2": [22050, 24000, 16000],
    "2.5": [11025, 12000, 8000],
}
#: samples per Layer-III frame
_SPF = {"1": 1152, "2": 576, "2.5": 576}


def _header(version: str, bitrate_idx: int, rate_idx: int, pad: int,
            mono: bool) -> bytes:
    ver_bits = {"1": 0b11, "2": 0b10, "2.5": 0b00}[version]
    b0 = 0xFF
    b1 = 0xE0 | (ver_bits << 3) | (0b01 << 1) | 1  # layer III, no CRC
    b2 = (bitrate_idx << 4) | (rate_idx << 2) | (pad << 1)
    b3 = (0b11 if mono else 0b00) << 6  # mono / stereo
    return bytes([b0, b1, b2, b3])


def _frame_len(version: str, bitrate_kbps: int, rate: int, pad: int) -> int:
    coef = 144 if version == "1" else 72  # Layer III
    return (coef * bitrate_kbps * 1000) // rate + pad


def _xing_offset(version: str, mono: bool) -> int:
    """Side-info size after the 4-byte header — where Xing/Info lives."""
    if version == "1":
        return 17 if mono else 32
    return 9 if mono else 17


#: ID3v2 text-frame ids surfaced as typed fields (id3.org v2.3/v2.4).
_ID3_TEXT_FRAMES = {"TIT2": "title", "TPE1": "artist", "TALB": "album"}


def _syncsafe(n: int) -> bytes:
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def build_id3v2(
    tags: dict, id3_version: int = 3, encoding: int | None = None
) -> bytes:
    """An ID3v2.3 or v2.4 tag carrying text frames (``{"TIT2": "...",
    ...}``). ``encoding``: 0 latin-1, 1 UTF-16+BOM, 3 UTF-8
    (v2.4 only); default picks 1 for v2.3 and 3 for v2.4 so both
    multibyte paths are exercised. Frame sizes are plain big-endian in
    v2.3 and syncsafe in v2.4, per the spec split parsers routinely get
    wrong — the builder emits each version's correct layout."""
    if id3_version not in (3, 4):
        raise ValueError("id3_version must be 3 or 4")
    if encoding is None:
        encoding = 1 if id3_version == 3 else 3
    body = bytearray()
    for fid, text in tags.items():
        if encoding == 0:
            payload = bytes([0]) + text.encode("latin-1")
        elif encoding == 1:
            payload = bytes([1]) + text.encode("utf-16")  # BOM included
        elif encoding == 3 and id3_version == 4:
            payload = bytes([3]) + text.encode("utf-8")
        else:
            raise ValueError(f"encoding {encoding} invalid for v2.{id3_version}")
        size = (
            _syncsafe(len(payload))
            if id3_version == 4
            else struct.pack(">I", len(payload))
        )
        body += fid.encode("ascii") + size + b"\x00\x00" + payload
    return (
        b"ID3"
        + bytes([id3_version, 0, 0])
        + _syncsafe(len(body))
        + bytes(body)
    )


def build_mp3(
    version: str = "1",
    bitrate_idx: int = 9,
    rate_idx: int = 0,
    mono: bool = False,
    n_frames: int = 8,
    xing: bool = False,
    tags: dict | None = None,
    id3_version: int = 3,
) -> bytes:
    """Deterministic MP3 byte stream: ``n_frames`` Layer-III frames with
    valid headers and zeroed payloads; when ``xing`` is set, frame 0
    carries a Xing tag declaring the total frame count (the VBR
    convention — players then ignore frame 0's own bitrate); ``tags``
    prepends an ID3v2 tag (:func:`build_id3v2`)."""
    version = str(version)
    table = _BITRATES_V1L3 if version == "1" else _BITRATES_V2L3
    kbps = table[bitrate_idx]
    rate = _RATES[version][rate_idx]
    out = bytearray()
    if tags:
        out += build_id3v2(tags, id3_version)
    for fi in range(n_frames):
        hdr = _header(version, bitrate_idx, rate_idx, 0, mono)
        ln = _frame_len(version, kbps, rate, 0)
        body = bytearray(ln - 4)
        if xing and fi == 0:
            off = _xing_offset(version, mono)
            body[off : off + 4] = b"Xing"
            # flags: frames(0x1) | bytes(0x2)
            body[off + 4 : off + 8] = struct.pack(">I", 0x3)
            body[off + 8 : off + 12] = struct.pack(">I", n_frames)
            total = ln * n_frames  # constant frame size here
            body[off + 12 : off + 16] = struct.pack(">I", total)
        out += hdr + body
    return bytes(out)


def parse_mp3(raw: bytes):
    """Parse MP3 metadata → dict or None (not an MP3 / corrupt).

    Never raises on arbitrary bytes — this runs inside mapInPandas
    tasks where an escaped exception kills the whole job (an adversarial
    corpus WILL contain a file that trips any unguarded read; e.g. a
    final minimum-size frame whose Xing frames field crosses EOF).

    Keys: version ('1'/'2'/'2.5'), bitrate_kbps (first frame's),
    sample_rate, channels (1/2), n_frames (exact, from walking),
    xing_frames (Xing/Info tag total, or None), vbr (bool: any frame's
    bitrate differs from the first), duration_ms (integer:
    frames * samples_per_frame * 1000 // sample_rate, preferring the
    Xing total when present), title/artist/album (ID3v2.3/2.4 TIT2/
    TPE1/TALB text frames, None when absent or malformed).
    """
    try:
        return _parse_mp3(raw)
    except (struct.error, IndexError, ValueError, OverflowError):
        return None


def _id3_text_frames(raw: bytes, major: int, end: int) -> dict:
    """title/artist/album from an ID3v2.3/2.4 frame walk over
    raw[10:end]. Best-effort: anything malformed stops the walk with
    whatever decoded so far (a broken tag must not reject the audio)."""
    fields: dict = {}
    if major not in (3, 4) or (raw[5] & 0x80):  # unsynchronised: skip
        return fields
    pos = 10
    while pos + 10 <= end:
        fid = raw[pos : pos + 4]
        if not fid.strip(b"\x00"):
            break  # zero padding reached
        if major == 4:
            size = 0
            for b in raw[pos + 4 : pos + 8]:
                if b & 0x80:
                    return fields  # not syncsafe: malformed
                size = (size << 7) | b
        else:
            size = struct.unpack_from(">I", raw, pos + 4)[0]
        frame_end = pos + 10 + size
        if size <= 0 or frame_end > end:
            break
        name = _ID3_TEXT_FRAMES.get(fid.decode("ascii", "replace"))
        if name is not None and name not in fields:
            enc = raw[pos + 10]
            body = raw[pos + 11 : frame_end]
            codec = {
                0: "latin-1",
                1: "utf-16",
                2: "utf-16-be",
                3: "utf-8",
            }.get(enc)
            if codec is not None:
                try:
                    fields[name] = body.decode(codec).rstrip("\x00")
                except UnicodeDecodeError:
                    pass
        pos = frame_end
    return fields


def _parse_mp3(raw: bytes):
    pos = 0
    id3_fields: dict = {}
    if raw[:3] == b"ID3" and len(raw) >= 10:
        # syncsafe 28-bit size, then the tag body
        size = 0
        for b in raw[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
        id3_fields = _id3_text_frames(raw, raw[3], min(pos, len(raw)))
    if pos + 4 > len(raw):
        return None
    first = _parse_header(raw, pos)
    if first is None:
        return None
    version, kbps, rate, mono, _pad, _ln = first
    n_frames = 0
    xing_frames = None
    vbr = False
    while pos + 4 <= len(raw):
        h = _parse_header(raw, pos)
        if h is None:
            break  # trailing garbage / ID3v1 tag
        v, k, r, m, pad, ln = h
        if (v, r, m) != (version, rate, mono):
            break  # stream parameters must not change mid-file
        if pos + ln > len(raw):
            break  # truncated final frame: count COMPLETE frames only
        if k != kbps:
            vbr = True
        if n_frames == 0:
            off = pos + 4 + _xing_offset(version, mono)
            tag = raw[off : off + 4]
            # bounds: a minimum-size frame can place the tag fields past
            # EOF — that's "no usable tag", not a corrupt file
            if tag in (b"Xing", b"Info") and off + 12 <= len(raw):
                flags = struct.unpack_from(">I", raw, off + 4)[0]
                if flags & 0x1:
                    xing_frames = struct.unpack_from(">I", raw, off + 8)[0]
        n_frames += 1
        pos += ln
    if n_frames == 0:
        return None
    spf = _SPF[version]
    frames_for_duration = (
        xing_frames if xing_frames is not None else n_frames
    )
    return {
        "version": version,
        "bitrate_kbps": kbps,
        "sample_rate": rate,
        "channels": 1 if mono else 2,
        "n_frames": n_frames,
        "xing_frames": xing_frames,
        "vbr": vbr,
        "duration_ms": frames_for_duration * spf * 1000 // rate,
        "title": id3_fields.get("title"),
        "artist": id3_fields.get("artist"),
        "album": id3_fields.get("album"),
    }


def _parse_header(raw: bytes, pos: int):
    if pos + 4 > len(raw) or raw[pos] != 0xFF or (raw[pos + 1] & 0xE0) != 0xE0:
        return None
    b1, b2, b3 = raw[pos + 1], raw[pos + 2], raw[pos + 3]
    ver_bits = (b1 >> 3) & 0x3
    layer_bits = (b1 >> 1) & 0x3
    if layer_bits != 0b01:
        return None  # Layer III only
    version = {0b11: "1", 0b10: "2", 0b00: "2.5"}.get(ver_bits)
    if version is None:
        return None
    bitrate_idx = (b2 >> 4) & 0xF
    rate_idx = (b2 >> 2) & 0x3
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None  # free-format / invalid
    table = _BITRATES_V1L3 if version == "1" else _BITRATES_V2L3
    kbps = table[bitrate_idx]
    rate = _RATES[version][rate_idx]
    pad = (b2 >> 1) & 0x1
    mono = ((b3 >> 6) & 0x3) == 0b11
    ln = _frame_len(version, kbps, rate, pad)
    if ln < 4:
        return None
    return version, kbps, rate, mono, pad, ln
