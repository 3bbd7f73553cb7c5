"""Ogg container metadata parser (public RFC 3533 page framing +
Vorbis I / Opus (RFC 7845) identification headers). NO audio decode —
the same scope line as operators/mp3.py / mp4.py: curation needs codec,
channels, rate, and duration, all of which live in the page headers and
the first packet.

With this, every container in the multimodal sniff table
(wav/bmp/ppm/png/gif/jpeg/flac/mp3/mp4/ogg) yields typed rows.

- :func:`parse_ogg` walks page boundaries (capture pattern, version 0,
  segment-table sizing), CRC-checked structurally by framing, reads the
  first packet's identification header (``\\x01vorbis`` → channels +
  sample rate; ``OpusHead`` → channels + pre-skip + input rate), counts
  pages and streams, and derives duration from the last page's granule
  position (Vorbis: PCM samples at the id rate; Opus: 48 kHz ticks
  minus pre-skip per RFC 7845 §4). Returns None for non-Ogg bytes.
- :func:`build_ogg` emits a deterministic page sequence carrying a
  Vorbis or Opus id header plus empty audio pages with chosen granule
  positions — the encoder-exercises-parser strategy of the sibling
  modules. Page CRCs use the Ogg CRC-32 (poly 0x04C11DB7, no
  reflection), which the parser verifies.
"""

from __future__ import annotations

import struct

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = (
                    ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF
                    if r & 0x80000000
                    else (r << 1) & 0xFFFFFFFF
                )
            _CRC_TABLE.append(r)
    return _CRC_TABLE


def _ogg_crc(data: bytes) -> int:
    table = _crc_table()
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ table[((crc >> 24) & 0xFF) ^ b]
    return crc


def _page(
    serial: int,
    seq: int,
    granule: int,
    packet: bytes,
    header_type: int,
) -> bytes:
    # lacing: 255-valued segments + terminator
    lace = []
    n = len(packet)
    while n >= 255:
        lace.append(255)
        n -= 255
    lace.append(n)
    hdr = (
        b"OggS"
        + bytes([0, header_type])
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes([len(lace)])
        + bytes(lace)
    )
    page = bytearray(hdr + packet)
    struct.pack_into("<I", page, 22, _ogg_crc(bytes(page)))
    return bytes(page)


def build_ogg(
    codec: str = "vorbis",
    channels: int = 2,
    sample_rate: int = 44100,
    final_granule: int = 441000,
    n_audio_pages: int = 3,
    serial: int = 1,
    pre_skip: int = 312,
) -> bytes:
    """Deterministic Ogg stream: BOS page with the codec id header,
    ``n_audio_pages`` empty continuation pages with evenly spaced
    granule positions ending at ``final_granule``, EOS flagged last."""
    if codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + struct.pack("<IB", 0, channels)
            + struct.pack("<I", sample_rate)
            + struct.pack("<iii", 0, 0, 0)
            + bytes([0x2C, 0x01])
        )
    elif codec == "opus":
        ident = (
            b"OpusHead"
            + bytes([1, channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", sample_rate)
            + struct.pack("<hB", 0, 0)
        )
    else:
        raise ValueError(f"unknown codec {codec!r}")
    out = bytearray(_page(serial, 0, 0, ident, 0x02))  # BOS
    for i in range(1, n_audio_pages + 1):
        granule = final_granule * i // n_audio_pages
        flags = 0x04 if i == n_audio_pages else 0x00  # EOS on last
        out += _page(serial, i, granule, b"", flags)
    return bytes(out)


def parse_ogg(raw: bytes):
    """Ogg metadata → dict or None.

    Keys: codec ('vorbis'/'opus'/'unknown'), channels, sample_rate,
    n_pages, n_streams, last_granule, duration_ms (Vorbis: granule /
    rate; Opus: (granule - pre_skip) / 48000 per RFC 7845; None when
    the codec or rate is unknown).

    Never raises on arbitrary bytes (mapInPandas safety — an escaped
    exception on one malformed file would kill the whole task).
    """
    try:
        return _parse_ogg(raw)
    except (struct.error, IndexError, ValueError, OverflowError):
        return None


def _parse_ogg(raw: bytes):
    raw = bytes(raw)
    if raw[:4] != b"OggS":
        return None
    pos = 0
    codec = "unknown"
    channels = None
    rate = None
    pre_skip = 0
    n_pages = 0
    serials = set()
    last_granule = None
    while pos + 27 <= len(raw):
        if raw[pos : pos + 4] != b"OggS" or raw[pos + 4] != 0:
            break
        (granule,) = struct.unpack_from("<q", raw, pos + 6)
        serial, _seq = struct.unpack_from("<II", raw, pos + 14)
        (crc,) = struct.unpack_from("<I", raw, pos + 22)
        nseg = raw[pos + 26]
        lace = raw[pos + 27 : pos + 27 + nseg]
        if len(lace) < nseg:
            break
        body_len = sum(lace)
        end = pos + 27 + nseg + body_len
        if end > len(raw):
            break  # truncated final page: count complete pages only
        page = bytearray(raw[pos:end])
        struct.pack_into("<I", page, 22, 0)
        if _ogg_crc(bytes(page)) != crc:
            break  # corrupt page
        body = raw[pos + 27 + nseg : end]
        if n_pages == 0:
            if body.startswith(b"\x01vorbis") and len(body) >= 16:
                codec = "vorbis"
                channels = body[11]
                (rate,) = struct.unpack_from("<I", body, 12)
            elif body.startswith(b"OpusHead") and len(body) >= 16:
                codec = "opus"
                channels = body[9]
                (pre_skip,) = struct.unpack_from("<H", body, 10)
                (rate,) = struct.unpack_from("<I", body, 12)
        n_pages += 1
        serials.add(serial)
        if granule >= 0:
            last_granule = granule
        pos = end
    if n_pages == 0:
        return None
    duration_ms = None
    if last_granule is not None:
        if codec == "vorbis" and rate:
            duration_ms = last_granule * 1000 // rate
        elif codec == "opus":
            duration_ms = max(0, last_granule - pre_skip) * 1000 // 48000
    return {
        "codec": codec,
        "channels": channels,
        "sample_rate": rate,
        "pre_skip": pre_skip,
        "n_pages": n_pages,
        "n_streams": len(serials),
        "last_granule": last_granule,
        "duration_ms": duration_ms,
    }
