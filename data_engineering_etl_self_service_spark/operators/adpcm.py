"""IMA ADPCM audio codec — real COMPRESSED-audio sample decode, closing
the gap between the PCM decoders (WAV/FLAC) and the metadata-only
parsers (MP3/MP4/Ogg).

IMA ADPCM (the IMA Digital Audio Focus and Technical Working Group
algorithm, 1992; also RFC 3551 s4.5.1 "DVI4" and the WAV format tag
0x0011) stores one 4-bit sign+magnitude nibble per sample against an
89-entry step-size table and a per-nibble index-adjust table. The whole
codec is exact 16-bit integer arithmetic — no floats anywhere — so the
decoder can be replayed bit-for-bit by a SQL oracle's recursive CTE
(queries.py adpcm_decode_stats) and cross-checked against the stdlib
``audioop`` DVI implementation (tests/test_adpcm.py pins bit-equality
for high-nibble-first streams).

Framing conventions supported:

- raw nibble streams, either nibble order (WAV-IMA packs the FIRST
  sample of a byte in the LOW nibble; ``audioop``/DVI4 packs it HIGH);
- mono WAV files with wFormatTag 0x0011: per-block 4-byte state header
  (int16 predictor, uint8 step index, reserved byte) followed by
  low-first nibble data — each block decodes independently, which is
  exactly what makes the format seekable and, here, partition-parallel.

Scale: decode state is a 2-integer recurrence per stream, so a stream
cannot be split — but rows (files/blocks) are independent, and WAV-IMA
blocks re-seed state per block, so a 100 TB corpus decodes linearly
with zero exchanges: Arrow-batched per-row Python, the same single-scan
plan shape as the other codecs (pinned in tests/test_plans.py for the
query). A C codec would be faster per row; that is a container library
constraint, not a plan defect.
"""

from __future__ import annotations

import struct

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]

INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def decode_nibble(nibble: int, predictor: int, index: int) -> tuple[int, int]:
    """One IMA decode step: ``(new_predictor, new_index)``.

    diff = (step/8) + bit0*(step/4) + bit1*(step/2) + bit2*step, signed
    by bit3; predictor clamps to int16, index to [0, 88]. Pure integer
    arithmetic — the SQL oracle replays this exact function.
    """
    step = STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + INDEX_TABLE[nibble & 7]))
    return predictor, index


def decode_nibbles(
    nibbles: "list[int]", predictor: int = 0, index: int = 0
) -> "list[int]":
    """Decode a nibble sequence to 16-bit samples from the given state."""
    out = []
    for n in nibbles:
        predictor, index = decode_nibble(n, predictor, index)
        out.append(predictor)
    return out


def unpack_nibbles(data: bytes, order: str = "low") -> "list[int]":
    """Split packed bytes into nibbles. ``order='low'`` is the WAV-IMA
    convention (first sample in the low nibble); ``'high'`` is
    DVI4/audioop."""
    out = []
    for byte in data:
        first, second = (byte & 0xF, byte >> 4)
        if order == "high":
            first, second = second, first
        out.append(first)
        out.append(second)
    return out


def decode_ima(
    data: bytes, predictor: int = 0, index: int = 0, order: str = "low"
) -> "list[int]":
    """Decode a packed IMA ADPCM byte stream to 16-bit samples."""
    return decode_nibbles(unpack_nibbles(data, order), predictor, index)


def encode_nibble(sample: int, predictor: int, index: int) -> tuple[int, int, int]:
    """One IMA encode step → ``(nibble, new_predictor, new_index)``.

    The standard quantizer: greedily take step, step/2, step/4 from the
    |delta|, then update state by running the DECODER's reconstruction
    (encoder and decoder stay in lockstep — the property the round-trip
    tests pin)."""
    step = STEP_TABLE[index]
    delta = sample - predictor
    nibble = 0
    if delta < 0:
        nibble = 8
        delta = -delta
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    predictor, index = decode_nibble(nibble, predictor, index)
    return nibble, predictor, index


def encode_ima_state(
    samples: "list[int]", predictor: int = 0, index: int = 0, order: str = "low"
) -> tuple[bytes, int, int]:
    """Encode 16-bit samples → ``(packed bytes, predictor, index)`` —
    the final state lets callers chain blocks (padded with a zero nibble
    if the sample count is odd; the pad does not advance the returned
    state)."""
    nibbles = []
    for s in samples:
        n, predictor, index = encode_nibble(s, predictor, index)
        nibbles.append(n)
    if len(nibbles) % 2:
        nibbles.append(0)
    out = bytearray()
    for i in range(0, len(nibbles), 2):
        first, second = nibbles[i], nibbles[i + 1]
        if order == "high":
            out.append((first << 4) | second)
        else:
            out.append((second << 4) | first)
    return bytes(out), predictor, index


def encode_ima(
    samples: "list[int]", predictor: int = 0, index: int = 0, order: str = "low"
) -> bytes:
    """Encode 16-bit samples to a packed IMA ADPCM byte stream."""
    return encode_ima_state(samples, predictor, index, order)[0]


def build_wav_ima(
    sample_rate: int, samples: "list[int]", block_align: int = 256
) -> bytes:
    """Mono WAV with wFormatTag 0x0011 (IMA ADPCM), hand-packed like
    :func:`multimodal.build_wav`. Each ``block_align``-byte block is a
    4-byte state header (int16 first sample, uint8 index, 0) + low-first
    nibbles; the header SAMPLE is emitted verbatim, so block boundaries
    reset coding error — the seekability contract of the format."""
    samples_per_block = (block_align - 4) * 2 + 1
    blocks = bytearray()
    n = 0
    index = 0
    while n < len(samples):
        chunk = samples[n : n + samples_per_block]
        n += len(chunk)
        first = chunk[0]
        start_index = index
        enc, _, index = encode_ima_state(
            chunk[1:], predictor=first, index=start_index, order="low"
        )
        blocks += struct.pack("<hBB", first, start_index, 0) + enc.ljust(
            block_align - 4, b"\x00"
        )
    data = bytes(blocks)
    byte_rate = sample_rate * block_align // max(samples_per_block, 1)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011, 1, sample_rate, byte_rate, block_align, 4,
        2, samples_per_block,
    )
    fact = struct.pack("<I", len(samples))
    return (
        struct.pack(
            "<4sI4s", b"RIFF",
            4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data), b"WAVE",
        )
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"fact", len(fact))
        + fact
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def read_wav_ima(raw: bytes) -> tuple[int, "list[int]"]:
    """Parse + decode a mono WAV-IMA file → ``(sample_rate, samples)``.

    Walks the RIFF chunks tolerantly (unknown chunks skipped); raises
    ``ValueError`` on a non-IMA format tag so callers can route to the
    PCM path."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    n_samples = None
    while pos + 8 <= len(raw):
        cid, size = struct.unpack_from("<4sI", raw, pos)
        pos += 8
        body = raw[pos : pos + size]
        pos += size + (size & 1)
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and len(body) >= 4:
            n_samples = struct.unpack_from("<I", body, 0)[0]
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 14:
        raise ValueError("fmt chunk too short")
    tag, channels, rate, _br, block_align = struct.unpack_from("<HHIIH", fmt, 0)
    if tag != 0x0011:
        raise ValueError(f"not IMA ADPCM (format tag 0x{tag:04x})")
    if channels != 1:
        raise ValueError("only mono WAV-IMA supported")
    if block_align < 5:
        # 4-byte state header + at least one data byte; 0 would also
        # divide-by-zero below — malformed per spec (review r6c)
        raise ValueError(f"invalid block align {block_align}")
    out: list[int] = []
    for off in range(0, len(data) - (len(data) % block_align), block_align):
        first, index, _ = struct.unpack_from("<hBB", data, off)
        # a corrupt header index (89-255) would index past the step
        # table: clamp — decode of a corrupt block degrades, not raises
        index = min(index, 88)
        out.append(first)
        body = data[off + 4 : off + block_align]
        out.extend(decode_ima(body, predictor=first, index=index, order="low"))
    if n_samples is not None:
        out = out[:n_samples]  # drop decoded pad nibbles (fact chunk)
    return rate, out
