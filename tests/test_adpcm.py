"""IMA ADPCM codec (operators/adpcm.py): audioop bit-interop, encoder/
decoder lockstep round-trips, WAV-IMA container round-trip, malformed
input tolerance."""

from __future__ import annotations

import math
import struct

import pytest

from data_engineering_etl_self_service_spark.operators.adpcm import (
    STEP_TABLE,
    build_wav_ima,
    decode_ima,
    decode_nibbles,
    encode_ima,
    encode_ima_state,
    read_wav_ima,
    unpack_nibbles,
)


def _sine(n, amp=12000, period=10.0):
    return [int(amp * math.sin(i / period)) for i in range(n)]


def test_audioop_decoder_bit_interop():
    """Our decoder reproduces stdlib audioop.adpcm2lin bit-for-bit on
    audioop-encoded streams (DVI4 packing: high nibble first)."""
    audioop = pytest.importorskip("audioop")
    for seed in range(5):
        samples = [
            ((i * (seed * 7 + 3) * 257) % 60001) - 30000 for i in range(200)
        ]
        pcm = struct.pack(f"<{len(samples)}h", *samples)
        enc, _ = audioop.lin2adpcm(pcm, 2, None)
        ref = struct.unpack(
            f"<{len(samples)}h", audioop.adpcm2lin(enc, 2, None)[0]
        )
        ours = decode_ima(enc, predictor=0, index=0, order="high")
        assert tuple(ours) == ref


def test_encoder_decoder_lockstep_roundtrip():
    """decode(encode(x)) tracks x within the quantizer's step bound at
    every position once the step table has ramped."""
    samples = _sine(400)
    enc = encode_ima(samples)
    dec = decode_ima(enc)[: len(samples)]
    assert len(dec) == len(samples)
    # after the ramp-in, error is bounded by the local step size
    errs = [abs(a - b) for a, b in zip(samples[50:], dec[50:])]
    assert max(errs) < 2000
    # and the reconstruction correlates strongly
    num = sum(a * b for a, b in zip(samples, dec))
    den = math.sqrt(
        sum(a * a for a in samples) * max(sum(b * b for b in dec), 1)
    )
    assert num / den > 0.99


def test_encode_state_chaining_matches_one_shot():
    """Encoding two halves with carried state equals one-shot encoding
    (even split so no pad nibble interferes)."""
    samples = _sine(300)
    one = encode_ima(samples)
    first, pred, idx = encode_ima_state(samples[:150])
    second = encode_ima(samples[150:], predictor=pred, index=idx)
    assert one == first + second


def test_nibble_orders_roundtrip():
    nibbles = [(i * 7 + 3) % 16 for i in range(64)]
    for order in ("low", "high"):
        packed = bytearray()
        for i in range(0, 64, 2):
            a, b = nibbles[i], nibbles[i + 1]
            packed.append(((b << 4) | a) if order == "low" else ((a << 4) | b))
        assert unpack_nibbles(bytes(packed), order) == nibbles


def test_decoder_clamps_and_index_bounds():
    """All-max nibbles saturate the predictor at int16 bounds and the
    index at 88 without overflow; all-min stay at index 0."""
    up = decode_nibbles([7] * 200, predictor=0, index=0)
    assert max(up) == 32767
    down = decode_nibbles([15] * 200, predictor=0, index=0)
    assert min(down) == -32768
    tiny = decode_nibbles([0] * 50, predictor=5, index=0)
    assert all(abs(s - 5) <= STEP_TABLE[0] for s in tiny)


def test_wav_ima_roundtrip_exact_count_and_block_reseed():
    samples = _sine(1200, amp=9000, period=23.0)
    raw = build_wav_ima(8000, samples, block_align=256)
    rate, dec = read_wav_ima(raw)
    assert rate == 8000
    assert len(dec) == len(samples)  # fact chunk truncates pad nibbles
    # block-leading samples are stored verbatim in the block header
    spb = (256 - 4) * 2 + 1
    for b in range(0, len(samples), spb):
        assert dec[b] == samples[b]
    errs = [abs(a - b) for a, b in zip(samples[50:], dec[50:])]
    assert max(errs) < 2000


def test_wav_ima_rejects_pcm_and_garbage():
    from data_engineering_etl_self_service_spark.operators.multimodal import (
        build_wav,
    )

    with pytest.raises(ValueError):
        read_wav_ima(build_wav(8000, [0, 1, 2, 3]))
    with pytest.raises(ValueError):
        read_wav_ima(b"not a riff file at all")
    # truncated mid-chunk: tolerant walk, missing data chunk -> ValueError
    good = build_wav_ima(8000, _sine(100))
    with pytest.raises(ValueError):
        read_wav_ima(good[:20])


def test_wav_ima_malformed_headers_degrade_or_valueerror():
    """Corrupt fmt/block headers follow the documented contract: bad
    structure -> ValueError; corrupt per-block index -> clamped decode,
    never IndexError/ZeroDivisionError."""
    good = bytearray(build_wav_ima(8000, _sine(600), block_align=256))
    # block_align = 0 in the fmt chunk
    import struct as _s

    fmt_off = good.index(b"fmt ") + 8
    bad_align = bytearray(good)
    _s.pack_into("<H", bad_align, fmt_off + 12, 0)
    with pytest.raises(ValueError):
        read_wav_ima(bytes(bad_align))
    # corrupt step index (200) in the first block header
    data_off = good.index(b"data") + 8
    bad_idx = bytearray(good)
    bad_idx[data_off + 2] = 200
    rate, dec = read_wav_ima(bytes(bad_idx))  # degrades, no raise
    assert rate == 8000 and len(dec) == 600
    # truncated fmt chunk
    short_fmt = good[: fmt_off + 4]
    with pytest.raises(ValueError):
        read_wav_ima(bytes(short_fmt))
