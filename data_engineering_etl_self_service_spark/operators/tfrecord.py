"""TFRecord ingestion — the TensorFlow training-shard container, the
other half of the ML-native shard pair beside WebDataset
(operators/archive.py). Everything here is the public on-disk format:

- framing (TFRecord spec): ``uint64 length | uint32 masked_crc(length)
  | payload | uint32 masked_crc(payload)`` where the CRC is CRC-32C
  (Castagnoli) and ``mask(c) = ((c >> 15 | c << 17) + 0xa282ead8)
  mod 2^32``;
- payload: a ``tf.train.Example`` protobuf — parsed by a hand-rolled
  decoder for the wire format subset Examples use (varints,
  length-delimited nested messages, the Features map, BytesList /
  Int64List / FloatList). Protobuf wire format is public
  (developers.google.com/protocol-buffers/docs/encoding).

CRC-32C is implemented with the software table (the same polynomial
0x82F63B78 every library uses); the public test vector
crc32c("123456789") == 0xE3069283 is pinned in tests/test_tfrecord.py.

Corrupt framing or a failed CRC ends/flags the walk instead of raising
— the dirty-corpus property. Records are independent; a shard file
splits at record boundaries, so ingestion parallelizes per shard like
WebDataset/WAV-IMA.

Scale: per-row Python over Arrow batches, shuffle-free and linear.
"""

from __future__ import annotations

import struct

# ------------------------------------------------------------- crc32c

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ----------------------------------------------------- protobuf wire


def _varint(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _bytes_list(values: "list[bytes]") -> bytes:
    return b"".join(_len_delim(1, v) for v in values)


def _int64_list(values: "list[int]") -> bytes:
    # packed repeated varints (field 1)
    packed = b"".join(_varint(v & 0xFFFFFFFFFFFFFFFF) for v in values)
    return _len_delim(1, packed)


def _float_list(values: "list[float]") -> bytes:
    return _len_delim(1, b"".join(struct.pack("<f", v) for v in values))


def build_example(features: dict) -> bytes:
    """Serialize a ``tf.train.Example``: ``features`` maps name →
    list[bytes] | list[int] | list[float] (type decides the Feature
    kind). Map entries are emitted in sorted-name order
    (deterministic)."""
    entries = b""
    for name in sorted(features):
        values = features[name]
        if values and isinstance(values[0], bytes):
            feat = _len_delim(1, _bytes_list(values))
        elif values and isinstance(values[0], float):
            feat = _len_delim(2, _float_list(values))
        else:
            feat = _len_delim(3, _int64_list(values))
        entry = _len_delim(1, name.encode()) + _len_delim(2, feat)
        entries += _len_delim(1, entry)
    return _len_delim(1, entries)  # Example.features (field 1)


def parse_example(buf: bytes) -> dict:
    """Decode the Example subset → {name: list of values}. Malformed
    bytes (bad varints, unknown wire types, truncated fields) degrade
    to whatever decoded before the fault — never raise; pair with the
    framing CRCs to detect corruption."""

    def walk_msg(b: bytes):
        pos = 0
        while pos < len(b):
            tag, pos = _read_varint(b, pos)
            num, wire = tag >> 3, tag & 7
            if wire == 2:
                ln, pos = _read_varint(b, pos)
                yield num, b[pos : pos + ln]
                pos += ln
            elif wire == 0:
                v, pos = _read_varint(b, pos)
                yield num, v
            elif wire == 5:
                yield num, b[pos : pos + 4]
                pos += 4
            elif wire == 1:
                yield num, b[pos : pos + 8]
                pos += 8
            else:
                raise ValueError(f"unsupported wire type {wire}")

    out: dict = {}
    try:
        for num, features_buf in walk_msg(buf):
            # garbage can encode any field with any wire type: only
            # recurse into length-delimited (bytes) values
            if num != 1 or not isinstance(features_buf, bytes):
                continue
            for enum, entry in walk_msg(features_buf):
                if enum != 1 or not isinstance(entry, bytes):
                    continue
                name = None
                values: list = []
                for fnum, fval in walk_msg(entry):
                    if not isinstance(fval, bytes):
                        continue
                    if fnum == 1:
                        name = fval.decode("utf-8", "replace")
                    elif fnum == 2:
                        for knum, kbuf in walk_msg(fval):
                            if not isinstance(kbuf, bytes):
                                continue
                            if knum == 1:  # BytesList
                                values = [
                                    v
                                    for n2, v in walk_msg(kbuf)
                                    if n2 == 1 and isinstance(v, bytes)
                                ]
                            elif knum == 3:  # Int64List (packed field 1)
                                for n2, packed in walk_msg(kbuf):
                                    if n2 != 1 or not isinstance(
                                        packed, bytes
                                    ):
                                        continue
                                    p = 0
                                    while p < len(packed):
                                        v, p = _read_varint(packed, p)
                                        if v >= 1 << 63:
                                            v -= 1 << 64
                                        values.append(v)
                            elif knum == 2:  # FloatList (packed field 1)
                                for n2, packed in walk_msg(kbuf):
                                    if n2 == 1 and isinstance(packed, bytes):
                                        values = [
                                            struct.unpack_from(
                                                "<f", packed, o
                                            )[0]
                                            for o in range(0, len(packed), 4)
                                        ]
                if name is not None:
                    out[name] = values
    except (ValueError, IndexError, TypeError):
        pass
    return out


# ------------------------------------------------------------ framing


def build_tfrecord(payloads: "list[bytes]") -> bytes:
    out = bytearray()
    for p in payloads:
        header = struct.pack("<Q", len(p))
        out += header
        out += struct.pack("<I", masked_crc(header))
        out += p
        out += struct.pack("<I", masked_crc(p))
    return bytes(out)


def iter_tfrecord(raw: bytes):
    """Yield ``{"payload", "len_crc_ok", "data_crc_ok"}`` per record;
    a malformed header or truncated record ends the walk."""
    pos = 0
    while pos + 12 <= len(raw):
        header = raw[pos : pos + 8]
        (length,) = struct.unpack("<Q", header)
        (len_crc,) = struct.unpack("<I", raw[pos + 8 : pos + 12])
        pos += 12
        if pos + length + 4 > len(raw) or length > len(raw):
            return
        payload = raw[pos : pos + length]
        (data_crc,) = struct.unpack("<I", raw[pos + length : pos + length + 4])
        pos += length + 4
        yield {
            "payload": payload,
            "len_crc_ok": masked_crc(header) == len_crc,
            "data_crc_ok": masked_crc(payload) == data_crc,
        }


def tfrecord_example_rows(df, col: str = "data", id_col: str = "doc_id"):
    """Explode one-TFRecord-shard-per-row ``df`` into Example rows:
    Arrow-batched ``mapInPandas``, single scan stage, no exchange (the
    tar_member_rows shape from operators/archive.py). Per record:
    position, both CRC verdicts, the feature-name inventory, and the
    first bytes feature decoded as text (the usual text-corpus layout);
    carry full payloads through :func:`parse_example` in a downstream
    stage when typed features are needed."""

    def explode(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[col]):
                for pos, rec in enumerate(iter_tfrecord(bytes(blob))):
                    feats = parse_example(rec["payload"])
                    text = ""
                    for vals in feats.values():
                        if vals and isinstance(vals[0], bytes):
                            text = vals[0].decode("utf-8", "replace")
                            break
                    rows.append(
                        {
                            id_col: rid,
                            "record_pos": pos,
                            "crc_ok": rec["len_crc_ok"]
                            and rec["data_crc_ok"],
                            "feature_names": ",".join(sorted(feats)),
                            "text": text,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "record_pos", "crc_ok", "feature_names", "text",
                ],
            )

    return df.mapInPandas(
        explode,
        f"{id_col} long, record_pos long, crc_ok boolean, "
        "feature_names string, text string",
    )
