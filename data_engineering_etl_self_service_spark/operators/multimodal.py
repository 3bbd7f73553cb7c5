"""Multimodal column handling: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB:

- payloads live in a ``binary`` column (or a lake URI column for >~1 MB
  assets), metadata in sibling typed columns — so relational ops (dedup by
  payload hash, filtering by size/format) stay columnar and never decode;
- decode / feature-extract runs as Arrow-batched ``mapInPandas`` so the
  Python worker sees whole batches, not rows, and the schema is declared up
  front (the plan stays exact for Catalyst);
- the actual codec calls are STUBBED here (no image/audio libs in this
  container): ``decode_stub=True`` produces a deterministic fake feature
  vector from the payload bytes; ``decode_stub=False`` raises
  ``NotImplementedError`` at the exact integration point a real codec
  (Pillow/torchaudio/decord) would plug into. The Spark-side plumbing —
  schema, batching, partition flow — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: magic-byte prefixes → format tag (standard public file signatures)
MAGIC_PREFIXES: tuple[tuple[bytes, str], ...] = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),  # wav/avi container
    (b"OggS", "ogg"),
    (b"fLaC", "flac"),
    (b"\x00\x00\x00\x18ftyp", "mp4"),
)


def attach_binary_metadata(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Columnar (no-decode) metadata: byte size, content hash, format sniff.

    Pure built-in expressions over the binary column — this is the cheap
    pass that dedup/filtering runs on before ANY decode happens.
    """
    p = F.col(payload_col)
    fmt = F.lit("unknown")
    for prefix, tag in reversed(MAGIC_PREFIXES):
        hex_prefix = prefix.hex()
        fmt = F.when(
            F.lower(F.hex(F.substring(p, 1, len(prefix)))) == hex_prefix, F.lit(tag)
        ).otherwise(fmt)
    return (
        df.withColumn("n_bytes", F.length(p))
        .withColumn("payload_sha", F.sha2(p, 256))
        .withColumn("format", fmt)
    )


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    Output schema: (id, n_bytes, features array<float>). With
    ``decode_stub`` the "features" are a deterministic function of the
    payload's sha256 — stable across runs/partitionings, so tests can assert
    exact values while the real codec stays pluggable.
    """
    out_schema = f"{id_col} long, n_bytes long, features array<float>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            if not decode_stub:
                raise NotImplementedError(
                    "real codec integration point: decode payload bytes "
                    "(e.g. PIL.Image.open / torchaudio.load) and extract features"
                )
            feats = []
            for raw in payloads:
                h = hashlib.sha256(bytes(raw)).digest()
                feats.append(
                    [round(b / 255.0, 6) for b in h[:feature_dim]]
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "features": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
    decode_stub: bool = True,
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    The stub emits ``n_bytes // (every_n * 100) + 1`` fake frames per
    payload with deterministic frame hashes; a real build swaps the body for
    a decord/pyav loop. Schema and fan-out shape (1 row in → N rows out via
    ``mapInPandas``) are the production contract.
    """
    out_schema = f"{id_col} long, frame_idx int, frame_sha string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real codec integration point: demux container, decode "
                    "every_n-th frame"
                )
            ids, idxs, shas = [], [], []
            for _id, raw in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(raw)
                n_frames = len(raw) // (every_n * 100) + 1
                for i in range(n_frames):
                    ids.append(_id)
                    idxs.append(i * every_n)
                    shas.append(
                        hashlib.sha256(raw + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_sha": shas}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)
