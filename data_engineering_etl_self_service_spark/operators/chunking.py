"""Document chunking and sequence packing for LLM training pipelines.

The reference has no analog (its unit of work is a whole JSON record,
ref: operators/data_quality_operator.py:69); these are the north-star
operators that turn a curated corpus into model-ready inputs:

- :func:`chunk_documents` — split each document into overlapping
  fixed-token-window chunks (the retrieval/embedding unit).
- :func:`pack_sequences` — assign documents to fixed-budget training
  sequences by cumulative token offset: the distributed form of
  "concatenate the corpus, then cut every N tokens".

Both are pure column expressions (tokenize → explode / window cumsum) —
no Python in the hot path, one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Overlapping token-window chunks: (doc_id, chunk_id, chunk_text, n_tok).

    Chunk i covers tokens [i*stride+1, i*stride+chunk_tokens] with
    stride = chunk_tokens - overlap; the last chunk is short rather than
    padded. Chunk count = 1 + ceil(max(0, n-chunk)/stride) so every token is
    covered and a short doc yields exactly one chunk.

    Scale: explode + slice on the already-tokenized array — embarrassingly
    parallel, no shuffle at all. The expansion factor is bounded by
    1/(1-overlap/chunk) ≈ 1.33 at the defaults, not quadratic.
    """
    assert 0 <= overlap < chunk_tokens
    stride = chunk_tokens - overlap
    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("t")
    )
    n = F.size("t")
    extra = F.greatest(n - chunk_tokens, F.lit(0))
    n_chunks = (F.lit(1) + F.floor((extra + (stride - 1)) / F.lit(stride))).cast("int")
    ex = toks.select(
        id_col, "t", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id")
    )
    piece = F.slice("t", F.col("chunk_id") * stride + 1, chunk_tokens)
    return ex.select(
        id_col,
        "chunk_id",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tok"),
    )


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str | None = None,
    seq_tokens: int = 2048,
) -> DataFrame:
    """Assign docs to fixed-budget training sequences by cumulative offset:
    (shard, doc_id, n_tok, start_tok, seq_id) where seq_id =
    floor(start_tok / seq_tokens) in deterministic doc_id order.

    This is "concatenate, then cut every ``seq_tokens``": a doc straddling a
    boundary belongs to the sequence its first token lands in — the packing
    used for pretraining token streams, not first-fit bin packing (which is
    inherently sequential and order-sensitive).

    Scale: the cumsum window runs per ``shard_col`` (e.g. a hash-derived
    shard or language) so no global sort exists; each shard packs
    independently, which is how a 1000-executor run does it anyway. With
    ``shard_col=None`` a single-shard (total-order) demo plan is produced —
    fine for tests, never for 100 TB.
    """
    n_tok = F.size(tokens(F.col(text_col)))
    shard = F.col(shard_col) if shard_col else F.lit(0)
    base = docs.select(
        shard.alias("shard"), F.col(id_col), n_tok.alias("n_tok")
    )
    w = W.partitionBy("shard").orderBy(id_col)
    cum = F.sum("n_tok").over(w)
    return base.select(
        "shard",
        id_col,
        "n_tok",
        (cum - F.col("n_tok")).alias("start_tok"),
        F.floor((cum - F.col("n_tok")) / F.lit(seq_tokens)).alias("seq_id"),
    )
