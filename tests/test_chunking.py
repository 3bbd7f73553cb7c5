"""Chunking/packing invariants (SURVEY §5.2 model: edge-case unit tests)."""

import pytest
from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.catalog import load_table
from data_engineering_etl_self_service_spark.functions.text import tokens
from data_engineering_etl_self_service_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_doc_yields_one_full_chunk(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a b c")]), chunk_tokens=64, overlap=16
    ).collect()
    assert len(out) == 1
    assert out[0].chunk_text == "a b c" and out[0].n_tok == 3


def test_chunks_cover_every_token_with_exact_overlap(spark):
    text = " ".join(f"t{i}" for i in range(150))
    rows = chunk_documents(
        _docs(spark, [(7, text)]), chunk_tokens=64, overlap=16
    ).orderBy("chunk_id").collect()
    # stride 48: starts 0, 48, 96 → 3 chunks; last is short (150-96=54)
    assert [r.chunk_id for r in rows] == [0, 1, 2]
    assert [r.n_tok for r in rows] == [64, 64, 54]
    toks = [c for r in rows for c in r.chunk_text.split()]
    assert set(toks) == {f"t{i}" for i in range(150)}
    # consecutive chunks share exactly `overlap` tokens
    a, b = rows[0].chunk_text.split(), rows[1].chunk_text.split()
    assert a[-16:] == b[:16]


def test_boundary_doc_exact_multiple_no_empty_chunk(spark):
    text = " ".join(f"t{i}" for i in range(64))
    rows = chunk_documents(
        _docs(spark, [(1, text)]), chunk_tokens=64, overlap=16
    ).collect()
    assert len(rows) == 1 and rows[0].n_tok == 64


def test_pack_sequences_partitions_token_stream(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(d, shard_col="lang", seq_tokens=2048)
    # start offsets are the exclusive prefix sum of n_tok in doc_id order
    w_ok = packed.filter(F.col("start_tok") < 0).count()
    assert w_ok == 0
    # every doc's seq_id is exactly floor(start/budget)
    bad = packed.filter(
        F.col("seq_id") != F.floor(F.col("start_tok") / 2048)
    ).count()
    assert bad == 0
    # per shard: offsets strictly increase and are dense (no token gaps)
    from pyspark.sql import Window as W

    w = W.partitionBy("shard").orderBy("doc_id")
    gaps = packed.withColumn(
        "expected", F.lag(F.col("start_tok") + F.col("n_tok"), 1, 0).over(w)
    ).filter(F.col("start_tok") != F.col("expected"))
    assert gaps.count() == 0


def test_pack_sequences_budget_respected_in_expectation(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(d, shard_col="lang", seq_tokens=2048)
    # every fully-closed sequence holds ≥ budget tokens counting the
    # straddling doc (concat-then-cut semantics), i.e. the next sequence
    # never starts early
    agg = packed.groupBy("shard", "seq_id").agg(
        F.min("start_tok").alias("lo"), F.max(F.col("start_tok")).alias("hi")
    )
    bad = agg.filter(F.col("lo") < F.col("seq_id") * 2048).count()
    assert bad == 0
