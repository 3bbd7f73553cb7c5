"""Deterministic training-shard layout: the export stage that turns a
curated corpus into the fixed set of shuffled shard files a training run
streams. Two properties matter and both are engine-portable:

- **Deterministic global shuffle** — neighboring source rows (same crawl
  host, same date) must land far apart so a sequential reader sees an
  unbiased stream. An explicit integer mixing function (an LCG step,
  public-domain arithmetic) on the document id gives every row a
  pseudo-random but reproducible sort key: same corpus in, bit-identical
  shard layout out, on any engine — unlike ``rand(seed)``, whose stream
  is engine- and partitioning-dependent.
- **Bounded shard count/size** — shard = key mod n_shards balances to
  |corpus|/n_shards ± noise without any skew handling, because the mixed
  key is uniform even when doc_ids are dense-sequential.

The multiplier/increment pair (1103515245, 12345, mod 2^31) is the
classic portable LCG from the C standard's example generator — chosen
here NOT for statistical strength but because every engine evaluates it
exactly in int64 (doc_id < ~8.3e9 keeps the product under 2^63); the
31-bit fold mirrors operators/sampling.py's overflow-safe key fold.

Scale: assignment is a pure map-side expression; the in-shard position
is one window partitioned by shard (each ~|corpus|/n_shards rows); the
writer does ONE repartition on shard — at 100 TB pick n_shards so a
shard's rows fit an output file target (e.g. 100k shards of ~1 GB), the
same arithmetic at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_A = 1103515245
_C = 12345
_M = 2**31


def shard_key(id_col) -> "F.Column":
    """The mixed 31-bit shuffle key for an integer id column.

    The id is cast to long and folded into 31 bits BEFORE the multiply
    (the sampling.py overflow discipline): Spark 4 runs ANSI mode, so
    an unfolded int32 id would THROW on `id * 1103515245` for any id >=
    2, and a long id >= ~8.4e9 would overflow int64. After the fold the
    product is <= 2^31 * 1.2e9 < 2^62 — exact everywhere. For ids
    already < 2^31 (every fixture and most real doc ids) the fold is
    the identity, so the simple `(id * a + c) % m` oracle form matches
    bit-for-bit."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    folded = F.pmod(c.cast("long"), F.lit(_M))
    return F.pmod(folded * F.lit(_A) + F.lit(_C), F.lit(_M))


def shard_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    with_position: bool = False,
) -> DataFrame:
    """Input columns + ``h`` (mixed key), ``shard`` (0..n_shards-1) and,
    when ``with_position``, the row's 1-based position in its shard's
    deterministic read order (ordered by (h, id) — the global-shuffle
    order a sequential trainer consumes)."""
    clash = {"h", "shard", "position"} & set(df.columns)
    if clash:
        raise ValueError(
            f"shard_assign would overwrite existing column(s) {sorted(clash)}; "
            "rename them before sharding (the output columns h/shard/position "
            "are part of the manifest contract)"
        )
    out = df.withColumn("h", shard_key(id_col)).withColumn(
        "shard", F.pmod(F.col("h"), F.lit(n_shards))
    )
    if with_position:
        w = Window.partitionBy("shard").orderBy("h", id_col)
        out = out.withColumn(
            "position", F.row_number().over(w).cast("long")
        )
    return out


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Write ``df`` as ``path/shard=N/`` parquet in deterministic
    shuffled order and return the manifest (shard, n_rows, h_checksum)
    read back from the written files — the artifact a training job's
    data loader consumes.

    One shuffle total: ``repartition(n_shards, shard)`` co-locates each
    shard into exactly one task whose ``sortWithinPartitions`` fixes the
    in-file row order; ``partitionBy`` then splits files per shard value
    without a second exchange.
    """
    assigned = shard_assign(df, id_col=id_col, n_shards=n_shards)
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("h", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    spark = df.sparkSession
    return (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").cast("bigint").alias("h_checksum"),
        )
    )
