"""Table catalog over the driver-provided parquet lake.

The reference's "catalog" is a filesystem convention — date-partitioned S3
prefixes (ref: configs/sources/marketing_api_campaigns.yaml:25,
operators/api_to_s3.py:68-73). Here the lake is a directory of parquet
files; reads are schema-on-read columnar scans so Catalyst gets predicate
pushdown + column pruning for free.

At 100 TB each table would be a partitioned (and for the big fact tables,
bucketed) parquet/iceberg dataset; ``load_table`` stays the single
entry-point so that swap is one line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should be broadcast in joins at any scale.
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one lake table as a DataFrame (columnar parquet scan).

    Nanosecond-timestamp parquet (INT64 TIMESTAMP(NANOS), as in the
    ``events`` table) is illegal for Spark's reader by default; we read the
    raw nanos as long (``nanosAsLong``) and convert with INTEGER division —
    ns values ~1.7e18 exceed double's exact range, so ``div``/``floor`` on
    longs is the only drift-free conversion (and matches DuckDB's own
    ns→µs truncation).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # µs-precision parquet with isAdjustedToUTC=false reads as
            # TIMESTAMP_NTZ under inferTimestampNTZ (Spark 3.4+ default).
            # The session zone is pinned to UTC, so this cast re-labels the
            # same instant as TIMESTAMP (LTZ) without shifting the value —
            # matching DuckDB, which reads the file as naive TIMESTAMP.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so the SQL API works too."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
