"""JDBC sink/source — the relational leg of the reference's streaming DAG.

The reference's Spark batch job ships results to Postgres over JDBC
(ref: dags/kafka_stream.py:91 recovered — ``packages='org.postgresql:
postgresql:42.7.7'``; requirements.txt:6 psycopg2). This engine's primary
sink is partitioned parquet (lake tables), but the JDBC leg exists for the
"publish to the serving database" step of a pipeline.

The functions below are thin, deliberately: Spark's JDBC connector already
does partitioned parallel reads (``partitionColumn``/``numPartitions``) and
batched writes; our value-add is the scale posture defaults:

- writes ``coalesce`` to a bounded connection count — a 1000-executor job
  must NOT open 1000 simultaneous connections against one database;
- ``batchsize`` is raised from the JDBC default (1000) to 10k rows;
- reads accept an explicit partition spec so a big table scan parallelizes
  instead of funneling through one connection.

Tested in-container against embedded Apache Derby (shipped with Spark for
the Hive metastore), which exercises the exact same ``format("jdbc")``
code path as Postgres — only the URL/driver differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Embedded Derby: the in-container stand-in for the reference's Postgres.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str | None = None,
    max_connections: int = 8,
    batchsize: int = 10_000,
    options: dict[str, str] | None = None,
) -> None:
    """Publish a DataFrame to a JDBC table.

    ``max_connections`` bounds write parallelism (one connection per
    partition): at cluster scale the database, not Spark, is the choke
    point, so the caller picks what the target can absorb.
    """
    writer = (
        df.coalesce(max_connections)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a JDBC table (or ``(subquery) alias``) as a DataFrame.

    With a numeric ``partition_column`` + bounds the scan is split into
    ``num_partitions`` range predicates executed in parallel — without it
    the whole table funnels through ONE connection, which is wrong for
    anything bigger than a dimension table.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()
