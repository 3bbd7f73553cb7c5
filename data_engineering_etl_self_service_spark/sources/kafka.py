"""Kafka source/sink builders (ref: dags/kafka_stream.py:62-75 recovered —
producer to topic ``user-event`` at ``kafka:29092``; the implied consumer is
the absent Spark batch job, ref :87-92).

This container has no Kafka broker and no spark-sql-kafka jars, so these
builders CONSTRUCT the plans but callers must gate execution; everything
downstream of the source (parse → sessionize → aggregate) is shared with the
batch path and is what the tests exercise (see streaming/sessions.py).

At scale: ``maxOffsetsPerTrigger`` bounds micro-batch size (the principled
version of the reference's ``sleep(uniform(0.1,0.5))`` throttle, ref :75);
``minPartitions`` fans a hot topic out to more tasks than Kafka partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DEFAULT_TOPIC = "user-event"  # ref :62
DEFAULT_BROKERS = "kafka:29092"  # ref :64


def read_stream(
    spark: SparkSession,
    topic: str = DEFAULT_TOPIC,
    brokers: str = DEFAULT_BROKERS,
    max_offsets_per_trigger: int | None = 100_000,
    starting_offsets: str = "earliest",
):
    """Unresolved Kafka streaming source (caller `.load()`s it)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader


def parse_events(raw: DataFrame, schema: StructType | str) -> DataFrame:
    """Kafka value bytes → typed columns (ref: the implied consumer of S7).

    ``from_json(cast(value as string), schema)`` — the Structured-Streaming
    twin of the reference's per-message ``json.dumps`` serializer (ref
    :42-43).
    """
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("e")
    ).select("e.*")


def write_batch(
    df: DataFrame,
    topic: str = DEFAULT_TOPIC,
    brokers: str = DEFAULT_BROKERS,
) -> None:
    """Batch produce: every row JSON-serialized to the topic — the
    reference's CSV→Kafka replay (ref :68-74) without the 0.1-0.5 s/msg
    sleep (rate limiting belongs to the consumer via maxOffsetsPerTrigger).
    """
    (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )
