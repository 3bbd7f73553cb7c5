"""data_engineering_etl_self_service_spark — a PySpark-native analytics / ETL engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference `trannam710/data-engineering-ETL-self-service`
(an Airflow-based self-service ETL framework), re-expressed as:

- a declarative pipeline spec (same YAML shape as the reference's
  ``configs/sources/*.yaml``) compiled to DataFrame stages
  (``plans/``; ref: dags/dag_factory.py:22-106),
- a data-quality check engine that fuses all checks into one scan
  (``operators/quality.py``; ref: operators/data_quality_operator.py:77-129),
- session / funnel analytics over event streams — the reference's implied
  analytical payload (``operators/sessionize.py``; ref: README.md:1,
  dags/kafka_stream.py:87-92 recovered),
- sources and sinks (HTTP, files, Kafka, synthetic events; ``sources/``;
  ref: operators/api_to_s3.py, dags/kafka_stream.py:23-40 recovered),
- large-scale training-data-pipeline operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding), similarity search, text analysis,
  multimodal column plumbing (``operators/``, ``functions/``).

Everything is built on the public Apache Spark DataFrame / SQL / Structured
Streaming APIs and designed for 100 TB scale: declarative plans so Catalyst
can push down and prune, broadcast hints for dimension joins, one-shuffle
sessionization, Arrow-vectorized pandas UDFs only where built-ins cannot
express the semantics.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .catalog import TABLES, load_table, load_tables, register_views  # noqa: F401
