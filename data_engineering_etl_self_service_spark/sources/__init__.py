"""Sources & sinks: files, HTTP, Kafka, synthetic events."""

from .files import read_csv, read_json, read_parquet, write_partitioned_parquet  # noqa: F401
from .synthetic import synthetic_user_events, EVENT_TYPES, URLS, UTM_SOURCES  # noqa: F401
