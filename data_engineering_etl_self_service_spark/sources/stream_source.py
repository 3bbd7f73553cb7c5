"""PySpark 4 Python STREAMING data source: the reference's synthetic event
producer as a native ``spark.readStream.format("synthetic_events")``.

The reference replays events into Kafka one dict at a time at ~3 msg/s
(ref: dags/kafka_stream.py:58-85 recovered) purely to have an unbounded
source to point Spark at. With the Python data source API the generator IS
the source: micro-batches are planned as offset ranges, partitions
generate rows on EXECUTORS in parallel, and checkpoint/restart works
because generation is a pure function of the global row index (splitmix64
of (index, field, seed)) — replaying offset [a, b) always yields the same
rows, which is exactly the contract Kafka offers and ad-hoc generators
break.

Vocabularies and schema match the reference exactly
(ref: dags/kafka_stream.py:27-36 recovered; see sources/synthetic.py).

Scale posture: ``DataSourceStreamReader`` (not the Simple variant) so each
micro-batch fans out over ``numpartitions`` input partitions — the driver
only plans offsets. Throughput is bounded by executors, not a driver loop.
"""

from __future__ import annotations

from .synthetic import EVENT_TYPES, N_USERS, URLS, UTM_SOURCES

_MASK = (1 << 64) - 1
_BASE_TS = 1753660800  # 2025-07-28T00:00:00Z (the reference DAG's start_date)


def _mix(i: int, salt: int, seed: int) -> int:
    """splitmix64-style hash of (row index, field salt, seed) — the pure
    function that makes offset replay deterministic."""
    x = (i * 0x9E3779B97F4A7C15 + salt * 0xBF58476D1CE4E5B9 + seed) & _MASK
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _MASK
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _MASK
    return (x ^ (x >> 31)) & _MASK


def gen_event(i: int, seed: int = 42, gap_sec: int = 300) -> tuple:
    """Row ``i`` of the stream — (user_id, event_type, url, timestamp,
    utm_source), timestamp in the reference's ISO wire format."""
    import datetime as _dt

    ts = _dt.datetime.fromtimestamp(
        _BASE_TS + i * gap_sec + _mix(i, 4, seed) % gap_sec, _dt.timezone.utc
    )
    return (
        f"user_{_mix(i, 0, seed) % N_USERS}",
        EVENT_TYPES[_mix(i, 1, seed) % len(EVENT_TYPES)],
        URLS[_mix(i, 2, seed) % len(URLS)],
        ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
        UTM_SOURCES[_mix(i, 3, seed) % len(UTM_SOURCES)],
    )


SCHEMA = (
    "user_id string, event_type string, url string, "
    "timestamp string, utm_source string"
)

try:  # pragma: no cover - import surface depends on pyspark minor version
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _Range(InputPartition):
        def __init__(self, start: int, end: int, seed: int, gap: int):
            self.start, self.end, self.seed, self.gap = start, end, seed, gap

    class _SyntheticStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.rows_per_batch = int(options.get("rowsperbatch", "100"))
            self.nparts = max(1, int(options.get("numpartitions", "4")))
            self.seed = int(options.get("seed", "42"))
            self.gap = int(options.get("gapsec", "300"))
            self._current = 0

        def initialOffset(self) -> dict:
            return {"index": 0}

        def latestOffset(self) -> dict:
            self._current += self.rows_per_batch
            return {"index": self._current}

        def partitions(self, start: dict, end: dict):
            lo, hi = int(start["index"]), int(end["index"])
            # After a checkpoint restart our in-memory counter restarts at
            # zero; never plan a regressing range.
            if hi < lo:
                self._current = lo
                hi = lo
            step = max(1, (hi - lo + self.nparts - 1) // self.nparts)
            return [
                _Range(s, min(s + step, hi), self.seed, self.gap)
                for s in range(lo, hi, step)
            ]

        def read(self, partition: "_Range"):
            for i in range(partition.start, partition.end):
                yield gen_event(i, partition.seed, partition.gap)

        def commit(self, end: dict) -> None:
            self._current = max(self._current, int(end["index"]))

    class SyntheticEventsDataSource(DataSource):
        """``spark.readStream.format("synthetic_events")`` with options
        ``rowsperbatch``, ``numpartitions``, ``seed``, ``gapsec``."""

        @classmethod
        def name(cls) -> str:
            return "synthetic_events"

        def schema(self) -> str:
            return SCHEMA

        def streamReader(self, schema):
            return _SyntheticStreamReader(self.options)

    HAVE_STREAM_DATASOURCE = True
except ImportError:  # pragma: no cover
    SyntheticEventsDataSource = None  # type: ignore[assignment]
    HAVE_STREAM_DATASOURCE = False


def register_synthetic_stream(spark) -> bool:
    """Register the synthetic_events streaming format; returns availability."""
    if HAVE_STREAM_DATASOURCE:
        spark.dataSource.register(SyntheticEventsDataSource)
        return True
    return False
