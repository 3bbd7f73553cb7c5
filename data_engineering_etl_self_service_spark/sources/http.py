"""HTTP API source → DataFrame.

Re-expresses the reference's ``GenericApiToS3Operator`` ingest leg
(ref: operators/api_to_s3.py:57-62 — HttpHook GET with params) and the
fake-user probe (ref: dags/kafka_stream.py:12-21 recovered).

Spark has no built-in HTTP source, so there are two tiers:

- :func:`fetch_json_df` — driver-side GET (stdlib urllib; no extra deps),
  parse the JSON array, ``createDataFrame``. Right-sized for the
  reference's use case: one small API payload per scheduled run.
- :class:`HttpJsonDataSource` — a PySpark 4 Python Data Source
  (``spark.dataSource.register``) so ``spark.read.format("http_json")``
  works and, with a paged endpoint, partitions fetch in parallel on
  executors. This is the 100 TB-posture version: ingestion happens on the
  cluster, not the driver.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def http_get_json(url: str, params: dict[str, Any] | None = None, timeout: int = 30) -> Any:
    """Driver-side GET returning parsed JSON (stdlib only)."""
    if params:
        url = f"{url}?{urllib.parse.urlencode(params)}"
    req = urllib.request.Request(url, headers={"Accept": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


def fetch_json_df(
    spark: SparkSession,
    url: str,
    params: dict[str, Any] | None = None,
    schema: StructType | str | None = None,
) -> DataFrame:
    """GET a JSON-array endpoint into a DataFrame (ref: api_to_s3.py:57-62).

    With an explicit schema this is the schema-contract ingestion path; with
    none, Spark infers from the records (convenience only).
    """
    payload = http_get_json(url, params)
    if isinstance(payload, dict):
        payload = [payload]
    if schema is not None:
        return spark.createDataFrame(payload, schema=schema)
    rdd = spark.sparkContext.parallelize([json.dumps(r) for r in payload])
    return spark.read.json(rdd)


# --------------------------------------------------------------------------
# PySpark 4 Python Data Source (executor-side fetch; registered lazily).
# --------------------------------------------------------------------------

try:  # pragma: no cover - import surface depends on pyspark minor version
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _PagePartition(InputPartition):
        def __init__(self, page: int):
            self.page = page

    class _HttpJsonReader(DataSourceReader):
        def __init__(self, schema, options):
            self.schema_ = schema
            self.url = options.get("url")
            self.pages = int(options.get("pages", "1"))
            self.page_param = options.get("pageparam", "page")

        def partitions(self):
            return [_PagePartition(p) for p in range(self.pages)]

        def read(self, partition):
            params = {self.page_param: partition.page} if self.pages > 1 else None
            payload = http_get_json(self.url, params)
            if isinstance(payload, dict):
                payload = [payload]
            names = self.schema_.fieldNames()
            for rec in payload:
                yield tuple(rec.get(n) for n in names)

    class HttpJsonDataSource(DataSource):
        """``spark.read.format("http_json").schema(s).option("url", …)``.

        Executor-side paged fetch: each page is an input partition, so a
        paged API ingests in parallel across the cluster.
        """

        @classmethod
        def name(cls) -> str:
            return "http_json"

        def reader(self, schema):
            return _HttpJsonReader(schema, self.options)

    HAVE_PYTHON_DATASOURCE = True
except ImportError:  # pragma: no cover
    HttpJsonDataSource = None  # type: ignore[assignment]
    HAVE_PYTHON_DATASOURCE = False


def register_http_source(spark: SparkSession) -> bool:
    """Register the http_json format if this PySpark supports Python data
    sources; returns availability."""
    if HAVE_PYTHON_DATASOURCE:
        spark.dataSource.register(HttpJsonDataSource)
        return True
    return False
