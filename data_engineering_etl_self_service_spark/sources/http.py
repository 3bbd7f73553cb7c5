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

import base64
import json
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: HTTP statuses worth retrying: throttling + transient server errors.
RETRY_STATUSES: frozenset[int] = frozenset({429, 500, 502, 503, 504})


@dataclass(frozen=True)
class HttpConnection:
    """Named-connection semantics, the engine's analog of the reference's
    ``HttpHook(http_conn_id)`` (ref: operators/api_to_s3.py:57-58): auth and
    retry policy live on the connection object, not in every call site, so a
    self-service pipeline spec can reference one connection for every
    endpoint of an API.

    Exactly one of ``bearer_token`` / (``username``+``password``) should be
    set for authenticated APIs; extra ``headers`` always apply.
    """

    headers: dict[str, str] = field(default_factory=dict)
    bearer_token: str | None = None
    username: str | None = None
    password: str | None = None
    max_retries: int = 3
    backoff_s: float = 0.2
    timeout: int = 30

    def auth_headers(self) -> dict[str, str]:
        h = {"Accept": "application/json", **self.headers}
        if self.bearer_token:
            h["Authorization"] = f"Bearer {self.bearer_token}"
        elif self.username is not None:
            cred = f"{self.username}:{self.password or ''}"
            h["Authorization"] = (
                "Basic " + base64.b64encode(cred.encode()).decode("ascii")
            )
        return h


def http_get_json(
    url: str,
    params: dict[str, Any] | None = None,
    timeout: int | None = None,
    conn: HttpConnection | None = None,
) -> Any:
    """Driver-side GET returning parsed JSON (stdlib only).

    Bounded retry with exponential backoff on throttle/transient statuses
    (``RETRY_STATUSES``) and network-level failures; 4xx auth/client errors
    fail immediately (retrying a 401 is never going to help).
    """
    conn = conn or HttpConnection()
    if params:
        url = f"{url}?{urllib.parse.urlencode(params)}"
    req = urllib.request.Request(url, headers=conn.auth_headers())
    attempts = conn.max_retries + 1
    for attempt in range(attempts):
        try:
            with urllib.request.urlopen(  # noqa: S310
                req, timeout=timeout or conn.timeout
            ) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as ex:
            if ex.code not in RETRY_STATUSES or attempt == attempts - 1:
                raise
        except urllib.error.URLError:
            if attempt == attempts - 1:
                raise
        time.sleep(conn.backoff_s * (2**attempt))
    raise AssertionError("unreachable")


def fetch_json_df(
    spark: SparkSession,
    url: str,
    params: dict[str, Any] | None = None,
    schema: StructType | str | None = None,
    conn: HttpConnection | None = None,
) -> DataFrame:
    """GET a JSON-array endpoint into a DataFrame (ref: api_to_s3.py:57-62).

    With an explicit schema this is the schema-contract ingestion path; with
    none, Spark infers from the records (convenience only). ``conn`` carries
    auth + retry policy (ref's named-connection semantics).
    """
    payload = http_get_json(url, params, conn=conn)
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
            # auth/retry policy travels to executors as plain fields
            self.conn = HttpConnection(
                bearer_token=options.get("bearertoken"),
                username=options.get("username"),
                password=options.get("password"),
                max_retries=int(options.get("maxretries", "3")),
                backoff_s=float(options.get("backoffs", "0.2")),
            )

        def partitions(self):
            return [_PagePartition(p) for p in range(self.pages)]

        def read(self, partition):
            params = {self.page_param: partition.page} if self.pages > 1 else None
            payload = http_get_json(self.url, params, conn=self.conn)
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
