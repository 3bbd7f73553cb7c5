"""Sources: HTTP (driver fetch + PySpark 4 data source), CSV/JSON files.

The HTTP tests run a localhost http.server — the same ingest path as the
reference's GenericApiToS3Operator (ref: operators/api_to_s3.py:57-62)
without external network dependence.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import functions as F

USERS = [
    {"id": 1, "name": "Ada", "email": "ada@example.com"},
    {"id": 2, "name": "Grace", "email": "grace@example.com"},
    {"id": 3, "name": "Edsger", "email": "e@example.com"},
    {"id": 4, "name": "Barbara", "email": "b@example.com"},
]


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        q = parse_qs(urlparse(self.path).query)
        page = int(q.get("page", ["0"])[0])
        body = json.dumps(USERS[page * 2 : page * 2 + 2]).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def api_server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/users"
    srv.shutdown()


def test_fetch_json_df_driver_side(spark, api_server):
    from data_engineering_etl_self_service_spark.sources.http import fetch_json_df

    df = fetch_json_df(
        spark, api_server, schema="id long, name string, email string"
    )
    rows = {r.id: r.name for r in df.collect()}
    assert rows == {1: "Ada", 2: "Grace"}  # page 0 only (no params)


def test_http_python_datasource_paged(spark, api_server):
    from data_engineering_etl_self_service_spark.sources.http import (
        register_http_source,
    )

    assert register_http_source(spark), "PySpark 4 should support Python data sources"
    df = (
        spark.read.format("http_json")
        .schema("id long, name string, email string")
        .option("url", api_server)
        .option("pages", "2")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one partition per page
    assert {r.id for r in df.collect()} == {1, 2, 3, 4}


def test_csv_source_with_schema_contract(spark, tmp_path):
    from data_engineering_etl_self_service_spark.sources.files import read_csv

    p = tmp_path / "clicks.csv"
    p.write_text(
        "event_time,event_type,price,user_id\n"
        "2019-10-01 00:00:00,view,12.5,100\n"
        "2019-10-01 00:01:00,purchase,99.0,101\n"
    )
    df = read_csv(
        spark,
        str(p),
        schema="event_time timestamp, event_type string, price double, user_id long",
    )
    rows = df.orderBy("user_id").collect()
    assert rows[0].event_type == "view" and rows[0].price == 12.5
    assert df.schema["price"].dataType.simpleString() == "double"


def test_json_source_roundtrip(spark, tmp_path):
    from data_engineering_etl_self_service_spark.sources.files import (
        read_json,
        write_partitioned_parquet,
    )

    p = tmp_path / "recs.json"
    p.write_text("\n".join(json.dumps(u) for u in USERS))
    df = read_json(spark, str(p), schema="id long, name string, email string")
    assert df.count() == 4

    from pyspark.sql import functions as F

    out = tmp_path / "lake"
    write_partitioned_parquet(df.withColumn("ds", F.lit("2025-08-13")), str(out))
    back = spark.read.parquet(str(out))
    assert back.count() == 4 and "ds" in back.columns


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    """Both sides bucketed on the join key → SortMergeJoin with ZERO
    exchanges (the 100 TB co-located-join recipe, SCALE.md)."""
    import re

    from data_engineering_etl_self_service_spark.catalog import load_table
    from data_engineering_etl_self_service_spark.sources.files import (
        write_bucketed_table,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        write_bucketed_table(li, "b_lineitem", "l_orderkey", 8)
        write_bucketed_table(o, "b_orders", "o_orderkey", 8)
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = j._jdf.queryExecution().explainString(jmode)
        assert len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)) == 0, plan
        assert j.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_missing_path_fails_fast(spark):
    """S3 existence probe analog: reading an absent lake path raises
    AnalysisException [PATH_NOT_FOUND] at plan time — the engine's
    fail-fast equivalent of the reference's check_for_key
    (ref: operators/data_quality_operator.py:54-57)."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND|Path does not exist"):
        spark.read.parquet("/root/testdata/sf0.001/definitely_absent.parquet").count()


def test_csv_malformed_row_policies(spark, tmp_path):
    """PERMISSIVE captures bad rows in the corrupt column (feeding a DQ
    gate); DROPMALFORMED removes them; FAILFAST raises."""
    from data_engineering_etl_self_service_spark.sources.files import read_csv

    p = tmp_path / "rows.csv"
    p.write_text("id,price\n1,10.5\n2,notanumber\n3,7.25\n")
    schema = "id int, price double"

    df = read_csv(spark, str(p), schema=schema, corrupt_col="_corrupt")
    rows = {r.id: (r.price, r._corrupt) for r in df.collect()}
    assert rows[1] == (10.5, None) and rows[3] == (7.25, None)
    assert rows[2][0] is None and "notanumber" in rows[2][1]

    dropped = read_csv(spark, str(p), schema=schema, mode="DROPMALFORMED")
    assert sorted(r.id for r in dropped.collect()) == [1, 3]

    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    failed = read_csv(spark, str(p), schema=schema, mode="FAILFAST")
    with pytest.raises((PySparkException, Py4JJavaError, Exception)):
        failed.collect()


def test_orc_round_trip_with_pushdown(spark, tmp_path_factory):
    from data_engineering_etl_self_service_spark.sources.files import read_orc

    out = str(tmp_path_factory.mktemp("orc_lake"))
    spark.range(0, 1000).selectExpr("id", "id % 7 AS g").write.mode(
        "overwrite"
    ).orc(out)
    df = read_orc(spark, out).filter("g = 3")
    assert df.count() == sum(1 for i in range(1000) if i % 7 == 3)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Scan orc" in plan and "PushedFilters" in plan


def test_partitioned_writer_uses_zstd(spark, tmp_path_factory):
    import glob as _glob

    from data_engineering_etl_self_service_spark.sources.files import (
        write_partitioned_parquet,
    )

    out = str(tmp_path_factory.mktemp("zstd_lake"))
    df = spark.range(0, 100).selectExpr("id", "'2024-01-01' AS ds")
    write_partitioned_parquet(df, out)
    files = _glob.glob(f"{out}/ds=2024-01-01/*.parquet")
    assert files and all(".zstd." in f for f in files)
    assert spark.read.parquet(out).count() == 100
