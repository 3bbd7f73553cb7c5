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


FLAKY_STATE = {"failures_left": 0, "hits": 0}


class _Handler(BaseHTTPRequestHandler):
    def _json(self, obj, status=200):
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        path = urlparse(self.path).path
        q = parse_qs(urlparse(self.path).query)
        if path == "/secure":
            auth = self.headers.get("Authorization", "")
            if auth not in ("Bearer sesame", "Basic YWRhOmxvdmVsYWNl"):
                self._json({"error": "unauthorized"}, status=401)
                return
            self._json(USERS[:2])
            return
        if path == "/flaky":
            FLAKY_STATE["hits"] += 1
            if FLAKY_STATE["failures_left"] > 0:
                FLAKY_STATE["failures_left"] -= 1
                self._json({"error": "try later"}, status=503)
                return
            self._json(USERS[:2])
            return
        page = int(q.get("page", ["0"])[0])
        self._json(USERS[page * 2 : page * 2 + 2])

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


def test_http_auth_bearer_and_basic(spark, api_server):
    """Named-connection auth (ref: HttpHook(http_conn_id),
    operators/api_to_s3.py:57-58): bearer and basic both unlock the
    endpoint; no auth is a hard 401 with no retry."""
    import urllib.error

    from data_engineering_etl_self_service_spark.sources.http import (
        HttpConnection,
        fetch_json_df,
        http_get_json,
    )

    url = api_server.replace("/users", "/secure")
    bearer = HttpConnection(bearer_token="sesame")
    basic = HttpConnection(username="ada", password="lovelace")
    df = fetch_json_df(spark, url, schema="id long, name string, email string", conn=bearer)
    assert {r.id for r in df.collect()} == {1, 2}
    assert len(http_get_json(url, conn=basic)) == 2
    with pytest.raises(urllib.error.HTTPError) as ei:
        http_get_json(url, conn=HttpConnection(max_retries=2, backoff_s=0.01))
    assert ei.value.code == 401


def test_http_retry_flaky_then_succeeds(api_server):
    """Transient 503s are retried with backoff up to max_retries; a budget
    too small surfaces the error."""
    import urllib.error

    from tests import test_sources as _self  # noqa: F401  (state lives here)
    from data_engineering_etl_self_service_spark.sources.http import (
        HttpConnection,
        http_get_json,
    )

    url = api_server.replace("/users", "/flaky")

    FLAKY_STATE.update(failures_left=2, hits=0)
    out = http_get_json(url, conn=HttpConnection(max_retries=3, backoff_s=0.01))
    assert len(out) == 2 and FLAKY_STATE["hits"] == 3  # 2 fails + 1 ok

    FLAKY_STATE.update(failures_left=5, hits=0)
    with pytest.raises(urllib.error.HTTPError):
        http_get_json(url, conn=HttpConnection(max_retries=1, backoff_s=0.01))


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


def test_avro_gate_probes_classpath_and_roundtrips_when_present(
    spark, tmp_path_factory
):
    """The avro datasource module is external since Spark 2.4 and absent
    from this container; the classpath probe picks the engine: the jar
    where deployed, else the pure-Python OCF fallback
    (sources/avro_ocf.py — round 7; the gate used to raise). EITHER way
    the same write_avro → read_avro surface must round-trip, so this
    test is one code path for both environments."""
    from data_engineering_etl_self_service_spark.sources.files import (
        read_avro,
        write_avro,
    )

    out = str(tmp_path_factory.mktemp("avro_lake")) + "/lake"
    df = spark.range(0, 100).selectExpr("id", "id % 7 AS g")
    write_avro(df, out)
    back = read_avro(spark, out).filter("g = 3")
    assert back.count() == sum(1 for i in range(100) if i % 7 == 3)


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


def test_jdbc_sink_write_readback_parity(spark, tmp_path_factory):
    """S10: the JDBC publish leg (ref: dags/kafka_stream.py:91 recovered —
    Postgres JDBC), exercised end-to-end against embedded Derby (same
    format("jdbc") code path; only URL/driver differ). Write, read back
    plain, then read back with a partitioned range scan — all three must
    agree."""
    from data_engineering_etl_self_service_spark.sources.jdbc import (
        DERBY_DRIVER,
        read_jdbc,
        write_jdbc,
    )

    db = str(tmp_path_factory.mktemp("derby")) + "/servedb"
    url = f"jdbc:derby:{db};create=true"

    src = spark.range(0, 500).selectExpr(
        "id", "CAST(id % 7 AS INT) AS g", "CAST(id * 1.5 AS DOUBLE) AS v"
    )
    write_jdbc(src, url, "results", driver=DERBY_DRIVER, max_connections=2)

    back = read_jdbc(spark, url, "results", driver=DERBY_DRIVER)
    assert back.count() == 500
    assert {f.name.lower() for f in back.schema.fields} == {"id", "g", "v"}
    assert back.agg({"v": "sum"}).collect()[0][0] == sum(i * 1.5 for i in range(500))

    ranged = read_jdbc(
        spark, url, "results", driver=DERBY_DRIVER,
        partition_column="id", lower_bound=0, upper_bound=500, num_partitions=4,
    )
    assert ranged.rdd.getNumPartitions() == 4
    assert ranged.count() == 500

    # append mode adds rows on the same table
    write_jdbc(
        src.limit(10), url, "results",
        mode="append", driver=DERBY_DRIVER, max_connections=1,
    )
    assert read_jdbc(spark, url, "results", driver=DERBY_DRIVER).count() == 510


# ---------------------------------------------------------------- snapshots


def test_snapshot_crash_between_data_write_and_publish(
    spark, tmp_path, monkeypatch
):
    """Fault injection for the commit protocol: a writer that dies AFTER
    staging its data directory but BEFORE publishing the manifest must
    leave (a) readers on the old version, (b) an orphan that vacuum
    reclaims — but only past the grace period — and (c) a table that a
    simple retry commits onto normally."""
    from data_engineering_etl_self_service_spark.sources import snapshots

    base = str(tmp_path / "snap")
    assert snapshots.write_snapshot(spark.range(5), base) == 1

    # crash point: write_snapshot calls snapshot_versions right after
    # the parquet stage — make that call die like a killed writer
    real_versions = snapshots.snapshot_versions

    def boom(base_dir):
        raise KeyboardInterrupt("writer killed mid-commit")

    monkeypatch.setattr(snapshots, "snapshot_versions", boom)
    with pytest.raises(KeyboardInterrupt):
        snapshots.write_snapshot(spark.range(100, 200), base)
    monkeypatch.setattr(snapshots, "snapshot_versions", real_versions)

    # (a) readers see the OLD version only — the orphan is invisible
    assert snapshots.snapshot_versions(base) == [1]
    assert read_snapshot_count(spark, base) == 5
    data_root = tmp_path / "snap" / "data"
    assert len(list(data_root.iterdir())) == 2  # v1 + the orphan

    # (b) grace period first: a young orphan survives vacuum...
    assert snapshots.vacuum(base, keep_last=1, min_age_s=3600.0) == []
    assert len(list(data_root.iterdir())) == 2
    # ...then reclaim with the window elapsed (age 0 = maintenance mode)
    deleted = snapshots.vacuum(base, keep_last=1)
    assert len(deleted) == 1
    assert len(list(data_root.iterdir())) == 1
    assert read_snapshot_count(spark, base) == 5  # v1 intact post-vacuum

    # (c) recovery is a plain retry — next commit is v2 on top of v1
    assert snapshots.write_snapshot(spark.range(100, 103), base) == 2
    assert read_snapshot_count(spark, base) == 8


def test_snapshot_crash_between_tmp_manifest_and_link(
    spark, tmp_path, monkeypatch
):
    """Second crash point: the .tmp manifest is staged but the atomic
    os.link publish never runs. Readers must be unaffected (the version
    never exists) and vacuum reclaims the stale .tmp."""
    import os as _os

    from data_engineering_etl_self_service_spark.sources import snapshots

    base = str(tmp_path / "snap")
    snapshots.write_snapshot(spark.range(7), base)

    real_link = _os.link

    def boom(src, dst):
        raise KeyboardInterrupt("writer killed before publish")

    monkeypatch.setattr(snapshots.os, "link", boom)
    with pytest.raises(KeyboardInterrupt):
        snapshots.write_snapshot(spark.range(3), base)
    monkeypatch.setattr(snapshots.os, "link", real_link)

    mdir = tmp_path / "snap" / "_snapshots"
    assert [p.name for p in mdir.iterdir() if p.name.endswith(".tmp")]
    assert snapshots.snapshot_versions(base) == [1]
    assert read_snapshot_count(spark, base) == 7
    snapshots.vacuum(base, keep_last=1)
    assert not [p for p in mdir.iterdir() if p.name.endswith(".tmp")]
    assert snapshots.snapshot_versions(base) == [1]
    assert snapshots.write_snapshot(spark.range(2), base) == 2


def read_snapshot_count(spark, base, version=None) -> int:
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        read_snapshot,
    )

    return read_snapshot(spark, base, version=version).count()


def test_snapshot_append_and_time_travel(spark, tmp_path):
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )

    base = str(tmp_path / "tbl")
    v1 = write_snapshot(
        spark.createDataFrame([(1, "a")], "id long, s string"), base
    )
    v2 = write_snapshot(
        spark.createDataFrame([(2, "b")], "id long, s string"), base
    )
    assert (v1, v2) == (1, 2)
    assert snapshot_versions(base) == [1, 2]
    assert read_snapshot(spark, base, version=1).count() == 1
    latest = read_snapshot(spark, base)
    assert sorted(r.id for r in latest.collect()) == [1, 2]


def test_snapshot_overwrite_resets_lineage(spark, tmp_path):
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        read_snapshot,
        write_snapshot,
    )

    base = str(tmp_path / "tbl")
    write_snapshot(spark.range(5), base)
    write_snapshot(spark.range(100, 103), base, mode="overwrite")
    assert read_snapshot(spark, base).count() == 3
    assert read_snapshot(spark, base, version=1).count() == 5


def test_snapshot_schema_evolution_merges_by_name(spark, tmp_path):
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        read_snapshot,
        write_snapshot,
    )

    base = str(tmp_path / "tbl")
    write_snapshot(spark.createDataFrame([(1,)], "id long"), base)
    write_snapshot(
        spark.createDataFrame([(2, "x")], "id long, extra string"), base
    )
    df = read_snapshot(spark, base)
    assert set(df.columns) == {"id", "extra"}
    rows = {r.id: r.extra for r in df.collect()}
    assert rows == {1: None, 2: "x"}


def test_snapshot_commit_race_takes_next_version(spark, tmp_path):
    """A manifest that appears between head-read and commit must not be
    clobbered — the loser retries onto the next version number."""
    import json
    import os

    from data_engineering_etl_self_service_spark.sources.snapshots import (
        read_snapshot,
        write_snapshot,
    )

    base = str(tmp_path / "tbl")
    write_snapshot(spark.range(3), base)
    # Simulate a concurrent committer claiming v2 out from under us.
    winner = {"version": 2, "mode": "append", "data_dirs": []}
    os.makedirs(f"{base}/_snapshots", exist_ok=True)
    with open(f"{base}/_snapshots/v{2:012d}.json", "w") as f:
        json.dump(winner, f)
    v = write_snapshot(spark.range(4), base)
    assert v == 3
    # v3 appended onto v2's (empty) dir list plus its own write.
    assert read_snapshot(spark, base, version=3).count() == 4


def test_snapshot_vacuum_keeps_only_live_dirs(spark, tmp_path):
    import os

    from data_engineering_etl_self_service_spark.sources.snapshots import (
        read_snapshot,
        snapshot_versions,
        vacuum,
        write_snapshot,
    )

    base = str(tmp_path / "tbl")
    write_snapshot(spark.range(2), base)
    write_snapshot(spark.range(10, 13), base, mode="overwrite")
    deleted = vacuum(base, keep_last=1)
    assert len(deleted) == 1  # v1's orphaned dir
    assert snapshot_versions(base) == [2]
    assert read_snapshot(spark, base).count() == 3
    assert len(os.listdir(f"{base}/data")) == 1


def test_read_json_corrupt_record_capture(spark, tmp_path):
    from data_engineering_etl_self_service_spark.sources.files import (
        read_json,
    )

    p = tmp_path / "drop.json"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{THIS IS NOT JSON}\n"
        '{"id": 2, "name": "fine"}\n'
    )
    df = read_json(
        spark,
        str(p),
        schema="id long, name string",
        corrupt_col="_corrupt",
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt"] is None]
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert {r.id for r in good} == {1, 2}
    assert len(bad) == 1 and "NOT JSON" in bad[0]["_corrupt"]

    import pytest

    with pytest.raises(Exception):
        read_json(
            spark, str(p), schema="id long, name string", mode="FAILFAST"
        ).collect()


def test_merge_into_snapshot_upsert_and_tombstones(spark, tmp_path):
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    base = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "id long, s string, v long",
        ),
        base,
    )
    updates = spark.createDataFrame(
        [(2, "B!", 99, False), (3, None, 0, True), (4, "d", 40, False)],
        "id long, s string, v long, is_deleted boolean",
    )
    v = merge_into_snapshot(
        spark, base, updates, key_cols=["id"], delete_col="is_deleted"
    )
    assert v == 2
    rows = {
        r.id: (r.s, r.v)
        for r in read_snapshot(spark, base).collect()
    }
    assert rows == {1: ("a", 10), 2: ("B!", 99), 4: ("d", 40)}
    # time travel to pre-merge state still works
    old = {r.id for r in read_snapshot(spark, base, version=1).collect()}
    assert old == {1, 2, 3}


def test_compact_snapshot_collapses_append_dirs(spark, tmp_path):
    import os

    from data_engineering_etl_self_service_spark.sources.snapshots import (
        compact_snapshot,
        read_snapshot,
        snapshot_versions,
        vacuum,
        write_snapshot,
    )

    base = str(tmp_path / "tbl")
    for i in range(4):
        write_snapshot(spark.range(i * 10, i * 10 + 10), base)
    import json

    with open(f"{base}/_snapshots/v{4:012d}.json") as f:
        assert len(json.load(f)["data_dirs"]) == 4
    v = compact_snapshot(spark, base, target_files=1)
    with open(f"{base}/_snapshots/v{v:012d}.json") as f:
        assert len(json.load(f)["data_dirs"]) == 1
    assert read_snapshot(spark, base).count() == 40
    vacuum(base, keep_last=1)
    assert snapshot_versions(base) == [v]
    assert len(os.listdir(f"{base}/data")) == 1


def test_maintenance_preserves_streaming_watermark(spark, tmp_path):
    """compact→vacuum (the CLI `optimize --snapshot` pair) must not lose
    the streaming batch_id high watermark, or a crash-replayed micro-batch
    would be re-appended after maintenance (exactly-once regression)."""
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        compact_snapshot,
        last_committed_batch,
        merge_into_snapshot,
        read_snapshot,
        snapshot_batch_sink,
        vacuum,
    )

    base = str(tmp_path / "tbl")
    sink = snapshot_batch_sink(base)
    sink(spark.range(0, 5), 0)
    sink(spark.range(5, 10), 1)
    assert last_committed_batch(base) == 1

    compact_snapshot(spark, base, target_files=1)
    vacuum(base, keep_last=1)
    assert last_committed_batch(base) == 1
    sink(spark.range(5, 10), 1)  # crash replay of batch 1 — must be a no-op
    assert read_snapshot(spark, base).count() == 10

    # MERGE is maintenance too: it must carry the watermark forward
    merge_into_snapshot(
        spark,
        base,
        spark.range(9, 12),
        key_cols=["id"],
    )
    vacuum(base, keep_last=1)
    assert last_committed_batch(base) == 1
    sink(spark.range(5, 10), 1)
    assert read_snapshot(spark, base).count() == 12


def test_merge_duplicate_update_keys_deterministic(spark, tmp_path):
    """Duplicate keys inside `updates` pick the same survivor on rerun:
    the window tie-breaks over atomic non-key columns."""
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    base = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([(1, "a", 10)], "id long, s string, v long"),
        base,
    )
    updates = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2), (1, "y", 1)], "id long, s string, v long"
    )
    got = set()
    for _ in range(3):
        merge_into_snapshot(spark, base, updates, key_cols=["id"])
        got.add(tuple(read_snapshot(spark, base).collect()[0]))
    # desc tie-break over (s, v) → ("y", 2) every time
    assert got == {(1, "y", 2)}


def test_snapshot_stats_history(spark, tmp_path):
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        snapshot_stats,
        write_snapshot,
    )

    base = str(tmp_path / "tbl")
    write_snapshot(spark.range(3), base)
    write_snapshot(spark.range(3), base, meta={"batch_id": 7})
    hist = snapshot_stats(base)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[1]["batch_id"] == 7 and hist[1]["n_data_dirs"] == 2
    assert hist[0]["mode"] == "append"


def test_vacuum_grace_period_spares_inflight_dirs(spark, tmp_path):
    """An unreferenced-but-fresh data dir (a concurrent writer's staged
    commit) must survive vacuum when min_age_s is set."""
    import os

    from data_engineering_etl_self_service_spark.sources.snapshots import (
        vacuum,
        write_snapshot,
    )

    base = str(tmp_path / "tbl")
    write_snapshot(spark.range(3), base)
    # stage an orphan dir the way a concurrent writer would
    orphan = f"{base}/data/deadbeef00000000000000000000feed"
    os.makedirs(orphan)
    assert vacuum(base, keep_last=1, min_age_s=3600) == []
    assert os.path.isdir(orphan)
    # without the grace period it is reclaimed
    deleted = vacuum(base, keep_last=1)
    assert deleted and os.path.basename(deleted[0]).startswith("dead")


def test_snapshot_schema_changes_audit(spark, tmp_path):
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        schema_changes,
        write_snapshot,
    )

    base = str(tmp_path / "tbl")
    write_snapshot(spark.createDataFrame([(1,)], "id long"), base)
    write_snapshot(spark.createDataFrame([(2,)], "id long"), base)
    write_snapshot(
        spark.createDataFrame([(3, "x")], "id long, extra string"), base
    )
    ch = schema_changes(base)
    assert len(ch) == 1 and ch[0]["version"] == 3
    assert "extra" in ch[0]["after"] and "extra" not in ch[0]["before"]


def test_snapshot_diff_classifies_changes(spark, tmp_path):
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        snapshot_diff,
        write_snapshot,
    )

    base = str(tmp_path / "difftab")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, None, 40)],
        "k long, s string, x int",
    )
    v2 = spark.createDataFrame(
        [
            (1, "a", 10),      # unchanged -> dropped
            (2, "b", 20),      # NULL -> 20: update (null-safe compare)
            (4, None, 40),     # unchanged incl. NULL column -> dropped
            (5, "e", 50),      # insert
        ],
        "k long, s string, x int",
    )
    write_snapshot(v1, base, mode="overwrite")
    write_snapshot(v2, base, mode="overwrite")
    rows = {
        (r.change_type, r.k, r.s, r.x)
        for r in snapshot_diff(spark, base, 1, 2, ["k"]).collect()
    }
    assert rows == {
        ("update", 2, "b", 20),
        ("delete", 3, "c", 30),
        ("insert", 5, "e", 50),
    }


def test_bm25_index_probe_prunes_partitions(spark, sf_dir):
    """The persisted-postings probe must (a) reproduce the ad-hoc BM25
    ranking exactly and (b) read only the query terms' bucket partitions
    (parquet partition pruning does the index lookup)."""
    from data_engineering_etl_self_service_spark.queries import QUERIES

    adhoc = [
        (r.doc_id, r.bm25, r.n_hit_terms)
        for r in QUERIES["bm25_search"](spark, sf_dir).collect()
    ]
    probe_df = QUERIES["bm25_index_search"](spark, sf_dir)
    probe = [
        (r.doc_id, r.bm25, r.n_hit_terms) for r in probe_df.collect()
    ]
    assert probe == adhoc and len(probe) > 0
    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:2000]


def test_snapshot_diff_null_keys_become_delete_plus_insert(spark, tmp_path):
    """NULL join keys never match (SQL semantics): the row surfaces as
    one delete + one insert, never a bogus update (presence markers, not
    key nullness, drive the classification)."""
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        snapshot_diff,
        write_snapshot,
    )

    base = str(tmp_path / "nulltab")
    v1 = spark.createDataFrame([(None, 1), (7, 2)], "k int, x int")
    v2 = spark.createDataFrame([(None, 9), (7, 2)], "k int, x int")
    write_snapshot(v1, base, mode="overwrite")
    write_snapshot(v2, base, mode="overwrite")
    rows = {
        (r.change_type, r.k, r.x)
        for r in snapshot_diff(spark, base, 1, 2, ["k"]).collect()
    }
    assert rows == {("delete", None, 1), ("insert", None, 9)}
