"""Small-suite reference confs running UNMODIFIED: cassandra (CQL v4
wire), druid (inline-ingest task REST), tdengine (taosAdapter REST),
hudi (lakehouse backend fed by live MySQL-CDC), and the
starrocks schema-change flow over a real binlog dump."""

import json

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec

_E2E = "/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e"


def test_cassandra_to_cassandra_conf(spark, monkeypatch):
    """cassandra_to_cassandra.conf: CQL source (select * from
    source_table in keyspace test) to async-write sink, both legs over
    the v4 binary protocol against the mini CQL server. The IT seeds
    source_table via the driver; here the same rows go in through our
    own sink (the same write path the conf's sink leg exercises)."""
    from seatunnel_spark.sources.cassandra import CassandraSink
    from seatunnel_spark.testing.cql_server import start_mini_cql

    store, port, stop = start_mini_cql()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"cassandra=tcp://127.0.0.1:{port}")
    try:
        seed = spark.createDataFrame(
            [(i, f"t{i}", i * 1.5, i % 2 == 0) for i in range(12)],
            "id bigint, c_text string, c_double double, c_boolean boolean")
        CassandraSink({"host": f"127.0.0.1:{port}", "keyspace": "test",
                       "table": "source_table"}).write(seed)
        JobEngine(spark).run(JobSpec.from_file(
            f"{_E2E}/connector-cassandra-e2e/src/test/resources/"
            "cassandra_to_cassandra.conf"))
        sink_rows = store.tables[("test", "sink_table")]
        assert len(sink_rows) == 12
    finally:
        stop()


@pytest.fixture()
def capture(monkeypatch):
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    calls = []

    class H(BaseHTTPRequestHandler):
        def _do(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n) if n else b""
            calls.append((self.command, self.path, body))
            payload = b'{"ok": true}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        do_POST = do_PUT = do_GET = _do

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield calls, srv.server_address[1]
    srv.shutdown()
    srv.server_close()


@pytest.mark.parametrize("conf,n_sources", [
    ("fakesource_to_druid.conf", 1),
    ("fakesource_to_druid_with_multi.conf", 2),
])
def test_druid_confs(spark, monkeypatch, capture, conf, n_sources):
    """fakesource_to_druid{,_with_multi}.conf: inline-ingest index
    tasks posted to the coordinator (DruidIT); the multi conf fans two
    tables into the one datasource."""
    calls, port = capture
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"localhost:8888=http://127.0.0.1:{port}")
    JobEngine(spark).run(JobSpec.from_file(
        f"{_E2E}/connector-druid-e2e/src/test/resources/{conf}"))
    tasks = [json.loads(b) for m, p, b in calls
             if p == "/druid/indexer/v1/task"]
    assert tasks, conf
    sources = {t["spec"]["dataSchema"]["dataSource"] for t in tasks}
    if n_sources == 1:
        assert sources == {"testDataSource"}
    else:  # ${table_name} fan-out
        assert sources == {"druid_sink_1", "druid_sink_2"}


def test_tdengine_source_to_sink_conf(spark, monkeypatch):
    """tdengine_source_to_sink.conf: sub-table split read from
    power.meters (taosAdapter REST) into power2.meters2 with the
    time-window bounds."""
    from seatunnel_spark.testing.misc_servers import start_mini_taos

    state, port, stop = start_mini_taos()
    monkeypatch.setenv(
        "SEATUNNEL_SPARK_HOST_ALIASES",
        f"flink_e2e_tdengine_src=http://127.0.0.1:{port},"
        f"flink_e2e_tdengine_sink=http://127.0.0.1:{port}")
    try:
        # seed power.meters sub-tables (the IT's init SQL)
        import urllib.request

        for i in range(10):
            sql = (f"INSERT INTO power.d{i % 2} USING power.meters "
                   f"TAGS ('loc{i % 2}') (ts, current, voltage) VALUES "
                   f"(153885488{i}000, {i}.5, {220 + i})")
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/rest/sql", data=sql.encode(),
                method="POST"))
        JobEngine(spark).run(JobSpec.from_file(
            f"{_E2E}/connector-tdengine-e2e/src/test/resources/tdengine/"
            "tdengine_source_to_sink.conf"))
        written = sum(len(v) for (db, _), v in state["tables"].items()
                      if db == "power2")
        assert written == 10
        assert state["stables"].get(("power2", "meters2")), "no subtables"
    finally:
        stop()


def test_mysql_cdc_to_hudi_conf(spark, monkeypatch):
    """mysql_cdc_to_hudi.conf: live binlog tail merged into the Hudi
    COPY_ON_WRITE table (cdc_enabled upsert on record_key id)."""
    import shutil

    from seatunnel_spark import mysql_binlog as B
    from seatunnel_spark.sinks.lakehouse import LakehouseTable
    from seatunnel_spark.testing.mysql_server import start_mini_mysql

    shutil.rmtree("/tmp/hudi/st", ignore_errors=True)
    monkeypatch.delenv("SEATUNNEL_SPARK_CDC_REPLAY", raising=False)
    srv, port, stop = start_mini_mysql("st_user", "seatunnel")
    try:
        cols = ["id", "name"]
        srv.tables["mysql_cdc_e2e_source_table"] = (
            cols, [3, 253], [(1, "a"), (2, "b")])
        srv.primary_keys["mysql_cdc_e2e_source_table"] = ["id"]
        srv.binlog_table("mysql_cdc", "mysql_cdc_e2e_source_table",
                         [(B.T_LONG, None), (B.T_VARCHAR, 100)])
        srv.mark_snapshot()
        srv.binlog_insert("mysql_cdc", "mysql_cdc_e2e_source_table",
                          [(3, "c")])
        srv.binlog_delete("mysql_cdc", "mysql_cdc_e2e_source_table",
                          [(2, "b")])
        monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                           f"mysql_cdc_e2e=tcp://127.0.0.1:{port}")
        spec = JobSpec.from_file(
            f"{_E2E}/connector-hudi-e2e/src/test/resources/hudi/"
            "mysql_cdc_to_hudi.conf")
        spec.env["streaming.await.timeout"] = 10
        try:
            JobEngine(spark).run(spec)
        finally:
            for q in spark.streams.active:
                q.stop()
        t = LakehouseTable("/tmp/hudi/st/st_test")
        got = {r["id"]: r["name"] for r in t.read(spark).collect()}
        assert got == {1: "a", 3: "c"}  # 2 deleted by the -D event
    finally:
        stop()
        shutil.rmtree("/tmp/hudi/st", ignore_errors=True)


def test_mysqlcdc_to_starrocks_schema_change_conf(spark, monkeypatch):
    """mysqlcdc_to_starrocks_with_schema_change.conf: live binlog with
    a mid-stream ADD COLUMN lands on the StarRocks stream-load sink
    with the evolved column present in the loaded rows."""
    from seatunnel_spark import mysql_binlog as B
    from seatunnel_spark.testing.mysql_server import start_mini_mysql
    from seatunnel_spark.testing.rest_servers import start_mini_streamload

    monkeypatch.delenv("SEATUNNEL_SPARK_CDC_REPLAY", raising=False)
    srv, port, stop = start_mini_mysql("st_user_source", "mysqlpw")
    loads, sl_port, sl_stop = start_mini_streamload()
    # a second mini mysql is the StarRocks FE SQL port (save-mode DDL)
    fe, fe_port, fe_stop = start_mini_mysql("root", "")
    try:
        cols = ["id", "name", "description", "weight"]
        srv.tables["products"] = (cols, [3, 253, 253, 5], [
            (101, "scooter", "Small 2-wheel scooter", 3.14)])
        srv.primary_keys["products"] = ["id"]
        srv.binlog_table("shop", "products",
                         [(B.T_LONG, None), (B.T_VARCHAR, 400),
                          (B.T_VARCHAR, 2000), (B.T_DOUBLE, None)])
        srv.mark_snapshot()
        srv.binlog_ddl("shop", "ALTER TABLE products ADD COLUMN "
                               "add_column1 varchar(64)")
        srv.binlog_table("shop", "products",
                         [(B.T_LONG, None), (B.T_VARCHAR, 400),
                          (B.T_VARCHAR, 2000), (B.T_DOUBLE, None),
                          (B.T_VARCHAR, 256)])
        srv.binlog_insert("shop", "products",
                          [(103, "hammer", "12oz", 0.75, "yy")])
        monkeypatch.setenv(
            "SEATUNNEL_SPARK_HOST_ALIASES",
            f"mysql_cdc_e2e=tcp://127.0.0.1:{port},"
            f"starrocks_cdc_e2e:8040=http://127.0.0.1:{sl_port},"
            f"starrocks_cdc_e2e:9030=tcp://127.0.0.1:{fe_port}")
        spec = JobSpec.from_file(
            f"{_E2E}/connector-starrocks-e2e/src/test/resources/"
            "mysqlcdc_to_starrocks_with_schema_change.conf")
        spec.env["streaming.await.timeout"] = 10
        try:
            JobEngine(spark).run(spec)
        finally:
            for q in spark.streams.active:
                q.stop()
        rows = [r for rs in loads.values() for r in rs]
        blob = " ".join(str(r) for r in rows)
        assert "hammer" in blob and "add_column1" in blob
        ddls = " ".join(fe.statements).upper()
        assert "CREATE TABLE" in ddls  # RECREATE_SCHEMA ran on the FE
    finally:
        stop()
        sl_stop()
        fe_stop()
