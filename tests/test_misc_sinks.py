"""Druid / Aliyun DataHub / HBase-REST sinks against generic JSON
capture servers."""

import base64
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


@pytest.fixture()
def capture():
    """Generic capture server: records (method, path, headers, body)."""
    calls = []

    class H(BaseHTTPRequestHandler):
        def _do(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n) if n else b""
            calls.append((self.command, self.path, dict(self.headers), body))
            payload = b'{"ok": true}'
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
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


def test_druid_sink_inline_task(spark, capture):
    from seatunnel_spark.sinks.misc_sinks import DruidSink

    calls, port = capture
    df = spark.createDataFrame([(i, f"d{i}") for i in range(20)],
                               "id int, dim string")
    DruidSink({"coordinatorUrl": f"127.0.0.1:{port}",
               "datasource": "events"}).write(df)
    tasks = [json.loads(b) for m, p, _h, b in calls
             if p == "/druid/indexer/v1/task"]
    assert tasks
    spec = tasks[0]["spec"]
    assert spec["dataSchema"]["dataSource"] == "events"
    lines = [json.loads(l) for t in tasks for l in
             t["spec"]["ioConfig"]["inputSource"]["data"].splitlines()]
    assert sorted(l["id"] for l in lines) == list(range(20))
    assert all("__time" in l for l in lines)


def test_datahub_sink_signed_records(spark, capture):
    from seatunnel_spark.sinks.misc_sinks import DataHubSink

    calls, port = capture
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    DataHubSink({"endpoint": f"http://127.0.0.1:{port}",
                 "project": "p1", "topic": "t1",
                 "accessId": "AK", "accessKey": "SK"}).write(df)
    reqs = [(h, json.loads(b)) for m, p, h, b in calls
            if p == "/projects/p1/topics/t1/shards"]
    assert reqs
    headers, body = reqs[0]
    assert headers["Authorization"].startswith("DATAHUB AK:")
    docs = [json.loads(base64.b64decode(r["Data"]))
            for _h, b in reqs for r in b["Records"]]
    assert sorted(d["id"] for d in docs) == [1, 2]


def test_hbase_rest_sink_cells(spark, capture):
    from seatunnel_spark.sinks.misc_sinks import HbaseRestSink

    calls, port = capture
    df = spark.createDataFrame([(1, "u1", 30), (2, "u2", 40)],
                               "id int, name string, age int")
    HbaseRestSink({"rest_url": f"http://127.0.0.1:{port}",
                   "table": "users", "rowkey_column": ["id"],
                   "family_name": {"all_columns": "cf"}}).write(df)
    puts = [json.loads(b) for m, p, _h, b in calls
            if m == "PUT" and p.startswith("/users/")]
    rows = [r for put in puts for r in put["Row"]]
    assert len(rows) == 2
    keys = sorted(base64.b64decode(r["key"]).decode() for r in rows)
    assert keys == ["1", "2"]
    cells = {base64.b64decode(c["column"]).decode():
             base64.b64decode(c["$"]).decode()
             for c in rows[0]["Cell"]}
    assert set(cells) == {"cf:name", "cf:age"}
