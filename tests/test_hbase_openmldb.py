"""HBase REST-gateway source round trip + OpenMldb APIServer source."""

import base64
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _serve(handler):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def test_hbase_rest_roundtrip(spark):
    """Sink PUTs cells into a mini gateway; source drains them back
    through a stateful scanner."""
    from seatunnel_spark.sinks.misc_sinks import HbaseRestSink
    from seatunnel_spark.sources.hbase_openmldb import HbaseRestSource

    tables: dict[str, dict] = {}
    scans: dict[str, list] = {}
    counter = [0]

    class H(BaseHTTPRequestHandler):
        def _send(self, status, payload=None, headers=None):
            data = json.dumps(payload).encode() if payload is not None else b""
            self.send_response(status)
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_PUT(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = json.loads(self.rfile.read(n))
            m = re.match(r"^/(\w+)/scanner$", self.path)
            if m:  # create scanner snapshot
                counter[0] += 1
                sid = f"s{counter[0]}"
                rows = []
                for key, cells in sorted(tables.get(m.group(1), {}).items()):
                    rows.append({"key": key, "Cell": cells})
                scans[sid] = rows
                host = self.headers["Host"]
                self._send(201, None, {"Location":
                                       f"http://{host}/scan/{sid}"})
                return
            m = re.match(r"^/(\w+)/", self.path)
            t = tables.setdefault(m.group(1), {})
            for r in body["Row"]:
                t.setdefault(r["key"], []).extend(r["Cell"])
            self._send(200, {})

        def do_GET(self):
            m = re.match(r"^/scan/(\w+)$", self.path)
            if m and scans.get(m.group(1)):
                page, scans[m.group(1)] = scans[m.group(1)], []
                self._send(200, {"Row": page})
            else:
                self._send(204)

        def do_DELETE(self):
            self._send(200, {})

        def log_message(self, *args):
            pass

    srv, port = _serve(H)
    try:
        df = spark.createDataFrame([(i, f"n{i}", 20 + i) for i in range(15)],
                                   "id int, name string, age int")
        HbaseRestSink({"rest_url": f"http://127.0.0.1:{port}",
                       "table": "people", "rowkey_column": ["id"],
                       "family_name": {"all_columns": "cf"}}).write(df)
        src = HbaseRestSource({
            "rest_url": f"http://127.0.0.1:{port}", "table": "people",
            "rowkey_column": "id",
            "schema": {"fields": {"id": "int", "name": "string",
                                  "age": "int"}}})
        rows = src.read(spark).collect()
        assert len(rows) == 15
        got = {r["id"]: (r["name"], r["age"]) for r in rows}
        assert got[7] == ("n7", 27)
    finally:
        srv.shutdown()
        srv.server_close()


def test_openmldb_source(spark):
    from seatunnel_spark.sources.hbase_openmldb import OpenMldbSource

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = json.loads(self.rfile.read(n))
            assert "SELECT" in body["sql"].upper()
            payload = json.dumps({
                "code": 0, "msg": "ok",
                "data": {"schema": [{"name": "id"}, {"name": "score"}],
                         "rows": [[1, 0.5], [2, 1.5]]}}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):
            pass

    srv, port = _serve(H)
    try:
        src = OpenMldbSource({
            "host": "127.0.0.1", "port": port, "database": "db1",
            "sql": "SELECT id, score FROM t1",
            "schema": {"fields": {"id": "int", "score": "double"}}})
        rows = {r["id"]: r["score"] for r in src.read(spark).collect()}
        assert rows == {1: 0.5, 2: 1.5}
    finally:
        srv.shutdown()
        srv.server_close()
