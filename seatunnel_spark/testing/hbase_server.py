"""Mini HBase REST gateway (the `hbase rest` server surface, port
8080): multi-row PUT, stateful scanners, and table-schema DDL — the
sandbox stand-in for a ZooKeeper-fronted HBase cluster (the conf's
zookeeper_quorum host doubles as the gateway address under a host
alias; see sinks/misc_sinks.HbaseRestSink)."""

from __future__ import annotations

import base64
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class MiniHbase:
    def __init__(self):
        # table -> {rowkey: [cells]}; cells = {"column": b64, "$": b64}
        self.tables: dict[str, dict[str, list]] = {}
        self.schemas: dict[str, dict] = {}
        self.scans: dict[str, list] = {}
        self.counter = 0
        self.lock = threading.RLock()

    def cell_text(self, table: str, rowkey: str, column: str) -> str | None:
        """Test helper: decoded cell value for (rowkey, 'fam:qual')."""
        with self.lock:
            for cell in self.tables.get(table, {}).get(rowkey, []):
                if base64.b64decode(cell["column"]).decode() == column:
                    return base64.b64decode(cell["$"]).decode()
        return None


def _make_handler(srv: MiniHbase):
    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def _send(self, status, payload=None, headers=None):
            data = json.dumps(payload).encode() if payload is not None \
                else b""
            self.send_response(status)
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            if data:
                self.wfile.write(data)

        def _body(self):
            n = int(self.headers.get("Content-Length") or 0)
            return self.rfile.read(n)

        def do_PUT(self):
            m = re.match(r"^/(\w+)/schema$", self.path)
            if m:
                with srv.lock:
                    srv.schemas[m.group(1)] = json.loads(
                        self._body() or b"{}")
                    srv.tables.setdefault(m.group(1), {})
                return self._send(201)
            m = re.match(r"^/(\w+)/scanner$", self.path)
            if m:
                with srv.lock:
                    srv.counter += 1
                    sid = f"s{srv.counter}"
                    rows = [{"key": key, "Cell": cells} for key, cells
                            in sorted(srv.tables.get(m.group(1),
                                                     {}).items())]
                    srv.scans[sid] = rows
                host = self.headers["Host"]
                return self._send(201, None,
                                  {"Location": f"http://{host}/scan/{sid}"})
            m = re.match(r"^/(\w+)/", self.path)
            body = json.loads(self._body())
            with srv.lock:
                t = srv.tables.setdefault(m.group(1), {})
                for r in body["Row"]:
                    t.setdefault(r["key"], []).extend(r["Cell"])
            return self._send(200, {})

        do_POST = do_PUT

        def do_GET(self):
            m = re.match(r"^/scan/(\w+)$", self.path)
            if m:
                with srv.lock:
                    page = srv.scans.get(m.group(1)) or []
                    srv.scans[m.group(1)] = []
                if page:
                    return self._send(200, {"Row": page})
                return self._send(204)
            m = re.match(r"^/(\w+)/schema$", self.path)
            if m:
                with srv.lock:
                    if m.group(1) in srv.tables:
                        return self._send(
                            200, srv.schemas.get(m.group(1), {}))
                return self._send(404)
            return self._send(200, {"table": sorted(srv.tables)})

        def do_DELETE(self):
            m = re.match(r"^/(\w+)/schema$", self.path)
            if m:
                with srv.lock:
                    srv.tables.pop(m.group(1), None)
                    srv.schemas.pop(m.group(1), None)
                return self._send(200)
            m = re.match(r"^/scan/(\w+)$", self.path)
            if m:
                with srv.lock:
                    srv.scans.pop(m.group(1), None)
            return self._send(200)

    return H


def start_mini_hbase(port: int = 0):
    srv = MiniHbase()
    httpd = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(srv))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def stop():
        httpd.shutdown()
        httpd.server_close()

    return srv, httpd.server_address[1], stop


__all__ = ["MiniHbase", "start_mini_hbase"]
