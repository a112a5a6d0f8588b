"""Mini StarRocks FE (_query_plan REST with basic auth) + BE
(TStarrocksExternalService thrift scan serving Arrow IPC batches) —
stands in for the native scan endpoints the StarRocks SOURCE uses
(the sink side's stream-load/FE-SQL minis live in rest_servers /
mysql_server). Canned data is a list of column dicts per (db, table);
the opaque plan carries the projected SQL so the BE knows which
columns to serialize, like the real plan fragment does."""

from __future__ import annotations

import base64
import json
import re
import socket
import struct
import threading
import uuid

from seatunnel_spark import thrift_codec as T


class MiniStarRocksScan:
    def __init__(self, user: str = "root", password: str = ""):
        self.user = user
        self.password = password
        self.statements: list[str] = []
        # (db, table) -> (cols, rows)
        self.tables: dict[tuple[str, str], tuple[list[str], list[tuple]]] = {}
        self.tablets_per_table = 3
        self.auth_failures = 0
        self.scan_opens: list[dict] = []
        self.be_port: int | None = None
        self._scans: dict[str, tuple] = {}
        # stream-load rows land here (the FE serves _stream_load on the
        # same HTTP port as _query_plan, like the real 8030)
        self.loaded: dict[tuple[str, str], list] = {}

    def _plan_for(self, db: str, table: str, sql: str) -> dict:
        plan = base64.b64encode(json.dumps(
            {"db": db, "table": table, "sql": sql}).encode()).decode()
        partitions = {
            str(10000 + i): {"routings": [f"127.0.0.1:{self.be_port}"],
                             "version": 1, "versionHash": 0,
                             "schemaHash": 0}
            for i in range(self.tablets_per_table)}
        return {"opaque_query_plan": plan, "partitions": partitions,
                "status": 200}


def _http_handler_factory(srv: MiniStarRocksScan):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: D102
            pass

        def do_POST(self):  # noqa: N802
            m = re.match(r"/api/([^/]+)/([^/]+)/_query_plan$", self.path)
            if not m:
                self.send_error(404)
                return
            auth = self.headers.get("Authorization", "")
            want = base64.b64encode(
                f"{srv.user}:{srv.password}".encode()).decode()
            if auth != f"Basic {want}":
                srv.auth_failures += 1
                self.send_error(401)
                return
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n).decode() or "{}")
            sql = body.get("sql", "")
            srv.statements.append(sql)
            db, table = m.group(1), m.group(2)
            if (db, table) not in srv.tables:
                out = json.dumps({"status": 404,
                                  "exception": "table not found"}).encode()
            else:
                out = json.dumps(srv._plan_for(db, table, sql)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def do_PUT(self):  # noqa: N802 — FE stream-load endpoint
            m = re.match(r"/api/([^/]+)/([^/]+)/_stream_load$", self.path)
            if not m or "Authorization" not in self.headers:
                self.send_error(404 if not m else 401)
                return
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode()
            rows = json.loads(body) if body.strip().startswith("[") else [
                json.loads(ln) for ln in body.splitlines() if ln.strip()]
            srv.loaded.setdefault((m.group(1), m.group(2)), []).extend(rows)
            out = json.dumps({"Status": "Success", "TxnId": 1,
                              "NumberLoadedRows": len(rows)}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    return Handler


def _arrow_payload(cols: list[str], rows: list[tuple]) -> bytes:
    import io

    import pyarrow as pa

    arrays = [pa.array([r[i] for r in rows]) for i in range(len(cols))]
    batch = pa.record_batch(arrays, names=cols)
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, batch.schema) as w:
        w.write_batch(batch)
    return sink.getvalue()


def _be_handle(conn: socket.socket, srv: MiniStarRocksScan) -> None:
    buf = bytearray()

    def recv_message():
        while True:
            if buf:
                try:
                    msg = T.decode_message(bytes(buf))
                    buf.clear()
                    return msg
                except (IndexError, struct.error):
                    pass
            chunk = conn.recv(1 << 20)
            if not chunk:
                raise ConnectionError
            buf.extend(chunk)

    def ok_status():
        return (T.STRUCT, {1: (T.I32, 0)})

    def err_status(msg: str):
        return (T.STRUCT, {1: (T.I32, 2),
                           2: (T.LIST, (T.STRING, [msg]))})

    try:
        while True:
            name, _mtype, seqid, args = recv_message()
            req = T.sget(args, 1, {})
            if name == "open_scanner":
                db = T.text(T.sget(req, 2), "")
                table = T.text(T.sget(req, 3), "")
                plan_b64 = T.text(T.sget(req, 5), "")
                user = T.text(T.sget(req, 9), "")
                pw = T.text(T.sget(req, 10), "")
                srv.scan_opens.append({
                    "db": db, "table": table,
                    "tablets": T.sget(req, 4, (T.I64, []))[1],
                    "batch_size": T.sget(req, 6)})
                if user != srv.user or pw != srv.password:
                    srv.auth_failures += 1
                    resp = {1: err_status("auth failed")}
                elif (db, table) not in srv.tables:
                    resp = {1: err_status(f"no table {db}.{table}")}
                else:
                    plan = json.loads(base64.b64decode(plan_b64))
                    cols, rows = srv.tables[(db, table)]
                    m = re.match(r"\s*select\s+(.+?)\s+from\s",
                                 plan.get("sql", ""), re.I | re.S)
                    proj = [c.strip().strip("`")
                            for c in m.group(1).split(",")] if m else ["*"]
                    if proj == ["*"]:
                        proj = list(cols)
                    idxs = [cols.index(c) for c in proj]
                    # serve only this scan's tablet share: rows are
                    # spread round-robin over the table's tablets
                    tablets = set(T.sget(req, 4, (T.I64, []))[1])
                    share = [tuple(r[i] for i in idxs)
                             for j, r in enumerate(rows)
                             if (10000 + j % srv.tablets_per_table)
                             in tablets]
                    ctx = uuid.uuid4().hex
                    srv._scans[ctx] = (proj, share)
                    resp = {1: ok_status(), 2: (T.STRING, ctx)}
            elif name == "get_next":
                ctx = T.text(T.sget(req, 1), "")
                offset = T.sget(req, 2, 0)
                entry = srv._scans.get(ctx)
                if entry is None:
                    resp = {1: err_status("unknown context")}
                else:
                    proj, share = entry
                    if offset >= len(share):
                        resp = {1: ok_status(), 2: (T.BOOL, True)}
                    else:
                        payload = _arrow_payload(proj, share[offset:])
                        resp = {1: ok_status(), 2: (T.BOOL, False),
                                3: (T.STRING, payload)}
            elif name == "close_scanner":
                srv._scans.pop(T.text(T.sget(req, 1), ""), None)
                resp = {1: ok_status()}
            else:
                resp = {1: err_status(f"unknown method {name}")}
            out = T.encode_message(name, T.REPLY, seqid,
                                   {0: (T.STRUCT, resp)})
            conn.sendall(out)
    except (ConnectionError, OSError, struct.error, ValueError):
        pass
    finally:
        try:
            conn.close()
        except OSError:
            pass


def start_mini_starrocks_scan(user: str = "root", password: str = ""):
    """-> (srv, fe_http_port, be_thrift_port, stop)."""
    from http.server import ThreadingHTTPServer

    srv = MiniStarRocksScan(user, password)

    be_sock = socket.create_server(("127.0.0.1", 0))
    be_sock.settimeout(0.5)
    srv.be_port = be_sock.getsockname()[1]
    stopping = threading.Event()

    def be_loop():
        while not stopping.is_set():
            try:
                conn, _ = be_sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=_be_handle, args=(conn, srv),
                             daemon=True).start()

    threading.Thread(target=be_loop, daemon=True).start()

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                _http_handler_factory(srv))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    fe_port = httpd.server_address[1]

    def stop():
        stopping.set()
        try:
            be_sock.close()
        except OSError:
            pass
        httpd.shutdown()

    return srv, fe_port, srv.be_port, stop


__all__ = ["MiniStarRocksScan", "start_mini_starrocks_scan"]
