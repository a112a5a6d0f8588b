"""Mini Phoenix Query Server (Apache Avatica protobuf over HTTP):
OpenConnection / CreateStatement / PrepareAndExecute / Fetch / Close
against canned tables with statement capture — the Testcontainers
Phoenix stand-in for the jdbc:phoenix:thin confs. Speaks the same
public Calcite Avatica message shapes as seatunnel_spark.avatica
(requests.proto / responses.proto / common.proto)."""

from __future__ import annotations

import re
import threading

from seatunnel_spark import pb
from seatunnel_spark.avatica import enc_typed_value, parse_wire, wire_message

_RSP = "org.apache.calcite.avatica.proto.Responses${}"

# schema DSL -> java.sql.Types id for ColumnMetaData
_TYPE_IDS = {"boolean": 16, "tinyint": -6, "smallint": 5, "int": 4,
             "bigint": -5, "float": 7, "double": 8, "decimal": 3,
             "date": 91, "timestamp": 93, "string": 12, "varchar": 12,
             "binary": -2}


class MiniAvatica:
    def __init__(self):
        self.statements: list[str] = []
        # name -> (cols, type_decls, rows)
        self.tables: dict[str, tuple[list[str], list[str], list[tuple]]] = {}
        self.connections: set[str] = set()
        self.frame_rows = 100  # force Fetch paging past this


def _col_meta(name: str, decl: str, pos: int) -> bytes:
    base = decl.split("(")[0].strip().lower()
    tid = _TYPE_IDS.get(base, 12) & 0xFFFFFFFF
    at = pb.fvar(1, tid) + pb.fstr(2, base.upper())
    return (pb.fvar(1, pos) + pb.fstr(9, name) + pb.fstr(10, name)
            + pb.fbytes(20, at))


def _frame(rows: list[tuple], offset: int, done: bool) -> bytes:
    out = pb.fvar(1, offset) + pb.fvar(2, 1 if done else 0)
    for r in rows:
        row = b"".join(pb.fbytes(1, pb.fbytes(4, enc_typed_value(v)))
                       for v in r)
        out += pb.fbytes(3, row)
    return out


def _result_set(conn_id: str, stmt_id: int, cols, decls, rows,
                frame_rows: int, update_count: int | None = None) -> bytes:
    out = pb.fstr(1, conn_id) + pb.fvar(2, stmt_id) + pb.fvar(3, 1)
    if update_count is not None:
        out += pb.fvar(6, update_count)
        return out
    sig = b"".join(pb.fbytes(1, _col_meta(c, d, i + 1))
                   for i, (c, d) in enumerate(zip(cols, decls)))
    out += pb.fbytes(4, sig)
    first = rows[:frame_rows]
    out += pb.fbytes(5, _frame(first, 0, len(rows) <= frame_rows))
    out += pb.fvar(6, (1 << 64) - 1)  # -1: a query, not DML
    return out


def _error(msg: str) -> bytes:
    body = pb.fstr(3, msg) + pb.fvar(6, 0) + pb.fstr(7, "42000")
    return wire_message(_RSP.format("ErrorResponse"), body)


def _handle(srv: MiniAvatica, body: bytes,
            pending: dict[int, tuple]) -> bytes:
    name, wrapped = parse_wire(body)
    short = name.rsplit("$", 1)[-1]
    f = pb.decode(wrapped)
    conn_id = f.get(1, [b""])[0].decode() if 1 in f else ""
    if short == "OpenConnectionRequest":
        srv.connections.add(conn_id)
        return wire_message(_RSP.format("OpenConnectionResponse"), b"")
    if short == "CloseConnectionRequest":
        srv.connections.discard(conn_id)
        return wire_message(_RSP.format("CloseConnectionResponse"), b"")
    if short == "CreateStatementRequest":
        stmt_id = len(pending) + 1 + len(srv.statements)
        return wire_message(
            _RSP.format("CreateStatementResponse"),
            pb.fstr(1, conn_id) + pb.fvar(2, stmt_id))
    if short == "CloseStatementRequest":
        pending.pop(f.get(2, [0])[0], None)
        return wire_message(_RSP.format("CloseStatementResponse"), b"")
    if short == "PrepareAndExecuteRequest":
        stmt_id = f.get(2, [0])[0]
        sql = f.get(3, [b""])[0].decode()
        srv.statements.append(sql)
        m = re.match(
            r"\s*SELECT\s+(.+?)\s+FROM\s+\(?\s*"
            r"(?:SELECT\s+.+?\s+FROM\s+)?([\"\w.]+)\s*\)?"
            r"(?:\s+(?!WHERE\b|LIMIT\b)\w+)?"
            r"(?:\s+WHERE\s+(.+?))?(?:\s+LIMIT\s+(\d+))?\s*;?\s*$",
            sql, re.I | re.S)
        table = None
        if m:
            tname = m.group(2).replace('"', "").split(".")[-1]
            table = srv.tables.get(tname) or srv.tables.get(tname.upper())
        if table is not None:
            cols, decls, rows = table
            proj = [c.strip().strip('"') for c in m.group(1).split(",")]
            if proj == ["*"]:
                proj = list(cols)
            idxs = [cols.index(c) for c in proj]
            if m.group(3) and re.match(r"\s*1\s*=\s*0", m.group(3)):
                rows = []
            if m.group(4) is not None:
                rows = rows[:int(m.group(4))]
            out_rows = [tuple(r[i] for i in idxs) for r in rows]
            pending[stmt_id] = ([cols[i] for i in idxs],
                                [decls[i] for i in idxs], out_rows)
            rs = _result_set(conn_id, stmt_id, *pending[stmt_id],
                             srv.frame_rows)
            return wire_message(_RSP.format("ExecuteResponse"),
                                pb.fbytes(1, rs))
        if re.match(r"\s*SELECT\b", sql, re.I):
            return _error(f"Table undefined in: {sql[:60]}")
        # UPSERT / DDL: captured, update_count 1
        rs = _result_set(conn_id, stmt_id, [], [], [], 0, update_count=1)
        return wire_message(_RSP.format("ExecuteResponse"),
                            pb.fbytes(1, rs))
    if short == "FetchRequest":
        stmt_id = f.get(2, [0])[0]
        offset = f.get(3, [0])[0]
        entry = pending.get(stmt_id)
        if entry is None:
            return _error("unknown statement")
        _cols, _decls, rows = entry
        chunk = rows[offset:offset + srv.frame_rows]
        done = offset + srv.frame_rows >= len(rows)
        return wire_message(
            _RSP.format("FetchResponse"),
            pb.fbytes(1, _frame(chunk, offset, done)))
    return _error(f"unsupported request {short}")


def start_mini_avatica(port: int = 0):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    srv = MiniAvatica()
    pending: dict[int, tuple] = {}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: D102
            pass

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                out = _handle(srv, body, pending)
            except Exception as e:  # noqa: BLE001
                out = _error(str(e))
            self.send_response(200)
            self.send_header("Content-Type",
                             "application/x-google-protobuf")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def stop():
        httpd.shutdown()

    return srv, httpd.server_address[1], stop


__all__ = ["MiniAvatica", "start_mini_avatica"]
