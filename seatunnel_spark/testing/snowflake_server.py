"""Mini Snowflake REST endpoint: session/v1/login-request token issue
+ queries/v1/query-request against canned tables (SELECT projection /
simple WHERE; DML captured, answered with the driver-visible
rows-inserted rowset). Serves the documented result wire form —
rowtype metadata + all-string rowset cells (dates as epoch days,
timestamps as epoch seconds, binary hex) — so the client's decode path
is exercised for real."""

from __future__ import annotations

import datetime
import decimal
import json
import re
import secrets
import threading


class MiniSnowflake:
    def __init__(self, user: str = "user", password: str = "password"):
        self.user = user
        self.password = password
        self.statements: list[str] = []
        # name -> (cols, metas [{name,type,scale}], rows)
        self.tables: dict[str, tuple[list[str], list[dict], list[tuple]]] = {}
        self.tokens: set[str] = set()
        self.auth_failures = 0


def _wire_cell(v, meta: dict):
    if v is None:
        return None
    t = meta.get("type", "text")
    if t == "date":
        d = v if isinstance(v, datetime.date) else \
            datetime.date.fromisoformat(str(v))
        return str((d - datetime.date(1970, 1, 1)).days)
    if t == "time":
        tm = v if isinstance(v, datetime.time) else \
            datetime.time.fromisoformat(str(v))
        secs = tm.hour * 3600 + tm.minute * 60 + tm.second
        return f"{secs}.{tm.microsecond:06d}000"
    if str(t).startswith("timestamp"):
        dt = v if isinstance(v, datetime.datetime) else \
            datetime.datetime.fromisoformat(str(v))
        epoch = (dt - datetime.datetime(1970, 1, 1)).total_seconds()
        base = f"{decimal.Decimal(str(epoch)):.9f}"
        return base + (" 1440" if t == "timestamp_tz" else "")
    if t == "binary":
        return bytes(v).hex().upper()
    if t == "boolean":
        return "TRUE" if v in (True, 1, "1", "TRUE") else "FALSE"
    return str(v)


def _handle(srv: MiniSnowflake, path: str, body: dict, headers) -> dict:
    if path.startswith("/session/v1/login-request"):
        d = body.get("data") or {}
        if d.get("LOGIN_NAME") != srv.user or \
                d.get("PASSWORD") != srv.password:
            srv.auth_failures += 1
            return {"success": False, "message": "Incorrect username "
                    "or password was specified.", "code": "390100"}
        token = secrets.token_hex(16)
        srv.tokens.add(token)
        return {"success": True,
                "data": {"token": token, "masterToken": token}}
    auth = headers.get("Authorization", "")
    m = re.match(r'Snowflake Token="([^"]+)"', auth)
    if not m or m.group(1) not in srv.tokens:
        srv.auth_failures += 1
        return {"success": False, "message": "Session token invalid",
                "code": "390104"}
    if path.startswith("/queries/v1/query-request"):
        sql = str(body.get("sqlText") or "").strip().rstrip(";")
        srv.statements.append(sql)
        sm = re.match(
            r"SELECT\s+(.+?)\s+FROM\s+\(?\s*"
            r"(?:SELECT\s+.+?\s+FROM\s+)?([\"\w.]+)\s*\)?"
            r"(?:\s+(?!WHERE\b|LIMIT\b)\w+)?"
            r"(?:\s+WHERE\s+(.+?))?(?:\s+LIMIT\s+(\d+))?\s*$",
            sql, re.I | re.S)
        if sm:
            tname = sm.group(2).replace('"', "").split(".")[-1].upper()
            table = srv.tables.get(tname)
            if table is None:
                return {"success": False,
                        "message": f"Object '{tname}' does not exist"}
            cols, metas, rows = table
            upper = [c.upper() for c in cols]
            proj = [c.strip().strip('"').upper()
                    for c in sm.group(1).split(",")]
            if proj == ["*"]:
                proj = list(upper)
            idxs = [upper.index(c) for c in proj]
            if sm.group(3) and re.match(r"\s*1\s*=\s*0", sm.group(3)):
                rows = []
            if sm.group(4) is not None:
                rows = rows[:int(sm.group(4))]
            rowtype = [metas[i] for i in idxs]
            rowset = [[_wire_cell(r[i], metas[i]) for i in idxs]
                      for r in rows]
            return {"success": True,
                    "data": {"rowtype": rowtype, "rowset": rowset,
                             "total": len(rowset),
                             "queryResultFormat": "json"}}
        # DML/DDL: captured; snowflake answers "number of rows inserted"
        n = 1 if re.match(r"(INSERT|UPDATE|DELETE|MERGE)\b", sql,
                          re.I) else 0
        return {"success": True,
                "data": {"rowtype": [{"name": "number of rows inserted",
                                      "type": "fixed", "scale": 0}],
                         "rowset": [[str(n)]]}}
    if path.startswith("/session/logout-request"):
        return {"success": True, "data": {}}
    return {"success": False, "message": f"unknown path {path}"}


def start_mini_snowflake(user: str = "user", password: str = "password",
                         port: int = 0):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    srv = MiniSnowflake(user, password)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: D102
            pass

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n).decode() or "{}")
            out = json.dumps(_handle(srv, self.path, body,
                                     self.headers)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def stop():
        httpd.shutdown()

    return srv, httpd.server_address[1], stop


__all__ = ["MiniSnowflake", "start_mini_snowflake"]
