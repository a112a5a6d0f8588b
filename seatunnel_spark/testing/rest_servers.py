"""Mini REST backends for connector e2e without live services:
InfluxDB (1.x /query + /write line protocol), Qdrant (points
scroll/upsert), Typesense (collections + documents export/import),
and AmazonSqs (AWS Query XML protocol). Each is the sandbox analog of
the reference's Testcontainers fixture for that connector."""

from __future__ import annotations

import itertools
import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _serve(handler_cls, port=0, host="127.0.0.1"):
    server = ThreadingHTTPServer((host, port), handler_cls)
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def shutdown():
        server.shutdown()
        server.server_close()

    return server.server_address[1], shutdown


class _Handler(BaseHTTPRequestHandler):
    def _reply(self, status: int, payload, raw: bytes | None = None):
        data = raw if raw is not None else json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def log_message(self, *args):
        pass


# ==========================================================================
# InfluxDB 1.x
# ==========================================================================

_LINE_RX = re.compile(
    r"^(?P<key>(?:[^ \\]|\\.)+) (?P<fields>(?:[^ \\]|\\.)+)( (?P<ts>\d+))?$")


class MiniInflux:
    def __init__(self):
        # measurement -> list[{tags, fields, time}]
        self.points: dict[str, list[dict]] = {}
        self.lock = threading.RLock()

    def write_lines(self, text: str):
        with self.lock:
            for line in text.splitlines():
                line = line.strip()
                if not line:
                    continue
                m = _LINE_RX.match(line)
                if not m:
                    continue
                key = m.group("key")
                parts = re.split(r"(?<!\\),", key)
                measurement = parts[0].replace(r"\ ", " ")
                tags = dict(p.split("=", 1) for p in parts[1:])
                fields = {}
                for f in re.split(r"(?<!\\),", m.group("fields")):
                    k, v = f.split("=", 1)
                    if v.startswith('"'):
                        fields[k] = v[1:-1].replace(r"\"", '"')
                    elif v.endswith("i"):
                        fields[k] = int(v[:-1])
                    elif v in ("true", "false"):
                        fields[k] = v == "true"
                    else:
                        fields[k] = float(v)
                self.points.setdefault(measurement, []).append(
                    {"tags": tags, "fields": fields,
                     "time": int(m.group("ts")) if m.group("ts") else None})

    def query(self, q: str) -> dict:
        """SELECT <cols|*> FROM <m> [WHERE <col> >= a AND <col> < b]
        [tz('Zone')] — the tz clause shifts displayed timestamps on a
        real server; fixture times are epoch ints, so it strips."""
        q = re.sub(r"\s+tz\('[^']*'\)\s*$", "", q.strip())
        sel = re.match(
            r"SELECT\s+(?P<cols>.+?)\s+FROM\s+\"?(?P<m>[\w.]+)\"?"
            r"(?:\s+WHERE\s+(?P<where>.+))?$", q.strip(), re.I)
        if not sel:
            return {"results": [{}]}
        m = sel.group("m")
        with self.lock:
            pts = list(self.points.get(m, []))
        conds = []
        if sel.group("where"):
            for c in re.split(r"\s+AND\s+", sel.group("where"), flags=re.I):
                cm = re.match(r"(\w+)\s*(>=|<=|<|>|=)\s*(\S+)", c.strip())
                if cm:
                    conds.append((cm.group(1), cm.group(2),
                                  float(cm.group(3))))

        def val(p, col):
            if col == "time":
                return p["time"]
            if col in p["fields"]:
                return p["fields"][col]
            return p["tags"].get(col)

        def keep(p):
            for col, op, rhs in conds:
                v = val(p, col)
                if v is None:
                    return False
                v = float(v)
                if op == ">=" and not v >= rhs:
                    return False
                if op == ">" and not v > rhs:
                    return False
                if op == "<=" and not v <= rhs:
                    return False
                if op == "<" and not v < rhs:
                    return False
                if op == "=" and v != rhs:
                    return False
            return True

        pts = [p for p in pts if keep(p)]
        cols_spec = sel.group("cols").strip()
        if cols_spec == "*":
            cols = sorted({k for p in pts
                           for k in (*p["fields"], *p["tags"])})
            cols = ["time", *cols]
        else:
            cols = [c.strip().strip('"') for c in cols_spec.split(",")]
            if "time" not in cols:  # influx always prepends time
                cols = ["time", *cols]
        values = [[val(p, c) for c in cols] for p in pts]
        return {"results": [{"series": [
            {"name": m, "columns": cols, "values": values}]}]}


def start_mini_influx(port: int = 0):
    store = MiniInflux()

    class H(_Handler):
        def do_POST(self):
            parts = urllib.parse.urlsplit(self.path)
            if parts.path == "/write":
                store.write_lines(self._body().decode())
                self._reply(204, {})
            elif parts.path == "/query":
                qs = urllib.parse.parse_qs(parts.query)
                self._reply(200, store.query(qs.get("q", [""])[0]))
            else:
                self._reply(404, {"error": "nope"})

        def do_GET(self):
            parts = urllib.parse.urlsplit(self.path)
            if parts.path in ("/query", "/ping"):
                qs = urllib.parse.parse_qs(parts.query)
                self._reply(200, store.query(qs.get("q", [""])[0]))
            else:
                self._reply(404, {"error": "nope"})

    port, stop = _serve(H, port)
    return store, port, stop


# ==========================================================================
# Qdrant
# ==========================================================================

def start_mini_qdrant(port: int = 0):
    state = {"collections": {}}  # name -> {id: {vector, payload}}
    lock = threading.RLock()

    class H(_Handler):
        def do_PUT(self):
            m = re.match(r"^/collections/([^/]+)/points", self.path)
            if m:
                body = json.loads(self._body())
                with lock:
                    coll = state["collections"].setdefault(m.group(1), {})
                    for p in body.get("points", []):
                        coll[p["id"]] = {"vector": p.get("vector"),
                                         "payload": p.get("payload") or {}}
                self._reply(200, {"status": "ok", "result": {}})
                return
            m = re.match(r"^/collections/([^/]+)$", self.path)
            if m:
                with lock:
                    state["collections"].setdefault(m.group(1), {})
                self._reply(200, {"status": "ok", "result": True})
                return
            self._reply(404, {"status": "error"})

        def do_POST(self):
            m = re.match(r"^/collections/([^/]+)/points/scroll$", self.path)
            if m:
                body = json.loads(self._body() or b"{}")
                limit = int(body.get("limit", 10))
                offset = body.get("offset")
                with lock:
                    coll = state["collections"].get(m.group(1), {})
                    ids = sorted(coll, key=lambda x: (str(type(x)), str(x)))
                start = ids.index(offset) if offset in ids else 0
                page = ids[start:start + limit]
                nxt = ids[start + limit] if start + limit < len(ids) else None
                points = [{"id": i, "vector": coll[i]["vector"],
                           "payload": coll[i]["payload"]} for i in page]
                self._reply(200, {"status": "ok", "result": {
                    "points": points, "next_page_offset": nxt}})
                return
            self._reply(404, {"status": "error"})

    port, stop = _serve(H, port)
    return state, port, stop


# ==========================================================================
# Typesense
# ==========================================================================

def start_mini_typesense(port: int = 0):
    state = {"collections": {}}  # name -> {id: doc}
    counter = itertools.count()
    lock = threading.RLock()

    class H(_Handler):
        def do_GET(self):
            m = re.match(r"^/collections/([^/]+)/documents/export", self.path)
            if m:
                with lock:
                    docs = state["collections"].get(m.group(1))
                if docs is None:
                    self._reply(404, {"message": "Not Found"})
                    return
                body = "\n".join(json.dumps(d) for d in docs.values())
                self._reply(200, None, raw=body.encode())
                return
            m = re.match(r"^/collections/([^/]+)$", self.path)
            if m:
                with lock:
                    c = state["collections"].get(m.group(1))
                if c is None:
                    self._reply(404, {"message": "Not Found"})
                else:
                    self._reply(200, {"name": m.group(1),
                                      "num_documents": len(c)})
                return
            self._reply(404, {"message": "Not Found"})

        def do_POST(self):
            if self.path == "/collections":
                body = json.loads(self._body())
                with lock:
                    state["collections"].setdefault(body["name"], {})
                self._reply(201, {"name": body["name"]})
                return
            m = re.match(r"^/collections/([^/]+)/documents/import", self.path)
            if m:
                results = []
                with lock:
                    coll = state["collections"].setdefault(m.group(1), {})
                    for line in self._body().decode().splitlines():
                        if not line.strip():
                            continue
                        doc = json.loads(line)
                        doc.setdefault("id", str(next(counter)))
                        coll[doc["id"]] = doc
                        results.append({"success": True})
                self._reply(200, None, raw="\n".join(
                    json.dumps(r) for r in results).encode())
                return
            self._reply(404, {"message": "Not Found"})

        def do_DELETE(self):
            m = re.match(r"^/collections/([^/]+)/documents", self.path)
            if m:
                with lock:
                    state["collections"][m.group(1)] = {}
                self._reply(200, {"num_deleted": 0})
                return
            m = re.match(r"^/collections/([^/]+)$", self.path)
            if m:
                with lock:
                    state["collections"].pop(m.group(1), None)
                self._reply(200, {})
                return
            self._reply(404, {"message": "Not Found"})

    port, stop = _serve(H, port)
    return state, port, stop


# ==========================================================================
# AmazonSqs (AWS Query XML protocol)
# ==========================================================================

def start_mini_sqs(port: int = 0):
    queues: dict[str, dict] = {}  # url path -> {"messages", "inflight"}
    counter = itertools.count()
    lock = threading.RLock()

    def q_of(path: str) -> dict:
        return queues.setdefault(path, {"messages": [], "inflight": {}})

    def xml(tag: str, inner: str) -> bytes:
        return (f'<?xml version="1.0"?><{tag} '
                f'xmlns="http://queue.amazonaws.com/doc/2012-11-05/">'
                f"{inner}</{tag}>").encode()

    class H(_Handler):
        def do_POST(self):
            params = dict(urllib.parse.parse_qsl(self._body().decode()))
            action = params.get("Action")
            with lock:
                state = q_of(self.path)
                if action in ("SendMessage", "SendMessageBatch"):
                    if action == "SendMessage":
                        state["messages"].append(params["MessageBody"])
                    else:
                        i = 1
                        while f"SendMessageBatchRequestEntry.{i}.MessageBody" \
                                in params:
                            state["messages"].append(params[
                                f"SendMessageBatchRequestEntry.{i}"
                                ".MessageBody"])
                            i += 1
                    self._reply(200, None,
                                raw=xml(f"{action}Response", ""))
                elif action == "ReceiveMessage":
                    n = int(params.get("MaxNumberOfMessages", 1))
                    msgs = []
                    while state["messages"] and len(msgs) < n:
                        body = state["messages"].pop(0)
                        handle = f"h{next(counter)}"
                        state["inflight"][handle] = body
                        msgs.append((handle, body))
                    import html

                    inner = "".join(
                        f"<Message><MessageId>{h}</MessageId>"
                        f"<ReceiptHandle>{h}</ReceiptHandle>"
                        f"<Body>{html.escape(b)}</Body></Message>"
                        for h, b in msgs)
                    self._reply(200, None, raw=xml(
                        "ReceiveMessageResponse",
                        f"<ReceiveMessageResult>{inner}"
                        "</ReceiveMessageResult>"))
                elif action == "DeleteMessage":
                    state["inflight"].pop(params.get("ReceiptHandle"), None)
                    self._reply(200, None,
                                raw=xml("DeleteMessageResponse", ""))
                else:
                    self._reply(400, None, raw=xml("ErrorResponse",
                                                   "<Error/>"))

    port, stop = _serve(H, port)
    return queues, port, stop


# ==========================================================================
# Stream Load (Doris / StarRocks)
# ==========================================================================

def start_mini_streamload(port: int = 0):
    """PUT /api/{db}/{table}/_stream_load with a JSON array body —
    rows land in state[(db, table)]."""
    state: dict[tuple, list] = {}
    lock = threading.RLock()

    class H(_Handler):
        def do_PUT(self):
            m = re.match(r"^/api/([^/]+)/([^/]+)/_stream_load$", self.path)
            if not m:
                self._reply(404, {"Status": "Fail", "Message": "bad path"})
                return
            if "Authorization" not in self.headers:
                self._reply(401, {"Status": "Fail", "Message": "no auth"})
                return
            body = self._body().decode()
            rows = json.loads(body) if body.strip().startswith("[") else [
                json.loads(l) for l in body.splitlines() if l.strip()]
            with lock:
                state.setdefault((m.group(1), m.group(2)), []).extend(rows)
            self._reply(200, {"Status": "Success", "TxnId": 1,
                              "NumberLoadedRows": len(rows),
                              "Label": self.headers.get("label", "")})

    port, stop = _serve(H, port)
    return state, port, stop


# ==========================================================================
# DynamoDB (AWS JSON 1.0)
# ==========================================================================

def start_mini_dynamo(port: int = 0):
    tables: dict[str, list] = {}  # name -> list of AttributeValue items
    lock = threading.RLock()

    class H(_Handler):
        def do_POST(self):
            target = (self.headers.get("X-Amz-Target") or "").split(".")[-1]
            body = json.loads(self._body() or b"{}")
            with lock:
                if target == "PutItem":
                    tables.setdefault(body["TableName"], []).append(
                        body["Item"])
                    self._reply(200, {})
                elif target == "BatchWriteItem":
                    unmatched = {}
                    for tname, reqs in body.get("RequestItems", {}).items():
                        for r in reqs:
                            if "PutRequest" in r:
                                tables.setdefault(tname, []).append(
                                    r["PutRequest"]["Item"])
                    self._reply(200, {"UnprocessedItems": unmatched})
                elif target == "Scan":
                    items = tables.get(body["TableName"], [])
                    seg = body.get("Segment")
                    total = body.get("TotalSegments")
                    if total:
                        items = [it for i, it in enumerate(items)
                                 if i % total == seg]
                    start = 0
                    esk = body.get("ExclusiveStartKey")
                    if esk:
                        start = int(esk["__idx"]["N"])
                    limit = int(body.get("Limit") or len(items) or 1)
                    page = items[start:start + limit]
                    out = {"Items": page, "Count": len(page)}
                    if start + limit < len(items):
                        out["LastEvaluatedKey"] = {
                            "__idx": {"N": str(start + limit)}}
                    self._reply(200, out)
                else:
                    self._reply(400, {"__type": "UnknownOperationException"})

    port, stop = _serve(H, port)
    return tables, port, stop


# ==========================================================================
# ClickHouse HTTP interface
# ==========================================================================

def start_mini_clickhouse(port: int = 0):
    tables: dict[tuple, list] = {}  # (db, table) -> list[dict]
    lock = threading.RLock()

    def norm(name: str, default_db: str) -> tuple:
        name = name.replace("`", "")
        if "." in name:
            db, _, t = name.partition(".")
            return db, t
        return default_db, name

    def run_query(q: str, body: bytes, default_db: str):
        q = q.strip().rstrip(";")
        fmt = None
        m = re.search(r"\s+FORMAT\s+(\w+)\s*$", q, re.I)
        if m:
            fmt, q = m.group(1), q[:m.start()]
        ins = re.match(r"INSERT\s+INTO\s+(\S+)\s*(?:\(([^)]*)\))?", q, re.I)
        if ins:
            key = norm(ins.group(1), default_db)
            if fmt and fmt.upper() == "CSV":
                import csv as _csv
                import io as _io

                cols = [c.strip().replace("`", "")
                        for c in (ins.group(2) or "").split(",") if c.strip()]
                rows = [dict(zip(cols, r)) for r in
                        _csv.reader(_io.StringIO(body.decode())) if r]
            else:
                rows = [json.loads(l) for l in body.decode().splitlines()
                        if l.strip()]
            tables.setdefault(key, []).extend(rows)
            return b""
        if re.match(r"CREATE\s+TABLE", q, re.I):
            name = re.search(r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\S+)",
                             q, re.I).group(1)
            tables.setdefault(norm(name, default_db), [])
            return b""
        if re.match(r"DROP\s+TABLE", q, re.I):
            name = q.split()[-1]
            tables.pop(norm(name, default_db), None)
            return b""
        if re.match(r"TRUNCATE\s+TABLE", q, re.I):
            name = q.split()[-1]
            tables[norm(name, default_db)] = []
            return b""
        if re.match(r"EXISTS\s+TABLE", q, re.I):
            name = q.split()[-1]
            return b"1\n" if norm(name, default_db) in tables else b"0\n"
        if re.match(r"DELETE\s+FROM", q, re.I):
            dm = re.match(r"DELETE\s+FROM\s+(\S+)\s+WHERE\s+(.+)$", q, re.I)
            key = norm(dm.group(1), default_db)
            conds = []
            for part in re.split(r"\s+AND\s+", dm.group(2), flags=re.I):
                col, _, val = part.partition("=")
                conds.append((col.strip().replace("`", ""),
                              val.strip().strip("'")))
            rows = tables.get(key, [])
            tables[key] = [r for r in rows
                           if not all(str(r.get(c)) == v for c, v in conds)]
            return b""
        if re.match(r"SELECT\s+count\(\)\s+FROM", q, re.I):
            name = q.split()[-1]
            return f"{len(tables.get(norm(name, default_db), []))}\n".encode()
        sel = re.match(r"SELECT\s+(.+?)\s+FROM\s+\(?\s*(?:SELECT\s+.+?\s+"
                       r"FROM\s+)?(\S+?)\)?(\s+LIMIT\s+(\d+))?$", q, re.I)
        if sel:
            key = norm(sel.group(2), default_db)
            rows = list(tables.get(key, []))
            if sel.group(4) is not None:
                rows = rows[:int(sel.group(4))]
            cols = sorted({k for r in rows for k in r}) or ["x"]

            def ch_type(v):
                if isinstance(v, bool):
                    return "Bool"
                if isinstance(v, int):
                    return "Int64"
                if isinstance(v, float):
                    return "Float64"
                return "String"

            meta = [{"name": c, "type": ch_type(
                next((r[c] for r in rows if r.get(c) is not None), ""))}
                for c in cols]
            return json.dumps({"meta": meta, "data": rows,
                               "rows": len(rows)}).encode()
        raise ValueError(f"mini-clickhouse: unsupported query {q!r}")

    class H(_Handler):
        def _do(self):
            parts = urllib.parse.urlsplit(self.path)
            qs = urllib.parse.parse_qs(parts.query)
            q = qs.get("query", [""])[0]
            db = qs.get("database", ["default"])[0]
            with lock:
                try:
                    out = run_query(q, self._body(), db)
                except ValueError as e:
                    self._reply(400, None, raw=str(e).encode())
                    return
            self._reply(200, None, raw=out)

        do_GET = do_POST = _do

    port, stop = _serve(H, port)
    return tables, port, stop


# ==========================================================================
# Milvus (REST v2)
# ==========================================================================

def start_mini_milvus(port: int = 0):
    state: dict[tuple, dict] = {}  # (db, coll) -> {id: entity}
    counter = itertools.count()
    lock = threading.RLock()

    class H(_Handler):
        def do_POST(self):
            body = json.loads(self._body() or b"{}")
            db = body.get("dbName", "default")
            coll = body.get("collectionName")
            with lock:
                if self.path.endswith("/entities/insert") or \
                        self.path.endswith("/entities/upsert"):
                    c = state.setdefault((db, coll), {})
                    for e in body.get("data", []):
                        eid = e.get("id", next(counter))
                        c[eid] = e
                    self._reply(200, {"code": 0,
                                      "data": {"insertCount":
                                               len(body.get("data", []))}})
                elif self.path.endswith("/entities/query"):
                    c = state.get((db, coll), {})
                    ids = sorted(c, key=lambda x: (str(type(x)), str(x)))
                    off = int(body.get("offset", 0))
                    lim = int(body.get("limit", 100))
                    page = [c[i] for i in ids[off:off + lim]]
                    self._reply(200, {"code": 0, "data": page})
                elif self.path.endswith("/collections/describe"):
                    # schema inferred from the stored entities (the
                    # real server returns the declared CollectionSchema;
                    # inference matches what the sink wrote)
                    c = state.get((db, coll), {})
                    first = next(iter(c.values()), {})

                    def mtype(v):
                        if isinstance(v, bool):
                            return "Bool"
                        if isinstance(v, int):
                            return "Int64"
                        if isinstance(v, float):
                            return "Double"
                        if isinstance(v, list):
                            return "FloatVector"
                        return "VarChar"
                    fields = [{"fieldName": k, "type": mtype(v)}
                              for k, v in first.items()]
                    self._reply(200, {"code": 0,
                                      "data": {"fields": fields}})
                else:
                    self._reply(404, {"code": 404})

    port, stop = _serve(H, port)
    return state, port, stop


# ==========================================================================
# Neo4j (HTTP transactional Cypher — canned subset)
# ==========================================================================

def start_mini_neo4j(port: int = 0):
    """Executes two Cypher shapes the connector tests use:
    'UNWIND $batch AS row CREATE/MERGE (n:Label) SET n = row' writes and
    'MATCH (n:Label) RETURN n.a AS a, ...' reads. Enough to drive the
    wire path; not a graph engine."""
    state: dict[str, list[dict]] = {}  # label -> node properties
    lock = threading.RLock()

    def run_statement(stmt: str, params: dict) -> dict:
        m = re.search(r"(?:CREATE|MERGE)\s*\(\s*\w*:(\w+)", stmt, re.I)
        if m and "$batch" in stmt:
            with lock:
                state.setdefault(m.group(1), []).extend(
                    params.get("batch", []))
            return {"columns": [], "data": []}
        if m:  # one-by-one: properties from $params
            with lock:
                state.setdefault(m.group(1), []).append(dict(params))
            return {"columns": [], "data": []}
        m = re.search(r"MATCH\s*\(\s*(\w+):(\w+)\s*\)\s*"
                      r"(?:WITH\s+(.+?)\s+)?RETURN\s+(.+)$",
                      stmt, re.I | re.S)
        if m:
            var, label, with_clause, ret = m.groups()
            # WITH map projections: `t{.int} AS _map` -> alias whose
            # value is {prop: n[prop]} (neo4j_to_neo4j.conf shape)
            projections = {}
            for pm in re.finditer(
                    rf"{var}\s*\{{\s*\.(\w+)\s*\}}\s+AS\s+(\w+)",
                    with_clause or "", re.I):
                projections[pm.group(2)] = pm.group(1)
            outs = []  # (kind, payload, column_name)
            for item in ret.split(","):
                item = item.strip()
                am = re.match(rf"{var}\.(\w+)(?:\s+AS\s+(\w+))?$", item,
                              re.I)
                if am:
                    # RETURN t.prop without AS keeps `t.prop` as the
                    # column name (real server behavior)
                    outs.append(("prop", am.group(1),
                                 am.group(2) or item))
                elif item in projections:
                    outs.append(("map", projections[item], item))
            with lock:
                nodes = list(state.get(label, []))

            def val(n, kind, payload):
                if kind == "map":
                    return {payload: n.get(payload)}
                return n.get(payload)

            return {"columns": [name for _, _, name in outs],
                    "data": [{"row": [val(n, k, p) for k, p, _ in outs]}
                             for n in nodes]}
        raise ValueError(f"mini-neo4j: unsupported cypher {stmt!r}")

    class H(_Handler):
        def do_POST(self):
            if not re.match(r"^/db/[^/]+/tx/commit$", self.path):
                self._reply(404, {"errors": [{"message": "bad path"}]})
                return
            body = json.loads(self._body() or b"{}")
            results, errors = [], []
            for s in body.get("statements", []):
                try:
                    results.append(run_statement(
                        s.get("statement", ""), s.get("parameters") or {}))
                except ValueError as e:
                    errors.append({"code": "Neo.ClientError",
                                   "message": str(e)})
            self._reply(200, {"results": results, "errors": errors})

    port, stop = _serve(H, port)
    return state, port, stop


# ==========================================================================
# IoTDB (REST API v2)
# ==========================================================================

def start_mini_iotdb(port: int = 0):
    """insertTablet writes + a SELECT <measurements|*> FROM <device>
    query subset over stored (device, time, measurement) points."""
    devices: dict[str, dict] = {}  # device -> {time: {measurement: value}}
    lock = threading.RLock()

    class H(_Handler):
        def do_POST(self):
            body = json.loads(self._body() or b"{}")
            if self.path == "/rest/v2/insertTablet":
                with lock:
                    dev = devices.setdefault(body["device"], {})
                    ms = body["measurements"]
                    for i, ts in enumerate(body["timestamps"]):
                        row = dev.setdefault(int(ts), {})
                        for j, m in enumerate(ms):
                            row[m] = body["values"][j][i]
                self._reply(200, {"code": 200, "message": "ok"})
                return
            if self.path == "/rest/v2/query":
                sql = body.get("sql", "")
                aligned = bool(re.search(r"align\s+by\s+device\s*$",
                                         sql.strip(), re.I))
                if aligned:
                    sql = re.sub(r"align\s+by\s+device\s*$", "",
                                 sql.strip(), flags=re.I)
                m = re.match(
                    r"SELECT\s+(.+?)\s+FROM\s+(\S+?)"
                    r"(?:\s+WHERE\s+(.*?))?\s*$", sql.strip(), re.I)
                if not m:
                    self._reply(400, {"code": 400, "message": "bad sql"})
                    return
                cols_s, pattern, where = m.groups()
                with lock:
                    if pattern.endswith(".*"):
                        prefix = pattern[:-2]
                        devs = {d: dict(v) for d, v in devices.items()
                                if d.startswith(prefix + ".")}
                    else:
                        devs = {pattern: dict(devices.get(pattern, {}))}
                lo = hi = None
                for cond in re.split(r"\s+AND\s+", where or "",
                                     flags=re.I):
                    cm = re.match(r"time\s*(>=|<)\s*(\d+)", cond.strip())
                    if cm and cm.group(1) == ">=":
                        lo = int(cm.group(2))
                    elif cm:
                        hi = int(cm.group(2))
                pairs = sorted(
                    (d, t) for d, dev in devs.items() for t in dev
                    if (lo is None or t >= lo) and (hi is None or t < hi))
                if cols_s.strip() == "*":
                    cols = sorted({m for d, dev in devs.items()
                                   for t in dev for m in dev[t]})
                else:
                    cols = [c.strip() for c in cols_s.split(",")]
                if aligned:
                    # align by device: a Device column precedes the
                    # measurement columns, one row per (device, time)
                    self._reply(200, {
                        "expressions": ["Device"] + cols,
                        "column_names": None,
                        "timestamps": [t for _d, t in pairs],
                        "values": [[d for d, _t in pairs]] + [
                            [devs[d][t].get(c) for d, t in pairs]
                            for c in cols]})
                    return
                times = [t for _d, t in pairs]
                dev = next(iter(devs.values()), {})
                self._reply(200, {
                    "expressions": [f"{pattern}.{c}" for c in cols],
                    "column_names": None,
                    "timestamps": times,
                    "values": [[dev[t].get(c) for t in times]
                               for c in cols]})
                return
            self._reply(404, {"code": 404})

    port, stop = _serve(H, port)
    return devices, port, stop


__all__ = ["start_mini_influx", "start_mini_qdrant",
           "start_mini_typesense", "start_mini_sqs", "MiniInflux",
           "start_mini_streamload", "start_mini_dynamo",
           "start_mini_clickhouse", "start_mini_milvus",
           "start_mini_neo4j", "start_mini_iotdb"]
