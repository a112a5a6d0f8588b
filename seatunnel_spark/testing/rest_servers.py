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
        """SELECT <cols|*> FROM <m> [WHERE <col> >= a AND <col> < b]"""
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


__all__ = ["start_mini_influx", "start_mini_qdrant",
           "start_mini_typesense", "start_mini_sqs", "MiniInflux"]
