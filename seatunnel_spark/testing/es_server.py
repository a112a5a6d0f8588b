"""Mini Elasticsearch — an in-process HTTP server speaking the subset
of the ES REST API the connectors use: index CRUD, `_cat/indices`,
`_mapping`, `_search` with scroll + slice, `_search/scroll`, `_bulk`,
`_count`, `_delete_by_query`, `_refresh`.

This is the sandbox stand-in for the reference's Testcontainers ES
fixture (seatunnel-e2e/.../connector-elasticsearch-e2e/.../
ElasticsearchIT.java setUp) — the CONNECTOR code under test is the
real wire-path client; only the far end is simulated. Point the same
source/sink at a live cluster and nothing changes.

Query support: match_all, term, match, range (gt/gte/lt/lte), exists,
and bool{must,filter,should,must_not}.
"""

from __future__ import annotations

import gzip
import hashlib
import itertools
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit


def _slice_of(doc_id: str, n: int) -> int:
    return int(hashlib.md5(doc_id.encode()).hexdigest()[:8], 16) % n


_DATE_RX = re.compile(r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}:\d{2}(\.\d+)?Z?)?$")


def _dynamic_type(v) -> dict | None:
    """ES dynamic-mapping inference (bool->boolean, int->long,
    float->double, date-looking strings->date, str->text, object
    recursed, array -> element type)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return {"type": "boolean"}
    if isinstance(v, int):
        return {"type": "long"}
    if isinstance(v, float):
        return {"type": "double"}
    if isinstance(v, str):
        return {"type": "date"} if _DATE_RX.match(v) else {"type": "text"}
    if isinstance(v, dict):
        props = {}
        for k, x in v.items():
            t = _dynamic_type(x)
            if t:
                props[k] = t
        return {"properties": props}
    if isinstance(v, list):
        for x in v:
            t = _dynamic_type(x)
            if t:
                return t
        return None
    return {"type": "text"}


def _merge_dynamic_mapping(mapping: dict, doc: dict) -> None:
    for k, v in doc.items():
        if k in mapping:
            continue
        t = _dynamic_type(v)
        if t:
            mapping[k] = t


def _matches(doc: dict, query: dict) -> bool:
    if not query:
        return True
    kind, body = next(iter(query.items()))
    if kind == "match_all":
        return True
    if kind in ("term", "match"):
        field, want = next(iter(body.items()))
        if isinstance(want, dict):
            want = want.get("value", want.get("query"))
        return doc.get(field) == want
    if kind == "range":
        field, conds = next(iter(body.items()))
        v = doc.get(field)
        if v is None:
            return False
        for op, bound in conds.items():
            if op == "gte" and not v >= bound:
                return False
            if op == "gt" and not v > bound:
                return False
            if op == "lte" and not v <= bound:
                return False
            if op == "lt" and not v < bound:
                return False
        return True
    if kind == "exists":
        return doc.get(body["field"]) is not None
    if kind == "bool":
        for clause in body.get("must", []) + body.get("filter", []):
            if not _matches(doc, clause):
                return False
        for clause in body.get("must_not", []):
            if _matches(doc, clause):
                return False
        should = body.get("should", [])
        if should and not any(_matches(doc, c) for c in should):
            return False
        return True
    raise ValueError(f"mini-es: unsupported query {kind!r}")


class MiniEs:
    """State + request logic, wrapped by the HTTP handler below."""

    def __init__(self):
        self.indices: dict[str, dict] = {}  # name -> {mapping, docs{id: doc}}
        self.scrolls: dict[str, list] = {}
        self._page_size: dict[str, int] = {}
        self._scroll_n = itertools.count()
        self._doc_n = itertools.count()
        self.lock = threading.RLock()

    # -- index admin ------------------------------------------------------
    def create_index(self, name: str, body: dict | None):
        with self.lock:
            if name in self.indices:
                return 400, {"error": {"type": "resource_already_exists_exception"}}
            self.indices[name] = {
                "mapping": (body or {}).get("mappings", {}).get("properties", {}),
                "docs": {},
            }
            return 200, {"acknowledged": True}

    def seed(self, name: str, docs: list[dict], mapping: dict | None = None):
        """Test helper: bulk-load documents outside the HTTP path."""
        with self.lock:
            ix = self.indices.setdefault(name, {"mapping": mapping or {}, "docs": {}})
            if mapping:
                ix["mapping"] = mapping
            for d in docs:
                body = {k: v for k, v in d.items() if k != "_id"}
                _merge_dynamic_mapping(ix["mapping"], body)
                ix["docs"][d.get("_id") or f"doc-{next(self._doc_n)}"] = body

    # -- request dispatch -------------------------------------------------
    def handle(self, method: str, path: str, qs: dict, body):
        parts = [p for p in path.split("/") if p]
        with self.lock:
            return self._route(method, path, parts, qs, body)

    def _route(self, method, path, parts, qs, body):
        if not parts:
            return 200, {"name": "mini-es", "cluster_name": "mini",
                         "version": {"number": "8.11.0"}}
        if parts[0] == "_search" and len(parts) > 1 and parts[1] == "scroll":
            if method == "DELETE":
                for sid in (body or {}).get("scroll_id", []):
                    self.scrolls.pop(sid, None)
                return 200, {"succeeded": True}
            sid = (body or {}).get("scroll_id")
            hits = self.scrolls.get(sid, [])
            size = len(hits) and min(len(hits), self._page_size.get(sid, 100))
            page, self.scrolls[sid] = hits[:size], hits[size:]
            return 200, {"_scroll_id": sid,
                         "hits": {"total": {"value": len(page)}, "hits": page}}
        if parts[0] == "_bulk":
            return self._bulk(body)
        if parts[0] == "_cat" and parts[1] == "indices":
            pattern = parts[2] if len(parts) > 2 else "*"
            rx = re.compile("^" + re.escape(pattern).replace(r"\*", ".*") + "$")
            return 200, [{"index": n, "docsCount": str(len(ix["docs"]))}
                         for n, ix in sorted(self.indices.items())
                         if rx.match(n)]

        index = parts[0]
        rest = parts[1:]
        if not rest:
            if method == "HEAD":
                return (200, None) if index in self.indices else (404, None)
            if method == "PUT":
                return self.create_index(index, body)
            if method == "DELETE":
                if self.indices.pop(index, None) is None:
                    return 404, {"error": {"type": "index_not_found_exception"}}
                return 200, {"acknowledged": True}
            if method == "GET":
                ix = self.indices.get(index)
                if ix is None:
                    return 404, {"error": {"type": "index_not_found_exception"}}
                return 200, {index: {"mappings": {"properties": ix["mapping"]}}}
        if index not in self.indices:
            return 404, {"error": {"type": "index_not_found_exception"}}
        ix = self.indices[index]
        op = rest[0]
        if op == "_mapping":
            return 200, {index: {"mappings": {"properties": ix["mapping"]}}}
        if op == "_count":
            q = (body or {}).get("query", {"match_all": {}})
            n = sum(_matches(d, q) for d in ix["docs"].values())
            return 200, {"count": n}
        if op == "_refresh":
            return 200, {"_shards": {"successful": 1}}
        if op == "_delete_by_query":
            q = (body or {}).get("query", {"match_all": {}})
            victims = [i for i, d in ix["docs"].items() if _matches(d, q)]
            for i in victims:
                del ix["docs"][i]
            return 200, {"deleted": len(victims)}
        if op == "_search":
            return self._search(ix, qs, body or {})
        if op == "_doc" and len(rest) > 1:
            if method in ("PUT", "POST"):
                ix["docs"][rest[1]] = body or {}
                return 201, {"_id": rest[1], "result": "created"}
            if method == "GET":
                d = ix["docs"].get(rest[1])
                if d is None:
                    return 404, {"found": False}
                return 200, {"_id": rest[1], "found": True, "_source": d}
        return 400, {"error": {"type": "unsupported", "reason": path}}

    def _search(self, ix, qs, body):
        q = body.get("query", {"match_all": {}})
        fields = body.get("_source")
        sl = body.get("slice")
        hits = []
        for doc_id, doc in sorted(ix["docs"].items()):
            if sl and _slice_of(doc_id, int(sl["max"])) != int(sl["id"]):
                continue
            if not _matches(doc, q):
                continue
            src = {k: v for k, v in doc.items() if k in fields} if fields else doc
            hits.append({"_index": "?", "_id": doc_id, "_source": src})
        size = int(body.get("size", 10))
        total = len(hits)
        if "scroll" in qs:
            sid = f"scroll-{next(self._scroll_n)}"
            self.scrolls[sid] = hits[size:]
            self._page_size[sid] = size
            return 200, {"_scroll_id": sid,
                         "hits": {"total": {"value": total}, "hits": hits[:size]}}
        return 200, {"hits": {"total": {"value": total}, "hits": hits[:size]}}

    def _bulk(self, raw):
        lines = [l for l in raw.decode().splitlines() if l.strip()]
        items, errors = [], False
        i = 0
        while i < len(lines):
            action = json.loads(lines[i])
            op, meta = next(iter(action.items()))
            index = meta.get("_index")
            doc_id = meta.get("_id")
            ix = self.indices.setdefault(index, {"mapping": {}, "docs": {}})
            if op == "delete":
                existed = ix["docs"].pop(doc_id, None) is not None
                items.append({"delete": {"_index": index, "_id": doc_id,
                                         "status": 200 if existed else 404,
                                         "result": "deleted" if existed
                                         else "not_found"}})
                i += 1
                continue
            payload = json.loads(lines[i + 1])
            i += 2
            if op == "index" or op == "create":
                doc_id = doc_id or f"doc-{next(self._doc_n)}"
                _merge_dynamic_mapping(ix["mapping"], payload)
                ix["docs"][doc_id] = payload
            elif op == "update":
                doc = payload.get("doc", {})
                if doc_id in ix["docs"] or payload.get("doc_as_upsert"):
                    _merge_dynamic_mapping(ix["mapping"], doc)
                    ix["docs"].setdefault(doc_id, {}).update(doc)
                else:
                    errors = True
                    items.append({"update": {"_index": index, "_id": doc_id,
                                             "status": 404,
                                             "error": {"type": "document_missing"}}})
                    continue
            else:
                errors = True
                items.append({op: {"status": 400,
                                   "error": {"type": "unsupported_action"}}})
                continue
            items.append({op: {"_index": index, "_id": doc_id, "status": 200}})
        return 200, {"errors": errors, "took": 1, "items": items}


def start_mini_es(port: int = 0, host: str = "127.0.0.1"):
    """Start a MiniEs on a background thread; returns (MiniEs, port,
    shutdown_fn). port=0 picks a free port."""
    es = MiniEs()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _do(self):
            parts = urlsplit(self.path)
            qs = {k: v[0] for k, v in parse_qs(parts.query).items()}
            n = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(n) if n else b""
            if self.headers.get("Content-Encoding") == "gzip":
                raw = gzip.decompress(raw)
            ctype = self.headers.get("Content-Type", "")
            if parts.path.endswith("/_bulk"):
                body = raw
            elif raw and "json" in ctype:
                body = json.loads(raw)
            else:
                body = None
            try:
                status, payload = es.handle(self.command, parts.path, qs, body)
            except Exception as e:  # noqa: BLE001
                status, payload = 500, {"error": {"type": "internal",
                                                  "reason": str(e)}}
            data = b"" if payload is None else json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            if self.command != "HEAD":
                self.wfile.write(data)

        do_GET = do_POST = do_PUT = do_DELETE = do_HEAD = _do

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    def shutdown():
        server.shutdown()
        server.server_close()

    return es, server.server_address[1], shutdown


__all__ = ["MiniEs", "start_mini_es"]
