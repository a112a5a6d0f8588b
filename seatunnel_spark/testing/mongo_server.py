"""Mini MongoDB — an in-process TCP server speaking OP_MSG for the
commands the connector uses (hello/ping, find+getMore, insert, update,
delete, count, drop) with a query-match subset ($eq implicit, $gt/
$gte/$lt/$lte/$in/$ne, $and/$or) — the sandbox stand-in for the
reference's Testcontainers MongoDB fixture (connector-mongodb-e2e
MongodbIT)."""

from __future__ import annotations

import itertools
import socket
import struct
import threading

from seatunnel_spark import bson_codec as bson

_OP_MSG = 2013


def _cmp(a, b):
    try:
        if a is None or b is None:
            return (a is None) - (b is None) or 0
        if isinstance(a, bson.ObjectId) and isinstance(b, bson.ObjectId):
            a, b = a.raw, b.raw
        return (a > b) - (a < b)
    except TypeError:
        return (str(a) > str(b)) - (str(a) < str(b))


def _matches(doc: dict, query: dict) -> bool:
    for k, cond in (query or {}).items():
        if k == "$and":
            if not all(_matches(doc, c) for c in cond):
                return False
            continue
        if k == "$or":
            if not any(_matches(doc, c) for c in cond):
                return False
            continue
        v = doc.get(k)
        if isinstance(cond, dict) and any(str(x).startswith("$") for x in cond):
            for op, rhs in cond.items():
                if op == "$gt" and not (v is not None and _cmp(v, rhs) > 0):
                    return False
                elif op == "$gte" and not (v is not None and _cmp(v, rhs) >= 0):
                    return False
                elif op == "$lt" and not (v is not None and _cmp(v, rhs) < 0):
                    return False
                elif op == "$lte" and not (v is not None and _cmp(v, rhs) <= 0):
                    return False
                elif op == "$in" and v not in rhs:
                    return False
                elif op == "$ne" and v == rhs:
                    return False
                elif op == "$eq" and v != rhs:
                    return False
        else:
            if isinstance(v, bson.ObjectId) and isinstance(cond, bson.ObjectId):
                if v.raw != cond.raw:
                    return False
            elif v != cond:
                return False
    return True


class MiniMongo:
    def __init__(self):
        self.dbs: dict[str, dict[str, dict]] = {}  # db -> coll -> {id: doc}
        self.cursors: dict[int, list] = {}
        self._cursor_n = itertools.count(1)
        self.lock = threading.RLock()
        # oplog of change-stream events; seq doubles as clusterTime.
        # seed() never logs (pre-snapshot state); the write commands do.
        self.oplog: list[dict] = []
        self.seq = 0
        self.snapshot_seq: int | None = None

    def coll(self, db: str, name: str) -> dict:
        return self.dbs.setdefault(db, {}).setdefault(name, {})

    def seed(self, db: str, coll: str, docs: list[dict]):
        with self.lock:
            c = self.coll(db, coll)
            for d in docs:
                d = dict(d)
                _id = d.setdefault("_id", bson.ObjectId())
                key = _id.raw if isinstance(_id, bson.ObjectId) else _id
                c[key] = d

    def mark_snapshot(self):
        """Change streams opened after this mark see only later writes
        (models 'stream opened at the snapshot point'; the pg_server
        fixture shape)."""
        with self.lock:
            self.snapshot_seq = self.seq

    def _log_change(self, db: str, coll: str, op: str, doc_key,
                    full_doc: dict | None):
        """Append a change-stream document (public shape: _id resume
        token, operationType, clusterTime, ns, documentKey,
        fullDocument for insert/replace and update-with-updateLookup)."""
        self.seq += 1
        ev = {"_id": {"_data": f"{self.seq:016x}"},
              "operationType": op, "clusterTime": self.seq,
              "ns": {"db": db, "coll": coll},
              "documentKey": {"_id": doc_key}}
        if full_doc is not None:
            ev["fullDocument"] = dict(full_doc)
        self.oplog.append(ev)

    def execute(self, cmd: dict) -> dict:
        db = cmd.pop("$db", "admin")
        name = next(iter(cmd))
        with self.lock:
            if name in ("hello", "isMaster", "ismaster"):
                return {"ok": 1, "maxWireVersion": 17, "helloOk": True}
            if name in ("ping", "buildInfo"):
                return {"ok": 1, "version": "7.0.0"}
            if name == "find":
                c = self.coll(db, cmd["find"])
                docs = [d for d in c.values()
                        if _matches(d, cmd.get("filter") or {})]
                docs.sort(key=lambda d: (str(type(d.get("_id"))),
                                         str(d.get("_id"))))
                for s_k, s_dir in (cmd.get("sort") or {}).items():
                    docs.sort(key=lambda d: (d.get(s_k) is None, d.get(s_k)),
                              reverse=s_dir < 0)
                if cmd.get("limit"):
                    docs = docs[:int(cmd["limit"])]
                proj = cmd.get("projection")
                if proj:
                    keep = [k for k, v in proj.items() if v]
                    docs = [{k: d.get(k) for k in ["_id", *keep] if k in d}
                            for d in docs]
                batch = int(cmd.get("batchSize", 101))
                first, rest = docs[:batch], docs[batch:]
                cid = 0
                if rest:
                    cid = next(self._cursor_n)
                    self.cursors[cid] = rest
                return {"ok": 1, "cursor": {
                    "id": cid, "ns": f"{db}.{cmd['find']}",
                    "firstBatch": first}}
            if name == "getMore":
                cid = cmd["getMore"]
                rest = self.cursors.get(cid, [])
                batch = int(cmd.get("batchSize", 101))
                out, rest = rest[:batch], rest[batch:]
                if rest:
                    self.cursors[cid] = rest
                    nid = cid
                else:
                    self.cursors.pop(cid, None)
                    nid = 0
                return {"ok": 1, "cursor": {
                    "id": nid, "ns": f"{db}.{cmd['collection']}",
                    "nextBatch": out}}
            if name == "insert":
                c = self.coll(db, cmd["insert"])
                n = 0
                for d in cmd.get("documents", []):
                    d = dict(d)
                    _id = d.setdefault("_id", bson.ObjectId())
                    key = _id.raw if isinstance(_id, bson.ObjectId) else _id
                    c[key] = d
                    self._log_change(db, cmd["insert"], "insert", _id, d)
                    n += 1
                return {"ok": 1, "n": n}
            if name == "update":
                c = self.coll(db, cmd["update"])
                n = up = 0
                for u in cmd.get("updates", []):
                    q, repl = u.get("q") or {}, u.get("u") or {}
                    hits = [k for k, d in c.items() if _matches(d, q)]
                    if not u.get("multi"):
                        hits = hits[:1]
                    if hits:
                        for k in hits:
                            if any(str(x).startswith("$") for x in repl):
                                for op, fields in repl.items():
                                    if op == "$set":
                                        c[k].update(fields)
                                    elif op == "$unset":
                                        for f in fields:
                                            c[k].pop(f, None)
                                kind = "update"
                            else:
                                _id = c[k].get("_id")
                                c[k] = dict(repl)
                                c[k].setdefault("_id", _id)
                                kind = "replace"
                            self._log_change(db, cmd["update"], kind,
                                             c[k].get("_id"), c[k])
                            n += 1
                    elif u.get("upsert"):
                        d = dict(repl)
                        for qk, qv in q.items():
                            if not str(qk).startswith("$"):
                                d.setdefault(qk, qv)
                        _id = d.setdefault("_id", bson.ObjectId())
                        key = _id.raw if isinstance(_id, bson.ObjectId) else _id
                        c[key] = d
                        self._log_change(db, cmd["update"], "insert", _id, d)
                        up += 1
                return {"ok": 1, "n": n + up, "nModified": n}
            if name == "delete":
                c = self.coll(db, cmd["delete"])
                n = 0
                for dd in cmd.get("deletes", []):
                    q = dd.get("q") or {}
                    limit = int(dd.get("limit", 0))
                    hits = [k for k, d in c.items() if _matches(d, q)]
                    if limit:
                        hits = hits[:limit]
                    for k in hits:
                        self._log_change(db, cmd["delete"], "delete",
                                         c[k].get("_id"), None)
                        del c[k]
                        n += 1
                return {"ok": 1, "n": n}
            if name == "count":
                c = self.coll(db, cmd["count"])
                return {"ok": 1, "n": sum(
                    _matches(d, cmd.get("query") or {}) for d in c.values())}
            if name == "aggregate":
                pipe = cmd.get("pipeline") or []
                cs = next((st["$changeStream"] for st in pipe
                           if isinstance(st, dict) and "$changeStream"
                           in st), None)
                if cs is None:
                    return {"ok": 0, "errmsg": "only $changeStream "
                                               "pipelines supported"}
                # stream-open position: explicit resume point wins, else
                # the snapshot mark (fixtures pre-seed the concurrent
                # writes before the client connects), else 'now'
                after = cs.get("startAtOperationTime")
                if after is None:
                    after = self.snapshot_seq if self.snapshot_seq \
                        is not None else self.seq
                target = cmd["aggregate"]  # coll name, or 1 = whole db
                evs = [e for e in self.oplog
                       if e["clusterTime"] > int(after)
                       and e["ns"]["db"] == db
                       and (target == 1 or e["ns"]["coll"] == target)]
                batch = int((cmd.get("cursor") or {}).get(
                    "batchSize", 101))
                first, rest = evs[:batch], evs[batch:]
                cid = 0
                if rest:
                    cid = next(self._cursor_n)
                    self.cursors[cid] = rest
                ns = f"{db}.{target if target != 1 else '$cmd.aggregate'}"
                return {"ok": 1, "operationTime": int(after),
                        "cursor": {"id": cid, "ns": ns,
                                   "firstBatch": first}}
            if name == "drop":
                self.dbs.get(db, {}).pop(cmd["drop"], None)
                return {"ok": 1}
            return {"ok": 0, "errmsg": f"unsupported command {name}"}


def start_mini_mongo(port: int = 0, host: str = "127.0.0.1"):
    store = MiniMongo()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(64)
    stop_flag = threading.Event()

    def handle(conn):
        buf = b""

        def read_exact(n):
            nonlocal buf
            while len(buf) < n:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            out, rest = buf[:n], buf[n:]
            buf = rest
            return out

        try:
            while not stop_flag.is_set():
                hdr = read_exact(16)
                length, req_id, _resp, opcode = struct.unpack("<iiii", hdr)
                payload = read_exact(length - 16)
                if opcode != _OP_MSG:
                    continue
                cmd, _ = bson.decode(payload, 4 + 1)  # flags + kind byte
                reply = store.execute(cmd)
                body = bson.encode(reply)
                msg = struct.pack("<iiii", 16 + 4 + 1 + len(body), 0,
                                  req_id, _OP_MSG) \
                    + struct.pack("<I", 0) + b"\x00" + body
                conn.sendall(msg)
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    def accept_loop():
        while not stop_flag.is_set():
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            threading.Thread(target=handle, args=(conn,), daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()

    def shutdown():
        stop_flag.set()
        srv.close()

    return store, srv.getsockname()[1], shutdown


__all__ = ["MiniMongo", "start_mini_mongo"]
