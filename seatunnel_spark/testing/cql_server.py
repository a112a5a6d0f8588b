"""Mini Cassandra — CQL native protocol v4 server covering STARTUP,
QUERY (INSERT / UNLOGGED BATCH / SELECT subset) for connector e2e."""

from __future__ import annotations

import re
import socket
import struct
import threading

from seatunnel_spark.cql import (
    OP_QUERY,
    OP_READY,
    OP_RESULT,
    OP_STARTUP,
    T_BIGINT,
    T_BOOLEAN,
    T_DOUBLE,
    T_VARCHAR,
    enc_string,
    enc_value,
)

_INSERT = re.compile(
    r"INSERT\s+INTO\s+(\S+?)\.(\S+?)\s*\(([^)]*)\)\s*VALUES\s*\((.*?)\)\s*$",
    re.I | re.S)
_SELECT = re.compile(
    r"SELECT\s+(.+?)\s+FROM\s+(?:(\S+?)\.)?(\S+?)(?:\s+WHERE\s+.*)?$",
    re.I | re.S)


def _parse_vals(raw: str) -> list:
    out = []
    for tok in re.findall(r"'(?:[^']|'')*'|[^,]+", raw):
        tok = tok.strip()
        if not tok:
            continue
        if tok.startswith("'"):
            out.append(tok[1:-1].replace("''", "'"))
        elif tok.upper() == "NULL":
            out.append(None)
        elif tok.lower() in ("true", "false"):
            out.append(tok.lower() == "true")
        else:
            out.append(float(tok) if "." in tok else int(tok))
    return out


class MiniCql:
    def __init__(self):
        self.tables: dict[tuple, list[dict]] = {}
        self.lock = threading.RLock()

    def execute(self, cql: str):
        cql = cql.strip().rstrip(";")
        if cql.upper().startswith("BEGIN"):
            body = re.sub(r"^BEGIN\s+\w*\s*BATCH", "", cql, flags=re.I)
            body = re.sub(r"APPLY\s+BATCH\s*$", "", body, flags=re.I)
            for stmt in body.split(";"):
                if stmt.strip():
                    self.execute(stmt)
            return None
        m = _INSERT.match(cql)
        if m:
            ks, t, cols, vals = m.groups()
            row = dict(zip([c.strip() for c in cols.split(",")],
                           _parse_vals(vals)))
            with self.lock:
                self.tables.setdefault((ks, t), []).append(row)
            return None
        m = _SELECT.match(cql)
        if m:
            cols_s, ks, t = m.groups()
            with self.lock:
                if ks is None:
                    # session default keyspace (the driver connects
                    # WITH a keyspace; bare table names resolve in it)
                    ks = next((k for k, tt in self.tables
                               if tt == t), None)
                rows = list(self.tables.get((ks, t), []))
            if cols_s.strip() == "*":
                names = sorted({k for r in rows for k in r})
            else:
                names = [c.strip() for c in cols_s.split(",")]

            def tid(v):
                if isinstance(v, bool):
                    return T_BOOLEAN
                if isinstance(v, int):
                    return T_BIGINT
                if isinstance(v, float):
                    return T_DOUBLE
                return T_VARCHAR

            meta = [(n, tid(next((r[n] for r in rows
                                  if r.get(n) is not None), "")))
                    for n in names]
            return meta, [[r.get(n) for n in names] for r in rows]
        raise ValueError(f"mini-cql: unsupported {cql!r}")


def _rows_result(meta, rows) -> bytes:
    body = struct.pack(">i", 0x0002)           # kind = Rows
    body += struct.pack(">ii", 0, len(meta))   # flags=0 (per-col specs)
    for name, tid in meta:
        body += enc_string("ks") + enc_string("t")
        body += enc_string(name) + struct.pack(">H", tid)
    body += struct.pack(">i", len(rows))
    for row in rows:
        for (name, tid), v in zip(meta, row):
            body += enc_value(v, tid)
    return body


def start_mini_cql(port: int = 0, host: str = "127.0.0.1"):
    store = MiniCql()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(32)
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
                ver, _f, stream, op, length = struct.unpack(
                    ">BBhBI", read_exact(9))
                payload = read_exact(length)
                if op == OP_STARTUP:
                    resp_op, body = OP_READY, b""
                elif op == OP_QUERY:
                    (qlen,) = struct.unpack_from(">i", payload)
                    cql = payload[4:4 + qlen].decode()
                    try:
                        out = store.execute(cql)
                    except ValueError as e:
                        msg = str(e).encode()
                        body = (struct.pack(">i", 0x2200)
                                + struct.pack(">H", len(msg)) + msg)
                        conn.sendall(struct.pack(
                            ">BBhBI", 0x84, 0, stream, 0x00, len(body))
                            + body)
                        continue
                    resp_op = OP_RESULT
                    if out is None:
                        body = struct.pack(">i", 0x0001)  # Void
                    else:
                        body = _rows_result(*out)
                else:
                    resp_op, body = OP_READY, b""
                conn.sendall(struct.pack(">BBhBI", 0x84, 0, stream,
                                         resp_op, len(body)) + body)
        except (ConnectionError, OSError, struct.error):
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


__all__ = ["MiniCql", "start_mini_cql"]
