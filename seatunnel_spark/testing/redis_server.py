"""Mini Redis — an in-process TCP server speaking RESP2 for the
commands the connector uses (SCAN/GET/SET/DEL/EXPIRE/TTL, list/set/
zset/hash verbs, AUTH/SELECT/PING) — the sandbox stand-in for the
reference's Testcontainers Redis fixture (connector-redis-e2e RedisIT).
Multiple logical DBs via SELECT; TTLs are recorded (inspectable) but
not expired mid-test."""

from __future__ import annotations

import fnmatch
import socket
import threading


class MiniRedis:
    def __init__(self):
        self.dbs: dict[int, dict[str, tuple[str, object]]] = {}
        self.ttls: dict[tuple[int, str], int] = {}
        self.lock = threading.RLock()

    def db(self, n: int) -> dict:
        return self.dbs.setdefault(n, {})

    # -- command evaluation (returns RESP-encodable python values) -------
    def execute(self, dbn: int, args: list[str]):
        cmd = args[0].upper()
        a = args[1:]
        with self.lock:
            d = self.db(dbn)
            if cmd == "PING":
                return "PONG"
            if cmd in ("AUTH", "SELECT", "FLUSHALL", "QUIT"):
                if cmd == "FLUSHALL":
                    self.dbs.clear()
                return "OK"
            if cmd == "SCAN":
                pattern, type_f = "*", None
                i = 1
                while i < len(a):
                    if a[i].upper() == "MATCH":
                        pattern = a[i + 1]
                        i += 2
                    elif a[i].upper() == "COUNT":
                        i += 2
                    elif a[i].upper() == "TYPE":
                        type_f = a[i + 1]
                        i += 2
                    else:
                        i += 1
                keys = [k for k, (t, _) in sorted(d.items())
                        if fnmatch.fnmatchcase(k, pattern)
                        and (type_f is None or t == type_f)]
                return ["0", keys]
            if cmd == "KEYS":
                return [k for k in sorted(d)
                        if fnmatch.fnmatchcase(k, a[0])]
            if cmd == "TYPE":
                return d.get(a[0], ("none", None))[0]
            if cmd == "DBSIZE":
                return len(d)
            if cmd == "GET":
                e = d.get(a[0])
                return e[1] if e and e[0] == "string" else None
            if cmd == "SET":
                d[a[0]] = ("string", a[1])
                if len(a) >= 4 and a[2].upper() == "EX":
                    self.ttls[(dbn, a[0])] = int(a[3])
                return "OK"
            if cmd == "DEL":
                n = 0
                for k in a:
                    if d.pop(k, None) is not None:
                        n += 1
                return n
            if cmd == "EXPIRE":
                if a[0] in d:
                    self.ttls[(dbn, a[0])] = int(a[1])
                    return 1
                return 0
            if cmd == "TTL":
                if a[0] not in d:
                    return -2
                return self.ttls.get((dbn, a[0]), -1)
            if cmd in ("LPUSH", "RPUSH"):
                t, v = d.setdefault(a[0], ("list", []))
                for x in a[1:]:
                    v.insert(0, x) if cmd == "LPUSH" else v.append(x)
                return len(v)
            if cmd == "LRANGE":
                v = d.get(a[0], ("list", []))[1]
                lo, hi = int(a[1]), int(a[2])
                hi = len(v) - 1 if hi == -1 else hi
                return v[lo:hi + 1]
            if cmd == "LLEN":
                return len(d.get(a[0], ("list", []))[1])
            if cmd == "LREM":
                v = d.get(a[0], ("list", []))[1]
                n = 0
                for _ in range(abs(int(a[1])) or len(v)):
                    if a[2] in v:
                        v.remove(a[2])
                        n += 1
                return n
            if cmd == "SADD":
                t, v = d.setdefault(a[0], ("set", set()))
                n = sum(x not in v for x in a[1:])
                v.update(a[1:])
                return n
            if cmd == "SREM":
                v = d.get(a[0], ("set", set()))[1]
                n = sum(x in v for x in a[1:])
                v.difference_update(a[1:])
                return n
            if cmd == "SMEMBERS":
                return sorted(d.get(a[0], ("set", set()))[1])
            if cmd == "SCARD":
                return len(d.get(a[0], ("set", set()))[1])
            if cmd == "ZCARD":
                return len(d.get(a[0], ("zset", {}))[1])
            if cmd == "HLEN":
                return len(d.get(a[0], ("hash", {}))[1])
            if cmd == "ZADD":
                t, v = d.setdefault(a[0], ("zset", {}))
                n = 0
                for i in range(1, len(a) - 1, 2):
                    if a[i + 1] not in v:
                        n += 1
                    v[a[i + 1]] = float(a[i])
                return n
            if cmd == "ZREM":
                v = d.get(a[0], ("zset", {}))[1]
                n = sum(x in v for x in a[1:])
                for x in a[1:]:
                    v.pop(x, None)
                return n
            if cmd == "ZRANGE":
                v = d.get(a[0], ("zset", {}))[1]
                ordered = [m for m, _ in sorted(v.items(),
                                                key=lambda kv: (kv[1], kv[0]))]
                lo, hi = int(a[1]), int(a[2])
                hi = len(ordered) - 1 if hi == -1 else hi
                return ordered[lo:hi + 1]
            if cmd == "HSET":
                t, v = d.setdefault(a[0], ("hash", {}))
                n = 0
                for i in range(1, len(a) - 1, 2):
                    if a[i] not in v:
                        n += 1
                    v[a[i]] = a[i + 1]
                return n
            if cmd == "HDEL":
                v = d.get(a[0], ("hash", {}))[1]
                n = sum(x in v for x in a[1:])
                for x in a[1:]:
                    v.pop(x, None)
                return n
            if cmd == "HGETALL":
                v = d.get(a[0], ("hash", {}))[1]
                out = []
                for k in sorted(v):
                    out += [k, v[k]]
                return out
            raise ValueError(f"mini-redis: unsupported command {cmd}")


def _encode(v) -> bytes:
    if v is None:
        return b"$-1\r\n"
    if isinstance(v, bool):
        return f":{int(v)}\r\n".encode()
    if isinstance(v, int):
        return f":{v}\r\n".encode()
    if isinstance(v, str):
        b = v.encode()
        return b"$" + str(len(b)).encode() + b"\r\n" + b + b"\r\n"
    if isinstance(v, (list, tuple)):
        return (f"*{len(v)}\r\n".encode()
                + b"".join(_encode(x) for x in v))
    raise TypeError(f"mini-redis: cannot encode {type(v)}")


def start_mini_redis(port: int = 0, host: str = "127.0.0.1"):
    """Start a MiniRedis; returns (MiniRedis, port, shutdown_fn)."""
    store = MiniRedis()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(64)
    stop_flag = threading.Event()

    def handle(conn):
        dbn = 0
        buf = b""

        def read_line():
            nonlocal buf
            while b"\r\n" not in buf:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            line, rest = buf.split(b"\r\n", 1)
            return line, rest

        try:
            while not stop_flag.is_set():
                line, buf = read_line()
                if not line.startswith(b"*"):
                    continue
                n = int(line[1:])
                args = []
                for _ in range(n):
                    hdr, buf = read_line()
                    size = int(hdr[1:])
                    while len(buf) < size + 2:
                        chunk = conn.recv(65536)
                        if not chunk:
                            raise ConnectionError
                        buf += chunk
                    args.append(buf[:size].decode())
                    buf = buf[size + 2:]
                if args and args[0].upper() == "SELECT":
                    dbn = int(args[1])
                    conn.sendall(b"+OK\r\n")
                    continue
                try:
                    conn.sendall(_encode(store.execute(dbn, args)))
                except ValueError as e:
                    conn.sendall(f"-ERR {e}\r\n".encode())
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


__all__ = ["MiniRedis", "start_mini_redis"]
