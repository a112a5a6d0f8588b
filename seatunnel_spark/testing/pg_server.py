"""Mini PostgreSQL-wire server: md5/cleartext auth handshake, simple
Query with canned SELECT responses and statement capture — stands in
for Redshift (S3Redshift COPY execution) and pg-family JDBC tests."""

from __future__ import annotations

import hashlib
import socket
import struct
import threading


class MiniPg:
    def __init__(self, user: str = "u", password: str = "pw",
                 auth: str = "md5"):
        self.user = user
        self.password = password
        self.auth = auth
        self.statements: list[str] = []
        # uppercased-prefix -> (cols, oids, rows-of-strings)
        self.canned: dict[str, tuple[list[str], list[int], list[tuple]]] = {}


def _msg(mtype: bytes, payload: bytes) -> bytes:
    return mtype + struct.pack(">i", 4 + len(payload)) + payload


def _handle(conn: socket.socket, pg: MiniPg) -> None:
    buf = bytearray()

    def read_exact(n: int) -> bytes:
        while len(buf) < n:
            chunk = conn.recv(65536)
            if not chunk:
                raise ConnectionError
            buf.extend(chunk)
        out = bytes(buf[:n])
        del buf[:n]
        return out

    try:
        (ln,) = struct.unpack(">i", read_exact(4))
        read_exact(ln - 4)  # startup params (version + kv pairs)
        salt = b"sal7"
        if pg.auth == "md5":
            conn.sendall(_msg(b"R", struct.pack(">i", 5) + salt))
            mtype = read_exact(1)
            (ln,) = struct.unpack(">i", read_exact(4))
            pwd = read_exact(ln - 4).rstrip(b"\0")
            inner = hashlib.md5(
                pg.password.encode() + pg.user.encode()).hexdigest()
            want = b"md5" + hashlib.md5(
                inner.encode() + salt).hexdigest().encode()
            if mtype != b"p" or pwd != want:
                conn.sendall(_msg(b"E", b"SFATAL\0M" + b"auth failed\0\0"))
                return
        conn.sendall(_msg(b"R", struct.pack(">i", 0)))
        conn.sendall(_msg(b"Z", b"I"))
        while True:
            mtype = read_exact(1)
            (ln,) = struct.unpack(">i", read_exact(4))
            payload = read_exact(ln - 4)
            if mtype == b"X":
                return
            if mtype != b"Q":
                continue
            sql = payload.rstrip(b"\0").decode()
            pg.statements.append(sql)
            hit = next((v for k, v in pg.canned.items()
                        if sql.upper().startswith(k)), None)
            if hit:
                cols, oids, rows = hit
                desc = struct.pack(">h", len(cols))
                for c, oid in zip(cols, oids):
                    desc += (c.encode() + b"\0"
                             + struct.pack(">ihihih", 0, 0, oid, -1, -1, 0))
                conn.sendall(_msg(b"T", desc))
                for r in rows:
                    body = struct.pack(">h", len(r))
                    for v in r:
                        if v is None:
                            body += struct.pack(">i", -1)
                        else:
                            vb = str(v).encode()
                            body += struct.pack(">i", len(vb)) + vb
                    conn.sendall(_msg(b"D", body))
                conn.sendall(_msg(b"C", f"SELECT {len(rows)}\0".encode()))
            else:
                tag = sql.split()[0].upper() if sql.split() else "OK"
                conn.sendall(_msg(b"C", f"{tag}\0".encode()))
            conn.sendall(_msg(b"Z", b"I"))
    except (ConnectionError, OSError, struct.error):
        pass
    finally:
        try:
            conn.close()
        except OSError:
            pass


def start_mini_pg(user: str = "u", password: str = "pw",
                  auth: str = "md5", port: int = 0):
    pg = MiniPg(user, password, auth)
    srv = socket.create_server(("127.0.0.1", port))
    srv.settimeout(0.5)
    stopping = threading.Event()

    def accept_loop():
        while not stopping.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=_handle, args=(conn, pg),
                             daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()

    def stop():
        stopping.set()
        try:
            srv.close()
        except OSError:
            pass

    return pg, srv.getsockname()[1], stop


__all__ = ["MiniPg", "start_mini_pg"]
