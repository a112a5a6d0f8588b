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
        self.users = {user: password}  # extra roles may be added
        self.copied: list[tuple] = []  # COPY FROM STDIN rows
        self.auth = auth
        self.statements: list[str] = []
        # uppercased-prefix -> (cols, oids, rows-of-strings)
        self.canned: dict[str, tuple[list[str], list[int], list[tuple]]] = {}
        # -- logical-replication master state --------------------------
        self.wal: list[tuple[int, bytes]] = []  # (lsn, pgoutput message)
        self.lsn = 0x1000
        self.snapshot_lsn: int | None = None
        self._rels: dict[tuple[str, str], tuple[int, list]] = {}
        self._xid = 100

    # -- WAL seeding helpers (pgoutput encoder lives in pg_logical) ----
    def wal_table(self, namespace: str, name: str,
                  cols: list[tuple[str, int]]) -> None:
        """cols = [(name, type_oid)] — registers the relation; its
        Relation message precedes the first row event."""
        from seatunnel_spark import pg_logical as L

        rel_id = 16000 + len(self._rels)
        self._rels[(namespace, name)] = (rel_id, cols)
        self._append(L.enc_relation(rel_id, namespace, name, cols))

    def _append(self, msg: bytes) -> None:
        self.lsn += 8
        self.wal.append((self.lsn, msg))

    def _tx(self, msgs: list) -> None:
        from seatunnel_spark import pg_logical as L

        self._xid += 1
        self._append(L.enc_begin(self.lsn + 8, self._xid))
        for m in msgs:
            self._append(m)
        self._append(L.enc_commit(self.lsn + 8))

    def wal_insert(self, namespace: str, name: str, rows: list) -> None:
        from seatunnel_spark import pg_logical as L

        rel_id, _ = self._rels[(namespace, name)]
        self._tx([L.enc_insert(rel_id, list(r)) for r in rows])

    def wal_update(self, namespace: str, name: str, pairs: list) -> None:
        from seatunnel_spark import pg_logical as L

        rel_id, _ = self._rels[(namespace, name)]
        self._tx([L.enc_update(rel_id, list(b), list(a))
                  for b, a in pairs])

    def wal_delete(self, namespace: str, name: str, rows: list) -> None:
        from seatunnel_spark import pg_logical as L

        rel_id, _ = self._rels[(namespace, name)]
        self._tx([L.enc_delete(rel_id, list(r)) for r in rows])

    def mark_snapshot(self) -> None:
        """Canned tables reflect state as of this LSN; WAL appended
        after it is the concurrent-change stream."""
        self.snapshot_lsn = self.lsn


def _msg(mtype: bytes, payload: bytes) -> bytes:
    return mtype + struct.pack(">i", 4 + len(payload)) + payload


def _send_rs(conn, cols, oids, rows) -> None:
    """RowDescription + DataRows + CommandComplete."""
    desc = struct.pack(">h", len(cols))
    for c, oid in zip(cols, oids):
        desc += c.encode() + b"\0" + struct.pack(">ihihih", 0, 0, oid,
                                                 -1, -1, 0)
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
        startup = read_exact(ln - 4)  # version + kv pairs
        want = getattr(pg, "required_protocol", None)
        if want is not None:
            (ver,) = struct.unpack(">i", startup[:4])
            if ver != want:
                # vertica mode: a stock pg 3.0 client is not speaking
                # the dialect — reject like a version mismatch would
                conn.sendall(_msg(b"E", b"SFATAL\0Cprotocol\0"
                                  b"Munsupported protocol version\0\0"))
                return
        # the connecting user from the startup message (several roles
        # may exist: the opengauss confs read as gaussdb, sink as dailai)
        kvs = startup[4:].split(b"\0")
        req_user = pg.user
        for i in range(0, len(kvs) - 1, 2):
            if kvs[i] == b"user":
                req_user = kvs[i + 1].decode()
        salt = b"sal7"
        if pg.auth == "md5":
            conn.sendall(_msg(b"R", struct.pack(">i", 5) + salt))
            mtype = read_exact(1)
            (ln,) = struct.unpack(">i", read_exact(4))
            pwd = read_exact(ln - 4).rstrip(b"\0")
            users = getattr(pg, "users", None) or {pg.user: pg.password}
            right = users.get(req_user, pg.password)
            inner = hashlib.md5(
                right.encode() + req_user.encode()).hexdigest()
            want = b"md5" + hashlib.md5(
                inner.encode() + salt).hexdigest().encode()
            if mtype != b"p" or pwd != want or req_user not in users:
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
            up = sql.upper()
            if up.startswith("IDENTIFY_SYSTEM"):
                from seatunnel_spark.pg_logical import lsn_str

                _send_rs(conn, ["systemid", "timeline", "xlogpos",
                                "dbname"],
                         [25, 23, 25, 25],
                         [("mini-pg-1", "1", lsn_str(pg.lsn), "postgres")])
                conn.sendall(_msg(b"Z", b"I"))
                continue
            if up.startswith("CREATE_REPLICATION_SLOT"):
                from seatunnel_spark.pg_logical import lsn_str

                slot = sql.split()[1]
                # consistent_point: on a real server this is the WAL
                # position at slot creation; the fixture pre-seeds the
                # post-snapshot WAL before the client connects, so the
                # mark_snapshot() point models "slot created here, later
                # wal entries are concurrent changes".
                point = pg.snapshot_lsn if pg.snapshot_lsn is not None \
                    else pg.lsn
                _send_rs(conn, ["slot_name", "consistent_point",
                                "snapshot_name", "output_plugin"],
                         [25, 25, 25, 25],
                         [(slot, lsn_str(point), "snap", "pgoutput")])
                conn.sendall(_msg(b"Z", b"I"))
                continue
            if up.startswith("START_REPLICATION"):
                import re as _re

                from seatunnel_spark.pg_logical import lsn_int

                m = _re.search(r"LOGICAL\s+([0-9A-Fa-f]+/[0-9A-Fa-f]+)",
                               sql)
                start = lsn_int(m.group(1)) if m else 0
                conn.sendall(_msg(b"W", b"\x00" + struct.pack(">h", 0)))
                for lsn, wmsg in list(pg.wal):
                    if lsn <= start:
                        continue
                    xlog = b"w" + struct.pack(">QQQ", lsn, lsn, 0) + wmsg
                    conn.sendall(_msg(b"d", xlog))
                conn.sendall(_msg(b"c", b""))  # CopyDone: bounded end
                conn.sendall(_msg(b"C", b"COPY 0\0"))
                conn.sendall(_msg(b"Z", b"I"))
                continue
            hit = next((v for k, v in pg.canned.items()
                        if sql.upper().startswith(k)), None)
            import re as _re2

            m_copy = _re2.match(r"\s*COPY\s+([\w.\"]+)\s*\(([^)]*)\)\s+"
                                r"FROM\s+STDIN", sql, _re2.I)
            if m_copy:
                # CopyInResponse: text format, n columns, per-col fmt 0
                names = [c.strip() for c in m_copy.group(2).split(",")]
                conn.sendall(_msg(b"G", b"\x00"
                             + struct.pack(">h", len(names))
                             + struct.pack(">h", 0) * len(names)))
                text = ""
                while True:
                    ct = read_exact(1)
                    (cln,) = struct.unpack(">i", read_exact(4))
                    cpayload = read_exact(cln - 4)
                    if ct == b"d":
                        text += cpayload.decode()
                    elif ct in (b"c", b"f"):
                        break
                n = 0
                for line in text.splitlines():
                    cells = [None if c == "\\N" else c
                             .replace("\\t", "\t").replace("\\n", "\n")
                             .replace("\\r", "\r").replace("\\\\", "\\")
                             for c in line.split("\t")]
                    pg.copied.append((m_copy.group(1), names, cells))
                    n += 1
                conn.sendall(_msg(b"C", f"COPY {n}\0".encode()))
                conn.sendall(_msg(b"Z", b"I"))
                continue
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
