"""Mini MySQL-protocol server: v10 handshake with mysql_native_password
verification, COM_QUERY against canned tables (with a tiny
WHERE/projection subset), statement capture — stands in for the
Doris/StarRocks FE query port."""

from __future__ import annotations

import re
import socket
import struct
import threading

from seatunnel_spark.mysql_wire import (
    lenenc,
    lenenc_str,
    native_scramble,
)


class MiniMySql:
    def __init__(self, user: str = "root", password: str = ""):
        self.user = user
        self.password = password
        # multi-account support (a CDC conf often uses separate source
        # and sink users); seed more via srv.users[name] = password
        self.users: dict[str, str] = {user: password}
        self.statements: list[str] = []
        # name -> (cols, type_codes, rows)
        self.tables: dict[str, tuple[list[str], list[int], list[tuple]]] = {}
        # name -> [pk column names] (served via SHOW INDEX)
        self.primary_keys: dict[str, list[str]] = {}
        # db -> [table names] (served via SHOW DATABASES / SHOW TABLES)
        self.databases: dict[str, list[str]] = {}
        self.auth_failures = 0
        # -- binlog master state (COM_BINLOG_DUMP) ---------------------
        self.binlog: list[tuple[int, bytes]] = []  # (start_pos, event)
        self.binlog_pos = 4
        self.binlog_file = "mini-bin.000001"
        self.snapshot_pos: int | None = None
        self._table_ids: dict[tuple[str, str], int] = {}
        self._table_cols: dict[tuple[str, str], list] = {}
        self._xid = 0

    # -- binlog master helpers --------------------------------------------
    def binlog_table(self, db: str, table: str, cols: list) -> None:
        """Register a binlog table schema: cols = [(ftype, meta), ...]
        (mysql_binlog type codes)."""
        self._table_ids[(db, table)] = 100 + len(self._table_ids)
        self._table_cols[(db, table)] = list(cols)

    def _emit(self, event_fn) -> None:
        """event_fn(end_pos) -> encoded event; appends and advances."""
        with self.lock if hasattr(self, "lock") else _NullCtx():
            start = self.binlog_pos
            ev = event_fn(start)  # provisional, to size it
            end = start + len(ev)
            ev = event_fn(end)
            self.binlog.append((start, ev))
            self.binlog_pos = end

    def _rows_event(self, etype: int, db: str, table: str, rows) -> None:
        from seatunnel_spark import mysql_binlog as B

        tid = self._table_ids[(db, table)]
        cols = self._table_cols[(db, table)]
        self._emit(lambda pos: B.encode_table_map(tid, db, table, cols, pos))
        self._emit(lambda pos: B.encode_rows_event(etype, tid, cols,
                                                   rows, pos))
        self._xid += 1
        xid = self._xid
        self._emit(lambda pos: B.encode_xid_event(xid, pos))

    def binlog_insert(self, db: str, table: str, rows: list) -> None:
        from seatunnel_spark import mysql_binlog as B

        self._rows_event(B.WRITE_ROWS_EVENT, db, table, rows)

    def binlog_update(self, db: str, table: str, pairs: list) -> None:
        from seatunnel_spark import mysql_binlog as B

        self._rows_event(B.UPDATE_ROWS_EVENT, db, table, pairs)

    def binlog_delete(self, db: str, table: str, rows: list) -> None:
        from seatunnel_spark import mysql_binlog as B

        self._rows_event(B.DELETE_ROWS_EVENT, db, table, rows)

    def binlog_ddl(self, db: str, sql: str) -> None:
        from seatunnel_spark import mysql_binlog as B

        self._emit(lambda pos: B.encode_query_event(db, sql, pos))

    def mark_snapshot(self) -> None:
        """Record the position SHOW MASTER STATUS reports — the test
        double's stand-in for 'the snapshot SELECT ran at this log
        position' (canned table rows = state as of this mark; binlog
        events appended after it are the concurrent changes)."""
        self.snapshot_pos = self.binlog_pos


class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _col_def(name: str, type_code: int) -> bytes:
    return (lenenc_str(b"def") + lenenc_str(b"") + lenenc_str(b"")
            + lenenc_str(b"") + lenenc_str(name.encode())
            + lenenc_str(name.encode()) + lenenc(0x0C)
            + struct.pack("<HIBHBH", 33, 255, type_code, 0, 0, 0))


def _filter_rows(table, where: str):
    """ANDed comparison conditions; numeric compare when both sides
    parse (partition predicates `col >= lo AND col < hi` would be
    wrong lexicographically)."""
    cols, types, rows = table
    if not where:
        return rows
    conds = re.findall(r"(\w+)\s*(>=|<=|=|>|<)\s*'?([^'()\s]+)'?", where)
    if not conds:
        return rows
    import operator

    ops = {"=": operator.eq, ">": operator.gt, "<": operator.lt,
           ">=": operator.ge, "<=": operator.le}

    def keep(r):
        for col, op, val in conds:
            if col not in cols:
                continue
            cell = r[cols.index(col)]
            if cell is None:
                return False
            try:  # exact ints first: floats lose precision past 2^53
                a, b = int(cell), int(val)
            except (TypeError, ValueError):
                try:
                    a, b = float(cell), float(val)
                except (TypeError, ValueError):
                    a, b = str(cell), str(val)
            if not ops[op](a, b):
                return False
        return True

    return [r for r in rows if keep(r)]


def _handle(conn: socket.socket, srv: MiniMySql) -> None:
    buf = bytearray()
    seq = [0]

    def read_exact(n: int) -> bytes:
        while len(buf) < n:
            chunk = conn.recv(65536)
            if not chunk:
                raise ConnectionError
            buf.extend(chunk)
        out = bytes(buf[:n])
        del buf[:n]
        return out

    def read_packet() -> bytes:
        head = read_exact(4)
        ln = int.from_bytes(head[:3], "little")
        seq[0] = (head[3] + 1) & 0xFF
        return read_exact(ln)

    def send_packet(payload: bytes) -> None:
        conn.sendall(len(payload).to_bytes(3, "little")
                     + bytes([seq[0]]) + payload)
        seq[0] = (seq[0] + 1) & 0xFF

    def ok(affected: int = 0) -> bytes:
        return b"\x00" + lenenc(affected) + lenenc(0) \
            + struct.pack("<HH", 2, 0)

    def eof() -> bytes:
        return b"\xfe" + struct.pack("<HH", 0, 2)

    try:
        salt = b"12345678abcdefghijkl"  # 20 bytes
        greet = (b"\x0a" + b"8.0.0-mini\0" + struct.pack("<I", 1)
                 + salt[:8] + b"\0"
                 + struct.pack("<H", 0xF7FF) + b"\x21"
                 + struct.pack("<H", 2) + struct.pack("<H", 0x8008)
                 + bytes([21]) + b"\0" * 10 + salt[8:] + b"\0"
                 + b"mysql_native_password\0")
        seq[0] = 0
        send_packet(greet)
        resp = read_packet()
        i = 4 + 4 + 1 + 23
        end = resp.index(b"\0", i)
        user = resp[i:end].decode()
        i = end + 1
        auth_len = resp[i]
        auth = resp[i + 1:i + 1 + auth_len]
        pw = srv.users.get(user, srv.password if user == srv.user else None)
        want = native_scramble(pw, salt) if pw is not None else None
        if want is None or auth != want:
            srv.auth_failures += 1
            send_packet(b"\xff" + struct.pack("<H", 1045)
                        + b"#28000Access denied")
            return
        send_packet(ok())
        while True:
            pkt = read_packet()
            if pkt[:1] == b"\x01":  # COM_QUIT
                return
            if pkt[:1] == b"\x12":  # COM_BINLOG_DUMP
                from seatunnel_spark.mysql_binlog import encode_fde

                pos, flags, _server_id = struct.unpack_from("<IHI", pkt, 1)
                send_packet(b"\x00" + encode_fde())
                for start, ev in list(srv.binlog):
                    if start >= pos:
                        send_packet(b"\x00" + ev)
                if flags & 0x01:  # BINLOG_DUMP_NON_BLOCK -> EOF
                    send_packet(b"\xfe\x00\x00\x02\x00")
                    continue
                return  # blocking dump unsupported: close like a kill
            if pkt[:1] != b"\x03":
                send_packet(ok())
                continue
            sql = pkt[1:].decode()
            srv.statements.append(sql)
            if re.match(r"\s*SHOW\s+DATABASES", sql, re.I):
                send_packet(lenenc(1))
                send_packet(_col_def("Database", 253))
                send_packet(eof())
                for db in sorted(srv.databases):
                    send_packet(lenenc_str(db.encode()))
                send_packet(eof())
                continue
            m_st = re.match(r"\s*SHOW\s+TABLES\s+FROM\s+`?(\w+)`?", sql,
                            re.I)
            if m_st:
                db = m_st.group(1)
                send_packet(lenenc(1))
                send_packet(_col_def(f"Tables_in_{db}", 253))
                send_packet(eof())
                for t in sorted(srv.databases.get(db, [])):
                    send_packet(lenenc_str(t.encode()))
                send_packet(eof())
                continue
            m_idx = re.match(r"\s*SHOW\s+INDEX\s+FROM\s+([`\w.]+)", sql,
                             re.I)
            if m_idx:
                tname = m_idx.group(1).replace("`", "").split(".")[-1]
                pks = srv.primary_keys.get(tname, [])
                send_packet(lenenc(3))
                for c in ("Table", "Key_name", "Column_name"):
                    send_packet(_col_def(c, 253))
                send_packet(eof())
                for col in pks:
                    send_packet(lenenc_str(tname.encode())
                                + lenenc_str(b"PRIMARY")
                                + lenenc_str(col.encode()))
                send_packet(eof())
                continue
            if re.match(r"\s*SHOW\s+MASTER\s+STATUS", sql, re.I):
                pos = srv.snapshot_pos if srv.snapshot_pos is not None \
                    else srv.binlog_pos
                send_packet(lenenc(1 + 1))
                send_packet(_col_def("File", 253))
                send_packet(_col_def("Position", 8))
                send_packet(eof())
                send_packet(lenenc_str(srv.binlog_file.encode())
                            + lenenc_str(str(pos).encode()))
                send_packet(eof())
                continue
            m_ag = re.match(
                r"\s*SELECT\s+MIN\(`?(\w+)`?\)\s*,\s*MAX\(`?(\w+)`?\)\s+"
                r"FROM\s+\(?\s*(?:SELECT\s+.+?\s+FROM\s+)?([`\w.]+)",
                sql, re.I | re.S)
            if m_ag:
                # partition-bound probe (DynamicChunkSplitter MIN/MAX)
                tname = m_ag.group(3).replace("`", "").split(".")[-1]
                t = srv.tables.get(tname)
                if t is None:
                    send_packet(ok())
                    continue
                cols, _types, rows = t
                ci = cols.index(m_ag.group(1))
                raw = [r[ci] for r in rows if r[ci] is not None]
                try:  # numeric column: numeric min/max
                    vals = [float(v) for v in raw]

                    def out(v):
                        return str(int(v)) if float(v).is_integer() \
                            else str(v)
                except (TypeError, ValueError):  # varchar: lexicographic
                    vals = [str(v) for v in raw]

                    def out(v):
                        return str(v)
                lo = min(vals) if vals else None
                hi = max(vals) if vals else None
                send_packet(lenenc(2))
                send_packet(_col_def("MIN", 253))
                send_packet(_col_def("MAX", 253))
                send_packet(eof())

                def fmt(v):
                    return (b"\xfb" if v is None
                            else lenenc_str(out(v).encode()))
                send_packet(fmt(lo) + fmt(hi))
                send_packet(eof())
                continue
            m = re.match(
                r"\s*SELECT\s+(.+?)\s+FROM\s+\(?\s*"
                r"(?:SELECT\s+.+?\s+FROM\s+)?([`\w.]+)\s*\)?"
                r"(?:\s+(?!WHERE\b|LIMIT\b)\w+)?"
                r"(?:\s+WHERE\s+(.+?))?(?:\s+LIMIT\s+(\d+))?\s*;?\s*$",
                sql, re.I | re.S)
            table = None
            if m:
                tname = m.group(2).replace("`", "").split(".")[-1]
                table = srv.tables.get(tname)
            if table is None:
                send_packet(ok())
                continue
            cols, types, rows = table
            proj = [c.strip().replace("`", "")
                    for c in m.group(1).split(",")]
            if proj == ["*"]:
                proj = list(cols)
            idxs = [cols.index(c) for c in proj]
            rows = _filter_rows(table, m.group(3))
            if m.group(4) is not None:
                rows = rows[:int(m.group(4))]
            send_packet(lenenc(len(proj)))
            for c in proj:
                send_packet(_col_def(c, types[cols.index(c)]))
            send_packet(eof())
            for r in rows:
                body = b""
                for ix in idxs:
                    v = r[ix]
                    if v is None:
                        body += b"\xfb"
                    else:
                        body += lenenc_str(str(v).encode())
                send_packet(body)
            send_packet(eof())
    except (ConnectionError, OSError, struct.error, ValueError):
        pass
    finally:
        try:
            conn.close()
        except OSError:
            pass


def start_mini_mysql(user: str = "root", password: str = "",
                     port: int = 0):
    srv = MiniMySql(user, password)
    sock = socket.create_server(("127.0.0.1", port))
    sock.settimeout(0.5)
    stopping = threading.Event()

    def accept_loop():
        while not stopping.is_set():
            try:
                conn, _ = sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=_handle, args=(conn, srv),
                             daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()

    def stop():
        stopping.set()
        try:
            sock.close()
        except OSError:
            pass

    return srv, sock.getsockname()[1], stop


__all__ = ["MiniMySql", "start_mini_mysql"]
