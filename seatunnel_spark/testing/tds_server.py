"""Mini SQL Server (TDS 7.4): PRELOGIN + LOGIN7 password verification,
SQLBatch against canned tables (projection/TOP/simple WHERE), statement
capture, and the SQL Server CDC surface Debezium polls —
sys.fn_cdc_get_max_lsn() and cdc.fn_cdc_get_all_changes_<instance>
(__$start_lsn/__$seqval/__$operation/__$update_mask change rows,
operation codes 1=delete 2=insert 3=update-before 4=update-after) —
standing in for a CDC-enabled SQL Server the way MiniMySql stands in
for a binlog master. Wire encode uses the shared scalar codecs in
seatunnel_spark.tds_wire (the [MS-TDS] public spec both ends follow).
"""

from __future__ import annotations

import re
import socket
import struct
import threading

from seatunnel_spark import tds_wire as W

# declarative type string -> (type_token, fixed maxlen or None)
_TYPE_RE = re.compile(r"(\w+)\s*(?:\(\s*(\w+)\s*(?:,\s*(\d+))?\s*\))?")


class _Col:
    """Server-side column: declarative T-SQL type string parsed into
    wire shape."""

    def __init__(self, decl: str):
        m = _TYPE_RE.match(decl.strip().lower())
        base, a, b = m.group(1), m.group(2), m.group(3)
        self.base = base
        self.scale = 0
        self.precision = 0
        self.maxlen = 0
        if base in ("int", "integer"):
            self.token, self.maxlen = W.T_INTN, 4
        elif base == "bigint":
            self.token, self.maxlen = W.T_INTN, 8
        elif base == "smallint":
            self.token, self.maxlen = W.T_INTN, 2
        elif base == "tinyint":
            self.token, self.maxlen = W.T_INTN, 1
        elif base == "bit":
            self.token, self.maxlen = W.T_BITN, 1
        elif base in ("decimal", "numeric"):
            self.token = W.T_DECIMALN
            self.precision = int(a or 18)
            self.scale = int(b or 0)
            self.maxlen = 17
        elif base == "float":
            self.token, self.maxlen = W.T_FLTN, 8
        elif base == "real":
            self.token, self.maxlen = W.T_FLTN, 4
        elif base == "money":
            self.token, self.maxlen = W.T_MONEYN, 8
        elif base == "smallmoney":
            self.token, self.maxlen = W.T_MONEYN, 4
        elif base in ("varchar", "char"):
            self.token = W.T_BIGVARCHAR if base == "varchar" else W.T_BIGCHAR
            self.maxlen = 0xFFFF if a == "max" else int(a or 30)
        elif base in ("nvarchar", "nchar"):
            self.token = W.T_NVARCHAR if base == "nvarchar" else W.T_NCHAR
            self.maxlen = 0xFFFF if a == "max" else int(a or 30) * 2
        elif base == "text":  # served as varchar(max) (PLP), the
            self.token, self.maxlen = W.T_BIGVARCHAR, 0xFFFF  # modern shape
        elif base in ("ntext", "xml"):
            self.token, self.maxlen = W.T_NVARCHAR, 0xFFFF
        elif base in ("varbinary", "binary", "image"):
            self.token = W.T_BIGBINARY if base == "binary" \
                else W.T_BIGVARBINARY
            self.maxlen = 0xFFFF if (a == "max" or base == "image") \
                else int(a or 30)
        elif base == "date":
            self.token = W.T_DATEN
        elif base == "time":
            self.token, self.scale = W.T_TIMEN, int(a if a else 7)
        elif base == "datetime2":
            self.token, self.scale = W.T_DATETIME2N, int(a if a else 7)
        elif base == "datetimeoffset":
            self.token, self.scale = W.T_DATETIMEOFFSETN, int(a if a else 7)
        elif base == "datetime":
            self.token, self.maxlen = W.T_DATETIMN, 8
        elif base == "smalldatetime":
            self.token, self.maxlen = W.T_DATETIMN, 4
        elif base == "uniqueidentifier":
            self.token, self.maxlen = W.T_GUID, 16
        else:
            raise ValueError(f"mini-tds: unknown type {decl!r}")

    def type_info(self) -> bytes:
        t = self.token
        out = bytes([t])
        if t in (W.T_INTN, W.T_BITN, W.T_FLTN, W.T_MONEYN, W.T_DATETIMN,
                 W.T_GUID):
            out += bytes([self.maxlen])
        elif t == W.T_DECIMALN:
            out += bytes([self.maxlen, self.precision, self.scale])
        elif t in (W.T_BIGVARCHAR, W.T_BIGCHAR, W.T_NVARCHAR, W.T_NCHAR):
            out += struct.pack("<H", self.maxlen) + b"\x00" * 5  # collation
        elif t in (W.T_BIGVARBINARY, W.T_BIGBINARY):
            out += struct.pack("<H", self.maxlen)
        elif t in (W.T_TIMEN, W.T_DATETIME2N, W.T_DATETIMEOFFSETN):
            out += bytes([self.scale])
        elif t == W.T_DATEN:
            pass
        return out

    def encode_value(self, v) -> bytes:
        import datetime
        import decimal

        t = self.token
        if v is None:
            if t in (W.T_BIGVARCHAR, W.T_BIGCHAR, W.T_NVARCHAR, W.T_NCHAR,
                     W.T_BIGVARBINARY, W.T_BIGBINARY):
                if self.maxlen == 0xFFFF:
                    return struct.pack("<Q", W.PLP_NULL)
                return struct.pack("<H", 0xFFFF)
            return b"\x00"  # bytelen family NULL
        if t == W.T_INTN:
            # tinyint (1 byte) is unsigned in T-SQL; the rest are signed
            return bytes([self.maxlen]) + int(v).to_bytes(
                self.maxlen, "little", signed=self.maxlen > 1)
        if t == W.T_BITN:
            return b"\x01" + (b"\x01" if v not in (0, False, "0") else b"\x00")
        if t == W.T_FLTN:
            return bytes([self.maxlen]) + struct.pack(
                "<f" if self.maxlen == 4 else "<d", float(v))
        if t == W.T_DECIMALN:
            body = W.encode_decimal(v, self.scale)
            return bytes([len(body)]) + body
        if t == W.T_MONEYN:
            if self.maxlen == 4:
                return b"\x04" + int(
                    decimal.Decimal(str(v)) * 10000).to_bytes(
                        4, "little", signed=True)
            return b"\x08" + W.encode_money(v)
        if t == W.T_DATETIMN:
            dt = (v if isinstance(v, datetime.datetime)
                  else datetime.datetime.fromisoformat(str(v)))
            if self.maxlen == 4:
                return b"\x04" + W.encode_smalldatetime(dt)
            return b"\x08" + W.encode_datetime(dt)
        if t == W.T_DATEN:
            d = (v if isinstance(v, datetime.date)
                 and not isinstance(v, datetime.datetime)
                 else datetime.date.fromisoformat(str(v)))
            return b"\x03" + W.encode_date3(d)
        if t == W.T_TIMEN:
            tm = (v if isinstance(v, datetime.time)
                  else datetime.time.fromisoformat(str(v)))
            body = W.encode_time(tm, self.scale)
            return bytes([len(body)]) + body
        if t == W.T_DATETIME2N:
            dt = (v if isinstance(v, datetime.datetime)
                  else datetime.datetime.fromisoformat(str(v)))
            body = W.encode_time(dt.time(), self.scale) \
                + W.encode_date3(dt.date())
            return bytes([len(body)]) + body
        if t == W.T_DATETIMEOFFSETN:
            dt = (v if isinstance(v, datetime.datetime)
                  else datetime.datetime.fromisoformat(str(v)))
            off = dt.utcoffset() or datetime.timedelta(0)
            utc = (dt - off).replace(tzinfo=None)
            body = W.encode_time(utc.time(), self.scale) \
                + W.encode_date3(utc.date()) \
                + struct.pack("<h", int(off.total_seconds() // 60))
            return bytes([len(body)]) + body
        if t == W.T_GUID:
            import uuid as _uuid

            u = v if isinstance(v, _uuid.UUID) else _uuid.UUID(str(v))
            return b"\x10" + u.bytes_le
        if t in (W.T_BIGVARCHAR, W.T_BIGCHAR):
            raw = str(v).encode("utf-8")
        elif t in (W.T_NVARCHAR, W.T_NCHAR):
            raw = str(v).encode("utf-16-le")
        elif t in (W.T_BIGVARBINARY, W.T_BIGBINARY):
            raw = bytes(v) if not isinstance(v, str) else bytes.fromhex(
                v[2:] if v.startswith("0x") else v)
        else:
            raise ValueError(f"mini-tds: cannot encode {t:#x}")
        if self.maxlen == 0xFFFF:  # PLP: total + one chunk + terminator
            return struct.pack("<Q", len(raw)) \
                + struct.pack("<I", len(raw)) + raw \
                + struct.pack("<I", 0)
        return struct.pack("<H", len(raw)) + raw


def _colmeta(names: list[str], cols: list[_Col]) -> bytes:
    out = bytes([W.TOK_COLMETADATA]) + struct.pack("<H", len(cols))
    for name, c in zip(names, cols):
        out += struct.pack("<IH", 0, 0x0009)  # usertype, flags (nullable)
        out += c.type_info()
        out += bytes([len(name)]) + name.encode("utf-16-le")
    return out


def _row(values, cols: list[_Col]) -> bytes:
    out = bytes([W.TOK_ROW])
    for v, c in zip(values, cols):
        out += c.encode_value(v)
    return out


def _done(rowcount: int = 0, count_valid: bool = True) -> bytes:
    status = W.DONE_COUNT if count_valid else 0
    return bytes([W.TOK_DONE]) + struct.pack("<HHQ", status, 0, rowcount)


def _error(number: int, msg: str, severity: int = 14) -> bytes:
    m = msg.encode("utf-16-le")
    body = struct.pack("<IBB", number, 1, severity) \
        + struct.pack("<H", len(msg)) + m \
        + b"\x00" + b"\x00" + struct.pack("<I", 0)  # server, proc, line
    return bytes([W.TOK_ERROR]) + struct.pack("<H", len(body)) + body


class MiniSqlServer:
    """Canned-table TDS server with a CDC change log.

    tables[name] = (col_names, type_decls, rows); primary_keys[name];
    cdc_* methods append LSN-stamped change rows served through
    cdc.fn_cdc_get_all_changes_<schema>_<table>.
    """

    def __init__(self, user: str = "sa", password: str = ""):
        self.user = user
        self.password = password
        self.users: dict[str, str] = {user: password}
        self.statements: list[str] = []
        self.tables: dict[str, tuple[list[str], list[str], list[tuple]]] = {}
        self.primary_keys: dict[str, list[str]] = {}
        self.auth_failures = 0
        # CDC state: capture instance -> list[(lsn_bytes, op, row_values)]
        self._cdc: dict[str, list[tuple[bytes, int, tuple]]] = {}
        self._lsn = 0
        self.snapshot_lsn: bytes | None = None

    # -- CDC producer API (the test drives these like binlog_insert) ---
    def _next_lsn(self) -> bytes:
        self._lsn += 1
        return self._lsn.to_bytes(10, "big")

    def max_lsn(self) -> bytes:
        """Served to fn_cdc_get_max_lsn(): the frozen snapshot LSN when
        mark_snapshot() was called (emulating max_lsn observed at
        snapshot time — changes recorded after it carry later LSNs the
        stitch must replay, like MiniMySql.snapshot_pos), else the true
        current maximum."""
        return (self.snapshot_lsn if self.snapshot_lsn is not None
                else self._lsn.to_bytes(10, "big"))

    def mark_snapshot(self) -> None:
        """Freeze the LSN the snapshot SELECT observes; changes recorded
        after this call carry later LSNs (the stitch must replay them)."""
        self.snapshot_lsn = self._lsn.to_bytes(10, "big")

    def _instance(self, schema: str, table: str) -> str:
        return f"{schema}_{table}"

    def cdc_insert(self, schema: str, table: str, rows: list[tuple]) -> None:
        inst = self._cdc.setdefault(self._instance(schema, table), [])
        for r in rows:
            inst.append((self._next_lsn(), 2, tuple(r)))

    def cdc_update(self, schema: str, table: str,
                   pairs: list[tuple[tuple, tuple]]) -> None:
        inst = self._cdc.setdefault(self._instance(schema, table), [])
        for before, after in pairs:
            lsn = self._next_lsn()  # before/after share the txn LSN
            inst.append((lsn, 3, tuple(before)))
            inst.append((lsn, 4, tuple(after)))

    def cdc_delete(self, schema: str, table: str, rows: list[tuple]) -> None:
        inst = self._cdc.setdefault(self._instance(schema, table), [])
        for r in rows:
            inst.append((self._next_lsn(), 1, tuple(r)))


def _strip_brackets(s: str) -> str:
    return s.replace("[", "").replace("]", "")


def _filter_rows(cols, rows, where: str | None):
    if not where:
        return list(rows)
    if re.match(r"\s*1\s*=\s*0\s*$", where):  # schema probe
        return []
    m = re.match(r"\s*\[?(\w+)\]?\s*=\s*(?:N?'([^']*)'|(-?[\d.]+))\s*$",
                 where)
    if not m or m.group(1) not in cols:
        return list(rows)
    ci = cols.index(m.group(1))
    want = m.group(2) if m.group(2) is not None else m.group(3)
    return [r for r in rows
            if r[ci] is not None and str(r[ci]) == str(want)]


def _handle(conn: socket.socket, srv: MiniSqlServer) -> None:
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

    def recv_message() -> tuple[int, bytes]:
        parts = []
        while True:
            head = read_exact(8)
            ptype, status, length = struct.unpack(">BBH", head[:4])
            parts.append(read_exact(length - 8))
            if status & 0x01:
                return ptype, b"".join(parts)

    def send_message(ptype: int, payload: bytes) -> None:
        maxdata = 4096 - 8
        chunks = [payload[i:i + maxdata]
                  for i in range(0, len(payload), maxdata)] or [b""]
        for idx, chunk in enumerate(chunks):
            status = 0x01 if idx == len(chunks) - 1 else 0x00
            conn.sendall(struct.pack(">BBHHBB", ptype, status,
                                     len(chunk) + 8, 0, (idx + 1) & 0xFF, 0)
                         + chunk)

    def reply(*tokens: bytes) -> None:
        send_message(W.PKT_REPLY, b"".join(tokens))

    def result(names: list[str], decls: list[str], rows: list[tuple],
               count_valid: bool = True) -> None:
        cols = [_Col(d) for d in decls]
        body = _colmeta(names, cols)
        for r in rows:
            body += _row(r, cols)
        body += _done(len(rows), count_valid)
        reply(body)

    try:
        # PRELOGIN
        ptype, _payload = recv_message()
        if ptype != W.PKT_PRELOGIN:
            return
        opts = [(0x00, struct.pack(">HHH", 16, 0, 0)), (0x01, b"\x02")]
        off = len(opts) * 5 + 1
        head, data = b"", b""
        for token, p in opts:
            head += struct.pack(">BHH", token, off, len(p))
            data += p
            off += len(p)
        send_message(W.PKT_REPLY, head + b"\xff" + data)

        # LOGIN7
        ptype, payload = recv_message()
        if ptype != W.PKT_LOGIN7:
            return
        ib_user, cch_user = struct.unpack_from("<HH", payload, 36 + 4)
        ib_pw, cch_pw = struct.unpack_from("<HH", payload, 36 + 8)
        user = payload[ib_user:ib_user + cch_user * 2].decode("utf-16-le")
        pw = W.deobfuscate_password(payload[ib_pw:ib_pw + cch_pw * 2])
        if srv.users.get(user) != pw:
            srv.auth_failures += 1
            reply(_error(18456, f"Login failed for user '{user}'.", 14)
                  + _done())
            return
        prog = "mini-mssql".encode("utf-16-le")
        ack = bytes([W.TOK_LOGINACK]) \
            + struct.pack("<H", 1 + 4 + 1 + len(prog) + 4) \
            + b"\x01" + struct.pack(">I", 0x74000004) \
            + bytes([len(prog) // 2]) + prog + b"\x10\x00\x00\x00"
        reply(ack + _done())

        # SQLBatch loop
        while True:
            ptype, payload = recv_message()
            if ptype != W.PKT_SQLBATCH:
                reply(_done())
                continue
            # strip ALL_HEADERS if present
            sql_bytes = payload
            if len(payload) >= 4:
                (total,) = struct.unpack_from("<I", payload, 0)
                if 4 <= total <= len(payload):
                    sql_bytes = payload[total:]
            sql = sql_bytes.decode("utf-16-le", errors="replace").strip()
            srv.statements.append(sql)
            _dispatch(sql, srv, result, reply)
    except (ConnectionError, OSError, struct.error, ValueError):
        pass
    finally:
        try:
            conn.close()
        except OSError:
            pass


_CDC_COLS = ["__$start_lsn", "__$seqval", "__$operation", "__$update_mask"]


def _dispatch(sql: str, srv: MiniSqlServer, result, reply) -> None:
    # sys.fn_cdc_get_max_lsn()
    if re.search(r"fn_cdc_get_max_lsn\s*\(\s*\)", sql, re.I):
        result(["max_lsn"], ["binary(10)"], [(srv.max_lsn(),)])
        return
    # cdc.fn_cdc_get_all_changes_<instance>(0x.., 0x.., N'all update old')
    m = re.search(
        r"fn_cdc_get_all_changes_(\w+)\]?\s*\(\s*0x([0-9a-fA-F]+)\s*,"
        r"\s*0x([0-9a-fA-F]+)", sql)
    if m:
        inst, lo, hi = m.group(1), bytes.fromhex(m.group(2)), \
            bytes.fromhex(m.group(3))
        changes = [c for c in srv._cdc.get(inst, [])
                   if lo <= c[0] <= hi]
        # find the base table for data column types: instance is
        # <schema>_<table>; table names are unique in the fixture
        tbl = None
        for name in srv.tables:
            if inst.endswith(name):
                tbl = srv.tables[name]
                break
        if tbl is None:
            result(_CDC_COLS, ["binary(10)", "binary(10)", "int",
                               "varbinary(128)"], [])
            return
        names, decls, _ = tbl
        seq = 0
        rows = []
        for lsn, op, vals in sorted(changes, key=lambda c: (c[0], c[1])):
            seq += 1
            rows.append((lsn, seq.to_bytes(10, "big"), op, b"\xff") + vals)
        result(_CDC_COLS + list(names),
               ["binary(10)", "binary(10)", "int", "varbinary(128)"]
               + list(decls), rows)
        return
    # PK discovery (INFORMATION_SCHEMA KEY_COLUMN_USAGE join)
    if re.search(r"CONSTRAINT_TYPE\s*=\s*'PRIMARY KEY'", sql, re.I):
        mt = re.search(r"TABLE_NAME\s*=\s*N?'(\w+)'", sql, re.I)
        pks = srv.primary_keys.get(mt.group(1), []) if mt else []
        result(["COLUMN_NAME"], ["nvarchar(128)"],
               [(c,) for c in pks])
        return
    # SELECT [TOP n] cols FROM [(subquery)] table [alias] [WHERE ...]
    m = re.match(
        r"\s*SELECT\s+(?:TOP\s+(\d+)\s+)?(.+?)\s+FROM\s+\(?\s*"
        r"(?:SELECT\s+.+?\s+FROM\s+)?([\[\]\w.]+)\s*\)?"
        r"(?:\s+(?!WHERE\b)\w+)?"
        r"(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
        sql, re.I | re.S)
    if m:
        tname = _strip_brackets(m.group(3)).split(".")[-1]
        table = srv.tables.get(tname)
        if table is not None:
            names, decls, rows = table
            proj = [_strip_brackets(c.strip()) for c in m.group(2).split(",")]
            if proj == ["*"]:
                proj = list(names)
            idxs = [names.index(c) for c in proj]
            rows = _filter_rows(names, rows, m.group(4))
            if m.group(1) is not None:
                rows = rows[:int(m.group(1))]
            result([names[i] for i in idxs], [decls[i] for i in idxs],
                   [tuple(r[i] for i in idxs) for r in rows])
            return
        reply(_error(208, f"Invalid object name '{tname}'.") + _done())
        return
    # writes / DDL / everything else: captured, one affected row for DML
    is_dml = bool(re.match(r"\s*(INSERT|UPDATE|DELETE|MERGE)\b", sql, re.I))
    reply(_done(1 if is_dml else 0, count_valid=is_dml))


def start_mini_sqlserver(user: str = "sa", password: str = "",
                         port: int = 0):
    srv = MiniSqlServer(user, password)
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


__all__ = ["MiniSqlServer", "start_mini_sqlserver"]
