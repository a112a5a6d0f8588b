"""Mini HiveServer2: TCLIService over SASL-PLAIN framing against
canned tables (projection/LIMIT/simple WHERE), statement capture —
stands in for the hive-jdbc endpoint the jdbc:hive2 confs target.
Serves protocol-V6+ columnar TRowSets with nulls bitmasks through the
same thrift_codec both ends share."""

from __future__ import annotations

import re
import socket
import struct
import threading
import uuid

from seatunnel_spark import thrift_codec as T

# hive type name -> (TTypeId, TColumn union slot)
_HIVE_TYPES = {
    "boolean": (0, 1), "tinyint": (1, 2), "smallint": (2, 3),
    "int": (3, 4), "integer": (3, 4), "bigint": (4, 5),
    "float": (5, 6), "double": (6, 6), "string": (7, 7),
    "timestamp": (8, 7), "binary": (9, 7), "decimal": (15, 7),
    "date": (17, 7), "varchar": (18, 7), "char": (19, 7),
}

# TColumn slot -> element thrift type inside the values list
_SLOT_TTYPE = {1: T.BOOL, 2: T.BYTE, 3: T.I16, 4: T.I32, 5: T.I64,
               6: T.DOUBLE, 7: T.STRING}


class MiniHiveServer2:
    def __init__(self, user: str = "root", password: str = ""):
        self.user = user
        self.password = password
        # hive-jdbc sends an empty password by default; accept any
        # password for a known user unless strict_password is set
        self.strict_password = False
        self.users: dict[str, str] = {user: password}
        self.statements: list[str] = []
        # name -> (cols, hive_type_decls, rows)
        self.tables: dict[str, tuple[list[str], list[str], list[tuple]]] = {}
        self.auth_failures = 0


def _ok_status() -> tuple[int, object]:
    return (T.STRUCT, {1: (T.I32, 0)})


def _err_status(msg: str) -> tuple[int, object]:
    return (T.STRUCT, {1: (T.I32, 3), 4: (T.STRING, msg)})


def _handle_id() -> tuple[int, object]:
    return (T.STRUCT, {1: (T.STRING, uuid.uuid4().bytes),
                       2: (T.STRING, b"\x00" * 16)})


def _col_block(decl: str, values: list) -> dict:
    base = decl.split("(")[0].strip().lower()
    _tid, slot = _HIVE_TYPES[base]
    ttype = _SLOT_TTYPE[slot]
    nulls = bytearray((len(values) + 7) // 8)
    enc = []
    for i, v in enumerate(values):
        if v is None:
            nulls[i // 8] |= 1 << (i % 8)
            enc.append(False if ttype == T.BOOL
                       else 0 if ttype != T.STRING else "")
        elif ttype == T.STRING:
            enc.append(v if isinstance(v, (bytes, bytearray)) else str(v))
        elif ttype == T.DOUBLE:
            enc.append(float(v))
        elif ttype == T.BOOL:
            enc.append(bool(v))
        else:
            enc.append(int(v))
    inner = {1: (T.LIST, (ttype, enc)), 2: (T.STRING, bytes(nulls))}
    return {slot: (T.STRUCT, inner)}


def _schema_struct(cols: list[str], decls: list[str]) -> tuple[int, object]:
    descs = []
    for pos, (c, d) in enumerate(zip(cols, decls), start=1):
        base = d.split("(")[0].strip().lower()
        tid, _slot = _HIVE_TYPES[base]
        prim: dict = {1: (T.I32, tid)}
        m = re.match(r"\w+\s*\((\d+)(?:\s*,\s*(\d+))?\)", d.strip())
        if base in ("decimal",):
            # the genuine driver reads precision/scale typeQualifiers
            # unconditionally for DECIMAL (JdbcColumn.columnPrecision)
            p = int(m.group(1)) if m else 10
            s = int(m.group(2) or 0) if m else 0
            prim[2] = (T.STRUCT, {1: (T.MAP, (T.STRING, T.STRUCT, {
                "precision": {1: (T.I32, p)},
                "scale": {1: (T.I32, s)}}))})
        elif base in ("varchar", "char") and m:
            prim[2] = (T.STRUCT, {1: (T.MAP, (T.STRING, T.STRUCT, {
                "characterMaximumLength": {1: (T.I32, int(m.group(1)))}}))})
        tdesc = {1: (T.LIST, (T.STRUCT, [{1: (T.STRUCT, prim)}]))}
        descs.append({1: (T.STRING, c), 2: (T.STRUCT, tdesc),
                      3: (T.I32, pos)})
    return (T.STRUCT, {1: (T.LIST, (T.STRUCT, descs))})


def _filter_rows(cols, rows, where: str | None):
    if not where:
        return list(rows)
    if re.match(r"\s*1\s*=\s*0\s*$", where):
        return []
    m = re.match(r"\s*`?(\w+)`?\s*=\s*(?:'([^']*)'|(-?[\d.]+))\s*$", where)
    if not m or m.group(1) not in cols:
        return list(rows)
    ci = cols.index(m.group(1))
    want = m.group(2) if m.group(2) is not None else m.group(3)
    return [r for r in rows
            if r[ci] is not None and str(r[ci]) == str(want)]


def _handle(conn: socket.socket, srv: MiniHiveServer2) -> None:
    buf = bytearray()
    # per-connection pending resultsets: op guid -> (cols, decls, rows,
    # served_flag)
    ops: dict[bytes, list] = {}

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
        # SASL negotiation
        head = read_exact(5)
        status = head[0]
        (n,) = struct.unpack_from(">i", head, 1)
        mech = read_exact(n)
        if status != 0x01 or mech != b"PLAIN":
            conn.sendall(b"\x04" + struct.pack(">i", 0))
            return
        head = read_exact(5)
        (n,) = struct.unpack_from(">i", head, 1)
        resp = read_exact(n)
        parts = resp.split(b"\x00")
        user = parts[1].decode() if len(parts) > 1 else ""
        pw = parts[2].decode() if len(parts) > 2 else ""
        known = user in srv.users
        if not known or (srv.strict_password and srv.users[user] != pw):
            srv.auth_failures += 1
            conn.sendall(b"\x03" + struct.pack(">i", 4) + b"auth")
            return
        conn.sendall(b"\x05" + struct.pack(">i", 0))

        while True:
            (flen,) = struct.unpack(">i", read_exact(4))
            frame = read_exact(flen)
            name, _mtype, seqid, fields = T.decode_message(frame)
            resp_fields = _dispatch(name, fields, srv, ops)
            out = T.encode_message(name, T.REPLY, seqid,
                                   {0: (T.STRUCT, resp_fields)})
            conn.sendall(struct.pack(">i", len(out)) + out)
    except (ConnectionError, OSError, struct.error, ValueError):
        pass
    finally:
        try:
            conn.close()
        except OSError:
            pass


def _dispatch(name: str, args, srv: MiniHiveServer2, ops) -> dict:
    # service args struct wraps the request (Name_args {1: req}) —
    # both the genuine hive-jdbc driver and our client send this shape
    fields = T.sget(args, 1, {})
    if name == "OpenSession":
        # field 4 (configuration) must be present: the genuine
        # hive-jdbc driver calls getConfiguration().get(...) on it
        return {1: _ok_status(), 2: (T.I32, 9),
                3: (T.STRUCT, {1: _handle_id()}),
                4: (T.MAP, (T.STRING, T.STRING,
                            {"hive.server2.thrift.resultset.default.fetch.size":
                             "1000"}))}
    if name in ("CloseSession", "CloseOperation"):
        return {1: _ok_status()}
    if name == "GetOperationStatus":
        # synchronous execution: always FINISHED_STATE (=2)
        return {1: _ok_status(), 2: (T.I32, 2)}
    if name == "GetInfo":
        # TGetInfoValue union: CLI_DBMS_NAME(17)/CLI_DBMS_VER(18) are
        # stringValue — what DatabaseMetaData.getDatabaseProductName/
        # Version ask for
        itype = T.sget(fields, 2, 17)
        val = "Apache Hive" if itype != 18 else "3.1.3"
        return {1: _ok_status(),
                2: (T.STRUCT, {1: (T.STRING, val)})}
    if name == "ExecuteStatement":
        sql = T.text(T.sget(fields, 2), "")
        srv.statements.append(sql)
        guid = uuid.uuid4().bytes
        m = re.match(
            r"\s*SELECT\s+(.+?)\s+FROM\s+\(?\s*"
            r"(?:SELECT\s+(.+?)\s+FROM\s+)?([`\w.]+)\s*\)?"
            r"(?:\s+(?!WHERE\b|LIMIT\b)\w+)?"
            r"(?:\s+WHERE\s+(.+?))?(?:\s+LIMIT\s+(\d+))?\s*;?\s*$",
            sql, re.I | re.S)
        table = None
        if m:
            tname = m.group(3).replace("`", "").split(".")[-1]
            table = srv.tables.get(tname)
        if table is not None:
            cols, decls, rows = table

            def parse_proj(text, base):
                p = [c.strip().strip('`"') for c in text.split(",")]
                return list(base) if p == ["*"] else p

            # outer projection applies over the (optional) subquery's
            inner = parse_proj(m.group(2), cols) if m.group(2) else \
                list(cols)
            proj = parse_proj(m.group(1), inner)
            idxs = [cols.index(c) for c in proj]
            rows = _filter_rows(cols, rows, m.group(4))
            if m.group(5) is not None:
                rows = rows[:int(m.group(5))]
            ops[guid] = [[cols[i] for i in idxs],
                         [decls[i] for i in idxs],
                         [tuple(r[i] for i in idxs) for r in rows], False]
        elif re.match(r"\s*SELECT\b", sql, re.I):
            return {1: _err_status(
                f"Table not found in: {sql[:80]}")}
        else:
            ops[guid] = [[], [], [], True]  # DDL/DML: no resultset
        op_handle = {1: (T.STRUCT, {1: (T.STRING, guid),
                                    2: (T.STRING, b"\x00" * 16)}),
                     2: (T.I32, 0), 3: (T.BOOL, bool(ops[guid][0]))}
        return {1: _ok_status(), 2: (T.STRUCT, op_handle)}
    if name in ("GetResultSetMetadata", "FetchResults"):
        op = T.sget(fields, 1)
        hid = T.sget(op, 1)
        guid = T.sget(hid, 1)
        entry = ops.get(bytes(guid) if guid is not None else b"")
        if entry is None:
            return {1: _err_status("unknown operation")}
        cols, decls, rows, served = entry
        if name == "GetResultSetMetadata":
            return {1: _ok_status(), 2: _schema_struct(cols, decls)}
        if served:
            batch_rows = []
        else:
            batch_rows = rows
            entry[3] = True
        columns = []
        for ci, d in enumerate(decls):
            columns.append(_col_block(d, [r[ci] for r in batch_rows]))
        rowset = {1: (T.I64, 0), 2: (T.LIST, (T.STRUCT, [])),
                  3: (T.LIST, (T.STRUCT, columns))}
        return {1: _ok_status(), 2: (T.BOOL, False),
                3: (T.STRUCT, rowset)}
    return {1: _err_status(f"unsupported call {name}")}


def start_mini_hs2(user: str = "root", password: str = "", port: int = 0):
    srv = MiniHiveServer2(user, password)
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


__all__ = ["MiniHiveServer2", "start_mini_hs2"]
