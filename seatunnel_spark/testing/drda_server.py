"""Mini DB2 DRDA server: EXCSAT/ACCSEC/SECCHK/ACCRDB handshake with
USRIDPWD verification (EBCDIC parameters), EXCSQLIMM capture,
PRPSQLSTT/OPNQRY/CNTQRY query serving from canned tables over the
FD:OCA row encodings shared with drda_wire — the Testcontainers DB2
stand-in for the jdbc_db2 confs."""

from __future__ import annotations

import re
import socket
import struct
import threading

from seatunnel_spark import drda_wire as D

# declarative type string -> (drda type, length, precision, scale)
_TYPES = {
    "smallint": (D.T_SMALLINT, 2, 0, 0),
    "int": (D.T_INTEGER, 4, 0, 0),
    "integer": (D.T_INTEGER, 4, 0, 0),
    "bigint": (D.T_BIGINT, 8, 0, 0),
    "double": (D.T_FLOAT8, 8, 0, 0),
    "real": (D.T_FLOAT4, 4, 0, 0),
    "boolean": (D.T_BOOLEAN, 1, 0, 0),
    "date": (D.T_DATE, 10, 0, 0),
    "time": (D.T_TIME, 8, 0, 0),
    "timestamp": (D.T_TIMESTAMP, 26, 0, 0),
    "varchar": (D.T_VARCHAR, 0, 0, 0),
    "varbinary": (D.T_VARBYTE, 0, 0, 0),
}


def _col(name: str, decl: str) -> D.DrdaColumn:
    m = re.match(r"(\w+)\s*(?:\((\d+)(?:\s*,\s*(\d+))?\))?",
                 decl.strip().lower())
    base, a, b = m.group(1), m.group(2), m.group(3)
    if base in ("decimal", "numeric", "dec", "num"):
        return D.DrdaColumn(name, D.T_DECIMAL, True, 0,
                            int(a or 18), int(b or 0))
    if base in ("char", "character"):
        return D.DrdaColumn(name, D.T_CHAR, True, int(a or 1))
    if base == "binary":
        return D.DrdaColumn(name, D.T_FIXBYTE, True, int(a or 1))
    t, ln, p, s = _TYPES[base]
    return D.DrdaColumn(name, t, True, ln, p, s)


class MiniDb2:
    def __init__(self, user: str = "db2inst1", password: str = "",
                 database: str = "E2E"):
        self.users = {user: password}
        self.database = database.upper()
        self.statements: list[str] = []
        # name -> (cols, decls, rows)
        self.tables: dict[str, tuple[list[str], list[str], list[tuple]]] = {}
        self.auth_failures = 0


def _handle(conn: socket.socket, srv: MiniDb2) -> None:
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

    def recv_request() -> list[tuple[int, bytes]]:
        cmds = []
        while True:
            head = read_exact(6)
            ln, _magic, fmt, _corr = struct.unpack(">HBBH", head)
            body = read_exact(ln - 6)
            cmds.extend(D.parse_objects(body))
            if not fmt & 0x40:
                return cmds

    corr = [0]

    def send_reply(parts: list[tuple[int, bytes]]) -> None:
        msg = b""
        for idx, (cp, payload) in enumerate(parts):
            corr[0] += 1
            body = D.obj(cp, payload)
            fmt = 0x02 | (0x40 if idx < len(parts) - 1 else 0x00)
            msg += struct.pack(">HBBH", len(body) + 6, 0xD0, fmt,
                               corr[0]) + body
        conn.sendall(msg)

    def sqlcard(code: int, msg: str = "") -> tuple[int, bytes]:
        return (D.SQLCARD, struct.pack(">i", code) + b"00000"
                + msg.encode())

    state = {"authed": False, "query": None}
    try:
        while True:
            cmds = recv_request()
            out: list[tuple[int, bytes]] = []
            for cp, payload in cmds:
                objs = D.parse_objects(payload)
                if cp == D.EXCSAT:
                    out.append((D.EXCSATRD,
                                D.obj(D.SRVCLSNM, D.eb("QDB2/NT64"))
                                + D.obj(D.SRVRLSLV, D.eb("SQL11055"))))
                elif cp == D.ACCSEC:
                    out.append((D.ACCSECRD, D.obj(
                        D.SECMEC,
                        struct.pack(">H", D.SECMEC_USRIDPWD))))
                elif cp == D.SECCHK:
                    user = (D.find(objs, D.USRID) or b"").decode(
                        D.EBCDIC).strip()
                    pw = (D.find(objs, D.PASSWORD) or b"").decode(
                        D.EBCDIC).strip()
                    if srv.users.get(user) != pw:
                        srv.auth_failures += 1
                        out.append((D.SECCHKRM,
                                    D.obj(D.SECCHKCD, b"\x0f")))
                    else:
                        state["authed"] = True
                        out.append((D.SECCHKRM,
                                    D.obj(D.SECCHKCD, b"\x00")))
                elif cp == D.ACCRDB:
                    if state["authed"]:
                        out.append((D.ACCRDBRM,
                                    D.obj(D.PRDID, D.eb("SQL11055"))))
                    # unauthenticated: no ACCRDBRM -> client raises
                elif cp == D.SQLSTT and state["authed"]:
                    sql = payload.decode().strip().rstrip(";")
                    srv.statements.append(sql)
                    if state.pop("prep", False):
                        dard, rows = _describe(srv, sql)
                        if dard is None:
                            out.append(sqlcard(-204, sql[:60]))
                        else:
                            state["query"] = (dard, rows, 0)
                            out.append((D.SQLDARD,
                                        D.enc_sqldard(dard)))
                    else:
                        out.append(sqlcard(0))
                elif cp == D.PRPSQLSTT:
                    state["prep"] = True
                elif cp == D.EXCSQLIMM:
                    state["prep"] = False
                elif cp == D.OPNQRY and state["authed"]:
                    q = state.get("query")
                    if q is None:
                        out.append(sqlcard(-501))
                    else:
                        cols, rows, _ = q
                        out.append((D.OPNQRYRM, b""))
                        chunk = rows[:50]
                        data = b"".join(
                            b"".join(D.enc_value(c, v)
                                     for c, v in zip(cols, r))
                            for r in chunk)
                        out.append((D.QRYDTA, data))
                        if len(rows) <= 50:
                            out.append((D.ENDQRYRM, b""))
                            state["query"] = None
                        else:
                            state["query"] = (cols, rows[50:], 0)
                elif cp == D.CNTQRY:
                    q = state.get("query")
                    if q is None:
                        out.append((D.ENDQRYRM, b""))
                    else:
                        cols, rows, _ = q
                        chunk = rows[:50]
                        data = b"".join(
                            b"".join(D.enc_value(c, v)
                                     for c, v in zip(cols, r))
                            for r in chunk)
                        out.append((D.QRYDTA, data))
                        if len(rows) <= 50:
                            out.append((D.ENDQRYRM, b""))
                            state["query"] = None
                        else:
                            state["query"] = (cols, rows[50:], 0)
                elif cp == D.RDBCMM:
                    out.append((D.ENDUOWRM, b""))
            if out:
                send_reply(out)
    except (ConnectionError, OSError, struct.error):
        pass
    finally:
        try:
            conn.close()
        except OSError:
            pass


def _describe(srv: MiniDb2, sql: str):
    m = re.match(
        r"\s*SELECT\s+(.+?)\s+FROM\s+\(?\s*"
        r"(?:SELECT\s+.+?\s+FROM\s+)?([\"\w.]+)\s*\)?"
        r"(?:\s+(?!WHERE\b|LIMIT\b|FETCH\b)\w+)?"
        r"(?:\s+WHERE\s+(.+?))?(?:\s+LIMIT\s+(\d+))?\s*$",
        sql, re.I | re.S)
    if not m:
        return None, None
    tname = m.group(2).replace('"', "").split(".")[-1].upper()
    table = srv.tables.get(tname)
    if table is None:
        return None, None
    cols, decls, rows = table
    proj = [c.strip().strip('"') for c in m.group(1).split(",")]
    if proj == ["*"]:
        proj = list(cols)
    idxs = [cols.index(c) for c in proj]
    if m.group(3) and re.match(r"\s*1\s*=\s*0", m.group(3)):
        rows = []
    if m.group(4) is not None:
        rows = rows[:int(m.group(4))]
    dcols = [_col(cols[i], decls[i]) for i in idxs]
    return dcols, [tuple(r[i] for i in idxs) for r in rows]


def start_mini_db2(user: str = "db2inst1", password: str = "",
                   database: str = "E2E", port: int = 0):
    srv = MiniDb2(user, password, database)
    sock = socket.create_server(("127.0.0.1", port))
    sock.settimeout(0.5)
    stopping = threading.Event()

    def loop():
        while not stopping.is_set():
            try:
                conn, _ = sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=_handle, args=(conn, srv),
                             daemon=True).start()

    threading.Thread(target=loop, daemon=True).start()

    def stop():
        stopping.set()
        try:
            sock.close()
        except OSError:
            pass

    return srv, sock.getsockname()[1], stop


__all__ = ["MiniDb2", "start_mini_db2"]
