"""Mini SAP HANA server speaking the hdb SQL command network protocol:
initialization handshake, SCRAMSHA256 verification (AUTHENTICATE +
CONNECT, proof recomputed from the stored password), EXECUTEDIRECT
capture, and paged SELECT serving over the same value codecs as
hana_wire — the Testcontainers `saplabs/hanaexpress` stand-in for the
jdbc_sap_hana confs (JdbcHanaIT.java)."""

from __future__ import annotations

import os
import re
import socket
import struct
import threading

from seatunnel_spark import hana_wire as H

# declarative type string -> wire type; length/fraction filled per decl
_TYPES = {
    "tinyint": H.T_TINYINT,
    "smallint": H.T_SMALLINT,
    "int": H.T_INT,
    "integer": H.T_INT,
    "bigint": H.T_BIGINT,
    "real": H.T_REAL,
    "double": H.T_DOUBLE,
    "boolean": H.T_BOOLEAN,
    "varchar": H.T_VARCHAR,
    "nvarchar": H.T_NVARCHAR,
    "char": H.T_CHAR,
    "nchar": H.T_NCHAR,
    "alphanum": H.T_ALPHANUM,
    "shorttext": H.T_SHORTTEXT,
    "binary": H.T_BINARY,
    "varbinary": H.T_VARBINARY,
    "date": H.T_DAYDATE,        # modern HANA sends the DFV>=4 forms
    "time": H.T_SECONDTIME,
    "timestamp": H.T_LONGDATE,
    "seconddate": H.T_SECONDDATE,
    "text": H.T_TEXT,
    "bintext": H.T_BINTEXT,
    "clob": H.T_CLOB,
    "nclob": H.T_NCLOB,
    "blob": H.T_BLOB,
}


def _col(name: str, decl: str) -> H.HanaColumn:
    m = re.match(r"(\w+)\s*(?:\((\d+)(?:\s*,\s*(\d+))?\))?",
                 decl.strip().lower())
    base, a, b = m.group(1), m.group(2), m.group(3)
    if base in ("decimal", "numeric", "dec", "smalldecimal"):
        return H.HanaColumn(name, H.T_DECIMAL, int(b or 0), int(a or 34))
    if base == "float":
        # HANA FLOAT(<=24) is REAL, larger (or unspecified) is DOUBLE
        t = H.T_REAL if a and int(a) <= 24 else H.T_DOUBLE
        return H.HanaColumn(name, t)
    t = _TYPES[base]
    return H.HanaColumn(name, t, 0, int(a or 0))


class MiniHana:
    def __init__(self, user: str = "SYSTEM", password: str = "",
                 database: str = "HXE", page_rows: int = 32):
        self.users = {user: password}
        self.database = database
        self.page_rows = page_rows
        self.statements: list[str] = []
        # name -> (cols, decls, rows); keys are upper-case, optionally
        # schema-qualified
        self.tables: dict[str, tuple[list[str], list[str], list[tuple]]] = {}
        self.aliases: dict[str, str] = {}  # view/synonym name -> table
        self.auth_failures = 0

    def resolve(self, name: str):
        key = name.upper()
        key = self.aliases.get(key, key)
        t = self.tables.get(key)
        if t is None:
            bare = key.split(".")[-1]
            bare = self.aliases.get(bare, bare)
            t = self.tables.get(bare)
        return t


def _describe(srv: MiniHana, sql: str):
    m = re.match(
        r"\s*SELECT\s+(.+?)\s+FROM\s+\(?\s*"
        r"(?:SELECT\s+.+?\s+FROM\s+)?([\"\w.]+)\s*\)?"
        r"(?:\s+(?!WHERE\b|LIMIT\b)\w+)?"
        r"(?:\s+WHERE\s+(.+?))?(?:\s+LIMIT\s+(\d+))?\s*$",
        sql, re.I | re.S)
    if not m:
        return None, None
    table = srv.resolve(m.group(2).replace('"', ""))
    if table is None:
        return None, None
    cols, decls, rows = table
    proj = [c.strip().strip('"') for c in m.group(1).split(",")]
    if proj == ["*"]:
        proj = list(cols)
    try:
        idxs = [cols.index(c) for c in proj]
    except ValueError:
        return None, None
    if m.group(3) and re.match(r"\s*1\s*=\s*0", m.group(3)):
        rows = []
    if m.group(4) is not None:
        rows = rows[:int(m.group(4))]
    hcols = [_col(cols[i], decls[i]) for i in idxs]
    return hcols, [tuple(r[i] for i in idxs) for r in rows]


def _rows_chunk(cols, rows) -> bytes:
    return b"".join(b"".join(H.enc_value(c, v) for c, v in zip(cols, r))
                    for r in rows)


def _handle(conn: socket.socket, srv: MiniHana) -> None:
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

    state = {"authed": False, "challenge": None, "session": 0,
             "cursors": {}, "next_rs": 1}

    def reply(fc: int, parts: list[H.Part]) -> None:
        conn.sendall(H.build_message(state["session"], 0, H.SEG_REPLY,
                                     fc, parts))

    def error(code: int, sqlstate: str, text: str) -> None:
        t = text.encode()
        body = (struct.pack("<iiib", code, 0, len(t), 1)
                + sqlstate.encode().ljust(5)[:5] + t)
        conn.sendall(H.build_message(
            state["session"], 0, H.SEG_ERROR, 0,
            [H.Part(H.PK_ERROR, 0, 1, body)]))

    def serve_page(rs_id: bytes, first: bool) -> list[H.Part]:
        cols, rows, pos = state["cursors"][rs_id]
        chunk = rows[pos:pos + srv.page_rows]
        done = pos + len(chunk) >= len(rows)
        attrs = (H.ATTR_FIRST_PACKET if first else 0)
        if done:
            attrs |= H.ATTR_LAST_PACKET | H.ATTR_RESULTSET_CLOSED
            del state["cursors"][rs_id]
        else:
            state["cursors"][rs_id] = (cols, rows, pos + len(chunk))
        if not chunk and not first:
            attrs |= H.ATTR_ROW_NOT_FOUND
        return [H.Part(H.PK_RESULTSET, attrs, len(chunk),
                       _rows_chunk(cols, chunk))]

    try:
        init = read_exact(14)
        if init[:4] != b"\xff\xff\xff\xff":
            return
        conn.sendall(struct.pack("<Bh", 2, 0) + struct.pack("<Bh", 4, 1)
                     + b"\x00\x00")
        while True:
            head = read_exact(32)
            _sid, _pc, varlen = struct.unpack_from("<qiI", head, 0)
            payload = read_exact(varlen)
            kind, msg_type, parts = H.parse_message(payload)
            if kind != H.SEG_REQUEST:
                return
            if msg_type == H.MSG_AUTHENTICATE:
                auth = next(p for p in parts
                            if p.kind == H.PK_AUTHENTICATION)
                user_b, method, client_nonce = H.fields_decode(auth.buffer)
                if method != b"SCRAMSHA256":
                    error(10, "28000", "unsupported auth method")
                    continue
                salt, server_nonce = os.urandom(16), os.urandom(48)
                state["challenge"] = (user_b.decode(), salt, server_nonce,
                                      client_nonce)
                reply(0, [H.Part(H.PK_AUTHENTICATION, 0, 1,
                                 H.fields_encode([
                                     b"SCRAMSHA256",
                                     H.fields_encode([salt,
                                                      server_nonce])]))])
            elif msg_type == H.MSG_CONNECT:
                ch = state.get("challenge")
                auth = next((p for p in parts
                             if p.kind == H.PK_AUTHENTICATION), None)
                if ch is None or auth is None:
                    error(10, "28000", "authentication sequence error")
                    continue
                user_b, _method, proof_field = H.fields_decode(auth.buffer)
                user, salt, server_nonce, client_nonce = ch
                pw = srv.users.get(user)
                expected = None if pw is None else H.scram_client_proof(
                    pw, salt, server_nonce, client_nonce)
                if expected is None or proof_field[2:] != expected:
                    srv.auth_failures += 1
                    error(10, "28000",
                          "authentication failed: invalid user/password")
                    continue
                state["authed"] = True
                state["session"] = int.from_bytes(os.urandom(4), "little")
                reply(14, [
                    H.Part(H.PK_AUTHENTICATION, 0, 1,
                           H.fields_encode([b"SCRAMSHA256", b""])),
                    H.Part(H.PK_CONNECTOPTIONS, 0, 1, H.options_encode(
                        [(H.CO_DATA_FORMAT_VERSION2, H.T_INT, 8)])),
                ])
            elif msg_type == H.MSG_EXECUTEDIRECT:
                if not state["authed"]:
                    error(10, "28000", "not authenticated")
                    continue
                cmd = next((p for p in parts if p.kind == H.PK_COMMAND),
                           None)
                sql = cmd.buffer.decode().strip().rstrip(";")
                srv.statements.append(sql)
                if re.match(r"\s*SELECT\b", sql, re.I):
                    cols, rows = _describe(srv, sql)
                    if cols is None:
                        error(259, "HY000",
                              f"invalid table name: {sql[:80]}")
                        continue
                    rs_id = struct.pack("<q", state["next_rs"])
                    state["next_rs"] += 1
                    state["cursors"][rs_id] = (cols, rows, 0)
                    out = [H.Part(H.PK_RESULTSETMETADATA, 0, len(cols),
                                  H.enc_metadata(cols)),
                           H.Part(H.PK_RESULTSETID, 0, 1, rs_id)]
                    out += serve_page(rs_id, first=True)
                    reply(H.FC_SELECT, out)
                else:
                    verb = sql.split(None, 1)[0].upper()
                    fc = {"INSERT": H.FC_INSERT, "UPDATE": H.FC_UPDATE,
                          "DELETE": H.FC_DELETE}.get(verb, H.FC_DDL)
                    out = []
                    if fc != H.FC_DDL:
                        out.append(H.Part(H.PK_ROWSAFFECTED, 0, 1,
                                          struct.pack("<i", 1)))
                    reply(fc, out)
            elif msg_type == H.MSG_FETCHNEXT:
                rs = next((p for p in parts
                           if p.kind == H.PK_RESULTSETID), None)
                if rs is None or rs.buffer not in state["cursors"]:
                    reply(H.FC_FETCH, [H.Part(
                        H.PK_RESULTSET,
                        H.ATTR_LAST_PACKET | H.ATTR_RESULTSET_CLOSED
                        | H.ATTR_ROW_NOT_FOUND, 0, b"")])
                else:
                    reply(H.FC_FETCH, serve_page(rs.buffer, first=False))
            elif msg_type == H.MSG_DISCONNECT:
                reply(18, [])
                return
            else:
                reply(0, [])
    except (ConnectionError, OSError, struct.error, StopIteration):
        pass
    finally:
        try:
            conn.close()
        except OSError:
            pass


def start_mini_hana(user: str = "SYSTEM", password: str = "",
                    database: str = "HXE", port: int = 0,
                    page_rows: int = 32):
    srv = MiniHana(user, password, database, page_rows)
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


__all__ = ["MiniHana", "start_mini_hana"]
