"""PostgreSQL wire-protocol (v3) client over stdlib sockets.

Implements the public frontend/backend protocol: StartupMessage,
cleartext/MD5 password auth, simple Query with text-format result
decoding by type OID, CommandComplete tags, and error surfacing.

Used by the S3Redshift sink (Redshift speaks the pg protocol — the
reference runs its COPY over JDBC, RedshiftJdbcClient.java) and as a
stdlib fallback executor for pg-family JDBC URLs when no JVM driver
jar is on the classpath. The protocol reference is the public
PostgreSQL "Frontend/Backend Protocol" documentation.
"""

from __future__ import annotations

import hashlib
import socket
import struct

from seatunnel_spark.net import apply_host_aliases

# common type OIDs -> decoder
_OID_BOOL, _OID_BYTEA = 16, 17
_OID_INT8, _OID_INT2, _OID_INT4 = 20, 21, 23
_OID_TEXT, _OID_VARCHAR, _OID_BPCHAR = 25, 1043, 1042
_OID_FLOAT4, _OID_FLOAT8, _OID_NUMERIC = 700, 701, 1700
_OID_DATE, _OID_TIMESTAMP, _OID_TIMESTAMPTZ = 1082, 1114, 1184


def _decode_value(oid: int, text: str):
    import datetime
    import decimal

    if oid == _OID_BOOL:
        return text == "t"
    if oid in (_OID_INT2, _OID_INT4, _OID_INT8):
        return int(text)
    if oid in (_OID_FLOAT4, _OID_FLOAT8):
        return float(text)
    if oid == _OID_NUMERIC:
        return decimal.Decimal(text)
    if oid == _OID_BYTEA and text.startswith("\\x"):
        return bytes.fromhex(text[2:])
    if oid == _OID_DATE:
        return datetime.date.fromisoformat(text)
    if oid in (_OID_TIMESTAMP, _OID_TIMESTAMPTZ):
        return datetime.datetime.fromisoformat(text)
    return text


class PgClient:
    """One connection; `jdbc:postgresql://h:p/db` / `jdbc:redshift://…`
    URLs are accepted next to plain host/port arguments."""

    #: StartupMessage protocol version (3.0); Vertica's derivative
    #: dialect overrides it below.
    PROTOCOL_VERSION = 196608

    def __init__(self, host: str, port: int = 5432, user: str = "postgres",
                 password: str = "", database: str = "postgres",
                 timeout: float = 30.0, replication: str | None = None):
        url = apply_host_aliases(f"tcp://{host}:{port}")
        hostpart = url.split("://", 1)[-1]
        h, _, p = hostpart.rpartition(":")
        self.user = user
        self.sock = socket.create_connection((h, int(p)), timeout=timeout)
        self._buf = b""
        extra = f"replication\0{replication}\0" if replication else ""
        params = (f"user\0{user}\0database\0{database}\0{extra}"
                  "client_encoding\0UTF8\0\0").encode()
        startup = struct.pack(">ii", 8 + len(params),
                              self.PROTOCOL_VERSION) + params
        self.sock.sendall(startup)
        self._auth(password)

    @classmethod
    def from_jdbc_url(cls, jdbc_url: str, user: str, password: str,
                      **kw) -> "PgClient":
        rest = jdbc_url.split("://", 1)[1]
        hostport, _, db = rest.partition("/")
        db = db.split("?")[0] or "postgres"
        host, _, port = hostport.partition(":")
        return cls(host, int(port or 5439), user, password, db, **kw)

    # -- protocol I/O -----------------------------------------------------
    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("pg connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _next(self) -> tuple[bytes, bytes]:
        mtype = self._read_exact(1)
        (ln,) = struct.unpack(">i", self._read_exact(4))
        return mtype, self._read_exact(ln - 4)

    def _send(self, mtype: bytes, payload: bytes) -> None:
        self.sock.sendall(mtype + struct.pack(">i", 4 + len(payload))
                          + payload)

    @staticmethod
    def _error_text(payload: bytes) -> str:
        fields = {}
        for part in payload.split(b"\0"):
            if part:
                fields[chr(part[0])] = part[1:].decode(errors="replace")
        return fields.get("M", payload.decode(errors="replace"))

    def _auth(self, password: str) -> None:
        while True:
            mtype, payload = self._next()
            if mtype == b"R":
                (code,) = struct.unpack_from(">i", payload)
                if code == 0:
                    continue
                if code == 3:  # cleartext
                    self._send(b"p", password.encode() + b"\0")
                elif code == 5:  # md5(md5(password+user)+salt)
                    salt = payload[4:8]
                    inner = hashlib.md5(
                        password.encode() + self.user.encode()).hexdigest()
                    outer = hashlib.md5(inner.encode() + salt).hexdigest()
                    self._send(b"p", b"md5" + outer.encode() + b"\0")
                else:
                    raise RuntimeError(f"pg auth method {code} unsupported")
            elif mtype in (b"S", b"K", b"N"):
                continue
            elif mtype == b"Z":
                return
            elif mtype == b"E":
                raise RuntimeError(f"pg auth error: "
                                   f"{self._error_text(payload)}")
            else:
                raise RuntimeError(f"pg: unexpected {mtype!r} during auth")

    # -- queries ----------------------------------------------------------
    def query(self, sql: str) -> tuple[list[str], list[int], list[tuple]]:
        """Simple query -> (column_names, type_oids, decoded_rows).
        Multiple statements return the last result set."""
        self._send(b"Q", sql.encode() + b"\0")
        cols: list[str] = []
        oids: list[int] = []
        rows: list[tuple] = []
        err = None
        while True:
            mtype, payload = self._next()
            if mtype == b"T":
                cols, oids, rows = [], [], []
                (n,) = struct.unpack_from(">h", payload)
                i = 2
                for _ in range(n):
                    end = payload.index(b"\0", i)
                    cols.append(payload[i:end].decode())
                    (oid,) = struct.unpack_from(">i", payload, end + 7)
                    oids.append(oid)
                    i = end + 19
            elif mtype == b"D":
                (n,) = struct.unpack_from(">h", payload)
                i = 2
                vals = []
                for c in range(n):
                    (ln,) = struct.unpack_from(">i", payload, i)
                    i += 4
                    if ln < 0:
                        vals.append(None)
                    else:
                        vals.append(_decode_value(
                            oids[c] if c < len(oids) else _OID_TEXT,
                            payload[i:i + ln].decode()))
                        i += ln
                rows.append(tuple(vals))
            elif mtype == b"C" or mtype in (b"S", b"N", b"I"):
                continue
            elif mtype == b"E":
                err = self._error_text(payload)
            elif mtype == b"Z":
                if err:
                    raise RuntimeError(f"pg error: {err}")
                return cols, oids, rows

    def copy_in(self, table: str, cols: list[str], rows) -> str:
        """COPY table (cols) FROM STDIN, text format (tab-separated,
        \\N nulls, backslash escapes — the protocol's default COPY
        text encoding). Returns the CommandComplete tag."""
        col_list = ", ".join(cols)
        self._send(b"Q", f"COPY {table} ({col_list}) FROM STDIN"
                   .encode() + b"\0")
        # wait for CopyInResponse
        while True:
            mtype, payload = self._next()
            if mtype == b"G":
                break
            if mtype == b"E":
                raise RuntimeError(
                    f"pg copy error: {self._error_text(payload)}")

        def cell(v) -> str:
            if v is None:
                return "\\N"
            s = v.decode("utf-8", "replace") if isinstance(
                v, (bytes, bytearray)) else str(v)
            return (s.replace("\\", "\\\\").replace("\t", "\\t")
                    .replace("\n", "\\n").replace("\r", "\\r"))

        buf = []
        for r in rows:
            buf.append("\t".join(cell(v) for v in r) + "\n")
            if len(buf) >= 500:
                self._send(b"d", "".join(buf).encode())
                buf = []
        if buf:
            self._send(b"d", "".join(buf).encode())
        self._send(b"c", b"")  # CopyDone
        tag = ""
        err = None
        while True:
            mtype, payload = self._next()
            if mtype == b"C":
                tag = payload.rstrip(b"\0").decode()
            elif mtype == b"E":
                err = self._error_text(payload)
            elif mtype == b"Z":
                if err:
                    raise RuntimeError(f"pg copy error: {err}")
                return tag

    def execute(self, sql: str) -> str:
        """Run a statement, return the last CommandComplete tag."""
        self._send(b"Q", sql.encode() + b"\0")
        tag = ""
        err = None
        while True:
            mtype, payload = self._next()
            if mtype == b"C":
                tag = payload.rstrip(b"\0").decode()
            elif mtype == b"E":
                err = self._error_text(payload)
            elif mtype == b"Z":
                if err:
                    raise RuntimeError(f"pg error: {err}")
                return tag

    def close(self) -> None:
        try:
            self._send(b"X", b"")
            self.sock.close()
        except OSError:
            pass


class VerticaClient(PgClient):
    """Vertica native protocol: a derivative of the pg v3
    frontend/backend grammar (same message types — StartupMessage,
    Query/RowDescription/DataRow/CommandComplete — with protocol
    version 3.5), de-facto public through the Apache-2.0
    vertica-python driver which implements it. The simple-query
    subset this executor uses is wire-identical apart from the
    version word; Vertica's type OIDs for the scalar types the confs
    touch (int/varchar/float/date/timestamp/numeric/bool) align with
    the pg values this client already maps."""

    PROTOCOL_VERSION = (3 << 16) | 5  # 3.5

    @classmethod
    def from_jdbc_url(cls, jdbc_url: str, user: str, password: str,
                      **kw) -> "VerticaClient":
        rest = jdbc_url.split("://", 1)[1]
        hostport, _, db = rest.partition("/")
        host, _, port = hostport.partition(":")
        return cls(host, int(port or 5433), user, password,
                   db.split("?")[0] or "vertica", **kw)


__all__ = ["PgClient", "VerticaClient"]
