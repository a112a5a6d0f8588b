"""HiveServer2 thrift client (stdlib) — TCLIService over SASL-PLAIN.

The public Apache Hive TCLIService.thrift IDL expressed as field-id
tables over seatunnel_spark.thrift_codec (no generated code):
OpenSession / ExecuteStatement / GetResultSetMetadata / FetchResults /
CloseOperation / CloseSession, columnar TRowSet decode (protocol V6+
TColumn union with nulls bitmask). Transport is Hive's TSaslTransport
framing (status byte + i32 length negotiation messages: START/OK/
COMPLETE, then 4-byte-length data frames) with the PLAIN mechanism —
the hive-jdbc default for `jdbc:hive2://` URLs; `auth=noSasl` URLs use
raw unframed thrift.

Reference parity: connector-jdbc's HiveDialect only supplies SQL
quoting — the wire lives in the hive-jdbc driver; this module is the
stdlib executor behind jdbc:hive2 URLs (same role as tds_wire for
sqlserver)."""

from __future__ import annotations

import socket
import struct

from seatunnel_spark import thrift_codec as T
from seatunnel_spark.net import apply_host_aliases

# TCLIService TProtocolVersion: V10 = 9 (columnar results since V6)
PROTOCOL_V10 = 9

# TTypeId
_TYPE_NAMES = {0: "boolean", 1: "tinyint", 2: "smallint", 3: "int",
               4: "bigint", 5: "float", 6: "double", 7: "string",
               8: "timestamp", 9: "binary", 15: "decimal", 16: "null",
               17: "date", 18: "varchar", 19: "char"}

# TColumn union slot -> value coercion happens via the metadata type
_SASL_START = 0x01
_SASL_OK = 0x02
_SASL_BAD = 0x03
_SASL_ERROR = 0x04
_SASL_COMPLETE = 0x05


class HiveThriftError(RuntimeError):
    pass


class HiveThriftClient:
    def __init__(self, host: str, port: int = 10000, user: str = "anonymous",
                 password: str = "", database: str = "default",
                 sasl: bool = True, timeout: float = 30.0):
        url = apply_host_aliases(f"tcp://{host}:{port}")
        hostpart = url.split("://", 1)[-1]
        h, _, p = hostpart.rpartition(":")
        self.sock = socket.create_connection((h, int(p)), timeout=timeout)
        self._buf = b""
        self._seq = 0
        self.sasl = sasl
        if sasl:
            self._sasl_handshake(user, password)
        self._session = self._open_session(user, password, database)

    @classmethod
    def from_jdbc_url(cls, url: str, user: str, password: str
                      ) -> "HiveThriftClient":
        """jdbc:hive2://host[:port][/db][;prop=v...] (HiveConnection's
        URL shape; auth=noSasl selects the unframed transport)."""
        rest = url.split("//", 1)[1]
        path, _, props = rest.partition(";")
        hostport, _, db = path.partition("/")
        host, _, port = hostport.partition(":")
        sasl = True
        for kv in props.split(";"):
            k, _, v = kv.partition("=")
            if k.strip().lower() == "auth" and v.strip().lower() == "nosasl":
                sasl = False
        return cls(host, int(port or 10000), user or "anonymous", password,
                   db.split("?")[0] or "default", sasl=sasl)

    # -- transport ---------------------------------------------------------
    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("hive thrift connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _sasl_send(self, status: int, payload: bytes) -> None:
        self.sock.sendall(bytes([status]) + struct.pack(">i", len(payload))
                          + payload)

    def _sasl_recv(self) -> tuple[int, bytes]:
        head = self._read_exact(5)
        status = head[0]
        (n,) = struct.unpack_from(">i", head, 1)
        return status, self._read_exact(n)

    def _sasl_handshake(self, user: str, password: str) -> None:
        self._sasl_send(_SASL_START, b"PLAIN")
        # PLAIN initial response: authzid NUL authcid NUL passwd —
        # the client is complete after it (TSaslClientTransport)
        resp = b"\x00" + user.encode() + b"\x00" + password.encode()
        self._sasl_send(_SASL_COMPLETE, resp)
        status, payload = self._sasl_recv()
        if status not in (_SASL_OK, _SASL_COMPLETE):
            raise HiveThriftError(
                f"SASL rejected: {payload.decode(errors='replace')}")

    def _send_frame(self, payload: bytes) -> None:
        if self.sasl:
            self.sock.sendall(struct.pack(">i", len(payload)) + payload)
        else:
            self.sock.sendall(payload)

    def _recv_frame(self) -> bytes:
        if self.sasl:
            (n,) = struct.unpack(">i", self._read_exact(4))
            return self._read_exact(n)
        # unframed: decode needs the whole message; read until a full
        # thrift message parses (responses here are single packets in
        # practice — the mini server writes them atomically)
        chunk = self.sock.recv(1 << 20)
        if not chunk:
            raise ConnectionError("hive thrift connection closed")
        return chunk

    def _call(self, name: str, args: dict) -> dict:
        self._seq += 1
        # service args struct wraps the request: Name_args {1: req}
        self._send_frame(T.encode_message(name, T.CALL, self._seq,
                                          {1: (T.STRUCT, args)}))
        rname, mtype, _seq, fields = T.decode_message(self._recv_frame())
        if mtype == T.EXCEPTION:
            raise HiveThriftError(
                f"{name}: {T.text(T.sget(fields, 1), 'thrift exception')}")
        resp = T.sget(fields, 0)  # success struct, field id 0
        if resp is None:
            raise HiveThriftError(f"{name}: empty response")
        status = T.sget(resp, 1)
        code = T.sget(status, 1, 0)
        if code not in (0, 1):  # SUCCESS, SUCCESS_WITH_INFO
            raise HiveThriftError(
                f"{name}: {T.text(T.sget(status, 4), 'error')}")
        return resp

    # -- TCLIService -------------------------------------------------------
    def _open_session(self, user: str, password: str, database: str):
        resp = self._call("OpenSession", {
            1: (T.I32, PROTOCOL_V10),
            2: (T.STRING, user),
            3: (T.STRING, password),
            4: (T.MAP, (T.STRING, T.STRING,
                        {"use:database": database})),
        })
        handle = T.sget(resp, 3)
        if handle is None:
            raise HiveThriftError("OpenSession: no session handle")
        return handle

    def _exec(self, sql: str):
        resp = self._call("ExecuteStatement", {
            1: (T.STRUCT, self._session),
            2: (T.STRING, sql),
            4: (T.BOOL, False),  # runAsync
        })
        return T.sget(resp, 2)  # operation handle

    def query(self, sql: str) -> tuple[list[str], list[str], list[tuple]]:
        """-> (column_names, hive_type_names, typed_rows)."""
        op = self._exec(sql)
        meta = self._call("GetResultSetMetadata",
                          {1: (T.STRUCT, op)})
        schema = T.sget(meta, 2)
        cols: list[str] = []
        types: list[str] = []
        for cdesc in (T.sget(schema, 1) or (T.STRUCT, []))[1]:
            cols.append(T.text(T.sget(cdesc, 1)))
            tdesc = T.sget(cdesc, 2)
            entries = (T.sget(tdesc, 1) or (T.STRUCT, []))[1]
            prim = T.sget(entries[0], 1) if entries else None
            types.append(_TYPE_NAMES.get(T.sget(prim, 1, 7), "string"))
        rows: list[tuple] = []
        while True:
            fr = self._call("FetchResults", {
                1: (T.STRUCT, op),
                2: (T.I32, 0),      # FETCH_NEXT
                3: (T.I64, 10000),
            })
            rowset = T.sget(fr, 3)
            batch = self._decode_rowset(rowset, types)
            rows.extend(batch)
            if not T.sget(fr, 2, False) or not batch:
                break
        self._call("CloseOperation", {1: (T.STRUCT, op)})
        return cols, types, rows

    def execute(self, sql: str) -> int:
        op = self._exec(sql)
        self._call("CloseOperation", {1: (T.STRUCT, op)})
        return 0

    def _decode_rowset(self, rowset, types: list[str]) -> list[tuple]:
        if rowset is None:
            return []
        columns = T.sget(rowset, 3)  # list<TColumn>
        if not columns or not columns[1]:
            return []
        cols_out = []
        for tcol, tname in zip(columns[1], types):
            # TColumn union: exactly one slot set; every T*Column is
            # {1: values list, 2: nulls bitmask}
            (slot, (_t, inner)) = next(iter(
                (fid, v) for fid, v in tcol.items()))
            values = T.sget(inner, 1)[1]
            nulls = T.sget(inner, 2, b"")
            out = []
            for i, v in enumerate(values):
                if i // 8 < len(nulls) and (nulls[i // 8] >> (i % 8)) & 1:
                    out.append(None)
                else:
                    out.append(self._coerce(v, slot, tname))
            cols_out.append(out)
        return [tuple(r) for r in zip(*cols_out)]

    @staticmethod
    def _coerce(v, slot: int, tname: str):
        import datetime
        import decimal

        if slot == 7 or isinstance(v, (bytes, bytearray)):  # stringVal
            if tname == "binary":
                return bytes(v)
            s = v.decode("utf-8") if isinstance(v, (bytes, bytearray)) \
                else str(v)
            if tname == "decimal":
                return decimal.Decimal(s)
            if tname == "date":
                return datetime.date.fromisoformat(s)
            if tname == "timestamp":
                return datetime.datetime.fromisoformat(s)
            return s
        if tname == "float":
            return float(v)
        return v

    def close(self) -> None:
        try:
            self._call("CloseSession", {1: (T.STRUCT, self._session)})
        except Exception:  # noqa: BLE001
            pass
        try:
            self.sock.close()
        except OSError:
            pass


__all__ = ["HiveThriftClient", "HiveThriftError", "PROTOCOL_V10"]
