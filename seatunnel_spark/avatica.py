"""Apache Avatica protobuf client (stdlib) — the Phoenix Query Server
("thin driver") RPC protocol.

`jdbc:phoenix:thin:url=http://host:8765;serialization=PROTOBUF` URLs
speak Avatica: each RPC is an HTTP POST whose body is a protobuf
WireMessage {1: request class name, 2: wrapped request}; responses are
WireMessage-wrapped Responses$* messages. Message shapes follow the
public Apache Calcite Avatica proto files (core/src/main/protobuf/
requests.proto, responses.proto, common.proto):

  OpenConnectionRequest   {1: connection_id, 2: info map}
  CloseConnectionRequest  {1: connection_id}
  CreateStatementRequest  {1: connection_id}
  PrepareAndExecuteRequest{1: connection_id, 2: statement_id, 3: sql,
                           4: max_row_count}
  FetchRequest            {1: connection_id, 2: statement_id,
                           3: offset, 4: fetch_max_row_count}
  CloseStatementRequest   {1: connection_id, 2: statement_id}
  ExecuteResponse         {1: results(ResultSetResponse...)}
  ResultSetResponse       {1: connection_id, 2: statement_id,
                           4: signature, 5: first_frame,
                           6: update_count}
  Signature               {1: columns(ColumnMetaData...)}
  ColumnMetaData          {9: label, 10: column_name,
                           20: AvaticaType{1: java.sql.Types id,
                                           2: name}}
  Frame                   {1: offset, 2: done, 3: rows(Row...)}
  Row                     {1: value(ColumnValue...)}
  ColumnValue             {4: scalar_value TypedValue,
                           5: has_array_value}
  TypedValue              {1: rep, 2: bool, 3: string, 4: sint64,
                           5: bytes, 6: double, 7: null}
  ErrorResponse           {3: error_message, 6: error_code,
                           7: sql_state}

The reference always has the avatica client jar on the classpath
(connector-jdbc PhoenixDialect supplies only SQL); this module is the
stdlib executor behind phoenix-thin URLs, the same role tds_wire /
hive_thrift play for their families.
"""

from __future__ import annotations

import secrets

from seatunnel_spark import pb
from seatunnel_spark.net import apply_host_aliases

_REQ = "org.apache.calcite.avatica.proto.Requests${}"
_RSP = "org.apache.calcite.avatica.proto.Responses${}"

# TypedValue rep enum (common.proto Rep) — the subset we emit/read
REP_BOOLEAN = 8
REP_LONG = 13
REP_DOUBLE = 15
REP_BYTE_STRING = 20
REP_STRING = 21
REP_NULL = 24
REP_BIG_DECIMAL = 26

# java.sql.Types -> schema DSL
_SQL_TYPES = {-7: "boolean", 16: "boolean", -6: "tinyint",
              5: "smallint", 4: "int", -5: "bigint", 6: "float",
              7: "float", 8: "double", 2: "decimal(38,10)",
              3: "decimal(38,10)", 91: "date", 92: "string",
              93: "timestamp", -2: "binary", -3: "binary",
              -4: "binary", 2004: "binary"}


class AvaticaError(RuntimeError):
    pass


def wire_message(name: str, payload: bytes) -> bytes:
    return pb.fstr(1, name) + pb.fbytes(2, payload)


def parse_wire(data: bytes) -> tuple[str, bytes]:
    f = pb.decode(data)
    name = f.get(1, [b""])[0].decode()
    return name, f.get(2, [b""])[0]


def enc_typed_value(v) -> bytes:
    import datetime
    import decimal

    if v is None:
        return pb.fvar(1, REP_NULL) + pb.fvar(7, 1)
    if isinstance(v, bool):
        return pb.fvar(1, REP_BOOLEAN) + pb.fvar(2, 1 if v else 0)
    if isinstance(v, int):
        return pb.fvar(1, REP_LONG) + pb.fvar(4, pb_sint(v))
    if isinstance(v, float):
        return pb.fvar(1, REP_DOUBLE) + pb.f64(6, v)
    if isinstance(v, decimal.Decimal):
        return pb.fvar(1, REP_BIG_DECIMAL) + pb.fstr(3, str(v))
    if isinstance(v, (bytes, bytearray)):
        return pb.fvar(1, REP_BYTE_STRING) + pb.fbytes(5, bytes(v))
    if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
        return pb.fvar(1, REP_STRING) + pb.fstr(3, str(v))
    return pb.fvar(1, REP_STRING) + pb.fstr(3, str(v))


def pb_sint(v: int) -> int:
    """zigzag for sint64 fields."""
    return (v << 1) ^ (v >> 63)


def _unzig(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def dec_typed_value(raw: bytes):
    import decimal

    f = pb.decode(raw)
    rep = f.get(1, [0])[0]
    if f.get(7, [0])[0] or rep == REP_NULL:
        return None
    if rep in (0, REP_BOOLEAN):  # PRIMITIVE_BOOLEAN / BOOLEAN
        return bool(f.get(2, [0])[0])
    if rep == REP_BIG_DECIMAL:
        return decimal.Decimal(f[3][0].decode())
    if 3 in f:
        return f[3][0].decode()
    if 4 in f:
        return _unzig(f[4][0])
    if 6 in f:
        import struct

        return struct.unpack("<d", f[6][0].to_bytes(8, "little"))[0]
    if 5 in f:
        return bytes(f[5][0])
    return None


class AvaticaClient:
    def __init__(self, http_url: str, timeout: float = 30.0):
        self.url = apply_host_aliases(http_url)
        self.timeout = timeout
        self.connection_id = secrets.token_hex(16)
        self._next_stmt = 0
        self._rpc("OpenConnectionRequest",
                  pb.fstr(1, self.connection_id))

    @classmethod
    def from_jdbc_url(cls, url: str) -> "AvaticaClient":
        """jdbc:phoenix:thin:url=http://host:port;serialization=PROTOBUF"""
        rest = url.split("thin:", 1)[1]
        props = dict(kv.partition("=")[::2] for kv in rest.split(";"))
        http = props.get("url")
        if not http:
            # "url=" may swallow the = inside the value; re-parse
            for kv in rest.split(";"):
                if kv.startswith("url="):
                    http = kv[4:]
        ser = (props.get("serialization") or "PROTOBUF").upper()
        if ser != "PROTOBUF":
            raise AvaticaError(f"serialization {ser} not supported "
                               "(PROTOBUF only)")
        return cls(http)

    def _rpc(self, req_name: str, payload: bytes) -> tuple[str, bytes]:
        import urllib.request

        body = wire_message(_REQ.format(req_name), payload)
        req = urllib.request.Request(
            self.url, method="POST", data=body,
            headers={"Content-Type": "application/x-google-protobuf"})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:  # noqa: S310
            name, wrapped = parse_wire(resp.read())
        if name.endswith("ErrorResponse"):
            f = pb.decode(wrapped)
            msg = f.get(3, [b"avatica error"])[0].decode()
            raise AvaticaError(msg)
        return name, wrapped

    def _statement(self) -> int:
        _, wrapped = self._rpc("CreateStatementRequest",
                               pb.fstr(1, self.connection_id))
        f = pb.decode(wrapped)
        return f.get(2, [0])[0]

    def _decode_result(self, wrapped: bytes):
        f = pb.decode(wrapped)
        results = f.get(1, [])
        if not results:
            return [], [], [], -1
        rs = pb.decode(results[0])
        update_count = rs.get(6, [(1 << 64) - 1])[0]
        if update_count != (1 << 64) - 1:  # DML: max-uint64 = "a query"
            return [], [], [], update_count
        cols, types = [], []
        sig = pb.decode(rs.get(4, [b""])[0])
        for cm_raw in sig.get(1, []):
            cm = pb.decode(cm_raw)
            label = cm.get(9, cm.get(10, [b"?"]))[0].decode()
            t = pb.decode(cm.get(20, [b""])[0])
            cols.append(label)
            types.append(_SQL_TYPES.get(
                _signed32(t.get(1, [12])[0]), "string"))
        rows = []
        frame = rs.get(5, [None])[0]
        stmt_id = rs.get(2, [0])[0]
        done = True
        offset = 0
        while True:
            if frame:
                fr = pb.decode(frame)
                done = bool(fr.get(2, [1])[0])
                for row_raw in fr.get(3, []):
                    r = pb.decode(row_raw)
                    vals = []
                    for cv_raw in r.get(1, []):
                        cv = pb.decode(cv_raw)
                        sv = cv.get(4, [None])[0]
                        vals.append(dec_typed_value(sv)
                                    if sv is not None else None)
                    rows.append(tuple(vals))
                offset += len(fr.get(3, []))
            if done:
                break
            _, wrapped_f = self._rpc(
                "FetchRequest",
                pb.fstr(1, self.connection_id) + pb.fvar(2, stmt_id)
                + pb.fvar(3, offset) + pb.fvar(4, 10000))
            ff = pb.decode(wrapped_f)
            frame = ff.get(1, [None])[0]
            if frame is None:
                break
        return cols, types, rows, -1

    def query(self, sql: str) -> tuple[list[str], list[str], list[tuple]]:
        stmt = self._statement()
        try:
            _, wrapped = self._rpc(
                "PrepareAndExecuteRequest",
                pb.fstr(1, self.connection_id) + pb.fvar(2, stmt)
                + pb.fstr(3, sql) + pb.fvar(4, (1 << 64) - 1))
            cols, types, rows, _n = self._decode_result(wrapped)
            return cols, types, rows
        finally:
            self._close_stmt(stmt)

    def execute(self, sql: str) -> int:
        stmt = self._statement()
        try:
            _, wrapped = self._rpc(
                "PrepareAndExecuteRequest",
                pb.fstr(1, self.connection_id) + pb.fvar(2, stmt)
                + pb.fstr(3, sql) + pb.fvar(4, (1 << 64) - 1))
            _c, _t, _r, n = self._decode_result(wrapped)
            return max(0, n)
        finally:
            self._close_stmt(stmt)

    def _close_stmt(self, stmt: int) -> None:
        try:
            self._rpc("CloseStatementRequest",
                      pb.fstr(1, self.connection_id) + pb.fvar(2, stmt))
        except Exception:  # noqa: BLE001
            pass

    def close(self) -> None:
        try:
            self._rpc("CloseConnectionRequest",
                      pb.fstr(1, self.connection_id))
        except Exception:  # noqa: BLE001
            pass


def _signed32(v: int) -> int:
    return v - (1 << 32) if v >= (1 << 31) else v


__all__ = ["AvaticaClient", "AvaticaError", "wire_message", "parse_wire",
           "enc_typed_value", "dec_typed_value"]
