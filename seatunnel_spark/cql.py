"""Cassandra CQL native protocol v4 (stdlib-only).

Written from the public spec (github.com/apache/cassandra/blob/trunk/
doc/native_protocol_v4.spec): frame = version(1) flags(1) stream(2)
opcode(1) length(4) body. Implemented opcodes: STARTUP/READY,
AUTHENTICATE + AUTH_RESPONSE (plain), QUERY/RESULT (rows with
metadata, paging). Typed value codecs for the types the connector
moves (int/bigint/text/boolean/double/float/timestamp/uuid-as-text).
"""

from __future__ import annotations

import datetime as _dt
import socket
import struct

OP_ERROR, OP_STARTUP, OP_READY, OP_AUTHENTICATE = 0x00, 0x01, 0x02, 0x03
OP_QUERY, OP_RESULT, OP_AUTH_RESPONSE, OP_AUTH_SUCCESS = 0x07, 0x08, 0x0F, 0x10

# CQL type ids (spec §6)
T_CUSTOM, T_ASCII, T_BIGINT, T_BLOB, T_BOOLEAN = 0x00, 0x01, 0x02, 0x03, 0x04
T_DOUBLE, T_FLOAT, T_INT, T_TIMESTAMP, T_VARCHAR = 0x07, 0x08, 0x09, 0x0B, 0x0D
T_SMALLINT, T_TINYINT = 0x13, 0x14

_EPOCH = _dt.datetime(1970, 1, 1)


def enc_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">H", len(b)) + b


def enc_longstring(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + b


def enc_string_map(d: dict) -> bytes:
    out = struct.pack(">H", len(d))
    for k, v in d.items():
        out += enc_string(k) + enc_string(v)
    return out


def enc_value(v, type_id: int) -> bytes:
    if v is None:
        return struct.pack(">i", -1)
    if type_id == T_INT:
        b = struct.pack(">i", int(v))
    elif type_id == T_BIGINT:
        b = struct.pack(">q", int(v))
    elif type_id == T_SMALLINT:
        b = struct.pack(">h", int(v))
    elif type_id == T_TINYINT:
        b = struct.pack(">b", int(v))
    elif type_id == T_DOUBLE:
        b = struct.pack(">d", float(v))
    elif type_id == T_FLOAT:
        b = struct.pack(">f", float(v))
    elif type_id == T_BOOLEAN:
        b = b"\x01" if v else b"\x00"
    elif type_id == T_TIMESTAMP:
        if isinstance(v, _dt.datetime):
            v = int((v - _EPOCH).total_seconds() * 1000)
        b = struct.pack(">q", int(v))
    elif type_id == T_BLOB:
        b = bytes(v)
    else:  # ascii/varchar/custom
        b = str(v).encode()
    return struct.pack(">i", len(b)) + b


def dec_value(b: bytes | None, type_id: int):
    if b is None:
        return None
    if type_id == T_INT:
        return struct.unpack(">i", b)[0]
    if type_id == T_BIGINT:
        return struct.unpack(">q", b)[0]
    if type_id == T_SMALLINT:
        return struct.unpack(">h", b)[0]
    if type_id == T_TINYINT:
        return struct.unpack(">b", b)[0]
    if type_id == T_DOUBLE:
        return struct.unpack(">d", b)[0]
    if type_id == T_FLOAT:
        return struct.unpack(">f", b)[0]
    if type_id == T_BOOLEAN:
        return b == b"\x01"
    if type_id == T_TIMESTAMP:
        (ms,) = struct.unpack(">q", b)
        return _EPOCH + _dt.timedelta(milliseconds=ms)
    if type_id == T_BLOB:
        return b
    return b.decode()


class CqlConnection:
    def __init__(self, host: str, port: int = 9042,
                 username: str | None = None, password: str | None = None,
                 timeout: float = 30.0):
        from seatunnel_spark.net import apply_host_aliases

        resolved = apply_host_aliases(f"tcp://{host}:{port}")
        hostpart = resolved.split("://", 1)[1]
        host, _, port_s = hostpart.rpartition(":")
        self.sock = socket.create_connection((host, int(port_s)),
                                             timeout=timeout)
        self._buf = b""
        self._stream = 0
        op, body = self.request(OP_STARTUP,
                                enc_string_map({"CQL_VERSION": "3.0.0"}))
        if op == OP_AUTHENTICATE:
            token = (b"\x00" + (username or "").encode()
                     + b"\x00" + (password or "").encode())
            op, body = self.request(
                OP_AUTH_RESPONSE, struct.pack(">i", len(token)) + token)
            if op != OP_AUTH_SUCCESS:
                raise ConnectionError("cql auth failed")
        elif op != OP_READY:
            raise ConnectionError(f"cql startup failed: opcode {op}")

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("cql connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def request(self, opcode: int, body: bytes) -> tuple[int, bytes]:
        self._stream = (self._stream + 1) % 32000
        self.sock.sendall(struct.pack(">BBhBI", 0x04, 0, self._stream,
                                      opcode, len(body)) + body)
        while True:
            ver, _flags, stream, op, length = struct.unpack(
                ">BBhBI", self._read_exact(9))
            payload = self._read_exact(length)
            if stream == self._stream:
                if op == OP_ERROR:
                    (code,) = struct.unpack_from(">i", payload)
                    (mlen,) = struct.unpack_from(">H", payload, 4)
                    msg = payload[6:6 + mlen].decode()
                    raise RuntimeError(f"cql error {code}: {msg}")
                return op, payload

    def query(self, cql: str, consistency: int = 0x0001
              ) -> tuple[list[tuple[str, int]], list[list]]:
        """Execute; returns ([(col, type_id)], rows) — empty for
        non-SELECT."""
        body = (enc_longstring(cql) + struct.pack(">H", consistency)
                + b"\x00")  # no flags
        op, payload = self.request(OP_QUERY, body)
        assert op == OP_RESULT
        (kind,) = struct.unpack_from(">i", payload)
        if kind != 0x0002:  # not Rows
            return [], []
        i = 4
        (mflags, col_count) = struct.unpack_from(">ii", payload, i)
        i += 8
        global_tables = bool(mflags & 1)
        if global_tables:
            for _ in range(2):  # keyspace + table
                (ln,) = struct.unpack_from(">H", payload, i)
                i += 2 + ln
        cols = []
        for _ in range(col_count):
            if not global_tables:
                for _ in range(2):
                    (ln,) = struct.unpack_from(">H", payload, i)
                    i += 2 + ln
            (ln,) = struct.unpack_from(">H", payload, i)
            name = payload[i + 2:i + 2 + ln].decode()
            i += 2 + ln
            (tid,) = struct.unpack_from(">H", payload, i)
            i += 2
            if tid == T_CUSTOM:
                (ln,) = struct.unpack_from(">H", payload, i)
                i += 2 + ln
            cols.append((name, tid))
        (row_count,) = struct.unpack_from(">i", payload, i)
        i += 4
        rows = []
        for _ in range(row_count):
            row = []
            for _name, tid in cols:
                (ln,) = struct.unpack_from(">i", payload, i)
                i += 4
                if ln < 0:
                    row.append(None)
                else:
                    row.append(dec_value(payload[i:i + ln], tid))
                    i += ln
            rows.append(row)
        return cols, rows

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass


__all__ = ["CqlConnection", "enc_value", "dec_value", "enc_string",
           "enc_longstring", "enc_string_map",
           "T_INT", "T_BIGINT", "T_VARCHAR", "T_BOOLEAN", "T_DOUBLE",
           "T_FLOAT", "T_TIMESTAMP", "T_SMALLINT", "T_TINYINT", "T_BLOB"]
