"""MySQL client/server wire protocol (stdlib sockets).

Implements the public MySQL protocol subset that the Doris and
StarRocks FEs speak on their query ports (both are MySQL-protocol
compatible — the reference connectors' docs point JDBC fallbacks at
port 9030): Initial Handshake v10, HandshakeResponse41 with
mysql_native_password (SHA1(pwd) XOR SHA1(salt + SHA1(SHA1(pwd)))),
COM_QUERY with protocol-41 text resultsets (lenenc-framed column
definitions, EOF packets, NULL = 0xfb), OK/ERR decoding.

Also serves as the stdlib fallback executor for mysql-family JDBC URLs
when no JVM driver jar is present.
"""

from __future__ import annotations

import hashlib
import socket
import struct

from seatunnel_spark.net import apply_host_aliases

# capability flags
CLIENT_LONG_PASSWORD = 0x1
CLIENT_PROTOCOL_41 = 0x200
CLIENT_CONNECT_WITH_DB = 0x8
CLIENT_SECURE_CONNECTION = 0x8000
CLIENT_PLUGIN_AUTH = 0x80000

# column type codes -> python decoder category
_T_INTS = {1, 2, 3, 8, 9, 13, 16}
_T_FLOATS = {4, 5}
_T_DECIMAL = {0, 246}
_T_DATE = {10}
_T_DATETIME = {7, 12}
_T_TIME = {11}

TYPE_NAMES = {1: "TINYINT", 2: "SMALLINT", 3: "INT", 4: "FLOAT",
              5: "DOUBLE", 7: "TIMESTAMP", 8: "BIGINT", 9: "INT",
              10: "DATE", 11: "TIME", 12: "DATETIME", 13: "SMALLINT",
              15: "VARCHAR", 16: "BIGINT", 0: "DECIMAL", 246: "DECIMAL",
              252: "TEXT", 253: "VARCHAR", 254: "CHAR"}


def lenenc(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < (1 << 16):
        return b"\xfc" + struct.pack("<H", n)
    if n < (1 << 24):
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def read_lenenc(data: bytes, i: int) -> tuple[int | None, int]:
    b = data[i]
    if b < 0xFB:
        return b, i + 1
    if b == 0xFB:
        return None, i + 1
    if b == 0xFC:
        return struct.unpack_from("<H", data, i + 1)[0], i + 3
    if b == 0xFD:
        return int.from_bytes(data[i + 1:i + 4], "little"), i + 4
    return struct.unpack_from("<Q", data, i + 1)[0], i + 9


def lenenc_str(s: bytes) -> bytes:
    return lenenc(len(s)) + s


def native_scramble(password: str, salt: bytes) -> bytes:
    if not password:
        return b""
    p1 = hashlib.sha1(password.encode()).digest()
    p2 = hashlib.sha1(p1).digest()
    mix = hashlib.sha1(salt + p2).digest()
    return bytes(a ^ b for a, b in zip(p1, mix))


def _decode_value(type_code: int, text: str):
    import datetime
    import decimal

    if type_code in _T_INTS:
        return int(text)
    if type_code in _T_FLOATS:
        return float(text)
    if type_code in _T_DECIMAL:
        return decimal.Decimal(text)
    if type_code in _T_DATE:
        return datetime.date.fromisoformat(text)
    if type_code in _T_DATETIME:
        return datetime.datetime.fromisoformat(text)
    return text


class MySqlClient:
    def __init__(self, host: str, port: int = 9030, user: str = "root",
                 password: str = "", database: str = "",
                 timeout: float = 30.0):
        url = apply_host_aliases(f"tcp://{host}:{port}")
        hostpart = url.split("://", 1)[-1]
        h, _, p = hostpart.rpartition(":")
        self.sock = socket.create_connection((h, int(p)), timeout=timeout)
        self._buf = b""
        self._seq = 0
        self._handshake(user, password, database)

    # -- packet framing ---------------------------------------------------
    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("mysql connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_packet(self) -> bytes:
        head = self._read_exact(4)
        ln = int.from_bytes(head[:3], "little")
        self._seq = (head[3] + 1) & 0xFF
        payload = self._read_exact(ln)
        if payload[:1] == b"\xff":
            code = struct.unpack_from("<H", payload, 1)[0]
            msg = payload[9:].decode(errors="replace") \
                if payload[3:4] == b"#" else payload[3:].decode(
                    errors="replace")
            raise RuntimeError(f"mysql error {code}: {msg}")
        return payload

    def _send_packet(self, payload: bytes, seq: int | None = None) -> None:
        if seq is not None:
            self._seq = seq
        self.sock.sendall(len(payload).to_bytes(3, "little")
                          + bytes([self._seq]) + payload)
        self._seq = (self._seq + 1) & 0xFF

    # -- handshake --------------------------------------------------------
    def _handshake(self, user: str, password: str, database: str) -> None:
        greet = self._read_packet()
        i = 1  # protocol version (10)
        end = greet.index(b"\0", i)
        i = end + 1  # server version
        i += 4  # thread id
        salt = greet[i:i + 8]
        i += 8 + 1  # auth data part 1 + filler
        i += 2 + 1 + 2 + 2  # caps low, charset, status, caps high
        auth_len = greet[i]
        i += 1 + 10  # auth data length + reserved
        if auth_len > 8:
            salt += greet[i:i + max(13, auth_len - 8)].rstrip(b"\0")[:12]
        caps = (CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41
                | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH)
        if database:
            caps |= CLIENT_CONNECT_WITH_DB
        auth = native_scramble(password, salt)
        resp = (struct.pack("<IIB", caps, 1 << 24, 33) + b"\0" * 23
                + user.encode() + b"\0" + bytes([len(auth)]) + auth)
        if database:
            resp += database.encode() + b"\0"
        resp += b"mysql_native_password\0"
        self._send_packet(resp, seq=1)
        reply = self._read_packet()
        if reply[:1] not in (b"\x00", b"\xfe"):
            raise RuntimeError("mysql: unexpected auth reply")

    # -- queries ----------------------------------------------------------
    def query(self, sql: str) -> tuple[list[str], list[int], list[tuple]]:
        """COM_QUERY -> (column_names, type_codes, decoded_rows)."""
        self._send_packet(b"\x03" + sql.encode(), seq=0)
        first = self._read_packet()
        if first[:1] == b"\x00":  # OK packet (no resultset)
            return [], [], []
        return self._read_resultset(first)

    def _read_resultset(self, first: bytes):
        ncols, _ = read_lenenc(first, 0)
        cols: list[str] = []
        types: list[int] = []
        for _ in range(ncols):
            defn = self._read_packet()
            i = 0
            vals = []
            for _f in range(6):  # catalog schema table org_t name org_n
                ln, i = read_lenenc(defn, i)
                vals.append(defn[i:i + (ln or 0)])
                i += ln or 0
            _, i = read_lenenc(defn, i)  # fixed-length marker (0x0c)
            i += 2 + 4  # charset + column length
            types.append(defn[i])
            cols.append(vals[4].decode())
        eof = self._read_packet()
        assert eof[:1] == b"\xfe"
        rows: list[tuple] = []
        while True:
            pkt = self._read_packet()
            if pkt[:1] == b"\xfe" and len(pkt) < 9:
                return cols, types, rows
            i = 0
            vals = []
            for c in range(ncols):
                ln, i = read_lenenc(pkt, i)
                if ln is None:
                    vals.append(None)
                else:
                    vals.append(_decode_value(
                        types[c], pkt[i:i + ln].decode()))
                    i += ln
            rows.append(tuple(vals))

    def execute(self, sql: str) -> int:
        """Statement without a resultset -> affected rows."""
        self._send_packet(b"\x03" + sql.encode(), seq=0)
        reply = self._read_packet()
        if reply[:1] == b"\x00":
            affected, _ = read_lenenc(reply, 1)
            return affected or 0
        # drain any resultset (e.g. SET returning rows on some FEs)
        self._read_resultset(reply)
        return 0

    def close(self) -> None:
        try:
            self._send_packet(b"\x01", seq=0)  # COM_QUIT
            self.sock.close()
        except OSError:
            pass


__all__ = ["MySqlClient", "native_scramble", "lenenc", "read_lenenc",
           "lenenc_str", "TYPE_NAMES"]
