"""SAP HANA SQL Command Network Protocol ("hdb") client — from scratch.

The protocol is public: SAP documents it in the "SAP HANA SQL Command
Network Protocol Reference" and ships two Apache-2.0 open-source
drivers that implement it independently (node-hdb, go-hdb) — the same
de-facto-public standing as the Vertica and Snowflake wires already in
this package. This module implements the subset the Jdbc source/sink
need to run the reference's sap_hana confs unmodified:

  * 14-byte initialization request / 8-byte version reply
  * little-endian framing: 32-byte message header, 24-byte segment
    header, 16-byte part headers, part buffers padded to 8 bytes
  * SCRAMSHA256 authentication (AUTHENTICATE + CONNECT round trips;
    proof = HMAC(sha256(key), salt||serverNonce||clientNonce) XOR key
    with key = sha256(HMAC(password, salt)))
  * EXECUTEDIRECT with a COMMAND part; RESULTSETMETADATA /
    RESULTSETID / RESULTSET decode; FETCHNEXT paging until the
    LAST_PACKET / RESULTSET_CLOSED part attributes
  * value codecs: null-indicator int family, all-FF-null IEEE
    real/double, DECIMAL as little-endian decimal128 (113-bit
    coefficient, exponent bias 6176), BOOLEAN 0/1/2 =
    false/null/true, length-prefixed strings (0xF6 int16 / 0xF7
    int32 extents, 0xFF null), DAYDATE / SECONDTIME / SECONDDATE /
    LONGDATE epoch-plus-one forms, inline LOB descriptors
    (32-byte header, DATA_INCLUDED|LAST_DATA chunks)

Reference parity: connector-jdbc's saphana dialect
(SapHanaDialect.java, SapHanaTypeMapper.java, SapHanaTypeConverter
.java) and the e2e surface JdbcHanaIT.java +
jdbc_sap_hana_source_and_sink.conf /
jdbc_sap_hana_test_view_and_synonym.conf — the reference drives the
proprietary JVM driver; this client speaks the documented wire
directly so those confs run without one.

Simplifications (documented, not silent): CESU-8 is handled as UTF-8
(identical for BMP text, which is all the e2e data uses); ALPHANUM and
SHORTTEXT are decoded with the plain string codec (both are
NVARCHAR-backed; ALPHANUM's leading-zero display annotation is
dropped); prepared statements are not used — the sink renders
literals, so EXECUTEDIRECT covers every statement shape.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import hmac as hmac_mod
import os
import socket
import struct

from seatunnel_spark.net import apply_host_aliases

# -- message types (request segment header byte 14) ------------------------
MSG_EXECUTEDIRECT = 2
MSG_PREPARE = 3
MSG_EXECUTE = 13
MSG_AUTHENTICATE = 65
MSG_CONNECT = 66
MSG_COMMIT = 67
MSG_ROLLBACK = 68
MSG_CLOSERESULTSET = 69
MSG_FETCHNEXT = 71
MSG_DISCONNECT = 77

# -- part kinds -------------------------------------------------------------
PK_COMMAND = 3
PK_RESULTSET = 5
PK_ERROR = 6
PK_STATEMENTID = 10
PK_TRANSACTIONID = 11
PK_ROWSAFFECTED = 12
PK_RESULTSETID = 13
PK_AUTHENTICATION = 33
PK_CLIENTID = 35
PK_STATEMENTCONTEXT = 39
PK_CONNECTOPTIONS = 42
PK_FETCHSIZE = 45
PK_PARAMETERMETADATA = 47
PK_RESULTSETMETADATA = 48
PK_TRANSACTIONFLAGS = 64

# -- part attributes ---------------------------------------------------------
ATTR_LAST_PACKET = 0x01
ATTR_NEXT_PACKET = 0x02
ATTR_FIRST_PACKET = 0x04
ATTR_ROW_NOT_FOUND = 0x08
ATTR_RESULTSET_CLOSED = 0x10

# -- segment kinds -----------------------------------------------------------
SEG_REQUEST = 1
SEG_REPLY = 2
SEG_ERROR = 5

# -- function codes (reply segment) ------------------------------------------
FC_DDL = 1
FC_INSERT = 2
FC_UPDATE = 3
FC_DELETE = 4
FC_SELECT = 5
FC_FETCH = 10

# -- type codes ---------------------------------------------------------------
T_TINYINT = 1
T_SMALLINT = 2
T_INT = 3
T_BIGINT = 4
T_DECIMAL = 5
T_REAL = 6
T_DOUBLE = 7
T_CHAR = 8
T_VARCHAR = 9
T_NCHAR = 10
T_NVARCHAR = 11
T_BINARY = 12
T_VARBINARY = 13
T_DATE = 14
T_TIME = 15
T_TIMESTAMP = 16
T_CLOB = 25
T_NCLOB = 26
T_BLOB = 27
T_BOOLEAN = 28
T_STRING = 29
T_NSTRING = 30
T_BSTRING = 33
T_TEXT = 51
T_SHORTTEXT = 52
T_BINTEXT = 53
T_ALPHANUM = 55
T_LONGDATE = 61
T_SECONDDATE = 62
T_DAYDATE = 63
T_SECONDTIME = 64

_STRING_TYPES = frozenset((T_CHAR, T_VARCHAR, T_NCHAR, T_NVARCHAR,
                           T_STRING, T_NSTRING, T_SHORTTEXT, T_ALPHANUM))
_BYTES_TYPES = frozenset((T_BINARY, T_VARBINARY, T_BSTRING))
_CLOB_TYPES = frozenset((T_CLOB, T_NCLOB, T_TEXT, T_BINTEXT))
_LOB_TYPES = _CLOB_TYPES | frozenset((T_BLOB,))

# connect-option keys (ConnectOption enum in the protocol doc)
CO_COMPLETE_ARRAY_EXECUTION = 2
CO_CLIENT_LOCALE = 3
CO_DATA_FORMAT_VERSION = 12
CO_DATA_FORMAT_VERSION2 = 23

PACKET_SIZE = 1 << 17

INIT_REQUEST = bytes([0xFF, 0xFF, 0xFF, 0xFF,  # filler
                      4, 20, 0,                # product version 4.20
                      4, 1, 0,                 # protocol version 4.1
                      0, 1, 1, 1])             # reserved/options


class HanaError(RuntimeError):
    def __init__(self, code: int, state: str, text: str):
        super().__init__(f"HANA error {code} [{state}]: {text}")
        self.code, self.state, self.text = code, state, text


# -- field lists (auth parts) -------------------------------------------------
def fields_encode(fields: list[bytes]) -> bytes:
    out = [struct.pack("<H", len(fields))]
    for f in fields:
        if len(f) <= 245:
            out.append(bytes([len(f)]))
        else:
            out.append(b"\xf6" + struct.pack("<H", len(f)))
        out.append(f)
    return b"".join(out)


def fields_decode(buf: bytes) -> list[bytes]:
    (n,) = struct.unpack_from("<H", buf, 0)
    i, out = 2, []
    for _ in range(n):
        ln = buf[i]
        i += 1
        if ln == 0xF6:
            (ln,) = struct.unpack_from("<H", buf, i)
            i += 2
        out.append(buf[i:i + ln])
        i += ln
    return out


# -- SCRAMSHA256 ---------------------------------------------------------------
def scram_client_proof(password: str, salt: bytes, server_nonce: bytes,
                       client_nonce: bytes) -> bytes:
    pw = password.encode()
    key = hashlib.sha256(
        hmac_mod.new(pw, salt, hashlib.sha256).digest()).digest()
    sig = hmac_mod.new(hashlib.sha256(key).digest(),
                       salt + server_nonce + client_nonce,
                       hashlib.sha256).digest()
    return bytes(a ^ b for a, b in zip(sig, key))


# -- decimal128 (LE; 113-bit coefficient, exponent bias 6176) -------------------
_DEC_BIAS = 6176

def enc_dec128(v: decimal.Decimal | None) -> bytes:
    if v is None:
        return b"\xff" * 16
    sign, digits, exp = v.as_tuple()
    coeff = int("".join(map(str, digits)) or "0")
    word = coeff | ((exp + _DEC_BIAS) << 113) | (sign << 127)
    return word.to_bytes(16, "little")


def dec_dec128(raw: bytes) -> decimal.Decimal | None:
    if (raw[15] & 0x70) == 0x70:  # NaN-pattern exponent = NULL
        return None
    word = int.from_bytes(raw, "little")
    sign = word >> 127
    exp = ((word >> 113) & 0x3FFF) - _DEC_BIAS
    coeff = word & ((1 << 113) - 1)
    return decimal.Decimal(coeff).scaleb(exp) * (-1 if sign else 1)


# -- date/time epoch forms ------------------------------------------------------
def enc_daydate(d: datetime.date | None) -> int:
    # wire value - 1 = days since 0001-01-01; ordinal(0001-01-01) == 1
    return 0 if d is None else d.toordinal()


def dec_daydate(v: int) -> datetime.date | None:
    return None if v == 0 else datetime.date.fromordinal(v)


def enc_secondtime(t: datetime.time | None) -> int:
    return 0 if t is None else t.hour * 3600 + t.minute * 60 + t.second + 1


def dec_secondtime(v: int) -> datetime.time | None:
    if v == 0:
        return None
    s = v - 1
    return datetime.time(s // 3600, (s // 60) % 60, s % 60)


def enc_seconddate(ts: datetime.datetime | None) -> int:
    if ts is None:
        return 0
    return ((ts.toordinal() - 1) * 86400 + ts.hour * 3600
            + ts.minute * 60 + ts.second + 1)


def dec_seconddate(v: int) -> datetime.datetime | None:
    if v == 0:
        return None
    days, s = divmod(v - 1, 86400)
    d = datetime.date.fromordinal(days + 1)
    return datetime.datetime(d.year, d.month, d.day,
                             s // 3600, (s // 60) % 60, s % 60)


def enc_longdate(ts: datetime.datetime | None) -> int:
    if ts is None:
        return 0
    secs = ((ts.toordinal() - 1) * 86400 + ts.hour * 3600
            + ts.minute * 60 + ts.second)
    return secs * 10_000_000 + ts.microsecond * 10 + 1


def dec_longdate(v: int) -> datetime.datetime | None:
    if v == 0:
        return None
    ticks = v - 1
    secs, frac = divmod(ticks, 10_000_000)
    days, s = divmod(secs, 86400)
    d = datetime.date.fromordinal(days + 1)
    return datetime.datetime(d.year, d.month, d.day, s // 3600,
                             (s // 60) % 60, s % 60, frac // 10)


# -- length-prefixed strings/bytes ----------------------------------------------
def enc_lenval(data: bytes | None) -> bytes:
    if data is None:
        return b"\xff"
    if len(data) <= 245:
        return bytes([len(data)]) + data
    if len(data) <= 0x7FFF:
        return b"\xf6" + struct.pack("<h", len(data)) + data
    return b"\xf7" + struct.pack("<i", len(data)) + data


def dec_lenval(buf: bytes, i: int) -> tuple[bytes | None, int]:
    ln = buf[i]
    i += 1
    if ln == 0xFF:
        return None, i
    if ln == 0xF6:
        (ln,) = struct.unpack_from("<h", buf, i)
        i += 2
    elif ln == 0xF7:
        (ln,) = struct.unpack_from("<i", buf, i)
        i += 4
    return buf[i:i + ln], i + ln


# -- LOB descriptors --------------------------------------------------------------
LOB_NULL = 0x01
LOB_DATA_INCLUDED = 0x02
LOB_LAST_DATA = 0x04


def enc_lob(data: bytes | None) -> bytes:
    if data is None:
        return bytes([0, LOB_NULL])
    head = struct.pack("<BBxxqqqi", 0, LOB_DATA_INCLUDED | LOB_LAST_DATA,
                       len(data), len(data), 0, len(data))
    return head + data


def dec_lob(buf: bytes, i: int) -> tuple[bytes | None, int]:
    options = buf[i + 1]
    if options & LOB_NULL:
        return None, i + 2
    _cl, _bl, _loc, chunk = struct.unpack_from("<qqqi", buf, i + 4)
    i += 32
    return buf[i:i + chunk], i + chunk


# -- row value codec (shared by client decode and the mini server encode) ---------
class HanaColumn:
    __slots__ = ("name", "dtype", "fraction", "length", "nullable")

    def __init__(self, name: str, dtype: int, fraction: int = 0,
                 length: int = 0, nullable: bool = True):
        self.name, self.dtype = name, dtype
        self.fraction, self.length = fraction, length
        self.nullable = nullable


def enc_value(c: HanaColumn, v) -> bytes:
    t = c.dtype
    if t == T_TINYINT:
        return b"\x00" if v is None else struct.pack("<BB", 1, int(v))
    if t == T_SMALLINT:
        return b"\x00" if v is None else struct.pack("<Bh", 1, int(v))
    if t == T_INT:
        return b"\x00" if v is None else struct.pack("<Bi", 1, int(v))
    if t == T_BIGINT:
        return b"\x00" if v is None else struct.pack("<Bq", 1, int(v))
    if t == T_REAL:
        return b"\xff" * 4 if v is None else struct.pack("<f", float(v))
    if t == T_DOUBLE:
        return b"\xff" * 8 if v is None else struct.pack("<d", float(v))
    if t == T_DECIMAL:
        return enc_dec128(None if v is None else decimal.Decimal(str(v)))
    if t == T_BOOLEAN:
        return bytes([1 if v is None else 2 if v else 0])
    if t in _STRING_TYPES:
        return enc_lenval(None if v is None else str(v).encode())
    if t in _BYTES_TYPES:
        return enc_lenval(None if v is None else bytes(v))
    if t == T_DAYDATE:
        return struct.pack("<i", enc_daydate(v))
    if t == T_SECONDTIME:
        return struct.pack("<i", enc_secondtime(v))
    if t == T_SECONDDATE:
        return struct.pack("<q", enc_seconddate(v))
    if t == T_LONGDATE:
        return struct.pack("<q", enc_longdate(v))
    if t in _CLOB_TYPES:
        return enc_lob(None if v is None else str(v).encode())
    if t == T_BLOB:
        return enc_lob(None if v is None else bytes(v))
    raise ValueError(f"unsupported HANA wire type {t}")


def dec_value(c: HanaColumn, buf: bytes, i: int):
    t = c.dtype
    if t in (T_TINYINT, T_SMALLINT, T_INT, T_BIGINT):
        if buf[i] == 0:
            return None, i + 1
        fmt, size = {T_TINYINT: ("<B", 1), T_SMALLINT: ("<h", 2),
                     T_INT: ("<i", 4), T_BIGINT: ("<q", 8)}[t]
        (v,) = struct.unpack_from(fmt, buf, i + 1)
        return v, i + 1 + size
    if t == T_REAL:
        raw = buf[i:i + 4]
        return (None if raw == b"\xff" * 4
                else struct.unpack("<f", raw)[0]), i + 4
    if t == T_DOUBLE:
        raw = buf[i:i + 8]
        return (None if raw == b"\xff" * 8
                else struct.unpack("<d", raw)[0]), i + 8
    if t == T_DECIMAL:
        return dec_dec128(buf[i:i + 16]), i + 16
    if t == T_BOOLEAN:
        b = buf[i]
        return (None if b == 1 else b == 2), i + 1
    if t in _STRING_TYPES:
        raw, i = dec_lenval(buf, i)
        return (None if raw is None else raw.decode()), i
    if t in _BYTES_TYPES:
        return dec_lenval(buf, i)
    if t == T_DAYDATE:
        (v,) = struct.unpack_from("<i", buf, i)
        return dec_daydate(v), i + 4
    if t == T_SECONDTIME:
        (v,) = struct.unpack_from("<i", buf, i)
        return dec_secondtime(v), i + 4
    if t == T_SECONDDATE:
        (v,) = struct.unpack_from("<q", buf, i)
        return dec_seconddate(v), i + 8
    if t == T_LONGDATE:
        (v,) = struct.unpack_from("<q", buf, i)
        return dec_longdate(v), i + 8
    if t in _CLOB_TYPES:
        raw, i = dec_lob(buf, i)
        return (None if raw is None else raw.decode()), i
    if t == T_BLOB:
        return dec_lob(buf, i)
    raise ValueError(f"unsupported HANA wire type {t}")


# -- metadata part -----------------------------------------------------------------
def enc_metadata(cols: list[HanaColumn]) -> bytes:
    names, offsets = bytearray(), {}

    def name_off(s: str | None) -> int:
        if s is None:
            return 0xFFFFFFFF
        if s not in offsets:
            offsets[s] = len(names)
            b = s.encode()
            names.append(len(b))
            names.extend(b)
        return offsets[s]

    fixed = bytearray()
    for c in cols:
        off = name_off(c.name)
        fixed += struct.pack("<BBhhxxIIII", 2 if c.nullable else 1,
                             c.dtype, c.fraction, c.length,
                             0xFFFFFFFF, 0xFFFFFFFF, off, off)
    return bytes(fixed) + bytes(names)


def dec_metadata(buf: bytes, argcount: int) -> list[HanaColumn]:
    base = 24 * argcount
    cols = []
    for k in range(argcount):
        opts, dtype, fraction, length, _t, _s, _cn, disp = \
            struct.unpack_from("<BBhhxxIIII", buf, 24 * k)
        if disp == 0xFFFFFFFF:
            name = f"_c{k}"
        else:
            ln = buf[base + disp]
            name = buf[base + disp + 1: base + disp + 1 + ln].decode()
        cols.append(HanaColumn(name, dtype, fraction, length,
                               nullable=bool(opts & 2)))
    return cols


# -- connect options -----------------------------------------------------------------
def options_encode(opts: list[tuple[int, int, object]]) -> bytes:
    out = bytearray()
    for key, tc, val in opts:
        out += struct.pack("<BB", key, tc)
        if tc == T_BOOLEAN:
            out.append(1 if val else 0)
        elif tc == T_INT:
            out += struct.pack("<i", int(val))
        elif tc == T_BIGINT:
            out += struct.pack("<q", int(val))
        else:  # string
            b = str(val).encode()
            out += struct.pack("<h", len(b)) + b
    return bytes(out)


def options_decode(buf: bytes, argcount: int) -> dict[int, object]:
    out, i = {}, 0
    for _ in range(argcount):
        key, tc = struct.unpack_from("<BB", buf, i)
        i += 2
        if tc == T_BOOLEAN:
            out[key] = bool(buf[i])
            i += 1
        elif tc == T_INT:
            (out[key],) = struct.unpack_from("<i", buf, i)
            i += 4
        elif tc == T_BIGINT:
            (out[key],) = struct.unpack_from("<q", buf, i)
            i += 8
        else:
            (ln,) = struct.unpack_from("<h", buf, i)
            i += 2
            out[key] = buf[i:i + ln].decode()
            i += ln
    return out


# -- framing ------------------------------------------------------------------------
class Part:
    __slots__ = ("kind", "attrs", "argcount", "buffer")

    def __init__(self, kind: int, attrs: int, argcount: int, buffer: bytes):
        self.kind, self.attrs = kind, attrs
        self.argcount, self.buffer = argcount, buffer


def build_message(session_id: int, packet_count: int, seg_kind: int,
                  type_or_fc: int, parts: list[Part],
                  commit: int = 1) -> bytes:
    body = bytearray()
    for p in parts:
        pad = (-len(p.buffer)) % 8
        body += struct.pack("<BBhiii", p.kind, p.attrs, p.argcount, 0,
                            len(p.buffer), PACKET_SIZE)
        body += p.buffer + b"\x00" * pad
    seg_len = 24 + len(body)
    if seg_kind == SEG_REQUEST:
        tail = struct.pack("<BBBB8x", seg_kind, type_or_fc, commit, 0)
    else:
        tail = struct.pack("<Bxh8x", seg_kind, type_or_fc)
    seg = struct.pack("<iihh", seg_len, 0, len(parts), 1) + tail + body
    head = struct.pack("<qiIIhBxI4x", session_id, packet_count, len(seg),
                       PACKET_SIZE - 32, 1, 0, 0)
    return head + seg


def parse_message(payload: bytes) -> tuple[int, int, list[Part]]:
    """Returns (segment_kind, message_type_or_function_code, parts)."""
    seg_len, _ofs, nparts, _segno = struct.unpack_from("<iihh", payload, 0)
    kind = payload[12]
    if kind == SEG_REQUEST:
        code = payload[13]
    else:
        (code,) = struct.unpack_from("<h", payload, 14)
    i, parts = 24, []
    for _ in range(nparts):
        pk, attrs, argc, _bigargc, buflen, _bufsz = \
            struct.unpack_from("<BBhiii", payload, i)
        i += 16
        parts.append(Part(pk, attrs, argc, payload[i:i + buflen]))
        i += buflen + ((-buflen) % 8)
    return kind, code, parts


# -- type-code -> schema DSL (what the Jdbc source builds its frame from) -------------
_DSL = {T_TINYINT: "smallint", T_SMALLINT: "smallint", T_INT: "int",
        T_BIGINT: "bigint", T_REAL: "float", T_DOUBLE: "double",
        T_BOOLEAN: "boolean", T_DAYDATE: "date", T_DATE: "date",
        T_SECONDTIME: "string", T_TIME: "string",
        T_LONGDATE: "timestamp", T_SECONDDATE: "timestamp",
        T_TIMESTAMP: "timestamp", T_BLOB: "binary"}


def _dsl(c: HanaColumn) -> str:
    if c.dtype == T_DECIMAL:
        if c.length > 0:
            return f"decimal({c.length},{max(c.fraction, 0)})"
        return "decimal(38,10)"
    if c.dtype in _BYTES_TYPES:
        return "binary"
    if c.dtype in _STRING_TYPES or c.dtype in _CLOB_TYPES:
        return "string"
    return _DSL.get(c.dtype, "string")


class HanaClient:
    """Minimal hdb-protocol client: SCRAMSHA256 auth + EXECUTEDIRECT
    with paged result-set fetch. API mirrors the other wire clients:
    execute(sql) -> rows affected, query(sql) -> (names, dsl, rows)."""

    def __init__(self, host: str, port: int = 39017, user: str = "",
                 password: str = "", database: str = "",
                 timeout: float = 30.0, fetch_size: int = 1024):
        url = apply_host_aliases(f"tcp://{host}:{port}")
        hostpart = url.split("://", 1)[-1]
        h, _, p = hostpart.rpartition(":")
        self.sock = socket.create_connection((h, int(p)), timeout=timeout)
        self._buf = b""
        self._session_id = -1
        self._packet_count = 0
        self.fetch_size = fetch_size
        self.sock.sendall(INIT_REQUEST)
        reply = self._read_exact(8)
        self.product_version = (reply[0], struct.unpack_from("<h", reply,
                                                             1)[0])
        self._authenticate(user, password)

    @classmethod
    def from_jdbc_url(cls, url: str, user: str, password: str
                      ) -> "HanaClient":
        # jdbc:sap://host:port[/?options] — HANA addresses the tenant
        # by port, not a database path segment
        rest = url.split("//", 1)[1]
        hostport = rest.split("/", 1)[0].split("?", 1)[0]
        host, _, port = hostport.partition(":")
        return cls(host, int(port or 39017), user, password)

    # -- transport -----------------------------------------------------------
    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("hana connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _request(self, msg_type: int, parts: list[Part],
                 commit: int = 1) -> tuple[int, list[Part]]:
        msg = build_message(self._session_id, self._packet_count,
                            SEG_REQUEST, msg_type, parts, commit)
        self._packet_count += 1
        self.sock.sendall(msg)
        head = self._read_exact(32)
        session_id, _pc, varlen = struct.unpack_from("<qiI", head, 0)
        if session_id > 0:
            self._session_id = session_id
        payload = self._read_exact(varlen)
        kind, fc, rparts = parse_message(payload)
        for p in rparts:
            if p.kind == PK_ERROR:
                code, _pos, tlen, _lvl = struct.unpack_from("<iiib",
                                                            p.buffer, 0)
                state = p.buffer[13:18].decode(errors="replace")
                text = p.buffer[18:18 + tlen].decode(errors="replace")
                raise HanaError(code, state, text)
        return fc, rparts

    # -- auth ------------------------------------------------------------------
    def _authenticate(self, user: str, password: str) -> None:
        client_nonce = os.urandom(64)
        init = fields_encode([user.encode(), b"SCRAMSHA256", client_nonce])
        _, parts = self._request(MSG_AUTHENTICATE,
                                 [Part(PK_AUTHENTICATION, 0, 1, init)],
                                 commit=0)
        auth = next(p for p in parts if p.kind == PK_AUTHENTICATION)
        method, payload = fields_decode(auth.buffer)
        if method != b"SCRAMSHA256":
            raise HanaError(10, "28000",
                            f"unexpected auth method {method!r}")
        salt, server_nonce = fields_decode(payload)
        proof = scram_client_proof(password, salt, server_nonce,
                                   client_nonce)
        # node-hdb clientProof framing: 0x00 count byte, 0x20 length,
        # 32 proof bytes
        proof_field = b"\x00" + bytes([len(proof)]) + proof
        conn = fields_encode([user.encode(), b"SCRAMSHA256", proof_field])
        opts = options_encode([
            (CO_COMPLETE_ARRAY_EXECUTION, T_BOOLEAN, True),
            (CO_CLIENT_LOCALE, T_STRING, "en_US"),
            (CO_DATA_FORMAT_VERSION2, T_INT, 8),
        ])
        self._request(MSG_CONNECT, [
            Part(PK_AUTHENTICATION, 0, 1, conn),
            Part(PK_CLIENTID, 0, 1,
                 f"{os.getpid()}@seatunnel-spark".encode()),
            Part(PK_CONNECTOPTIONS, 0, 3, opts),
        ], commit=0)

    # -- SQL ---------------------------------------------------------------------
    def execute(self, sql: str) -> int:
        fc, parts = self._request(
            MSG_EXECUTEDIRECT,
            [Part(PK_COMMAND, 0, 1, sql.encode())])
        for p in parts:
            if p.kind == PK_ROWSAFFECTED:
                return sum(
                    struct.unpack_from("<i", p.buffer, 4 * k)[0]
                    for k in range(p.argcount))
        return 0

    def query(self, sql: str) -> tuple[list[str], list[str], list[tuple]]:
        _, parts = self._request(
            MSG_EXECUTEDIRECT,
            [Part(PK_COMMAND, 0, 1, sql.encode())])
        cols: list[HanaColumn] | None = None
        rs_id = b""
        rows: list[tuple] = []
        done = False
        for p in parts:
            if p.kind == PK_RESULTSETMETADATA:
                cols = dec_metadata(p.buffer, p.argcount)
            elif p.kind == PK_RESULTSETID:
                rs_id = p.buffer
            elif p.kind == PK_RESULTSET:
                done = self._decode_rows(cols, p, rows)
        if cols is None:
            raise HanaError(259, "HY000", "statement returned no result set")
        while not done:
            _, parts = self._request(MSG_FETCHNEXT, [
                Part(PK_RESULTSETID, 0, 1, rs_id),
                Part(PK_FETCHSIZE, 0, 1,
                     struct.pack("<i", self.fetch_size)),
            ])
            got = False
            for p in parts:
                if p.kind == PK_RESULTSET:
                    got = True
                    done = self._decode_rows(cols, p, rows)
            if not got:
                break
        return ([c.name for c in cols], [_dsl(c) for c in cols], rows)

    @staticmethod
    def _decode_rows(cols, part: Part, rows: list[tuple]) -> bool:
        i = 0
        for _ in range(part.argcount):
            vals = []
            for c in cols:
                v, i = dec_value(c, part.buffer, i)
                vals.append(v)
            rows.append(tuple(vals))
        return bool(part.attrs & (ATTR_LAST_PACKET | ATTR_RESULTSET_CLOSED
                                  | ATTR_ROW_NOT_FOUND))

    def close(self) -> None:
        try:
            self._request(MSG_DISCONNECT, [], commit=0)
        except Exception:  # noqa: BLE001 - best-effort goodbye
            pass
        try:
            self.sock.close()
        except OSError:
            pass


__all__ = ["HanaClient", "HanaError", "HanaColumn", "enc_value",
           "dec_value", "enc_dec128", "dec_dec128", "enc_metadata",
           "dec_metadata", "fields_encode", "fields_decode",
           "scram_client_proof", "build_message", "parse_message",
           "options_encode", "options_decode", "enc_lenval",
           "dec_lenval", "enc_lob", "dec_lob"]
