"""SQL Server TDS 7.4 client (stdlib sockets) — [MS-TDS] subset.

Implements the public Tabular Data Stream protocol pieces a JDBC-style
executor needs: PRELOGIN negotiation (plaintext, ENCRYPT_NOT_SUP —
the `encrypt=false` JDBC mode the reference confs declare), LOGIN7
with the spec's password obfuscation (nibble swap XOR 0xA5), SQLBatch
with ALL_HEADERS (transaction-descriptor header, TDS 7.2+), and the
tabular response token stream: COLMETADATA/ROW/NBCROW decode over the
fixed- and variable-length type families (INTN, BITN, DECIMALN, FLTN,
MONEYN, DATETIMN, DATEN, TIMEN, DATETIME2N, DATETIMEOFFSETN,
BIGVARCHAR/NVARCHAR incl. PLP varchar(max) chunking, BIGVARBINARY,
GUID), plus ERROR/INFO/ENVCHANGE/LOGINACK/DONE handling.

This is the sandbox/production stdlib executor behind
`jdbc:sqlserver://` URLs (the reference always has mssql-jdbc on the
classpath — connector-jdbc/.../SqlServerDialect.java supplies only
dialect SQL; the wire protocol lives in the driver). Character data
uses UTF-8 (a legal SQL Server 2019+ collation choice,
*_UTF8; NVARCHAR stays UCS-2 per spec).
"""

from __future__ import annotations

import datetime
import decimal
import struct
import uuid

from seatunnel_spark.net import apply_host_aliases

# packet types
PKT_SQLBATCH = 0x01
PKT_RPC = 0x03
PKT_REPLY = 0x04
PKT_LOGIN7 = 0x10
PKT_PRELOGIN = 0x12

# tokens
TOK_ALTMETADATA = 0x88
TOK_COLMETADATA = 0x81
TOK_ORDER = 0xA9
TOK_ERROR = 0xAA
TOK_INFO = 0xAB
TOK_LOGINACK = 0xAD
TOK_ROW = 0xD1
TOK_NBCROW = 0xD2
TOK_ENVCHANGE = 0xE3
TOK_FEATUREEXTACK = 0xAE
TOK_RETURNSTATUS = 0x79
TOK_RETURNVALUE = 0xAC
TOK_DONE = 0xFD
TOK_DONEPROC = 0xFE
TOK_DONEINPROC = 0xFF

DONE_MORE = 0x0001
DONE_COUNT = 0x0010

# type tokens ([MS-TDS] 2.2.5.4)
T_NULL = 0x1F
T_INT1 = 0x30
T_BIT = 0x32
T_INT2 = 0x34
T_INT4 = 0x38
T_DATETIM4 = 0x3A
T_FLT4 = 0x3B
T_MONEY = 0x3C
T_DATETIME = 0x3D
T_FLT8 = 0x3E
T_MONEY4 = 0x7A
T_INT8 = 0x7F
T_GUID = 0x24
T_INTN = 0x26
T_DECIMAL = 0x37
T_NUMERIC = 0x3F
T_BITN = 0x68
T_DECIMALN = 0x6A
T_NUMERICN = 0x6C
T_FLTN = 0x6D
T_MONEYN = 0x6E
T_DATETIMN = 0x6F
T_DATEN = 0x28
T_TIMEN = 0x29
T_DATETIME2N = 0x2A
T_DATETIMEOFFSETN = 0x2B
T_BIGVARBINARY = 0xA5
T_BIGVARCHAR = 0xA7
T_BIGBINARY = 0xAD
T_BIGCHAR = 0xAF
T_NVARCHAR = 0xE7
T_NCHAR = 0xEF
T_XML = 0xF1
T_TEXT = 0x23
T_IMAGE = 0x22
T_NTEXT = 0x63

_FIXED_LEN = {T_INT1: 1, T_BIT: 1, T_INT2: 2, T_INT4: 4, T_DATETIM4: 4,
              T_FLT4: 4, T_MONEY: 8, T_DATETIME: 8, T_FLT8: 8,
              T_MONEY4: 4, T_INT8: 8, T_NULL: 0}

# USHORT-maxlen char/binary family (collation present for char types)
_USHORT_CHAR = {T_BIGVARCHAR, T_BIGCHAR}
_USHORT_NCHAR = {T_NVARCHAR, T_NCHAR}
_USHORT_BIN = {T_BIGVARBINARY, T_BIGBINARY}
# byte-len-prefixed variable family
_BYTELEN = {T_GUID, T_INTN, T_BITN, T_DECIMALN, T_NUMERICN, T_FLTN,
            T_MONEYN, T_DATETIMN, T_DATEN, T_TIMEN, T_DATETIME2N,
            T_DATETIMEOFFSETN}

PLP_NULL = 0xFFFFFFFFFFFFFFFF
PLP_UNKNOWN = 0xFFFFFFFFFFFFFFFE

_EPOCH_1900 = datetime.date(1900, 1, 1)
_EPOCH_0001 = datetime.date(1, 1, 1)

TYPE_NAMES = {
    T_INT1: "tinyint", T_BIT: "bit", T_INT2: "smallint", T_INT4: "int",
    T_INT8: "bigint", T_FLT4: "real", T_FLT8: "float", T_MONEY: "money",
    T_MONEY4: "smallmoney", T_DATETIME: "datetime",
    T_DATETIM4: "smalldatetime", T_GUID: "uniqueidentifier",
    T_DECIMALN: "decimal", T_NUMERICN: "numeric", T_DATEN: "date",
    T_TIMEN: "time", T_DATETIME2N: "datetime2",
    T_DATETIMEOFFSETN: "datetimeoffset", T_BIGVARCHAR: "varchar",
    T_BIGCHAR: "char", T_NVARCHAR: "nvarchar", T_NCHAR: "nchar",
    T_BIGVARBINARY: "varbinary", T_BIGBINARY: "binary",
}


def obfuscate_password(pw: str) -> bytes:
    """LOGIN7 password encoding ([MS-TDS] 2.2.6.4): each UCS-2 byte has
    its nibbles swapped then is XORed with 0xA5."""
    raw = pw.encode("utf-16-le")
    return bytes((((b >> 4) | ((b << 4) & 0xF0)) ^ 0xA5) for b in raw)


def deobfuscate_password(raw: bytes) -> str:
    b = bytes(((x ^ 0xA5) for x in raw))
    b = bytes((((x >> 4) | ((x << 4) & 0xF0)) for x in b))
    return b.decode("utf-16-le")


# -- scalar codecs shared by client decode and the mini server encode --

def _days_1900(d: datetime.date) -> int:
    return (d - _EPOCH_1900).days


def encode_datetime(dt: datetime.datetime) -> bytes:
    days = _days_1900(dt.date())
    secs = (dt - datetime.datetime.combine(dt.date(), datetime.time())) \
        .total_seconds()
    return struct.pack("<iI", days, int(round(secs * 300)))


def decode_datetime(b: bytes) -> datetime.datetime:
    days, t300 = struct.unpack("<iI", b)
    return (datetime.datetime.combine(_EPOCH_1900 + datetime.timedelta(days),
                                      datetime.time())
            + datetime.timedelta(seconds=t300 / 300.0))


def encode_smalldatetime(dt: datetime.datetime) -> bytes:
    days = _days_1900(dt.date())
    mins = dt.hour * 60 + dt.minute
    return struct.pack("<HH", days, mins)


def decode_smalldatetime(b: bytes) -> datetime.datetime:
    days, mins = struct.unpack("<HH", b)
    return (datetime.datetime.combine(_EPOCH_1900 + datetime.timedelta(days),
                                      datetime.time())
            + datetime.timedelta(minutes=mins))


def _time_len(scale: int) -> int:
    return 3 if scale <= 2 else 4 if scale <= 4 else 5


def encode_time(t: datetime.time, scale: int) -> bytes:
    units = ((t.hour * 3600 + t.minute * 60 + t.second) * 10 ** scale
             + t.microsecond * 10 ** scale // 1_000_000)
    return units.to_bytes(_time_len(scale), "little")


def decode_time(b: bytes, scale: int) -> datetime.time:
    units = int.from_bytes(b, "little")
    total_us = units * 1_000_000 // 10 ** scale
    s, us = divmod(total_us, 1_000_000)
    h, rem = divmod(s, 3600)
    m, s = divmod(rem, 60)
    return datetime.time(h, m, s, us)


def encode_date3(d: datetime.date) -> bytes:
    return ((d - _EPOCH_0001).days).to_bytes(3, "little")


def decode_date3(b: bytes) -> datetime.date:
    return _EPOCH_0001 + datetime.timedelta(int.from_bytes(b, "little"))


def encode_money(v) -> bytes:
    n = int(decimal.Decimal(str(v)) * 10000)
    return struct.pack("<iI", (n >> 32), n & 0xFFFFFFFF)


def decode_money(b: bytes) -> decimal.Decimal:
    hi, lo = struct.unpack("<iI", b)
    return decimal.Decimal((hi << 32) | lo) / 10000


def encode_decimal(v, scale: int) -> bytes:
    """sign byte (1 = positive) + LE magnitude, width chosen by size."""
    d = decimal.Decimal(str(v)).scaleb(scale).to_integral_value()
    n = int(d)
    sign = 1 if n >= 0 else 0
    mag = abs(n)
    for width in (4, 8, 12, 16):
        if mag < (1 << (width * 8)):
            return bytes([sign]) + mag.to_bytes(width, "little")
    raise ValueError("decimal magnitude too large")


def decode_decimal(b: bytes, scale: int) -> decimal.Decimal:
    sign = 1 if b[0] else -1
    mag = int.from_bytes(b[1:], "little")
    return decimal.Decimal(sign * mag).scaleb(-scale)


class ColMeta:
    __slots__ = ("name", "type_token", "maxlen", "precision", "scale")

    def __init__(self, name, type_token, maxlen=0, precision=0, scale=0):
        self.name = name
        self.type_token = type_token
        self.maxlen = maxlen
        self.precision = precision
        self.scale = scale

    @property
    def type_name(self) -> str:
        t, n = self.type_token, self.maxlen
        if t == T_INTN:
            return {1: "tinyint", 2: "smallint", 4: "int",
                    8: "bigint"}.get(n, "int")
        if t == T_FLTN:
            return "real" if n == 4 else "float"
        if t == T_MONEYN:
            return "smallmoney" if n == 4 else "money"
        if t == T_DATETIMN:
            return "smalldatetime" if n == 4 else "datetime"
        if t == T_BITN:
            return "bit"
        return TYPE_NAMES.get(t, f"type_{t:#x}")


class TdsError(RuntimeError):
    def __init__(self, number: int, state: int, severity: int, msg: str):
        super().__init__(f"mssql error {number} (severity {severity}): {msg}")
        self.number = number
        self.state = state
        self.severity = severity


class TdsClient:
    """Minimal SQL Server session: query()/execute() over SQLBatch."""

    def __init__(self, host: str, port: int = 1433, user: str = "sa",
                 password: str = "", database: str = "",
                 timeout: float = 30.0, appname: str = "seatunnel-spark"):
        import socket

        url = apply_host_aliases(f"tcp://{host}:{port}")
        hostpart = url.split("://", 1)[-1]
        h, _, p = hostpart.rpartition(":")
        self.sock = socket.create_connection((h, int(p)), timeout=timeout)
        self._buf = b""
        self._pktsize = 4096
        self._prelogin()
        self._login(user, password, database, appname)

    @classmethod
    def from_jdbc_url(cls, url: str, user: str, password: str,
                      database: str = "") -> "TdsClient":
        """jdbc:sqlserver://host[:port][;databaseName=db;prop=v...]"""
        rest = url.split("//", 1)[1]
        hostport, _, props = rest.partition(";")
        host, _, port = hostport.partition(":")
        db = database
        for kv in props.split(";"):
            k, _, v = kv.partition("=")
            if k.strip().lower() in ("databasename", "database") and v:
                db = v.strip()
        return cls(host, int(port or 1433), user, password, db)

    # -- packet framing ----------------------------------------------------
    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("tds connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _send_message(self, ptype: int, payload: bytes) -> None:
        maxdata = self._pktsize - 8
        chunks = [payload[i:i + maxdata]
                  for i in range(0, len(payload), maxdata)] or [b""]
        for idx, chunk in enumerate(chunks):
            status = 0x01 if idx == len(chunks) - 1 else 0x00  # EOM
            head = struct.pack(">BBHHBB", ptype, status, len(chunk) + 8,
                               0, (idx + 1) & 0xFF, 0)
            self.sock.sendall(head + chunk)

    def _recv_message(self) -> tuple[int, bytes]:
        parts = []
        while True:
            head = self._read_exact(8)
            ptype, status, length = struct.unpack(">BBH", head[:4])
            parts.append(self._read_exact(length - 8))
            if status & 0x01:
                return ptype, b"".join(parts)

    # -- handshake ---------------------------------------------------------
    def _prelogin(self) -> None:
        # VERSION + ENCRYPTION=2 (ENCRYPT_NOT_SUP: plaintext session)
        opts = [(0x00, struct.pack(">HHH", 12, 0, 0)),  # version 12.0.0.0
                (0x01, b"\x02")]
        head_len = len(opts) * 5 + 1
        off = head_len
        head, data = b"", b""
        for token, payload in opts:
            head += struct.pack(">BHH", token, off, len(payload))
            data += payload
            off += len(payload)
        self._send_message(PKT_PRELOGIN, head + b"\xff" + data)
        _, resp = self._recv_message()
        i = 0
        while i < len(resp) and resp[i] != 0xFF:
            token, poff, plen = struct.unpack_from(">BHH", resp, i)
            if token == 0x01 and resp[poff] not in (0x00, 0x02):
                raise RuntimeError(
                    "server requires TLS (ENCRYPT_REQ); plaintext TDS "
                    "session unavailable")
            i += 5

    def _login(self, user: str, password: str, database: str,
               appname: str) -> None:
        import os as _os

        def ucs2(s: str) -> bytes:
            return s.encode("utf-16-le")

        parts = [ucs2("seatunnel"),            # hostname
                 ucs2(user),
                 obfuscate_password(password),
                 ucs2(appname),
                 ucs2(""),                     # servername
                 b"",                          # extension
                 ucs2("seatunnel-spark"),      # clt interface name
                 ucs2(""),                     # language
                 ucs2(database)]
        fixed_len = 94
        offs, data, pos = [], b"", fixed_len
        for idx, p in enumerate(parts):
            nchars = len(p) // 2 if idx != 5 else len(p)
            offs.append((pos, nchars))
            data += p
            pos += len(p)
        head = struct.pack("<IIIIII", 0, 0x74000004, self._pktsize, 7,
                           _os.getpid() & 0x7FFF, 0)
        head += bytes([0x00, 0x00, 0x00, 0x00])  # option/type flags
        head += struct.pack("<iI", 0, 0x0409)    # timezone, LCID
        for ib, cch in offs:
            head += struct.pack("<HH", ib, cch)
        head += b"\x00\x01\x02\x03\x04\x05"      # ClientID (MAC)
        head += struct.pack("<HH", pos, 0)       # SSPI ib/cb
        head += struct.pack("<HH", pos, 0)       # AtchDBFile
        head += struct.pack("<HH", pos, 0)       # ChangePassword
        head += struct.pack("<I", 0)             # cbSSPILong
        payload = head + data
        payload = struct.pack("<I", len(payload)) + payload[4:]
        self._send_message(PKT_LOGIN7, payload)
        _, resp = self._recv_message()
        ack = False
        for tok in self._tokens(resp):
            if tok[0] == TOK_LOGINACK:
                ack = True
        if not ack:
            raise RuntimeError("mssql: login rejected (no LOGINACK)")

    # -- token stream ------------------------------------------------------
    def _tokens(self, buf: bytes):
        """Yield (token, payload-view-start, meta) tuples while decoding
        positionally; raises TdsError on ERROR tokens after DONE."""
        i = 0
        cols: list[ColMeta] = []
        rows: list[tuple] = []
        errors: list[TdsError] = []
        while i < len(buf):
            tok = buf[i]
            i += 1
            if tok == TOK_COLMETADATA:
                (count,) = struct.unpack_from("<H", buf, i)
                i += 2
                cols = []
                if count in (0, 0xFFFF):
                    continue
                for _ in range(count):
                    i += 4 + 2  # UserType (7.2+: ULONG), Flags
                    ttype = buf[i]
                    i += 1
                    maxlen = prec = scale = 0
                    if ttype in _FIXED_LEN:
                        pass
                    elif ttype in _USHORT_CHAR or ttype in _USHORT_NCHAR:
                        (maxlen,) = struct.unpack_from("<H", buf, i)
                        i += 2 + 5  # + collation
                    elif ttype in _USHORT_BIN:
                        (maxlen,) = struct.unpack_from("<H", buf, i)
                        i += 2
                    elif ttype in (T_DECIMALN, T_NUMERICN):
                        maxlen, prec, scale = buf[i], buf[i + 1], buf[i + 2]
                        i += 3
                    elif ttype in (T_TIMEN, T_DATETIME2N,
                                   T_DATETIMEOFFSETN):
                        scale = buf[i]
                        i += 1
                    elif ttype == T_DATEN:
                        pass
                    elif ttype in _BYTELEN:
                        maxlen = buf[i]
                        i += 1
                    elif ttype == T_XML:
                        i += 1  # schema-present (0)
                    elif ttype in (T_TEXT, T_NTEXT, T_IMAGE):
                        (maxlen,) = struct.unpack_from("<I", buf, i)
                        i += 4
                        if ttype != T_IMAGE:
                            i += 5  # collation
                        nparts = buf[i]
                        i += 1
                        for _p in range(nparts):
                            (ln,) = struct.unpack_from("<H", buf, i)
                            i += 2 + ln * 2
                    else:
                        raise NotImplementedError(
                            f"tds type {ttype:#x} in COLMETADATA")
                    nlen = buf[i]
                    i += 1
                    name = buf[i:i + nlen * 2].decode("utf-16-le")
                    i += nlen * 2
                    cols.append(ColMeta(name, ttype, maxlen, prec, scale))
                yield (TOK_COLMETADATA, cols)
            elif tok in (TOK_ROW, TOK_NBCROW):
                nullmap = b""
                if tok == TOK_NBCROW:
                    nb = (len(cols) + 7) // 8
                    nullmap = buf[i:i + nb]
                    i += nb
                vals = []
                for ci, c in enumerate(cols):
                    if nullmap and (nullmap[ci // 8] >> (ci % 8)) & 1:
                        vals.append(None)
                        continue
                    v, i = self._decode_value(buf, i, c)
                    vals.append(v)
                row = tuple(vals)
                rows.append(row)
                yield (tok, row)
            elif tok == TOK_ERROR or tok == TOK_INFO:
                (ln,) = struct.unpack_from("<H", buf, i)
                body = buf[i + 2:i + 2 + ln]
                i += 2 + ln
                if tok == TOK_ERROR:
                    number, state, severity = struct.unpack_from(
                        "<IBB", body, 0)
                    (mlen,) = struct.unpack_from("<H", body, 6)
                    msg = body[8:8 + mlen * 2].decode("utf-16-le")
                    errors.append(TdsError(number, state, severity, msg))
            elif tok == TOK_ENVCHANGE or tok == TOK_ORDER \
                    or tok == TOK_FEATUREEXTACK:
                (ln,) = struct.unpack_from("<H", buf, i)
                i += 2 + ln
            elif tok == TOK_LOGINACK:
                (ln,) = struct.unpack_from("<H", buf, i)
                i += 2 + ln
                yield (TOK_LOGINACK, None)
            elif tok == TOK_RETURNSTATUS:
                i += 4
            elif tok in (TOK_DONE, TOK_DONEPROC, TOK_DONEINPROC):
                status, _cur, rowcount = struct.unpack_from("<HHQ", buf, i)
                i += 12
                yield (tok, (status, rowcount))
            else:
                raise NotImplementedError(f"tds token {tok:#x}")
        if errors:
            raise errors[0]

    def _read_plp(self, buf: bytes, i: int) -> tuple[bytes | None, int]:
        (total,) = struct.unpack_from("<Q", buf, i)
        i += 8
        if total == PLP_NULL:
            return None, i
        out = b""
        while True:
            (clen,) = struct.unpack_from("<I", buf, i)
            i += 4
            if clen == 0:
                return out, i
            out += buf[i:i + clen]
            i += clen

    def _decode_value(self, buf: bytes, i: int, c: ColMeta):
        t = c.type_token
        if t in _FIXED_LEN:
            n = _FIXED_LEN[t]
            raw = buf[i:i + n]
            i += n
            return self._scalar(t, raw, c), i
        if t in _USHORT_CHAR or t in _USHORT_NCHAR or t in _USHORT_BIN:
            if c.maxlen == 0xFFFF:  # varchar(max)/nvarchar(max): PLP
                raw, i = self._read_plp(buf, i)
                if raw is None:
                    return None, i
            else:
                (ln,) = struct.unpack_from("<H", buf, i)
                i += 2
                if ln == 0xFFFF:
                    return None, i
                raw = buf[i:i + ln]
                i += ln
            if t in _USHORT_NCHAR:
                return raw.decode("utf-16-le"), i
            if t in _USHORT_CHAR:
                return raw.decode("utf-8", errors="replace"), i
            return bytes(raw), i
        if t == T_XML:
            raw, i = self._read_plp(buf, i)
            return (None if raw is None
                    else raw.decode("utf-16-le")), i
        if t in (T_TEXT, T_NTEXT, T_IMAGE):
            ptr_len = buf[i]
            i += 1
            if ptr_len == 0:
                return None, i
            i += ptr_len + 8  # textptr + timestamp
            (ln,) = struct.unpack_from("<I", buf, i)
            i += 4
            raw = buf[i:i + ln]
            i += ln
            if t == T_NTEXT:
                return raw.decode("utf-16-le"), i
            if t == T_TEXT:
                return raw.decode("utf-8", errors="replace"), i
            return bytes(raw), i
        # byte-length-prefixed family
        ln = buf[i]
        i += 1
        if ln == 0:
            return None, i
        raw = buf[i:i + ln]
        i += ln
        return self._scalar(t, raw, c), i

    def _scalar(self, t: int, raw: bytes, c: ColMeta):
        if t == T_INTN:
            # 1-byte INTN is tinyint: unsigned per [MS-TDS] (like INT1)
            return int.from_bytes(raw, "little", signed=len(raw) > 1)
        if t == T_INT1:
            return raw[0]
        if t in (T_INT2, T_INT4, T_INT8):
            return int.from_bytes(raw, "little", signed=True)
        if t in (T_BIT, T_BITN):
            return bool(raw[0])
        if t in (T_FLT4, T_FLT8, T_FLTN):
            return struct.unpack("<f" if len(raw) == 4 else "<d", raw)[0]
        if t in (T_DECIMALN, T_NUMERICN):
            return decode_decimal(raw, c.scale)
        if t in (T_MONEY, T_MONEYN) and len(raw) == 8:
            return decode_money(raw)
        if t in (T_MONEY4, T_MONEYN):
            return decimal.Decimal(
                int.from_bytes(raw, "little", signed=True)) / 10000
        if t in (T_DATETIME, T_DATETIMN) and len(raw) == 8:
            return decode_datetime(raw)
        if t in (T_DATETIM4, T_DATETIMN):
            return decode_smalldatetime(raw)
        if t == T_DATEN:
            return decode_date3(raw)
        if t == T_TIMEN:
            return decode_time(raw, c.scale)
        if t == T_DATETIME2N:
            tl = _time_len(c.scale)
            return datetime.datetime.combine(
                decode_date3(raw[tl:tl + 3]), decode_time(raw[:tl], c.scale))
        if t == T_DATETIMEOFFSETN:
            tl = _time_len(c.scale)
            utc = datetime.datetime.combine(
                decode_date3(raw[tl:tl + 3]), decode_time(raw[:tl], c.scale))
            (off,) = struct.unpack_from("<h", raw, tl + 3)
            tz = datetime.timezone(datetime.timedelta(minutes=off))
            return (utc.replace(tzinfo=datetime.timezone.utc)
                    .astimezone(tz))
        if t == T_GUID:
            return str(uuid.UUID(bytes_le=raw))
        raise NotImplementedError(f"tds scalar {t:#x}")

    # -- queries -----------------------------------------------------------
    def _batch(self, sql: str) -> bytes:
        # ALL_HEADERS: one transaction-descriptor header (TDS 7.2+)
        hdr = struct.pack("<IIH", 22, 18, 0x0002) + b"\x00" * 8 \
            + struct.pack("<I", 1)
        self._send_message(PKT_SQLBATCH, hdr + sql.encode("utf-16-le"))
        _, resp = self._recv_message()
        return resp

    def query(self, sql: str) -> tuple[list[str], list[str], list[tuple]]:
        """SQLBatch -> (column_names, type_names, decoded_rows)."""
        cols: list[ColMeta] = []
        rows: list[tuple] = []
        for tok, payload in self._tokens(self._batch(sql)):
            if tok == TOK_COLMETADATA:
                cols = payload
            elif tok in (TOK_ROW, TOK_NBCROW):
                rows.append(payload)
        return ([c.name for c in cols], [c.type_name for c in cols], rows)

    def execute(self, sql: str) -> int:
        """Statement without a resultset -> affected rows."""
        affected = 0
        for tok, payload in self._tokens(self._batch(sql)):
            if tok in (TOK_DONE, TOK_DONEPROC, TOK_DONEINPROC):
                status, rowcount = payload
                if status & DONE_COUNT:
                    affected += rowcount
        return affected

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


__all__ = ["TdsClient", "TdsError", "ColMeta", "TYPE_NAMES",
           "obfuscate_password", "deobfuscate_password",
           "encode_datetime", "decode_datetime", "encode_smalldatetime",
           "decode_smalldatetime", "encode_time", "decode_time",
           "encode_date3", "decode_date3", "encode_money", "decode_money",
           "encode_decimal", "decode_decimal"]
