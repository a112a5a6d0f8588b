"""MySQL binlog wire client + row-based event codec (stdlib only).

Written from the public binlog v4 format (dev.mysql.com/doc/internals
replication protocol: binlog_event.h layouts, COM_BINLOG_DUMP, the
rows-event/table-map encodings) so `MySQL-CDC` can tail a LIVE log
instead of a debezium replay directory. Reference parity:
connector-cdc-mysql/.../reader/BinlogSplitReader.java tails the same
stream via the shyiko binlog client; here the dump + decode is ~400
lines over the existing mysql_wire.py handshake.

Scope: row-based replication (binlog_format=ROW) with the common
column types — integers (incl. INT24/YEAR/BIT), FLOAT/DOUBLE,
NEWDECIMAL (packed 9-digits-per-4-bytes groups), VARCHAR/CHAR/BLOB/
TEXT, DATE, DATETIME2/TIMESTAMP2/TIME2 (the 5.6+ packed temporal
formats) and ENUM. Statement events (QUERY_EVENT) surface as DDL for
schema evolution; XID marks transaction commit. GTID/intvar/rand
events are skipped (metadata for statement-based replication).

The encoder half exists so the mini MySQL server (testing/
mysql_server.py) can emit a REAL binlog stream for e2e tests; both
halves implement the same public layout, and the decoder additionally
drives the CDC source against any server speaking binlog v4 with
checksums off or CRC32 (auto-detected from the format-description
event).
"""

from __future__ import annotations

import datetime as _dt
import struct

from seatunnel_spark.mysql_wire import MySqlClient, read_lenenc, lenenc

# binlog event type codes (binlog_event.h)
QUERY_EVENT = 2
ROTATE_EVENT = 4
FORMAT_DESCRIPTION_EVENT = 15
XID_EVENT = 16
TABLE_MAP_EVENT = 19
WRITE_ROWS_EVENT = 30
UPDATE_ROWS_EVENT = 31
DELETE_ROWS_EVENT = 32

# column type codes (mysql_com.h enum_field_types)
T_DECIMAL, T_TINY, T_SHORT, T_LONG, T_FLOAT, T_DOUBLE = 0, 1, 2, 3, 4, 5
T_NULL, T_TIMESTAMP, T_LONGLONG, T_INT24, T_DATE = 6, 7, 8, 9, 10
T_TIME, T_DATETIME, T_YEAR = 11, 12, 13
T_BIT = 16
T_TIMESTAMP2, T_DATETIME2, T_TIME2 = 17, 18, 19
T_JSON, T_NEWDECIMAL, T_ENUM_X, T_SET_X = 245, 246, 247, 248
T_TINY_BLOB, T_MEDIUM_BLOB, T_LONG_BLOB, T_BLOB = 249, 250, 251, 252
T_VAR_STRING, T_STRING, T_VARCHAR = 253, 254, 15
T_ENUM = 247

_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


# ---------------------------------------------------------------------------
# NEWDECIMAL packed codec (strings/decimal/decimal.c bin2decimal)
# ---------------------------------------------------------------------------

def _dec_bin_size(precision: int, scale: int) -> int:
    intg = precision - scale
    return (intg // 9) * 4 + _DIG2BYTES[intg % 9] \
        + (scale // 9) * 4 + _DIG2BYTES[scale % 9]


def encode_newdecimal(value, precision: int, scale: int) -> bytes:
    from decimal import Decimal

    d = Decimal(str(value)).scaleb(scale).to_integral_value()
    neg = d < 0
    digits = str(abs(int(d))).rjust(precision, "0")
    if len(digits) > precision:
        raise ValueError(
            f"decimal {value!r} overflows DECIMAL({precision},{scale})")
    intg = precision - scale
    ip, fp = digits[:intg], digits[intg:]
    out = bytearray()

    def emit(part: str, leading: bool):
        # bin2decimal stores the integer part's partial digit group FIRST
        # (leading) but the fractional part's partial group LAST — mirror of
        # decode_newdecimal's take() order above.
        n = len(part)
        if leading:
            first = n % 9
            chunks = ([part[:first]] if first else []) + \
                [part[first + i * 9:first + (i + 1) * 9]
                 for i in range((n - first) // 9)]
        else:
            full = n // 9
            chunks = [part[i * 9:(i + 1) * 9] for i in range(full)]
            if n % 9:
                chunks.append(part[full * 9:])
        for c in chunks:
            out.extend(int(c or "0").to_bytes(_DIG2BYTES[len(c)] if
                                              len(c) % 9 else 4, "big"))
    emit(ip, True)
    emit(fp, False)
    if neg:
        for i in range(len(out)):
            out[i] ^= 0xFF
    out[0] ^= 0x80  # sign bit (set = positive)
    return bytes(out)


def decode_newdecimal(data: bytes, precision: int, scale: int):
    from decimal import Decimal

    buf = bytearray(data)
    positive = bool(buf[0] & 0x80)
    buf[0] ^= 0x80
    if not positive:
        for i in range(len(buf)):
            buf[i] ^= 0xFF
    intg = precision - scale
    i = 0
    digits = ""

    def take(ndig: int) -> str:
        nonlocal i
        nb = _DIG2BYTES[ndig] if ndig % 9 else 4
        v = int.from_bytes(buf[i:i + nb], "big")
        i += nb
        return str(v).rjust(ndig, "0")

    first = intg % 9
    if first:
        digits += take(first)
    for _ in range(intg // 9):
        digits += take(9)
    frac = ""
    ffirst = scale % 9
    for _ in range(scale // 9):
        frac += take(9)
    if ffirst:
        frac += take(ffirst)
    s = (digits or "0") + ("." + frac if frac else "")
    return Decimal(s) if positive else -Decimal(s)


# ---------------------------------------------------------------------------
# per-column value codec (rows-event cell layout, log_event.cc
# log_event_print_value)
# ---------------------------------------------------------------------------

def _enc_packed_datetime2(dt: _dt.datetime, fsp: int) -> bytes:
    ym = dt.year * 13 + dt.month
    packed = (1 << 39) | (ym << 22) | (dt.day << 17) | (dt.hour << 12) \
        | (dt.minute << 6) | dt.second
    out = packed.to_bytes(5, "big")
    if fsp:
        frac = dt.microsecond // (10 ** (6 - fsp))
        out += frac.to_bytes((fsp + 1) // 2, "big")
    return out


def _dec_packed_datetime2(data: bytes, i: int, fsp: int):
    packed = int.from_bytes(data[i:i + 5], "big")
    i += 5
    frac = 0
    nb = (fsp + 1) // 2
    if nb:
        frac = int.from_bytes(data[i:i + nb], "big") * 10 ** (6 - fsp)
        i += nb
    ym = (packed >> 22) & 0x1FFFF
    year, month = divmod(ym, 13)
    return _dt.datetime(year, month, (packed >> 17) & 0x1F,
                        (packed >> 12) & 0x1F, (packed >> 6) & 0x3F,
                        packed & 0x3F, frac), i


def encode_value(ftype: int, meta, v) -> bytes:
    if ftype == T_TINY:
        return (v & 0xFF).to_bytes(1, "little")
    if ftype == T_SHORT:
        return (v & 0xFFFF).to_bytes(2, "little")
    if ftype == T_INT24:
        return (v & 0xFFFFFF).to_bytes(3, "little")
    if ftype == T_LONG:
        return (v & 0xFFFFFFFF).to_bytes(4, "little")
    if ftype == T_LONGLONG:
        return (v & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    if ftype == T_YEAR:
        return bytes([(v - 1900) if v else 0])
    if ftype == T_FLOAT:
        return struct.pack("<f", float(v))
    if ftype == T_DOUBLE:
        return struct.pack("<d", float(v))
    if ftype == T_NEWDECIMAL:
        prec, scale = meta
        return encode_newdecimal(v, prec, scale)
    if ftype in (T_VARCHAR, T_VAR_STRING):
        b = v.encode() if isinstance(v, str) else bytes(v)
        if meta < 256:
            return bytes([len(b)]) + b
        return len(b).to_bytes(2, "little") + b
    if ftype == T_STRING:  # CHAR / ENUM carried with packed meta
        real, length = meta
        if real == T_ENUM:
            n = 1 if length == 1 else 2
            return int(v).to_bytes(n, "little")
        b = v.encode() if isinstance(v, str) else bytes(v)
        if length < 256:
            return bytes([len(b)]) + b
        return len(b).to_bytes(2, "little") + b
    if ftype == T_BLOB:
        nb = meta
        b = v.encode() if isinstance(v, str) else bytes(v)
        return len(b).to_bytes(nb, "little") + b
    if ftype == T_DATE:
        packed = v.day | (v.month << 5) | (v.year << 9)
        return packed.to_bytes(3, "little")
    if ftype == T_DATETIME2:
        return _enc_packed_datetime2(v, meta)
    if ftype == T_TIMESTAMP2:
        ts = int(v.replace(tzinfo=_dt.timezone.utc).timestamp()
                 if isinstance(v, _dt.datetime) else int(v))
        out = ts.to_bytes(4, "big")
        if meta:
            frac = (v.microsecond if isinstance(v, _dt.datetime) else 0) \
                // (10 ** (6 - meta))
            out += frac.to_bytes((meta + 1) // 2, "big")
        return out
    if ftype == T_TIME2:
        td = v if isinstance(v, _dt.timedelta) else _dt.timedelta(
            hours=v.hour, minutes=v.minute, seconds=v.second)
        secs = int(td.total_seconds())
        h, rem = divmod(abs(secs), 3600)
        m, s = divmod(rem, 60)
        packed = (1 << 23) | (h << 12) | (m << 6) | s
        if secs < 0:
            packed = (1 << 24) - packed
        out = packed.to_bytes(3, "big")
        if meta:
            out += (0).to_bytes((meta + 1) // 2, "big")
        return out
    if ftype == T_BIT:
        bits, nbytes = meta
        return int(v).to_bytes(nbytes + (1 if bits else 0), "big")
    raise ValueError(f"binlog encode: unsupported column type {ftype}")


def decode_value(ftype: int, meta, data: bytes, i: int,
                 unsigned: bool = False):
    if ftype == T_TINY:
        v = data[i]
        if not unsigned and v >= 128:
            v -= 256
        return v, i + 1
    if ftype == T_SHORT:
        v = int.from_bytes(data[i:i + 2], "little")
        if not unsigned and v >= 1 << 15:
            v -= 1 << 16
        return v, i + 2
    if ftype == T_INT24:
        v = int.from_bytes(data[i:i + 3], "little")
        if not unsigned and v >= 1 << 23:
            v -= 1 << 24
        return v, i + 3
    if ftype == T_LONG:
        v = int.from_bytes(data[i:i + 4], "little")
        if not unsigned and v >= 1 << 31:
            v -= 1 << 32
        return v, i + 4
    if ftype == T_LONGLONG:
        v = int.from_bytes(data[i:i + 8], "little")
        if not unsigned and v >= 1 << 63:
            v -= 1 << 64
        return v, i + 8
    if ftype == T_YEAR:
        v = data[i]
        return (v + 1900 if v else 0), i + 1
    if ftype == T_FLOAT:
        return struct.unpack_from("<f", data, i)[0], i + 4
    if ftype == T_DOUBLE:
        return struct.unpack_from("<d", data, i)[0], i + 8
    if ftype == T_NEWDECIMAL:
        prec, scale = meta
        n = _dec_bin_size(prec, scale)
        return decode_newdecimal(data[i:i + n], prec, scale), i + n
    if ftype in (T_VARCHAR, T_VAR_STRING):
        if meta < 256:
            ln = data[i]
            i += 1
        else:
            ln = int.from_bytes(data[i:i + 2], "little")
            i += 2
        raw = data[i:i + ln]
        try:
            return raw.decode(), i + ln
        except UnicodeDecodeError:
            return raw, i + ln
    if ftype == T_STRING:
        real, length = meta
        if real in (T_ENUM, T_SET_X):
            n = 1 if length == 1 else 2
            return int.from_bytes(data[i:i + n], "little"), i + n
        if length < 256:
            ln = data[i]
            i += 1
        else:
            ln = int.from_bytes(data[i:i + 2], "little")
            i += 2
        raw = data[i:i + ln]
        try:
            return raw.decode(), i + ln
        except UnicodeDecodeError:
            return raw, i + ln
    if ftype in (T_BLOB, T_TINY_BLOB, T_MEDIUM_BLOB, T_LONG_BLOB, T_JSON):
        nb = meta
        ln = int.from_bytes(data[i:i + nb], "little")
        i += nb
        return bytes(data[i:i + ln]), i + ln
    if ftype == T_DATE:
        packed = int.from_bytes(data[i:i + 3], "little")
        if packed == 0:
            return None, i + 3
        return _dt.date(packed >> 9, (packed >> 5) & 0x0F,
                        packed & 0x1F), i + 3
    if ftype == T_DATETIME2:
        return _dec_packed_datetime2(data, i, meta)
    if ftype == T_TIMESTAMP2:
        ts = int.from_bytes(data[i:i + 4], "big")
        i += 4
        frac = 0
        nb = (meta + 1) // 2
        if nb:
            frac = int.from_bytes(data[i:i + nb], "big") * 10 ** (6 - meta)
            i += nb
        return _dt.datetime.fromtimestamp(
            ts, tz=_dt.timezone.utc).replace(tzinfo=None,
                                             microsecond=frac), i + 0
    if ftype == T_TIME2:
        packed = int.from_bytes(data[i:i + 3], "big")
        i += 3
        nb = (meta + 1) // 2
        if nb:
            i += nb
        neg = not (packed & (1 << 23))
        if neg:
            packed = (1 << 24) - packed
        h = (packed >> 12) & 0x3FF
        m = (packed >> 6) & 0x3F
        s = packed & 0x3F
        td = _dt.timedelta(hours=h, minutes=m, seconds=s)
        return (-td if neg else td), i
    if ftype == T_BIT:
        bits, nbytes = meta
        n = nbytes + (1 if bits else 0)
        return int.from_bytes(data[i:i + n], "big"), i + n
    raise ValueError(f"binlog decode: unsupported column type {ftype}")


# ---------------------------------------------------------------------------
# event encode (mini-master side)
# ---------------------------------------------------------------------------

def _header(etype: int, body_len: int, log_pos: int, ts: int = 0,
            server_id: int = 1) -> bytes:
    return struct.pack("<IBIIIH", ts, etype, server_id, 19 + body_len,
                       log_pos, 0)


def encode_fde() -> bytes:
    """FORMAT_DESCRIPTION_EVENT with checksum_alg=0 (off)."""
    body = struct.pack("<H", 4) + b"8.0.0-mini".ljust(50, b"\0") \
        + struct.pack("<I", 0) + bytes([19]) \
        + bytes(40) + bytes([0])  # post-header lens (unused) + alg OFF
    return _header(FORMAT_DESCRIPTION_EVENT, len(body), 0) + body


def _meta_bytes(ftype: int, meta) -> bytes:
    if ftype in (T_VARCHAR, T_VAR_STRING):
        return struct.pack("<H", meta)
    if ftype == T_STRING:
        real, length = meta
        return bytes([real, length])
    if ftype == T_NEWDECIMAL:
        return bytes([meta[0], meta[1]])
    if ftype in (T_FLOAT, T_DOUBLE):
        return bytes([4 if ftype == T_FLOAT else 8])
    if ftype in (T_BLOB, T_JSON):
        return bytes([meta])
    if ftype in (T_DATETIME2, T_TIMESTAMP2, T_TIME2):
        return bytes([meta])
    if ftype == T_BIT:
        bits, nbytes = meta
        return bytes([bits, nbytes])
    return b""


def encode_table_map(table_id: int, db: str, table: str,
                     cols: list[tuple[int, object]], log_pos: int) -> bytes:
    meta = b"".join(_meta_bytes(t, m) for t, m in cols)
    n = len(cols)
    body = (table_id.to_bytes(6, "little") + struct.pack("<H", 1)
            + bytes([len(db)]) + db.encode() + b"\0"
            + bytes([len(table)]) + table.encode() + b"\0"
            + lenenc(n) + bytes(t for t, _ in cols)
            + lenenc(len(meta)) + meta
            + bytes((n + 7) // 8))  # null-allowed bitmap: all not-null ok
    return _header(TABLE_MAP_EVENT, len(body), log_pos) + body


def _encode_row(cols: list[tuple[int, object]], row: tuple) -> bytes:
    n = len(cols)
    nullmap = bytearray((n + 7) // 8)
    cells = b""
    for ci, ((t, m), v) in enumerate(zip(cols, row)):
        if v is None:
            nullmap[ci // 8] |= 1 << (ci % 8)
        else:
            cells += encode_value(t, m, v)
    return bytes(nullmap) + cells


def encode_rows_event(etype: int, table_id: int,
                      cols: list[tuple[int, object]],
                      rows: list, log_pos: int) -> bytes:
    """rows: tuples for write/delete; (before, after) pairs for update."""
    n = len(cols)
    present = bytes([0xFF] * ((n + 7) // 8))
    body = (table_id.to_bytes(6, "little") + struct.pack("<H", 0)
            + struct.pack("<H", 2)  # extra-data length (v2), no extra
            + lenenc(n) + present)
    if etype == UPDATE_ROWS_EVENT:
        body += present  # after-image bitmap
        for before, after in rows:
            body += _encode_row(cols, before) + _encode_row(cols, after)
    else:
        for row in rows:
            body += _encode_row(cols, row)
    return _header(etype, len(body), log_pos) + body


def encode_query_event(db: str, sql: str, log_pos: int) -> bytes:
    body = (struct.pack("<IIBHH", 0, 0, len(db), 0, 0)
            + db.encode() + b"\0" + sql.encode())
    return _header(QUERY_EVENT, len(body), log_pos) + body


def encode_xid_event(xid: int, log_pos: int) -> bytes:
    body = struct.pack("<Q", xid)
    return _header(XID_EVENT, len(body), log_pos) + body


# ---------------------------------------------------------------------------
# dump client
# ---------------------------------------------------------------------------

class BinlogClient(MySqlClient):
    """COM_BINLOG_DUMP over the existing handshake; yields decoded
    events. `non_block=True` sets the BINLOG_DUMP_NON_BLOCK flag so the
    master sends EOF at log end instead of blocking — the bounded-read
    mode the e2e tests (and batch snapshots) use; pass False to tail
    live."""

    def dump(self, server_id: int = 1, filename: str = "",
             pos: int = 4, non_block: bool = True):
        flags = 0x01 if non_block else 0x00
        payload = (b"\x12" + struct.pack("<IHI", pos, flags, server_id)
                   + filename.encode())
        self._send_packet(payload, seq=0)
        table_map: dict[int, dict] = {}
        unsigned_cols: dict[tuple[str, str], set] = getattr(
            self, "unsigned_columns", {})
        checksum = 0
        while True:
            pkt = self._read_packet()
            if not pkt or pkt[0] == 0xFE and len(pkt) < 9:
                return
            if pkt[0] == 0xFF:
                code = int.from_bytes(pkt[1:3], "little")
                raise RuntimeError(f"binlog dump error {code}: "
                                   f"{pkt[9:].decode(errors='replace')}")
            ev = pkt[1:]
            ts, etype, _sid, esize, log_pos, _fl = struct.unpack_from(
                "<IBIIIH", ev, 0)
            body = ev[19:len(ev) - checksum if checksum else len(ev)]
            if etype == FORMAT_DESCRIPTION_EVENT:
                # checksum alg byte sits 5 bytes from the end (alg +
                # its own CRC32) when the master has checksums on
                alg = body[-5] if len(body) > 57 else 0
                checksum = 4 if alg == 1 else 0
                continue
            if etype == ROTATE_EVENT:
                rpos = int.from_bytes(body[:8], "little")
                yield {"event": "rotate", "file": body[8:].decode(),
                       "pos": rpos, "log_pos": log_pos, "ts": ts}
                continue
            if etype == TABLE_MAP_EVENT:
                table_map[int.from_bytes(body[:6], "little")] = \
                    _decode_table_map(body)
                continue
            if etype == QUERY_EVENT:
                dblen = body[8]
                status_len = int.from_bytes(body[11:13], "little")
                i = 13 + status_len
                db = body[i:i + dblen].decode()
                sql = body[i + dblen + 1:].decode(errors="replace")
                yield {"event": "query", "db": db, "sql": sql,
                       "log_pos": log_pos, "ts": ts}
                continue
            if etype == XID_EVENT:
                yield {"event": "xid",
                       "xid": int.from_bytes(body[:8], "little"),
                       "log_pos": log_pos, "ts": ts}
                continue
            if etype in (WRITE_ROWS_EVENT, UPDATE_ROWS_EVENT,
                         DELETE_ROWS_EVENT):
                tid = int.from_bytes(body[:6], "little")
                tm = table_map.get(tid)
                if tm is None:
                    continue
                uns = unsigned_cols.get((tm["db"], tm["table"]), set())
                rows = _decode_rows(etype, body, tm, uns)
                kind = {WRITE_ROWS_EVENT: "insert",
                        UPDATE_ROWS_EVENT: "update",
                        DELETE_ROWS_EVENT: "delete"}[etype]
                yield {"event": kind, "db": tm["db"], "table": tm["table"],
                       "rows": rows, "log_pos": log_pos, "ts": ts}


def _decode_table_map(body: bytes) -> dict:
    i = 8  # table_id(6) + flags(2)
    dblen = body[i]
    db = body[i + 1:i + 1 + dblen].decode()
    i += 1 + dblen + 1
    tlen = body[i]
    table = body[i + 1:i + 1 + tlen].decode()
    i += 1 + tlen + 1
    n, i = read_lenenc(body, i)
    types = list(body[i:i + n])
    i += n
    mlen, i = read_lenenc(body, i)
    mend = i + mlen
    cols: list[tuple[int, object]] = []
    for t in types:
        if t in (T_VARCHAR, T_VAR_STRING):
            m = int.from_bytes(body[i:i + 2], "little")
            i += 2
        elif t == T_STRING:
            m = (body[i], body[i + 1])
            i += 2
        elif t == T_NEWDECIMAL:
            m = (body[i], body[i + 1])
            i += 2
        elif t in (T_FLOAT, T_DOUBLE):
            i += 1
            m = None
        elif t in (T_BLOB, T_JSON):
            m = body[i]
            i += 1
        elif t in (T_DATETIME2, T_TIMESTAMP2, T_TIME2):
            m = body[i]
            i += 1
        elif t == T_BIT:
            m = (body[i], body[i + 1])
            i += 2
        else:
            m = None
        cols.append((t, m))
    i = mend
    return {"db": db, "table": table, "cols": cols}


def _decode_row(cols, body: bytes, i: int, uns: set) -> tuple[tuple, int]:
    n = len(cols)
    nullmap = body[i:i + (n + 7) // 8]
    i += (n + 7) // 8
    vals = []
    for ci, (t, m) in enumerate(cols):
        if nullmap[ci // 8] & (1 << (ci % 8)):
            vals.append(None)
            continue
        v, i = decode_value(t, m, body, i, unsigned=ci in uns)
        vals.append(v)
    return tuple(vals), i


def _decode_rows(etype: int, body: bytes, tm: dict, uns: set) -> list:
    cols = tm["cols"]
    n = len(cols)
    i = 8  # table_id + flags
    extra = int.from_bytes(body[i:i + 2], "little")
    i += extra  # extra-data length includes its own two bytes
    cnt, i = read_lenenc(body, i)
    i += (cnt + 7) // 8  # columns-present bitmap (assume all present)
    if etype == UPDATE_ROWS_EVENT:
        i += (cnt + 7) // 8
    rows = []
    while i < len(body):
        row, i = _decode_row(cols, body, i, uns)
        if etype == UPDATE_ROWS_EVENT:
            after, i = _decode_row(cols, body, i, uns)
            rows.append((row, after))
        else:
            rows.append(row)
    return rows


__all__ = [
    "BinlogClient", "encode_fde", "encode_table_map", "encode_rows_event",
    "encode_query_event", "encode_xid_event", "encode_newdecimal",
    "decode_newdecimal", "encode_value", "decode_value",
    "WRITE_ROWS_EVENT", "UPDATE_ROWS_EVENT", "DELETE_ROWS_EVENT",
    "QUERY_EVENT", "XID_EVENT", "TABLE_MAP_EVENT",
]
