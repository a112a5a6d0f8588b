"""Apache Thrift binary protocol codec (stdlib, spec-complete subset).

The strict binary protocol as publicly specified
(thrift/doc/specs/thrift-binary-protocol.md): message = i32
(0x80010000 | type) + string name + i32 seqid; values are tagged
(type byte, i16 field id) struct fields terminated by STOP, with
BOOL/BYTE/DOUBLE/I16/I32/I64/STRING/STRUCT/MAP/SET/LIST containers.

Values are modeled generically — a struct is {field_id: (ttype, value)}
— so service IDLs (HiveServer2 TCLIService, StarRocks
TStarrocksExternalService) are expressed as plain field-id tables in
their client modules instead of generated code. Both the clients and
the mini servers in testing/ encode and decode through this module.
"""

from __future__ import annotations

import struct

STOP = 0
BOOL = 2
BYTE = 3
DOUBLE = 4
I16 = 6
I32 = 8
I64 = 10
STRING = 11
STRUCT = 12
MAP = 13
SET = 14
LIST = 15

CALL = 1
REPLY = 2
EXCEPTION = 3

VERSION_1 = 0x80010000


def encode_value(ttype: int, v) -> bytes:
    if ttype == BOOL:
        return b"\x01" if v else b"\x00"
    if ttype == BYTE:
        return struct.pack(">b", v)
    if ttype == DOUBLE:
        return struct.pack(">d", v)
    if ttype == I16:
        return struct.pack(">h", v)
    if ttype == I32:
        return struct.pack(">i", v)
    if ttype == I64:
        return struct.pack(">q", v)
    if ttype == STRING:
        raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        return struct.pack(">i", len(raw)) + raw
    if ttype == STRUCT:
        return encode_struct(v)
    if ttype in (LIST, SET):
        etype, items = v
        out = struct.pack(">bi", etype, len(items))
        for it in items:
            out += encode_value(etype, it)
        return out
    if ttype == MAP:
        ktype, vtype, entries = v
        out = struct.pack(">bbi", ktype, vtype, len(entries))
        for k, val in entries.items() if isinstance(entries, dict) \
                else entries:
            out += encode_value(ktype, k) + encode_value(vtype, val)
        return out
    raise ValueError(f"thrift: cannot encode type {ttype}")


def encode_struct(fields: dict[int, tuple[int, object]]) -> bytes:
    out = b""
    for fid, (ttype, v) in fields.items():
        out += struct.pack(">bh", ttype, fid) + encode_value(ttype, v)
    return out + b"\x00"


def decode_value(buf: bytes, i: int, ttype: int):
    if ttype == BOOL:
        return buf[i] != 0, i + 1
    if ttype == BYTE:
        return struct.unpack_from(">b", buf, i)[0], i + 1
    if ttype == DOUBLE:
        return struct.unpack_from(">d", buf, i)[0], i + 8
    if ttype == I16:
        return struct.unpack_from(">h", buf, i)[0], i + 2
    if ttype == I32:
        return struct.unpack_from(">i", buf, i)[0], i + 4
    if ttype == I64:
        return struct.unpack_from(">q", buf, i)[0], i + 8
    if ttype == STRING:
        (n,) = struct.unpack_from(">i", buf, i)
        i += 4
        return bytes(buf[i:i + n]), i + n
    if ttype == STRUCT:
        return decode_struct(buf, i)
    if ttype in (LIST, SET):
        etype, n = struct.unpack_from(">bi", buf, i)
        i += 5
        items = []
        for _ in range(n):
            v, i = decode_value(buf, i, etype)
            items.append(v)
        return (etype, items), i
    if ttype == MAP:
        ktype, vtype, n = struct.unpack_from(">bbi", buf, i)
        i += 6
        entries = []
        for _ in range(n):
            k, i = decode_value(buf, i, ktype)
            v, i = decode_value(buf, i, vtype)
            entries.append((k, v))
        return (ktype, vtype, entries), i
    raise ValueError(f"thrift: cannot decode type {ttype}")


def decode_struct(buf: bytes, i: int = 0):
    fields: dict[int, tuple[int, object]] = {}
    while True:
        ttype = buf[i]
        i += 1
        if ttype == STOP:
            return fields, i
        (fid,) = struct.unpack_from(">h", buf, i)
        i += 2
        v, i = decode_value(buf, i, ttype)
        fields[fid] = (ttype, v)


def encode_message(name: str, mtype: int, seqid: int,
                   args: dict[int, tuple[int, object]]) -> bytes:
    raw = name.encode("utf-8")
    return (struct.pack(">I", VERSION_1 | mtype)
            + struct.pack(">i", len(raw)) + raw
            + struct.pack(">i", seqid)
            + encode_struct(args))


def decode_message(buf: bytes):
    (verty,) = struct.unpack_from(">I", buf, 0)
    mtype = verty & 0xFF
    (nlen,) = struct.unpack_from(">i", buf, 4)
    name = buf[8:8 + nlen].decode("utf-8")
    i = 8 + nlen
    (seqid,) = struct.unpack_from(">i", buf, i)
    fields, i = decode_struct(buf, i + 4)
    return name, mtype, seqid, fields


# -- helpers for the field-id-table style ------------------------------

def sget(fields, fid, default=None):
    """Value of field `fid` in a decoded struct (type tag stripped)."""
    if fields is None or fid not in fields:
        return default
    return fields[fid][1]


def text(v, default=None) -> str | None:
    return v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else \
        (v if v is not None else default)


__all__ = ["STOP", "BOOL", "BYTE", "DOUBLE", "I16", "I32", "I64",
           "STRING", "STRUCT", "MAP", "SET", "LIST", "CALL", "REPLY",
           "EXCEPTION", "encode_value", "encode_struct", "decode_value",
           "decode_struct", "encode_message", "decode_message", "sget",
           "text"]
