"""Minimal BSON codec (stdlib-only) — the subset of types the MongoDB
connector moves: double, string, document, array, binary, ObjectId,
bool, UTC datetime, null, int32, int64, decimal128 (BID, common form).

Written from the public BSON spec (bsonspec.org). Python values map:
  dict<->document, list<->array, str<->string, bool<->bool,
  int<->int32/int64 (by range), float<->double, bytes<->binary,
  datetime<->UTC datetime (ms), Decimal<->decimal128,
  ObjectId (12-byte wrapper class) <-> ObjectId.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import os
import struct
import threading
import time


class ObjectId:
    _counter = int.from_bytes(os.urandom(3), "big")
    _rand = os.urandom(5)
    _lock = threading.Lock()

    def __init__(self, raw: bytes | str | None = None):
        if raw is None:
            with ObjectId._lock:
                ObjectId._counter = (ObjectId._counter + 1) & 0xFFFFFF
                c = ObjectId._counter
            raw = (struct.pack(">I", int(time.time())) + ObjectId._rand
                   + c.to_bytes(3, "big"))
        if isinstance(raw, str):
            raw = bytes.fromhex(raw)
        if len(raw) != 12:
            raise ValueError("ObjectId must be 12 bytes")
        self.raw = raw

    def __repr__(self):
        return f"ObjectId('{self.raw.hex()}')"

    def __str__(self):
        return self.raw.hex()

    def __eq__(self, other):
        return isinstance(other, ObjectId) and other.raw == self.raw

    def __hash__(self):
        return hash(self.raw)


_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _enc_dec128(v: decimal.Decimal) -> bytes:
    sign = 1 if v.is_signed() else 0
    t = v.as_tuple()
    s = int("".join(map(str, t.digits)) or "0")
    exp = t.exponent
    if s >> 113:
        raise ValueError(f"decimal128 significand too wide: {v}")
    biased = exp + 6176
    if not 0 <= biased < (1 << 14):
        raise ValueError(f"decimal128 exponent out of range: {v}")
    high = (sign << 63) | (biased << 49) | (s >> 64)
    low = s & ((1 << 64) - 1)
    return struct.pack("<QQ", low, high)


def _dec_dec128(b: bytes) -> decimal.Decimal:
    low, high = struct.unpack("<QQ", b)
    sign = "-" if high >> 63 else ""
    if (high >> 61) & 0b11 == 0b11:  # 11-prefix (wide significand) form
        biased = (high >> 47) & 0x3FFF
        s = ((high & ((1 << 47) - 1)) | (1 << 49) << 64) + low  # rare
    else:
        biased = (high >> 49) & 0x3FFF
        s = ((high & ((1 << 49) - 1)) << 64) | low
    return decimal.Decimal(f"{sign}{s}E{biased - 6176}")


def encode(doc: dict) -> bytes:
    out = bytearray()
    for k, v in doc.items():
        out += _element(str(k), v)
    return struct.pack("<i", len(out) + 5) + bytes(out) + b"\x00"


def _element(name: str, v) -> bytes:
    n = name.encode() + b"\x00"
    if isinstance(v, bool):
        return b"\x08" + n + (b"\x01" if v else b"\x00")
    if v is None:
        return b"\x0a" + n
    if isinstance(v, float):
        return b"\x01" + n + struct.pack("<d", v)
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + n + struct.pack("<i", v)
        return b"\x12" + n + struct.pack("<q", v)
    if isinstance(v, str):
        b = v.encode()
        return b"\x02" + n + struct.pack("<i", len(b) + 1) + b + b"\x00"
    if isinstance(v, dict):
        return b"\x03" + n + encode(v)
    if isinstance(v, (list, tuple)):
        return b"\x04" + n + encode({str(i): x for i, x in enumerate(v)})
    if isinstance(v, (bytes, bytearray)):
        return (b"\x05" + n + struct.pack("<i", len(v)) + b"\x00" + bytes(v))
    if isinstance(v, ObjectId):
        return b"\x07" + n + v.raw
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        # integer arithmetic: total_seconds()*1000 loses sub-ms
        # precision to float for dates far from the epoch
        delta = v - _EPOCH
        ms = (delta.days * 86_400_000 + delta.seconds * 1000
              + delta.microseconds // 1000)
        return b"\x09" + n + struct.pack("<q", ms)
    if isinstance(v, _dt.date):
        dt = _dt.datetime(v.year, v.month, v.day, tzinfo=_dt.timezone.utc)
        return _element(name, dt)
    if isinstance(v, decimal.Decimal):
        return b"\x13" + n + _enc_dec128(v)
    raise TypeError(f"bson: cannot encode {type(v)} ({v!r})")


def decode(data: bytes, offset: int = 0) -> tuple[dict, int]:
    """Decode one document at offset; returns (doc, next_offset)."""
    (length,) = struct.unpack_from("<i", data, offset)
    end = offset + length - 1
    i = offset + 4
    doc: dict = {}
    while i < end:
        t = data[i]
        i += 1
        zero = data.index(b"\x00", i)
        name = data[i:zero].decode()
        i = zero + 1
        if t == 0x01:
            (doc[name],) = struct.unpack_from("<d", data, i)
            i += 8
        elif t == 0x02:
            (slen,) = struct.unpack_from("<i", data, i)
            doc[name] = data[i + 4:i + 4 + slen - 1].decode()
            i += 4 + slen
        elif t == 0x03:
            doc[name], i = decode(data, i)
        elif t == 0x04:
            arr, i = decode(data, i)
            doc[name] = [arr[k] for k in sorted(arr, key=int)]
        elif t == 0x05:
            (blen,) = struct.unpack_from("<i", data, i)
            doc[name] = bytes(data[i + 5:i + 5 + blen])
            i += 5 + blen
        elif t == 0x07:
            doc[name] = ObjectId(data[i:i + 12])
            i += 12
        elif t == 0x08:
            doc[name] = data[i] == 1
            i += 1
        elif t == 0x09:
            (ms,) = struct.unpack_from("<q", data, i)
            doc[name] = (_EPOCH + _dt.timedelta(milliseconds=ms)
                         ).replace(tzinfo=None)
            i += 8
        elif t == 0x0A:
            doc[name] = None
        elif t == 0x10:
            (doc[name],) = struct.unpack_from("<i", data, i)
            i += 4
        elif t == 0x11 or t == 0x12:
            (doc[name],) = struct.unpack_from("<q", data, i)
            i += 8
        elif t == 0x13:
            doc[name] = _dec_dec128(data[i:i + 16])
            i += 16
        else:
            raise ValueError(f"bson: unsupported type 0x{t:02x} for {name!r}")
    return doc, end + 1


__all__ = ["encode", "decode", "ObjectId"]
