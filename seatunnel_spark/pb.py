"""Minimal protobuf wire-format codec (stdlib only).

Several reference connectors speak protobuf-framed protocols (Pulsar
binary protocol, Aliyun SLS LogGroup, Prometheus remote-write). This
module implements just the wire format — varints, tags, length-delimited
fields — from the public protobuf encoding spec, so those protocols can
be encoded/decoded without a generated stub or the protobuf runtime.

Messages are built by concatenating field encoders and decoded into a
`{field_number: [raw values]}` dict: varint fields decode to int, fixed32/
fixed64 to int, length-delimited to bytes (caller re-decodes nested
messages/strings as its schema dictates). This mirrors how the reference
ships generated PulsarApi/Logs.proto classes — we keep the schema
knowledge in the protocol client instead.
"""

from __future__ import annotations

import struct


def varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(data: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = data[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def tag(num: int, wire: int) -> bytes:
    return varint((num << 3) | wire)


def fvar(num: int, n: int) -> bytes:
    """Varint-typed field (int32/int64/uint64/bool/enum)."""
    return tag(num, 0) + varint(int(n))


def fbytes(num: int, payload: bytes) -> bytes:
    """Length-delimited field (bytes / string / nested message)."""
    return tag(num, 2) + varint(len(payload)) + payload


def fstr(num: int, s: str) -> bytes:
    return fbytes(num, str(s).encode())


def f64(num: int, v: float) -> bytes:
    return tag(num, 1) + struct.pack("<d", float(v))


def f32f(num: int, v: float) -> bytes:
    return tag(num, 5) + struct.pack("<f", float(v))


def decode(data: bytes) -> dict[int, list]:
    """Decode one message level: field number -> list of raw values."""
    out: dict[int, list] = {}
    i = 0
    n = len(data)
    while i < n:
        key, i = read_varint(data, i)
        num, wire = key >> 3, key & 7
        if wire == 0:
            val, i = read_varint(data, i)
        elif wire == 1:
            val = struct.unpack_from("<Q", data, i)[0]
            i += 8
        elif wire == 2:
            ln, i = read_varint(data, i)
            val = data[i:i + ln]
            i += ln
        elif wire == 5:
            val = struct.unpack_from("<I", data, i)[0]
            i += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        out.setdefault(num, []).append(val)
    return out


def first(msg: dict[int, list], num: int, default=None):
    vals = msg.get(num)
    return vals[0] if vals else default


def first_str(msg: dict[int, list], num: int, default: str | None = None):
    v = first(msg, num)
    return v.decode() if isinstance(v, (bytes, bytearray)) else default


__all__ = ["varint", "read_varint", "tag", "fvar", "fbytes", "fstr",
           "f64", "f32f", "decode", "first", "first_str"]
