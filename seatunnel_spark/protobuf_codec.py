"""Minimal proto3 dynamic codec — parse an inline .proto source and
encode/decode datums without protoc or the protobuf runtime.

The reference's seatunnel-format-protobuf compiles the conf's inline
`protobuf_schema` at runtime (CompileDescriptor.java); here a small
parser extracts message/field layouts (scalars, nested messages,
repeated fields, map<k,v>) and the wire work rides the shared
encoding helpers (seatunnel_spark/pb.py — varints, tags,
length-delimited fields), per the public protobuf encoding spec:
maps are repeated embedded messages {1: key, 2: value}, proto3
default values are omitted on encode and materialized on decode.

Supported surface: proto3 scalars (int32/int64/uint32/uint64/sint32/
sint64/bool/float/double/string/bytes), nested message types, repeated
fields, maps. Enough for the reference's protobuf e2e suite; extend
field-by-field if a conf needs more.
"""

from __future__ import annotations

import re
import struct

from seatunnel_spark import pb

_SCALARS = {"int32", "int64", "uint32", "uint64", "sint32", "sint64",
            "bool", "float", "double", "string", "bytes"}


class ProtoField:
    __slots__ = ("name", "ftype", "number", "repeated", "map_kv")

    def __init__(self, name, ftype, number, repeated=False, map_kv=None):
        self.name, self.ftype, self.number = name, ftype, int(number)
        self.repeated, self.map_kv = repeated, map_kv


def parse_proto(src: str) -> dict[str, list[ProtoField]]:
    """proto3 source -> {message_name: [ProtoField]} (nested messages
    registered under their simple name)."""
    src = re.sub(r"//[^\n]*", "", src)
    messages: dict[str, list[ProtoField]] = {}

    def parse_block(body: str, name: str) -> None:
        fields: list[ProtoField] = []
        i = 0
        while i < len(body):
            m = re.match(r"\s*message\s+(\w+)\s*\{", body[i:])
            if m:
                # find the matching close brace
                depth, j = 1, i + m.end()
                while depth and j < len(body):
                    if body[j] == "{":
                        depth += 1
                    elif body[j] == "}":
                        depth -= 1
                    j += 1
                parse_block(body[i + m.end():j - 1], m.group(1))
                i = j
                continue
            m = re.match(
                r"\s*(repeated\s+)?map\s*<\s*(\w+)\s*,\s*(\w+)\s*>\s*"
                r"(\w+)\s*=\s*(\d+)\s*;", body[i:])
            if m:
                fields.append(ProtoField(m.group(4), "map", m.group(5),
                                         map_kv=(m.group(2), m.group(3))))
                i += m.end()
                continue
            m = re.match(r"\s*(repeated\s+)?([\w.]+)\s+(\w+)\s*=\s*(\d+)"
                         r"\s*;", body[i:])
            if m:
                fields.append(ProtoField(m.group(3), m.group(2).split(".")[-1],
                                         m.group(4), bool(m.group(1))))
                i += m.end()
                continue
            i += 1
        messages[name] = fields

    # parse every message block (nested ones re-register harmlessly)
    for m in re.finditer(r"message\s+(\w+)\s*\{", src):
        depth, j = 1, m.end()
        while depth and j < len(src):
            if src[j] == "{":
                depth += 1
            elif src[j] == "}":
                depth -= 1
            j += 1
        parse_block(src[m.end():j - 1], m.group(1))
    return messages


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _enc_scalar(ftype: str, num: int, v) -> bytes:
    if ftype in ("int32", "int64", "uint32", "uint64"):
        return pb.fvar(num, int(v))
    if ftype in ("sint32", "sint64"):
        return pb.fvar(num, _zigzag(int(v)))
    if ftype == "bool":
        return pb.fvar(num, 1 if v else 0)
    if ftype == "float":
        return pb.f32f(num, float(v))
    if ftype == "double":
        return pb.f64(num, float(v))
    if ftype == "string":
        return pb.fstr(num, str(v))
    if ftype == "bytes":
        return pb.fbytes(num, bytes(v))
    raise ValueError(f"proto codec: unknown scalar {ftype}")


def lenient_get(datum: dict, name: str):
    """Field lookup tolerant of case differences between the Spark
    schema and the proto (the reference e2e conf declares `Address`
    against proto field `address`)."""
    if name in datum:
        return datum[name]
    low = name.lower()
    for k, v in datum.items():
        if k.lower() == low:
            return v
    return None


def encode_message(messages: dict, msg_name: str, datum: dict) -> bytes:
    out = b""
    for f in messages[msg_name]:
        v = lenient_get(datum, f.name) if isinstance(datum, dict) \
            else datum[f.name]
        if v is None:
            continue
        if f.map_kv:
            kt, vt = f.map_kv
            for k, x in dict(v).items():
                ev = (pb.fbytes(2, encode_message(messages, vt, x))
                      if vt in messages else _enc_scalar(vt, 2, x))
                out += pb.fbytes(f.number, _enc_scalar(kt, 1, k) + ev)
            continue
        items = list(v) if f.repeated else [v]
        if (f.repeated and items and f.ftype not in messages
                and f.ftype not in ("string", "bytes")):
            # proto3 packs repeated numeric scalars into ONE
            # length-delimited blob by default — emit the same form
            # real producers do (the decoder accepts both)
            out += pb.fbytes(f.number, b"".join(
                _packed_payload(f.ftype, x) for x in items))
            continue
        for x in items:
            if f.ftype in messages:
                out += pb.fbytes(f.number,
                                 encode_message(messages, f.ftype, x))
            else:
                out += _enc_scalar(f.ftype, f.number, x)
    return out


def _packed_payload(ftype: str, v) -> bytes:
    if ftype in ("int32", "int64", "uint32", "uint64"):
        return pb.varint(int(v))
    if ftype in ("sint32", "sint64"):
        return pb.varint(_zigzag(int(v)))
    if ftype == "bool":
        return pb.varint(1 if v else 0)
    if ftype == "float":
        return struct.pack("<f", float(v))
    if ftype == "double":
        return struct.pack("<d", float(v))
    raise ValueError(f"proto codec: unknown packed scalar {ftype}")


def _dec_scalar(ftype: str, raw):
    if ftype in ("int32", "int64", "uint32", "uint64"):
        n = int(raw)
        # int32/int64 are two's complement over 64 bits on the wire
        if ftype.startswith("int") and n >= 1 << 63:
            n -= 1 << 64
        return n
    if ftype in ("sint32", "sint64"):
        return _unzigzag(int(raw))
    if ftype == "bool":
        return bool(raw)
    if ftype == "float":
        return struct.unpack("<f", struct.pack("<I", raw))[0] \
            if isinstance(raw, int) else float(raw)
    if ftype == "double":
        return struct.unpack("<d", struct.pack("<Q", raw))[0] \
            if isinstance(raw, int) else float(raw)
    if ftype == "string":
        return raw.decode() if isinstance(raw, (bytes, bytearray)) else str(raw)
    if ftype == "bytes":
        return bytes(raw)
    raise ValueError(f"proto codec: unknown scalar {ftype}")


_PACKED_FIXED = {"float": ("<I", 4), "double": ("<Q", 8)}


def _unpack_packed(ftype: str, blob: bytes) -> list:
    """proto3 encodes repeated numeric scalars PACKED by default: one
    length-delimited blob of concatenated varints / fixed-width values.
    Real producers emit this form; return the raw wire ints that
    _dec_scalar expects (float/double as their unsigned bit patterns).
    """
    out: list = []
    if ftype in _PACKED_FIXED:
        fmtc, width = _PACKED_FIXED[ftype]
        for off in range(0, len(blob), width):
            out.append(struct.unpack_from(fmtc, blob, off)[0])
        return out
    i = 0
    while i < len(blob):
        v, i = pb.read_varint(blob, i)
        out.append(v)
    return out


def decode_message(messages: dict, msg_name: str, data: bytes) -> dict:
    raw = pb.decode(data)
    out: dict = {}
    for f in messages[msg_name]:
        vals = raw.get(f.number, [])
        if f.map_kv:
            kt, vt = f.map_kv
            d = {}
            for entry in vals:
                em = pb.decode(entry)
                k = _dec_scalar(kt, pb.first(em, 1, b"" if kt == "string" else 0))
                xv = pb.first(em, 2, None)
                d[k] = (decode_message(messages, vt, xv) if vt in messages
                        else _dec_scalar(vt, xv if xv is not None else 0))
            out[f.name] = d
        elif f.repeated:
            if f.ftype in messages:
                out[f.name] = [decode_message(messages, f.ftype, x)
                               for x in vals]
            elif f.ftype in ("string", "bytes"):
                out[f.name] = [_dec_scalar(f.ftype, x) for x in vals]
            else:
                # numeric scalar: each wire value is either one unpacked
                # element (int) or a PACKED blob (bytes, the proto3
                # default from real producers) — flatten both forms
                flat: list = []
                for x in vals:
                    if isinstance(x, (bytes, bytearray)):
                        flat.extend(_unpack_packed(f.ftype, bytes(x)))
                    else:
                        flat.append(x)
                out[f.name] = [_dec_scalar(f.ftype, x) for x in flat]
        else:
            if not vals:
                out[f.name] = (decode_message(messages, f.ftype, b"")
                               if f.ftype in messages else
                               _dec_scalar(f.ftype,
                                           b"" if f.ftype in ("string",)
                                           else b"" if f.ftype == "bytes"
                                           else 0))
            else:
                x = vals[-1]
                out[f.name] = (decode_message(messages, f.ftype, x)
                               if f.ftype in messages
                               else _dec_scalar(f.ftype, x))
    return out


__all__ = ["parse_proto", "encode_message", "decode_message",
           "lenient_get", "ProtoField"]
