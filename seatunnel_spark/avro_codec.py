"""Stdlib Avro binary codec — datum encode/decode driven by a Spark
schema, for environments without the spark-avro jar.

Implements the Avro binary encoding from the public specification
(long/int as zigzag varints, float/double little-endian IEEE,
string/bytes length-prefixed, arrays/maps as blocked sequences with a
zero terminator, unions as a zigzag branch index + value) over the
schema shape the reference's seatunnel-format-avro generates from a
row type: a record whose every field is the union ["null", <type>]
(AvroSchemaConverter semantics), with the standard logical types —
date as int days, timestamp-micros as long, decimal as
scale-preserving big-endian two's-complement bytes.

The JVM path (from_avro/to_avro) remains preferred when the jar is on
the classpath; this codec is the Python fallback wired through
mapInPandas, so `format = avro` confs run in either environment.
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal

from pyspark.sql import types as T

_EPOCH = date(1970, 1, 1)


def zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(data: bytes, i: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = data[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return (val >> 1) ^ -(val & 1), i
        shift += 7


def _enc_bytes(b: bytes) -> bytes:
    return zigzag_encode(len(b)) + b


def _dec_bytes(data: bytes, i: int) -> tuple[bytes, int]:
    ln, i = zigzag_decode(data, i)
    return data[i:i + ln], i + ln


def encode_value(dt: T.DataType, v) -> bytes:
    """Encode one non-null value of the given Spark type."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return zigzag_encode(int(v))
    if isinstance(dt, T.BooleanType):
        return b"\x01" if v else b"\x00"
    if isinstance(dt, T.FloatType):
        return struct.pack("<f", float(v))
    if isinstance(dt, T.DoubleType):
        return struct.pack("<d", float(v))
    if isinstance(dt, T.StringType):
        return _enc_bytes(str(v).encode())
    if isinstance(dt, T.BinaryType):
        return _enc_bytes(bytes(v))
    if isinstance(dt, T.DateType):
        d = v if isinstance(v, date) else date.fromisoformat(str(v))
        return zigzag_encode((d - _EPOCH).days)
    if isinstance(dt, T.TimestampType):
        if isinstance(v, datetime):
            ts = v if v.tzinfo else v.replace(tzinfo=timezone.utc)
            # exact integer micros — float seconds lose precision past
            # ~2^53 µs and wobble the last microsecond everywhere
            delta = ts - datetime(1970, 1, 1, tzinfo=timezone.utc)
            return zigzag_encode(delta // timedelta(microseconds=1))
        return zigzag_encode(int(v))
    if isinstance(dt, T.DecimalType):
        unscaled = int(Decimal(v).scaleb(dt.scale).to_integral_value())
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        return _enc_bytes(unscaled.to_bytes(nbytes, "big", signed=True))
    if isinstance(dt, T.ArrayType):
        items = list(v)
        out = b""
        if items:
            out += zigzag_encode(len(items))
            for x in items:
                out += encode_union(dt.elementType, x)
        return out + zigzag_encode(0)
    if isinstance(dt, T.MapType):
        entries = dict(v)
        out = b""
        if entries:
            out += zigzag_encode(len(entries))
            for k, x in entries.items():
                out += _enc_bytes(str(k).encode())
                out += encode_union(dt.valueType, x)
        return out + zigzag_encode(0)
    if isinstance(dt, T.StructType):
        return encode_record(dt, v)
    raise ValueError(f"avro codec: unsupported type {dt.simpleString()}")


def encode_union(dt: T.DataType, v) -> bytes:
    """["null", T] union: branch 0 = null, branch 1 = value."""
    if v is None:
        return zigzag_encode(0)
    return zigzag_encode(1) + encode_value(dt, v)


def encode_record(schema: T.StructType, row) -> bytes:
    out = b""
    for f in schema.fields:
        v = row.get(f.name) if isinstance(row, dict) else row[f.name]
        out += encode_union(f.dataType, v)
    return out


def decode_value(dt: T.DataType, data: bytes, i: int):
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        n, i = zigzag_decode(data, i)
        return n, i
    if isinstance(dt, T.BooleanType):
        return data[i] == 1, i + 1
    if isinstance(dt, T.FloatType):
        return struct.unpack_from("<f", data, i)[0], i + 4
    if isinstance(dt, T.DoubleType):
        return struct.unpack_from("<d", data, i)[0], i + 8
    if isinstance(dt, T.StringType):
        b, i = _dec_bytes(data, i)
        return b.decode(), i
    if isinstance(dt, T.BinaryType):
        b, i = _dec_bytes(data, i)
        return bytes(b), i
    if isinstance(dt, T.DateType):
        days, i = zigzag_decode(data, i)
        return date.fromordinal(_EPOCH.toordinal() + days), i
    if isinstance(dt, T.TimestampType):
        us, i = zigzag_decode(data, i)
        return (datetime(1970, 1, 1)
                + timedelta(microseconds=us)), i
    if isinstance(dt, T.DecimalType):
        b, i = _dec_bytes(data, i)
        unscaled = int.from_bytes(b, "big", signed=True)
        return Decimal(unscaled).scaleb(-dt.scale), i
    if isinstance(dt, T.ArrayType):
        out = []
        while True:
            n, i = zigzag_decode(data, i)
            if n == 0:
                return out, i
            if n < 0:  # block with byte size prefix
                _, i = zigzag_decode(data, i)
                n = -n
            for _ in range(n):
                v, i = decode_union(dt.elementType, data, i)
                out.append(v)
    if isinstance(dt, T.MapType):
        out = {}
        while True:
            n, i = zigzag_decode(data, i)
            if n == 0:
                return out, i
            if n < 0:
                _, i = zigzag_decode(data, i)
                n = -n
            for _ in range(n):
                kb, i = _dec_bytes(data, i)
                v, i = decode_union(dt.valueType, data, i)
                out[kb.decode()] = v
    if isinstance(dt, T.StructType):
        return decode_record(dt, data, i)
    raise ValueError(f"avro codec: unsupported type {dt.simpleString()}")


def decode_union(dt: T.DataType, data: bytes, i: int):
    branch, i = zigzag_decode(data, i)
    if branch == 0:
        return None, i
    return decode_value(dt, data, i)


def decode_record(schema: T.StructType, data: bytes, i: int = 0):
    out = {}
    for f in schema.fields:
        out[f.name], i = decode_union(f.dataType, data, i)
    return out, i


def encode_row(schema: T.StructType, row) -> bytes:
    """Row (Row/dict) -> Avro datum bytes."""
    d = row.asDict(recursive=True) if hasattr(row, "asDict") else dict(row)
    return encode_record(schema, d)


def decode_row(schema: T.StructType, data: bytes) -> dict:
    out, _ = decode_record(schema, data, 0)
    return out


__all__ = ["encode_row", "decode_row", "encode_record", "decode_record",
           "encode_union", "decode_union", "zigzag_encode", "zigzag_decode"]
