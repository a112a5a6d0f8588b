"""Prometheus sink — remote-write protocol, stdlib-only.

Reference: connector-prometheus sink (key_label / key_timestamp /
key_value / batch_size; POSTs a snappy-compressed protobuf
WriteRequest to the remote-write endpoint).

The two wire layers are implemented from their public specs:
  * protobuf wire format (developers.google.com/protocol-buffers/docs/
    encoding) for prometheus.WriteRequest{timeseries=1[
    TimeSeries{labels=1[Label{name=1,value=2}], samples=2[
    Sample{value=1(double), timestamp=2(int64)}]}]}
  * snappy block format (github.com/google/snappy/format_description
    .txt) — emitted as uncompressed-preamble + literal chunks, which
    every decoder accepts (compression level is a quality knob, not a
    validity requirement).
"""

from __future__ import annotations

import struct
import urllib.request

from pyspark.sql import DataFrame

from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL


# -- protobuf wire helpers -------------------------------------------------

def _pb_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field(num: int, wire: int) -> bytes:
    return _pb_varint((num << 3) | wire)


def _pb_len(num: int, payload: bytes) -> bytes:
    return _pb_field(num, 2) + _pb_varint(len(payload)) + payload


def _pb_label(name: str, value: str) -> bytes:
    return (_pb_len(1, name.encode()) + _pb_len(2, str(value).encode()))


def _pb_sample(value: float, ts_ms: int) -> bytes:
    out = _pb_field(1, 1) + struct.pack("<d", float(value))
    t = ts_ms
    out += _pb_field(2, 0) + _pb_varint(t if t >= 0 else t + (1 << 64))
    return out


def encode_write_request(series: list[tuple[dict, list[tuple[float, int]]]]
                         ) -> bytes:
    """series = [({label: value}, [(value, ts_ms), ...]), ...]"""
    body = b""
    for labels, samples in series:
        ts = b""
        for name in sorted(labels):
            ts += _pb_len(1, _pb_label(name, labels[name]))
        for value, t in samples:
            ts += _pb_len(2, _pb_sample(value, t))
        body += _pb_len(1, ts)
    return body


def snappy_frame(data: bytes) -> bytes:
    """Snappy BLOCK format with literal-only chunks (valid for any
    decoder; trades ratio for zero dependencies)."""
    out = bytearray()
    # preamble: uncompressed length as LE base-128 varint
    n = len(data)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    # literal chunks of <= 60 bytes: tag byte carries the length
    for i in range(0, len(data), 60):
        chunk = data[i:i + 60]
        out.append((len(chunk) - 1) << 2)
        out += chunk
    return bytes(out)


class PrometheusSink(Sink):
    NAME = "Prometheus"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        url = apply_host_aliases(self.require("url"))
        key_label = self.opt("key_label", "labels")
        key_value = self.opt("key_value", "value")
        key_ts = self.opt("key_timestamp")
        batch_size = int(self.opt("batch_size", 1024))
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        def write_partition(rows):
            import time as _time

            buf: list = []

            def flush():
                if not buf:
                    return
                payload = snappy_frame(encode_write_request(list(buf)))
                req = urllib.request.Request(
                    url, data=payload, method="POST",
                    headers={"Content-Type": "application/x-protobuf",
                             "Content-Encoding": "snappy",
                             "X-Prometheus-Remote-Write-Version": "0.1.0"})
                with urllib.request.urlopen(req, timeout=30):
                    pass
                buf.clear()

            for row in rows:
                d = row.asDict(recursive=True)
                for c in meta:
                    d.pop(c, None)
                labels = d.get(key_label) or {}
                if not isinstance(labels, dict):
                    labels = {"__name__": str(labels)}
                value = float(d.get(key_value, 0.0))
                ts = d.get(key_ts) if key_ts else None
                if hasattr(ts, "timestamp"):
                    ts = int(ts.timestamp() * 1000)
                ts = int(ts) if ts is not None else int(_time.time() * 1000)
                buf.append((dict(labels), [(value, ts)]))
                if len(buf) >= batch_size:
                    flush()
            flush()

        df.foreachPartition(write_partition)


__all__ = ["PrometheusSink", "encode_write_request", "snappy_frame"]
