"""AMQP 0-9-1 wire protocol (stdlib-only) — the RabbitMQ client.

Written from the public spec (rabbitmq.com/resources/specs/
amqp0-9-1.pdf): frame = type(1) channel(2) size(4) payload 0xCE;
method frames carry class-id/method-id + typed arguments; content =
header frame (class, weight, body-size, property flags) + body frames.

Implemented verbs: Connection.Start/StartOk(PLAIN)/Tune/TuneOk/Open,
Channel.Open, Queue.Declare, Basic.Publish, Basic.Get/GetOk/GetEmpty,
Basic.Ack, Connection.Close — what the connector needs for produce
and drain-consume against any RabbitMQ broker.
"""

from __future__ import annotations

import socket
import struct

FRAME_METHOD, FRAME_HEADER, FRAME_BODY = 1, 2, 3
FRAME_END = 0xCE


def _shortstr(s: str) -> bytes:
    b = s.encode()
    return struct.pack("B", len(b)) + b


def _longstr(b: bytes | str) -> bytes:
    if isinstance(b, str):
        b = b.encode()
    return struct.pack(">I", len(b)) + b


def _table(d: dict) -> bytes:
    body = b""
    for k, v in d.items():
        body += _shortstr(k)
        if isinstance(v, bool):
            body += b"t" + struct.pack("B", int(v))
        elif isinstance(v, int):
            body += b"I" + struct.pack(">i", v)
        else:
            body += b"S" + _longstr(str(v))
    return _longstr(body)


def _parse_table(data: bytes, i: int) -> tuple[dict, int]:
    (n,) = struct.unpack_from(">I", data, i)
    i += 4
    end = i + n
    out = {}
    while i < end:
        klen = data[i]
        i += 1
        key = data[i:i + klen].decode()
        i += klen
        t = data[i:i + 1]
        i += 1
        if t == b"t":
            out[key] = bool(data[i])
            i += 1
        elif t == b"I":
            (out[key],) = struct.unpack_from(">i", data, i)
            i += 4
        elif t == b"S":
            (ln,) = struct.unpack_from(">I", data, i)
            i += 4
            out[key] = data[i:i + ln].decode()
            i += ln
        elif t == b"F":
            out[key], i = _parse_table(data, i)
        else:
            raise ValueError(f"amqp table type {t!r} unsupported")
    return out, end


class AmqpConnection:
    def __init__(self, host: str, port: int = 5672, username: str = "guest",
                 password: str = "guest", vhost: str = "/",
                 timeout: float = 30.0):
        from seatunnel_spark.net import apply_host_aliases

        resolved = apply_host_aliases(f"tcp://{host}:{port}")
        hostpart = resolved.split("://", 1)[1]
        host, _, port_s = hostpart.rpartition(":")
        self.sock = socket.create_connection((host, int(port_s)),
                                             timeout=timeout)
        self._buf = b""
        self.sock.sendall(b"AMQP\x00\x00\x09\x01")
        # Connection.Start -> StartOk (PLAIN)
        _ch, cls, mth, args = self.read_method()
        assert (cls, mth) == (10, 10), "expected Connection.Start"
        response = b"\x00" + username.encode() + b"\x00" + password.encode()
        self.send_method(0, 10, 11, _table({"product": "seatunnel-spark"})
                         + _shortstr("PLAIN") + _longstr(response)
                         + _shortstr("en_US"))
        # Tune -> TuneOk -> Open
        _ch, cls, mth, args = self.read_method()
        assert (cls, mth) == (10, 30), "expected Connection.Tune"
        channel_max, frame_max, heartbeat = struct.unpack_from(">HIH", args)
        self.frame_max = frame_max or 131072
        self.send_method(0, 10, 31, struct.pack(">HIH", channel_max,
                                                self.frame_max, 0))
        self.send_method(0, 10, 40, _shortstr(vhost) + _shortstr("")
                         + b"\x00")
        _ch, cls, mth, _ = self.read_method()
        assert (cls, mth) == (10, 41), "expected Connection.OpenOk"
        # Channel.Open
        self.send_method(1, 20, 10, _shortstr(""))
        _ch, cls, mth, _ = self.read_method()
        assert (cls, mth) == (20, 11), "expected Channel.OpenOk"

    # -- framing ----------------------------------------------------------
    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("amqp connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_frame(self) -> tuple[int, int, bytes]:
        t, ch, size = struct.unpack(">BHI", self._read_exact(7))
        payload = self._read_exact(size)
        assert self._read_exact(1)[0] == FRAME_END
        return t, ch, payload

    def send_frame(self, ftype: int, channel: int, payload: bytes) -> None:
        self.sock.sendall(struct.pack(">BHI", ftype, channel, len(payload))
                          + payload + bytes([FRAME_END]))

    def send_method(self, channel: int, cls: int, method: int,
                    args: bytes) -> None:
        self.send_frame(FRAME_METHOD,
                        channel, struct.pack(">HH", cls, method) + args)

    def read_method(self) -> tuple[int, int, int, bytes]:
        while True:
            t, ch, payload = self.read_frame()
            if t == FRAME_METHOD:
                cls, mth = struct.unpack_from(">HH", payload)
                return ch, cls, mth, payload[4:]
            # ignore heartbeats

    # -- operations -------------------------------------------------------
    def queue_declare(self, queue: str, durable: bool = True,
                      exclusive: bool = False,
                      auto_delete: bool = False) -> None:
        bits = (0 | (2 if durable else 0) | (4 if exclusive else 0)
                | (8 if auto_delete else 0))
        self.send_method(1, 50, 10, struct.pack(">H", 0) + _shortstr(queue)
                         + struct.pack("B", bits) + _table({}))
        _ch, cls, mth, _ = self.read_method()
        assert (cls, mth) == (50, 11), "expected Queue.DeclareOk"

    def publish(self, body: bytes, routing_key: str,
                exchange: str = "") -> None:
        self.send_method(1, 60, 40, struct.pack(">H", 0)
                         + _shortstr(exchange) + _shortstr(routing_key)
                         + b"\x00")
        # content header: class 60, weight 0, body size, flags
        # (delivery-mode property, bit 12 of the property flags)
        props = struct.pack(">H", 1 << 12) + struct.pack("B", 2)  # persistent
        self.send_frame(FRAME_HEADER, 1,
                        struct.pack(">HHQ", 60, 0, len(body)) + props)
        cap = self.frame_max - 8
        for i in range(0, len(body), cap):
            self.send_frame(FRAME_BODY, 1, body[i:i + cap])

    def basic_get(self, queue: str) -> bytes | None:
        self.send_method(1, 60, 70, struct.pack(">H", 0) + _shortstr(queue)
                         + b"\x01")  # no-ack
        _ch, cls, mth, args = self.read_method()
        if (cls, mth) == (60, 72):  # GetEmpty
            return None
        assert (cls, mth) == (60, 71), "expected Basic.GetOk"
        t, _ch2, payload = self.read_frame()
        assert t == FRAME_HEADER
        (body_size,) = struct.unpack_from(">Q", payload, 4)
        body = b""
        while len(body) < body_size:
            t, _ch3, chunk = self.read_frame()
            assert t == FRAME_BODY
            body += chunk
        return body

    def close(self) -> None:
        try:
            self.send_method(0, 10, 50, struct.pack(">H", 200)
                             + _shortstr("bye") + struct.pack(">HH", 0, 0))
            self.sock.close()
        except OSError:
            pass


__all__ = ["AmqpConnection", "FRAME_METHOD", "FRAME_HEADER", "FRAME_BODY",
           "FRAME_END", "_shortstr", "_longstr", "_table", "_parse_table"]
