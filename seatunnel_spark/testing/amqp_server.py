"""Mini RabbitMQ — an in-process AMQP 0-9-1 broker for the verbs the
connector uses (Connection/Channel negotiation, Queue.Declare,
Basic.Publish with content frames, Basic.Get). Routing: default
exchange ("") routes by queue name; named exchanges route to the queue
bound by routing key (declared queues auto-bind their own name)."""

from __future__ import annotations

import socket
import struct
import threading

from seatunnel_spark.amqp import (
    FRAME_BODY,
    FRAME_END,
    FRAME_HEADER,
    FRAME_METHOD,
    _longstr,
    _shortstr,
    _table,
)


class MiniAmqp:
    def __init__(self):
        self.queues: dict[str, list[bytes]] = {}
        self.lock = threading.RLock()


def start_mini_amqp(port: int = 0, host: str = "127.0.0.1"):
    broker = MiniAmqp()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(32)
    stop_flag = threading.Event()

    def handle(conn):
        buf = b""

        def read_exact(n):
            nonlocal buf
            while len(buf) < n:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            out, rest = buf[:n], buf[n:]
            buf = rest
            return out

        def read_frame():
            t, ch, size = struct.unpack(">BHI", read_exact(7))
            payload = read_exact(size)
            assert read_exact(1)[0] == FRAME_END
            return t, ch, payload

        def send_frame(ftype, channel, payload):
            conn.sendall(struct.pack(">BHI", ftype, channel, len(payload))
                         + payload + bytes([FRAME_END]))

        def send_method(channel, cls, mth, args):
            send_frame(FRAME_METHOD, channel,
                       struct.pack(">HH", cls, mth) + args)

        try:
            assert read_exact(8) == b"AMQP\x00\x00\x09\x01"
            send_method(0, 10, 10, struct.pack("BB", 0, 9)
                        + _table({}) + _longstr(b"PLAIN")
                        + _longstr(b"en_US"))
            pending_body = None
            while not stop_flag.is_set():
                t, ch, payload = read_frame()
                if t == FRAME_METHOD:
                    cls, mth = struct.unpack_from(">HH", payload)
                    args = payload[4:]
                    if (cls, mth) == (10, 11):      # StartOk
                        send_method(0, 10, 30,
                                    struct.pack(">HIH", 0, 131072, 0))
                    elif (cls, mth) == (10, 31):    # TuneOk
                        pass
                    elif (cls, mth) == (10, 40):    # Open
                        send_method(0, 10, 41, _shortstr(""))
                    elif (cls, mth) == (10, 50):    # Close
                        send_method(0, 10, 51, b"")
                        return
                    elif (cls, mth) == (20, 10):    # Channel.Open
                        send_method(ch, 20, 11, struct.pack(">I", 0))
                    elif (cls, mth) == (50, 10):    # Queue.Declare
                        qlen = args[2]
                        queue = args[3:3 + qlen].decode()
                        with broker.lock:
                            broker.queues.setdefault(queue, [])
                        send_method(ch, 50, 11, _shortstr(queue)
                                    + struct.pack(">II", 0, 0))
                    elif (cls, mth) == (60, 40):    # Basic.Publish
                        i = 2
                        elen = args[i]
                        i += 1 + elen
                        rlen = args[i]
                        rkey = args[i + 1:i + 1 + rlen].decode()
                        pending_body = {"queue": rkey, "chunks": b"",
                                        "size": None}
                    elif (cls, mth) == (60, 70):    # Basic.Get
                        qlen = args[2]
                        queue = args[3:3 + qlen].decode()
                        with broker.lock:
                            msgs = broker.queues.get(queue, [])
                            body = msgs.pop(0) if msgs else None
                        if body is None:
                            send_method(ch, 60, 72, _shortstr(""))
                        else:
                            send_method(ch, 60, 71,
                                        struct.pack(">QB", 1, 0)
                                        + _shortstr("") + _shortstr(queue)
                                        + struct.pack(">I", 0))
                            send_frame(FRAME_HEADER, ch,
                                       struct.pack(">HHQ", 60, 0,
                                                   len(body))
                                       + struct.pack(">H", 0))
                            send_frame(FRAME_BODY, ch, body)
                elif t == FRAME_HEADER and pending_body is not None:
                    (size,) = struct.unpack_from(">Q", payload, 4)
                    pending_body["size"] = size
                    if size == 0:
                        with broker.lock:
                            broker.queues.setdefault(
                                pending_body["queue"], []).append(b"")
                        pending_body = None
                elif t == FRAME_BODY and pending_body is not None:
                    pending_body["chunks"] += payload
                    if len(pending_body["chunks"]) >= pending_body["size"]:
                        with broker.lock:
                            broker.queues.setdefault(
                                pending_body["queue"], []).append(
                                pending_body["chunks"])
                        pending_body = None
        except (ConnectionError, AssertionError, OSError, struct.error):
            pass
        finally:
            conn.close()

    def accept_loop():
        while not stop_flag.is_set():
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            threading.Thread(target=handle, args=(conn,), daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()

    def shutdown():
        stop_flag.set()
        srv.close()

    return broker, srv.getsockname()[1], shutdown


__all__ = ["MiniAmqp", "start_mini_amqp"]
