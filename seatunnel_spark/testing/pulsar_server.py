"""In-process mini Pulsar broker speaking the binary protocol subset
used by seatunnel_spark.pulsar_wire — the sandbox analog of the
reference's Testcontainers Pulsar standalone. Single ledger (0) per
topic, entries are list indices; supports partitioned-topic metadata,
producers, non-durable/durable exclusive subscriptions, FLOW-paced
MESSAGE pushes, GET_LAST_MESSAGE_ID, cumulative ACK cursors."""

from __future__ import annotations

import socket
import struct
import threading

from seatunnel_spark import pb
from seatunnel_spark import pulsar_wire as pw


class MiniPulsar:
    def __init__(self, partitioned: dict[str, int] | None = None):
        # topic -> list[(metadata_pb, payload_bytes)]
        self.topics: dict[str, list[tuple[bytes, bytes]]] = {}
        self.cursors: dict[tuple[str, str], int] = {}  # durable acked entry
        self.partitioned = dict(partitioned or {})
        self.lock = threading.Lock()

    def log(self, topic: str) -> list[tuple[bytes, bytes]]:
        return self.topics.setdefault(topic, [])


def _recv_exact(conn: socket.socket, buf: bytearray, n: int) -> bytes:
    while len(buf) < n:
        chunk = conn.recv(65536)
        if not chunk:
            raise ConnectionError
        buf += chunk
    out = bytes(buf[:n])
    del buf[:n]
    return out


def _handle(conn: socket.socket, broker: MiniPulsar) -> None:
    buf = bytearray()
    consumers: dict[int, dict] = {}
    producers: dict[int, str] = {}

    def push_messages(cid: int) -> None:
        st = consumers[cid]
        log = broker.log(st["topic"])
        while st["pos"] < len(log) and st["permits"] > 0:
            meta, payload = log[st["pos"]]
            mid = pb.fvar(1, 0) + pb.fvar(2, st["pos"])
            conn.sendall(pw.frame(
                pw.MESSAGE, pb.fvar(1, cid) + pb.fbytes(2, mid),
                payload=(meta, payload)))
            st["pos"] += 1
            st["permits"] -= 1

    try:
        while True:
            (total,) = struct.unpack(">i", _recv_exact(conn, buf, 4))
            data = _recv_exact(conn, buf, total)
            ctype, sub, rest, _ = pw.parse_frame(data)
            if ctype == pw.CONNECT:
                conn.sendall(pw.frame(pw.CONNECTED, pb.fstr(1, "mini-pulsar")
                                      + pb.fvar(2, pw.PROTOCOL_VERSION)))
            elif ctype == pw.PING:
                conn.sendall(pw.frame(pw.PONG, b""))
            elif ctype == pw.PARTITIONED_METADATA:
                topic = pb.first_str(sub, 1, "")
                n = broker.partitioned.get(topic.split("/")[-1],
                                           broker.partitioned.get(topic, 0))
                conn.sendall(pw.frame(
                    pw.PARTITIONED_METADATA_RESPONSE,
                    pb.fvar(1, n) + pb.fvar(2, pb.first(sub, 2, 0))
                    + pb.fvar(3, 0)))
            elif ctype == pw.PRODUCER:
                pid = pb.first(sub, 2, 0)
                producers[pid] = pb.first_str(sub, 1, "")
                conn.sendall(pw.frame(
                    pw.PRODUCER_SUCCESS,
                    pb.fvar(1, pb.first(sub, 3, 0))
                    + pb.fstr(2, f"mini-producer-{pid}")))
            elif ctype == pw.SEND:
                pid, seq = pb.first(sub, 1, 0), pb.first(sub, 2, 0)
                meta, payload = pw.split_payload(rest or b"")
                with broker.lock:
                    log = broker.log(producers.get(pid, "?"))
                    log.append((meta, payload))
                    entry = len(log) - 1
                conn.sendall(pw.frame(
                    pw.SEND_RECEIPT, pb.fvar(1, pid) + pb.fvar(2, seq)
                    + pb.fbytes(3, pb.fvar(1, 0) + pb.fvar(2, entry))))
            elif ctype == pw.SUBSCRIBE:
                topic = pb.first_str(sub, 1, "")
                name = pb.first_str(sub, 2, "")
                cid = pb.first(sub, 4, 0)
                durable = bool(pb.first(sub, 8, 1))
                start = pb.first(sub, 9)
                earliest = pb.first(sub, 13, 0) == 1
                if start is not None:
                    mid = pb.decode(start)
                    pos = pb.first(mid, 2, 0) + 1  # resume after
                elif durable and (topic, name) in broker.cursors:
                    pos = broker.cursors[(topic, name)] + 1
                elif earliest:
                    pos = 0
                else:
                    pos = len(broker.log(topic))
                consumers[cid] = {"topic": topic, "sub": name, "pos": pos,
                                  "permits": 0, "durable": durable}
                conn.sendall(pw.frame(pw.SUCCESS,
                                      pb.fvar(1, pb.first(sub, 5, 0))))
            elif ctype == pw.FLOW:
                cid = pb.first(sub, 1, 0)
                consumers[cid]["permits"] += pb.first(sub, 2, 0)
                push_messages(cid)
            elif ctype == pw.GET_LAST_MESSAGE_ID:
                cid = pb.first(sub, 1, 0)
                n = len(broker.log(consumers[cid]["topic"]))
                entry = n - 1 if n else (1 << 64) - 1  # -1 as uint64
                conn.sendall(pw.frame(
                    pw.GET_LAST_MESSAGE_ID_RESPONSE,
                    pb.fbytes(1, pb.fvar(1, 0) + pb.fvar(2, entry))
                    + pb.fvar(2, pb.first(sub, 2, 0))))
            elif ctype == pw.ACK:
                cid = pb.first(sub, 1, 0)
                st = consumers.get(cid)
                mid = pb.decode(pb.first(sub, 3, b""))
                if st and st["durable"]:
                    key = (st["topic"], st["sub"])
                    broker.cursors[key] = max(
                        broker.cursors.get(key, -1), pb.first(mid, 2, 0))
            elif ctype == pw.SEEK:
                cid = pb.first(sub, 1, 0)
                mid = pb.decode(pb.first(sub, 3, b""))
                consumers[cid]["pos"] = pb.first(mid, 2, 0)
                conn.sendall(pw.frame(pw.SUCCESS,
                                      pb.fvar(1, pb.first(sub, 2, 0))))
            elif ctype in (pw.CLOSE_PRODUCER, pw.CLOSE_CONSUMER):
                conn.sendall(pw.frame(pw.SUCCESS,
                                      pb.fvar(1, pb.first(sub, 2, 0))))
            elif ctype == pw.LOOKUP:
                conn.sendall(pw.frame(
                    pw.LOOKUP_RESPONSE,
                    pb.fvar(3, 1) + pb.fvar(4, pb.first(sub, 2, 0))))
    except (ConnectionError, OSError, struct.error):
        pass
    finally:
        try:
            conn.close()
        except OSError:
            pass


def start_mini_pulsar(partitioned: dict[str, int] | None = None,
                      port: int = 0):
    broker = MiniPulsar(partitioned)
    srv = socket.create_server(("127.0.0.1", port))
    srv.settimeout(0.5)
    stopping = threading.Event()

    def accept_loop():
        while not stopping.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=_handle, args=(conn, broker),
                             daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()

    def stop():
        stopping.set()
        try:
            srv.close()
        except OSError:
            pass

    return broker, srv.getsockname()[1], stop


__all__ = ["MiniPulsar", "start_mini_pulsar"]
