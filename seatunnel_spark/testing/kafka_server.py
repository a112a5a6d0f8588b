"""Mini Kafka broker — in-process TCP server speaking the wire APIs
the client uses (ApiVersions v0, Metadata v1, Produce v3, Fetch v4,
ListOffsets v1) with magic-2 record batches stored per
(topic, partition) log. Auto-creates topics with `num_partitions`
(default 1). The sandbox stand-in for a Testcontainers Kafka fixture."""

from __future__ import annotations

import socket
import struct
import threading

from seatunnel_spark.kafka_wire import (
    dec_bytes,
    dec_str,
    decode_record_batches,
    enc_bytes,
    enc_str,
    encode_record_batch,
)


class MiniKafka:
    def __init__(self, num_partitions: int = 2):
        self.num_partitions = num_partitions
        # (topic, partition) -> list[(key, value)]
        self.logs: dict[tuple[str, int], list] = {}
        self.lock = threading.RLock()
        self.host = "127.0.0.1"
        self.port = 0

    def topic_partitions(self, topic: str) -> list[int]:
        with self.lock:
            parts = sorted(p for (t, p) in self.logs if t == topic)
            return parts or list(range(self.num_partitions))

    def append(self, topic: str, partition: int, records) -> int:
        with self.lock:
            log = self.logs.setdefault((topic, partition), [])
            base = len(log)
            log.extend(records)
            return base

    def read_all(self, topic: str) -> list[tuple]:
        """Test helper: every (partition, offset, key, value)."""
        with self.lock:
            out = []
            for (t, p), log in sorted(self.logs.items()):
                if t == topic:
                    out += [(p, i, k, v) for i, (k, v) in enumerate(log)]
            return out

    def seed(self, topic: str, values: list, partition: int = 0):
        recs = [(None, v.encode() if isinstance(v, str) else v)
                for v in values]
        self.append(topic, partition, recs)

    # -- request handling -------------------------------------------------
    def handle_request(self, api: int, version: int, body: bytes) -> bytes:
        if api == 18:  # ApiVersions
            entries = [(0, 0, 3), (1, 0, 4), (2, 0, 1), (3, 0, 1), (18, 0, 0)]
            return (struct.pack(">h", 0) + struct.pack(">i", len(entries))
                    + b"".join(struct.pack(">hhh", *e) for e in entries))
        if api == 3:  # Metadata v1
            i = 0
            (n,) = struct.unpack_from(">i", body, i)
            i += 4
            topics = []
            if n == -1:
                with self.lock:
                    topics = sorted({t for (t, _) in self.logs})
            else:
                for _ in range(n):
                    t, i = dec_str(body, i)
                    topics.append(t)
            out = struct.pack(">i", 1)  # one broker
            out += struct.pack(">i", 0) + enc_str(self.host) \
                + struct.pack(">i", self.port) + enc_str(None)
            out += struct.pack(">i", 0)  # controller id
            out += struct.pack(">i", len(topics))
            for t in topics:
                parts = self.topic_partitions(t)
                for p in parts:  # auto-create
                    self.logs.setdefault((t, p), [])
                out += struct.pack(">h", 0) + enc_str(t) + b"\x00"
                out += struct.pack(">i", len(parts))
                for p in parts:
                    out += struct.pack(">hii", 0, p, 0)
                    out += struct.pack(">ii", 1, 0)   # replicas [0]
                    out += struct.pack(">ii", 1, 0)   # isr [0]
            return out
        if api == 0:  # Produce v3
            i = 0
            _txn, i = dec_str(body, i)
            _acks, _timeout = struct.unpack_from(">hi", body, i)
            i += 6
            (n_topics,) = struct.unpack_from(">i", body, i)
            i += 4
            resp_topics = b""
            for _ in range(n_topics):
                topic, i = dec_str(body, i)
                (n_parts,) = struct.unpack_from(">i", body, i)
                i += 4
                part_resp = b""
                for _ in range(n_parts):
                    (pid,) = struct.unpack_from(">i", body, i)
                    i += 4
                    recs, i = dec_bytes(body, i)
                    records = [(k, v) for _, k, v in
                               decode_record_batches(recs or b"")]
                    base = self.append(topic, pid, records)
                    part_resp += struct.pack(">ihqq", pid, 0, base, -1)
                resp_topics += (enc_str(topic) + struct.pack(">i", n_parts)
                                + part_resp)
            return (struct.pack(">i", n_topics) + resp_topics
                    + struct.pack(">i", 0))  # throttle
        if api == 2:  # ListOffsets v1
            i = 4  # replica id
            (n_topics,) = struct.unpack_from(">i", body, i)
            i += 4
            out = struct.pack(">i", n_topics)
            for _ in range(n_topics):
                topic, i = dec_str(body, i)
                (n_parts,) = struct.unpack_from(">i", body, i)
                i += 4
                out += enc_str(topic) + struct.pack(">i", n_parts)
                for _ in range(n_parts):
                    pid, ts = struct.unpack_from(">iq", body, i)
                    i += 12
                    log = self.logs.get((topic, pid), [])
                    # -2 earliest, -1 latest; a real broker indexes by
                    # record time for ts >= 0 — the mini has no time
                    # index and everything it holds was appended "now",
                    # so any historical ts resolves to the log start
                    off = len(log) if ts == -1 else 0
                    out += struct.pack(">ihqq", pid, 0, -1, off)
            return out
        if api == 1:  # Fetch v4
            i = 4 + 4 + 4 + 4 + 1  # replica, max_wait, min_bytes, max_bytes, isolation
            (n_topics,) = struct.unpack_from(">i", body, i)
            i += 4
            out = struct.pack(">i", 0)  # throttle
            out += struct.pack(">i", n_topics)
            for _ in range(n_topics):
                topic, i = dec_str(body, i)
                (n_parts,) = struct.unpack_from(">i", body, i)
                i += 4
                out += enc_str(topic) + struct.pack(">i", n_parts)
                for _ in range(n_parts):
                    pid, off, _maxb = struct.unpack_from(">iqi", body, i)
                    i += 16
                    log = self.logs.get((topic, pid), [])
                    hw = len(log)
                    chunk = log[off:off + 500]
                    if chunk:
                        batch = encode_record_batch(off, chunk)
                    else:
                        batch = b""
                    out += struct.pack(">ihq", pid, 0, hw)
                    out += struct.pack(">q", hw)      # last stable offset
                    out += struct.pack(">i", 0)       # aborted txns
                    out += enc_bytes(batch)
            return out
        raise ValueError(f"mini-kafka: unsupported api {api}")


def start_mini_kafka(port: int = 0, host: str = "127.0.0.1",
                     num_partitions: int = 2):
    broker = MiniKafka(num_partitions)
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(64)
    broker.host, broker.port = host, srv.getsockname()[1]
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
            out, buf2 = buf[:n], buf[n:]
            buf = buf2
            return out

        try:
            while not stop_flag.is_set():
                (length,) = struct.unpack(">i", read_exact(4))
                msg = read_exact(length)
                api, version, corr = struct.unpack_from(">hhi", msg, 0)
                _cid, i = dec_str(msg, 8)
                try:
                    resp = broker.handle_request(api, version, msg[i:])
                except ValueError:
                    continue
                conn.sendall(struct.pack(">i", len(resp) + 4)
                             + struct.pack(">i", corr) + resp)
        except (ConnectionError, OSError, struct.error):
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

    return broker, broker.port, shutdown


__all__ = ["MiniKafka", "start_mini_kafka"]
