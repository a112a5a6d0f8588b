"""Pulsar binary protocol client (stdlib sockets + seatunnel_spark.pb).

Implements the subset of the public Pulsar wire protocol (PulsarApi.proto,
protocol version 19) that the reference connector-pulsar needs:
CONNECT/CONNECTED, PARTITIONED_METADATA, PRODUCER + SEND/SEND_RECEIPT,
SUBSCRIBE (non-durable reader or durable subscription) + FLOW + MESSAGE,
ACK, GET_LAST_MESSAGE_ID, SEEK, PING/PONG keepalive, CLOSE_*.

Framing (public spec):
  simple command:  [totalSize i32][commandSize i32][BaseCommand pb]
  payload command: ... + [0x0e01][crc32c u32][metadataSize i32]
                   [MessageMetadata pb][payload]
where the checksum covers metadataSize+metadata+payload. Batched
payloads hold `num_messages_in_batch` entries of
[singleMetaSize i32][SingleMessageMetadata pb][payload].

BaseCommand field numbers equal the Type enum values (CONNECT=2 … ).
"""

from __future__ import annotations

import socket
import struct
import time

from seatunnel_spark import pb
from seatunnel_spark.kafka_wire import crc32c
from seatunnel_spark.net import apply_host_aliases

# BaseCommand.Type values (= field numbers)
CONNECT, CONNECTED = 2, 3
SUBSCRIBE, PRODUCER, SEND, SEND_RECEIPT, SEND_ERROR, MESSAGE = 4, 5, 6, 7, 8, 9
ACK, FLOW, UNSUBSCRIBE, SUCCESS, ERROR = 10, 11, 12, 13, 14
CLOSE_PRODUCER, CLOSE_CONSUMER, PRODUCER_SUCCESS, PING, PONG = 15, 16, 17, 18, 19
PARTITIONED_METADATA, PARTITIONED_METADATA_RESPONSE = 21, 22
LOOKUP, LOOKUP_RESPONSE = 23, 24
SEEK, GET_LAST_MESSAGE_ID, GET_LAST_MESSAGE_ID_RESPONSE = 28, 29, 30

MAGIC = b"\x0e\x01"
PROTOCOL_VERSION = 19


def frame(cmd_type: int, body: bytes,
          payload: tuple[bytes, bytes] | None = None) -> bytes:
    """Encode one frame. `payload` = (message_metadata_pb, payload_bytes)."""
    cmd = pb.fvar(1, cmd_type) + (pb.fbytes(cmd_type, body) if body else b"")
    out = struct.pack(">i", len(cmd)) + cmd
    if payload is not None:
        meta, data = payload
        after = struct.pack(">i", len(meta)) + meta + data
        out += MAGIC + struct.pack(">I", crc32c(after)) + after
    return struct.pack(">i", len(out)) + out


def parse_frame(buf: bytes) -> tuple[int, dict, bytes | None, bytes]:
    """One complete frame -> (type, command_fields, brokerEntryMeta-stripped
    payload section or None). `buf` excludes the leading totalSize."""
    (csize,) = struct.unpack_from(">i", buf)
    cmd = pb.decode(buf[4:4 + csize])
    ctype = pb.first(cmd, 1)
    rest = buf[4 + csize:]
    sub = pb.decode(pb.first(cmd, ctype)) if cmd.get(ctype) else {}
    return ctype, sub, (rest if rest else None), buf


def split_payload(rest: bytes) -> tuple[bytes, bytes]:
    """Payload section -> (MessageMetadata pb bytes, payload bytes),
    verifying the crc32c when the magic marker is present."""
    if rest[:2] == MAGIC:
        (crc,) = struct.unpack_from(">I", rest, 2)
        body = rest[6:]
        if crc32c(body) != crc:
            raise ValueError("pulsar payload checksum mismatch")
    else:
        body = rest
    (msize,) = struct.unpack_from(">i", body)
    return body[4:4 + msize], body[4 + msize:]


def unbatch(meta: dict, payload: bytes) -> list[tuple[dict, bytes]]:
    """Expand a (possibly batched) payload into [(single_meta, bytes)]."""
    nbatch = pb.first(meta, 11, 0)  # num_messages_in_batch
    if not nbatch:
        return [({}, payload)]
    out = []
    i = 0
    for _ in range(nbatch):
        (msize,) = struct.unpack_from(">i", payload, i)
        single = pb.decode(payload[i + 4:i + 4 + msize])
        psize = pb.first(single, 3, 0)  # SingleMessageMetadata.payload_size
        start = i + 4 + msize
        out.append((single, payload[start:start + psize]))
        i = start + psize
    return out


class PulsarClient:
    """One broker connection. `service_url` = pulsar://host:port (the
    first address of a comma list; lookup redirects are not followed —
    point at the serving broker, as the reference e2e's standalone is)."""

    def __init__(self, service_url: str, timeout: float = 30.0):
        url = apply_host_aliases(service_url.split(",")[0].strip())
        hostpart = url.split("://", 1)[-1].split("/")[0]
        host, _, port = hostpart.rpartition(":")
        self.sock = socket.create_connection(
            (host or hostpart, int(port or 6650)), timeout=timeout)
        self._buf = b""
        self._req = 0
        self._ids = 0
        self._pending: list[tuple[int, dict, bytes | None]] = []
        self._send(frame(CONNECT, pb.fstr(1, "seatunnel-spark")
                         + pb.fvar(4, PROTOCOL_VERSION)))
        ctype, _, _ = self._next()
        if ctype != CONNECTED:
            raise ConnectionError(f"pulsar CONNECT rejected (type {ctype})")

    # -- low-level I/O ----------------------------------------------------
    def _send(self, data: bytes) -> None:
        self.sock.sendall(data)

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("pulsar connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _next(self) -> tuple[int, dict, bytes | None]:
        """Next frame, transparently answering PING."""
        while True:
            (total,) = struct.unpack(">i", self._read_exact(4))
            ctype, sub, rest, _ = parse_frame(self._read_exact(total))
            if ctype == PING:
                self._send(frame(PONG, b""))
                continue
            if ctype == ERROR:
                raise RuntimeError(
                    f"pulsar ERROR: {pb.first_str(sub, 3, '')}")
            return ctype, sub, rest

    def _expect(self, want: int) -> dict:
        """Read until a frame of type `want`, queueing MESSAGE frames."""
        while True:
            ctype, sub, rest = self._next()
            if ctype == want:
                return sub
            if ctype == MESSAGE:
                self._pending.append((ctype, sub, rest))
                continue
            if ctype in (SUCCESS, PRODUCER_SUCCESS) and want in (
                    SUCCESS, PRODUCER_SUCCESS):
                return sub
            raise RuntimeError(f"pulsar: expected {want}, got {ctype}")

    def _rid(self) -> int:
        self._req += 1
        return self._req

    # -- metadata ---------------------------------------------------------
    def partitions(self, topic: str) -> int:
        self._send(frame(PARTITIONED_METADATA,
                         pb.fstr(1, topic) + pb.fvar(2, self._rid())))
        sub = self._expect(PARTITIONED_METADATA_RESPONSE)
        return pb.first(sub, 1, 0)

    # -- producer ---------------------------------------------------------
    def create_producer(self, topic: str) -> int:
        self._ids += 1
        pid = self._ids
        self._send(frame(PRODUCER, pb.fstr(1, topic) + pb.fvar(2, pid)
                         + pb.fvar(3, self._rid())))
        sub = self._expect(PRODUCER_SUCCESS)
        self._producer_name = pb.first_str(sub, 2, f"producer-{pid}")
        return pid

    def send(self, pid: int, payload: bytes, seq: int,
             partition_key: str | None = None,
             properties: dict | None = None) -> tuple[int, int]:
        meta = (pb.fstr(1, getattr(self, "_producer_name", "p"))
                + pb.fvar(2, seq)
                + pb.fvar(3, int(time.time() * 1000)))
        for k, v in (properties or {}).items():
            meta += pb.fbytes(4, pb.fstr(1, k) + pb.fstr(2, str(v)))
        if partition_key is not None:
            meta += pb.fstr(6, partition_key)
        self._send(frame(SEND, pb.fvar(1, pid) + pb.fvar(2, seq),
                         payload=(meta, payload)))
        sub = self._expect(SEND_RECEIPT)
        mid = pb.decode(pb.first(sub, 3, b""))
        return pb.first(mid, 1, 0), pb.first(mid, 2, 0)  # ledger, entry

    # -- consumer ---------------------------------------------------------
    def subscribe(self, topic: str, subscription: str, *,
                  durable: bool = False, earliest: bool = True,
                  start_message_id: tuple[int, int] | None = None) -> int:
        self._ids += 1
        cid = self._ids
        body = (pb.fstr(1, topic) + pb.fstr(2, subscription)
                + pb.fvar(3, 0)            # SubType Exclusive
                + pb.fvar(4, cid) + pb.fvar(5, self._rid())
                + pb.fstr(6, f"seatunnel-{cid}")
                + pb.fvar(8, 1 if durable else 0))
        if start_message_id is not None:
            body += pb.fbytes(9, pb.fvar(1, start_message_id[0])
                              + pb.fvar(2, start_message_id[1]))
        body += pb.fvar(13, 1 if earliest else 0)  # InitialPosition
        self._send(frame(SUBSCRIBE, body))
        self._expect(SUCCESS)
        return cid

    def flow(self, cid: int, permits: int = 1000) -> None:
        self._send(frame(FLOW, pb.fvar(1, cid) + pb.fvar(2, permits)))

    def last_message_id(self, cid: int) -> tuple[int, int]:
        self._send(frame(GET_LAST_MESSAGE_ID,
                         pb.fvar(1, cid) + pb.fvar(2, self._rid())))
        sub = self._expect(GET_LAST_MESSAGE_ID_RESPONSE)
        mid = pb.decode(pb.first(sub, 1, b""))
        ledger, entry = pb.first(mid, 1, 0), pb.first(mid, 2, 0)
        if entry >= (1 << 63):  # entryId -1 = empty topic
            return ledger, -1
        return ledger, entry

    def ack(self, cid: int, ledger: int, entry: int,
            cumulative: bool = True) -> None:
        self._send(frame(ACK, pb.fvar(1, cid)
                         + pb.fvar(2, 1 if cumulative else 0)
                         + pb.fbytes(3, pb.fvar(1, ledger) + pb.fvar(2, entry))))

    def receive(self, timeout: float | None = None,
                ) -> tuple[tuple[int, int], dict, bytes] | None:
        """One MESSAGE frame -> ((ledger, entry), metadata_fields, payload
        section); caller unbatches. Returns queued frames first; with a
        `timeout`, returns None when no frame arrives in time."""
        if self._pending:
            ctype, sub, rest = self._pending.pop(0)
        else:
            old = self.sock.gettimeout()
            try:
                if timeout is not None:
                    self.sock.settimeout(timeout)
                ctype, sub, rest = self._next()
            except (socket.timeout, TimeoutError):
                return None
            finally:
                self.sock.settimeout(old)
        if ctype != MESSAGE:
            raise RuntimeError(f"pulsar: expected MESSAGE, got {ctype}")
        mid = pb.decode(pb.first(sub, 2, b""))
        meta_pb, payload = split_payload(rest or b"")
        return ((pb.first(mid, 1, 0), pb.first(mid, 2, 0)),
                pb.decode(meta_pb), payload)

    def drain(self, topic: str, subscription: str, *,
              start_message_id: tuple[int, int] | None = None,
              earliest: bool = True, max_messages: int = 1_000_000,
              ) -> list[tuple[tuple[int, int], dict, bytes]]:
        """Bounded read: everything published before the subscribe call.
        Returns [(message_id, metadata_fields, single_payload)] with
        batches expanded (batch members share the outer message id)."""
        cid = self.subscribe(topic, subscription, earliest=earliest,
                             start_message_id=start_message_id)
        last = self.last_message_id(cid)
        out: list[tuple[tuple[int, int], dict, bytes]] = []
        if last[1] < 0:
            return out
        if start_message_id is not None and tuple(start_message_id) >= last:
            return out  # nothing published past the resume point
        self.flow(cid, max_messages)
        while len(out) < max_messages:
            got = self.receive(timeout=10.0)
            if got is None:
                break
            mid, meta, payload = got
            for single, data in unbatch(meta, payload):
                merged = dict(meta)
                if pb.first(single, 2) is not None:  # batch partition_key
                    merged[6] = single[2]
                out.append((mid, merged, data))
            if mid >= last:
                break
        if out:
            self.ack(cid, *out[-1][0])
        return out

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


__all__ = ["PulsarClient", "frame", "parse_frame", "split_payload",
           "unbatch", "PROTOCOL_VERSION", "MAGIC", "CONNECT", "CONNECTED",
           "SUBSCRIBE", "PRODUCER", "SEND", "SEND_RECEIPT", "MESSAGE",
           "ACK", "FLOW", "SUCCESS", "ERROR", "CLOSE_PRODUCER",
           "CLOSE_CONSUMER", "PRODUCER_SUCCESS", "PING", "PONG",
           "PARTITIONED_METADATA", "PARTITIONED_METADATA_RESPONSE",
           "LOOKUP", "LOOKUP_RESPONSE", "SEEK", "GET_LAST_MESSAGE_ID",
           "GET_LAST_MESSAGE_ID_RESPONSE"]
