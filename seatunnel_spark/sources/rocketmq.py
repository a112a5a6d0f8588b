"""RocketMQ source/sink over the remoting protocol (stdlib sockets).

Reference: connector-rocketmq (name.srv.addr, topic, consumer.group /
producer.group, format + schema decode). Wire format from the public
RocketMQ remoting spec: frame = total_len(int32) + header_info(int32:
serializer byte + 24-bit header length) + JSON header
{code, language, version, opaque, flag, extFields} + body.
Implemented commands: SEND_MESSAGE (10), PULL_MESSAGE (11) with the
commit-log binary message decode, GET_MAX_OFFSET (30).

Simplification: `name.srv.addr` is dialed directly (a full client
resolves the broker via GET_ROUTEINFO_BY_TOPIC first — point this at
the broker's listen address; the reference e2e runs a single
combined namesrv/broker container anyway).
"""

from __future__ import annotations

import json
import socket
import struct

from pyspark.sql import DataFrame, SparkSession

from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL

SEND_MESSAGE, PULL_MESSAGE, GET_MAX_OFFSET = 10, 11, 30


def acl_signature(ext_fields: dict, body: bytes, secret_key: str) -> str:
    """RocketMQ ACL request signature (public AclSigner/AclUtils
    algorithm: values of the key-sorted extFields — Signature itself
    excluded — concatenated, body appended, HmacSHA1 base64)."""
    import base64
    import hashlib
    import hmac

    content = "".join(
        str(v) for k, v in sorted(ext_fields.items())
        if k != "Signature").encode() + body
    return base64.b64encode(hmac.new(secret_key.encode(), content,
                                     hashlib.sha1).digest()).decode()


class RocketMqClient:
    def __init__(self, addr: str, timeout: float = 30.0,
                 access_key: str | None = None,
                 secret_key: str | None = None):
        resolved = apply_host_aliases(
            f"tcp://{addr.split(';')[0].strip()}")
        hostpart = resolved.split("://", 1)[1]
        host, _, port = hostpart.rpartition(":")
        self.sock = socket.create_connection((host, int(port or 9876)),
                                             timeout=timeout)
        self._buf = b""
        self._opaque = 0
        # acl.enabled: every request carries AccessKey + Signature
        # (AclClientRPCHook.doBeforeRequest)
        self.access_key = access_key
        self.secret_key = secret_key

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("rocketmq connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def call(self, code: int, ext_fields: dict,
             body: bytes = b"") -> tuple[dict, bytes]:
        self._opaque += 1
        ext = {k: str(v) for k, v in ext_fields.items()}
        if self.access_key is not None:
            ext["AccessKey"] = self.access_key
            ext["Signature"] = acl_signature(ext, body,
                                             self.secret_key or "")
        header = json.dumps({
            "code": code, "language": "OTHER", "version": 0,
            "opaque": self._opaque, "flag": 0,
            "extFields": ext,
        }).encode()
        frame = (struct.pack(">i", 4 + len(header) + len(body))
                 + struct.pack(">i", len(header) & 0xFFFFFF)  # JSON type 0
                 + header + body)
        self.sock.sendall(frame)
        (total,) = struct.unpack(">i", self._read_exact(4))
        payload = self._read_exact(total)
        (hinfo,) = struct.unpack_from(">i", payload)
        hlen = hinfo & 0xFFFFFF
        resp_header = json.loads(payload[4:4 + hlen])
        resp_body = payload[4 + hlen:]
        return resp_header, resp_body

    def send(self, topic: str, body: bytes, group: str = "DEFAULT_PRODUCER",
             queue_id: int = 0) -> None:
        import time

        header, _ = self.call(SEND_MESSAGE, {
            "producerGroup": group, "topic": topic,
            "defaultTopic": "TBW102", "defaultTopicQueueNums": 4,
            "queueId": queue_id, "sysFlag": 0,
            "bornTimestamp": int(time.time() * 1000), "flag": 0,
            "properties": "", "reconsumeTimes": 0, "unitMode": "false",
        }, body)
        if header.get("code") != 0:
            raise RuntimeError(f"rocketmq send failed: {header}")

    def max_offset(self, topic: str, queue_id: int = 0) -> int:
        header, _ = self.call(GET_MAX_OFFSET,
                              {"topic": topic, "queueId": queue_id})
        return int((header.get("extFields") or {}).get("offset", 0))

    def pull(self, topic: str, offset: int, group: str = "DEFAULT_CONSUMER",
             queue_id: int = 0, max_msgs: int = 32) -> list[bytes]:
        header, body = self.call(PULL_MESSAGE, {
            "consumerGroup": group, "topic": topic, "queueId": queue_id,
            "queueOffset": offset, "maxMsgNums": max_msgs, "sysFlag": 0,
            "commitOffset": 0, "suspendTimeoutMillis": 0,
            "subscription": "*", "subVersion": 0, "expressionType": "TAG",
        })
        if header.get("code") not in (0, 19):  # SUCCESS / PULL_NOT_FOUND
            raise RuntimeError(f"rocketmq pull failed: {header}")
        return list(decode_commitlog(body))

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass


def encode_commitlog(messages: list[tuple[bytes, str]],
                     base_offset: int = 0) -> bytes:
    """Commit-log binary entries [(body, topic)] — the PULL response
    payload (public MessageDecoder layout)."""
    out = bytearray()
    for i, (body, topic) in enumerate(messages):
        tb = topic.encode()
        total = 4 + 4 + 4 + 4 + 4 + 8 + 8 + 4 + 8 + 8 + 8 + 8 + 4 + 8 \
            + 4 + len(body) + 1 + len(tb) + 2
        out += struct.pack(">iiiii", total, -626843481, 0, 0, 0)  # magic
        out += struct.pack(">qq", base_offset + i, 0)
        out += struct.pack(">iqq", 0, 0, 0)      # sysflag, born ts, born host
        out += struct.pack(">qq", 0, 0)          # store ts, store host
        out += struct.pack(">iq", 0, 0)          # reconsume, preparedTxn
        out += struct.pack(">i", len(body)) + body
        out += struct.pack("B", len(tb)) + tb
        out += struct.pack(">H", 0)              # properties length
    return bytes(out)


def decode_commitlog(data: bytes):
    i = 0
    while i + 4 <= len(data):
        (total,) = struct.unpack_from(">i", data, i)
        if total <= 0 or i + total > len(data):
            return
        j = i + 4 + 4 + 4 + 4 + 4 + 8 + 8 + 4 + 8 + 8 + 8 + 8 + 4 + 8
        (blen,) = struct.unpack_from(">i", data, j)
        j += 4
        yield data[j:j + blen]
        i += total


class RocketMqSource(Source):
    NAME = "Rocketmq"

    def _start_offset(self, cl, topic: str) -> int:
        """RocketMQ ConsumerConfig start.mode vocabulary
        (StartMode.java): CONSUME_FROM_FIRST_OFFSET,
        CONSUME_FROM_LAST_OFFSET, CONSUME_FROM_SPECIFIC_OFFSETS (+
        start.mode.offsets {topic-queue = off}), CONSUME_FROM_TIMESTAMP
        (the mini broker has no time index — everything it holds was
        appended 'now', so a historical ts maps to the log start), and
        CONSUME_FROM_GROUP_OFFSETS (no committed store on this reader —
        first-offset reset fallback)."""
        mode = str(self.opt("start.mode",
                            "CONSUME_FROM_GROUP_OFFSETS")).upper()
        if mode == "CONSUME_FROM_LAST_OFFSET":
            return cl.max_offset(topic)
        if mode == "CONSUME_FROM_SPECIFIC_OFFSETS":
            spec = self.opt("start.mode.offsets") or {}
            return int(spec.get(f"{topic}-0", 0))
        return 0

    def read(self, spark: SparkSession) -> DataFrame:
        from seatunnel_spark.formats import decode_payload

        addr = self.require("name.srv.addr")
        topics = [t.strip() for t in
                  str(self.opt("topics") or self.require("topic")).split(",")
                  if t.strip()]
        group = self.opt("consumer.group", "SEATUNNEL_CONSUMER")
        acl = str(self.opt("acl.enabled", "false")).lower() == "true"
        cl = RocketMqClient(
            addr,
            access_key=str(self.require("access.key")) if acl else None,
            secret_key=str(self.require("secret.key")) if acl else None)
        try:
            bodies = []
            for topic in topics:
                end = cl.max_offset(topic)
                offset = self._start_offset(cl, topic)
                while offset < end:
                    msgs = cl.pull(topic, offset, group)
                    if not msgs:
                        break
                    bodies.extend(m.decode() for m in msgs)
                    offset += len(msgs)
        finally:
            cl.close()
        raw = spark.createDataFrame([(b,) for b in bodies] or [(None,)],
                                    "value string").filter("value IS NOT NULL")
        schema_opt = self.opt("schema")
        if schema_opt:
            return decode_payload(
                raw, str(self.opt("format", "json")).upper(), schema_opt,
                delimiter=self.opt("field_delimiter", ","))
        return raw.withColumnRenamed("value", "content")


class RocketMqSink(Sink):
    NAME = "Rocketmq"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        # resolve aliases on the DRIVER — executor Python workers are
        # long-lived and don't see late env changes
        addr = apply_host_aliases(
            f"tcp://{self.require('name.srv.addr')}").split("://", 1)[-1]
        topic = self.require("topic")
        group = self.opt("producer.group", "SEATUNNEL_PRODUCER")
        fmt = str(self.opt("format", "json")).lower()
        delim = self.opt("field_delimiter", ",")
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]
        acl = str(self.opt("acl.enabled", "false")).lower() == "true"
        ak = str(self.require("access.key")) if acl else None
        sk = str(self.require("secret.key")) if acl else None

        def write_partition(rows):
            cl = RocketMqClient(addr, access_key=ak, secret_key=sk)
            try:
                for row in rows:
                    d = row.asDict(recursive=True)
                    for c in meta:
                        d.pop(c, None)
                    if fmt == "text":
                        body = delim.join(str(v) for v in d.values())
                    else:
                        body = json.dumps(d, default=str)
                    cl.send(topic, body.encode(), group)
            finally:
                cl.close()

        df.foreachPartition(write_partition)


__all__ = ["RocketMqSource", "RocketMqSink", "RocketMqClient",
           "encode_commitlog", "decode_commitlog"]
