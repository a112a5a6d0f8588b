"""Mini RocketMQ broker — remoting protocol (JSON headers) covering
SEND_MESSAGE, PULL_MESSAGE (commit-log binary responses),
GET_MAX_OFFSET."""

from __future__ import annotations

import json
import socket
import struct
import threading

from seatunnel_spark.sources.rocketmq import (
    GET_MAX_OFFSET,
    PULL_MESSAGE,
    SEND_MESSAGE,
    encode_commitlog,
)


class MiniRocketMq:
    def __init__(self):
        self.topics: dict[str, list[bytes]] = {}
        self.lock = threading.RLock()
        # ACL mode: {accessKey: secretKey}; every request must carry a
        # valid AccessKey + Signature (the broker-side PlainAccessValidator)
        self.acl: dict[str, str] | None = None
        self.acl_failures = 0

    def enable_acl(self, access_key: str, secret_key: str) -> None:
        self.acl = {access_key: secret_key}

    def check_acl(self, ext: dict, body: bytes) -> bool:
        if self.acl is None:
            return True
        from seatunnel_spark.sources.rocketmq import acl_signature

        ak = ext.get("AccessKey")
        sig = ext.get("Signature")
        sk = self.acl.get(ak or "")
        if sk is None or sig != acl_signature(ext, body, sk):
            self.acl_failures += 1
            return False
        return True


def start_mini_rocketmq(port: int = 0, host: str = "127.0.0.1"):
    broker = MiniRocketMq()
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

        def reply(opaque, code, ext=None, body=b""):
            header = json.dumps({"code": code, "language": "OTHER",
                                 "version": 0, "opaque": opaque,
                                 "flag": 1, "extFields": ext or {}}).encode()
            conn.sendall(struct.pack(">i", 4 + len(header) + len(body))
                         + struct.pack(">i", len(header) & 0xFFFFFF)
                         + header + body)

        try:
            while not stop_flag.is_set():
                (total,) = struct.unpack(">i", read_exact(4))
                payload = read_exact(total)
                (hinfo,) = struct.unpack_from(">i", payload)
                hlen = hinfo & 0xFFFFFF
                header = json.loads(payload[4:4 + hlen])
                body = payload[4 + hlen:]
                code = header.get("code")
                ext = header.get("extFields") or {}
                opaque = header.get("opaque", 0)
                if not broker.check_acl(ext, body):
                    # NO_PERMISSION (ResponseCode 16)
                    reply(opaque, 16, {"remark": "acl check failed"})
                    continue
                with broker.lock:
                    if code == SEND_MESSAGE:
                        topic = ext["topic"]
                        broker.topics.setdefault(topic, []).append(body)
                        reply(opaque, 0, {"msgId": "x", "queueId": "0",
                                          "queueOffset": str(
                                              len(broker.topics[topic]) - 1)})
                    elif code == GET_MAX_OFFSET:
                        n = len(broker.topics.get(ext["topic"], []))
                        reply(opaque, 0, {"offset": str(n)})
                    elif code == PULL_MESSAGE:
                        topic = ext["topic"]
                        off = int(ext.get("queueOffset", 0))
                        mx = int(ext.get("maxMsgNums", 32))
                        msgs = broker.topics.get(topic, [])[off:off + mx]
                        if not msgs:
                            reply(opaque, 19)  # PULL_NOT_FOUND
                        else:
                            blob = encode_commitlog(
                                [(m, topic) for m in msgs], off)
                            reply(opaque, 0,
                                  {"nextBeginOffset": str(off + len(msgs)),
                                   "minOffset": "0",
                                   "maxOffset": str(len(
                                       broker.topics.get(topic, []))),
                                   "suggestWhichBrokerId": "0"}, blob)
                    else:
                        reply(opaque, 1)  # SYSTEM_ERROR
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

    return broker, srv.getsockname()[1], shutdown


__all__ = ["MiniRocketMq", "start_mini_rocketmq"]
