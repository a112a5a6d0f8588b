"""ActiveMQ sink via STOMP 1.2 (the text protocol every ActiveMQ
broker ships on port 61613).

Reference: connector-activemq sink (uri/host/username/password,
queue_name; JSON-serialized rows, one message per row). The reference
uses the OpenWire JMS client; STOMP SENDs land in the same queues.

Spark shape: one STOMP connection per partition, SEND frame per row
(receipt-confirmed every `batch_size` frames).
"""

from __future__ import annotations

import json
import socket

from pyspark.sql import DataFrame

from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL


class StompClient:
    def __init__(self, host: str, port: int, username: str | None = None,
                 password: str | None = None, timeout: float = 30.0):
        resolved = apply_host_aliases(f"tcp://{host}:{port}")
        hostpart = resolved.split("://", 1)[1]
        host, _, port_s = hostpart.rpartition(":")
        self.sock = socket.create_connection((host, int(port_s)),
                                             timeout=timeout)
        self._buf = b""
        headers = {"accept-version": "1.2", "host": host}
        if username:
            headers["login"] = username
            headers["passcode"] = password or ""
        self.send_frame("CONNECT", headers)
        frame = self.read_frame()
        if frame[0] != "CONNECTED":
            raise ConnectionError(f"stomp connect failed: {frame}")
        self._receipt = 0

    def send_frame(self, command: str, headers: dict,
                   body: bytes = b"") -> None:
        head = "".join(f"{k}:{v}\n" for k, v in headers.items())
        self.sock.sendall(f"{command}\n{head}\n".encode() + body + b"\x00")

    def read_frame(self) -> tuple[str, dict, bytes]:
        while b"\x00" not in self._buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("stomp connection closed")
            self._buf += chunk
        raw, self._buf = self._buf.split(b"\x00", 1)
        self._buf = self._buf.lstrip(b"\n")
        head, _, body = raw.partition(b"\n\n")
        lines = head.decode().splitlines()
        headers = dict(l.split(":", 1) for l in lines[1:] if ":" in l)
        return lines[0], headers, body

    def send_message(self, destination: str, body: str,
                     receipt: bool = False) -> None:
        headers = {"destination": destination,
                   "content-type": "application/json",
                   "content-length": str(len(body.encode()))}
        if receipt:
            self._receipt += 1
            headers["receipt"] = f"r{self._receipt}"
        self.send_frame("SEND", headers, body.encode())
        if receipt:
            frame = self.read_frame()
            if frame[0] != "RECEIPT":
                raise RuntimeError(f"stomp send not acknowledged: {frame}")

    def close(self):
        try:
            self.send_frame("DISCONNECT", {})
            self.sock.close()
        except OSError:
            pass


class ActiveMqSink(Sink):
    NAME = "ActiveMQ"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        uri = self.opt("uri")
        if uri and "://" in uri:
            hostpart = uri.split("://", 1)[1].split("?")[0]
            host, _, port = hostpart.rpartition(":")
        else:
            host, port = self.require("host"), self.opt("port", 61613)
        host_r = apply_host_aliases(f"tcp://{host}:{int(port)}")
        hostpart = host_r.split("://", 1)[1]
        host, _, port = hostpart.rpartition(":")
        port = int(port)
        username, password = self.opt("username"), self.opt("password")
        queue = self.require("queue_name")
        batch_size = int(self.opt("batch_size", 100))
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        def write_partition(rows):
            cl = StompClient(host, port, username, password)
            try:
                n = 0
                for row in rows:
                    d = row.asDict(recursive=True)
                    for c in meta:
                        d.pop(c, None)
                    n += 1
                    cl.send_message(f"/queue/{queue}",
                                    json.dumps(d, default=str),
                                    receipt=(n % batch_size == 0))
            finally:
                cl.close()

        df.foreachPartition(write_partition)


__all__ = ["ActiveMqSink", "StompClient"]
