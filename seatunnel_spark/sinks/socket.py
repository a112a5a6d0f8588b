"""Socket sink — newline-delimited JSON rows over TCP.

Reference: connector-socket sink (docs/en/connector-v2/sink/Socket.md:
host, port). Executor-parallel: each partition opens one connection
and streams its rows (the reference's per-writer connection model,
SinkWriter.java:47) — no driver funneling.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from seatunnel_spark.sinks.base import Sink


class SocketSink(Sink):
    NAME = "Socket"

    def write(self, df: DataFrame) -> None:
        host = self.require("host")
        port = int(self.require("port"))
        retries = int(self.opt("max_retries", 3))

        def send_partition(rows):
            import socket
            import time

            buf = [json.dumps(r.asDict(), default=str) for r in rows]
            if not buf:
                return
            last_err = None
            for attempt in range(retries):
                try:
                    with socket.create_connection((host, port), timeout=30) as s:
                        s.sendall(("\n".join(buf) + "\n").encode("utf-8"))
                    return
                except OSError as ex:
                    last_err = ex
                    time.sleep(2**attempt * 0.2)
            raise last_err

        df.foreachPartition(send_partition)
