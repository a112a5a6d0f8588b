"""Pulsar source/sink over the binary wire protocol (pulsar_wire.py).

Reference surface: connector-pulsar — SourceProperties.java
(client.service-url, subscription.name, topic semicolon-list,
cursor.startup.mode EARLIEST/LATEST/SUBSCRIPTION/TIMESTAMP,
cursor.stop.mode NEVER/LATEST/TIMESTAMP, format/schema decode) and
SinkProperties.java (topic, format json|text, field_delimiter,
partition_key_fields, message.routing.mode).

Spark design: topic partitions are the split unit exactly like the
reference's PulsarSplitEnumerator (one TopicPartition per split) —
bounded reads fan (topic, partition) units out through mapInPandas so
each executor task drains its own partition with an exclusive
non-durable subscription; nothing is collected on the driver.
Streaming reads go through a Python DataSource stream reader whose
checkpointed offset is the per-partition (ledger, entry) message-id
map — the same position contract the reference checkpoints in
PulsarPartitionSplit.

Simplifications vs the Java client (documented): lookup redirects are
not followed (dial the serving broker), TIMESTAMP cursors filter on
`publish_time` client-side instead of broker-side SEEK, and batch
receipt ordering is per-partition (the protocol's own guarantee).
"""

from __future__ import annotations

import json
import zlib

from pyspark.sql import DataFrame, SparkSession

from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL


def _partition_topics(client, topic: str) -> list[str]:
    n = client.partitions(topic)
    if n <= 0:
        return [topic]
    return [f"{topic}-partition-{i}" for i in range(n)]


def _drain_unit(service_url: str, unit_topic: str, subscription: str,
                startup: str, start_ts: int | None,
                stop_mode: str, stop_ts: int | None) -> list[tuple]:
    from seatunnel_spark import pb
    from seatunnel_spark.pulsar_wire import PulsarClient, unbatch

    cl = PulsarClient(service_url)
    try:
        durable = startup == "SUBSCRIPTION"
        earliest = startup in ("EARLIEST", "TIMESTAMP")
        if durable:
            cid = cl.subscribe(unit_topic, subscription, durable=True,
                               earliest=earliest)
            last = cl.last_message_id(cid)
            rows = []
            if last[1] >= 0:
                cl.flow(cid, 1_000_000)
                while True:
                    got = cl.receive(timeout=5.0)
                    if got is None:
                        break  # cursor already at/after last
                    mid, meta, payload = got
                    for single, data in unbatch(meta, payload):
                        rows.append((mid, meta, data))
                    if mid >= last:
                        break
                if rows:
                    cl.ack(cid, *rows[-1][0])
        else:
            rows = cl.drain(unit_topic, subscription, earliest=earliest)
        out = []
        for mid, meta, data in rows:
            publish_time = pb.first(meta, 3, 0)
            if startup == "TIMESTAMP" and start_ts is not None \
                    and publish_time < start_ts:
                continue
            if stop_mode == "TIMESTAMP" and stop_ts is not None \
                    and publish_time >= stop_ts:
                continue
            key = pb.first_str(meta, 6)
            out.append((data.decode("utf-8", "replace"), key, unit_topic,
                        publish_time))
        return out
    finally:
        cl.close()


class PulsarSource(Source):
    NAME = "Pulsar"

    def _decode(self, spark: SparkSession, rows: list[tuple]) -> DataFrame:
        from seatunnel_spark.formats import decode_payload

        raw = spark.createDataFrame(
            rows or [(None, None, None, None)],
            "value string, key string, topic string, publish_time long",
        ).filter("value IS NOT NULL")
        schema_opt = self.opt("schema")
        if schema_opt:
            return decode_payload(
                raw.select("value"), str(self.opt("format", "json")).upper(),
                schema_opt, delimiter=self.opt("field_delimiter", ","))
        return raw

    def read(self, spark: SparkSession) -> DataFrame:
        from seatunnel_spark.net import apply_host_aliases
        from seatunnel_spark.pulsar_wire import PulsarClient

        # resolve aliases driver-side: executor workers may have been
        # forked before the alias env var was set
        service_url = apply_host_aliases(self.require("client.service-url"))
        topics = [t.strip() for t in str(self.require("topic")).split(";")
                  if t.strip()]
        subscription = self.opt("subscription.name", "seatunnel")
        startup = str(self.opt("cursor.startup.mode", "LATEST")).upper()
        if startup == "LATEST" and not self.opt("cursor.stop.mode"):
            # bounded batch read of a LATEST cursor is empty by
            # definition; the reference's batch jobs use EARLIEST
            startup = "EARLIEST"
        start_ts = self.opt("cursor.startup.timestamp")
        stop_mode = str(self.opt("cursor.stop.mode", "LATEST")).upper()
        stop_ts = self.opt("cursor.stop.timestamp")

        cl = PulsarClient(service_url)
        try:
            units = [u for t in topics for u in _partition_topics(cl, t)]
        finally:
            cl.close()

        sc = spark.sparkContext
        unit_rdd = sc.parallelize(units, max(1, len(units)))
        rows = unit_rdd.flatMap(
            lambda u: _drain_unit(service_url, u, subscription, startup,
                                  int(start_ts) if start_ts else None,
                                  stop_mode,
                                  int(stop_ts) if stop_ts else None))
        collected = spark.createDataFrame(
            rows, "value string, key string, topic string, publish_time long")
        schema_opt = self.opt("schema")
        if schema_opt:
            from seatunnel_spark.formats import decode_payload

            return decode_payload(
                collected.select("value"),
                str(self.opt("format", "json")).upper(), schema_opt,
                delimiter=self.opt("field_delimiter", ","))
        return collected

    def read_stream(self, spark: SparkSession) -> DataFrame:
        from seatunnel_spark.sources.pulsar_ds import register_pulsar_datasource

        register_pulsar_datasource(spark)
        from seatunnel_spark.net import apply_host_aliases

        service_url = apply_host_aliases(self.require("client.service-url"))
        topic = str(self.require("topic")).split(";")[0].strip()
        cfg = {"service_url": service_url, "topic": topic,
               "subscription": self.opt("subscription.name", "seatunnel"),
               "per_trigger": int(self.opt("poll.batch.size", 500))}
        raw = (spark.readStream.format("seatunnel_pulsar")
               .option("config", json.dumps(cfg)).load())
        schema_opt = self.opt("schema")
        if schema_opt:
            from seatunnel_spark.formats import decode_payload

            return decode_payload(
                raw.select("value"), str(self.opt("format", "json")).upper(),
                schema_opt, delimiter=self.opt("field_delimiter", ","))
        return raw


class PulsarSink(Sink):
    NAME = "Pulsar"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        from seatunnel_spark.net import apply_host_aliases
        from seatunnel_spark.pulsar_wire import PulsarClient

        service_url = apply_host_aliases(self.require("client.service-url"))
        topic = self.require("topic")
        fmt = str(self.opt("format", "json")).lower()
        delim = self.opt("field_delimiter", ",")
        key_fields = self.opt("partition_key_fields") or []
        routing = str(self.opt("message.routing.mode", "RoundRobinPartition"))
        meta_cols = [c for c in (ROW_KIND_COL, TABLE_ID_COL)
                     if c in df.columns]

        cl = PulsarClient(service_url)
        try:
            units = _partition_topics(cl, topic)
        finally:
            cl.close()

        def write_partition(rows):
            cl = PulsarClient(service_url)
            pids = {}
            seqs = {}
            rr = 0
            try:
                for row in rows:
                    d = row.asDict(recursive=True)
                    for c in meta_cols:
                        d.pop(c, None)
                    if fmt == "text":
                        body = delim.join(str(v) for v in d.values())
                    else:
                        body = json.dumps(d, default=str)
                    key = (delim.join(str(d.get(f)) for f in key_fields)
                           if key_fields else None)
                    if len(units) == 1:
                        unit = units[0]
                    elif key is not None:
                        unit = units[zlib.crc32(key.encode()) % len(units)]
                    elif routing == "SinglePartition":
                        unit = units[0]
                    else:
                        unit = units[rr % len(units)]
                        rr += 1
                    if unit not in pids:
                        pids[unit] = cl.create_producer(unit)
                        seqs[unit] = 0
                    cl.send(pids[unit], body.encode(), seqs[unit],
                            partition_key=key)
                    seqs[unit] += 1
            finally:
                cl.close()

        df.foreachPartition(write_partition)


__all__ = ["PulsarSource", "PulsarSink"]
