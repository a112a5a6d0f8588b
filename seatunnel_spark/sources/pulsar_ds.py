"""Streaming Pulsar over the stdlib wire client — a Python DataSource
SimpleDataSourceStreamReader whose checkpointed offset is the
per-partition-topic [ledger, entry] message-id map, the position
contract the reference checkpoints in PulsarPartitionSplit
(connector-pulsar/source/split/PulsarPartitionSplit.java). Each trigger
drains messages published after the checkpointed id via an exclusive
non-durable subscription with start_message_id (exclusive resume)."""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class PulsarWireStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema, options):
        self.schema = schema
        cfg = json.loads(options.get("config", "{}"))
        self.service_url = cfg["service_url"]
        self.topic = cfg["topic"]
        self.subscription = cfg.get("subscription", "seatunnel")
        self.per_trigger = int(cfg.get("per_trigger", 500))
        self._client = None
        self._units = None

    def _cl(self):
        from seatunnel_spark.pulsar_wire import PulsarClient

        if self._client is None:
            self._client = PulsarClient(self.service_url)
        return self._client

    def units(self) -> list[str]:
        if self._units is None:
            cl = self._cl()
            n = cl.partitions(self.topic)
            self._units = ([self.topic] if n <= 0 else
                           [f"{self.topic}-partition-{i}" for i in range(n)])
        return self._units

    def initialOffset(self) -> dict:
        return {u: [0, -1] for u in self.units()}

    def _drain_after(self, unit: str, pos: list, limit: int):
        from seatunnel_spark import pb
        from seatunnel_spark.pulsar_wire import PulsarClient

        cl = PulsarClient(self.service_url)
        try:
            start = None if pos[1] < 0 else (pos[0], pos[1])
            msgs = cl.drain(unit, f"{self.subscription}-{unit}",
                            start_message_id=start, earliest=True,
                            max_messages=limit)
            rows = []
            last = list(pos)
            for mid, meta, data in msgs:
                rows.append((data.decode("utf-8", "replace"),
                             pb.first_str(meta, 6), unit,
                             pb.first(meta, 3, 0)))
                last = [mid[0], mid[1]]
            return rows, last
        finally:
            cl.close()

    def read(self, start: dict):
        rows = []
        end = {}
        budget = self.per_trigger
        for unit in self.units():
            pos = start.get(unit, [0, -1])
            if budget <= 0:
                end[unit] = pos
                continue
            got, last = self._drain_after(unit, pos, budget)
            rows += got
            budget -= len(got)
            end[unit] = last
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for unit, pos in start.items():
            hi = end.get(unit, pos)
            if hi == pos:
                continue
            got, _ = self._drain_after(unit, pos, 1_000_000)
            for r in got:
                rows.append(r)
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


class PulsarWireDataSource(DataSource):
    @classmethod
    def name(cls):
        return "seatunnel_pulsar"

    def schema(self):
        return "value string, key string, topic string, publish_time long"

    def simpleStreamReader(self, schema):
        return PulsarWireStreamReader(schema, self.options)


def register_pulsar_datasource(spark) -> None:
    try:
        spark.dataSource.register(PulsarWireDataSource)
    except Exception:  # noqa: BLE001
        pass


__all__ = ["PulsarWireDataSource", "register_pulsar_datasource"]
