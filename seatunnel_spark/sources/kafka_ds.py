"""Streaming Kafka over the stdlib wire client — a Python DataSource
SimpleDataSourceStreamReader whose checkpointed offset is the
per-partition position map {partition: next_offset}, the same contract
spark-sql-kafka's KafkaSourceOffset implements. Used when the JVM
connector jar is absent (see sources/stream.py)."""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class KafkaWireStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema, options):
        self.schema = schema
        cfg = json.loads(options.get("config", "{}"))
        self.bootstrap = cfg["bootstrap"]
        self.topic = cfg["topic"]
        self.per_trigger = int(cfg.get("per_trigger", 10000))
        self.sasl = cfg.get("sasl")
        self._client = None

    def _cl(self):
        from seatunnel_spark.kafka_wire import KafkaWireClient

        if self._client is None:
            self._client = KafkaWireClient(self.bootstrap,
                                           sasl=self.sasl)
        return self._client

    def initialOffset(self) -> dict:
        cl = self._cl()
        parts = cl.metadata([self.topic]).get(self.topic, [0])
        return {str(p): 0 for p in parts}

    def _rows_between(self, start: dict, end: dict):
        cl = self._cl()
        for p_s, lo in start.items():
            hi = end.get(p_s, lo)
            p = int(p_s)
            if hi <= lo:
                continue
            for off, k, v in cl.fetch(self.topic, p, lo):
                if off >= hi:
                    break
                yield (v.decode() if v is not None else None,
                       k.decode() if k is not None else None, p, off)

    def read(self, start: dict):
        cl = self._cl()
        end = {}
        budget = self.per_trigger
        for p_s, lo in start.items():
            latest = cl.list_offset(self.topic, int(p_s), -1)
            take = min(latest - lo, budget)
            end[p_s] = lo + max(0, take)
            budget -= max(0, take)
        rows = list(self._rows_between(start, end))
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows_between(start, end)

    def commit(self, end: dict) -> None:
        pass


class KafkaWireDataSource(DataSource):
    @classmethod
    def name(cls):
        return "seatunnel_kafka"

    def schema(self):
        return "value string, key string, partition int, offset long"

    def simpleStreamReader(self, schema):
        return KafkaWireStreamReader(schema, self.options)


def register_kafka_datasource(spark) -> None:
    try:
        spark.dataSource.register(KafkaWireDataSource)
    except Exception:  # noqa: BLE001
        pass


__all__ = ["KafkaWireDataSource", "register_kafka_datasource"]
