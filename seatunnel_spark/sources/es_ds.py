"""Spark 4 Python DataSource for Elasticsearch sliced-scroll reads.

partitions() is the split enumerator — (index × slice) cells, planned
driver-side; read() is the per-executor reader running one sliced
scroll. The reference reads each index through a single scroll
(connector-elasticsearch/.../ElasticsearchSourceSplitEnumerator.java
plans one split per index); slicing is what lets a large index use the
whole cluster.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _SlicePartition(InputPartition):
    def __init__(self, index: str, slice_id: int, slice_max: int):
        self.index = index
        self.slice_id = slice_id
        self.slice_max = slice_max


class EsScrollReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.cfg = json.loads(options.get("config", "{}"))

    def partitions(self):
        n = max(1, int(self.cfg.get("slices", 1)))
        return [_SlicePartition(ix, s, n)
                for ix in self.cfg["indices"] for s in range(n)]

    def read(self, partition):
        from seatunnel_spark.sources.elasticsearch import EsClient, convert_value

        cfg = self.cfg
        client = EsClient(cfg["hosts"], cfg.get("username"),
                          cfg.get("password"),
                          verify_cert=cfg.get("verify_cert", True),
                          verify_host=cfg.get("verify_host", True))
        fields = [(f.name, f.dataType) for f in self.schema.fields]
        hits = client.scroll_hits(
            partition.index, cfg.get("query"), cfg.get("scroll_time", "1m"),
            int(cfg.get("scroll_size", 100)), cfg.get("source_fields"),
            slice_id=partition.slice_id, slice_max=partition.slice_max)
        for doc in hits:
            yield tuple(convert_value(doc.get(n), dt) for n, dt in fields)


class EsScrollDataSource(DataSource):
    @classmethod
    def name(cls):
        return "seatunnel_es"

    def schema(self):
        raise NotImplementedError("seatunnel_es requires an explicit schema")

    def reader(self, schema):
        return EsScrollReader(schema, self.options)


def register_es_datasource(spark) -> None:
    try:
        spark.dataSource.register(EsScrollDataSource)
    except Exception:  # noqa: BLE001 — already registered
        pass


__all__ = ["EsScrollDataSource", "register_es_datasource"]
