"""Streaming sources: Kafka (all message formats) and Socket.

Reference: connector-kafka (config/MessageFormat.java:20-31 — JSON,
TEXT, CANAL_JSON, DEBEZIUM_JSON, OGG_JSON, MAXWELL_JSON, AVRO,
PROTOBUF, COMPATIBLE_*) and connector-socket.

Spark-native: `readStream.format("kafka")` (spark-sql-kafka) + the
format decoders in seatunnel_spark.formats (from_json-based, emitting
__row_kind for the CDC envelopes). When the connector jar is NOT on
the classpath (this sandbox), the source/sink fall back to the
stdlib wire-protocol client (seatunnel_spark.kafka_wire — real
Produce/Fetch against any broker): batch reads fan partitions out via
mapInPandas; streaming reads poll through a Python DataSource stream
reader whose checkpointed offset is the per-partition position map —
the same offset-tracking contract spark-sql-kafka implements.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from seatunnel_spark.sources.base import Source
from seatunnel_spark.formats import decode_payload


def _kafka_jar_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:  # noqa: BLE001
        return False


class KafkaSource(Source):
    NAME = "Kafka"

    def _base(self, reader):
        reader = (
            reader.format("kafka")
            .option("kafka.bootstrap.servers", self.require("bootstrap.servers"))
            .option("subscribe", self.require("topic"))
            .option("startingOffsets", self.opt("start_mode", "earliest"))
        )
        for k, v in (self.opt("kafka.config") or {}).items():
            reader = reader.option(f"kafka.{k}", v)
        return reader

    def _decode(self, raw: DataFrame) -> DataFrame:
        fmt = str(self.opt("format", "json")).upper()
        schema_opt = self.opt("schema")
        return decode_payload(
            raw, fmt, schema_opt,
            delimiter=self.opt("field_delimiter", ","),
            avro_schema=self.opt("avro.schema"),
            protobuf_schema_file=self.opt("protobuf_schema_file"),
            protobuf_message_name=self.opt("protobuf_message_name"),
        )

    # -- wire-protocol fallback -------------------------------------------
    def _wire_read(self, spark: SparkSession) -> DataFrame:
        """Bounded read over the stdlib client: one mapInPandas task per
        partition streams fetch batches — no driver materialization."""
        from seatunnel_spark.kafka_wire import KafkaWireClient, resolve_bootstrap

        bootstrap = resolve_bootstrap(self.require("bootstrap.servers"))
        topic = self.require("topic")
        cl = KafkaWireClient(bootstrap)
        try:
            parts = cl.metadata([topic]).get(topic, [0])
        finally:
            cl.close()
        pdf = spark.createDataFrame([(p,) for p in parts], "p int") \
            .repartition(max(1, len(parts)))

        def fetch_parts(batches):
            import pandas as pd

            cl = KafkaWireClient(bootstrap)
            try:
                for frame in batches:
                    for p in frame["p"]:
                        rows = [
                            (v.decode() if v is not None else None,
                             k.decode() if k is not None else None,
                             int(p), int(off))
                            for off, k, v in cl.fetch(topic, int(p), 0)
                        ]
                        yield pd.DataFrame(
                            rows, columns=["value", "key", "partition",
                                           "offset"])
            finally:
                cl.close()

        return pdf.mapInPandas(
            fetch_parts,
            "value string, key string, partition int, offset long")

    def _wire_read_stream(self, spark: SparkSession) -> DataFrame:
        from seatunnel_spark.sources.kafka_ds import register_kafka_datasource

        from seatunnel_spark.kafka_wire import resolve_bootstrap

        register_kafka_datasource(spark)
        cfg = {"bootstrap": resolve_bootstrap(self.require("bootstrap.servers")),
               "topic": self.require("topic"),
               "per_trigger": int(self.opt("maxOffsetsPerTrigger")
                                  or self.opt("read_limit.rows_per_second")
                                  or 10000)}
        return (spark.readStream.format("seatunnel_kafka")
                .option("config", json.dumps(cfg)).load())

    # ----------------------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        if _kafka_jar_available(spark):
            return self._decode(self._base(spark.read).load())
        return self._decode(self._wire_read(spark))

    def read_stream(self, spark: SparkSession) -> DataFrame:
        if not _kafka_jar_available(spark):
            return self._decode(self._wire_read_stream(spark))
        reader = self._base(spark.readStream)
        if self.opt("maxOffsetsPerTrigger") or self.opt("read_limit.rows_per_second"):
            # Reference speed-limit (docs/en/concept/speed-limit.md) maps to
            # Kafka's per-trigger cap.
            cap = self.opt("maxOffsetsPerTrigger") or self.opt("read_limit.rows_per_second")
            reader = reader.option("maxOffsetsPerTrigger", int(cap))
        return self._decode(reader.load())


class SocketSource(Source):
    NAME = "Socket"

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.format("socket")
            .option("host", self.require("host"))
            .option("port", int(self.require("port")))
            .load()
        )

    def read(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError("Socket source is streaming-only (UNBOUNDED)")
