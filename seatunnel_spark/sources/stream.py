"""Streaming sources: Kafka (all message formats) and Socket.

Reference: connector-kafka (config/MessageFormat.java:20-31 — JSON,
TEXT, CANAL_JSON, DEBEZIUM_JSON, OGG_JSON, MAXWELL_JSON, AVRO,
PROTOBUF, COMPATIBLE_*) and connector-socket.

Spark-native: `readStream.format("kafka")` + the format decoders in
seatunnel_spark.formats (from_json-based, emitting __row_kind for the
CDC envelopes). Kafka jars aren't loadable in this container, so
`read`/`read_stream` build the reader lazily; decoding logic is unit
tested on static DataFrames through seatunnel_spark.formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from seatunnel_spark.sources.base import Source
from seatunnel_spark.formats import decode_payload


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

    def read(self, spark: SparkSession) -> DataFrame:
        return self._decode(self._base(spark.read).load())

    def read_stream(self, spark: SparkSession) -> DataFrame:
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
