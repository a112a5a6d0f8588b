"""RabbitMQ source/sink over AMQP 0-9-1 (seatunnel_spark.amqp).

Reference: connector-rabbitmq (host/port/virtual_host/username/
password, queue_name, exchange, routing_key, durable/exclusive/
auto_delete, format + schema decode, for_e2e_testing bounded reads).

Spark shape: a queue is drain-consumed (messages are destructive
reads — one consumer connection on the driver, decode parallelizes
downstream, like the SQS source); the sink publishes per partition.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from seatunnel_spark.amqp import AmqpConnection
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL


def _conn(opts) -> AmqpConnection:
    return AmqpConnection(
        opts.get("host", "localhost"), int(opts.get("port", 5672)),
        str(opts.get("username", "guest")),
        str(opts.get("password", "guest")),
        str(opts.get("virtual_host", "/")))


class RabbitMqSource(Source):
    NAME = "RabbitMQ"

    def read(self, spark: SparkSession) -> DataFrame:
        from seatunnel_spark.formats import decode_payload

        queue = self.require("queue_name")
        cl = _conn(self.options)
        try:
            cl.queue_declare(queue,
                             durable=bool(self.opt("durable", True)),
                             exclusive=bool(self.opt("exclusive", False)),
                             auto_delete=bool(self.opt("auto_delete", False)))
            bodies = []
            while True:
                body = cl.basic_get(queue)
                if body is None:
                    break
                bodies.append(body.decode())
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

    def read_stream(self, spark: SparkSession) -> DataFrame:
        """STREAMING job mode: bounded queue drain per run — the
        reference's `for_e2e_testing=true` consumer stops at the end of
        the queue (RabbitmqSourceReader's e2e flag), and a production
        deployment re-runs on the checkpoint interval; same shape as
        the CDC sources' bounded live tails."""
        return self.read(spark)


class RabbitMqSink(Sink):
    NAME = "RabbitMQ"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        from seatunnel_spark.net import apply_host_aliases

        opts = dict(self.options)
        # resolve aliases on the DRIVER — executor workers don't see
        # late env changes (same rule as the kafka/rocketmq sinks)
        resolved = apply_host_aliases(
            f"tcp://{opts.get('host', 'localhost')}"
            f":{int(opts.get('port', 5672))}")
        hostpart = resolved.split("://", 1)[1]
        opts["host"], _, opts["port"] = hostpart.rpartition(":")
        queue = self.require("queue_name")
        routing_key = self.opt("routing_key") or queue
        exchange = self.opt("exchange") or ""
        durable = bool(self.opt("durable", True))
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        def write_partition(rows):
            cl = _conn(opts)
            try:
                cl.queue_declare(queue, durable=durable)
                for row in rows:
                    d = row.asDict(recursive=True)
                    for c in meta:
                        d.pop(c, None)
                    cl.publish(json.dumps(d, default=str).encode(),
                               routing_key, exchange)
            finally:
                cl.close()

        df.foreachPartition(write_partition)


__all__ = ["RabbitMqSource", "RabbitMqSink"]
