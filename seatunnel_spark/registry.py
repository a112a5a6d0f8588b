"""Full connector inventory — reference plugin-mapping.properties parity.

Every source/sink identifier the reference ships is registered here with
its Spark implementation strategy. Backends whose client libraries or
services don't exist in this environment are registered as GATED: the
option surface resolves, and connect-time raises a clear error naming
the Spark-native path to wire (usually a spark-packages connector jar
or the JDBC/HTTP fallback already implemented).

This keeps the engine honest: `get_source("MongoDB", ...)` never fails
with an unknown-plugin error; it fails (when it must) at the I/O
boundary with the exact deployment instruction.
"""

from __future__ import annotations

from seatunnel_spark.sources import SOURCES, get_source as _get_source
from seatunnel_spark.sources.base import Source
from seatunnel_spark.sinks import SINKS, get_sink as _get_sink
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sinks.kafka import KafkaSink, WebhookSink

# backend name -> (kind, spark strategy note). Empty since round 2:
# every reference source/sink identifier has a native implementation.
_GATED_SOURCES: dict[str, str] = {}

_GATED_SINKS: dict[str, str | None] = {
    "Sentry": "sentry SDK event post",
    "Hive": None,  # implemented natively below
    "Kafka": None,  # implemented natively below
}


class GatedSource(Source):
    """Registered backend whose client/runtime isn't present here."""

    def read(self, spark):
        raise NotImplementedError(
            f"source {self.plugin_name}: backend not available in this "
            f"environment; Spark path: {_GATED_SOURCES[self.plugin_name]}"
        )

    read_stream = read


class GatedSink(Sink):
    def write(self, df):
        raise NotImplementedError(
            f"sink {self.plugin_name}: backend not available in this "
            f"environment; Spark path: {_GATED_SINKS[self.plugin_name]}"
        )


def register_all() -> None:
    """Idempotently extend the live registries to full inventory."""
    from seatunnel_spark.sinks.elasticsearch import EsSink
    from seatunnel_spark.sources.elasticsearch import EsSource

    # Native REST connectors (Easysearch speaks the ES wire protocol —
    # the reference's connector-easysearch is the same client surface).
    for name in ("Elasticsearch", "Easysearch"):
        SOURCES[name] = EsSource
        SINKS[name] = EsSink
    # CDC family: debezium feed decode + watermark stitch; live binlog
    # clients aren't in this environment, but the replay path (and a
    # Kafka feed in production) exercises the full pipeline.
    from seatunnel_spark.sources.cdc_replay import CDC_SOURCE_NAMES, CdcReplaySource

    for name in CDC_SOURCE_NAMES:
        SOURCES[name] = CdcReplaySource
    # Lakehouse formats: versioned-parquet backend with MERGE-apply
    # commit semantics (swap for the real runtime jars in production).
    from seatunnel_spark.sinks.lakehouse import (
        LAKEHOUSE_NAMES,
        LakehouseSink,
        LakehouseSource,
    )

    for name in LAKEHOUSE_NAMES:
        SOURCES[name] = LakehouseSource
        SINKS[name] = LakehouseSink
    # Redis: RESP wire protocol over stdlib sockets.
    from seatunnel_spark.sinks.redis import RedisSink
    from seatunnel_spark.sources.redis import RedisSource

    SOURCES["Redis"] = RedisSource
    SINKS["Redis"] = RedisSink
    # MongoDB: OP_MSG wire protocol + stdlib BSON codec.
    from seatunnel_spark.sinks.mongodb import MongoSink
    from seatunnel_spark.sources.mongodb import MongoSource

    SOURCES["MongoDB"] = MongoSource
    SINKS["MongoDB"] = MongoSink
    # REST-protocol backends (stdlib HTTP clients).
    from seatunnel_spark.sources.influxdb import InfluxDbSink, InfluxDbSource
    from seatunnel_spark.sources.sqs import SqsSink, SqsSource
    from seatunnel_spark.sources.vector_stores import (
        QdrantSink,
        QdrantSource,
        TypesenseSink,
        TypesenseSource,
    )

    SOURCES["InfluxDB"] = InfluxDbSource
    SINKS["InfluxDB"] = InfluxDbSink
    SOURCES["AmazonSqs"] = SqsSource
    SINKS["AmazonSqs"] = SqsSink
    SOURCES["Qdrant"] = QdrantSource
    SINKS["Qdrant"] = QdrantSink
    SOURCES["Typesense"] = TypesenseSource
    SINKS["Typesense"] = TypesenseSink
    from seatunnel_spark.sinks.streamload import DorisSink, StarRocksSink
    from seatunnel_spark.sources.clickhouse import (
        ClickhouseSink,
        ClickhouseSource,
    )
    from seatunnel_spark.sources.dynamodb import DynamoDbSink, DynamoDbSource

    SINKS["Doris"] = DorisSink
    SINKS["StarRocks"] = StarRocksSink
    SOURCES["Clickhouse"] = ClickhouseSource
    SINKS["Clickhouse"] = ClickhouseSink
    SOURCES["AmazonDynamodb"] = DynamoDbSource
    SINKS["AmazonDynamodb"] = DynamoDbSink
    from seatunnel_spark.sources.graph_vector import (
        MilvusSink,
        MilvusSource,
        Neo4jSink,
        Neo4jSource,
    )

    SOURCES["Milvus"] = MilvusSource
    SINKS["Milvus"] = MilvusSink
    SOURCES["Neo4j"] = Neo4jSource
    SINKS["Neo4j"] = Neo4jSink
    from seatunnel_spark.sources.iotdb import IoTDbSink, IoTDbSource

    SOURCES["IoTDB"] = IoTDbSource
    SINKS["IoTDB"] = IoTDbSink
    from seatunnel_spark.sinks.prometheus import PrometheusSink
    from seatunnel_spark.sinks.stomp import ActiveMqSink
    from seatunnel_spark.sources.tdengine import TDengineSink, TDengineSource

    SOURCES["TDengine"] = TDengineSource
    SINKS["TDengine"] = TDengineSink
    SINKS["ActiveMQ"] = ActiveMqSink
    SINKS["Prometheus"] = PrometheusSink
    from seatunnel_spark.sources.rabbitmq import RabbitMqSink, RabbitMqSource

    SOURCES["RabbitMQ"] = RabbitMqSource
    SINKS["RabbitMQ"] = RabbitMqSink
    from seatunnel_spark.sources.cassandra import CassandraSink, CassandraSource

    SOURCES["Cassandra"] = CassandraSource
    SINKS["Cassandra"] = CassandraSink
    from seatunnel_spark.sinks.misc_sinks import (
        DataHubSink,
        DruidSink,
        HbaseRestSink,
    )

    SINKS["Druid"] = DruidSink
    SINKS["DataHub"] = DataHubSink
    SINKS["Hbase"] = HbaseRestSink
    from seatunnel_spark.sources.hbase_openmldb import (
        HbaseRestSource,
        OpenMldbSource,
    )

    SOURCES["Hbase"] = HbaseRestSource
    SOURCES["OpenMldb"] = OpenMldbSource
    from seatunnel_spark.sources.rocketmq import RocketMqSink, RocketMqSource

    SOURCES["Rocketmq"] = RocketMqSource
    SINKS["Rocketmq"] = RocketMqSink
    # Pulsar: binary wire protocol (pulsar_wire.py) — partition splits
    # fan out across executors; streaming via the Python DataSource.
    from seatunnel_spark.sources.pulsar import PulsarSink, PulsarSource

    SOURCES["Pulsar"] = PulsarSource
    SINKS["Pulsar"] = PulsarSink
    # Aliyun SLS: signed REST + protobuf LogGroup (pb.py), shard splits.
    from seatunnel_spark.sources.sls import SlsSink, SlsSource

    SOURCES["Sls"] = SlsSource
    SINKS["Sls"] = SlsSink
    # Staged-load warehouses: stage files, then bulk import.
    from seatunnel_spark.sinks.firestore import FirestoreSink
    from seatunnel_spark.sinks.staged_load import (
        ClickhouseFileSink,
        S3RedshiftSink,
        SelectDBSink,
    )

    SINKS["S3Redshift"] = S3RedshiftSink
    SINKS["SelectDBCloud"] = SelectDBSink
    SINKS["ClickhouseFile"] = ClickhouseFileSink
    SINKS["GoogleFirestore"] = FirestoreSink
    # Doris/StarRocks FE reads over the MySQL wire protocol.
    from seatunnel_spark.sources.olap_mysql import (
        DorisSource,
        StarRocksSource,
    )

    SOURCES["Doris"] = DorisSource
    SOURCES["StarRocks"] = StarRocksSource
    # MaxCompute: ODPS Tunnel REST + protobuf record stream.
    from seatunnel_spark.sources.maxcompute import (
        MaxcomputeSink,
        MaxcomputeSource,
    )

    SOURCES["Maxcompute"] = MaxcomputeSource
    SINKS["Maxcompute"] = MaxcomputeSink
    # Tablestore: OTS protobuf + PlainBuffer wire format.
    from seatunnel_spark.sources.tablestore import (
        TablestoreSink,
        TablestoreSource,
    )

    SOURCES["Tablestore"] = TablestoreSource
    SINKS["Tablestore"] = TablestoreSink
    # Kudu: krpc wire protocol (kudu_rpc.py) — tablet scans + row ops.
    from seatunnel_spark.sources.kudu import KuduSink, KuduSource

    SOURCES["Kudu"] = KuduSource
    SINKS["Kudu"] = KuduSink
    for name in _GATED_SOURCES:
        SOURCES.setdefault(name, GatedSource)
    from seatunnel_spark.sinks.hive import HiveSink
    from seatunnel_spark.sinks.socket import SocketSink

    SINKS["Kafka"] = KafkaSink
    SINKS["Hive"] = HiveSink
    SINKS["Socket"] = SocketSink
    from seatunnel_spark.sinks.email import EmailSink

    SINKS["EmailSink"] = EmailSink  # real SMTP, not a webhook
    for name in ("Http", "Slack", "DingTalk", "Feishu", "Sentry"):
        SINKS.setdefault(name, WebhookSink)
    for name, note in _GATED_SINKS.items():
        if note is not None:
            SINKS.setdefault(name, GatedSink)


register_all()

__all__ = ["register_all", "GatedSource", "GatedSink"]
