"""Kafka over the real wire protocol (stdlib client + mini broker):
record-batch v2 codec round trips, Produce/Fetch/Metadata/ListOffsets
against the in-process broker, batch + streaming source reads, sink
writes, and reference kafka-e2e confs running unmodified — the
Testcontainers KafkaIT analog."""

import json
import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.kafka_wire import (
    KafkaWireClient,
    crc32c,
    decode_record_batches,
    encode_record_batch,
)
from seatunnel_spark.testing.kafka_server import start_mini_kafka

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-kafka-e2e/src/test/resources")


@pytest.fixture(scope="module")
def kafka():
    broker, port, stop = start_mini_kafka()
    os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
        f"kafkaCluster=tcp://127.0.0.1:{port}"
    yield broker, port
    stop()
    os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)


def test_crc32c_vectors():
    # public check vectors (RFC 3720 / Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_record_batch_roundtrip():
    recs = [(b"k1", b"v1"), (None, b"v2"), (b"k3", None)]
    batch = encode_record_batch(100, recs)
    got = list(decode_record_batches(batch))
    assert got == [(100, b"k1", b"v1"), (101, None, b"v2"),
                   (102, b"k3", None)]


def test_wire_client_produce_fetch(kafka):
    _, port = kafka
    cl = KafkaWireClient(f"127.0.0.1:{port}")
    assert cl.metadata(["t1"]) == {"t1": [0, 1]}
    base = cl.produce("t1", 0, [(None, f"m{i}".encode()) for i in range(5)])
    assert base == 0
    base2 = cl.produce("t1", 0, [(b"k", b"late")])
    assert base2 == 5
    assert cl.list_offset("t1", 0, -2) == 0
    assert cl.list_offset("t1", 0, -1) == 6
    got = [(off, v) for off, _, v in cl.fetch("t1", 0, 2)]
    assert got == [(2, b"m2"), (3, b"m3"), (4, b"m4"), (5, b"late")]
    cl.close()


def test_batch_source_read(spark, kafka):
    from seatunnel_spark.sources.stream import KafkaSource

    broker, port = kafka
    rows = [json.dumps({"id": i, "name": f"n{i}"}) for i in range(40)]
    broker.seed("src_topic", rows[:20], partition=0)
    broker.seed("src_topic", rows[20:], partition=1)
    src = KafkaSource({
        "bootstrap.servers": f"127.0.0.1:{port}", "topic": "src_topic",
        "format": "json",
        "schema": {"fields": {"id": "int", "name": "string"}},
    })
    out = src.read(spark)
    assert sorted(r["id"] for r in out.collect()) == list(range(40))


def test_sink_write_and_readback(spark, kafka):
    from seatunnel_spark.sinks.kafka import KafkaSink

    broker, port = kafka
    df = spark.createDataFrame([(i, f"x{i}") for i in range(30)],
                               ["id", "v"])
    KafkaSink({"bootstrap.servers": f"127.0.0.1:{port}",
               "topic": "out_topic", "format": "json"}).write(df)
    msgs = [json.loads(v.decode())
            for _, _, _, v in broker.read_all("out_topic")]
    assert sorted(m["id"] for m in msgs) == list(range(30))


def test_keyed_writes_route_consistently(spark, kafka):
    from seatunnel_spark.sinks.kafka import KafkaSink

    broker, port = kafka
    df = spark.createDataFrame([(i % 3, i) for i in range(60)],
                               ["k", "i"]).repartition(8)
    KafkaSink({"bootstrap.servers": f"127.0.0.1:{port}",
               "topic": "keyed_topic", "format": "json",
               "partition_key_fields": ["k"]}).write(df)
    by_key_part = {}
    for p, _off, key, v in broker.read_all("keyed_topic"):
        by_key_part.setdefault(key, set()).add(p)
    assert len(by_key_part) == 3
    for key, parts in by_key_part.items():  # same key -> one partition
        assert len(parts) == 1, key


def test_streaming_read(spark, kafka, tmp_path):
    from seatunnel_spark.sources.stream import KafkaSource

    broker, port = kafka
    broker.seed("stream_topic",
                [json.dumps({"id": i}) for i in range(25)], partition=0)
    src = KafkaSource({
        "bootstrap.servers": f"127.0.0.1:{port}", "topic": "stream_topic",
        "format": "json", "schema": {"fields": {"id": "int"}},
        "maxOffsetsPerTrigger": 10,
    })
    sdf = src.read_stream(spark)
    assert sdf.isStreaming
    q = (sdf.writeStream.format("memory").queryName("kafka_stream_out")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()  # drains 25 rows across 3 capped batches
    q.stop()
    got = spark.sql("SELECT id FROM kafka_stream_out").collect()
    assert sorted(r["id"] for r in got) == list(range(25))


def test_kafka_sink_conf_runs_unmodified(spark, kafka):
    """kafka_sink_fake_to_kafka.conf: FakeSource full-type rows ->
    Kafka json sink with partition_key_fields (IT testSinkKafka)."""
    broker, _ = kafka
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/kafka_sink_fake_to_kafka.conf"))
    msgs = broker.read_all("test_topic")
    assert len(msgs) == 10
    doc = json.loads(msgs[0][3].decode())
    assert "c_string" in doc and "c_map" in doc


def test_kafka_default_sink_conf_runs_unmodified(spark, kafka):
    broker, _ = kafka
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/kafka_default_sink_fake_to_kafka.conf"))
    topics = {t for (t, p) in broker.logs if broker.logs[(t, p)]}
    assert any("test" in t for t in topics)


# ---------------------------------------------------------------------------
# More reference kafka-e2e confs unmodified (KafkaIT start modes,
# json/text format suites, format_error_handle_way)
# ---------------------------------------------------------------------------

_FULL_JSON_ROW = ('{{"id": {i}, "c_map": {{"key": {i}}}, "c_array": [1], '
                  '"c_string": "str{i}", "c_boolean": true, "c_tinyint": 1, '
                  '"c_smallint": 2, "c_int": 3, "c_bigint": 4, '
                  '"c_float": 4.5, "c_double": 5.5, "c_decimal": 1.1, '
                  '"c_bytes": "dGVzdA==", "c_date": "2024-01-23", '
                  '"c_timestamp": "2024-01-23T12:34:56"}}')

_TEXT_ROW = ('{i},{{"key": {i}}},[1],str{i},true,1,2,3,4,4.5,5.5,1.1,'
             'dGVzdA==,2024-01-23,2024-01-23T12:34:56')


def _run_conf(spark, path):
    JobEngine(spark).run(JobSpec.from_file(path))


def test_start_mode_confs_run_unmodified(spark, kafka):
    """kafkasource_{earliest,latest,specific_offsets,timestamp}_to_console
    .conf (KafkaIT.testSourceKafka): ids 0..99 seeded; earliest reads
    all, batch-latest reads nothing (vacuous asserts, exit 0 like the
    IT), specific_offsets starts at offset 50 (MIN rule = 50),
    timestamp resolves a historical ts to the covering offset."""
    broker, _ = kafka
    broker.seed("test_topic_source", ['{"id": %d}' % i for i in range(100)])
    for conf in ("kafkasource_earliest_to_console.conf",
                 "kafkasource_latest_to_console.conf",
                 "kafkasource_specific_offsets_to_console.conf",
                 "kafkasource_timestamp_to_console.conf"):
        _run_conf(spark, f"{_RES}/kafka/{conf}")


def test_json_format_conf_runs_unmodified(spark, kafka):
    """jsonFormatIT/kafka_source_json_to_console.conf: the full
    15-type schema decodes from JSON (id NOT_NULL/MIN 0/MAX 99)."""
    broker, _ = kafka
    broker.seed("test_topic_json",
                [_FULL_JSON_ROW.format(i=i) for i in range(100)])
    _run_conf(spark, f"{_RES}/jsonFormatIT/kafka_source_json_to_console.conf")


def test_text_format_conf_runs_unmodified(spark, kafka):
    """textFormatIT/kafka_source_text_to_console.conf: delimited text
    with JSON-encoded complex slots (TextSerializationSchema layout)."""
    broker, _ = kafka
    broker.seed("test_topic_text",
                [_TEXT_ROW.format(i=i) for i in range(100)])
    _run_conf(spark, f"{_RES}/textFormatIT/kafka_source_text_to_console.conf")
    _run_conf(spark, f"{_RES}/textFormatIT/"
                     "kafka_source_text_to_console_assert_catalog_table.conf")


def test_format_error_handle_way_confs(spark, kafka):
    """format_error_handle_way skip/fail confs: the topic holds JSON
    but the confs declare format=text, so every row is malformed —
    skip drops them all (exit 0, vacuous asserts) and fail raises
    (the IT asserts exit code 1)."""
    broker, _ = kafka
    broker.seed("test_topic_error_message",
                [_FULL_JSON_ROW.format(i=i) for i in range(10)])
    _run_conf(
        spark,
        f"{_RES}/kafka/kafkasource_format_error_handle_way_skip_to_console.conf")
    with pytest.raises(Exception):
        _run_conf(
            spark,
            f"{_RES}/kafka/kafkasource_format_error_handle_way_fail_to_console.conf")


# ---------------------------------------------------------------------------
# Avro format (stdlib codec fallback — no spark-avro jar here)
# ---------------------------------------------------------------------------

def test_avro_codec_roundtrip():
    import datetime
    import decimal

    from pyspark.sql import types as T

    from seatunnel_spark.avro_codec import decode_row, encode_record

    sch = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("c_map", T.MapType(T.StringType(), T.ShortType())),
        T.StructField("c_array", T.ArrayType(T.ByteType())),
        T.StructField("c_string", T.StringType()),
        T.StructField("c_boolean", T.BooleanType()),
        T.StructField("c_float", T.FloatType()),
        T.StructField("c_double", T.DoubleType()),
        T.StructField("c_decimal", T.DecimalType(2, 1)),
        T.StructField("c_bytes", T.BinaryType()),
        T.StructField("c_date", T.DateType()),
        T.StructField("c_timestamp", T.TimestampType()),
        T.StructField("c_null", T.StringType()),
    ])
    rec = {"id": -(2 ** 40), "c_map": {"k": 7}, "c_array": [1, 2, 3],
           "c_string": "héllo", "c_boolean": True, "c_float": 1.5,
           "c_double": -2.25, "c_decimal": decimal.Decimal("1.1"),
           "c_bytes": b"\x00\xff", "c_date": datetime.date(2024, 1, 23),
           "c_timestamp": datetime.datetime(2024, 1, 23, 12, 34, 56, 789000),
           "c_null": None}
    back = decode_row(sch, encode_record(sch, rec))
    assert back == rec


def test_avro_format_confs_run_unmodified(spark, kafka):
    """avro/fake_source_to_kafka_avro_format.conf writes Avro datums
    (stdlib codec — no spark-avro jar in this environment), then
    avro/kafka_avro_to_assert.conf decodes them back with the declared
    schema and Assert's id MIN/MAX rules pass (KafkaIT avro suite)."""
    broker, _ = kafka
    _run_conf(spark, f"{_RES}/avro/fake_source_to_kafka_avro_format.conf")
    n = sum(len(log) for (t, _p), log in broker.logs.items()
            if t == "test_avro_topic_fake_source")
    assert n == 90
    # the assert conf reads test_avro_topic — seed it with datums the
    # IT's producer would write (ids 0..99 over the full type matrix)
    import datetime
    import decimal

    from pyspark.sql import types as T

    from seatunnel_spark.avro_codec import encode_record
    from seatunnel_spark.job.spec import JobSpec as _JS
    from seatunnel_spark.types import parse_schema

    spec = _JS.from_file(f"{_RES}/avro/kafka_avro_to_assert.conf")
    sch = parse_schema(spec.sources[0].options["schema"]["fields"])
    for i in range(100):
        rec = {"id": i, "c_map": {"k": i % 100}, "c_array": [1, 2],
               "c_string": f"st{i:04d}", "c_boolean": True, "c_tinyint": 1,
               "c_smallint": 2, "c_int": 3, "c_bigint": 4,
               "c_float": 4.5, "c_double": 5.5,
               "c_decimal": decimal.Decimal("1.1"), "c_bytes": b"test",
               "c_date": datetime.date(2024, 1, 23),
               "c_timestamp": datetime.datetime(2024, 1, 23, 12, 34, 56)}
        broker.append("test_avro_topic", 0, [(None, encode_record(sch, rec))])
    _run_conf(spark, f"{_RES}/avro/kafka_avro_to_assert.conf")


# ---------------------------------------------------------------------------
# Protobuf format (stdlib proto3 dynamic codec — no protoc here)
# ---------------------------------------------------------------------------

def test_proto3_codec_roundtrip():
    from seatunnel_spark.protobuf_codec import (
        decode_message,
        encode_message,
        parse_proto,
    )

    src = """
      syntax = "proto3";
      message Person {
        int32 c_int32 = 1;
        int64 c_int64 = 2;
        float c_float = 3;
        double c_double = 4;
        bool c_bool = 5;
        string c_string = 6;
        bytes c_bytes = 7;
        message Address { string street = 1; string city = 2; }
        Address address = 8;
        map<string, float> attributes = 9;
        repeated string phone_numbers = 10;
      }
    """
    messages = parse_proto(src)
    rec = {"c_int32": -5, "c_int64": 2 ** 40, "c_float": 1.5,
           "c_double": -2.25, "c_bool": True, "c_string": "héllo",
           "c_bytes": b"\x00\x01", "address": {"street": "s", "city": "c"},
           "attributes": {"a": 2.5}, "phone_numbers": ["1", "2"]}
    out = decode_message(messages, "Person", encode_message(
        messages, "Person", rec))
    assert out["c_int32"] == -5 and out["c_int64"] == 2 ** 40
    assert out["c_bool"] is True and out["c_string"] == "héllo"
    assert out["address"] == {"street": "s", "city": "c"}
    assert out["attributes"] == {"a": 2.5}
    assert out["phone_numbers"] == ["1", "2"]


def test_protobuf_confs_run_unmodified(spark, kafka):
    """fake_to_kafka_protobuf.conf encodes 16 rows as proto3 datums via
    the stdlib dynamic codec, then kafka_protobuf_to_assert.conf (and
    the transform variant) decode the topic back (KafkaIT protobuf
    suite)."""
    broker, _ = kafka
    _run_conf(spark, f"{_RES}/protobuf/fake_to_kafka_protobuf.conf")
    n = sum(len(log) for (t, _p), log in broker.logs.items()
            if t == "test_protobuf_topic_fake_source")
    assert n == 16
    _run_conf(spark, f"{_RES}/protobuf/kafka_protobuf_to_assert.conf")
    _run_conf(spark, f"{_RES}/protobuf/kafka_protobuf_transform_to_assert.conf")


def test_proto3_packed_repeated_scalars():
    """proto3 packs repeated numeric scalars by default: the encoder
    emits ONE length-delimited blob; the decoder accepts both packed
    (real producers) and unpacked (proto2-style) forms."""
    from seatunnel_spark import pb
    from seatunnel_spark.protobuf_codec import (
        decode_message, encode_message, parse_proto)

    src = """
      syntax = "proto3";
      message M {
        repeated int32 a = 1;
        repeated sint64 b = 2;
        repeated double c = 3;
        repeated float d = 4;
        repeated bool e = 5;
        repeated string s = 6;
      }
    """
    messages = parse_proto(src)
    rec = {"a": [1, -2, 300], "b": [-1, 2 ** 40], "c": [1.5, -2.25],
           "d": [0.5, 8.0], "e": [True, False, True], "s": ["x", "y"]}
    wire = encode_message(messages, "M", rec)

    # packed on the wire: exactly one occurrence of each numeric field
    raw = pb.decode(wire)
    for num in (1, 2, 3, 4, 5):
        assert len(raw[num]) == 1 and isinstance(raw[num][0], bytes), num
    assert len(raw[6]) == 2  # strings never pack

    assert decode_message(messages, "M", wire) == rec

    # unpacked (one tag per element) still decodes identically
    unpacked = (pb.fvar(1, 1) + pb.fvar(1, (-2) & ((1 << 64) - 1))
                + pb.fvar(1, 300))
    got = decode_message(messages, "M", unpacked)
    assert got["a"] == [1, -2, 300]


def test_txn_commit_abort_and_isolation(kafka):
    """KIP-98 wire flow against the mini broker: committed records are
    visible at both isolation levels; aborted records only at
    read_uncommitted; LSO hides an OPEN transaction from
    read_committed consumers."""
    _, port = kafka
    cl = KafkaWireClient(f"127.0.0.1:{port}")
    t = "txn_topic"
    pid, epoch = cl.init_producer_id("txA")
    cl.add_partitions_to_txn("txA", pid, epoch, {t: [0]})
    cl.produce(t, 0, [(None, b"c1"), (None, b"c2")], txn_id="txA",
               producer_id=pid, producer_epoch=epoch, base_sequence=0)
    # open txn: hidden from read_committed, visible to read_uncommitted
    assert [v for _, _, v in cl.fetch(t, 0, 0, isolation=1)] == []
    assert [v for _, _, v in cl.fetch(t, 0, 0, isolation=0)] == [b"c1", b"c2"]
    cl.end_txn("txA", pid, epoch, commit=True)
    assert [v for _, _, v in cl.fetch(t, 0, 0, isolation=1)] == [b"c1", b"c2"]

    # aborted txn: records occupy offsets but never surface committed
    pid2, ep2 = cl.init_producer_id("txB")
    cl.add_partitions_to_txn("txB", pid2, ep2, {t: [0]})
    cl.produce(t, 0, [(None, b"x1")], txn_id="txB", producer_id=pid2,
               producer_epoch=ep2, base_sequence=0)
    cl.end_txn("txB", pid2, ep2, commit=False)
    cl.produce(t, 0, [(None, b"c3")])  # non-txn record after the abort
    committed = [v for _, _, v in cl.fetch(t, 0, 0, isolation=1)]
    assert committed == [b"c1", b"c2", b"c3"]  # x1 skipped, offsets intact
    uncommitted = [v for _, _, v in cl.fetch(t, 0, 0, isolation=0)]
    assert uncommitted == [b"c1", b"c2", b"x1", b"c3"]
    cl.close()


def test_txn_fencing_and_idempotent_dedup(kafka):
    """Re-initializing a transactional.id bumps the epoch, fences the
    zombie (its produce/end_txn fail), and aborts its open transaction.
    A duplicate batch (same sequence) is acked without re-appending."""
    _, port = kafka
    cl = KafkaWireClient(f"127.0.0.1:{port}")
    t = "fence_topic"
    pid, e0 = cl.init_producer_id("job-7")
    cl.add_partitions_to_txn("job-7", pid, e0, {t: [0]})
    cl.produce(t, 0, [(None, b"zombie")], txn_id="job-7",
               producer_id=pid, producer_epoch=e0, base_sequence=0)

    pid2, e1 = cl.init_producer_id("job-7")  # task retry
    assert pid2 == pid and e1 == e0 + 1
    # the zombie's open records were aborted by the re-init
    assert [v for _, _, v in cl.fetch(t, 0, 0, isolation=1)] == []
    with pytest.raises(RuntimeError):  # zombie is fenced
        cl.end_txn("job-7", pid, e0, commit=True)

    cl.add_partitions_to_txn("job-7", pid, e1, {t: [0]})
    cl.produce(t, 0, [(None, b"good")], txn_id="job-7", producer_id=pid,
               producer_epoch=e1, base_sequence=0)
    # idempotent retry of the same batch: same base offset, no dup
    b1 = cl.produce(t, 0, [(None, b"good")], txn_id="job-7",
                    producer_id=pid, producer_epoch=e1, base_sequence=0)
    cl.end_txn("job-7", pid, e1, commit=True)
    got = [v for _, _, v in cl.fetch(t, 0, 0, isolation=1)]
    assert got == [b"good"]
    assert isinstance(b1, int)
    cl.close()


def test_exactly_once_confs_run_unmodified(spark, kafka):
    """kafka_to_kafka_exactly_once_batch.conf (and the streaming
    variant's sink semantics): topic1 -> transactional sink -> topic2;
    every record lands exactly once and is committed (visible at
    read_committed)."""
    broker, port = kafka
    broker.seed("kafka_topic_exactly_once_1",
                [f"row-{i}" for i in range(40)])
    _run_conf(spark, f"{_RES}/kafka/kafka_to_kafka_exactly_once_batch.conf")
    cl = KafkaWireClient(f"127.0.0.1:{port}")
    got = []
    for p in broker.topic_partitions("kafka_topic_exactly_once_2"):
        got += [v.decode() for _, _, v in
                cl.fetch("kafka_topic_exactly_once_2", p, 0, isolation=1)]
    cl.close()
    assert sorted(got) == sorted(f"row-{i}" for i in range(40))
    # the sink's transactions are closed: nothing pending on the topic
    for p in broker.topic_partitions("kafka_topic_exactly_once_2"):
        assert not broker.open_txn_start.get(
            ("kafka_topic_exactly_once_2", p))
